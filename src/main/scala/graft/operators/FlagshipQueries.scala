package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** The flagship window-agg + enrichment-join queries — batch analogs of the
  * reference's entire streaming computation
  * (spark_consumer_kafka.py:77-128), oracle-checked.
  */
object FlagshipQueries {

  import Tables.t

  /** Shared oracle CTE: parse + null-reject + 1-minute tumbling window
    * multi-agg. DuckDB's epoch-aligned time_bucket reproduces Spark's
    * window() bucketing (SURVEY.md §7.1).
    */
  private val windowAggCte: String =
    """WITH parsed AS (
      |  SELECT ts, event_type, value, CAST(props->>'k' AS INTEGER) AS k
      |  FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND (props->>'k') IS NOT NULL
      |), agg AS (
      |  SELECT time_bucket(INTERVAL 1 minute, ts) AS window_start,
      |         event_type,
      |         SUM(TRY_CAST(value AS DECIMAL(12,2))) AS tv,
      |         MAX(value) AS max_value,
      |         CAST(SUM(k) AS BIGINT) AS total_k,
      |         COUNT(*) AS n_events
      |  FROM parsed GROUP BY window_start, event_type
      |), win AS (
      |  SELECT window_start,
      |         window_start + INTERVAL 1 minute AS window_end,
      |         event_type,
      |         CAST(tv AS DOUBLE) AS total_value,
      |         CAST(tv AS DOUBLE) / n_events AS avg_value,
      |         max_value,
      |         total_k,
      |         CAST(total_k AS DOUBLE) / n_events AS avg_k,
      |         n_events
      |  FROM agg
      |)""".stripMargin

  /** join_enrich's oracle, shared verbatim with `streaming_pipeline`
    * (the streaming run converges to the same table — parity is the
    * point, so the SQL is defined once).
    */
  val joinEnrichSql: String =
    windowAggCte +
      s"""
        |SELECT win.*, dim.weight, dim.category,
        |       CAST(total_value AS DOUBLE) * 1000000.0 / weight
        |         AS value_per_million
        |FROM win JOIN ${Tables.eventTypeDimSql} USING (event_type)
        |ORDER BY window_start, event_type""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // A1-A5/T2: tumbling-window multi-aggregate in one pass
    // (spark_consumer_kafka.py:77-89)
    QuerySpec("window_agg",
      windowAggCte +
        "\nSELECT * FROM win ORDER BY window_start, event_type") { (s, dir) =>
      EventPipeline.windowAgg(
        EventPipeline.rejectNulls(
          EventPipeline.parse(Tables.eventPropsSchema)(t(s, dir, "events"))))
        .orderBy("window_start", "event_type")
    },

    // J1 + P3/F4/F5: inner enrichment join + derived per-million metric
    // (spark_consumer_kafka.py:102-126). Dim broadcast like the reference's
    // 8-row countries table.
    QuerySpec("join_enrich", joinEnrichSql) { (s, dir) =>
      EventPipeline.flagship(t(s, dir, "events"), Tables.eventTypeDim(s),
        Tables.eventPropsSchema)
    },

    // Sliding windows (2-minute length, 1-minute slide): every event
    // lands in exactly two windows. Oracle: unnest the two aligned
    // window starts per event.
    QuerySpec("sliding_window",
      """WITH x AS (
        |  SELECT event_type, value, ws
        |  FROM (SELECT event_type, value,
        |               time_bucket(INTERVAL 1 minute, ts) AS tb
        |        FROM events),
        |       unnest([tb - INTERVAL 1 minute, tb]) AS t(ws)
        |)
        |SELECT ws AS window_start,
        |       ws + INTERVAL 2 minutes AS window_end,
        |       event_type,
        |       CAST(SUM(TRY_CAST(value AS DECIMAL(12,2))) AS DOUBLE)
        |         AS total_value,
        |       COUNT(*) AS n_events
        |FROM x GROUP BY ws, event_type
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(window(col("ts"), "2 minutes", "1 minute"),
          col("event_type"))
        .agg(
          sum(expr("try_cast(value as decimal(12,2))"))
            .cast(org.apache.spark.sql.types.DoubleType)
            .as("total_value"),
          count(lit(1)).as("n_events"))
        .select(col("window.start").as("window_start"),
          col("window.end").as("window_end"), col("event_type"),
          col("total_value"), col("n_events"))
        .orderBy("window_start", "event_type")
    },

    // Session windows (30-minute gap): Spark's session_window vs the
    // oracle's gaps-and-islands derivation — two independent
    // formulations of session semantics must agree.
    QuerySpec("session_window",
      """WITH marked AS (
        |  SELECT user_id, ts,
        |         CASE WHEN prev_ts IS NULL
        |                OR ts - prev_ts > INTERVAL 30 minutes
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM (SELECT user_id, ts,
        |               lag(ts) OVER (PARTITION BY user_id
        |                             ORDER BY ts) AS prev_ts
        |        FROM events)
        |), numbered AS (
        |  SELECT user_id, ts,
        |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM marked
        |)
        |SELECT user_id,
        |       MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 minutes AS session_end,
        |       COUNT(*) AS n_events
        |FROM numbered GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // J1 variant: the documented left-join alternative
    // (spark_consumer_kafka.py:105) — dim missing 'view' → null enrichment.
    QuerySpec("join_left",
      windowAggCte +
        s"""
          |SELECT win.*, dim.weight, dim.category,
          |       CAST(total_value AS DOUBLE) * 1000000.0 / weight
          |         AS value_per_million
          |FROM win LEFT JOIN ${Tables.eventTypeDimPartialSql}
          |  USING (event_type)
          |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      EventPipeline.enrich(Tables.eventTypeDimPartial(s), "left")(
        EventPipeline.windowAgg(
          EventPipeline.rejectNulls(
            EventPipeline.parse(Tables.eventPropsSchema)(
              t(s, dir, "events")))))
        .orderBy("window_start", "event_type")
    }
  )
}
