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
      |         SUM(CAST(value AS DECIMAL(12,2))) AS tv,
      |         MAX(value) AS max_value,
      |         CAST(SUM(k) AS BIGINT) AS total_k,
      |         COUNT(*) AS n_events
      |  FROM parsed GROUP BY window_start, event_type
      |), win AS (
      |  SELECT window_start,
      |         window_start + INTERVAL 1 minute AS window_end,
      |         event_type,
      |         CAST(tv AS DECIMAL(38,2)) AS total_value,
      |         CAST(tv AS DOUBLE) / n_events AS avg_value,
      |         max_value,
      |         total_k,
      |         CAST(total_k AS DOUBLE) / n_events AS avg_k,
      |         n_events
      |  FROM agg
      |)""".stripMargin

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
    QuerySpec("join_enrich",
      windowAggCte +
        s"""
          |SELECT win.*, dim.weight, dim.category,
          |       CAST(total_value AS DOUBLE) * 1000000.0 / weight
          |         AS value_per_million
          |FROM win JOIN ${Tables.eventTypeDimSql} USING (event_type)
          |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      EventPipeline.flagship(t(s, dir, "events"), Tables.eventTypeDim(s),
        Tables.eventPropsSchema)
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
