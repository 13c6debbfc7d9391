package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function families beyond the reference's minimal set (SURVEY.md
  * §2.6 notes the reference uses none of these): date-part extraction,
  * string functions, exact-sum moment statistics, and the remaining
  * analytic window functions. All deterministic, all oracle-checked.
  */
object FunctionQueries {

  import Tables.t

  val all: Seq[QuerySpec] = Seq(

    // Date dimension building: part extraction + truncation + day
    // arithmetic (conventions verified identical: both engines' quarter,
    // month-trunc, and day-diff agree; dayofweek is deliberately NOT
    // used — Spark counts 1=Sunday, DuckDB 0=Sunday).
    QuerySpec("date_parts",
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INTEGER) AS y,
        |       CAST(month(o_orderdate) AS INTEGER) AS m,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |       CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
        |         AS month_start,
        |       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
        |                      o_orderdate) AS INTEGER) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01"))
          .as("days_since"))
        .orderBy("o_orderkey")
    },

    // String function family: case mapping, substring, padding,
    // reversal, concatenation, edit distance (exact integer in both
    // engines).
    QuerySpec("string_funcs",
      """SELECT p_partkey,
        |       upper(p_name) AS uname,
        |       CAST(length(p_name) AS INTEGER) AS nlen,
        |       substring(p_name, 1, 5) AS prefix,
        |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |       reverse(p_brand) AS revbrand,
        |       CAST(levenshtein(p_brand, 'Brand#13') AS INTEGER) AS lev,
        |       p_type || '/' || p_brand AS typed
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).as("nlen"),
        substring(col("p_name"), 1, 5).as("prefix"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        reverse(col("p_brand")).as("revbrand"),
        levenshtein(col("p_brand"), lit("Brand#13")).as("lev"),
        concat(col("p_type"), lit("/"), col("p_brand")).as("typed"))
        .orderBy("p_partkey")
    },

    // Moment statistics from EXACT integer sums: variance derived as
    // (n·Σx² − (Σx)²) / n² with the numerator an exact BIGINT (integral
    // quantities; all magnitudes < 2^63), so the only float op is one
    // division — identical in both engines, no Welford order
    // sensitivity, no FMA exposure.
    QuerySpec("agg_stats",
      """SELECT l_returnflag,
        |       n,
        |       CAST(s AS DOUBLE) / n AS mean_qty,
        |       num,
        |       CAST(num AS DOUBLE) / (n * n) AS var_pop
        |FROM (
        |  SELECT l_returnflag,
        |         COUNT(*) AS n,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
        |         CAST(COUNT(*) * SUM(CAST(l_quantity AS BIGINT)
        |                             * CAST(l_quantity AS BIGINT))
        |              - SUM(CAST(l_quantity AS BIGINT))
        |                * SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |           AS num
        |  FROM lineitem GROUP BY l_returnflag
        |) ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("s"),
          sum(col("l_quantity").cast("bigint") *
            col("l_quantity").cast("bigint")).as("ssq"))
        .select(
          col("l_returnflag"), col("n"),
          (col("s").cast("double") / col("n")).as("mean_qty"),
          (col("n") * col("ssq") - col("s") * col("s")).as("num"),
          ((col("n") * col("ssq") - col("s") * col("s")).cast("double") /
            (col("n") * col("n"))).as("var_pop"))
        .orderBy("l_returnflag")
    },

    // MapType surface: parse the JSON payload as map<string,int> and
    // exercise map functions (keys, cardinality, lookup). Keys serialize
    // to a string for the comparator (array cells are unhashable there).
    QuerySpec("map_ops",
      """SELECT event_id,
        |       array_to_string(json_keys(props), ',') AS keys_str,
        |       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
        |       CAST(props->>'k' AS INTEGER) AS k_val
        |FROM events WHERE (props->>'k') IS NOT NULL
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .filter(expr("element_at(m, 'k')").isNotNull)
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("keys_str"),
          size(col("m")).as("n_keys"),
          expr("element_at(m, 'k')").as("k_val"))
        .orderBy("event_id")
    },

    // Remaining analytic window functions: lead, first/last value over
    // an explicit frame, ntile — deterministic under the total
    // (ts, event_id) order.
    QuerySpec("window_lead",
      """SELECT event_id, user_id,
        |       lead(value) OVER w AS next_value,
        |       first_value(event_id) OVER w AS first_event,
        |       last_value(event_id) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND UNBOUNDED FOLLOWING) AS last_event,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("event_id")).over(w).as("first_event"),
        last(col("event_id")).over(wAll).as("last_event"),
        ntile(4).over(w).as("quartile"))
        .orderBy("event_id")
    }
  )
}
