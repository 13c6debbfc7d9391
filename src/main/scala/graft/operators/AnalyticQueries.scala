package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extension surface beyond the reference (SURVEY.md §2.9 X5–X7): ranking /
  * analytic windows, rollup grouping sets, and set operations — all
  * built-in Spark, all oracle-checked.
  */
object AnalyticQueries {

  import Tables.t

  /** The ordered view→click→purchase min-chain shared by
    * funnel_steps / funnel_latency / funnel_latency_approx — ONE
    * definition so the three gates grade the same funnel (strict-'>'
    * step ordering, chained per-user MIN aggregates, never a
    * per-user sequence sort). Returns the per-user first-qualifying
    * timestamps (t1), (t2), (t3) frames.
    */
  private def funnelStages(e: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    (v, c, p)
  }

  /** The rolling z-score oracle, shared VERBATIM by `anomaly_zscore`
    * (batch, ScaleOps.rollingZScore) and the streaming replay
    * `streaming_zscore` (StatefulOps.zScores) — stream/batch parity
    * on an in-order feed is the declared contract, so the converged
    * streamed table must equal the batch window query exactly.
    */
  val anomalyZscoreSql: String =
    """SELECT event_id, user_id, n_w, z_micro,
      |       z_micro IS NOT NULL AND abs(z_micro) >= 2000000
      |         AS is_anomaly
      |FROM (
      |  SELECT event_id, user_id, CAST(n AS INTEGER) AS n_w,
      |         CASE WHEN n >= 5 AND n*ss - s*s > 0
      |              THEN CAST(round(CAST(n*x - s AS DOUBLE)
      |                     / sqrt(CAST(n*ss - s*s AS DOUBLE))
      |                     * 1000000) AS BIGINT)
      |              ELSE NULL END AS z_micro
      |  FROM (
      |    SELECT event_id, user_id, x,
      |           COUNT(*) OVER w AS n,
      |           CAST(SUM(x) OVER w AS BIGINT) AS s,
      |           CAST(SUM(x*x) OVER w AS BIGINT) AS ss
      |    FROM (SELECT event_id, user_id, ts,
      |                 CAST(round(value * 1000) AS BIGINT) AS x
      |          FROM events)
      |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)))
      |ORDER BY event_id""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // X5: ranking + analytic window functions over an ordered partition.
    // Scale note: partitioned by user_id → shuffles once on user_id; no
    // global sort.
    QuerySpec("window_rank",
      """SELECT event_id, user_id,
        |       row_number() OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS rn,
        |       lag(value) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id) AS prev_value,
        |       CAST(SUM(TRY_CAST(value AS DECIMAL(12,2))) OVER (
        |              PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS moving_sum
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        row_number().over(w).as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        // decimal-exact 4-row sum surfaced as DOUBLE (trailing-zero trap)
        sum(expr("try_cast(value as decimal(12,2))"))
          .over(w.rowsBetween(-3, 0))
          .cast(DoubleType).as("moving_sum"))
        .orderBy("event_id")
    },

    // X6: rollup over the star schema; explicit gid so the grouping-bit
    // layout is engine-independent.
    QuerySpec("rollup_agg",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2)))
        |            AS DOUBLE) AS sum_price,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls, gid""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          // exact decimal sum surfaced as DOUBLE (trailing-zero trap —
          // '...23.60' vs '...23.6' at sf0.1's grand total)
          sum(expr("try_cast(l_extendedprice as decimal(12,2))"))
            .cast(DoubleType).as("sum_price"),
          count(lit(1)).as("n"),
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid").cast(IntegerType).as("gid"),
          col("sum_qty"), col("sum_price"), col("n"))
        // gid totalizes the sort: the 'ALL' sentinel conflates a
        // genuine NULL group value with the rollup subtotal, and two
        // such rows tie on (rf, ls) with different aggregates.
        .orderBy("rf", "ls", "gid")
    },

    // Ordered aggregate: exact interpolated percentiles (Spark
    // `percentile` ≡ DuckDB `quantile_cont`, verified bit-exact).
    QuerySpec("percentile_agg",
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS med_qty,
        |       quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // Scale-safe quantiles: the SAME report as percentile_agg through
    // approx_percentile — the form a 100×-users deployment runs. Exact
    // `percentile` buffers every group value in one agg buffer (a
    // single-reducer sort at the group's row count); approx_percentile
    // is a bounded GK sketch that merges two-stage like any partial
    // aggregate, so memory is O(accuracy) regardless of corpus size.
    // With accuracy ≥ group row count the sketch degenerates to the
    // exact discrete quantile (rank error ≤ n/accuracy < 1), verified
    // bit-equal to DuckDB quantile_disc at every tested SF — so the
    // oracle pins exactness here while ApproxAggSpec pins the rank-
    // error bound at production accuracies. Deployment guidance: keep
    // accuracy at 10⁴–10⁵ at 100× scale and accept rank error
    // n/accuracy; never switch back to exact `percentile`.
    QuerySpec("percentile_approx_agg",
      """SELECT l_returnflag,
        |       quantile_disc(l_quantity, 0.5) AS med_qty,
        |       quantile_disc(l_extendedprice, 0.25) AS p25_price,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_quantity, 0.5, 1000000)")
            .as("med_qty"),
          expr("approx_percentile(l_extendedprice, 0.25, 1000000)")
            .as("p25_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // SQL entry path: the same engine surface through spark.sql over a
    // registered view (TPC-H Q1 shape with parity-safe decimal sums —
    // 2-dec × 2-dec products have ≤4 decimals, so DECIMAL(18,6) casts
    // recover the exact value in both engines; final sums surface as
    // DOUBLE — unscaled micro-units stay < 2^53, so conversion is exact).
    QuerySpec("sql_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2)))
        |            AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,6))) AS DOUBLE)
        |         AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       SUM(l_quantity) AS sum_qty,
          |       CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2)))
          |            AS DOUBLE) AS sum_base_price,
          |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
          |                     AS DECIMAL(18,6))) AS DOUBLE)
          |         AS sum_disc_price,
          |       COUNT(*) AS count_order
          |FROM lineitem_v
          |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    // Distinct aggregation (expand-based two-phase distinct) + plain agg
    // in one pass — the aggregate class the reference never uses
    // (SURVEY.md §2.4 note).
    QuerySpec("count_distinct",
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS users,
        |       COUNT(*) AS events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("users"),
            count(lit(1)).as("events"))
          .orderBy("event_type")
    },

    // Sessionization (gaps-and-islands): a new session starts after a
    // >30-minute silence per user. Interval comparison is µs-exact in
    // both engines. One shuffle on user_id; running sum stays inside the
    // same window partition.
    QuerySpec("sessionize",
      """SELECT event_id, user_id, session_seq FROM (
        |  SELECT event_id, user_id,
        |         -- DuckDB window SUM(INTEGER) → HUGEINT (pandas float):
        |         -- cast to BIGINT to match Spark's LongType exactly.
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS session_seq
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |           CASE WHEN prev_ts IS NULL
        |                  OR ts - prev_ts > INTERVAL 30 minutes
        |                THEN 1 ELSE 0 END AS is_new
        |    FROM (SELECT event_id, user_id, ts,
        |                 lag(ts) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_ts
        |          FROM events)
        |  )
        |) ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        // µs-exact interval comparison (an epoch-seconds cast would floor
        // and disagree with the oracle on sub-second gaps).
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            (col("ts") - col("prev_ts")) > expr("INTERVAL 30 MINUTES"),
            lit(1)).otherwise(lit(0)))
        .withColumn("session_seq",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding,
            0)))
        .select("event_id", "user_id", "session_seq")
        .orderBy("event_id")
    },

    // Range self-join: same-user event pairs within 60 s, via bucketed
    // banding (ScaleOps.bucketedRangeSelfJoin — equi-join on time
    // buckets, never an inequality nested loop). Oracle: the plain
    // inequality join, tractable at oracle scale.
    QuerySpec("range_join",
      """SELECT a.user_id, a.event_id AS ea, b.event_id AS eb,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
        |ORDER BY ea, eb""".stripMargin) { (s, dir) =>
      ScaleOps.bucketedRangeSelfJoin(
        t(s, dir, "events"),
        col("user_id"), col("event_id"), unix_micros(col("ts")),
        60000000L)
        .select(col("k").as("user_id"), col("ea"), col("eb"),
          col("gap_us"))
        .orderBy("ea", "eb")
    },

    // As-of join: each error event matched to the latest prior click by
    // the same user (graft.operators.AsOfJoin — union + carry-forward
    // window; oracle uses DuckDB's native ASOF JOIN, so two independent
    // implementations must agree).
    QuerySpec("asof_join",
      """WITH clicks AS (SELECT user_id, ts, event_id FROM events
        |                WHERE event_type = 'click'),
        |     errors AS (SELECT user_id, ts, event_id FROM events
        |                WHERE event_type = 'error')
        |SELECT e.event_id AS error_id, e.user_id,
        |       c.event_id AS asof_click_id, c.ts AS asof_click_ts
        |FROM errors e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts
        |ORDER BY error_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_id"), col("ts").as("click_ts"))
      AsOfJoin.leftAsOf(errors, clicks, "user_id", "ts",
        Seq("click_id", "click_ts"))
        .select(col("error_id"), col("user_id"),
          col("asof_click_id"), col("asof_click_ts"))
        .orderBy("error_id")
    },

    // Pivot (fixed value list → deterministic schema): per-user event
    // counts, one column per event type. Oracle: conditional aggregation.
    QuerySpec("pivot_counts",
      """SELECT user_id,
        |       COUNT(*) FILTER (WHERE event_type = 'click') AS "click",
        |       COUNT(*) FILTER (WHERE event_type = 'error') AS "error",
        |       COUNT(*) FILTER (WHERE event_type = 'purchase')
        |         AS "purchase",
        |       COUNT(*) FILTER (WHERE event_type = 'signup') AS "signup",
        |       COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) {
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          // Scoped fill: an unscoped na.fill(0) would ALSO rewrite a
          // NULL user_id grouping key to 0 (the oracle keeps it NULL).
          .na.fill(0L, Seq("click", "error", "purchase", "signup",
            "view"))
          .orderBy("user_id")
    },

    // Ordered collect aggregates: set-collect → sort → join to a string,
    // and positional array reassembly (collect_list is unordered by
    // contract — determinism comes from sorting the collected structs).
    QuerySpec("string_agg",
      """SELECT l_returnflag,
        |       array_to_string(list_sort(list_distinct(
        |         list(l_linestatus))), ',') AS statuses,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          array_join(array_sort(collect_set(col("l_linestatus"))), ",")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // X7: union / intersect / except over customer segments, tagged and
    // stacked so one deterministic result exercises all three.
    QuerySpec("set_ops",
      """WITH a AS (SELECT c_custkey FROM customer
        |           WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, c_custkey
        |  FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey
        |  FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, c_custkey
        |  FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
        |ORDER BY op, c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val a = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
      a.union(b).distinct().withColumn("op", lit("union"))
        .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .select("op", "c_custkey")
        .orderBy("op", "c_custkey")
    },

    // X5: rolling z-score anomaly detection over the event stream
    // (ScaleOps.rollingZScore — see its scaladoc for the integer-moment
    // exactness argument and the per-user shuffle shape). Testdata
    // headroom for the int64 moments: x ≤ ~5.6e5 millis ⇒ n·SS ≤
    // ~1.3e14 ≪ int64 max.
    QuerySpec("anomaly_zscore", anomalyZscoreSql) { (s, dir) =>
      ScaleOps.rollingZScore(t(s, dir, "events"),
        frame = 20, minN = 5, threshMicro = 2000000L)
        .orderBy("event_id")
    },

    // Ordered conversion funnel (view → click after it → purchase after
    // that), the product-analytics staple. Each step is a per-user MIN
    // aggregate joined to the previous step's timestamp — all three
    // shuffles key on user_id (co-partitioned, AQE-reusable), never a
    // per-user sequence sort or collect_list. Strict `>` ordering makes
    // ties engine-independent.
    QuerySpec("funnel_steps",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |      GROUP BY e.user_id)
        |SELECT CAST(ord AS INTEGER) AS ord, step, n_users FROM (
        |  SELECT 1 AS ord, 'view' AS step, COUNT(*) AS n_users FROM v
        |  UNION ALL
        |  SELECT 2, 'view>click', COUNT(*) FROM c
        |  UNION ALL
        |  SELECT 3, 'view>click>purchase', COUNT(*) FROM p)
        |ORDER BY ord""".stripMargin) { (s, dir) =>
      val (v, c, p) = funnelStages(t(s, dir, "events"))
      def step(df: org.apache.spark.sql.DataFrame, ord: Int,
          name: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(ord).as("ord"), lit(name).as("step"),
            col("n_users"))
      step(v, 1, "view")
        .unionByName(step(c, 2, "view>click"))
        .unionByName(step(p, 3, "view>click>purchase"))
        .orderBy("ord")
    },

    // Cohort retention matrix: users grouped by first-seen day, counted
    // on each later active day offset — the engagement-decay table.
    // Distinct (user, day) first (one user-keyed shuffle), first-seen
    // MIN on the same key, then a day-granular aggregate; the heavy
    // per-event table collapses before anything joins.
    QuerySpec("cohort_retention",
      """WITH a AS (SELECT DISTINCT user_id,
        |                  date_trunc('day', ts) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS d0 FROM a GROUP BY user_id)
        |SELECT CAST(d0 AS TIMESTAMP) AS cohort_day,
        |       CAST(date_diff('day', d0, d) AS INTEGER) AS day_offset,
        |       COUNT(*) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY d0, date_diff('day', d0, d)
        |ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .distinct()
      val f = a.groupBy("user_id").agg(min("d").as("d0"))
      a.join(f, "user_id")
        .select(col("d0").as("cohort_day"),
          datediff(col("d"), col("d0")).as("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // Behavioral path mining: top event-type trigrams along each user's
    // timeline (lead ×2 over the per-user window, then a bounded
    // |types|³ aggregate + top-k). One shuffle on user_id; no sequence
    // collection — the window emits trigrams row-by-row.
    QuerySpec("event_paths",
      """SELECT e1, e2, e3, COUNT(*) AS n FROM (
        |  SELECT event_type AS e1,
        |         lead(event_type, 1) OVER w AS e2,
        |         lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY n DESC, e1, e2, e3 LIMIT 25""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy("e1", "e2", "e3")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        .limit(25)
    },

    // Funnel latency distribution: time-to-convert (first view → the
    // funnel's ordered purchase) for converting users. The diff is
    // exact integer MICROS (date_diff('microsecond') ≡ unix_micros
    // subtraction), quantiles via the percentile_agg-established
    // quantile_cont ≡ percentile parity. Same co-partitioned per-user
    // aggregate chain as funnel_steps; the final aggregate is one row.
    // Scale note: exact `percentile` buffers all converting users'
    // diffs in one reducer — a 100×-users deployment runs the
    // funnel_latency_approx twin below (bounded GK sketch) instead.
    QuerySpec("funnel_latency",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |      GROUP BY e.user_id),
        |d AS (SELECT p.user_id,
        |             date_diff('microsecond', v.t1, p.t3) AS dt_us
        |      FROM p JOIN v USING (user_id))
        |SELECT COUNT(*) AS n_users,
        |       CAST(MIN(dt_us) AS BIGINT) AS min_us,
        |       quantile_cont(dt_us, 0.5) AS p50_us,
        |       quantile_cont(dt_us, 0.9) AS p90_us,
        |       CAST(MAX(dt_us) AS BIGINT) AS max_us
        |FROM d""".stripMargin) { (s, dir) =>
      val (v, c, p) = funnelStages(t(s, dir, "events"))
      p.join(v, "user_id")
        .select((unix_micros(col("t3")) - unix_micros(col("t1")))
          .as("dt_us"))
        .agg(
          count(lit(1)).as("n_users"),
          min(col("dt_us")).as("min_us"),
          expr("percentile(dt_us, 0.5)").as("p50_us"),
          expr("percentile(dt_us, 0.9)").as("p90_us"),
          max(col("dt_us")).as("max_us"))
    },

    // Scale-safe twin of funnel_latency: identical per-user MIN chain,
    // but the one-row distribution summary uses approx_percentile —
    // exact `percentile` pulls EVERY converting user's diff into one
    // reducer's sort buffer, which is the single scale hazard in the
    // exact form (fine at tested SFs, a straggler at 100× users). The
    // GK sketch caps that buffer at O(accuracy) and merges two-stage;
    // accuracy 10⁶ ≥ converting-user count at every tested SF, so the
    // quantile_disc oracle pins it exactly (see percentile_approx_agg
    // for the accuracy/error-bound deployment guidance). dt_us is
    // integer micros, so both engines agg over BIGINT — no float
    // interpolation anywhere.
    QuerySpec("funnel_latency_approx",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |      GROUP BY e.user_id),
        |d AS (SELECT p.user_id,
        |             date_diff('microsecond', v.t1, p.t3) AS dt_us
        |      FROM p JOIN v USING (user_id))
        |SELECT COUNT(*) AS n_users,
        |       CAST(quantile_disc(dt_us, 0.5) AS BIGINT) AS p50_us,
        |       CAST(quantile_disc(dt_us, 0.9) AS BIGINT) AS p90_us
        |FROM d""".stripMargin) { (s, dir) =>
      val (v, c, p) = funnelStages(t(s, dir, "events"))
      p.join(v, "user_id")
        .select((unix_micros(col("t3")) - unix_micros(col("t1")))
          .as("dt_us"))
        .agg(
          count(lit(1)).as("n_users"),
          expr("approx_percentile(dt_us, 0.5, 1000000)").as("p50_us"),
          expr("approx_percentile(dt_us, 0.9, 1000000)").as("p90_us"))
    },

    // Key-skew diagnostic: the hottest shuffle keys and their share of
    // the table — the report read before choosing salting / AQE skew
    // handling. One hash-aggregate + top-k; the scalar total broadcasts
    // back (never a window over the table). share is exact-int ÷
    // exact-int.
    QuerySpec("skew_report",
      """SELECT user_id, COUNT(*) AS n_events,
        |       CAST(COUNT(*) AS DOUBLE)
        |         / (SELECT COUNT(*) FROM events) AS share
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin) {
      (s, dir) =>
        val e = t(s, dir, "events")
        val tot = e.agg(count(lit(1)).as("n_total"))
        e.groupBy("user_id").agg(count(lit(1)).as("n_events"))
          .crossJoin(broadcast(tot))
          .withColumn("share",
            expr("cast(n_events as double) / n_total"))
          .select("user_id", "n_events", "share")
          .orderBy(col("n_events").desc, col("user_id"))
          .limit(10)
    }
  )
}
