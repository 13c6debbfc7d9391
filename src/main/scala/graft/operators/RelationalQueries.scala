package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational-surface extensions beyond SURVEY.md §2's core inventory:
  * the join variants, grouping-set family, subquery forms, and reshaping
  * operators a user of a general analytics engine reaches for next. All
  * built-in Spark, all oracle-checked; parity rules as in CoreQueries.
  */
object RelationalQueries {

  import Tables.t

  val all: Seq[QuerySpec] = Seq(

    // Left-semi join: existence filter without duplicating or widening
    // rows (the dedup/citation-lookup shape). Plans as a broadcast or
    // shuffled hash semi-join — the build side carries only the key.
    QuerySpec("semi_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 450000
        |                AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").as("c")
        .join(
          t(s, dir, "orders").filter(col("o_totalprice") > 450000 &&
            col("o_orderpriority") === "1-URGENT").as("o"),
          col("c.c_custkey") === col("o.o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Left-anti join: the complement — rows with NO match (training-data
    // "not already ingested" filter).
    QuerySpec("anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").as("c")
        .join(
          t(s, dir, "orders").filter(col("o_totalprice") > 450000 &&
            col("o_orderpriority") === "1-URGENT").as("o"),
          col("c.c_custkey") === col("o.o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Full outer join of two pre-aggregated sides: per-nation customer
    // vs supplier counts — null-extension on both sides. Aggregating
    // BEFORE the join keeps the shuffled sides one-row-per-key.
    QuerySpec("join_full",
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |           FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
        |           FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
        |FROM c FULL JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("nk"), "full_outer")
        .select(col("nk"), col("n_cust"), col("n_supp"))
        .orderBy("nk")
    },

    // Cube: all 4 grouping combinations in one pass (Expand-based — one
    // shuffle, ×4 map-side rows, partial agg collapses before exchange).
    QuerySpec("cube_agg",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
        |       SUM(l_quantity) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          (grouping(col("l_returnflag")) * 2 +
            grouping(col("l_linestatus"))).as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid").cast(IntegerType).as("gid"),
          col("sum_qty"), col("n"))
        .orderBy("gid", "rf", "ls")
    },

    // Explicit grouping sets (the general form rollup/cube sugar over):
    // by-flag and by-status marginals in one aggregation.
    QuerySpec("grouping_sets",
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       SUM(l_quantity) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
          |       COALESCE(l_linestatus, 'ALL') AS ls,
          |       SUM(l_quantity) AS sum_qty,
          |       COUNT(*) AS n
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
          |ORDER BY rf, ls""".stripMargin)
    },

    // Correlated EXISTS + uncorrelated scalar subquery through the SQL
    // entry path — Catalyst rewrites the EXISTS to a semi-join and the
    // scalar subquery to a broadcast single-row cross input.
    QuerySpec("exists_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 49)
        |  AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_sq")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_sq o
          |WHERE EXISTS (SELECT 1 FROM lineitem_sq l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_quantity >= 49)
          |  AND o_totalprice > (SELECT AVG(o_totalprice) FROM orders_sq)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Unpivot / melt: wide part metrics → long (metric, val) rows. The
    // oracle uses the portable UNION ALL phrasing of the same reshape.
    QuerySpec("unpivot_melt",
      """SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, 'retailprice' AS metric,
        |         p_retailprice AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size' AS metric,
        |         CAST(p_size AS DOUBLE) AS val FROM part
        |) ORDER BY p_partkey, metric""".stripMargin) { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice").as("retailprice"),
          col("p_size").cast(DoubleType).as("size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("retailprice"), col("size")), "metric", "val")
        .orderBy("p_partkey", "metric")
    },

    // TPC-H Q3 shape: 3-table join (selective dim filter first), grouped
    // decimal-exact revenue, top-10. The customer filter prunes before
    // the join; revenue aggregates partially map-side; the final top-k is
    // a TakeOrderedAndProject, not a global sort.
    QuerySpec("sql_tpch_q3",
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) {
      (s, dir) =>
        val cutoff = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(t(s, dir, "orders").filter(col("o_orderdate") < cutoff),
            col("c_custkey") === col("o_custkey"))
          .join(t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 6))).cast(DoubleType).as("revenue"))
          .select("l_orderkey", "revenue", "o_orderdate",
            "o_orderpriority")
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
    },

    // TPC-H Q5 shape: 6-table star join (region→nation selective dims,
    // fact tables pruned by date), local-supplier condition, grouped
    // decimal-exact revenue — the full join-reorder/pushdown workout
    // through the SQL entry path.
    QuerySpec("sql_tpch_q5",
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      Seq("customer", "orders", "lineitem", "supplier", "nation",
        "region").foreach(n =>
        t(s, dir, n).createOrReplaceTempView(n + "_q5"))
      s.sql(
        """SELECT n_name,
          |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
          |                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          |       COUNT(*) AS n
          |FROM customer_q5, orders_q5, lineitem_q5, supplier_q5,
          |     nation_q5, region_q5
          |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY n_name
          |ORDER BY revenue DESC, n_name""".stripMargin)
    },

    // Salted two-stage aggregation (ScaleOps.saltedSumCount): the
    // hot-key skew formulation must equal the naive GROUP BY — the
    // oracle IS the naive formulation. Decimal metric keeps the split
    // partial sums order-independent.
    QuerySpec("salted_agg",
      """SELECT event_type,
        |       CAST(SUM(TRY_CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |       COUNT(*) AS n
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, dir) =>
        ScaleOps.saltedSumCount(
          t(s, dir, "events").filter(col("value").isNotNull),
          col("event_type"), expr("try_cast(value as decimal(12,2))"),
          salts = 8)
          .select(col("k").as("event_type"),
            col("total").cast(DoubleType).as("total"), col("n"))
          .orderBy("event_type")
    },

    // One-pass column profiling (Profile.dataProfile): the data-quality
    // summary run before trusting a new drop — per column, row /
    // non-null / exact-distinct counts plus typed min/max off ONE
    // aggregate over one scan, reshaped in-plan via stack. Doubles
    // surface as integer-micro BIGINTs (float rendering is
    // engine-specific); timestamps through a pinned format; the
    // multi-column exact countDistinct plans as an EXPAND — swap in
    // approx_count_distinct for routine 100 TB profiles (scaladoc).
    QuerySpec("data_profile",
      """WITH p AS (
        |  SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
        |         COUNT(o_orderkey) AS n_nonnull,
        |         COUNT(DISTINCT o_orderkey) AS n_distinct,
        |         CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
        |         CAST(MAX(o_orderkey) AS VARCHAR) AS max_str,
        |         CAST(NULL AS BIGINT) AS min_micro,
        |         CAST(NULL AS BIGINT) AS max_micro
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
        |         COUNT(DISTINCT o_custkey),
        |         CAST(MIN(o_custkey) AS VARCHAR),
        |         CAST(MAX(o_custkey) AS VARCHAR),
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
        |         COUNT(DISTINCT o_orderstatus),
        |         CAST(MIN(o_orderstatus) AS VARCHAR),
        |         CAST(MAX(o_orderstatus) AS VARCHAR),
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority),
        |         COUNT(DISTINCT o_orderpriority),
        |         CAST(MIN(o_orderpriority) AS VARCHAR),
        |         CAST(MAX(o_orderpriority) AS VARCHAR),
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate),
        |         COUNT(DISTINCT o_orderdate),
        |         strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |         strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S'),
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(o_totalprice),
        |         COUNT(DISTINCT o_totalprice),
        |         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |         CAST(floor(MIN(o_totalprice) * 1000000 + 0.5) AS BIGINT),
        |         CAST(floor(MAX(o_totalprice) * 1000000 + 0.5) AS BIGINT)
        |  FROM orders)
        |SELECT * FROM p ORDER BY column_name""".stripMargin) { (s, dir) =>
      Profile.dataProfile(t(s, dir, "orders"), Seq(
          "o_orderkey" -> Profile.IntLike,
          "o_custkey" -> Profile.IntLike,
          "o_orderstatus" -> Profile.StrLike,
          "o_orderpriority" -> Profile.StrLike,
          "o_orderdate" -> Profile.TsLike,
          "o_totalprice" -> Profile.DblLike))
        .orderBy("column_name")
    },

    // Declarative data-quality gate (Profile.qualityChecks): the
    // admit-or-reject decision a pipeline runs before a drop enters
    // the corpus stores — completeness ratios, key uniqueness, and
    // numeric range containment, ALL off one aggregate over one scan,
    // observations integer-micro so pass/fail AND the observed value
    // hash identically across engines.
    QuerySpec("quality_checks",
      """WITH a AS (SELECT COUNT(*) AS n_rows,
        |  COUNT(o_custkey) AS cc, COUNT(o_orderstatus) AS cs,
        |  COUNT(o_orderkey) AS ckn,
        |  COUNT(DISTINCT o_orderkey) AS ckd,
        |  CAST(floor(MIN(o_totalprice) * 1000000 + 0.5) AS BIGINT)
        |    AS mn,
        |  CAST(floor(MAX(o_totalprice) * 1000000 + 0.5) AS BIGINT)
        |    AS mx
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'complete' AS check_name, 'o_custkey' AS column_name,
        |    CAST(floor(cc * 1000000.0 / greatest(n_rows, 1)) AS BIGINT)
        |      AS observed,
        |    n_rows = 0 OR CAST(cc AS HUGEINT) * 1000000 >=
        |      CAST(n_rows AS HUGEINT) * 1000000 AS passed
        |  FROM a
        |  UNION ALL
        |  SELECT 'complete', 'o_orderstatus',
        |    CAST(floor(cs * 1000000.0 / greatest(n_rows, 1)) AS BIGINT),
        |    n_rows = 0 OR CAST(cs AS HUGEINT) * 1000000 >=
        |      CAST(n_rows AS HUGEINT) * 900000 FROM a
        |  UNION ALL
        |  SELECT 'unique', 'o_orderkey', ckd, ckd = ckn FROM a
        |  UNION ALL
        |  SELECT 'in_range', 'o_totalprice',
        |    coalesce(CASE WHEN mn < 0 THEN mn ELSE mx END, 0),
        |    mn IS NULL OR (mn >= 0 AND mx <= 600000000000) FROM a)
        |ORDER BY check_name, column_name""".stripMargin) { (s, dir) =>
      Profile.qualityChecks(t(s, dir, "orders"), Seq(
          Profile.Complete("o_custkey", 1000000L),
          Profile.Complete("o_orderstatus", 900000L),
          Profile.Unique("o_orderkey"),
          Profile.InRange("o_totalprice", 0L, 600000000000L)))
        .orderBy("check_name", "column_name")
    }
  )
}
