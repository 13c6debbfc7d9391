package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates — the sketch family a 100 TB pipeline uses
  * when exact distinct/quantiles would shuffle too much. No DuckDB
  * oracle (sketch implementations differ across engines), so the
  * contract asserted is the published error bound against the exact
  * answer on real data.
  */
class ApproxAggSpec extends AnyFunSuite {

  test("approx_count_distinct within its rsd bound of the exact count") {
    val spark = TestSpark.spark
    val ev = Tables.t(spark, "/root/testdata/sf0.01", "events")
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.05))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val spark = TestSpark.spark
    val li = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)"))
      .head().getDouble(0)
    val approx = li.select(
      expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx=$approx exact=$exact")
  }

  /** The GK guarantee the scale-safe quantile queries
    * (percentile_approx_agg / funnel_latency_approx) rely on at
    * PRODUCTION accuracies, where the sketch is genuinely lossy: the
    * returned value's RANK is within n/accuracy of the target rank.
    * Asserted on a mostly-distinct column (l_extendedprice — the hard
    * case; duplicates only make rank error easier) at an accuracy two
    * orders below the row count.
    */
  test("approx_percentile rank error stays within n/accuracy at a " +
    "lossy accuracy") {
    val spark = TestSpark.spark
    val li = Tables.t(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_extendedprice").as("x")).persist()
    try {
      val n = li.count().toDouble
      val accuracy = 500
      for (p <- Seq(0.25, 0.5, 0.9)) {
        val v = li.select(
          expr(s"approx_percentile(x, $p, $accuracy)")).head().getDouble(0)
        // rank band of v: [#(x < v), #(x <= v)] — the sketch is within
        // bound if that band overlaps [target - n/acc, target + n/acc].
        val below = li.filter(col("x") < v).count().toDouble
        val atOrBelow = li.filter(col("x") <= v).count().toDouble
        val target = p * n
        val slack = n / accuracy + 1
        assert(below <= target + slack && atOrBelow >= target - slack,
          s"p=$p v=$v rank band [$below, $atOrBelow] vs target $target" +
            s" ± $slack (n=$n)")
      }
    } finally li.unpersist(): Unit
  }
}
