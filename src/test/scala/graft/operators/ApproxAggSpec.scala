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
}
