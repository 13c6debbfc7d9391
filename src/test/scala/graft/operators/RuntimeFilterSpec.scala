package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the optimizer's
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` path: a selective
  * filter on one join side is turned into a bloom filter that prunes
  * the OTHER side's shuffle input before the join, the exact lever a
  * 100 TB fact⋈filtered-dim shuffle join needs when the dim is too big
  * to broadcast (broadcast joins don't need it — the hash set itself
  * prunes). Thresholds are production-scale by default (creation side
  * ≤ 10 MB plan size, application side ≥ 10 GB scan), so the test
  * overrides them to exercise the rewrite at fixture scale.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter on the fact side " +
    "of a shuffle join, result unchanged") {
    val spark = TestSpark.spark
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    def q() = Tables.t(spark, dir, "lineitem")
      .join(
        Tables.t(spark, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val expected = q().collect().toSeq
    try {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val filtered = q()
      val plan = filtered.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom"),
        s"expected an injected bloom filter, got:\n$plan")
      assert(filtered.collect().toSeq == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
