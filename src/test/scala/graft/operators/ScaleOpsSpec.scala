package graft.operators

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("salted aggregate equals the direct aggregate") {
    val spark = TestSpark.spark
    import spark.implicits._
    val events = Tables.t(spark, dir, "events")
    val direct = events.groupBy($"event_type".as("k"))
      .agg(sum(($"value").cast("decimal(12,2)")).as("total"),
        count(lit(1)).as("n"))
      .as[(String, BigDecimal, Long)].collect().toSet
    val salted = ScaleOps.saltedSumCount(
        events, $"event_type", $"value".cast("decimal(12,2)"), 8)
      .as[(String, BigDecimal, Long)].collect().toSet
    assert(salted == direct)
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    val spark = TestSpark.spark
    val wh = Files.createTempDirectory("graft-wh").toString
    // Bucketed write: both sides hash-bucketed by the join key — the
    // co-location that removes the per-query shuffle for repeated joins
    // (pay the shuffle once at write time).
    val orders = Tables.t(spark, dir, "orders")
    val customer = Tables.t(spark, dir, "customer")
    orders.write.format("parquet")
      .option("path", s"$wh/orders_b")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    customer.write.format("parquet")
      .option("path", s"$wh/customer_b")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    // Disable auto-broadcast: at test scale the dim fits the broadcast
    // threshold, which (correctly) bypasses bucketing. The bucketed plan
    // is the one that matters when BOTH sides are large.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join must not shuffle, got:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("broadcast enrich joins without shuffling the fact side") {
    val spark = TestSpark.spark
    val events = Tables.t(spark, dir, "events")
    val dim = Tables.eventTypeDim(spark)
    val joined = ScaleOps.broadcastEnrich(events, dim, Seq("event_type"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(joined.count() > 0)
  }
}
