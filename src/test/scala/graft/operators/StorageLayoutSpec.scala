package graft.operators

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout capabilities that only matter at scale: partitioned
  * writes whose reads prune directories, and bucketed tables whose
  * equi-joins skip the shuffle entirely. Both asserted on the physical
  * plan, not just the result.
  */
class StorageLayoutSpec extends AnyFunSuite {

  test("partitionBy write → filtered read prunes partitions at the scan") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    Tables.t(spark, "/root/testdata/sf0.001", "events")
      .write.partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // Partition pruning: the filter lands in PartitionFilters, and only
    // the click directory is read.
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"))
    val expected = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "click").count()
    assert(q.count() == expected)
  }

  test("repartitionByRange + sortWithinPartitions plans range exchange " +
    "and in-partition sort (the sorted-layout write shape)") {
    val spark = TestSpark.spark
    val q = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .repartitionByRange(4, col("ts"))
      .sortWithinPartitions("ts")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(plan.contains("Sort"), plan)
    // Globally ordered across partition boundaries once written in
    // partition order (range exchange gives disjoint, ordered ranges).
    assert(q.count() == 1000)
  }

  test("bucketed tables equi-join with zero exchanges") {
    val spark = TestSpark.spark
    val wh = Files.createTempDirectory("graft-wh").toString
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    ev.select("event_id", "user_id", "value")
      .write.bucketBy(4, "user_id").sortBy("user_id")
      .option("path", s"$wh/ev_a").mode("overwrite").saveAsTable("ev_a")
    ev.select(col("event_id").as("eb"), col("user_id"))
      .write.bucketBy(4, "user_id").sortBy("user_id")
      .option("path", s"$wh/ev_b").mode("overwrite").saveAsTable("ev_b")

    // At test scale the planner prefers a broadcast join (and skips the
    // bucket layout entirely); disable it to exercise the shape the
    // layout exists for — the 100 TB sort-merge path.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      // Co-located bucketed join: no Exchange on either side.
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() > 0)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE ev_a")
    spark.sql("DROP TABLE ev_b")
  }
}
