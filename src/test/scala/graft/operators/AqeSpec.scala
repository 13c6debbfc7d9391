package graft.operators

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution — the runtime re-planning layer the engine
  * relies on at scale (SURVEY.md §4: AQE on, reference's own setting).
  * Asserts the coalescing actually happens rather than trusting the conf.
  */
class AqeSpec extends AnyFunSuite {

  test("AQE coalesces a small shuffle to fewer partitions at runtime") {
    val spark = TestSpark.spark
    val df = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .groupBy("event_type").count()
    df.collect() // materialize so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      plan)
    // 5 groups end up in far fewer partitions than the configured 4 —
    // the tiny shuffle collapses to 1.
    assert(df.rdd.getNumPartitions <= 2)
  }

  test("the reference's submit conf (shuffle.partitions=200) is safe " +
    "under AQE: the flagship's agg shuffle coalesces to <= cores " +
    "at runtime") {
    // SURVEY §2.8 O2: the reference submits with
    // spark.sql.shuffle.partitions=200 (spark_consumer_dag.py:42) —
    // 200 reducers for a fixture-sized window agg would be 200 tiny
    // tasks per microbatch. This pins the production story the engine
    // ships instead of the magic number: leave 200 configured and let
    // AQE's coalescer right-size the exchange from runtime stats, so
    // the knob is a CEILING (scale headroom), not a task-count bill
    // every small stage pays.
    val spark = TestSpark.spark
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try {
      val df = graft.operators.EventPipeline.flagship(
        Tables.t(spark, "/root/testdata/sf0.001", "events"),
        Tables.eventTypeDim(spark), Tables.eventPropsSchema)
      df.collect() // adaptive plan finalizes on execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead"), plan)
      val cores = spark.sparkContext.defaultParallelism
      val parts = df.rdd.getNumPartitions
      assert(parts <= cores,
        s"AQE must coalesce the 200-partition conf to <= $cores " +
          s"runtime partitions, got $parts")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
