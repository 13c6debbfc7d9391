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
}
