package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The declared bloom_pruned_join query: the bloom filter must
  * actually be injected into the plan the query executes, and the
  * materialized result must equal the plain formulation run without
  * any overrides (bloom pruning is semantics-neutral).
  */
class ScaleQueriesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bloom_pruned_join: bloom filter injected under the query's " +
    "confs; result equals the plain join; confs restored") {
    val spark = TestSpark.spark
    val plain = ScaleQueries.bloomJoin(spark, dir)
      .orderBy("o_orderkey").collect().toSeq
    val before = ScaleQueries.bloomConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    // Plan shape under the declared query's confs (same frame the
    // query checkpoints).
    val prev = before
    try {
      ScaleQueries.bloomConfs.foreach { case (k, v) =>
        spark.conf.set(k, v)
      }
      val plan = ScaleQueries.bloomJoin(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom"),
        s"expected an injected bloom filter, got:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    // The declared query end-to-end: same rows, and it leaves the
    // session confs exactly as it found them.
    val spec = ScaleQueries.all.find(_.name == "bloom_pruned_join").get
    val viaQuery = spec.fn(spark, dir).collect().toSeq
    assert(viaQuery == plain)
    ScaleQueries.bloomConfs.keys.foreach { k =>
      assert(spark.conf.getOption(k) == before(k), s"conf $k leaked")
    }
  }
}
