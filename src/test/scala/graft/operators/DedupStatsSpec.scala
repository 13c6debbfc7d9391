package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Internal-consistency contracts for the dedup-reporting and
  * corpus-analysis aggregates (their values are oracle-checked by the
  * driver gate; these pin the invariants a REPORT consumer relies on).
  */
class DedupStatsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  test("clusterStats histogram reconciles with the labeling") {
    val spark = TestSpark.spark
    val cl = Dedup.clusters(
      Dedup.docShingles(Tables.t(spark, dir, "documents"),
        cacheKey = dir), 4, 5, cacheKey = dir)
    val stats = Dedup.clusterStats(cl)
    val total = stats
      .agg(sum(col("cluster_size") * col("n_clusters"))).head().getLong(0)
    assert(total == cl.count(),
      "histogram mass must equal labeled docs")
    assert(stats.agg(min("cluster_size")).head().getLong(0) >= 2,
      "a near-dup cluster has at least two members")
  }

  test("sourceDupStats totals reconcile with corpus and labeling") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, dir, "documents")
    val cl = Dedup.clusters(
      Dedup.docShingles(docs, cacheKey = dir), 4, 5, cacheKey = dir)
    val stats = Dedup.sourceDupStats(docs, cl)
    assert(stats.agg(sum("n_docs")).head().getLong(0) == docs.count())
    val nonCanonical = cl.count() -
      cl.select("cluster_id").distinct().count()
    assert(stats.agg(sum("n_dup")).head().getLong(0) == nonCanonical,
      "per-source dup counts must sum to the non-canonical member count")
  }

  test("termLift respects support, k, and per-source rank order") {
    val spark = TestSpark.spark
    val lift = Corpus.termLift(Tables.t(spark, dir, "documents"),
      minCount = 5, k = 3, cacheKey = dir)
    assert(lift.filter(col("c_st") < 5).isEmpty)
    assert(lift.filter(col("rk") > 3 || col("rk") < 1).isEmpty)
    assert(lift.filter(col("lift_micro") < 0).isEmpty)
    // rk must follow (lift_micro DESC, term) within each source.
    val misordered = lift.as("a").join(lift.as("b"),
      col("a.source") === col("b.source") &&
        col("a.rk") < col("b.rk") &&
        (col("a.lift_micro") < col("b.lift_micro") ||
          (col("a.lift_micro") === col("b.lift_micro") &&
            col("a.term") > col("b.term"))))
    assert(misordered.isEmpty)
  }
  test("qualityKeepers elects the highest-score member; ties fall to " +
    "the min doc_id; n_members counts the whole cluster") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Cluster 1: scores 5e5 / 9e5 / 9e5 — the 9e5 tie breaks to doc 2
    // (min-id election would have kept doc 1, the worst copy).
    // Cluster 10: exact score tie — falls back to the min-id keeper.
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L)).toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 500000L), (2L, 900000L), (3L, 900000L),
      (10L, 100000L), (11L, 100000L)).toDF("doc_id", "score_micro")
    val out = Dedup.qualityKeepers(clusters, quality)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 3L, 900000L), (10L, 10L, 2L, 100000L)))
  }
}
