package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-robustness contracts of the dedup operators: bounded LSH bucket
  * expansion under skew, salted label propagation for hub nodes, the
  * incremental broadcast fallback, and memoized-cache lifecycle.
  */
class DedupScaleSpec extends AnyFunSuite {

  private def docsWithShingles(n: Int, shingles: Seq[String]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    (0 until n).map(i => (i.toLong, shingles)).toDF("doc_id", "sh")
  }

  test("LSH bucket cap bounds pair expansion under a hot bucket") {
    val sh = (1 to 10).map(i => s"tok a $i")
    // Under the cap: B identical docs ⇒ all B(B-1)/2 verified pairs.
    val small = Dedup.minhashNearDupPairs(docsWithShingles(10, sh), 4, 5)
    assert(small.count() == 45)
    // A hot (band, sig) bucket beyond BandCap emits the bounded STAR
    // (min id × each other member: B−1 pairs, linear) instead of the
    // B²/2 full expansion — or, pre-round-5, instead of being DROPPED:
    // identical docs have identical sigs in every band (bands are
    // fully correlated at j≈1), so a drop would lose the whole
    // near-identical group, the most important one to dedup.
    val n = Dedup.BandCap + 50
    val big = Dedup.minhashNearDupPairs(docsWithShingles(n, sh), 4, 5)
    val pairs = big.collect()
    assert(pairs.length == n - 1, "star = min id paired with each member")
    assert(pairs.forall(r => r.getLong(0) == 0L && r.getDouble(2) == 1.0))
    // Connectivity survives the cap: one cluster, labeled by the min.
    val clusters = Dedup.nearDupClusters(big.select("da", "db"))
    assert(clusters.select("cluster_id").distinct().count() == 1)
  }

  test("salted propagateStep: identical labels, salt visible in plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Star graph: hub 0 with 200 spokes — the shape that concentrates
    // one join key's rows in a single task when unsalted.
    val pairs = (1L to 200L).map(i => (0L, i)).toDF("da", "db")
    val edges = pairs.select(col("da").as("a"), col("db").as("b"))
      .union(pairs.select(col("db").as("a"), col("da").as("b")))
    val labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
    val plain = Dedup.propagateStep(edges, labels, saltBuckets = 0)
    val salted = Dedup.propagateStep(edges, labels, saltBuckets = 4)
    assert(salted.queryExecution.executedPlan.toString.contains("salt"),
      "salted plan should join on the salt column")
    assert(plain.orderBy("id").collect().toSeq ==
      salted.orderBy("id").collect().toSeq)
    // End-to-end: salted clustering converges to the same labels.
    val a = Dedup.nearDupClusters(pairs).orderBy("doc_id").collect().toSeq
    val b = Dedup.nearDupClusters(pairs, saltBuckets = 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("incremental dedup: shuffle-join fallback ≡ broadcast path") {
    val spark = TestSpark.spark
    val sh = Dedup.docShingles(
      graft.Tables.t(spark, "/root/testdata/sf0.001", "documents"))
    val corpus = sh.filter(col("doc_id") % 2 =!= 0)
    val incoming = sh.filter(col("doc_id") % 2 === 0)
    def run(bc: Option[Boolean]) =
      Dedup.incrementalNearDupPairs(corpus, incoming, 4, 5,
        broadcastIncoming = bc)
        .orderBy("new_id", "corpus_id").collect().toSeq
    val viaBroadcast = run(Some(true))
    assert(viaBroadcast.nonEmpty)
    assert(run(Some(false)) == viaBroadcast)
    // Auto mode: the size guard decides (tiny incoming ⇒ broadcast) —
    // same output either way; the point is the decision happens inside
    // the operator, not as caller discipline.
    assert(run(None) == viaBroadcast)
  }

  test("clearCaches releases every memoized persisted DataFrame") {
    val spark = TestSpark.spark
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val sh = Dedup.docShingles(docs, cacheKey = "lifecycle-test")
    // Memoization: same key returns the same plan; clustering runs the
    // full chain so the persisted intermediates materialize. Touch
    // every named cache (shingles, bands, pairs, clusters, terms) so
    // the release assertion covers them all.
    assert(Dedup.docShingles(docs, cacheKey = "lifecycle-test") eq sh)
    Dedup.clusters(sh, 4, 5, cacheKey = "lifecycle-test").count()
    assert(Dedup.bandSignatures(sh, cacheKey = "lifecycle-test")
      .count() > 0)
    assert(Pipeline.docTerms(docs, cacheKey = "lifecycle-test")
      .count() > 0)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "expected memoized intermediates to be persisted")
    Dedup.clearCaches(spark)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "clearCaches must unpersist every memoized DataFrame")
  }
}
