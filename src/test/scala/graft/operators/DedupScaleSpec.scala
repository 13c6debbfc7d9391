package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-robustness contracts of the dedup operators: bounded LSH bucket
  * expansion under skew, salted label propagation for hub nodes, the
  * incremental broadcast fallback, and memoized-cache lifecycle.
  */
class DedupScaleSpec extends AnyFunSuite {

  // sh carries pre-hashed int64 shingle keys (the Shingles3 output
  // contract); any distinct longs model a shingle set.
  private def docsWithShingles(n: Int, shingles: Seq[Long]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    (0 until n).map(i => (i.toLong, shingles)).toDF("doc_id", "sh")
  }

  test("bowDedup: permutation- and repetition-invariant key, order-" +
    "sensitive content distinguishes, first doc_id wins, null/empty " +
    "share the empty group") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "delta gamma beta alpha"),          // permutation → dup of 0
      (2L, "alpha beta gamma delta alpha beta"), // repetition → dup of 0
      (3L, "alpha beta gamma epsilon"),        // different token set
      (4L, null.asInstanceOf[String]),         // null → empty group
      (5L, ""),                                // empty → empty group
      (6L, "Alpha, BETA; gamma... delta!")     // normalization → dup of 0
    ).toDF("doc_id", "text")
    val out = Dedup.bowDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(out.size == 7)
    val k0 = out(0L)._1
    Seq(1L, 2L, 6L).foreach { d =>
      assert(out(d)._1 == k0 && !out(d)._2,
        s"doc $d must share doc 0's bag-of-words key and be dropped")
    }
    assert(out(0L)._2, "lowest doc_id must be kept")
    assert(out(3L)._1 != k0 && out(3L)._2)
    assert(out(4L)._1 == out(5L)._1 && out(4L)._2 && !out(5L)._2,
      "null and empty text form one group; the first is its keeper")
  }

  test("LSH bucket cap bounds pair expansion under a hot bucket") {
    val sh = (1 to 10).map(i => 0xABCD0000L + i)
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

  test("simhashNearDupPairs: identical docs pair at hamming 0; hot " +
    "chunk buckets prune (ChunkCap), unrelated docs never pair") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Two identical docs + one unrelated: exactly the identical pair,
    // hamming 0. (Unrelated-doc chunk collisions are possible in
    // principle — 16-bit chunks — but these fixed texts don't collide.)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "the quick brown fox jumps over lazy dogs tonight"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashNearDupPairs(docs).collect()
    assert(out.length == 1 &&
      out.head.getLong(0) == 1L && out.head.getLong(1) == 2L &&
      out.head.getInt(2) == 0, s"got ${out.toSeq}")
    // ChunkCap prune: >cap identical fingerprints share every chunk
    // bucket, all four buckets go hot, zero candidates — the
    // documented contract (a degenerate template group is exact
    // dedup's job; no star here because a pair report carries no
    // connectivity obligation).
    val hot = (0 until Dedup.ChunkCap + 10)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashNearDupPairs(hot).count() == 0)
    // Just under the cap: full pairwise expansion.
    val warm = (0 until 20)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashNearDupPairs(warm).count() == 190)
  }

  test("oracle fixtures stay under BandCap (star fallback disengaged)") {
    // minhash_lsh's declared oracle (exhaustive blocked pairs) emits
    // ALL verified pairs, but over-BandCap buckets emit only the
    // min-star — parity therefore ASSUMES no fixture (band, sig)
    // bucket exceeds BandCap. This pins that assumption: if a future
    // SF gate grows a >BandCap boilerplate group, this test names the
    // documented star trade-off instead of leaving a bare hash
    // mismatch to diagnose (ADVICE r5). Clustering/dedup_keep stay
    // correct either way — the star preserves connectivity.
    val spark = TestSpark.spark
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val sh = Dedup.docShingles(
        graft.Tables.t(spark, s"/root/testdata/$sf", "documents"))
      val maxBucket = Dedup.bandSignatures(sh)
        .groupBy("band", "sig").count()
        .agg(max(col("count"))).collect()(0).getLong(0)
      sh.unpersist()
      assert(maxBucket <= Dedup.BandCap,
        s"$sf grew a $maxBucket-doc (band,sig) bucket > BandCap=" +
          s"${Dedup.BandCap}: minhash_lsh pair-level oracle parity no " +
          "longer holds by construction (star fallback engages)")
    }
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

  test("switching corpus keys mid-session evicts the old cluster chain " +
    "and computes the new corpus correctly") {
    val spark = TestSpark.spark
    val sc = spark.sparkContext
    Dedup.clearCaches(spark)
    val before = sc.getPersistentRDDs.keySet
    val docsA = graft.Tables.t(spark, "/root/testdata/sf0.001",
      "documents")
    val docsB = docsA.filter(col("doc_id") < 250)
    // Corpus A: full memoized chain (shingles → bands → pairs →
    // clusters; clusters is the trickiest lifecycle — persistIt=false
    // but backed by localCheckpoint RDD storage).
    val shA = Dedup.docShingles(docsA, cacheKey = "corpusA")
    val clA = Dedup.clusters(shA, 4, 5, cacheKey = "corpusA")
    assert(clA.count() > 0)
    val idsA = sc.getPersistentRDDs.keySet.diff(before)
    assert(idsA.nonEmpty, "chain A should hold persisted/checkpoint RDDs")
    // Corpus B under a DIFFERENT key: each named cache holds one live
    // key per session, so inserting B must evict and RELEASE all of
    // A's storage — including the checkpoint blocks behind clA.
    val shB = Dedup.docShingles(docsB, cacheKey = "corpusB")
    val clB = Dedup.clusters(shB, 4, 5, cacheKey = "corpusB")
    val b = clB.orderBy("doc_id").collect().toSeq
    assert(sc.getPersistentRDDs.keySet.intersect(idsA).isEmpty,
      "corpus A's persisted/checkpoint RDDs must be released on key switch")
    assert(Dedup.clusters(shB, 4, 5, cacheKey = "corpusB") eq clB)
    // B's memoized result equals a fresh un-memoized computation.
    val freshPairs = Dedup.minhashNearDupPairs(shB, 4, 5)
    val freshDf = Dedup.nearDupClusters(freshPairs)
    val fresh = freshDf.orderBy("doc_id").collect().toSeq
    freshPairs.unpersist()
    Memo.checkpointRdds(freshDf).foreach(_.unpersist(blocking = false))
    assert(b == fresh && b.nonEmpty)
    Dedup.clearCaches(spark)
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty)
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
