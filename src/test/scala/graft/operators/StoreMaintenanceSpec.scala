package graft.operators

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Epoch-append maintenance for the at-rest stores (VERDICT r9 #3):
  * daily intake merges into the signature store and the IVF store
  * WITHOUT rewriting history — new files land next to resident ones,
  * probes pre/post stay correct and pruned, and compaction (driven by
  * the files-per-bucket / files-per-cell criterion) restores the
  * one-file layout touching only what it must.
  */
class StoreMaintenanceSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  /** (name, length) of every data file under a path, recursively. */
  private def dataFiles(spark: org.apache.spark.sql.SparkSession,
      path: String): Set[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Set.empty
    else {
      val it = fs.listFiles(p, true)
      val b = Set.newBuilder[(String, Long)]
      while (it.hasNext) {
        val s = it.next()
        if (!s.getPath.getName.startsWith("_") &&
          !s.getPath.toString.contains("/."))
          b += ((s.getPath.toString, s.getLen))
      }
      b.result()
    }
  }

  test("signature store: epoch append adds files without touching " +
    "resident ones; probe equals the fresh-built store; compaction " +
    "restores one file per bucket") {
    val spark = TestSpark.spark
    val wh = Files.createTempDirectory("graft-sigmaint").toString
    val sh = Dedup.docShingles(Tables.t(spark, dir, "documents"))
    val epochA = sh.filter(col("doc_id") % 3 === 1)
    val epochB = sh.filter(col("doc_id") % 3 === 2)
    val incoming = sh.filter(col("doc_id") % 3 === 0)
    val corpusAll = sh.filter(col("doc_id") % 3 =!= 0)

    Dedup.writeSignatureStore(epochA, s"$wh/sig_maint", "sig_maint")
    try {
      val before = dataFiles(spark, s"$wh/sig_maint")
      assert(before.nonEmpty)

      Dedup.appendToSignatureStore(epochB, "sig_maint")
      val after = dataFiles(spark, s"$wh/sig_maint")
      assert(before.subsetOf(after),
        "append rewrote resident files")
      assert(after.size > before.size, "append added no files")

      // Stored rows are exactly band(A) ∪ band(B).
      val store = Dedup.signatureStore(spark, "sig_maint")
      val direct = Dedup.bandSignatures(corpusAll)
      assert(store.exceptAll(direct).isEmpty &&
        direct.exceptAll(store).isEmpty)

      // Probe through the appended store == probe with in-memory bands
      // over the union corpus.
      val viaStore = Dedup.incrementalNearDupPairs(corpusAll, incoming,
        4, 5, corpusBands = store)
        .select("new_id", "corpus_id")
      val ref = Dedup.incrementalNearDupPairs(corpusAll, incoming, 4, 5)
        .select("new_id", "corpus_id")
      assert(viaStore.exceptAll(ref).isEmpty &&
        ref.exceptAll(viaStore).isEmpty && ref.count() > 0)

      // Criterion: every epoch adds ~one file per non-empty bucket.
      val stats = Dedup.signatureStoreFileStats(spark, s"$wh/sig_maint")
      assert(stats.nonEmpty && stats.exists(_._2 >= 2),
        s"expected multi-file buckets after append: $stats")

      // Compaction: fresh table, one file per non-empty bucket, same
      // probe results.
      Dedup.compactSignatureStore(spark, s"$wh/sig_maint",
        s"$wh/sig_compact", "sig_maint_c")
      try {
        val cstats = Dedup.signatureStoreFileStats(spark,
          s"$wh/sig_compact")
        assert(cstats.nonEmpty && cstats.forall(_._2 == 1),
          s"compaction must leave one file per bucket: $cstats")
        val viaCompact = Dedup.incrementalNearDupPairs(corpusAll,
          incoming, 4, 5,
          corpusBands = Dedup.signatureStore(spark, "sig_maint_c"))
          .select("new_id", "corpus_id")
        assert(viaCompact.exceptAll(ref).isEmpty &&
          ref.exceptAll(viaCompact).isEmpty)
      } finally spark.sql("DROP TABLE IF EXISTS sig_maint_c")

      // Bucket-spec mismatch must throw, not corrupt the layout.
      intercept[Exception] {
        Dedup.appendToSignatureStore(epochB, "sig_maint", buckets = 8)
      }
    } finally spark.sql("DROP TABLE IF EXISTS sig_maint")
  }

  test("IVF store: epoch append assigns against the stored codebook " +
    "and adds cell files without touching resident ones; probe equals " +
    "the all-at-once build; targeted compaction touches only named " +
    "cells") {
    val spark = TestSpark.spark
    val path = Files.createTempDirectory("graft-ivfmaint").toString + "/v"
    val e = Similarity.prepared(Tables.t(spark, dir, "embeddings"))
      .persist()
    try {
      val NQ = 5
      val cb = Similarity.lloydRefine(e,
        Similarity.firstNCodebook(e, NQ, 8), NQ, iters = 1)
      // Initial build: even corpus vectors only.
      Similarity.writeIvfStore(
        e.filter(col("vec_id") < NQ || col("vec_id") % 2 === 0), cb, NQ,
        path)
      val before = dataFiles(spark, s"$path/vectors")

      // Epoch append: the odd half, assigned against the STORED
      // codebook.
      Similarity.appendToIvfStore(
        e.filter(col("vec_id") >= NQ && col("vec_id") % 2 =!= 0), path)
      val after = dataFiles(spark, s"$path/vectors")
      assert(before.subsetOf(after), "append rewrote resident files")
      assert(after.size > before.size)

      // Probe the appended store == in-memory IVF over the full corpus
      // with the same codebook (bit-identical tie-breaks).
      val nProbe = 2
      val viaStore = Similarity.ivfTopKFromStore(spark, path,
        Similarity.querySide(e, NQ), nProbe, k = 5)
        .orderBy("q_id", "rn").collect().toSeq
      val direct = Similarity.ivfTopKWith(e, cb, NQ, nProbe, k = 5)
        .orderBy("q_id", "rn").collect().toSeq
      assert(viaStore == direct)

      // Compaction criterion: appended cells carry >1 file.
      val stats = Similarity.ivfStoreCellStats(spark, path)
      val hot = stats.filter(_._2 > 1).map(_._1)
      assert(hot.nonEmpty, s"expected multi-file cells: $stats")
      val untouched = stats.filter(_._2 == 1).map(_._1).toSet
      val untouchedBefore = after.filter { case (p, _) =>
        untouched.exists(c => p.contains(s"cid=$c/")) }

      Similarity.compactIvfCells(spark, path, hot)
      val cstats = Similarity.ivfStoreCellStats(spark, path)
      assert(cstats.filter(c => hot.contains(c._1)).forall(_._2 == 1),
        s"compacted cells must hold one file: $cstats")
      // Cells not named in the compaction keep their exact files.
      val untouchedAfter = dataFiles(spark, s"$path/vectors")
        .filter { case (p, _) =>
          untouched.exists(c => p.contains(s"cid=$c/")) }
      assert(untouchedAfter == untouchedBefore,
        "compaction touched cells outside the named set")
      // Row-level content is preserved exactly.
      val viaCompacted = Similarity.ivfTopKFromStore(spark, path,
        Similarity.querySide(e, NQ), nProbe, k = 5)
        .orderBy("q_id", "rn").collect().toSeq
      assert(viaCompacted == direct)
    } finally e.unpersist(): Unit
  }
}
