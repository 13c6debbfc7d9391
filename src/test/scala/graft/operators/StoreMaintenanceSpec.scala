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
          !s.getPath.toString.contains("/.") &&
          !s.getPath.toString.contains("/_manifest/"))
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

  test("IVF store: additive schema evolution — evolved epoch appends, " +
    "old epochs read the new column as null, probes stay pruned and " +
    "correct both ways; a type change rejects loudly at append time") {
    val spark = TestSpark.spark
    val path = Files.createTempDirectory("graft-ivfevo").toString + "/v"
    val e = Similarity.prepared(Tables.t(spark, dir, "embeddings"))
    val NQ = 5
    val cb = Similarity.firstNCodebook(e, NQ, 8)
    Similarity.writeIvfStore(
      e.filter(col("vec_id") < NQ || col("vec_id") % 2 === 0), cb, NQ,
      path)
    // Evolved epoch: same core columns plus a source tag.
    val evolved = e.filter(col("vec_id") >= NQ &&
      col("vec_id") % 2 =!= 0).withColumn("src_tag", lit("epoch2"))
    Similarity.appendToIvfStore(evolved, path)

    // Evolution-aware read: resident rows surface the new column as
    // null, evolved rows carry it; nothing lost either way.
    val all = Similarity.ivfStoreRead(spark, path)
    assert(all.columns.contains("src_tag"))
    val nulls = all.filter(col("src_tag").isNull)
      .select("n_id").collect().map(_.getLong(0)).toSet
    val tagged = all.filter(col("src_tag") === "epoch2")
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(nulls.nonEmpty && tagged.nonEmpty)
    assert(nulls.forall(_ % 2 == 0) && tagged.forall(_ % 2 == 1),
      "evolution mixed up which epoch carries the tag")

    // The plain probe is oblivious to evolution (core columns only)
    // and still equals the in-memory IVF over the union; the scan
    // stays partition-pruned.
    val probe = Similarity.ivfTopKFromStore(spark, path,
      Similarity.querySide(e, NQ), nProbe = 2, k = 5)
    val viaStore = probe.orderBy("q_id", "rn").collect().toSeq
    val direct = Similarity.ivfTopKWith(e, cb, NQ, nProbe = 2, k = 5)
      .orderBy("q_id", "rn").collect().toSeq
    assert(viaStore == direct)
    val scanStr = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("graft-ivfevo")).getOrElse("")
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.contains("cid"), s"evolved-store probe not pruned: $scanStr")

    // Incompatible evolution must throw at append, before any file
    // lands. Two shapes: an EVOLVED column flipping type hits the
    // explicit additive-evolution gate; a CORE column flipping type is
    // caught even earlier, by the assignment expressions' own analysis
    // (array_dot rejects array<float>) — loud either way.
    val before = dataFiles(spark, s"$path/vectors")
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfStore(
        e.filter(col("vec_id") >= NQ)
          .withColumn("src_tag", lit(3L)), path)
    }
    assert(ex.getMessage.contains("incompatible schema evolution"))
    intercept[Exception] {
      Similarity.appendToIvfStore(
        e.filter(col("vec_id") >= NQ)
          .withColumn("v", col("v").cast("array<float>")), path)
    }
    assert(dataFiles(spark, s"$path/vectors") == before,
      "rejected appends must leave the store untouched")
  }

  test("documents store: additive evolution appends under source " +
    "partitions; type change rejects; evolved read keeps pruning") {
    val spark = TestSpark.spark
    val path = Files.createTempDirectory("graft-docevo").toString + "/d"
    val docs = Tables.t(spark, dir, "documents")
    AtRestStores.writeDocumentsStore(
      docs.filter(col("doc_id") % 2 === 0), path)
    AtRestStores.appendToDocumentsStore(
      docs.filter(col("doc_id") % 2 =!= 0)
        .withColumn("ingest_batch", lit(7L)), path)
    val all = AtRestStores.documentsStoreEvolved(spark, path)
    assert(all.count() == docs.count())
    assert(all.filter(col("ingest_batch").isNull).count() ==
      docs.filter(col("doc_id") % 2 === 0).count())
    // Pruning on the partition column survives evolution.
    val one = docs.select("source").head().getString(0)
    val q = all.filter(col("source") === one)
    val scanStr = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).find(_.contains("graft-docevo")).getOrElse("")
    assert(scanStr.contains("PartitionFilters"))
    assert(q.count() == docs.filter(col("source") === one).count())
    val ex = intercept[IllegalArgumentException] {
      AtRestStores.appendToDocumentsStore(
        docs.withColumn("doc_id", col("doc_id").cast("int")), path)
    }
    assert(ex.getMessage.contains("incompatible schema evolution"))
  }

  test("snapshot compaction under a concurrent reader: every probe " +
    "equals the pre/post result (never a half-swapped cell), expired " +
    "files survive until an explicit GC after reader drain") {
    val spark = TestSpark.spark
    val path = Files.createTempDirectory("graft-ivfsnap").toString + "/v"
    val e = Similarity.prepared(Tables.t(spark, dir, "embeddings"))
      .persist()
    try {
      val NQ = 5
      val cb = Similarity.firstNCodebook(e, NQ, 8)
      Similarity.writeIvfStore(
        e.filter(col("vec_id") < NQ || col("vec_id") % 3 === 0), cb, NQ,
        path)
      Similarity.appendToIvfStore(
        e.filter(col("vec_id") >= NQ && col("vec_id") % 3 === 1), path)
      Similarity.appendToIvfStore(
        e.filter(col("vec_id") >= NQ && col("vec_id") % 3 === 2), path)
      val v1 = Similarity.publishIvfManifest(spark, path)
      assert(v1 == 1L)
      val expected = Similarity.ivfTopKFromSnapshot(spark, path,
        Similarity.querySide(e, NQ), nProbe = 3, k = 5)
        .orderBy("q_id", "rn").collect().toSeq
      assert(expected.nonEmpty)
      val preDrift = Similarity.ivfStoreDrift(spark, path)
        .collect().toSeq

      // Reader thread hammers the snapshot probe while the main
      // thread compacts every multi-file cell. Data is identical pre
      // and post compaction, so ANY deviation from `expected` is a
      // torn read (missing or duplicated cell files).
      val mismatches = new java.util.concurrent.atomic.AtomicInteger
      val failures = new java.util.concurrent.atomic.AtomicReference[
        Throwable]
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        try {
          while (!stop.get()) {
            val got = Similarity.ivfTopKFromSnapshot(spark, path,
              Similarity.querySide(e, NQ), nProbe = 3, k = 5)
              .orderBy("q_id", "rn").collect().toSeq
            if (got != expected) mismatches.incrementAndGet(): Unit
          }
        } catch { case t: Throwable => failures.set(t) }
      })
      reader.start()
      val hot = Similarity.ivfStoreCellStats(spark, path)
        .filter(_._2 > 1).map(_._1)
      assert(hot.nonEmpty)
      val v2 = Similarity.compactIvfCellsSnapshot(spark, path, hot)
      assert(v2 == v1 + 1)
      // One more probe window against the new version, then stop.
      Thread.sleep(50)
      stop.set(true)
      reader.join(30000)
      assert(failures.get() == null,
        s"snapshot reader failed: ${failures.get()}")
      assert(mismatches.get() == 0,
        s"${mismatches.get()} torn reads during snapshot compaction")

      // Replaced files are still on disk (v1 readers stay whole) and
      // the current manifest lists exactly one live file per
      // compacted cell.
      val live = StoreManifest.files(spark, s"$path/vectors").get
      hot.foreach { c =>
        assert(live.count(_.startsWith(s"cid=$c/")) == 1,
          s"cell $c not compacted in manifest")
      }
      val onDisk = dataFiles(spark, s"$path/vectors")
      assert(onDisk.size > live.size,
        "expired files must survive until GC")

      // Drift monitoring between compaction and GC: the LISTING-based
      // report double-counts compacted cells (live + expired copies of
      // the same rows — the documented hazard, proven real here),
      // while the snapshot form equals the pre-compaction report
      // exactly (compaction moves bytes, never content).
      val listDrift = Similarity.ivfStoreDrift(spark, path)
        .collect().toSeq
      assert(listDrift != preDrift,
        "expected the listing drift to double-count before GC")
      assert(Similarity.ivfStoreDriftSnapshot(spark, path)
        .collect().toSeq == preDrift,
        "snapshot drift must see exactly the live content")

      // GC with keepVersions=0 (no old readers left): expired files
      // go away, the snapshot still answers identically.
      val deleted = StoreManifest.gcExpired(spark, s"$path/vectors",
        keepVersions = 0)
      assert(deleted.nonEmpty)
      assert(dataFiles(spark, s"$path/vectors").size == live.size)
      val after = Similarity.ivfTopKFromSnapshot(spark, path,
        Similarity.querySide(e, NQ), nProbe = 3, k = 5)
        .orderBy("q_id", "rn").collect().toSeq
      assert(after == expected)
    } finally e.unpersist(): Unit
  }

  test("deltaRead edges: an unclassifiable rewrite rejects loudly, " +
    "and a legitimately empty version time-travels to an empty frame " +
    "with the latest schema") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-deltaedge").toString +
      "/d"
    // v1: a store BORN EMPTY (the signature-store pattern).
    StoreManifest.publish(spark, root, Seq.empty): Unit
    // v2: an append.
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .coalesce(1).write.parquet(root + "/e1")
    StoreManifest.publish(spark, root,
      StoreManifest.listDataFiles(spark, root)): Unit
    // An empty early version reads as an EMPTY frame carrying the
    // LATEST schema (ADVICE r14: previously conflated with a missing
    // version), while an out-of-line version still rejects loudly.
    val asOf1 = StoreManifest.snapshotReadAsOf(spark, root, 1L)
    assert(asOf1.count() == 0L)
    assert(asOf1.columns.toSet == Set("id", "v"))
    intercept[IllegalArgumentException] {
      StoreManifest.snapshotReadAsOf(spark, root, 3L)
    }
    // v3: a hand-crafted REWRITE whose classification evidence is
    // gone — files removed vs v2, the op tag and expired record both
    // deleted (the legacy-store shape). deltaRead must reject with
    // unknown-rewrite semantics, never guess.
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .coalesce(1).write.parquet(root + "/e2")
    val rewritten = StoreManifest.listDataFiles(spark, root)
      .filter(_.startsWith("e2/"))
    StoreManifest.publishCompact(spark, root, rewritten,
      expired = StoreManifest.files(spark, root, Some(2L)).get): Unit
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, "_manifest/v3.op"),
      false)
    fs.delete(new org.apache.hadoop.fs.Path(root,
      "_manifest/v3.expired"), false)
    val e = intercept[IllegalArgumentException] {
      StoreManifest.deltaRead(spark, root, 1L, 3L)
    }
    assert(e.getMessage.contains("not recorded as a compaction"))
    // With the op tag present (v3 republished as v4 = a PROPER
    // compaction of v3's shape), the same range walks through.
    StoreManifest.publish(spark, root, rewritten): Unit // v4 append-shaped
    assert(StoreManifest.deltaRead(spark, root, 3L, 4L).count() == 0L)
  }

  test("time travel: every pre-GC version reconstructs its exact " +
    "historical content across a compaction; gcExpired(0) reclaims " +
    "history and an as-of read of a collected version fails loudly") {
    val spark = TestSpark.spark
    val path = Files.createTempDirectory("graft-asof").toString + "/d"
    val docs = Tables.t(spark, dir, "documents")
    def epoch(i: Int) =
      docs.filter(pmod(col("doc_id"), lit(4)) === i).repartition(1)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def wantIds(mods: Int*): Seq[Long] = ids(
      docs.filter(pmod(col("doc_id"), lit(4)).isin(mods.map(Int.box): _*)))

    AtRestStores.writeDocumentsStore(epoch(0), path)
    AtRestStores.publishDocumentsManifest(spark, path)
    (1 to 3).foreach { i =>
      AtRestStores.appendToDocumentsStore(epoch(i), path)
      AtRestStores.publishDocumentsManifest(spark, path): Unit
    }
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).toSeq
    AtRestStores.compactDocumentsSourcesClustered(spark, path, sources,
      Seq("n_chars", "doc_id"), filesPerSource = 2)
    assert(StoreManifest.currentVersion(spark, path).contains(5L))

    // Every retained version answers with exactly its historical
    // content — including v1..v4 whose arrival files the compaction
    // replaced (expired, not deleted).
    (1 to 4).foreach { v =>
      assert(ids(StoreManifest.snapshotReadAsOf(spark, path, v.toLong))
        == wantIds(0 until v: _*), s"version $v content diverged")
    }
    // v4 (pre-compaction) and v5 (post) carry the SAME rows through
    // DIFFERENT file sets — the pointer flip swapped layout only.
    assert(ids(StoreManifest.snapshotReadAsOf(spark, path, 4L)) ==
      ids(StoreManifest.snapshotReadAsOf(spark, path, 5L)))
    assert(StoreManifest.files(spark, path, Some(4L)).get.toSet !=
      StoreManifest.files(spark, path, Some(5L)).get.toSet)

    // Incremental reads: an append-only version range's file delta is
    // exactly the rows the range added, and a range CROSSING the
    // compaction skips the op-tagged `compact` version's restating
    // files and still returns exactly the appended rows (VERDICT r14
    // next-round #5 — one compaction no longer breaks every
    // incremental consumer). A compaction-only window is a legitimate
    // NO-OP delta: empty frame, store schema, not an error (ADVICE
    // r14). Descending/degenerate ranges still reject.
    assert(ids(StoreManifest.deltaRead(spark, path, 1L, 4L)) ==
      wantIds(1, 2, 3))
    assert(ids(StoreManifest.deltaRead(spark, path, 3L, 4L)) ==
      wantIds(3))
    assert(ids(StoreManifest.deltaRead(spark, path, 2L, 5L)) ==
      wantIds(2, 3), "compaction-crossing delta must return exactly " +
        "the appended rows, no restated duplicates")
    val noop = StoreManifest.deltaRead(spark, path, 4L, 5L)
    assert(noop.count() == 0L,
      "a compaction-only window is a no-op delta, not an error")
    assert(noop.columns.contains("doc_id"))
    intercept[IllegalArgumentException] {
      StoreManifest.deltaRead(spark, path, 4L, 4L)
    }
    // A range outside the published line rejects — a nonexistent
    // fromVersion must NOT read as an empty list and return the whole
    // toVersion snapshot as the "delta".
    intercept[IllegalArgumentException] {
      StoreManifest.deltaRead(spark, path, 2L, 9L)
    }
    // An as-of version outside the line rejects with the line bounds
    // (distinct from the legitimately-empty-version case, ADVICE r14).
    intercept[IllegalArgumentException] {
      StoreManifest.snapshotReadAsOf(spark, path, 9L)
    }

    // Retention is what makes time travel work: gcExpired(0) deletes
    // the compaction's replaced files, after which the historical
    // versions' file lists dangle and an as-of read fails loudly
    // (never a silent partial result) — and a compaction-crossing
    // delta whose appended files were collected rejects loudly too,
    // naming the GC'd paths (never a silent partial delta).
    val deleted = StoreManifest.gcExpired(spark, path, keepVersions = 0)
    assert(deleted.nonEmpty)
    assert(ids(StoreManifest.snapshotReadAsOf(spark, path, 5L)) ==
      wantIds(0, 1, 2, 3))
    intercept[Exception] {
      StoreManifest.snapshotReadAsOf(spark, path, 2L).collect()
    }
    val pastRetention = intercept[IllegalArgumentException] {
      StoreManifest.deltaRead(spark, path, 2L, 5L)
    }
    assert(pastRetention.getMessage.contains("GC'd past retention"))
  }
}
