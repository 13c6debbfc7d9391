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

  test("mortonCode interleaves bits round-robin (known patterns)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // a=0b11, b=0b00 → bits of a at even positions: 0b0101 = 5;
    // a=0b00, b=0b11 → odd positions: 0b1010 = 10; a=b=0b11 → 15.
    val got = Seq((3L, 0L), (0L, 3L), (3L, 3L), (1L, 2L))
      .toDF("a", "b")
      .select(StorageLayout.mortonCode(Seq(col("a"), col("b")), 2))
      .as[Long].collect().toSeq
    assert(got == Seq(5L, 10L, 15L, 9L), got.toString)
  }

  test("z-order + manifest: skipping read equals the plain filter, and " +
    "EITHER single dimension alone prunes files — the property a " +
    "one-column sort cannot give") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val zdir = Files.createTempDirectory("graft-z").toString + "/docs"
    StorageLayout.writeZOrdered(docs, zdir, Seq("n_chars", "doc_id"),
      nFiles = 16)
    val man = StorageLayout.statsManifest(spark, zdir,
      Seq("n_chars", "doc_id")).cache()
    val nFiles = man.count()
    assert(nFiles >= 8, s"expected a multi-file layout, got $nFiles")

    // Parity: 2-D range through prune + residual == plain filter.
    val ranges = Seq(("n_chars", 200d, 300d), ("doc_id", 100d, 250d))
    val got = StorageLayout.skippingRead(spark, zdir, man, ranges)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = docs.filter(col("n_chars").between(200, 300) &&
        col("doc_id").between(100, 250))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"skipping read diverged: ${got.size} vs ${want.size}")

    // Both dimensions prune ALONE: a narrow band on either column
    // must leave file candidates strictly below the total (z-locality
    // gives every file a tight envelope in each dimension).
    val byChars = StorageLayout.prunedFiles(man,
      Seq(("n_chars", 250d, 280d))).size
    val byId = StorageLayout.prunedFiles(man,
      Seq(("doc_id", 200d, 260d))).size
    assert(byChars < nFiles && byId < nFiles,
      s"pruning ineffective: chars $byChars, id $byId of $nFiles")

    // Contrast: the same data sorted by n_chars ONLY — doc_id bands
    // then touch (nearly) every file, which is the gap z-order closes.
    val sdir = Files.createTempDirectory("graft-s").toString + "/docs"
    docs.repartitionByRange(16, col("n_chars"))
      .sortWithinPartitions("n_chars").write.parquet(sdir)
    val sman = StorageLayout.statsManifest(spark, sdir,
      Seq("n_chars", "doc_id"))
    val sById = StorageLayout.prunedFiles(sman,
      Seq(("doc_id", 200d, 260d))).size
    assert(byId < sById,
      s"z-order ($byId files) must beat single-column sort ($sById) " +
        "on the secondary dimension")

    // Disjoint range: zero files → empty frame, schema intact.
    val none = StorageLayout.skippingRead(spark, zdir, man,
      Seq(("n_chars", 100000d, 200000d)))
    assert(none.count() == 0 &&
      none.columns.toSeq == docs.columns.toSeq)
    man.unpersist(): Unit
  }

  test("quantile-bucket z-order: an outlier-skewed dimension keeps " +
    "pruning where linear min/max collapses, and reads stay exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    // x is a pseudo-random permutation of [0, 2000) — decorrelated
    // from id — except five 1e12 outliers. Linear normalization over
    // [0, 1e12] crushes every normal x into bucket 0: the z-code stops
    // varying in x, files split by id alone, and every file's
    // x-envelope spans the whole normal range.
    val df = (0L until 2000L).map(i =>
      (i, if (i % 400 == 399) 1e12 else ((i * 7919) % 2000).toDouble))
      .toDF("id", "x")
    val base = Files.createTempDirectory("graft-skewz").toString
    StorageLayout.writeZOrdered(df, s"$base/lin", Seq("x", "id"),
      nFiles = 16)
    StorageLayout.writeZOrderedQuantile(df, s"$base/quant",
      Seq("x", "id"), nFiles = 16)
    val lman = StorageLayout.statsManifest(spark, s"$base/lin",
      Seq("x", "id")).cache()
    val qman = StorageLayout.statsManifest(spark, s"$base/quant",
      Seq("x", "id")).cache()
    val probe = Seq(("x", 500d, 600d))
    val lTouch = StorageLayout.prunedFiles(lman, probe).size
    val qTouch = StorageLayout.prunedFiles(qman, probe).size
    val lTotal = lman.count()
    info(s"x-band probe under outlier skew: linear layout touches " +
      s"$lTouch/$lTotal files, quantile layout $qTouch/${qman.count()}")
    assert(qTouch < lTouch,
      s"quantile bucketing must out-prune linear under skew: " +
        s"linear $lTouch vs quantile $qTouch")
    // Reads stay exact on BOTH layouts — boundary placement shapes
    // layout only, never results.
    def ids(dir: String, man: org.apache.spark.sql.DataFrame): Seq[Long] =
      StorageLayout.skippingRead(spark, dir, man, probe)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = df.filter(col("x").between(500, 600))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(s"$base/lin", lman) == want &&
      ids(s"$base/quant", qman) == want)
    // The outlier tail itself stays findable on the quantile layout.
    val tail = Seq(("x", 1e11, 2e12))
    val gotTail = StorageLayout.skippingRead(spark, s"$base/quant",
      qman, tail).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotTail == df.filter(col("x") >= 1e11)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq)
    lman.unpersist(); qman.unpersist(): Unit
  }

  test("clustered compaction (documents store): arrival-ordered intake " +
    "decays skipping, the z-order rewrite restores it — pruned-file " +
    "counts improve across the compaction while range reads stay exact") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val path = Files.createTempDirectory("graft-recluster").toString + "/d"
    // Four arrival-ordered intake epochs — hash-sliced so every epoch
    // hits every source with a random id/length spread (doc_id mod N
    // would alias the fixture's source = doc_id % 20 and give each
    // source ONE single-epoch file): one file per (source, epoch),
    // every file's (n_chars, doc_id) envelope near-global, so range
    // probes open almost everything — the decayed streaming-intake
    // layout.
    def epoch(i: Int) =
      docs.filter(pmod(xxhash64(col("doc_id")), lit(4)) === i)
        .repartition(1)
    AtRestStores.writeDocumentsStore(epoch(0), path)
    (1 to 3).foreach(i => AtRestStores.appendToDocumentsStore(
      epoch(i), path))
    AtRestStores.publishDocumentsManifest(spark, path)
    val zCols = Seq("n_chars", "doc_id")
    AtRestStores.refreshDocumentsSidecars(spark, path, zCols,
      TextOps.toksS, ScaleQueries.TermBuckets)

    // A selective rectangle in the lower z-quadrant of both dimensions
    // (the forensic-probe shape) plus zorder_scan's wide rectangle for
    // the result-parity check.
    val probe = Seq(("n_chars", 60d, 160d), ("doc_id", 0d, 120d))
    val wide = Seq(("n_chars", 200d, 400d), ("doc_id", 100d, 2400d))
    def man = spark.read.parquet(path + ".manifest")
    def got(rs: Seq[(String, Double, Double)]): Seq[Long] =
      StorageLayout.skippingRead(spark, path, man, rs)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def want(rs: Seq[(String, Double, Double)]): Seq[Long] =
      rs.foldLeft(docs) { case (df, (c, lo, hi)) =>
        df.filter(col(c).cast("double").between(lo, hi)) }
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    val preTotal = man.count()
    val preTouched = StorageLayout.prunedFiles(man, probe).size
    assert(got(probe) == want(probe) && got(wide) == want(wide),
      "pre-compaction skipping read diverged from the plain filter")

    AtRestStores.compactDocumentsSourcesClustered(spark, path,
      (0 until 20).map(i => s"src$i"), zCols, filesPerSource = 4)
    AtRestStores.refreshDocumentsSidecars(spark, path, zCols,
      TextOps.toksS, ScaleQueries.TermBuckets)

    val postTotal = man.count()
    val postTouched = StorageLayout.prunedFiles(man, probe).size
    info(s"probe files touched: $preTouched/$preTotal before " +
      s"compaction, $postTouched/$postTotal after")
    assert(postTouched < preTouched,
      s"re-clustering must shrink touched files: " +
        s"$preTouched/$preTotal -> $postTouched/$postTotal")
    assert(postTouched.toDouble / postTotal <
      preTouched.toDouble / preTotal,
      s"touched FRACTION must improve: $preTouched/$preTotal -> " +
        s"$postTouched/$postTotal")
    // Result parity survives the compaction (the zorder_scan oracle's
    // in-test stand-in: prune + residual loses and fabricates nothing
    // on the compacted snapshot).
    assert(got(probe) == want(probe) && got(wide) == want(wide),
      "post-compaction skipping read diverged from the plain filter")

    // The refreshed term sidecar stays complete on the compacted
    // store: the rare-term probe matches the plain containment scan,
    // and an absent term opens zero files.
    val terms = spark.read.parquet(path + ".terms")
    val gotDup = StorageLayout.termSkippingRead(spark, path, terms,
        "dup", TextOps.toksS, ScaleQueries.TermBuckets)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val wantDup = docs
      .filter(array_contains(expr(TextOps.toksS), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotDup == wantDup, "term probe diverged after compaction")
    assert(StorageLayout.filesWithTerm(spark, terms, "qqqabsent",
      ScaleQueries.TermBuckets).isEmpty,
      "absent term must touch zero files")
  }

  test("term-membership sidecar: rare-term probe skips files (named " +
    "counts), result equals the plain containment filter, absent term " +
    "opens zero files, and completeness holds for every term") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val zdir = Files.createTempDirectory("graft-tm").toString + "/docs"
    StorageLayout.writeZOrdered(docs, zdir, Seq("n_chars", "doc_id"),
      nFiles = 16)
    val buckets = ScaleQueries.TermBuckets
    val man = StorageLayout.termManifest(spark, zdir, TextOps.toksS,
      buckets).cache()
    val nFiles = man.select("file").distinct().count()
    assert(nFiles >= 8, s"expected a multi-file layout, got $nFiles")

    // Rare term ('dup': 25 of 500 docs) — files-touched must be
    // strictly below the total. The fixture layout scatters dup docs
    // by doc_id, so this is the honest lower bound of the mechanism:
    // skipped = total − touched ≥ 1 even with no term locality.
    val touched = StorageLayout.filesWithTerm(spark, man, "dup",
      buckets).size
    val skipped = nFiles - touched
    assert(touched < nFiles && skipped >= 1,
      s"term index must skip files: touched $touched of $nFiles " +
        s"(skipped $skipped)")

    // Parity: prune + residual == plain containment over the store.
    val got = StorageLayout.termSkippingRead(spark, zdir, man, "dup",
        TextOps.toksS, buckets)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = spark.read.parquet(zdir)
      .filter(array_contains(expr(TextOps.toksS), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.size == 25,
      s"skipping read diverged: ${got.size} vs ${want.size}")

    // A term the corpus does not contain: zero candidate files (no
    // collision at fixture vocabulary scale), empty frame, schema
    // intact.
    val absent = "graftabsenttermxyzzy"
    assert(StorageLayout.filesWithTerm(spark, man, absent, buckets)
      .isEmpty, "absent term must prune everything")
    val none = StorageLayout.termSkippingRead(spark, zdir, man, absent,
      TextOps.toksS, buckets)
    assert(none.count() == 0 &&
      none.columns.toSeq == docs.columns.toSeq)

    // Completeness (no false negatives, the Bloom guarantee the
    // residual filter relies on): for EVERY vocabulary term, every
    // file holding it is a candidate.
    import spark.implicits._
    val perTermFiles = spark.read.parquet(zdir)
      .select(input_file_name().as("file"),
        explode(expr(TextOps.toksS)).as("term"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._2).map { case (t, fs) => t -> fs.map(_._1).toSet }
    perTermFiles.foreach { case (term, files) =>
      val cand = StorageLayout.filesWithTerm(spark, man, term,
        buckets).toSet
      assert(files.subsetOf(cand),
        s"term '$term': file(s) ${files -- cand} missing from candidates")
    }
    man.unpersist(): Unit
  }
}
