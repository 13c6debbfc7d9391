package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Declared queries whose point is a SCALE lever in the physical plan
  * rather than new query semantics; results equal the plain
  * formulation (which is what the oracle runs).
  */
object ScaleQueries {

  import Tables.t

  /** Confs that make the runtime bloom-filter rewrite fire at fixture
    * scale: production thresholds (application side ≥ 10 GB scan) are
    * deliberately conservative, and the fixture join would broadcast.
    * Shared with ScaleQueriesSpec's plan assertion.
    */
  val bloomConfs: Map[String, String] = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** The pre-materialization plan of bloom_pruned_join — factored out
    * so ScaleQueriesSpec can assert the injected bloom filter on the
    * exact frame the declared query executes.
    */
  def bloomJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    t(s, dir, "lineitem")
      .join(
        t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"))

  val all: Seq[QuerySpec] = Seq(

    // Runtime bloom-filter join pruning — the 100 TB lever for a
    // fact ⋈ selectively-filtered dim SHUFFLE join (dim too big to
    // broadcast): the optimizer turns the dim filter into a bloom
    // filter evaluated on the fact side BEFORE its shuffle, so
    // non-matching fact rows never cross the wire. Semantics-neutral
    // (bloom false-positives only pass extra rows to the exact join),
    // so the oracle is the plain join.
    //
    // Execution shape: the thresholds above only exist while this
    // query PLANS AND RUNS, so the result is materialized eagerly via
    // localCheckpoint inside the fn (the work lands in the caller's
    // timing window as usual) and the confs are restored before
    // returning — later queries in the same session plan under the
    // session defaults, not these overrides. ScaleQueriesSpec asserts
    // the executed plan contains the injected bloom filter.
    QuerySpec("bloom_pruned_join",
      """SELECT o_orderkey, COUNT(*) AS n_items,
        |       SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        val prev = ScaleQueries.bloomConfs.keys
          .map(k => k -> s.conf.getOption(k)).toMap
        try {
          ScaleQueries.bloomConfs.foreach { case (k, v) => s.conf.set(k, v) }
          // Eager: plan + run under the overrides (see above). The
          // aggregated result is small; checkpoint storage is
          // released with the session.
          bloomJoin(s, dir).localCheckpoint().orderBy("o_orderkey")
        } finally prev.foreach {
          case (k, Some(v)) => s.conf.set(k, v)
          case (k, None) => s.conf.unset(k)
        }
    },

    // Z-order clustered layout + manifest file skipping
    // (StorageLayout): documents written Morton-interleaved on
    // (n_chars, doc_id) with a per-file min/max manifest persisted
    // NEXT TO the data (the lakehouse checkpoint shape), then a 2-D
    // range read that opens ONLY manifest-surviving files. Oracle is
    // the plain WHERE — green only if write → stats → prune → residual
    // filter loses and fabricates nothing. StorageLayoutSpec gates
    // the part the oracle can't see: that the pruning actually skips
    // files on EITHER dimension alone.
    QuerySpec.build("zorder_scan",
      """SELECT doc_id, n_chars, source, lang FROM documents
        |WHERE n_chars BETWEEN 200 AND 400
        |  AND doc_id BETWEEN 100 AND 2400
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val path = zStore(s, dir)
      StorageLayout.skippingRead(s, path,
          s.read.parquet(path + ".manifest"),
          Seq(("n_chars", 200d, 400d), ("doc_id", 100d, 2400d)))
        .select("doc_id", "n_chars", "source", "lang")
        .orderBy("doc_id")
    },

    // Term-level file skipping (VERDICT r11 #6): the same at-rest
    // documents store carries a per-file term-membership sidecar
    // (bucketed xxhash64 of every token — the third skipping
    // dimension next to the two min/max envelopes), and the probe for
    // the corpus's rarest term ('dup', df 25/500 docs) opens ONLY
    // index-surviving files, exact containment as the residual
    // filter. Oracle is the plain tokenize-and-contains WHERE — green
    // only if index build → file prune → residual filter loses and
    // fabricates nothing. StorageLayoutSpec gates what the oracle
    // can't see: that files ARE skipped (named counts) and that an
    // absent term opens zero files.
    QuerySpec.build("term_pruned_scan",
      s"""SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |WHERE text IS NOT NULL
         |  AND list_contains(${TextOps.toksD}, 'dup')
         |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val path = zStore(s, dir)
      termManifest(s, path)
      StorageLayout.termSkippingRead(s, path,
          s.read.parquet(path + ".terms"), "dup",
          TextOps.toksS, TermBuckets)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("source")
    },

    // Compaction-time RE-CLUSTERING on the oracle path (VERDICT r12
    // #5): the documents store is built the way streaming intake
    // actually leaves it — four hash-sliced arrival-ordered epochs
    // appended under the manifest, every file's envelope near-global —
    // then snapshot-compacted with the z-order rewrite and its
    // sidecars refreshed over the NEW snapshot. The probe is
    // zorder_scan's 2-D range through the same prune + residual read,
    // against the same plain-WHERE oracle: green only if intake →
    // manifest → clustered compaction → sidecar refresh → file-skip →
    // residual filter loses and fabricates nothing. StorageLayoutSpec
    // gates what the oracle can't see (touched-file counts IMPROVE
    // across the compaction: 49/80 → 25/80 on the fixture).
    QuerySpec.build("zorder_compacted_scan",
      """SELECT doc_id, n_chars, source, lang FROM documents
        |WHERE n_chars BETWEEN 200 AND 400
        |  AND doc_id BETWEEN 100 AND 2400
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val path = compactedStore(s, dir)
      StorageLayout.skippingRead(s, path,
          s.read.parquet(path + ".manifest"),
          Seq(("n_chars", 200d, 400d), ("doc_id", 100d, 2400d)))
        .select("doc_id", "n_chars", "source", "lang")
        .orderBy("doc_id")
    },

    // Time-travel read on the oracle path (VERDICT r13 next-round #6):
    // the manifested documents store accumulates four intake epochs
    // (doc_id % 4 slices — the portable split), each publishing an
    // immutable manifest version v1..v4, then a clustered snapshot
    // compaction rewrites the whole layout as v5. The query reads
    // AS-OF VERSION 2 — a snapshot whose CONTENT differs from the
    // current one (epochs 0 and 1 only), resolved after the compaction
    // replaced every arrival file — and the oracle recomputes that
    // historical state from scratch. Green means retention + the
    // pointer flip preserve history a reader can actually use: v2's
    // files all still exist (compaction expires, only gcExpired
    // deletes) and the version list pins exactly the old file set.
    // md5-of-text witnesses full row content, not just keys.
    QuerySpec.build("snapshot_asof_scan",
      """SELECT doc_id, lang, source, n_chars,
        |       md5(COALESCE(text, '')) AS h
        |FROM documents WHERE doc_id % 4 IN (0, 1)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      StoreManifest.snapshotReadAsOf(s, asofStore(s, dir), 2L)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), md5(coalesce(col("text"), lit(""))).as("h"))
        .orderBy("doc_id")
    },

    // Incremental consumption between snapshot versions (the Iceberg
    // incremental-scan cadence): the manifest IS the changelog, so
    // "what did v2..v5 add" reads EXACTLY the files the range's APPEND
    // versions placed — no data-level diff, no full-snapshot scan. The
    // range deliberately CROSSES the v5 clustered compaction (VERDICT
    // r14 next-round #5): v5 is op-tagged `compact`, so the walk skips
    // its restating rewrite files and still returns precisely epochs
    // 3 and 4's rows (doc_id % 4 IN (2, 3)) — read from their ORIGINAL
    // arrival files, which retention keeps until gcExpired. Green
    // means one compaction no longer breaks every incremental consumer
    // (the old loud-reject), without double-counting a single restated
    // row. Reuses snapshot_asof_scan's store, so the epochs/compaction
    // build once per session.
    QuerySpec.build("snapshot_delta_scan",
      """SELECT doc_id, lang, source, n_chars,
        |       md5(COALESCE(text, '')) AS h
        |FROM documents WHERE doc_id % 4 IN (2, 3)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      StoreManifest.deltaRead(s, asofStore(s, dir), 2L, 5L)
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), md5(coalesce(col("text"), lit(""))).as("h"))
        .orderBy("doc_id")
    },

    // deltaRead as a SUBSCRIPTION (VERDICT r15 next-round #5): an
    // incremental consumer tails the manifest's operation-tagged
    // version line through graft.streaming.ManifestSubscription — a
    // durable cursor + poll loop — and materializes every append
    // delta into a DOWNSTREAM manifested store through the ledgered
    // intake (batchId = the delta's toVersion). The drive exercises
    // the three production hazards on the oracle path: a RESTART
    // mid-line (a fresh subscription object over the same cursor file
    // resumes, it does not re-consume), a REPLAYED range (the crash
    // window between handler and cursor advance re-delivers (2,3];
    // the downstream ledger must no-op it, pinned by a version
    // require), and a COMPACTION mid-subscription (the op-tag walk
    // makes it an empty delta — "nothing new", not a re-delivery of
    // restated rows). The emitted frame is the downstream snapshot;
    // green means bootstrap + three deltas + one replay + one
    // compaction window reproduce the corpus exactly once. Category
    // `replay`: the cold time is a multi-execution subscription drive
    // over one durable cursor.
    QuerySpec.replay("snapshot_subscribe",
      """SELECT doc_id, lang, source, n_chars,
        |       md5(COALESCE(text, '')) AS h
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      StoreManifest.snapshotRead(s, subscribedStore(s, dir))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), md5(coalesce(col("text"), lit(""))).as("h"))
        .orderBy("doc_id")
    }
  )

  /** Build-once per (session, corpus): the subscription drive behind
    * `snapshot_subscribe`. Source store: bootstrap publish (v1 =
    * doc_id % 4 == 0) + three appends (v2, v3, v5) with a sources
    * compaction wedged between the last two (v4). Downstream store:
    * bootstrapped from the v1 snapshot, then fed EXCLUSIVELY by
    * ManifestSubscription polls whose handler is the exactly-once
    * documents intake keyed by toVersion. Returns the downstream path.
    */
  private def subscribedStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    subscribedStoreCache.synchronized(
      subscribedStoreCache.getOrElseUpdate((s, dir), {
        val work = java.nio.file.Files
          .createTempDirectory("graft-substore").toString
        val src = s"$work/src"
        val down = s"$work/down"
        val cursor = s"$work/cursor/sub-1"
        val docs = t(s, dir, "documents")
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        def epoch(i: Int) = docs
          .filter(pmod(col("doc_id"), lit(4)) === i)
          .repartition(1)
        def feed(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
          graft.streaming.StoreIntake.documentsIntakeBatch(down, "sub")(
            df.select(cols.map(col): _*), id)
        // Source appends go through the ledgered intake's COMPOSITIONAL
        // publish (current live list + the epoch's files). A listing
        // re-publish would work until the compaction and then poison
        // the line: expired files stay on disk until GC, so v5's
        // listing would resurrect them and the (4,5] delta would
        // re-deliver every pre-compaction row — the exact trap
        // DEPLOY.md's lifecycle runbook names (and this build hit,
        // 875 ≠ 500 rows, before switching).
        def srcAppend(df: org.apache.spark.sql.DataFrame,
            id: Long): Unit =
          graft.streaming.StoreIntake.documentsIntakeBatch(src,
            "srcfeed")(df.select(cols.map(col): _*), id)
        // Source v1 + downstream bootstrap from that snapshot.
        AtRestStores.writeDocumentsStore(epoch(0), src)
        AtRestStores.publishDocumentsManifest(s, src): Unit
        AtRestStores.writeDocumentsStore(
          StoreManifest.snapshotReadAsOf(s, src, 1L)
            .select(cols.map(col): _*), down)
        AtRestStores.publishDocumentsManifest(s, down): Unit
        val sub1 = new graft.streaming.ManifestSubscription(src, cursor)
        require(sub1.subscribe(s, 1L) == 1L)
        require(sub1.poll(s)((df, _, to) => feed(df, to)).isEmpty,
          "nothing published yet — poll must answer 'nothing new'")
        // v2 append → poll delivers (1,2].
        srcAppend(epoch(1), 1L)
        require(sub1.poll(s) { (df, _, to) => feed(df, to) }
          .contains((1L, 2L)))
        // RESTART mid-line: a fresh object over the same cursor file
        // resumes at v2 — subscribe's afterVersion must NOT win.
        val sub2 = new graft.streaming.ManifestSubscription(src, cursor)
        require(sub2.subscribe(s, 1L) == 2L,
          "an existing cursor must survive a subscriber restart")
        srcAppend(epoch(2), 2L)
        require(sub2.poll(s) { (df, _, to) => feed(df, to) }
          .contains((2L, 3L)))
        // REPLAYED range: a crash between the handler and the cursor
        // advance leaves the cursor at 2 — the re-delivered (2,3]
        // must be a downstream ledger no-op.
        // (cursor storage is versioned files cursor.<v> in the cursor
        // dir — dropping the dir simulates the never-advanced state)
        val fs = new org.apache.hadoop.fs.Path(cursor)
          .getFileSystem(s.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(s"$work/cursor"), true)
        val sub3 = new graft.streaming.ManifestSubscription(src, cursor)
        require(sub3.subscribe(s, 2L) == 2L)
        val vDown = StoreManifest.currentVersion(s, down)
        require(sub3.poll(s) { (df, _, to) => feed(df, to) }
          .contains((2L, 3L)))
        require(StoreManifest.currentVersion(s, down) == vDown,
          "a replayed delta must not re-publish downstream")
        // COMPACTION mid-subscription (v4): an empty delta, consumed
        // as a normal poll — the cursor crosses it without error.
        val sources = docs.select("source").distinct()
          .collect().map(_.getString(0)).toSeq
        AtRestStores.compactDocumentsSources(s, src, sources): Unit
        require(sub3.poll(s) { (df, _, to) =>
          require(df.isEmpty, "a compaction window must delta empty")
          feed(df, to)
        }.contains((3L, 4L)))
        // v5 append lands AFTER the compaction → poll delivers it.
        srcAppend(epoch(3), 3L)
        require(sub3.poll(s) { (df, _, to) => feed(df, to) }
          .contains((4L, 5L)))
        require(sub3.poll(s)((df, _, to) => feed(df, to)).isEmpty,
          "a drained line must answer 'nothing new' again")
        down
      }))

  private val subscribedStoreCache = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), String]

  /** Build-once per (session, corpus): the manifested documents store
    * with PER-EPOCH manifest versions — v1..v4 are the four intake
    * publishes (doc_id % 4 slices, so each version's content is
    * oracle-expressible), v5 the clustered compaction that replaced
    * every arrival file. Backs `snapshot_asof_scan`; GC is never run
    * here, so every version stays readable (the retention contract —
    * StoreMaintenanceSpec pins what gcExpired(0) does to history).
    */
  private def asofStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    asofStoreCache.synchronized(
      asofStoreCache.getOrElseUpdate((s, dir), {
        val p = java.nio.file.Files
          .createTempDirectory("graft-asofstore").toString + "/docs"
        val docs = t(s, dir, "documents")
        def epoch(i: Int) = docs
          .filter(pmod(col("doc_id"), lit(4)) === i)
          .repartition(1)
        AtRestStores.writeDocumentsStore(epoch(0), p)
        AtRestStores.publishDocumentsManifest(s, p): Unit
        (1 to 3).foreach { i =>
          AtRestStores.appendToDocumentsStore(epoch(i), p)
          AtRestStores.publishDocumentsManifest(s, p): Unit
        }
        val sources = docs.select("source").distinct()
          .collect().map(_.getString(0)).toSeq
        AtRestStores.compactDocumentsSourcesClustered(s, p, sources,
          Seq("n_chars", "doc_id"), filesPerSource = 2): Unit
        p
      }))

  private val asofStoreCache = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), String]

  /** Build-once per (session, corpus): the documents store as a year
    * of intake leaves it — four hash-sliced epochs appended under the
    * snapshot manifest (arrival-ordered: every file's envelope
    * near-global) — then re-clustered by the z-order compaction with
    * sidecars refreshed over the compacted snapshot. Backs
    * `zorder_compacted_scan`.
    */
  private def compactedStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    compactedStoreCache.synchronized(
      compactedStoreCache.getOrElseUpdate((s, dir), {
        val p = java.nio.file.Files
          .createTempDirectory("graft-compactstore").toString + "/docs"
        val docs = t(s, dir, "documents")
        def epoch(i: Int) = docs
          .filter(pmod(xxhash64(col("doc_id")), lit(4)) === i)
          .repartition(1)
        AtRestStores.writeDocumentsStore(epoch(0), p)
        (1 to 3).foreach(i =>
          AtRestStores.appendToDocumentsStore(epoch(i), p))
        AtRestStores.publishDocumentsManifest(s, p): Unit
        val sources = docs.select("source").distinct()
          .collect().map(_.getString(0)).toSeq
        AtRestStores.compactDocumentsSourcesClustered(s, p, sources,
          Seq("n_chars", "doc_id"), filesPerSource = 4): Unit
        AtRestStores.refreshDocumentsSidecars(s, p,
          Seq("n_chars", "doc_id"), TextOps.toksS, TermBuckets)
        p
      }))

  private val compactedStoreCache = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), String]

  /** Bucket count for the term-membership sidecar: 1<<14 against a
    * ~60-term fixture vocabulary makes collisions essentially
    * impossible at test scale while staying KBs per file; production
    * sizes this to distinct-terms-per-file × acceptable FP rate.
    */
  val TermBuckets = 16384

  /** Build-once z-ordered documents store per (session, corpus) with
    * its min/max envelope manifest (the layout is at-rest state,
    * written by maintenance, read for months; the termStoreCache
    * pattern — bytes on disk, not Spark-cached). Shared by zorder_scan
    * and term_pruned_scan, whichever runs first builds. The term-
    * membership sidecar builds separately ([[termManifest]]) so a
    * zorder_scan-only run never pays the full-corpus tokenize its
    * result doesn't use.
    */
  private def zStore(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    zStoreCache.synchronized(
      zStoreCache.getOrElseUpdate((s, dir), {
        val p = java.nio.file.Files
          .createTempDirectory("graft-zstore").toString + "/docs"
        StorageLayout.writeZOrdered(t(s, dir, "documents"), p,
          Seq("n_chars", "doc_id"), nFiles = 16): Unit
        StorageLayout.statsManifest(s, p, Seq("n_chars", "doc_id"))
          .coalesce(1).write.mode("overwrite")
          .parquet(p + ".manifest")
        p
      }))

  /** Lazily add the term-membership sidecar to a built z-store. */
  private def termManifest(s: org.apache.spark.sql.SparkSession,
      path: String): Unit =
    termManifestBuilt.synchronized {
      if (termManifestBuilt.add((s, path))) {
        StorageLayout.termManifest(s, path, TextOps.toksS, TermBuckets)
          .coalesce(1).write.mode("overwrite")
          .parquet(path + ".terms")
      }
    }

  private val termManifestBuilt = scala.collection.mutable.Set.empty[
    (org.apache.spark.sql.SparkSession, String)]

  /** Session-scoped z-ordered store paths for zorder_scan. */
  private val zStoreCache = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), String]
}
