package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured incremental corpus term statistics — the at-rest
  * table the df/N consumers (token_freq, tfidf, vocab_stats, bm25)
  * refresh from in production, instead of re-tokenizing 100 TB: each
  * intake epoch appends vocabulary-sized PARTIALS `(term, df_d, tf_d)`
  * (document frequency and token-mass deltas from that epoch alone),
  * reads aggregate with one `groupBy(term).sum` over the partial files,
  * and periodic compaction folds the log back to a handful of files —
  * the LSM cadence, with the manifest giving readers snapshot
  * isolation through the fold exactly as for the vector stores.
  *
  * The corpus document count rides IN the same table as a reserved
  * null-term row (`(NULL, n_docs_delta, 0)`): one directory, one
  * manifest, one compaction path. `docTermsPlan` never emits a null
  * term, so the key cannot collide.
  *
  * Layout: parquet partial files under `path/partials/` plus the
  * `path/_epochs/` intake ledger (StoreIntake.termStatsIntakeBatch).
  */
object TermStatsStore {

  /** One epoch's partials from a batch of (doc_id, text) documents:
    * per-term (df_d, tf_d) plus the null-term doc-count row. Runs the
    * SAME tokenize+count plan as the batch term table, so incremental
    * stats are batch stats by construction.
    */
  def partialsPlan(batch: DataFrame): DataFrame =
    partialsFromTerms(Pipeline.docTermsPlan(batch), batch)

  private def partialsFromTerms(tf: DataFrame,
      batch: DataFrame): DataFrame =
    tf.groupBy("term")
      .agg(count(lit(1)).as("df_d"), sum(col("tf")).as("tf_d"))
      .unionByName(
        batch.agg(
          lit(null).cast("string").as("term"),
          countDistinct(col("doc_id")).as("df_d"),
          lit(0L).as("tf_d")))

  /** Stage one epoch under `stageDir/partials` (the shape
    * StoreIntake.appendEpoch renames into the store). Coalesced to 2
    * files: the partials are vocabulary-sized KBs — writing one file
    * per shuffle partition would add 32 tiny files per epoch on
    * local[32] and re-create the small-files growth the fold exists
    * to bound.
    *
    * With `sketchSources = true` (batch must carry `source`) the
    * epoch also stages a theta-sketch SIDECAR under
    * `stageDir/sketches`: one (source, sketch-bytes) row per source
    * in the batch — KBs, built from the same tokenize pass shape
    * (ThetaSketches' shuffle-free partial build). Sidecar rows ride
    * the SAME crash-safe epoch placement as the partials, so replay /
    * ledger semantics cover them for free; they are never folded
    * (epochs × sources rows per year is catalog-scale) — readers
    * union per source at query time ([[sourceSketches]]).
    */
  def stagePartials(batch: DataFrame, stageDir: String,
      sketchSources: Boolean = false,
      sketchLengths: Boolean = false,
      sketchHitters: Boolean = false): Unit = {
    // The tokenize pass dominates epoch cost; when the theta sidecar
    // is on, both it and the partials consume the SAME docTerms table
    // — persist it for the epoch so intake tokenizes each batch once,
    // not per consumer. (The lenq sidecar only needs text length and
    // never touches docTerms.)
    val tf0 = Pipeline.docTermsPlan(batch)
    val tf = if (sketchSources || sketchHitters) tf0.persist() else tf0
    try {
      partialsFromTerms(tf, batch)
        .coalesce(2).write.parquet(s"$stageDir/partials")
      if (sketchSources)
        ThetaSketches.sourceTermSketches(
            tf.join(batch.select(col("doc_id"), col("source")), "doc_id"))
          .toDF("source", "sk")
          .coalesce(1).write.parquet(s"$stageDir/sketches")
      if (sketchHitters) {
        val spark = batch.sparkSession
        import spark.implicits._
        Seq(HeavyHitters.toBytes(HeavyHitters.termSketch(tf, 32768)))
          .toDF("sk")
          .coalesce(1).write.parquet(s"$stageDir/mg")
      }
      if (sketchLengths)
        QuantileSketches.groupedSketches(
            QuantileSketches.lengthVals(batch), k = 1024)
          .toDF("source", "sk")
          .coalesce(1).write.parquet(s"$stageDir/lenq")
    } finally if (sketchSources || sketchHitters) tf.unpersist(): Unit
  }

  /** Applied-epoch sidecar files under `path/sub`: the directory
    * listing intersected with the epoch ledger (live markers + the
    * consolidated `.applied`), sorted by name. The intersection is the
    * crash-window guard: a killed epoch can leave a landed sidecar
    * file with NO marker, and a raw directory read would count its
    * rows while the manifested partials exclude them — mutually
    * inconsistent store answers until the replay. Reading only
    * ledger-listed files gives every sidecar consumer the same
    * applied-only view the partials manifest gives the stats.
    */
  private def appliedSidecarFiles(spark: SparkSession, path: String,
      sub: String): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/$sub")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return Seq.empty
    val applied = graft.streaming.StoreIntake.ledgerFiles(spark, path)
      .toSet
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filterNot(p => p.getName.startsWith(".") ||
        p.getName.startsWith("_"))
      .filter(p => applied.contains(s"$sub/${p.getName}"))
      .sortBy(_.getName)
      .map(_.toString)
  }

  /** Shared (source, sketch-bytes) sidecar reader: applied-epoch files
    * only, grouped per source, merged with the family's own merge —
    * driver-side over the (epochs × sources)-sized list.
    */
  private def mergedSourceSidecars(spark: SparkSession, path: String,
      sub: String,
      merge: Seq[Array[Byte]] => Array[Byte])
      : Seq[(String, Array[Byte])] = {
    val files = appliedSidecarFiles(spark, path, sub)
    if (files.isEmpty) return Seq.empty
    spark.read.parquet(files: _*)
      .select("source", "sk").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1))).toSeq
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, rows) => (src, merge(rows.map(_._2))) }
  }

  /** Per-source theta sketches merged across every APPLIED intake
    * epoch's sidecar rows. Empty when the store was built without
    * sidecars.
    */
  def sourceSketches(spark: SparkSession,
      path: String): Seq[(String, Array[Byte])] =
    mergedSourceSidecars(spark, path, "sketches",
      bs => ThetaSketches.unionAll(bs))

  /** Pairwise distinct-term overlap between sources, answered FROM the
    * store's sketch sidecars — no corpus access at all: union the
    * per-epoch sketches per source, intersect pairwise. The
    * incremental form of ThetaSketches.sourceOverlapEstimates.
    */
  def sourceOverlapFromStore(spark: SparkSession,
      path: String): DataFrame = {
    import spark.implicits._
    ThetaSketches.pairwiseIntersections(sourceSketches(spark, path))
      .toDF("src_a", "src_b", "shared_terms")
  }

  /** Per-source KLL document-length sketches merged across every
    * APPLIED intake epoch's `lenq` sidecar rows — the theta-sidecar
    * pattern. Empty when the store was built without length sidecars.
    */
  def sourceLengthSketches(spark: SparkSession,
      path: String): Seq[(String, Array[Byte])] =
    mergedSourceSidecars(spark, path, "lenq",
      bs => QuantileSketches.mergeAll(bs))

  /** Per-source document-length quantiles answered FROM the store's
    * KLL sidecars — no corpus access at query time: union the
    * per-epoch sketches per source, read the ranks. The incremental
    * form of QuantileSketches.sourceLengthQuantiles; exact while each
    * source's total ingested count stays ≤ k.
    */
  def sourceLengthQuantilesFromStore(spark: SparkSession,
      path: String): DataFrame = {
    import spark.implicits._
    sourceLengthSketches(spark, path)
      .map { case (src, b) =>
        val (p25, p50, p75, p95, n) = QuantileSketches.lengthQuantileRow(b)
        (src, p25, p50, p75, p95, n)
      }
      .toDF("source", "p25", "p50", "p75", "p95", "n_vals")
  }

  /** Corpus heavy hitters answered FROM the store's Misra–Gries
    * sidecars — one KB row per intake epoch, merged in epoch-file-name
    * order (a STABLE total order: merge order steers the purge
    * sequence, and the error bounds hold under any order, so
    * stability is all determinism needs). Zero corpus access; the
    * incremental form of HeavyHitters.termHeavyHitters. Exact while
    * the corpus vocabulary has never forced a purge.
    */
  def hittersFromStore(spark: SparkSession, path: String,
      divisor: Long = 50L, maxMapSize: Int = 32768): DataFrame = {
    import spark.implicits._
    val files = appliedSidecarFiles(spark, path, "mg")
    if (files.isEmpty)
      return Seq.empty[(String, Long)].toDF("term", "est_count")
    val epochs = spark.read.parquet(files: _*)
      .select(input_file_name().as("f"), col("sk")).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1).map(_._2).toSeq
    HeavyHitters
      .hitterRows(HeavyHitters.mergeAll(epochs, maxMapSize), divisor)
      .toDF("term", "est_count")
  }

  private def partialsRoot(path: String) = s"$path/partials"

  /** The raw partials frame — manifested snapshot when a manifest
    * exists (reader-safe through compaction), plain listing read
    * otherwise.
    */
  def partials(spark: SparkSession, path: String): DataFrame = {
    val root = partialsRoot(path)
    if (StoreManifest.currentVersion(spark, root).isDefined)
      StoreManifest.snapshotRead(spark, root)
    else spark.read.parquet(root)
  }

  /** Aggregated per-term stats `(term, df, tf_total)` — ONE bounded
    * vocabulary-keyed aggregate over the partial log.
    */
  def termStats(spark: SparkSession, path: String): DataFrame =
    partials(spark, path)
      .filter(col("term").isNotNull)
      .groupBy("term")
      .agg(sum(col("df_d")).as("df"), sum(col("tf_d")).as("tf_total"))

  /** Total corpus document count (the N of df/N), from the reserved
    * null-term rows.
    */
  def docsCount(spark: SparkSession, path: String): Long =
    partials(spark, path)
      .filter(col("term").isNull)
      .agg(coalesce(sum(col("df_d")), lit(0L))).head().getLong(0)

  /** Adopt snapshot manifests (pin the current partial files as v1) —
    * required before [[compact]]; intake epochs publish compositionally
    * from then on.
    */
  def publishManifest(spark: SparkSession, path: String): Long =
    StoreManifest.publish(spark, partialsRoot(path),
      StoreManifest.listDataFiles(spark, partialsRoot(path)))

  /** Fold the partial log: every live partial collapses into fresh
    * per-term totals (and one folded null-term row) under new file
    * names, one pointer flip. Readers racing the fold see the old or
    * the new log, never a mix; expired partials await
    * `StoreManifest.gcExpired`.
    */
  def compact(spark: SparkSession, path: String): Long =
    StoreManifest.compactAllSnapshot(spark, partialsRoot(path), df =>
      df.groupBy("term")
        .agg(sum(col("df_d")).as("df_d"), sum(col("tf_d")).as("tf_d"))
        // Vocabulary-sized output: a handful of files regardless of
        // how many epochs folded. At 100 TB scale raise this with the
        // vocabulary, or repartition by term range for sorted runs.
        .coalesce(2))
}
