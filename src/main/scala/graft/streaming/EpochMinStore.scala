package graft.streaming

import graft.operators.StoreManifest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.min

/** Epoch-appended MIN-MERGE store — the scale-correct at-rest half of
  * the TTL-bounded keeper election (VERDICT r14 #1). The previous sink
  * (`ParquetUpsertSink(mergeMin = true)`) read and rewrote the ENTIRE
  * store every micro-batch: for `streaming_pipeline` the store is
  * (window × location)-sized and the rewrite is cheap, but for the
  * keeper election the store IS the dedup index — one row per distinct
  * content key, i.e. corpus-scale — and per-trigger O(index) I/O means
  * a 1-minute trigger rewrites terabytes to apply kilobytes at 100 TB.
  *
  * This store is the LSM shape the engine already uses for term stats
  * (TermStatsStore) applied to keyed min-merge state:
  *
  *  - **Append**: each micro-batch reduces to its per-key minimum (a
  *    batch-sized aggregate — never a read of resident data) and lands
  *    as ONE new epoch under [[StoreIntake.appendEpoch]]'s exactly-once
  *    ledger; per-trigger write volume is ∝ the batch's distinct keys,
  *    not the store (EpochMinStoreSpec pins both properties). Replayed
  *    batchIds skip before any executor work — foreachBatch's
  *    at-least-once delivery converges without double-appends.
  *  - **Read**: min-at-read across resident epochs — one keyed
  *    aggregate over the manifest snapshot. Correct under ANY eviction
  *    and fold timing by the bounded-election safety argument
  *    (StatefulOps.canonicalKeepersBounded): every resident row is the
  *    min of a subset of a key's emissions and every emission is
  *    covered, so the min over resident rows equals the global min.
  *  - **Compact**: the min-merge FOLD runs at maintenance cadence
  *    (snapshot compaction via [[StoreManifest.compactAllSnapshot]] —
  *    fresh files, one pointer flip, expired files GC'd after
  *    retention), amortizing the O(index) rewrite over many triggers
  *    instead of paying it on every one. Post-compaction reads aggregate
  *    over an already-folded file set.
  *
  * Epochs publish into the manifest compositionally (current live list
  * + the epoch's placed files, one flip — the StoreIntake contract,
  * including the crash-between-marker-and-publish heal), so readers
  * racing an in-flight append see a consistent snapshot, never a
  * partial epoch.
  *
  * Single-writer contract: appends arrive through ONE streaming query's
  * serialized foreachBatch; compaction shares that window (triggered
  * in-loop here, operator-driven in production).
  */
final class EpochMinStore(val path: String, val keyCols: Seq[String],
    val scope: String, val compactOver: Int = 0) {

  /** Per-key, per-COLUMN minimum. With more than one value column the
    * mins are taken independently, so a converged row can interleave
    * values from different source rows (column-wise merge semantics,
    * NOT keep-the-min-row — ADVICE r15). That is exactly the lattice
    * the keeper election needs (one value column, so the distinction
    * is vacuous today); a caller wanting row-atomic min-by must pack
    * the row into a single orderable struct column instead.
    */
  private def minMerged(rows: DataFrame): DataFrame = {
    val nonKey = rows.columns.filterNot(keyCols.contains).toSeq
    require(nonKey.nonEmpty,
      "min-merge needs at least one non-key column to take the min of")
    rows.groupBy(keyCols.map(rows(_)): _*)
      .agg(min(nonKey.head).as(nonKey.head),
        nonKey.tail.map(c => min(c).as(c)): _*)
  }

  /** foreachBatch body: append one micro-batch's per-key minima as a
    * ledgered epoch. Touches no resident file; cost ∝ batch.
    */
  def append(batch: DataFrame, batchId: Long): Unit = {
    // The batch drives two actions (isEmpty, then the staged write) —
    // persist per the foreachBatch contract, or the upstream stateful
    // plan re-executes per action (the ParquetUpsertSink discipline).
    batch.persist()
    try appendPersisted(batch, batchId)
    finally batch.unpersist(): Unit
  }

  private def appendPersisted(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) {
      if (!StoreIntake.epochApplied(spark, path, scope, batchId))
        StoreIntake.appendEpoch(spark, path, scope, batchId)(_ => ()): Unit
      return
    }
    val placed = StoreIntake.appendEpoch(spark, path, scope, batchId) {
      stageDir => minMerged(batch).write.parquet(stageDir)
    }
    val manifested =
      StoreManifest.currentVersion(spark, path).isDefined
    placed match {
      case Some(p) =>
        if (manifested) StoreIntake.publishFresh(spark, path, p)
        else StoreManifest.publish(spark, path, p): Unit
      case None =>
        // Replay: heal a crash between marker create and publish —
        // unless the epoch was published and later folded away
        // (healMissing's everReferenced distinction). An UNMANIFESTED
        // store with a marker is the bootstrap crash window (first
        // epoch applied, process died before the first publish —
        // every successful append publishes, so no other state
        // reaches here): publish the marker-held files directly, or
        // the first epoch's minima would be lost from every future
        // snapshot while the marker blocks re-applying them.
        // markerFiles may surface legacy `files=N` marker lines that
        // are not paths (its doc delegates filtering to the caller —
        // ADVICE r15); the other intake callers filter by their path
        // prefix, but this store's epochs land flat at the root, so
        // the discipline here is existence: only entries that are
        // actual files on disk may enter the manifest.
        val rootPath = new org.apache.hadoop.fs.Path(path)
        val fs = rootPath.getFileSystem(
          spark.sessionState.newHadoopConf())
        val held = StoreIntake.markerFiles(spark, path, scope, batchId)
          .filter(f => fs.isFile(
            new org.apache.hadoop.fs.Path(rootPath, f)))
        if (manifested) StoreIntake.healMissing(spark, path, held)
        else if (held.nonEmpty) StoreManifest.publish(spark, path,
          held): Unit
    }
    if (placed.isDefined && compactOver > 0 &&
      StoreManifest.files(spark, path).exists(_.size > compactOver)) {
      compact(spark): Unit
    }
  }

  /** The min-merge LSM fold: collapse the current snapshot to one row
    * per key under fresh file names + one pointer flip; expired files
    * from versions two flips old are collected (in-flight readers of
    * the previous version stay whole). Returns the published version.
    */
  def compact(spark: SparkSession): Long = {
    val v = StoreManifest.compactAllSnapshot(spark, path, minMerged)
    StoreManifest.gcExpired(spark, path, keepVersions = 2): Unit
    v
  }

  /** Converged contents: per-key min across every resident epoch. The
    * manifest pin makes this a consistent point-in-time snapshot even
    * against concurrent appends.
    */
  def read(spark: SparkSession): DataFrame =
    minMerged(StoreManifest.snapshotRead(spark, path))
}
