package graft.streaming

import graft.operators.StoreManifest
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tail a manifested store's operation-tagged version line as a
  * SUBSCRIPTION (VERDICT r15 #5): incremental consumers previously
  * polled explicit version ranges ([[StoreManifest.deltaRead]] —
  * `snapshot_delta_scan`); production wants a cursor that survives
  * restarts and a loop that emits each append delta downstream exactly
  * once. This is the foreachBatch-driver-loop shape of that contract —
  * deliberately NOT a DataSourceV2: the manifest already IS a
  * changelog with dense versions and immutable lists, so a durable
  * cursor + `deltaRead` is the whole source, and the ledgered-handler
  * composition below gives the exactly-once the V2 offset API would.
  *
  * Mechanics per [[poll]]:
  *
  *  - read the durable cursor (a version number under tmp+rename, the
  *    manifest LATEST flip discipline) and the store's current
  *    version; nothing new → `None` ("nothing new" is a normal poll
  *    answer, not an error);
  *  - emit `deltaRead(cursor, current)` to the handler — exactly the
  *    files the range's APPEND versions added; compact versions are
  *    skipped by the op-tag walk, so a compaction mid-subscription is
  *    an empty (or partial) delta, never a re-delivery of restated
  *    rows;
  *  - advance the cursor AFTER the handler returns.
  *
  * Delivery contract: ranges are DETERMINISTIC (dense versions,
  * immutable lists) and delivery is at-least-once — a crash between
  * the handler and the cursor advance re-delivers the SAME range on
  * the next poll. Exactly-once therefore composes the same way every
  * sink in this engine gets it: key the handler's effect by
  * `toVersion` under an epoch ledger (StoreIntake — the declared
  * `snapshot_subscribe` query appends each delta into a downstream
  * store with `batchId = toVersion`, so the re-delivered range is a
  * ledger no-op). A handler without a ledger gets at-least-once with
  * deterministic replay — the same promise foreachBatch itself makes.
  *
  * Reset case (documented with the other stores' retention rules): a
  * cursor so old that the range's appended files were GC'd past
  * retention makes `deltaRead` reject loudly by name — re-bootstrap
  * from one full snapshot ([[StoreManifest.snapshotRead]]) and
  * [[subscribe]] a fresh cursor at that snapshot's version.
  *
  * Scale: a poll moves (cursor, current] — O(new data) parquet reads
  * plus a handful of KB-sized manifest line reads; the resident store
  * is never rescanned. Single-subscriber per cursor path (the cursor
  * is the subscriber identity); many subscribers = many cursor files,
  * zero coordination, because reads never mutate the store.
  */
final class ManifestSubscription(val storeRoot: String,
    val cursorPath: String) {

  private def fs(spark: SparkSession) = new Path(cursorPath)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** The durable cursor: last version this subscriber consumed, None
    * before the first [[subscribe]].
    */
  def cursor(spark: SparkSession): Option[Long] = {
    val f = fs(spark)
    val p = new Path(cursorPath)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLong)
      finally in.close()
    }
  }

  /** Start (or resume) the subscription: an existing cursor WINS — a
    * restarted subscriber continues mid-line instead of re-consuming
    * from its configured start. `afterVersion` is the bootstrap
    * position for a fresh cursor: deltas strictly after it (consume a
    * full snapshot of version V first, then subscribe after V).
    * Returns the effective cursor.
    */
  def subscribe(spark: SparkSession, afterVersion: Long): Long =
    cursor(spark).getOrElse {
      advance(spark, afterVersion)
      afterVersion
    }

  private def advance(spark: SparkSession, v: Long): Unit = {
    val f = fs(spark)
    val p = new Path(cursorPath)
    val tmp = new Path(
      Option(p.getParent).getOrElse(new Path(".")),
      s".${p.getName}-tmp-$v")
    Option(p.getParent).foreach(d => f.mkdirs(d): Unit)
    val out = f.create(tmp, true)
    try out.write(s"$v\n".getBytes("UTF-8"))
    finally out.close()
    // POSIX rename replaces atomically; HDFS-semantics fallback is
    // covered by the re-read-or-re-poll structure (an absent cursor
    // window would fail the next poll loudly, never skip a range).
    if (!f.rename(tmp, p)) {
      f.delete(p, false)
      require(f.rename(tmp, p), s"could not advance cursor to v$v")
    }
  }

  /** One poll of the subscription; returns the delivered (from, to]
    * range, or None when the line has nothing new. The handler runs
    * BEFORE the cursor advances — see the class contract.
    */
  def poll(spark: SparkSession)(
      handle: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = cursor(spark).getOrElse(throw new IllegalStateException(
      s"no cursor at $cursorPath — subscribe() first"))
    val to = StoreManifest.currentVersion(spark, storeRoot)
      .getOrElse(return None)
    if (to <= from) return None
    handle(StoreManifest.deltaRead(spark, storeRoot, from, to), from, to)
    advance(spark, to)
    Some((from, to))
  }
}
