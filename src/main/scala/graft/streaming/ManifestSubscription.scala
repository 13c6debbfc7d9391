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
  * [[reset]] the cursor to that snapshot's version (a fresh
  * subscriber just [[subscribe]]s there).
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
    * before the first [[subscribe]]. Stored as versioned files
    * `<cursorPath>.<v>` — the current cursor is the max suffix
    * (ADVICE r16): the previous single-file layout advanced via
    * delete+rename on filesystems whose rename won't replace, leaving
    * a crash window with NO cursor on disk; a restarted subscriber
    * would then [[subscribe]] as if fresh and silently re-bootstrap at
    * its configured `afterVersion` — skipping ranges when that is
    * ahead of the lost position. With create-new-then-delete-old the
    * "cursor lost" state is unrepresentable: the new version file
    * exists before any old one is removed, a fresh name is never
    * renamed over, and a crash mid-cleanup just leaves stale lower
    * versions that max() ignores.
    *
    * A pre-upgrade LEGACY cursor — the single bare file at
    * `cursorPath` itself — still reads (max'd with any versioned
    * files): ignoring it would make an upgraded subscriber look FRESH
    * and silently re-bootstrap at its configured start, the exact
    * range-skipping hazard the versioned layout closes. The first
    * [[advance]] after the upgrade migrates it (bare file deleted
    * once the versioned cursor is durable).
    */
  def cursor(spark: SparkSession): Option[Long] = {
    val f = fs(spark)
    val p = new Path(cursorPath)
    val dir = Option(p.getParent).getOrElse(new Path("."))
    if (!f.exists(dir)) return None
    val prefix = p.getName + "."
    val vs = f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) =>
        n.stripPrefix(prefix) }
      .flatMap(_.toLongOption)
    val legacy = if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toLongOption
      finally in.close()
    }
    val all = vs ++ legacy
    if (all.isEmpty) None else Some(all.max)
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
    val dir = Option(p.getParent).getOrElse(new Path("."))
    val tmp = new Path(dir, s".${p.getName}-tmp-$v")
    f.mkdirs(dir): Unit
    val out = f.create(tmp, true)
    try out.write(s"$v\n".getBytes("UTF-8"))
    finally out.close()
    // Rename to a FRESH name (`<cursor>.<v>` never exists before this
    // advance), so the rename needs no replace semantics on any
    // filesystem; only after the new cursor is durable are the lower
    // versions cleaned up. A crash anywhere leaves either the old
    // cursor (range re-delivered — the at-least-once contract) or
    // both (max() reads the new one); never none.
    val dst = new Path(dir, s"${p.getName}.$v")
    require(f.rename(tmp, dst), s"could not advance cursor to v$v")
    val prefix = p.getName + "."
    f.listStatus(dir).toSeq.map(_.getPath)
      .filter { q =>
        val n = q.getName
        n.startsWith(prefix) &&
          n.stripPrefix(prefix).toLongOption.exists(_ < v)
      }
      .foreach(q => f.delete(q, false): Unit)
    // Migrate a legacy bare cursor once the versioned one is durable:
    // advance is only ever called with v >= cursor() >= the legacy
    // value, so the delete can never lose position.
    if (f.exists(p)) f.delete(p, false): Unit
  }

  /** Forcibly move the cursor to `atVersion` — the second half of the
    * documented re-bootstrap after [[poll]] rejects a range GC'd past
    * retention: consume a full snapshot ([[graft.operators.StoreManifest
    * .snapshotRead]]) of version V, then `reset(spark, V)` so the next
    * poll resumes with deltas after V. Guarded forward-only: rewinding
    * a cursor re-delivers ranges outside any crash window, which only
    * a ledgered handler could absorb — a deliberate rewind should drop
    * the cursor files and subscribe() fresh instead.
    */
  def reset(spark: SparkSession, atVersion: Long): Unit = {
    val cur = cursor(spark).getOrElse(throw new IllegalStateException(
      s"no cursor at $cursorPath — subscribe() first"))
    require(atVersion >= cur,
      s"reset must move forward (cursor v$cur, asked v$atVersion)")
    if (atVersion > cur) advance(spark, atVersion)
  }

  /** One poll of the subscription; returns the delivered (from, to]
    * range, or None when the line has nothing new. The handler runs
    * BEFORE the cursor advances — see the class contract.
    */
  def poll(spark: SparkSession)(
      handle: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = cursor(spark).getOrElse(throw new IllegalStateException(
      s"no cursor at $cursorPath — subscribe() first"))
    // A cursor AHEAD of the published line is never "nothing new"
    // (ADVICE r16): versions are dense and monotone, and a cursor only
    // ever advances to an observed currentVersion — ahead means the
    // store was rebuilt/reset under the subscriber, or this cursor
    // file is cross-wired to the wrong store. Reading it as caught-up
    // would stall the subscription silently forever; reject loudly
    // instead (versions start at 1, so cursor 0 against a not-yet-
    // published line is a legitimate wait, not a reset).
    val to = StoreManifest.currentVersion(spark, storeRoot).getOrElse(0L)
    if (to < from) throw new IllegalStateException(
      s"cursor $cursorPath is at v$from but $storeRoot's line is at " +
        s"v$to — store reset/rebuilt or cursor cross-wired; " +
        "re-bootstrap from a full snapshot and subscribe() fresh")
    if (to == from) return None
    handle(StoreManifest.deltaRead(spark, storeRoot, from, to), from, to)
    advance(spark, to)
    Some((from, to))
  }
}
