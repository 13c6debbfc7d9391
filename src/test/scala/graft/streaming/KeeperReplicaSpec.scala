package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.StoreManifest
import org.scalatest.funsuite.AnyFunSuite

/** Composition of the round-16 pieces: a downstream REPLICA of the
  * epoch-min keeper store built by tailing its manifest line with
  * [[ManifestSubscription]] — the dedup-index replication shape (a
  * second region, a read-optimized serving copy). Two properties make
  * this sound WITHOUT any coordination with the writer:
  *
  *  - folds only RESTATE (the publishCompact contract), so the
  *    subscription's op-tag walk skipping them loses nothing — the
  *    replica already holds every folded epoch's minima;
  *  - min-merge is idempotent and associative, so the replica needs
  *    NO ledger: a re-delivered delta (the crash window between
  *    handler and cursor advance) merges to the same state. This is
  *    the CRDT argument — at-least-once delivery suffices where a
  *    general sink needs the toVersion ledger.
  */
class KeeperReplicaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a subscription replica converges to the keeper store across " +
    "folds, and re-delivered deltas are absorbed by min-merge") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-keeprep").toString
    val store = new EpochMinStore(s"$work/store", Seq("h"),
      scope = "spec", compactOver = 2)
    def df(rows: (String, Long)*) = rows.toDF("h", "keeper")

    val replica = scala.collection.mutable.Map.empty[String, Long]
    def merge(d: org.apache.spark.sql.DataFrame): Unit =
      d.select("h", "keeper").collect().foreach { r =>
        val (k, v) = (r.getString(0), r.getLong(1))
        replica.updateWith(k)(o =>
          Some(math.min(o.getOrElse(Long.MaxValue), v)))
      }

    // Bootstrap: first epoch lands (v1), replica consumes the v1
    // snapshot, subscription starts after it.
    store.append(df("a" -> 5L, "b" -> 9L), 0L)
    merge(StoreManifest.snapshotReadAsOf(spark, store.path, 1L))
    val sub = new ManifestSubscription(store.path, s"$work/cursor")
    assert(sub.subscribe(spark, 1L) == 1L)

    // Epochs 1..4 with the in-loop fold ARMED (compactOver = 2 fires
    // mid-stream); the replica polls after each append. Fold versions
    // arrive as empty deltas — nothing re-delivered, nothing lost.
    val feeds = Seq(
      df("a" -> 3L, "c" -> 7L), df("b" -> 11L, "d" -> 1L),
      df("c" -> 2L, "a" -> 8L), df("e" -> 4L))
    var lastFrom = -1L
    feeds.zipWithIndex.foreach { case (b, i) =>
      store.append(b, i + 1L)
      var drained = false
      while (!drained)
        drained = sub.poll(spark) { (d, f, _) =>
          merge(d); lastFrom = f
        }.isEmpty
    }
    val want = Map("a" -> 3L, "b" -> 9L, "c" -> 2L, "d" -> 1L,
      "e" -> 4L)
    assert(replica.toMap === want)
    assert(store.read(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap === want,
      "replica and store must agree")

    // The crash window: the cursor never advanced past the LAST
    // delivered range (deeper rollbacks eventually cross the keeper
    // store's own retention — in-loop folds gcExpire old epochs, and
    // deltaRead rejects GC'd ranges loudly; that reset path is
    // EpochMinStoreSpec's retention test). The re-delivered delta
    // MERGES to the same state with no ledger (min-merge idempotence);
    // a compact version inside the range stays skipped.
    val fs = new org.apache.hadoop.fs.Path(s"$work/cursor")
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(work)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("cursor."))
      .foreach(p => fs.delete(p, false))
    val sub2 = new ManifestSubscription(store.path, s"$work/cursor")
    assert(lastFrom > 0)
    assert(sub2.subscribe(spark, lastFrom) == lastFrom)
    var drained = false
    var redelivered = 0
    while (!drained)
      drained = sub2.poll(spark) { (d, _, _) =>
        redelivered += 1; merge(d)
      }.isEmpty
    assert(redelivered == 1)
    assert(replica.toMap === want,
      "re-delivered deltas must be absorbed, not double-counted")
  }
}
