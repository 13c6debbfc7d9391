package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.operators.StoreManifest
import org.scalatest.funsuite.AnyFunSuite

/** The deltaRead subscription (VERDICT r15 #5): every delivered range
  * must equal the batch `deltaRead` over the same (from, to] — across
  * a subscriber restart mid-line, a compaction mid-subscription, and
  * a re-delivered range (the crash window between handler and cursor
  * advance). The declared `snapshot_subscribe` query drives the same
  * machinery against the DuckDB oracle; this spec pins the range
  * mechanics on a hand-built version line where every step is exact.
  */
class ManifestSubscriptionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeEpoch(root: String, name: String,
      ids: Seq[Long]): String = {
    import spark.implicits._
    ids.map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1).write.parquet(s"$root/$name")
    StoreManifest.listDataFiles(spark, root)
      .filter(_.startsWith(s"$name/")).head
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("each poll delivers exactly the batch deltaRead of its range, " +
    "across restart, compaction, and a re-delivered crash window") {
    val work = Files.createTempDirectory("graft-subspec").toString
    val root = s"$work/store"
    val cursor = s"$work/cursor"
    val delivered =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Set[Long])]
    def handler(df: org.apache.spark.sql.DataFrame, from: Long,
        to: Long): Unit = delivered += ((from, to, ids(df)))

    val f1 = writeEpoch(root, "e1", Seq(1L, 2L))
    StoreManifest.publish(spark, root, Seq(f1)): Unit // v1
    val sub1 = new ManifestSubscription(root, cursor)
    assert(sub1.subscribe(spark, 1L) == 1L)
    assert(sub1.poll(spark)(handler).isEmpty,
      "an up-to-date line answers 'nothing new'")

    val f2 = writeEpoch(root, "e2", Seq(3L, 4L))
    StoreManifest.publish(spark, root, Seq(f1, f2)): Unit // v2 append
    assert(sub1.poll(spark)(handler).contains((1L, 2L)))
    assert(delivered.last == ((1L, 2L,
      ids(StoreManifest.deltaRead(spark, root, 1L, 2L)))))
    assert(delivered.last._3 == Set(3L, 4L))

    // Restart mid-line: the durable cursor wins over afterVersion.
    val sub2 = new ManifestSubscription(root, cursor)
    assert(sub2.subscribe(spark, 1L) == 2L)

    // Compaction mid-subscription (v3): delivered as an EMPTY delta —
    // the op-tag walk never re-delivers restated rows.
    StoreManifest.compactAllSnapshot(spark, root, identity): Unit
    assert(sub2.poll(spark)(handler).contains((2L, 3L)))
    assert(delivered.last._3 == Set.empty[Long])

    val f3 = writeEpoch(root, "e3", Seq(5L))
    StoreManifest.publish(spark, root,
      StoreManifest.files(spark, root).get :+ f3): Unit // v4 append
    assert(sub2.poll(spark)(handler).contains((3L, 4L)))
    assert(delivered.last == ((3L, 4L,
      ids(StoreManifest.deltaRead(spark, root, 3L, 4L)))))
    assert(delivered.last._3 == Set(5L))

    // The crash window: handler ran, cursor never advanced — the next
    // poll re-delivers the SAME deterministic range. Simulated by
    // dropping the versioned cursor files (cursor.<v>) and
    // re-subscribing at the pre-handler position.
    val fs = new org.apache.hadoop.fs.Path(cursor)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new org.apache.hadoop.fs.Path(work)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("cursor."))
      .foreach(p => fs.delete(p, false))
    val sub3 = new ManifestSubscription(root, cursor)
    assert(sub3.subscribe(spark, 3L) == 3L)
    assert(sub3.poll(spark)(handler).contains((3L, 4L)))
    assert(delivered.takeRight(2).map(_._3).distinct.size == 1,
      "a re-delivered range must carry identical content")
    assert(sub3.poll(spark)(handler).isEmpty,
      "a drained line answers 'nothing new' again")

    // No row delivered twice outside the deliberate replay, none lost:
    // the union of the non-replayed deliveries is exactly the appends.
    assert(delivered.dropRight(1).flatMap(_._3).toSet == Set(3L, 4L, 5L))
  }

  test("polling without a cursor rejects loudly") {
    val work = Files.createTempDirectory("graft-subspec2").toString
    val root = s"$work/store"
    val f1 = writeEpoch(root, "e1", Seq(1L))
    StoreManifest.publish(spark, root, Seq(f1)): Unit
    val sub = new ManifestSubscription(root, s"$work/cursor")
    intercept[IllegalStateException] {
      sub.poll(spark)((_, _, _) => ())
    }
  }

  test("a cursor ahead of the published line rejects loudly; " +
    "cursor 0 against a not-yet-published line waits") {
    val work = Files.createTempDirectory("graft-subspec3").toString
    val root = s"$work/store"
    // Subscribing at 0 BEFORE the first publish is a legitimate wait
    // (versions start at 1): poll answers "nothing new", not an error.
    val early = new ManifestSubscription(root, s"$work/cur-early")
    assert(early.subscribe(spark, 0L) == 0L)
    assert(early.poll(spark)((_, _, _) => ()).isEmpty)

    val f1 = writeEpoch(root, "e1", Seq(1L, 2L))
    StoreManifest.publish(spark, root, Seq(f1)): Unit // v1
    val f2 = writeEpoch(root, "e2", Seq(3L))
    StoreManifest.publish(spark, root, Seq(f1, f2)): Unit // v2
    val sub = new ManifestSubscription(root, s"$work/cursor")
    assert(sub.subscribe(spark, 1L) == 1L)
    assert(sub.poll(spark)((_, _, _) => ()).contains((1L, 2L)))

    // Store rebuilt/reset under the subscriber: the line restarts at
    // v1 while the cursor sits at v2. Silence here would stall the
    // subscription forever — the ADVICE r16 hole.
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val g1 = writeEpoch(root, "g1", Seq(9L))
    StoreManifest.publish(spark, root, Seq(g1)): Unit // fresh v1
    val e = intercept[IllegalStateException] {
      sub.poll(spark)((_, _, _) => ())
    }
    assert(e.getMessage.contains("reset"),
      s"rejection must name the reset, got: ${e.getMessage}")

    // Same cursor against a store with NO published line at all (wiped
    // including the manifest): equally loud, never 'nothing new'.
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    intercept[IllegalStateException] {
      sub.poll(spark)((_, _, _) => ())
    }
  }

  /** Directive r16 #5: many cursors, zero coordination — and the
    * retention interplay. A SLOW subscriber whose unconsumed range is
    * compacted and then GC'd past retention must be rejected loudly by
    * name on its next poll (deltaRead's contract), the documented
    * re-bootstrap (snapshotRead → reset at that version) must land it
    * consistent, and a concurrent FAST subscriber must be undisturbed
    * throughout.
    */
  test("a slow subscriber crossing a fold+GC is rejected loudly, " +
    "re-bootstraps consistent, and never disturbs a fast one") {
    val work = Files.createTempDirectory("graft-subspec4").toString
    val root = s"$work/store"
    val f1 = writeEpoch(root, "e1", Seq(1L, 2L))
    StoreManifest.publish(spark, root, Seq(f1)): Unit // v1
    val fast = new ManifestSubscription(root, s"$work/cur-fast")
    val slow = new ManifestSubscription(root, s"$work/cur-slow")
    // Both bootstrap from the v1 snapshot.
    val fastSeen = scala.collection.mutable.Set.empty[Long] ++=
      ids(StoreManifest.snapshotRead(spark, root))
    val slowSeen = scala.collection.mutable.Set.empty[Long] ++=
      ids(StoreManifest.snapshotRead(spark, root))
    assert(fast.subscribe(spark, 1L) == 1L)
    assert(slow.subscribe(spark, 1L) == 1L)

    val f2 = writeEpoch(root, "e2", Seq(3L, 4L))
    StoreManifest.publish(spark, root, Seq(f1, f2)): Unit // v2 append
    // Fast keeps up; slow sleeps through everything below.
    assert(fast.poll(spark)((d, _, _) => fastSeen ++= ids(d))
      .contains((1L, 2L)))

    StoreManifest.compactAllSnapshot(spark, root, identity): Unit // v3
    val f3 = writeEpoch(root, "e3", Seq(5L, 6L))
    StoreManifest.publish(spark, root,
      StoreManifest.files(spark, root).get :+ f3): Unit // v4 append
    // GC collects v3's expired set — the ORIGINAL e1/e2 files the
    // slow subscriber's (1, 4] range would need.
    assert(StoreManifest.gcExpired(spark, root, keepVersions = 1)
      .nonEmpty, "the fold's expired files must actually be collected")

    // Slow wakes up: its range is gone — loud, by name.
    val e = intercept[IllegalArgumentException] {
      slow.poll(spark)((_, _, _) => ())
    }
    assert(e.getMessage.contains("GC'd past retention"),
      s"rejection must name the GC, got: ${e.getMessage}")
    assert(slow.cursor(spark).contains(1L),
      "a rejected poll must not advance the cursor")

    // Documented re-bootstrap: one full snapshot + reset at its
    // version, then the subscription resumes with O(new data) polls.
    val cur = StoreManifest.currentVersion(spark, root).get
    slowSeen.clear()
    slowSeen ++= ids(StoreManifest.snapshotRead(spark, root))
    slow.reset(spark, cur)
    assert(slow.poll(spark)((_, _, _) => ()).isEmpty,
      "freshly re-bootstrapped = caught up")

    val f4 = writeEpoch(root, "e4", Seq(7L))
    StoreManifest.publish(spark, root,
      StoreManifest.files(spark, root).get :+ f4): Unit // v5 append
    assert(slow.poll(spark)((d, _, _) => slowSeen ++= ids(d))
      .contains((cur, cur + 1)))
    assert(slowSeen == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      "re-bootstrap + resumed deltas must equal the store")

    // The fast subscriber crossed the same fold+GC undisturbed: the
    // compact version deltas empty, appends arrive whole.
    assert(fast.poll(spark)((d, _, _) => fastSeen ++= ids(d))
      .contains((2L, 5L)))
    assert(fastSeen == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(ids(StoreManifest.snapshotRead(spark, root)) == fastSeen)
  }

  test("a pre-upgrade legacy single-file cursor still reads (no silent " +
    "fresh re-bootstrap) and migrates to the versioned layout on the " +
    "first advance") {
    val work = Files.createTempDirectory("graft-subspec-legacy").toString
    val root = s"$work/store"
    val cursorPath = s"$work/cur/cursor"
    val f1 = writeEpoch(root, "e1", Seq(1L, 2L))
    StoreManifest.publish(spark, root, Seq(f1)): Unit // v1
    val f2 = writeEpoch(root, "e2", Seq(3L))
    StoreManifest.publish(spark, root, Seq(f1, f2)): Unit // v2

    // Hand-write the OLD layout: one bare file holding the version.
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$work/cur"))
    java.nio.file.Files.write(java.nio.file.Paths.get(cursorPath),
      "1\n".getBytes("UTF-8")): Unit

    val sub = new ManifestSubscription(root, cursorPath)
    assert(sub.cursor(spark).contains(1L),
      "legacy bare cursor must read — an upgraded subscriber is not " +
        "fresh")
    // subscribe() must RESUME at the legacy position, not re-bootstrap
    // at its configured afterVersion.
    assert(sub.subscribe(spark, 2L) == 1L)
    val seen = scala.collection.mutable.Set.empty[Long]
    assert(sub.poll(spark)((d, _, _) => seen ++= ids(d))
      .contains((1L, 2L)))
    assert(seen == Set(3L), "the legacy position's delta must deliver")
    // The advance migrated the layout: bare file gone, versioned
    // cursor holds the new position.
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cursorPath)),
      "legacy bare cursor file must be deleted after migration")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$cursorPath.2")))
    assert(sub.cursor(spark).contains(2L))
  }
}
