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
    // poll re-delivers the SAME deterministic range.
    val fs = new org.apache.hadoop.fs.Path(cursor)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(cursor), false)
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
}
