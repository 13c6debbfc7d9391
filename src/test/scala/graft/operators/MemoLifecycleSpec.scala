package graft.operators

import java.lang.ref.WeakReference

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Memo's reference lifecycle: clearCaches must leave NO strong
  * references behind — keyed entries, keyless persisted frames, and
  * (transitively) the sessions those frames pin. The r5 verdict flagged
  * the session-retention trap: cache keys held SparkSessions in a
  * process-global map forever unless clearCaches ran.
  */
class MemoLifecycleSpec extends AnyFunSuite {

  private def awaitCollected(refs: Seq[WeakReference[_]]): Boolean = {
    var tries = 0
    while (refs.exists(_.get != null) && tries < 60) {
      System.gc()
      Thread.sleep(25)
      tries += 1
    }
    refs.forall(_.get == null)
  }

  test("clearCaches leaves keyed and keyless frames weakly collectable " +
    "(no strong refs retained)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // One keyed entry and one keyless persisted frame (the ADVICE-r5
    // leak shape: keyless callers that never unpersist).
    var keyed: DataFrame = Memo.memo("lifecycle-weak", spark, "k1",
      persistIt = true) { Seq(1, 2, 3).toDF("x") }
    var leaked: DataFrame = Memo.memo("lifecycle-weak", spark, "",
      persistIt = true) { Seq(4, 5).toDF("x") }
    assert(keyed.count() == 3 && leaked.count() == 2)
    assert(leaked.storageLevel.useMemory, "keyless frame persists")
    val refs = Seq(new WeakReference(keyed), new WeakReference(leaked))
    Memo.clearCaches(spark)
    assert(!leaked.storageLevel.useMemory,
      "clearCaches must release tracked keyless frames too")
    keyed = null
    leaked = null
    assert(awaitCollected(refs),
      "frames still strongly reachable after clearCaches — Memo retains " +
        "a reference")
  }

  test("keyless persistIt=false checkpoint-backed frames are tracked " +
    "and their executor storage released by clearCaches") {
    val spark = TestSpark.spark
    import spark.implicits._
    // The clusters() shape: storageLevel NONE at the Dataset layer,
    // storage pinned through the localCheckpoint LogicalRDD.
    val df = Memo.memo("lifecycle-ckpt", spark, "", persistIt = false) {
      Seq(1, 2, 3).toDF("x").localCheckpoint()
    }
    assert(Memo.checkpointRdds(df)
        .exists(_.getStorageLevel.useMemory),
      "precondition: the checkpoint blocks are live")
    Memo.clearCaches(spark)
    assert(Memo.checkpointRdds(df)
        .forall(!_.getStorageLevel.useMemory),
      "clearCaches must release checkpoint storage behind keyless " +
        "persistIt=false frames")
  }

  test("keyless tracking self-prunes entries the caller already " +
    "unpersisted (no per-batch accumulation in a long-lived service)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = Memo.entryCount(spark)
    // The disciplined-caller loop: keyless memo per batch, caller
    // unpersists each frame per the ownership contract.
    for (i <- 1 to 5) {
      val df = Memo.memo("lifecycle-prune", spark, "",
        persistIt = true) { Seq(i).toDF("x") }
      df.count()
      df.unpersist(blocking = true)
    }
    // The next keyless registration prunes the five NONE-level entries,
    // so tracking stays bounded at the one still-live frame.
    val live = Memo.memo("lifecycle-prune", spark, "",
      persistIt = true) { Seq(99).toDF("x") }
    live.count()
    assert(Memo.entryCount(spark) <= base + 1,
      "unpersisted keyless frames must be pruned, not accumulated")
    Memo.clearCaches(spark)
  }

  test("a THROWING build leaves the previous key's cached entry intact " +
    "(eviction happens only after a successful build)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val good = Memo.memo("lifecycle-evict", spark, "kA",
      persistIt = true) { Seq(1, 2).toDF("x") }
    assert(good.count() == 2)
    intercept[RuntimeException] {
      Memo.memo("lifecycle-evict", spark, "kB", persistIt = true) {
        throw new RuntimeException("build failed")
      }
    }
    // kA must still be cached AND still persisted — the old behavior
    // evicted/unpersisted it BEFORE running kB's build.
    assert(good.storageLevel.useMemory,
      "previous entry was unpersisted by a failed build")
    val again = Memo.memo("lifecycle-evict", spark, "kA",
      persistIt = true) { fail("kA should still be cached"); null }
    assert(again.count() == 2)
    Memo.clearCaches(spark)
  }

  test("concurrent same-key builders after a FAILED build converge on " +
    "one cached entry and leak no persisted duplicate") {
    // The race this pins: a failed build removes its transient lock
    // entry while a blocked second builder still holds the OLD lock
    // object, so a third builder can acquire a FRESH lock and build
    // the same key concurrently — the insert must be put-if-absent
    // (loser released), never an overwrite (winner's persist leaked).
    val spark = TestSpark.spark
    import spark.implicits._
    val t1InBuild = new java.util.concurrent.CountDownLatch(1)
    val t1Go = new java.util.concurrent.CountDownLatch(1)
    val built =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[DataFrame]())
    val t1 = new Thread(() => {
      intercept[RuntimeException] {
        Memo.memo("lifecycle-race", spark, "k", persistIt = true) {
          t1InBuild.countDown(); t1Go.await()
          throw new RuntimeException("t1 fails")
        }
      }: Unit
    })
    t1.start(); t1InBuild.await()
    // t2 queues on t1's lock object while t1 is still inside build.
    val t2 = new Thread(() => {
      val df = Memo.memo("lifecycle-race", spark, "k",
        persistIt = true) {
        val d = Seq(2).toDF("x"); built.add(d): Unit; d
      }
      assert(df.count() == 1)
    })
    t2.start(); Thread.sleep(100)
    // t1 fails → lock entry removed while t2 still holds the old lock;
    // t3 (this thread) races t2 on a fresh lock object.
    t1Go.countDown(); t1.join()
    val df3 = Memo.memo("lifecycle-race", spark, "k",
      persistIt = true) {
      val d = Seq(3).toDF("x"); built.add(d): Unit; d
    }
    t2.join()
    assert(df3.count() == 1)
    // Exactly one built frame may remain persisted (the cache winner);
    // any racing loser must have been released, not leaked.
    val persisted = built.toArray(Array.empty[DataFrame])
      .filter(_.storageLevel.useMemory)
    assert(persisted.length <= 1,
      s"a losing duplicate build stayed persisted (${built.size} built)")
    Memo.clearCaches(spark)
  }

  test("a discarded child session's memo entries release with " +
    "clearCaches: Memo retains nothing for the session") {
    val spark = TestSpark.spark
    var s2 = spark.newSession()
    def mk(s: org.apache.spark.sql.SparkSession): DataFrame = {
      import s.implicits._
      Memo.memo("lifecycle-weak2", s, "k", persistIt = true) {
        Seq(1L, 2L).toDF("x")
      }
    }
    var df: DataFrame = mk(s2)
    assert(df.count() == 2)
    assert(Memo.entryCount(s2) == 1)
    Memo.clearCaches(s2)
    // The direct contract: NOTHING held for the session — keyed keys
    // (which embed the session) or keyless frames (which pin it via
    // df.sparkSession). The session OBJECT may still be reachable
    // through Spark's own inheritable thread-locals (threads spawned
    // while it was active), so collectability is asserted on the frame,
    // which only Memo and this test ever referenced.
    assert(Memo.entryCount(s2) == 0,
      "clearCaches must drop every keyed entry and keyless frame of " +
        "the session")
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val refs = Seq(new WeakReference(df))
    df = null
    s2 = null
    assert(awaitCollected(refs),
      "frame still strongly reachable after clearCaches — Memo " +
        "retains a reference")
  }
}
