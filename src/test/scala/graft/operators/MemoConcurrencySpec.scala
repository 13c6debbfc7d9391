package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import graft.{Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Memo's concurrency contract under PARALLEL query threads (VERDICT
  * r9 #8): a retrieval/curation service issues concurrent queries
  * against one session, and the memoized tables they share must
  * materialize once — not once per thread — while every caller sees a
  * consistent result. ChainSoak is single-threaded; this spec drives
  * the memo path from competing threads directly.
  */
class MemoConcurrencySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("8 threads racing the same (cache, key): exactly ONE build, " +
    "every thread gets the same frame") {
    val spark = TestSpark.spark
    val builds = new AtomicInteger(0)
    val key = "memo-conc-same-key"
    val docs = Tables.t(spark, dir, "documents")
    val fs = (1 to 8).map(_ => Future {
      Memo.memo("conc_test", spark, key, persistIt = true) {
        builds.incrementAndGet()
        // A real (executable) build body — slow enough that racers
        // genuinely overlap it.
        Thread.sleep(200)
        Pipeline.docTermsPlan(docs)
      }
    })
    val frames = fs.map(Await.result(_, 120.seconds))
    assert(builds.get() == 1,
      s"concurrent same-key callers ran ${builds.get()} builds")
    // One shared frame: all callers hold the identical instance, so
    // there is exactly one persisted copy to evict later.
    assert(frames.distinct.size == 1, "callers got different frames")
    val n = frames.head.count()
    assert(n > 0)
  }

  test("concurrent dedup/term queries through the REAL operators " +
    "share one materialization per table and agree on results") {
    val spark = TestSpark.spark
    val key = "memo-conc-ops"
    val docs = Tables.t(spark, dir, "documents")
    val before = Memo.entryCount(spark)
    // 6 threads, 2 distinct memoized tables (docTerms, docShingles),
    // each consumed by 3 racers.
    val fs = (1 to 6).map { i =>
      Future {
        if (i % 2 == 0) Pipeline.docTerms(docs, key).count()
        else Dedup.docShingles(docs, cacheKey = key).count()
      }
    }
    val counts = fs.map(Await.result(_, 120.seconds))
    assert(counts.distinct.size == 2,
      s"racers over the same table disagreed: $counts")
    // Exactly one entry per memoized table appeared — no
    // double-materialization, no cross-eviction between DIFFERENT
    // caches sharing a session.
    assert(Memo.entryCount(spark) == before + 2,
      s"expected 2 new memo entries, " +
        s"got ${Memo.entryCount(spark) - before}")
    // Steady state: a second wave reuses both tables (no new entries).
    val again = (1 to 4).map(i => Future {
      if (i % 2 == 0) Pipeline.docTerms(docs, key).count()
      else Dedup.docShingles(docs, cacheKey = key).count()
    }).map(Await.result(_, 120.seconds))
    assert(again.toSet == counts.toSet)
    assert(Memo.entryCount(spark) == before + 2)
  }

  test("concurrent builders of DIFFERENT keys in one cache: last " +
    "writer wins the single slot, loser's storage is released, no " +
    "deadlock") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, dir, "documents")
    val built = new AtomicInteger(0)
    val fs = Seq("memo-conc-kA", "memo-conc-kB").map { k =>
      Future {
        val df = Memo.memo("conc_evict", spark, k, persistIt = true) {
          built.incrementAndGet()
          Pipeline.docTermsPlan(docs)
        }
        // Consume immediately — the contract says do NOT retain across
        // eviction; a prompt consumer is always safe (persist is a
        // cache, eviction mid-count just recomputes).
        df.count()
      }
    }
    val counts = fs.map(Await.result(_, 120.seconds))
    assert(built.get() == 2 && counts.distinct.size == 1)
    // The single-live-key bound holds: at most one of the two keys
    // survives in the cache (eviction runs post-build on each insert).
    val live = Memo.entryCount(spark)
    Memo.clearCaches(spark)
    assert(Memo.entryCount(spark) == 0)
    assert(live >= 1)
  }
}
