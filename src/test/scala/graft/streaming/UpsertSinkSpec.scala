package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class UpsertSinkSpec extends AnyFunSuite {

  test("upsert replaces rows on key, keeps others, ignores empty batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/s"
    val sink = new ParquetUpsertSink(dir, Seq("k"))

    sink.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), 0L)
    sink.upsert(Seq(("b", 20), ("c", 30)).toDF("k", "v"), 1L)
    // Empty batch: guard short-circuits (reference A7) — store untouched.
    sink.upsert(Seq.empty[(String, Int)].toDF("k", "v"), 2L)

    val out = sink.read(spark).as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 1, "b" -> 20, "c" -> 30))
  }

  test("mergeMin converges to the per-key minimum across batches and " +
    "within a batch — a later higher value never overwrites") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsertmin").toString + "/s"
    val sink = new ParquetUpsertSink(dir, Seq("k"), mergeMin = true)

    // Intra-batch duplicate keys: the keyed min-aggregate resolves them
    // (no winner-selection window needed under merge-by-min).
    sink.upsert(Seq(("a", 7L), ("a", 3L), ("b", 9L)).toDF("k", "v"), 0L)
    // A cold key recurring with a HIGHER value (the TTL-evicted
    // re-election shape) must NOT displace the resident minimum; a
    // lower value must.
    sink.upsert(Seq(("a", 50L), ("b", 2L), ("c", 4L)).toDF("k", "v"), 1L)

    val out = sink.read(spark).as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 3L, "b" -> 2L, "c" -> 4L))
  }

  test("recover restores the store after a crash between the two moves") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/s"
    val sink = new ParquetUpsertSink(dir, Seq("k"))
    sink.upsert(Seq(("a", 1)).toDF("k", "v"), 0L)

    // Simulate the crash window: old store parked at .bak, new store
    // never moved in (path missing).
    Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".bak"))
    sink.recover()

    val out = sink.read(spark).as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 1))
    // Recover on a healthy store is a no-op.
    sink.recover()
    assert(sink.read(spark).count() == 1)
  }

  test("upsert directly onto a crashed store auto-recovers the backup " +
    "instead of merging against nothing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/s"
    val sink = new ParquetUpsertSink(dir, Seq("k"))
    sink.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), 0L)

    // Crash window again — but the next call is upsert, not recover.
    Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".bak"))
    sink.upsert(Seq(("b", 20)).toDF("k", "v"), 1L)

    val out = sink.read(spark).as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 1, "b" -> 20))
  }
}
