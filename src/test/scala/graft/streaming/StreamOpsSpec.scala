package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamOpsSpec extends AnyFunSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("dedupWithinWatermark drops in-watermark duplicates across batches") {
    val spark = TestSpark.spark
    import spark.implicits._

    val src = MemoryStream[(String, java.sql.Timestamp)](spark)
    val out = StreamOps.dedupWithinWatermark(
      src.toDF().toDF("k", "ts"), Seq("k"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    src.addData(("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 00:00:05")), // dup, same batch
      ("b", ts("2024-01-01 00:00:10")))
    q.processAllAvailable()
    src.addData(("a", ts("2024-01-01 00:01:00")), // dup, later batch
      ("c", ts("2024-01-01 00:01:30")))
    q.processAllAvailable()
    q.stop()

    val keys = spark.sql("SELECT k FROM dedup_out").as[String]
      .collect().sorted.toSeq
    assert(keys == Seq("a", "b", "c"))
  }

  test("redactPii is stream-safe: per-row scrub over a stream equals " +
    "the batch result") {
    // The scrub is pure per-row codegen (no shuffle — PipelineSpec
    // pins the plan), so the SAME operator runs unchanged on a
    // streaming frame; this pins batch parity through the streaming
    // runtime, the shape a live intake pipeline scrubs in.
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a@b.co and c@d.org"),
      (2L, "call +4915512345678 at 10.0.0.1"),
      (3L, "no pii here"),
      (4L, null.asInstanceOf[String]))
    val src = MemoryStream[(Long, String)](spark)
    val out = graft.operators.Pipeline.redactPii(
      src.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    src.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pii_stream")
      .select("doc_id", "n_email", "n_phone", "n_ip", "red")
      .collect().sortBy(_.getLong(0)).toSeq
    val batch = graft.operators.Pipeline.redactPii(
      rows.toDF("doc_id", "text"))
      .select("doc_id", "n_email", "n_phone", "n_ip", "red")
      .collect().sortBy(_.getLong(0)).toSeq
    assert(streamed == batch && streamed.size == 4)
  }

  test("stream-stream interval join matches right rows within the window " +
    "and only those") {
    val spark = TestSpark.spark
    import spark.implicits._

    val clicks = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val buys = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val joined = StreamOps.intervalJoin(
      clicks.toDF().toDF("user", "click_ts"),
      buys.toDF().toDF("b_user", "buy_ts"),
      "user", "b_user", "click_ts", "buy_ts",
      within = "10 MINUTES", delay = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()

    clicks.addData((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")))
    buys.addData(
      (1L, ts("2024-01-01 10:05:00")), // inside window  → match
      (1L, ts("2024-01-01 10:20:00")), // beyond +10 min → no match
      (2L, ts("2024-01-01 09:59:00"))) // before click   → no match
    q.processAllAvailable()
    q.stop()

    val rows = spark.sql("SELECT user, buy_ts FROM ssj_out")
      .as[(Long, java.sql.Timestamp)].collect().toSeq
    assert(rows == Seq((1L, ts("2024-01-01 10:05:00"))))
  }

  test("flatMapGroupsWithState sessionize emits a session only after the " +
    "watermark passes its gap timeout") {
    val spark = TestSpark.spark
    import spark.implicits._

    val src = MemoryStream[(String, java.sql.Timestamp)](spark)
    val events = src.toDF().toDF("key", "ts")
      .withWatermark("ts", "0 seconds")
      .as[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(events, gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // Session for key a: two events 10 s apart.
    src.addData(("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 00:00:10")))
    q.processAllAvailable()
    // Nothing emitted yet — watermark (00:00:10) has not passed
    // last-event + 60 s.
    assert(spark.sql("SELECT * FROM sess_out").count() == 0)

    // An unrelated key far in the future advances the watermark past the
    // timeout → the session for a closes and is emitted.
    src.addData(("z", ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    q.stop()

    val sess = spark.sql("SELECT key, start, end, n FROM sess_out")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq
    assert(sess == Seq(("a", ts("2024-01-01 00:00:00"),
      ts("2024-01-01 00:01:10"), 2L)))
  }

  test("sessionize splits a single batch containing a >gap silence into " +
    "separate sessions") {
    val spark = TestSpark.spark
    import spark.implicits._

    val src = MemoryStream[(String, java.sql.Timestamp)](spark)
    val events = src.toDF().toDF("key", "ts")
      .withWatermark("ts", "0 seconds")
      .as[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(events, gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sess_split_out")
      .outputMode("append").start()

    // One batch, one key, 5-minute silence in the middle: the first run
    // closes intra-batch and is emitted immediately.
    src.addData(("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 00:00:30")),
      ("a", ts("2024-01-01 00:05:30")))
    q.processAllAvailable()
    q.stop()

    val sess = spark.sql(
      "SELECT key, start, end, n FROM sess_split_out ORDER BY start")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq
    assert(sess == Seq(("a", ts("2024-01-01 00:00:00"),
      ts("2024-01-01 00:01:30"), 2L)))
    // The second run (00:05:30) is still open in state — not emitted.
  }

  test("sessionize handles in-watermark late events: earlier-than-open " +
    "disjoint events form their own session, overlapping ones extend " +
    "start backward") {
    val spark = TestSpark.spark
    import spark.implicits._

    val src = MemoryStream[(String, java.sql.Timestamp)](spark)
    val events = src.toDF().toDF("key", "ts")
      .withWatermark("ts", "30 minutes")
      .as[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(events, gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sess_late_out")
      .outputMode("append").start()

    // Open session for a at 10:00.
    src.addData(("a", ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // Late DISJOINT event at 09:50 (within the 30 min watermark): it
    // must become its own immediately-emitted session — the old merge
    // guard absorbed it into the 10:00 session without moving start.
    src.addData(("a", ts("2024-01-01 09:50:00")))
    q.processAllAvailable()
    // Late OVERLAPPING event at 09:59:30 (interval [09:59:30, 10:00:30)
    // overlaps the open [10:00, 10:01)): extends the session backward.
    src.addData(("a", ts("2024-01-01 09:59:30")))
    q.processAllAvailable()
    // Far-future unrelated key pushes the watermark past every timeout.
    src.addData(("z", ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()

    val sess = spark.sql(
      "SELECT key, start, end, n FROM sess_late_out WHERE key = 'a' " +
        "ORDER BY start")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq
    assert(sess == Seq(
      ("a", ts("2024-01-01 09:50:00"), ts("2024-01-01 09:51:00"), 1L),
      ("a", ts("2024-01-01 09:59:30"), ts("2024-01-01 10:01:00"), 2L)))
  }

  test("sessionize survives a watermark jump larger than the gap: " +
    "already-expired sessions emit instead of registering a stale " +
    "timeout (which kills the query)") {
    val spark = TestSpark.spark
    import spark.implicits._

    val src = MemoryStream[(String, java.sql.Timestamp)](spark)
    val events = src.toDF().toDF("key", "ts")
      .withWatermark("ts", "1 hour")
      .as[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(events, gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sess_jump_out")
      .outputMode("append").start()

    // Open session for a; watermark after this batch: 09:00.
    src.addData(("a", ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // Backfill burst jumps the watermark by 5 HOURS (>> the 1-minute
    // gap): eviction watermark becomes 14:00.
    src.addData(("z", ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    // Straggler for a, far behind the jumped watermark. In this
    // single-operator topology the late filter shares the eviction
    // watermark, so the row is dropped before fn ever sees it — the
    // stale-timeout clamp exists for the chained-stateful topologies
    // where the late filter LAGS the eviction watermark (an admitted
    // row's session can then sit wholly behind eviction, and
    // registering its natural timeout would throw and abort the
    // query). Either way the query must run to completion and a's
    // open session must close cleanly through the jump.
    src.addData(("a", ts("2024-01-01 09:30:00")))
    q.processAllAvailable()
    q.stop()
    assert(q.exception.isEmpty,
      s"watermark jump aborted the query: ${q.exception}")

    val sess = spark.sql(
      "SELECT key, start, end, n FROM sess_jump_out WHERE key = 'a' " +
        "ORDER BY start")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq
    assert(sess == Seq(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), 1L)))
  }

  test("sessionize gap boundary is end-exclusive like session_window: " +
    "an event at exactly last + gap starts a new session") {
    val spark = TestSpark.spark
    import spark.implicits._

    val src = MemoryStream[(String, java.sql.Timestamp)](spark)
    val events = src.toDF().toDF("key", "ts")
      .withWatermark("ts", "0 seconds")
      .as[StreamOps.SessionEvent]
    val out = StreamOps.sessionize(events, gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("sess_bound_out")
      .outputMode("append").start()

    // 00:01:00 is exactly last(00:00:00) + gap: new session, so the
    // first closes and emits intra-batch.
    src.addData(("a", ts("2024-01-01 00:00:00")),
      ("a", ts("2024-01-01 00:01:00")))
    q.processAllAvailable()
    q.stop()

    val sess = spark.sql(
      "SELECT key, start, end, n FROM sess_bound_out ORDER BY start")
      .as[(String, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().toSeq
    assert(sess == Seq(("a", ts("2024-01-01 00:00:00"),
      ts("2024-01-01 00:01:00"), 1L)))
  }

  test("streamingDocTerms over micro-batches equals one batch docTerms " +
    "run (incremental term-table parity)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.operators.Pipeline

    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val incoming = docs.as[(Long, String)].collect().toSeq

    val collected =
      scala.collection.mutable.ListBuffer.empty[(Long, String, Long)]
    val src = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sdt").toString
    val q = StreamOps.streamingDocTerms(
      src.toDF().toDF("doc_id", "text"), ckpt) { (terms, _) =>
      collected ++= terms.as[(Long, String, Long)].collect()
    }
    val (b1, b2) = incoming.splitAt(incoming.size / 2)
    src.addData(b1: _*)
    q.processAllAvailable()
    src.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    // Intake doc_ids are unique, so per-doc term counts concatenate:
    // the union of batch term tables IS the batch-mode term table.
    val oneShot = Pipeline.docTermsPlan(docs)
      .as[(Long, String, Long)].collect().toSet
    assert(collected.toSet == oneShot && oneShot.nonEmpty)
    assert(collected.size == collected.toSet.size,
      "no (doc, term) row may appear in two batches")
  }

  test("streamingNearDup over micro-batches equals one batch run of the " +
    "incremental dedup operator") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup

    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val corpusShingles = Dedup.docShingles(docs)
      .filter(col("doc_id") % 2 =!= 0)
    val incomingDocs = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val collected =
      scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    val src = MemoryStream[(Long, String)](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-sndd").toString
    val q = StreamOps.streamingNearDup(
      src.toDF().toDF("doc_id", "text"), corpusShingles, 4, 5, ckpt) {
      (matches, _) =>
        collected ++= matches.select("new_id", "corpus_id")
          .as[(Long, Long)].collect()
    }
    // Two micro-batches covering the whole incoming split.
    val (b1, b2) = incomingDocs.splitAt(incomingDocs.size / 2)
    src.addData(b1: _*)
    q.processAllAvailable()
    src.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val oneShot = Dedup.incrementalNearDupPairs(
      corpusShingles, Dedup.docShingles(docs)
        .filter(col("doc_id") % 2 === 0), 4, 5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(collected.toSet == oneShot && oneShot.nonEmpty)
  }
}
