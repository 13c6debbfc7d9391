package graft.streaming

import java.sql.Timestamp

import graft.{Tables, TestSpark}
import graft.operators.EventPipeline
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Same-plan-both-ways check (SURVEY.md §7.2.3): EventPipeline's
  * parse→windowAgg transform produces identical results whether executed
  * as a batch query or as a streaming query over the same rows (complete
  * output mode, MemoryStream source). This is the engine-level guarantee
  * that the oracle-checked batch results transfer to the streaming path.
  */
object StreamBatchParitySpec {
  // Top-level: Spark encoders cannot instantiate test-class-inner case
  // classes (no outer scope at executor deserialization time).
  final case class E(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
}

class StreamBatchParitySpec extends AnyFunSuite {
  import StreamBatchParitySpec.E

  test("windowAgg: streaming (complete mode) equals batch on same rows") {
    val spark = TestSpark.spark
    import spark.implicits._

    val batchDf = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val rows = batchDf.as[E].collect().toSeq

    val batch = EventPipeline.windowAgg(
      EventPipeline.rejectNulls(
        EventPipeline.parse(Tables.eventPropsSchema)(batchDf)))
      .orderBy("window_start", "event_type")
      .collect()

    val source = MemoryStream[E](spark)
    val streaming = EventPipeline.windowAgg(
      EventPipeline.rejectNulls(
        EventPipeline.parse(Tables.eventPropsSchema)(source.toDF())))
    val query = streaming.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("parity_windows")
      .start()
    // Feed in two batches to exercise state merge across triggers.
    val (b1, b2) = rows.splitAt(rows.size / 2)
    source.addData(b1: _*)
    query.processAllAvailable()
    source.addData(b2: _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("parity_windows")
      .orderBy("window_start", "event_type")
      .collect()

    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s: Row, b: Row) =>
      assert(s == b, s"stream row $s != batch row $b")
    }
  }

  test("sessionWindowAgg: streaming (append mode, watermark-closed) " +
    "equals batch session_window on same rows") {
    val spark = TestSpark.spark
    import spark.implicits._

    // Replayed in event-time order (the order a live feed approximates)
    // so chunk boundaries never race the 10-minute watermark — an
    // arbitrary-order replay would legitimately DROP late rows, which
    // is correct streaming semantics but not a parity fixture.
    val events = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select($"user_id", $"ts").as[(Long, Timestamp)].collect().toSeq
      .sortBy(_._2.getTime)
    val maxTs = events.map(_._2.getTime).max

    val batch = StreamOps.sessionWindowAgg(
      events.toDF("user_id", "ts"), "ts", "user_id",
      "30 minutes", "10 minutes")
      .orderBy("user_id", "session_start").collect()

    val source = MemoryStream[(Long, Timestamp)](spark)
    val query = StreamOps.sessionWindowAgg(
      source.toDF().toDF("user_id", "ts"), "ts", "user_id",
      "30 minutes", "10 minutes")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("parity_sessions")
      .start()
    // Feed in three batches to exercise cross-trigger session merge,
    // then two far-future sentinel batches: the first advances the
    // watermark past every real session, the second triggers emission
    // under the advanced watermark.
    events.grouped(math.max(1, events.size / 3)).foreach { chunk =>
      source.addData(chunk: _*)
      query.processAllAvailable()
    }
    Seq(1, 2).foreach { k =>
      source.addData((-1L,
        new Timestamp(maxTs + k.toLong * 86400000L * 100)))
      query.processAllAvailable()
    }
    query.stop()

    val streamed = spark.table("parity_sessions")
      .filter($"user_id" >= 0)
      .orderBy("user_id", "session_start").collect()
    assert(streamed.length == batch.length,
      s"stream emitted ${streamed.length} sessions, batch has " +
        s"${batch.length}")
    streamed.zip(batch).foreach { case (s: Row, b: Row) =>
      assert(s == b, s"stream session $s != batch session $b")
    }
  }
}
