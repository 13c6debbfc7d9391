package graft.streaming

import graft.TestSpark
import graft.operators.ScaleOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream/batch parity for the rolling z-score detector: an in-order
  * feed split across microbatches must reproduce the batch operator
  * row-for-row (same integer-moment math, same NULL-while-thin rule),
  * including across a batch boundary where the ring state carries the
  * baseline.
  */
class StreamingZScoreSpec extends AnyFunSuite {

  import StatefulOps._

  test("streaming zScores == batch rollingZScore on an in-order feed") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 3 users × 24 events: drifting baselines, one injected spike, one
    // flat (zero-variance) user, deterministic values.
    val events = (1 to 24).flatMap { i =>
      Seq(
        ZEvent(i.toLong, 1L, i * 1000000L,
          10.0 + (i % 5) * 0.7 + (if (i == 20) 300.0 else 0.0)),
        ZEvent(100L + i, 2L, i * 1000000L, 42.0),
        ZEvent(200L + i, 3L, i * 1000000L, -5.0 + (i % 7) * 1.3))
    }.sortBy(e => (e.tsUs, e.eventId))

    val source = MemoryStream[ZEvent](spark)
    val query = zScores(source.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("z_stream").start()
    // Split mid-window so the ring state must carry across batches.
    val (b1, b2) = events.splitAt(events.size / 2)
    source.addData(b1: _*)
    query.processAllAvailable()
    source.addData(b2: _*)
    query.processAllAvailable()
    query.stop()
    val streamed = spark.table("z_stream").as[ZScore].collect()
      .map(z => (z.eventId, (z.nW, z.zMicro, z.isAnomaly))).toMap

    val batchDf = events.toDF()
      .select(col("eventId").as("event_id"), col("userId").as("user_id"),
        timestamp_micros(col("tsUs")).as("ts"), col("value"))
    val batch = ScaleOps.rollingZScore(batchDf).collect()

    assert(streamed.size == events.size, "one emission per input event")
    batch.foreach { r =>
      val id = r.getLong(0)
      val exp = (r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))
      assert(streamed(id) == exp, s"event $id: ${streamed(id)} != $exp")
    }
    // The fixture actually exercises the interesting rows.
    assert(streamed(20L)._3, "injected spike must be flagged")
    assert((101L to 124L).forall(id => streamed(id)._2.isEmpty),
      "flat user never has a defined z")
  }
}
