package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Restart-from-checkpoint correctness (reference S7,
  * spark_consumer_kafka.py:155): a streaming query stopped and restarted
  * against the same checkpoint resumes from committed offsets, re-merges
  * window state, and the keyed-upsert sink stays exactly-once per
  * (window, location) — no duplicates, no loss.
  */
class CheckpointRecoverySpec extends AnyFunSuite {

  private def row(date: String, loc: String, newCases: Int,
      total: Int): String =
    s"""{"date": "$date", "location": "$loc", "new_cases": $newCases, "total_cases": $total}"""

  test("restart from checkpoint resumes state; upsert sink stays " +
    "exactly-once per window key") {
    val spark = TestSpark.spark
    import spark.implicits._

    val source = MemoryStream[String](spark)
    val sinkDir = Files.createTempDirectory("graft-ckpt-sink").toString + "/s"
    val ckpt = Files.createTempDirectory("graft-ckpt-rec").toString
    val sink = new ParquetUpsertSink(sinkDir,
      Seq("window_start", "location"))
    val dim = CovidStreamPipeline.countriesDim(spark)

    val q1 = CovidStreamPipeline.start(source.toDF(), dim, sink, ckpt,
      trigger = Trigger.ProcessingTime(0))
    source.addData(
      row("2021-03-01", "New Zealand", 5, 100),
      row("2021-03-01", "Germany", 10, 500))
    q1.processAllAvailable()
    q1.stop()

    // Restart against the SAME checkpoint and sink; new data updates one
    // existing window key and creates one new one.
    val q2 = CovidStreamPipeline.start(source.toDF(), dim, sink, ckpt,
      trigger = Trigger.ProcessingTime(0))
    source.addData(
      row("2021-03-01", "New Zealand", 7, 107),
      row("2021-03-01", "Canada", 3, 50))
    q2.processAllAvailable()
    q2.stop()

    val out = sink.read(spark)
      .select("location", "total_new_cases_in_window")
      .as[(String, Long)].collect().toMap
    // Exactly one row per (window, location); NZ merged across restart.
    assert(sink.read(spark).count() == 3)
    assert(out == Map("New Zealand" -> 12L, "Germany" -> 10L,
      "Canada" -> 3L))
  }
}
