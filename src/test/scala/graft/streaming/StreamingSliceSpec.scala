package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming slice test (SURVEY.md §5.2): the full reference-analog
  * plan fed by a MemoryStream, asserting watermark semantics —
  * late-but-inside-watermark rows merge, beyond-watermark rows drop —
  * and the keyed-upsert sink contract under update output mode.
  *
  * Event times are day-granular (the reference parses 'yyyy-MM-dd',
  * spark_consumer_kafka.py:69), so a row one day behind the max observed
  * event time is far beyond the 10-minute watermark.
  */
class StreamingSliceSpec extends AnyFunSuite {

  private def row(date: String, loc: String, newCases: Int,
      total: Int): String =
    s"""{"date": "$date", "location": "$loc", "new_cases": $newCases, "total_cases": $total}"""

  test("watermarked pipeline merges in-watermark rows, drops late rows, " +
    "rejects nulls and malformed JSON, and upserts on the window key") {
    val spark = TestSpark.spark
    import spark.implicits._

    val source = MemoryStream[String](spark)
    val sinkDir = Files.createTempDirectory("graft-sink").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val sink = new ParquetUpsertSink(sinkDir,
      Seq("window_start", "location"))

    val query = CovidStreamPipeline.start(
      source.toDF(), CovidStreamPipeline.countriesDim(spark), sink, ckpt,
      trigger = Trigger.ProcessingTime(0))

    // Batch 1: two locations on 2021-03-01. Watermark after this batch:
    // 2021-03-01 00:00 - 10 min.
    source.addData(
      row("2021-03-01", "New Zealand", 5, 100),
      row("2021-03-01", "New Zealand", 7, 107),
      row("2021-03-01", "United States", 40, 1000))
    query.processAllAvailable()

    val afterB1 = sink.read(spark)
      .select("location", "total_new_cases_in_window",
        "max_new_cases_in_window")
      .as[(String, Long, Int)].collect()
      .map { case (l, t, m) => l -> ((t, m)) }.toMap
    assert(afterB1("New Zealand") == ((12L, 7)))
    assert(afterB1("United States") == ((40L, 40)))

    // Batch 2: an in-watermark update for NZ (same event date as the max
    // seen → 0 delay, merged); a beyond-watermark US row (2 days earlier
    // → dropped); a null location; malformed JSON.
    source.addData(
      row("2021-03-01", "New Zealand", 3, 110),
      row("2021-02-27", "United States", 999, 9999),
      """{"date": "2021-03-01", "location": null, "new_cases": 1, "total_cases": 1}""",
      "{not json at all",
      // Malformed DATE in valid JSON: must reject at the parse stage —
      // under ANSI (the session default here) a plain to_timestamp
      // would throw and kill the query instead.
      row("2021/03/01", "New Zealand", 50, 500))
    query.processAllAvailable()
    query.stop()

    val rows = sink.read(spark)
    val byKey = rows
      .select("location", "total_new_cases_in_window",
        "max_new_cases_in_window", "total_cases_sum_in_window")
      .as[(String, Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // NZ merged: 5+7+3; US unchanged; the 02-27 window never appears.
    assert(rows.count() == 2)
    assert(byKey("New Zealand") == ((15L, 7, 317L)))
    assert(byKey("United States") == ((40L, 40, 1000L)))

    // Enrichment joined the right dim rows and derived the metric.
    val nz = rows.filter($"location" === "New Zealand")
      .select("population", "continent",
        "new_cases_per_million_in_window")
      .as[(Long, String, BigDecimal)].head()
    assert(nz._1 == 5120000L)
    assert(nz._2 == "Oceania")
    assert(nz._3 == BigDecimal("2.9297")) // 15 * 1e6 / 5120000 = 2.9296875
  }
}
