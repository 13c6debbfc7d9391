package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.streaming.CovidStreamPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The reference's streaming sink path EXECUTED against a real JDBC
  * engine (embedded Derby): the full flagship plan — parse → watermark
  * + tumbling window → broadcast dim join → derived metric — fed by a
  * MemoryStream, with each micro-batch written over JDBC.
  *
  * Two sinks, two outcomes, same stream:
  * - the reference-exact APPEND sink (spark_consumer_kafka.py:138-146)
  *   demonstrates the documented §4.4.2 wart for real: update-mode
  *   re-emission appends a second row for the same (window, location)
  *   key — the duplicate the reference's PK'd MySQL table would reject;
  * - JdbcUpsertSink applies the same stream through a staging table +
  *   server-side MERGE and converges to exactly one row per key with
  *   the merged values.
  */
class JdbcStreamSinkSpec extends AnyFunSuite {

  private def row(date: String, loc: String, newCases: Int,
      total: Int): String =
    s"""{"date": "$date", "location": "$loc", "new_cases": $newCases, "total_cases": $total}"""

  private val varchars = "location VARCHAR(64), continent VARCHAR(32)"

  test("reference-exact append sink re-emits duplicate keys (§4.4.2 wart, executed)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val source = MemoryStream[String](spark)
    val url = DerbyTest.url("append")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val query = CovidStreamPipeline
      .transform(CovidStreamPipeline.countriesDim(spark))(source.toDF())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          Connectors.jdbcSinkWriter(
            batch.persist(), url, "covid_aggregates", "app", "app",
            driver = Connectors.DerbyDriver)
            .option("createTableColumnTypes", varchars)
            .save()
        batch.unpersist(): Unit
      }
      .start()
    source.addData(row("2021-03-01", "New Zealand", 5, 100))
    query.processAllAvailable()
    source.addData(row("2021-03-01", "New Zealand", 3, 110))
    query.processAllAvailable()
    query.stop()
    val back = Connectors.jdbcDimReader(spark, url, "covid_aggregates",
      "app", "app", driver = Connectors.DerbyDriver).load()
    // Two appended emissions of the SAME (window, location) key — the
    // rows a PRIMARY KEY table would have rejected on the second write.
    assert(back.count() == 2)
    assert(back.select("location").distinct().count() == 1)
  }

  test("JdbcUpsertSink converges to one merged row per key via MERGE") {
    val spark = TestSpark.spark
    import spark.implicits._
    val source = MemoryStream[String](spark)
    val url = DerbyTest.url("upsert")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val sink = new JdbcUpsertSink(url, "covid_aggregates",
      Seq("window_start", "location"),
      driver = Connectors.DerbyDriver,
      createTableColumnTypes = Some(varchars))
    val query = CovidStreamPipeline
      .transform(CovidStreamPipeline.countriesDim(spark))(source.toDF())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.upsert(b, id)
      }
      .start()
    source.addData(
      row("2021-03-01", "New Zealand", 5, 100),
      row("2021-03-01", "New Zealand", 7, 107),
      row("2021-03-01", "United States", 40, 1000))
    query.processAllAvailable()
    // In-watermark late row updates the NZ window: MERGE must UPDATE,
    // not append.
    source.addData(row("2021-03-01", "New Zealand", 3, 110))
    query.processAllAvailable()
    query.stop()
    val back = Connectors.jdbcDimReader(spark, url, "covid_aggregates",
      "app", "app", driver = Connectors.DerbyDriver).load()
    assert(back.count() == 2)
    val nz = back.filter(col("location") === "New Zealand")
      .select("total_new_cases_in_window", "max_new_cases_in_window")
      .head()
    assert(nz.getLong(0) == 15L && nz.getInt(1) == 7)
  }

  test("legacy (batch_id)-keyed ledger migrates in place, replay rows honored") {
    val spark = TestSpark.spark
    import spark.implicits._
    val url = DerbyTest.url("ledgermig")
    // A ledger as the pre-scope revision created it: batch_id alone is
    // the PK, and epoch 0 is already recorded (ADVICE r10: without
    // migration the scoped INSERT throws unknown-column on every batch
    // forever; with it, legacy rows land under scope '' — the default —
    // so their replay protection survives the upgrade).
    locally {
      Class.forName(Connectors.DerbyDriver)
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        st.executeUpdate("CREATE TABLE kv_epochs " +
          "(batch_id BIGINT NOT NULL PRIMARY KEY)")
        st.executeUpdate("INSERT INTO kv_epochs (batch_id) VALUES (0)")
        st.close()
      } finally conn.close()
    }
    val sink = new JdbcUpsertSink(url, "kv", Seq("k"),
      driver = Connectors.DerbyDriver,
      createTableColumnTypes = Some("k VARCHAR(16)"))
    // Batch 0 is a legacy-recorded replay: the migrated ledger must
    // still skip it (nothing lands in the target).
    sink.upsert(Seq(("a", 1)).toDF("k", "v"), 0L)
    // Batch 1 is fresh: applies through the migrated (scope, batch_id)
    // ledger; its own replay is then a no-op.
    sink.upsert(Seq(("a", 2), ("b", 3)).toDF("k", "v"), 1L)
    sink.upsert(Seq(("a", 99)).toDF("k", "v"), 1L)
    val back = Connectors.jdbcDimReader(spark, url, "kv", "", "",
      driver = Connectors.DerbyDriver).load()
      .orderBy("k").as[(String, Int)].collect().toSeq
    assert(back == Seq(("a", 2), ("b", 3)))
    // A scoped sink against the same (already-migrated) ledger starts
    // its own epoch numbering without colliding with scope ''.
    val scoped = new JdbcUpsertSink(url, "kv", Seq("k"),
      driver = Connectors.DerbyDriver,
      createTableColumnTypes = Some("k VARCHAR(16)"),
      ledgerScope = "ckpt2")
    scoped.upsert(Seq(("a", 7)).toDF("k", "v"), 0L)
    val after = Connectors.jdbcDimReader(spark, url, "kv", "", "",
      driver = Connectors.DerbyDriver).load()
      .orderBy("k").as[(String, Int)].collect().toSeq
    assert(after == Seq(("a", 7), ("b", 3)))
  }
}
