package graft.sources

import graft.{Tables, TestSpark}
import graft.operators.EventPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EXECUTABLE JDBC round-trip — the reference's database path run for
  * real: it loads its `countries` dimension over JDBC
  * (spark_consumer_kafka.py:28-35), joins it into the windowed stream,
  * and appends per-batch aggregates back over JDBC
  * (spark_consumer_kafka.py:138-146). The same Connectors
  * reader/writer surfaces execute here against embedded Derby (the
  * one JDBC engine `/opt/spark/jars` ships) — only the driver-class
  * parameter differs from the MySQL production default, so the
  * construct-only status of rounds 1-7 is upgraded to an executed
  * path: write dim → read dim → flagship join parity → aggregate
  * write-back → read-back equality.
  */
class JdbcRoundTripSpec extends AnyFunSuite {

  test("dim write → read round-trips and feeds the flagship join") {
    val spark = TestSpark.spark
    val url = DerbyTest.url("dims")
    val dim = Tables.eventTypeDim(spark)
    Connectors.jdbcSinkWriter(dim, url, "event_dim", "app", "app",
      driver = Connectors.DerbyDriver).save()
    val back = Connectors.jdbcDimReader(spark, url, "event_dim",
      "app", "app", driver = Connectors.DerbyDriver).load()
      .select("event_type", "weight", "category")
    assert(back.schema.map(_.name) ==
      Seq("event_type", "weight", "category"))
    assert(back.collect().map(_.toSeq).toSet ==
      dim.collect().map(_.toSeq).toSet)
    // The flagship plan must produce identical results whether the
    // dimension arrives from JDBC or from memory — the source swap the
    // test harness relies on, now asserted in the JDBC direction too.
    val events = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val viaJdbc = EventPipeline.flagship(events, back,
      Tables.eventPropsSchema).collect().map(_.toSeq).toSet
    val viaMem = EventPipeline.flagship(events, dim,
      Tables.eventPropsSchema).collect().map(_.toSeq).toSet
    assert(viaJdbc == viaMem)
  }

  test("aggregate append write-back reads back exactly (reference sink shape)") {
    val spark = TestSpark.spark
    val url = DerbyTest.url("aggs")
    val agg = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    Connectors.jdbcSinkWriter(agg, url, "event_aggs", "app", "app",
      driver = Connectors.DerbyDriver).save()
    // Second append (the reference appends one batch per trigger).
    Connectors.jdbcSinkWriter(agg, url, "event_aggs", "app", "app",
      driver = Connectors.DerbyDriver).save()
    val back = Connectors.jdbcDimReader(spark, url, "event_aggs",
      "app", "app", driver = Connectors.DerbyDriver).load()
    assert(back.count() == 2 * agg.count())
    // Each appended copy must round-trip values exactly.
    val expect = agg.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = back.groupBy("event_type", "n", "sum_value")
      .agg(count(lit(1)).as("c"))
    assert(got.filter(col("c") =!= 2).isEmpty)
    assert(got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      == expect)
  }
}
