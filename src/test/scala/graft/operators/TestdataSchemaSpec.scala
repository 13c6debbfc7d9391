package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-schema canary: the driver regenerates /root/testdata between
  * rounds and has already changed the physical encoding of `events.ts`
  * once (round 7: INT64 TIMESTAMP(NANOS) → timestamp[us], which broke 23
  * oracle queries, 10 tests, and the bench through one hardcoded loader
  * assumption). This spec pins the loader CONTRACT — whatever the parquet
  * encoding, `Tables.t` must hand every consumer a session-TZ
  * TimestampType `ts` and the table must actually execute — so a future
  * regeneration fails as ONE named test instead of ten cryptic ones.
  */
class TestdataSchemaSpec extends AnyFunSuite {

  for (sf <- Seq("0.001", "0.01", "0.1")) {
    test(s"events.ts loads as TimestampType and counts at sf$sf") {
      val spark = TestSpark.spark
      val ev = Tables.t(spark, s"/root/testdata/sf$sf", "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"loader must normalize ts to TimestampType, got ${
          ev.schema("ts").dataType}")
      assert(ev.count() > 0)
    }
  }

  test("every declared testdata table loads with a non-empty schema") {
    val spark = TestSpark.spark
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      val df = Tables.t(spark, "/root/testdata/sf0.001", t)
      assert(df.schema.nonEmpty, s"$t has empty schema")
    }
  }
}
