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

  import org.apache.spark.sql.types._

  /** Load-bearing columns per table: every dtype a declared query or memo
    * table depends on. A driver-side re-encode of any of these fails HERE,
    * as one named test per (table, sf), before any query sees it.
    */
  private val contract: Map[String, Map[String, DataType]] = Map(
    "events" -> Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType),
    "lineitem" -> Map(
      "l_orderkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType,
      // No loader normalization for lineitem: consumers see the NTZ
      // timestamp the parquet carries, and every declared query + the
      // DuckDB oracle agree on that wall-clock semantics.
      "l_shipdate" -> TimestampNTZType)
  )

  for (sf <- Seq("0.001", "0.01", "0.1"); (table, cols) <- contract) {
    test(s"$table load-bearing dtypes hold and table counts at sf$sf") {
      val spark = TestSpark.spark
      val df = Tables.t(spark, s"/root/testdata/sf$sf", table)
      for ((name, expected) <- cols) {
        // containsNull varies by writer; compare modulo nullability.
        val got = df.schema(name).dataType
        assert(DataType.equalsIgnoreNullability(got, expected),
          s"$table.$name at sf$sf: loader must hand consumers $expected, " +
            s"got $got — driver likely regenerated /root/testdata " +
            "(see graft-testdata-regen)")
      }
      assert(df.count() > 0)
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
