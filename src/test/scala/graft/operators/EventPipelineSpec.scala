package graft.operators

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch flagship invariants on sf0.001 (beyond the DuckDB oracle gate:
  * internal consistency of the aggregate outputs).
  */
class EventPipelineSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("flagship enriched window agg is internally consistent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = SparkEntry.entry(spark).cache()

    assert(out.count() > 0)
    // avg_value must equal total_value / n_events on every row.
    val badAvg = out.filter(
      abs($"avg_value" - $"total_value".cast("double") / $"n_events")
        > 1e-12).count()
    assert(badAvg == 0)
    // per-million metric consistent with its inputs.
    val badPm = out.filter(
      abs($"value_per_million" -
        $"total_value".cast("double") * 1e6 / $"weight") > 1e-9).count()
    assert(badPm == 0)
    // window bounds: exactly one minute, epoch-aligned.
    val badWin = out.filter(
      unix_timestamp($"window_end") - unix_timestamp($"window_start")
        =!= 60 || unix_timestamp($"window_start") % 60 =!= 0).count()
    assert(badWin == 0)
    // every event_type joined a dim row.
    assert(out.filter($"weight".isNull).count() == 0)
    out.unpersist()
  }

  test("every declared query runs on sf0.001 and matches its oracle name") {
    val spark = TestSpark.spark
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, s"$name produced no columns")
    }
    // Every oracle key must have a query.
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
