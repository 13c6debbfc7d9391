package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulOpsSpec extends AnyFunSuite {

  import StatefulOps._

  test("mapGroupsWithState accumulates running totals across batches") {
    val spark = TestSpark.spark
    import spark.implicits._

    val source = MemoryStream[KeyedValue](spark)
    val query = runningTotals(source.toDS())
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("running_totals")
      .start()

    source.addData(KeyedValue("a", 1.0), KeyedValue("a", 2.0),
      KeyedValue("b", 10.0))
    query.processAllAvailable()
    source.addData(KeyedValue("a", 3.0))
    query.processAllAvailable()
    query.stop()

    // Memory sink in update mode appends each emission; the LAST row per
    // key is the current state.
    val rows = spark.table("running_totals")
      .as[RunningTotal].collect()
    val last = rows.groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.n) }
    assert(last("a") == RunningTotal("a", 3L, 6.0))
    assert(last("b") == RunningTotal("b", 1L, 10.0))
  }
}
