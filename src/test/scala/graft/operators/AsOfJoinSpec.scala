package graft.operators

import java.sql.Timestamp

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("leftAsOf: latest prior row, inclusive boundary, null when none") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "e1"), // before any right row → null
      (1L, ts(205), "e2"), // after r@200 → r200
      (1L, ts(300), "e3"), // equal ts → inclusive, r300
      (2L, ts(500), "e4")  // other key, only r@400 of key 2
    ).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(200), "r200"),
      (1L, ts(300), "r300"),
      (2L, ts(400), "r400"),
      (3L, ts(1), "r-otherkey")
    ).toDF("k", "ts", "rid")

    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("rid"))
      .select("lid", "asof_rid")
      .as[(String, Option[String])].collect().toMap
    assert(out("e1").isEmpty)
    assert(out("e2").contains("r200"))
    assert(out("e3").contains("r300")) // inclusive <=
    assert(out("e4").contains("r400"))
  }

  test("leftAsOf: null right-payload fields don't leak older values") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, ts(300), "e")).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(100), Some("old")),
      (1L, ts(200), None) // latest row has a null payload field
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "ts", Seq("v"))
      .select("asof_v").as[Option[String]].head()
    // The carried value is the latest ROW's field (null), not the older
    // non-null value.
    assert(out.isEmpty)
  }
}
