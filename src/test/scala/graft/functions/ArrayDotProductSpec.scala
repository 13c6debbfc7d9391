package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class ArrayDotProductSpec extends AnyFunSuite {

  test("native codegen dot product is bit-identical to the HOF fold") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)

    val gen = Gen.listOfN(64, Gen.choose(-1.0, 1.0))
    val vecs = (1 to 50).map(i =>
      (i.toLong, Gen.listOfN(64, Gen.choose(-1.0, 1.0)).sample.get,
        gen.sample.get))
    val out = vecs.toDF("id", "a", "b")
      .select(
        expr("array_dot(a, b)").as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), " +
          "cast(0 as double), (acc, x) -> acc + x)").as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => assert(n == h) }
  }

  test("null array propagates null; length mismatch bounded by shorter") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 5.0))),
      (None, Some(Seq(1.0))))
      .toDF("a", "b")
      .select(expr("array_dot(a, b)").as("d"))
      .as[Option[Double]].collect()
    assert(out(0).contains(1.0 * 3.0 + 2.0 * 4.0))
    assert(out(1).isEmpty)
  }

  test("type check rejects non-double arrays with a clear message") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
        .select(expr("array_dot(a, b)")).collect()
    }
    assert(e.getMessage.contains("array<double>"))
  }
}
