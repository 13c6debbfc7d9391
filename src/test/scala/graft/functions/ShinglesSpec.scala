package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShinglesSpec extends AnyFunSuite {

  test("native shingles3 equals the HOF formulation on the real corpus") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import graft.operators.TextOps
    val both = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("toks", expr(TextOps.toksS))
      .select(col("doc_id"),
        expr("shingles3(toks)").as("native"),
        expr(TextOps.shinglesS("toks")).as("hof"))
    assert(both.count() == 500)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("shingles3 equals the HOF formulation on random token arrays " +
    "(property)") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import graft.operators.TextOps
    import org.scalacheck.Gen
    import spark.implicits._
    val tok = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("a", "b", "ab", "", "x y")) // incl. repeats & odd tokens
    val arrays = Gen.listOfN(200, Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, tok))).sample.get
    val bad = arrays.toDF("toks")
      .select(expr("shingles3(toks)").as("native"),
        expr(TextOps.shinglesS("toks")).as("hof"))
      .filter(org.apache.spark.sql.functions.col("native") =!=
        org.apache.spark.sql.functions.col("hof"))
    assert(bad.count() == 0)
  }

  test("shingles3 edge cases: under 3 tokens, exact duplicates") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a"), Seq.empty[String]),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a", "b", "c"), Seq("a b c")),
      // repeated triple dedups, first occurrence kept
      (Seq("a", "b", "a", "b", "a", "b", "a"),
        Seq("a b a", "b a b"))).toDF("toks", "expected")
    assert(rows.filter(expr("shingles3(toks)") =!= col("expected"))
      .count() == 0)
  }
}
