package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShinglesSpec extends AnyFunSuite {

  private val M = 1000000007L

  /** Plain-Scala reference of the portable hash chain (independent of
    * both the native expression and the HOF formulation).
    */
  private def refHash(tok: String): Long = {
    var a = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      a = (a * 31L + cp) % M
      i += Character.charCount(cp)
    }
    a
  }

  private def refShingles(toks: Seq[String]): Seq[Long] = {
    val th = toks.map(refHash)
    if (th.size < 3) Seq.empty
    else th.sliding(3).map { w =>
      val lo = ((w(0) * 31 + w(1)) % M * 31 + w(2)) % M
      val hi = ((w(0) * 37 + w(1)) % M * 37 + w(2)) % M
      hi * 1073741824L + lo
    }.toSeq.distinct
  }

  test("native shingles3 equals the HOF+hash formulation on the real " +
    "corpus") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import graft.operators.TextOps
    val both = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("toks", expr(TextOps.toksS))
      .withColumn("th",
        expr(s"transform(toks, t -> ${TextOps.tokenHashHofS("t")})"))
      .select(col("doc_id"),
        expr("shingles3(toks)").as("native"),
        expr(TextOps.shinglesHashHofS("th")).as("hof"))
    assert(both.count() == 500)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("shingles3 equals the HOF+hash formulation on random token " +
    "arrays (property)") {
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
      .withColumn("th",
        expr(s"transform(toks, t -> ${TextOps.tokenHashHofS("t")})"))
      .select(expr("shingles3(toks)").as("native"),
        expr(TextOps.shinglesHashHofS("th")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(bad.count() == 0)
  }

  test("shingles3 matches a plain-Scala reference (and windowing " +
    "matches the string formulation's windows)") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val inputs = Seq(
      Seq.empty[String],
      Seq("a"),
      Seq("a", "b"),
      Seq("a", "b", "c"),
      Seq("the", "quick", "brown", "fox", "jumps"),
      // repeated triple dedups, first occurrence kept
      Seq("a", "b", "a", "b", "a", "b", "a"))
    val rows = inputs.map(t => (t, refShingles(t))).toDF("toks", "expected")
    assert(rows.filter(expr("shingles3(toks)") =!= col("expected"))
      .count() == 0)
    // The hashed windows are exactly the string shingles' windows:
    // same count per doc (distinctness included — no collisions here).
    val parity = inputs.map { t =>
      val strShingles = t.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSeq.distinct
      (refShingles(t).size, strShingles.size)
    }
    assert(parity.forall { case (h, s) => h == s })
  }
}
