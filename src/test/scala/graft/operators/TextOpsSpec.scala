package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The native single-pass normalize/tokenize expressions must be
  * indistinguishable from the regex/HOF formulations they replaced —
  * on the real corpus and on adversarial inputs.
  */
class TextOpsSpec extends AnyFunSuite {

  private def assertParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = df.select(
      expr(TextOps.normHofS).as("n_hof"),
      expr(TextOps.normS).as("n_nat"),
      expr(TextOps.toksHofS).as("t_hof"),
      expr(TextOps.toksS).as("t_nat"))
      .as[(String, String, Seq[String], Seq[String])].collect()
    assert(out.nonEmpty)
    out.foreach { case (nh, nn, th, tn) =>
      assert(nh == nn, s"norm mismatch: '$nh' vs '$nn'")
      assert(th == tn, s"tokens mismatch: $th vs $tn")
    }
  }

  test("native norm/tokens equal the regex/HOF chain on the corpus") {
    assertParity(graft.Tables.t(TestSpark.spark,
      "/root/testdata/sf0.001", "documents"))
  }

  test("native norm/tokens equal the regex/HOF chain on adversarial " +
    "strings (unicode fallback, space runs, punctuation)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val fixed = Seq(
      "", " ", "   ", "a", "A", "  Mixed   CASE!! with,, punct  ",
      "tab\tseparated\tnot tokens", "digits 123 and 456",
      "KELVIN sign lowers to ascii k", // K → 'k' under lower()
      "café résumé naïve", "日本語テキスト entirely cjk",
      "mixed ascii 和 cjk 字 tokens", "ümlauts Über ÅNGSTRÖM",
      "a-b c.d e,f", "--- !!! ???", "trailing space ",
      " leading space", "a  b   c    d")
    val rand = Gen.listOfN(120, Gen.oneOf(
      Gen.asciiPrintableStr, Gen.alphaNumStr,
      Gen.listOfN(30, Gen.oneOf(Gen.alphaChar, Gen.const(' '),
        Gen.const('!'), Gen.const('é'), Gen.const('中')))
        .map(_.mkString))).sample.get
    assertParity((fixed ++ rand).toDF("text"))
  }
}
