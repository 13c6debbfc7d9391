package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins winnow_fps (the native single-pass winnowing selection) to the
  * interpreted HOF formulation it replaced — element-for-element,
  * ORDER included (array_distinct first-occurrence order) — across the
  * boundary shapes: empty string, < 8 chars (single whole-string
  * gram), exactly 8 chars (one gram, < 4 so single-min path),
  * 8–10 chars (2–3 grams, still < window), ≥ 11 chars (windowed
  * path), repetitive text (distinctness bites), and multi-byte UTF-8
  * (code-point windows, not byte or UTF-16 windows).
  */
class WinnowFpsSpec extends AnyFunSuite {

  private val hofFps =
    """array_distinct(
      |  if(size(grams) >= 4,
      |     transform(sequence(1, size(grams) - 3),
      |       j -> array_min(slice(grams, j, 4))),
      |     array(array_min(grams))))""".stripMargin
  private val hofGrams =
    """if(length(s) >= 8,
      |   transform(sequence(1, length(s) - 7),
      |     i -> md5(substring(s, i, 8))),
      |   array(md5(s)))""".stripMargin

  test("winnow_fps ≡ HOF md5-8gram/min-window-4/distinct chain") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val cases = Seq(
      "",
      "a",
      "short",
      "exactly8",
      "ninechars",
      "tenchars!!",
      "elevenchars",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "abab" * 12,
      "héllo wörld ünïcode — ™ é" * 3,
      "日本語のテキストで八文字窓を確認する",
      "mixed ascii と 日本語 and ünïcode padding to exceed windows")
    val out = cases.toDF("s")
      .select(
        expr("winnow_fps(s)").as("native"),
        expr(hofFps.replace("grams", s"($hofGrams)")).as("hof"))
      .as[(Seq[String], Seq[String])]
      .collect()
    out.zip(cases).foreach { case ((native, hof), s) =>
      assert(native == hof, s"input: '$s'")
    }
  }

  test("winnow_fps64 ≡ 60-bit truncation of winnow_fps (set equality " +
    "— selection ties can reorder but never change the value set)") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val cases = Seq(
      "",
      "short",
      "exactly8",
      "elevenchars",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "abab" * 12,
      "héllo wörld ünïcode — ™ é" * 3,
      "日本語のテキストで八文字窓を確認する")
    val out = cases.toDF("s")
      .select(
        expr("winnow_fps64(s)").as("native64"),
        expr("transform(winnow_fps(s), " +
          "x -> cast(conv(substring(x, 1, 15), 16, 10) as bigint))")
          .as("truncated"))
      .as[(Seq[Long], Seq[Long])]
      .collect()
    out.zip(cases).foreach { case ((native64, truncated), s) =>
      assert(native64.sorted == truncated.distinct.sorted, s"input: '$s'")
      assert(native64.forall(_ >= 0L), s"60-bit values are positive: '$s'")
    }
  }

  test("winnow_fps is null-preserving and rejects non-string input") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT winnow_fps(CAST(NULL AS STRING)) AS v").collect()(0)
    assert(row.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT winnow_fps(array(1, 2))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
