package graft.functions

import graft.TestSpark
import graft.operators.Corpus
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins scrub_spans64 (the span-removal transform behind span_scrub)
  * on the shapes the corpus-level oracle comparison cannot isolate:
  * empty stale set (identity), non-occurring fps (identity), full
  * self-duplication (everything covered), the sub-8-char whole-text
  * gram, multi-byte UTF-8 (code-point positions, not bytes), and the
  * first-carrier asymmetry end-to-end through Corpus.spanScrub.
  */
class ScrubSpansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scrub(s: String, stale: Seq[Long]): (String, Int, Int) = {
    GraftFunctions.register(spark)
    val r = Seq((s, stale)).toDF("s", "f")
      .select(expr("scrub_spans64(s, f)").as("r"))
      .select("r.kept_text", "r.kept_chars", "r.n_scrubbed")
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2))
  }

  private def selFps(s: String): Seq[Long] = {
    GraftFunctions.register(spark)
    Seq(s).toDF("s").select(expr("winnow_fps64(s)").as("f"))
      .head().getSeq[Long](0)
  }

  test("empty stale set and non-occurring fps keep the text verbatim") {
    val s = "the quick brown fox jumps over the lazy dog"
    assert(scrub(s, Nil) === ((s, s.length, 0)))
    assert(scrub(s, Seq(12345L, 99999L)) === ((s, s.length, 0)))
    assert(scrub("", Nil) === (("", 0, 0)))
  }

  test("scrubbing a doc against its own selection removes those spans " +
    "(uniform text loses everything; empty/short texts by their one gram)") {
    // All 8-grams of a uniform string are identical — one selected fp
    // covers every position.
    val uni = "a" * 32
    assert(scrub(uni, selFps(uni)) === (("", 0, 32 - 7)))
    // Sub-8-char text: the single whole-text gram covers all chars.
    assert(scrub("tiny", selFps("tiny")) === (("", 0, 1)))
    // Empty text: the degenerate gram covers nothing but still counts.
    assert(scrub("", selFps("")) === (("", 0, 1)))
  }

  test("partial scrub removes only covered characters, in order") {
    // Two unique halves; stale = selection of the first half only.
    // Every scrubbed gram lies inside the first half plus the 7-char
    // boundary overhang, so the tail of the second half survives
    // verbatim.
    val a = "first half unique content block"
    val b = "second half totally different tail"
    val s = a + " " + b
    val (kept, kc, ns) = scrub(s, selFps(a))
    assert(ns > 0 && kc < s.length && kc > 0)
    assert(kept.nonEmpty && s.endsWith(kept.takeRight(10)))
    assert(kc === kept.length)
  }

  test("multi-byte UTF-8: positions are code points, kept text is " +
    "well-formed") {
    val s = "日本語のテキストで八文字窓を確認する"
    val (kept, kc, ns) = scrub(s, selFps(s))
    assert(ns >= 1 && kc < s.length)
    assert(kc === kept.codePointCount(0, kept.length))
    // Identity under a non-occurring fp on the same multi-byte text.
    assert(scrub(s, Seq(1L)) === ((s, s.length, 0)))
  }

  test("Corpus.spanScrub: first carrier keeps its text, the verbatim " +
    "re-crawl loses everything, partial copies lose only shared spans") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "completely different prose with its own words only here"
    val docs = Seq(
      (1L, base, "s1"),
      (2L, base, "s1"), // verbatim re-crawl of doc 1
      (3L, other + " " + base.substring(0, 25), "s2"), // partial copy
      (4L, "tiny", "s3"),
      (5L, "tiny", "s3") // sub-8-char duplicate
    ).toDF("doc_id", "text", "source")
    val out = Corpus.spanScrub(docs, Corpus.docFps(docs))
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    def row(id: Long): (Int, Int, String) = {
      val r = byId(id)
      (r.getInt(1), r.getInt(2), r.getString(3))
    }
    // First carriers untouched.
    assert(row(1L) === ((base.length, 0,
      org.apache.commons.codec.digest.DigestUtils.md5Hex(base))))
    assert(row(4L) === ((4, 0,
      org.apache.commons.codec.digest.DigestUtils.md5Hex("tiny"))))
    // Verbatim re-crawl: winnowing guarantees a selected gram in every
    // window of 4, so covered starts are ≤ 3 apart — but the FIRST
    // selected start can be as late as position 4 and the last as
    // early as nGrams-3, so up to 3 head + 3 tail chars legitimately
    // survive a full copy (the sampling edge both engines share; the
    // oracle pins exact equality corpus-wide).
    val (kc2, ns2, _) = row(2L)
    assert(ns2 > 0 && kc2 <= 6)
    // Sub-8-char duplicate: the whole-text gram covers everything —
    // exact.
    assert(row(5L) === ((0, 1, emptyMd5)))
    // Partial copy: loses some but not all; the unique prose prefix
    // survives at the front of the kept text.
    val (kc3, ns3, _) = row(3L)
    assert(ns3 > 0 && kc3 > 0)
    assert(kc3 < other.length + 1 + 25)
  }
}
