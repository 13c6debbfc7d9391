package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class HashExpressionsSpec extends AnyFunSuite {

  private def model63(hashes: Seq[Long]): Long = {
    val counts = new Array[Long](63)
    hashes.foreach { h =>
      (0 until 63).foreach { i =>
        if (((h * (2L * i + 3L) + i) % 1000000007L) % 2L == 1L)
          counts(i) += 1
        else counts(i) -= 1
      }
    }
    (62 to 0 by -1).foldLeft(0L)((acc, i) =>
      acc * 2L + (if (counts(i) > 0L) 1L else 0L))
  }

  test("simhash63 matches the Scala reference model") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val gen = Gen.nonEmptyListOf(Gen.choose(0L, 1000000006L))
    val inputs = (1 to 40).map(_ => gen.sample.get)
    val out = inputs.toDF("th")
      .select(col("th"), expr("simhash63(th)").as("s"))
      .as[(Seq[Long], Long)].collect()
    out.foreach { case (th, s) => assert(s == model63(th)) }
  }

  test("simhash63 skips null elements (documented) instead of NPE / " +
    "folding hash 0") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    // String path: a null token previously NPE'd the task.
    val strs = spark.sql(
      """SELECT simhash63(array('alpha', CAST(NULL AS STRING), 'beta'))
        |  AS a, simhash63(array('alpha', 'beta')) AS b""".stripMargin)
      .as[(Long, Long)].head()
    assert(strs._1 == strs._2)
    // Hash path: a null bigint previously read as hash 0 and
    // perturbed every counter.
    val longs = spark.sql(
      """SELECT simhash63(array(CAST(7 AS BIGINT), CAST(NULL AS BIGINT)))
        |  AS a, simhash63(array(CAST(7 AS BIGINT))) AS b""".stripMargin)
      .as[(Long, Long)].head()
    assert(longs._1 == longs._2)
  }

  test("simhash63 over string tokens ≡ interpreted per-char HOF hash " +
    "then simhash63 over hashes") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val docs = Seq(
      "the quick brown fox", "lorem ipsum dolor sit amet", "a", "",
      "numbers 123 and 456 mixed", "zzz zzz zzz",
      // Non-ASCII incl. supplementary-plane (outside the BMP): split
      // yields one element per CODE POINT, so the native fallback must
      // iterate code points, not UTF-16 code units.
      "café naïve", "你好 世界",
      "emoji 😀🚀 mixed 𐀀x").toDF("text")
      .selectExpr(
        "filter(split(text, ' '), x -> x != '') AS toks")
    val out = docs.selectExpr(
      "simhash63(toks) AS direct",
      """simhash63(transform(toks, t ->
        |  aggregate(split(t, ''), 0L,
        |    (a, c) -> (a * 31 + ascii(c)) % 1000000007))) AS viaHof"""
        .stripMargin)
      .as[(Long, Long)].collect()
    out.foreach { case (d, h) => assert(d == h) }
  }

  test("minhash_bands16x2: 16 signatures, deterministic, similarity-monotone") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val base = (1L to 60L).toSeq
    val near = base.drop(2) ++ Seq(1001L, 1002L) // high overlap
    val far = (1000L to 1060L).toSeq // no overlap
    val out = Seq(("a", base), ("a2", base), ("n", near), ("f", far))
      .toDF("id", "th")
      .select(col("id"), expr("minhash_bands16x2(th)").as("b"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a").length == 16)
    // Deterministic: identical input → identical signatures.
    assert(out("a") == out("a2"))
    // Near-identical sets collide on most bands; disjoint sets on none.
    val nearCollisions = out("a").zip(out("n")).count(p => p._1 == p._2)
    val farCollisions = out("a").zip(out("f")).count(p => p._1 == p._2)
    assert(nearCollisions > 0, s"near=$nearCollisions")
    assert(farCollisions == 0, s"far=$farCollisions")
  }
}
