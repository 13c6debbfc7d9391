package graft.operators

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.3). ScalaCheck generators produce the
  * inputs; each property is evaluated in one DataFrame pass (a session
  * per generated case would dominate wall time).
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Reference semantics of the producer's coercion
    * (kafka_producer.py:76-77): int(float(x)) if parseable AND
    * representable as a 32-bit int, else 0. Python raises on
    * int(float('nan'))/int(float('inf')) → except → 0; values past the
    * int range coerce to 0 too (the library's documented choice — under
    * ANSI a plain double→int cast would throw, so both casts are
    * try_cast and NULL-on-unrepresentable folds to the default).
    */
  private def coerceModel(s: String): Int =
    try {
      val d = s.trim.toDouble
      if (d.isNaN || d < Int.MinValue.toDouble || d > Int.MaxValue.toDouble) 0
      else d.toInt
    } catch { case _: Exception => 0 }

  test("coercion-with-default is total and matches int(float(x)) or 0") {
    import spark.implicits._
    val gen = Gen.oneOf(
      Gen.choose(-1e6, 1e6).map(_.toString),
      Gen.choose(-1000, 1000).map(_.toString),
      Gen.alphaNumStr,
      Gen.const(""),
      Gen.const("NaN"),
      Gen.const("Infinity"),
      Gen.const("9999999999999"), // double-parseable, past Int range
      Gen.const("Brand#13"))
    val inputs = Gen.listOfN(300, gen).sample.get
    val out = inputs.toDF("s")
      .select(col("s"),
        coalesce(expr("try_cast(try_cast(s AS DOUBLE) AS INT)"), lit(0))
          .as("c"))
      .as[(String, Int)].collect()
    out.foreach { case (s, c) =>
      assert(c == coerceModel(s), s"input '$s'")
    }
  }

  test("1-minute tumbling window brackets every timestamp, epoch-aligned") {
    import spark.implicits._
    val gen = Gen.choose(0L, 4102444800L) // 1970..2100
    val epochs = Gen.listOfN(300, gen).sample.get
    val out = epochs.map(e => new Timestamp(e * 1000L)).toDF("ts")
      .select(col("ts"), window(col("ts"), "1 minute").as("w"))
      .select(unix_timestamp(col("ts")).as("t"),
        unix_timestamp(col("w.start")).as("s"),
        unix_timestamp(col("w.end")).as("e"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (t, s, e) =>
      assert(s <= t && t < e && e - s == 60 && s % 60 == 0)
    }
  }

  test("per-million metric equals direct computation") {
    import spark.implicits._
    val gen = for {
      total <- Gen.choose(0L, 1000000L)
      pop <- Gen.choose(1L, 2000000000L)
    } yield (total, pop)
    val inputs = Gen.listOfN(300, gen).sample.get
    val out = inputs.toDF("total", "pop")
      .select(col("total"), col("pop"),
        (col("total") * lit(1000000.0) / col("pop")).as("pm"))
      .as[(Long, Long, Double)].collect()
    out.foreach { case (total, pop, pm) =>
      assert(pm == total * 1000000.0 / pop)
    }
  }

  test("text normalization is idempotent") {
    import spark.implicits._
    import graft.operators.TextOps
    val gen = Gen.listOfN(150, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.const("  Mixed   CASE!! with   punct,,, and  spaces  ")))
    val inputs = gen.sample.get.filter(_.nonEmpty)
    val out = inputs.toDF("text")
      .select(expr(TextOps.normS).as("n1"))
      .withColumnRenamed("n1", "text")
      .select(col("text").as("n1"), expr(TextOps.normS).as("n2"))
      .as[(String, String)].collect()
    out.foreach { case (n1, n2) => assert(n1 == n2, s"'$n1' vs '$n2'") }
  }

  test("splitBucket: halved multiply matches the Scala model for all " +
    "Longs and survives ANSI mode past 2^32") {
    import spark.implicits._
    // Reference model in BigInt — immune to Long overflow by
    // construction: bucket = ((k mod 2^32) * C mod 2^32) mod 1000.
    def model(k: Long): Long =
      (((BigInt(k).mod(BigInt(2).pow(32))) * BigInt(2654435761L))
        .mod(BigInt(2).pow(32)) % 1000).toLong
    val gen = Gen.oneOf(
      Gen.choose(0L, 10000L),                   // fixture range
      Gen.choose(3400000000L, Long.MaxValue),   // the old overflow range
      Gen.choose(Long.MinValue, -1L),           // negative keys
      Gen.const(Long.MaxValue), Gen.const(Long.MinValue))
    val inputs = Gen.listOfN(300, gen).sample.get
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val out = inputs.toDF("doc_id")
        .select(col("doc_id"),
          Pipeline.splitBucket(col("doc_id")).as("b"))
        .as[(Long, Long)].collect()
      out.foreach { case (k, b) => assert(b == model(k), s"key $k") }
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("portable polynomial hash: Spark fold matches the Scala model") {
    import spark.implicits._
    def model(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val gen = Gen.listOfN(100, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val inputs = gen.sample.get
    val out = inputs.toDF("t")
      .select(col("t"), expr(
        "aggregate(split(t, ''), 0L, " +
          "(a, c) -> (a * 31 + ascii(c)) % 1000000007)").as("h"))
      .as[(String, Long)].collect()
    out.foreach { case (s, h) => assert(h == model(s), s"input '$s'") }
  }
}
