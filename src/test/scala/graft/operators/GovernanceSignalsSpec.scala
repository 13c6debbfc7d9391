package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts for the round-8 governance/signal operators
  * (values are oracle-checked by the driver gate; these pin the
  * invariants and the synthetic edge cases the fixture can't show).
  */
class GovernanceSignalsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.01"

  test("tokenEntropy matches hand-computed H and respects bounds") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "a a a a b b c d": n=8, tfs {4,2,1,1} →
    // H = ln 8 − (4·ln4 + 2·ln2)/8; constant doc → H = 0; empty → drop.
    val docs = Seq(
      (1L, "a a a a b b c d"),
      (2L, "same same same same"),
      (3L, "")).toDF("doc_id", "text")
    val out = Pipeline.tokenEntropy(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "empty doc must drop out (no term rows)")
    val h1 = math.log(8) - (4 * math.log(4) + 2 * math.log(2)) / 8
    assert(math.abs(out(0).getLong(3) - math.round(h1 * 1e3)) <= 2,
      s"entropy_milli ${out(0).getLong(3)} != expected ${h1 * 1e3}")
    assert(out(1).getLong(3) == 0L, "constant doc has zero entropy")
    // Corpus-wide bounds: 0 ≤ H ≤ ln(n_distinct) (+2 milli tolerance
    // for the per-term quantization).
    val viol = Pipeline.tokenEntropy(
      Tables.t(spark, dir, "documents"), cacheKey = dir)
      .filter(col("entropy_milli") < -2 ||
        col("entropy_milli") >
          round(log(col("n_distinct").cast("double")) * 1e3) + 2)
    assert(viol.isEmpty, "entropy outside [0, ln(n_distinct)]")
  }

  test("rollingZScore: flat baseline → NULL z; spike → flagged") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = (1 to 19).map(i =>
      (i.toLong, 1L, new java.sql.Timestamp(i * 1000L),
        10.0 + (if (i % 2 == 0) 1.0 else -1.0)))
    val events = (base :+
      (20L, 1L, new java.sql.Timestamp(20000L), 500.0) :+
      (21L, 2L, new java.sql.Timestamp(1000L), 7.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = ScaleOps.rollingZScore(events).orderBy("event_id").collect()
    assert(out.take(4).forall(_.isNullAt(3)),
      "z must be NULL while the baseline is thin (n < 5)")
    assert(out(19).getBoolean(4), "injected spike must be flagged")
    assert(out(20).isNullAt(3), "single-event user has no baseline")
    val flat = (1 to 10).map(i =>
      (i.toLong, 1L, new java.sql.Timestamp(i * 1000L), 42.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(ScaleOps.rollingZScore(flat)
      .filter(col("z_micro").isNotNull).isEmpty,
      "zero-variance baseline must yield NULL z, not ±Inf")
  }

  test("packStats reconciles with the packSequences layout") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, dir, "documents")
    val layout = Pipeline.packSequences(docs, cap = 2048, cacheKey = dir)
    val stats = Pipeline.packStats(docs, cap = 2048, cacheKey = dir)
    assert(stats.agg(sum("n_docs")).head().getLong(0) == docs.count())
    assert(stats.agg(sum("total_tok")).head().getLong(0) ==
      layout.agg(sum("n_tok")).head().getLong(0))
    // A split doc crosses a cap boundary: its bin differs from the bin
    // of its last token.
    val nSplit = layout.filter(
      expr("n_tok > 0 and (tok_offset + n_tok - 1) div 2048 > bin"))
      .count()
    assert(stats.agg(sum("n_split")).head().getLong(0) == nSplit)
    assert(stats.filter(col("n_split") > col("n_docs")).isEmpty)
  }

  test("qualityDupCalib buckets partition the corpus; dups reconcile") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, dir, "documents")
    val calib = Pipeline.qualityDupCalib(docs, cacheKey = dir)
    assert(calib.agg(sum("n_docs")).head().getLong(0) == docs.count())
    assert(calib.filter(col("bucket") < 0 || col("bucket") > 9).isEmpty)
    // n_dup totals = docs − distinct content digests.
    val nDup = docs.count() -
      docs.select(expr(s"md5(${TextOps.normS})")).distinct().count()
    assert(calib.agg(sum("n_dup")).head().getLong(0) == nDup)
    assert(calib.filter(col("dup_share") < 0 || col("dup_share") > 1)
      .isEmpty)
  }
}
