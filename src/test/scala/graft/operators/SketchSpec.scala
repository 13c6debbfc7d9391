package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSketches HLL gates for [[Corpus.hllDistinctTerms]] — the halves
  * the DuckDB oracle cannot reach. `hll_distinct`'s oracle proves
  * build/merge/estimate agree with exact truth in the coupon-list
  * regime; this spec gates (1) the ERROR BOUND in the estimation
  * regime (high cardinality, where exactness is impossible by
  * construction), (2) merge ≡ single-pass at that cardinality — the
  * property that lets per-epoch sketches roll up without a second
  * corpus pass, and (3) the one-corpus-scan plan shape of the declared
  * query's self-union.
  */
class SketchSpec extends AnyFunSuite {

  private val lgK = 12

  test("HLL estimate at 200k distinct is within the lgK=12 error " +
    "envelope, and sharding+union reproduces the single-pass sketch") {
    val spark = TestSpark.spark
    val n = 200000L
    // Distinct longs with non-sequential bit patterns (the hash input
    // shape real ids have).
    val vals = spark.range(n)
      .select((col("id") * 2654435761L + 99991L).as("v"),
        (col("id") % 4).as("shard"))
    val single = vals
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(v, $lgK))"))
      .head().getLong(0)
    // lgK=12 → rsd ≈ 1.04/sqrt(4096) ≈ 1.63%; gate at 3 sigma.
    assert(math.abs(single - n).toDouble / n < 0.05,
      s"estimate $single too far from $n")
    val merged = vals
      .groupBy("shard").agg(expr(s"hll_sketch_agg(v, $lgK)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    // Union is register-wise max — order-independent and equal to the
    // single-pass sketch over the same distinct set.
    assert(merged == single,
      s"sharded union $merged != single-pass $single")
  }

  test("coupon-list regime is exact: small distinct sets estimate to " +
    "their true cardinality") {
    val spark = TestSpark.spark
    val est = spark.range(1000)
      .select((col("id") % 31).as("v"))
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(v, $lgK))"))
      .head().getLong(0)
    assert(est == 31L, s"list-mode estimate $est != 31")
  }

  test("CMS: shard-merged sketches answer identically to the " +
    "single-pass sketch, and estimates only ever overestimate") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Zipf-ish stream with real collisions: coarse width (eps 0.05 →
    // 40 counters) over 5k distinct items.
    val items = spark.range(50000)
      .select(concat(lit("t"), (col("id") % 5000)).as("term"),
        (col("id") % 2).as("shard")).cache()
    val eps = 0.05
    val single = items.stat.countMinSketch("term", eps, 0.99, 7)
    val s0 = items.filter(col("shard") === 0)
      .stat.countMinSketch("term", eps, 0.99, 7)
    val s1 = items.filter(col("shard") === 1)
      .stat.countMinSketch("term", eps, 0.99, 7)
    s0.mergeInPlace(s1)
    val probes = (0 until 5000 by 97).map(i => s"t$i")
    assert(probes.forall(t =>
      s0.estimateCount(t) == single.estimateCount(t)),
      "shard-merge must equal the single-pass sketch")
    val truth = items.groupBy("term").count()
      .as[(String, Long)].collect().toMap
    assert(probes.forall(t => single.estimateCount(t) >= truth(t)),
      "CMS must never underestimate")
    // In this collision-forced regime at least one probe IS inflated —
    // the oracle's exactness claim is about width, not magic.
    assert(probes.exists(t => single.estimateCount(t) > truth(t)),
      "expected collisions at width 40 over 5k distinct")
    items.unpersist(): Unit
  }

  test("cmsDocFreq matches exact document frequency at real-vocab " +
    "width (collision-free regime, fixed seed)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val got = Corpus.cmsDocFreq(docs, cacheKey = "sketch-spec")
      .as[(String, Long)].collect().toMap
    val want = Pipeline.docTerms(docs, cacheKey = "sketch-spec")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"CMS df diverged: ${got.size} vs ${want.size}")
  }

  test("theta: partial-union equals direct build, intersections track " +
    "true overlap within the k=4096 envelope at 100k distinct") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Two "sources" with a designed 50% overlap: A = [0, 100k),
    // B = [50k, 150k) — 50k shared of 100k each.
    val n = 100000L
    val terms = spark.range(2 * n)
      .select(
        when(col("id") < n, lit("a")).otherwise(lit("b")).as("source"),
        concat(lit("t"), when(col("id") < n, col("id"))
          .otherwise(col("id") - n + n / 2)).as("term"))
    val sketches = ThetaSketches.sourceTermSketches(terms)
      .collect().toSeq
    assert(sketches.map(_._1).sorted == Seq("a", "b"))
    val Seq((_, _, shared)) =
      ThetaSketches.pairwiseIntersections(sketches)
    // Intersection rse compounds (~2/sqrt(k) per operand); gate at 10%.
    assert(math.abs(shared - n / 2).toDouble / (n / 2) < 0.10,
      s"intersection $shared too far from ${n / 2}")
    // Partial-path determinism: a repartitioned build (different
    // partial split) must union to identical estimates — the
    // order-independence that makes the no-shuffle build valid.
    val reSketches = ThetaSketches
      .sourceTermSketches(terms.repartition(13)).collect().toSeq
    val Seq((_, _, shared2)) =
      ThetaSketches.pairwiseIntersections(reSketches)
    assert(shared2 == shared,
      s"partition split changed the estimate: $shared2 vs $shared")
  }

  test("theta exact mode: small distinct sets intersect exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val terms = Seq(
      ("a", "x"), ("a", "y"), ("a", "z"), ("a", "x"),
      ("b", "y"), ("b", "z"), ("b", "w")).toDF("source", "term")
    val out = ThetaSketches.sourceOverlapEstimates(terms).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L,
      out.mkString(","))
  }

  test("hllDistinctTerms: the self-union's second consumer reuses the " +
    "per-source aggregate's exchange — one corpus scan, not two") {
    val spark = TestSpark.spark
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = Corpus.hllDistinctTerms(docs, cacheKey = "sketch-spec")
    val rows = out.collect()
    // 20 sources + the merged __all__ row, which must equal the
    // distinct-term union across sources (vocab is corpus-wide here).
    val bySrc = rows.filter(_.getString(0) != "__all__")
    val all = rows.find(_.getString(0) == "__all__").get.getLong(1)
    assert(bySrc.nonEmpty && all >= bySrc.map(_.getLong(1)).max)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") ||
      plan.contains("TableCacheQueryStage") ||
      plan.contains("InMemoryTableScan"),
      s"expected the self-union to reuse the corpus-side work:\n$plan")
  }
}
