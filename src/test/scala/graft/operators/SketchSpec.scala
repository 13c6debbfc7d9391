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

  test("KLL exact regime: grouped quantiles equal percentile_disc and " +
    "survive any partial split while no compaction has occurred") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // Driver-side truth: SQL-standard percentile_disc — the smallest
    // value whose cumulative (inclusive) rank reaches q, i.e. the
    // 1-based ceil(q*n)-th order statistic.
    val truth = docs.filter(col("text").isNotNull)
      .select(col("source"), length(col("text")).cast("long"))
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (s, vs) => s -> vs.map(_._2).sorted.toIndexedSeq }
    def pdisc(vs: IndexedSeq[Long], q: Double): Long =
      vs(math.ceil(q * vs.size).toInt - 1)
    val got = QuantileSketches.sourceLengthQuantiles(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == truth.keySet)
    truth.foreach { case (s, vs) =>
      val (_, p25, p50, p75, p95, nv) = got(s)
      assert((p25, p50, p75, p95, nv) ==
        (pdisc(vs, 0.25), pdisc(vs, 0.5), pdisc(vs, 0.75),
          pdisc(vs, 0.95), vs.size.toLong),
        s"source $s quantiles diverged from percentile_disc")
    }
    // Partial-split invariance in the exact regime: merging
    // never-compacted partials retains every value, so a different
    // partition split must answer identically.
    val re = QuantileSketches
      .sourceLengthQuantiles(docs.repartition(13))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(re == got, "partition split changed exact-regime quantiles")
  }

  test("KLL estimation regime: rank error at 200k values stays inside " +
    "the k=200 envelope and the stream count stays exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val n = 200000L
    val m = 1000003L
    val vals = spark.range(n)
      .select(lit("g").as("_1"),
        ((col("id") * 2654435761L) % m).cast("double").as("_2"))
      .as[(String, Double)]
    val Array((_, bytes)) =
      QuantileSketches.groupedSketches(vals, 200).collect()
    val sk = org.apache.datasketches.kll.KllDoublesSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(bytes))
    assert(sk.getN == n, "stream length must stay exact under merges")
    // ε(k=200) ≈ 1.33% at 99% confidence; gate each probed rank at 2ε.
    val eps = org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(200, false)
    Seq(0.1, 0.5, 0.9).foreach { frac =>
      val x = frac * m
      val trueRank =
        vals.filter(col("_2") <= x).count().toDouble / n
      val estRank = sk.getRank(x,
        org.apache.datasketches.quantilescommon
          .QuantileSearchCriteria.INCLUSIVE)
      assert(math.abs(estRank - trueRank) <= 2 * eps,
        s"rank($x): est $estRank vs true $trueRank (eps $eps)")
    }
  }

  test("frequent-items exact regime: heavy hitters equal the exact " +
    "HAVING set with exact counts when the vocab fits the map") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val terms = Pipeline.docTerms(docs, cacheKey = "sketch-spec")
    val total = terms.agg(sum("tf")).head().getLong(0)
    val want = terms.groupBy("term")
      .agg(sum("tf").as("c")).filter(col("c") > total / 50)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    val got = HeavyHitters
      .termHeavyHitters(docs, cacheKey = "sketch-spec")
      .as[(String, Long)].collect().toSeq
    assert(got == want, s"${got.size} vs ${want.size} heavy hitters")
  }

  test("frequent-items purge regime: bounds bracket truth, maximum " +
    "error honors 3.5n/maxMapSize, and no true heavy hitter is lost") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 10 hot items at 5000 occurrences over a 5k-item unit-weight tail
    // — forced purges at maxMapSize 64 (error cap ≈ 3008 < 5000, so
    // hot items remain provably heavy).
    val hot = spark.range(10)
      .select(concat(lit("h"), col("id")).as("term"),
        lit(5000L).as("tf"))
    val tail = spark.range(5000)
      .select(concat(lit("t"), col("id")).as("term"), lit(1L).as("tf"))
    val nTot = 10L * 5000 + 5000
    // The guarantees must survive ANY tier-1/tier-2 merge split (the
    // purge sequence differs across reducer counts; the bounds and
    // no-false-negative contract may not).
    Seq(1, 3, 64).foreach { reducers =>
      val sk = HeavyHitters.termSketch(hot.unionByName(tail), 64,
        reducers = reducers)
      assert(sk.getStreamLength == nTot)
      assert(sk.getMaximumError <= (3.5 * nTot / 64).toLong,
        s"max error ${sk.getMaximumError} above the published bound")
      val nfn = sk.getFrequentItems(nTot / 50,
        org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
      val names = nfn.map(_.getItem).toSet
      assert((0 until 10).forall(i => names.contains(s"h$i")),
        s"reducers=$reducers lost a true heavy hitter: $names")
      nfn.filter(r => r.getItem.startsWith("h")).foreach { r =>
        assert(r.getLowerBound <= 5000L && 5000L <= r.getUpperBound,
          s"${r.getItem}: [${r.getLowerBound}, ${r.getUpperBound}]")
      }
    }
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
