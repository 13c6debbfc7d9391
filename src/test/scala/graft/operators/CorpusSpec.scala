package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the corpus-governance operators beyond the oracle
  * gate: plan shapes (what must broadcast, what must never shuffle or
  * window over the corpus), degenerate-input behavior the fixture
  * corpus cannot reach (sub-2-token docs, empty stoplists), and diff
  * classification edges.
  */
class CorpusSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def docs =
    graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")

  test("noveltyScore: the earliest doc is fully novel, counts bound, " +
    "and corpus-unique spans imply novelty 1.0 (dup-rate duality)") {
    val fps = Corpus.docFps(docs)
    val nov = Corpus.noveltyScore(fps).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2),
        r.getDouble(3))).toMap
    assert(nov.nonEmpty)
    nov.values.foreach { case (n, k, f) =>
      assert(k >= 0 && k <= n && f >= 0.0 && f <= 1.0)
    }
    // The lowest doc_id carrying fingerprints cannot have been scooped.
    val firstDoc = nov.keys.min
    assert(nov(firstDoc)._3 == 1.0,
      s"earliest doc $firstDoc must be fully novel: ${nov(firstDoc)}")
    // Duality with spanDupRate, exact for EVERY doc: a span that is
    // unique corpus-wide is necessarily novel to its only carrier, so
    // n_novel ≥ n_fps − n_dup (duplicated spans may add more novelty
    // when this doc is their first occurrence, never less).
    val dup = Corpus.spanDupRate(fps).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    dup.foreach { case (d, (nFps, nDup)) =>
      val (n, k, _) = nov(d)
      assert(n == nFps, s"doc $d: fp counts disagree ($n vs $nFps)")
      assert(k >= nFps - nDup,
        s"doc $d: novelty $k below unique-span floor ${nFps - nDup}")
    }
    // And the corpus carries duplicated spans whose FIRST carrier gets
    // the novelty credit (strict inequality somewhere) — otherwise the
    // two measures would be redundant.
    assert(dup.exists { case (d, (nFps, nDup)) =>
      nDup > 0 && nov(d)._2 > nFps - nDup })
  }

  // ---- domain stats / filter ----

  test("domainFilter broadcasts the source table; corpus never " +
    "shuffles or sort-merge-joins") {
    val out = Corpus.domainFilter(docs, 280.0, 1000000.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "passing-source table must broadcast")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"))
    // Every surviving doc's source average really clears the band.
    val bad = out.filter(col("source_avg_chars") < 280.0).count()
    assert(bad == 0L)
  }

  test("domainStats avg is exactly sum/count per source") {
    val rows = Corpus.domainStats(docs)
      .select("sum_chars", "n_docs", "avg_chars").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(0).toDouble / r.getLong(1))
    }
  }

  // ---- corpus diff ----

  test("corpusDiff classifies added/removed/changed/unchanged " +
    "and payload-identical revisions as unchanged") {
    val sp = spark
    import sp.implicits._
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, "delta")).toDF("doc_id", "text")
    val next = Seq((1L, "alpha"), (2L, "beta CHANGED"),
      (4L, "delta"), (5L, "epsilon")).toDF("doc_id", "text")
    val m = Corpus.corpusDiff(prev, next)
      .as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"))
    // Counts roll up consistently.
    val c = Corpus.corpusDiffCounts(prev, next)
      .as[(String, Long)].collect().toMap
    assert(c == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("corpusDiff classifies null-text documents by PRESENCE, not " +
    "digest nullness") {
    val sp = spark
    import sp.implicits._
    // (10) null in both -> unchanged; (11) null -> text -> changed;
    // (12) text -> null -> changed; (13) null-text doc deleted ->
    // removed (digest-nullness inference reported "added" here);
    // (14) null-text doc created -> added.
    val prev = Seq[(Long, String)]((10L, null), (11L, null),
      (12L, "txt"), (13L, null)).toDF("doc_id", "text")
    val next = Seq[(Long, String)]((10L, null), (11L, "txt"),
      (12L, null), (14L, null)).toDF("doc_id", "text")
    val m = Corpus.corpusDiff(prev, next)
      .as[(Long, String)].collect().toMap
    assert(m == Map(10L -> "unchanged", 11L -> "changed",
      12L -> "changed", 13L -> "removed", 14L -> "added"))
  }

  test("domainFilter keeps null-source documents when their group's " +
    "average is in band, and bands them out like any other group") {
    val sp = spark
    import sp.implicits._
    val docs = Seq[(Long, String, String, Long)](
      (1L, null, "en", 100L), (2L, null, "en", 120L),
      (3L, "srcA", "en", 110L), (4L, "srcB", "en", 9000L))
      .toDF("doc_id", "source", "lang", "n_chars")
    val kept = Corpus.domainFilter(docs, 50.0, 200.0)
      .select("doc_id").as[Long].collect().toSet
    // null-source group avg 110 in band -> kept; srcB avg 9000 -> out.
    assert(kept == Set(1L, 2L, 3L))
    val none = Corpus.domainFilter(docs, 150.0, 200.0)
      .select("doc_id").as[Long].collect().toSet
    assert(none.isEmpty)
  }

  test("corpusDiff moves digests, not payloads: the join reads " +
    "16-byte md5 projections") {
    val out = Corpus.corpusDiff(docs, docs.limit(100))
    val plan = out.queryExecution.executedPlan.toString
    // Both scan projections are pruned to (doc_id, text) before the
    // digest Project; the joined schema carries only digests.
    assert(plan.contains("md5"))
    assert(!plan.contains("CartesianProduct"))
  }

  // ---- stopword scrub ----

  test("stopwordScrub: stoplist broadcasts, corpus side has no " +
    "shuffle, and the scrub only removes stoplisted tokens") {
    Memo.clearCaches(spark)
    val out = Corpus.stopwordScrub(docs, dfFrac = 0.5, cap = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "single-row stoplist must broadcast")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"))
    val rows = out.select("n_tokens", "n_removed").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(1) >= 0 &&
      r.getInt(1) <= r.getInt(0)))
    // The fixture's ubiquitous filler token is stoplisted, so some
    // document really shrinks (the scrub is not a no-op).
    assert(rows.exists(_.getInt(1) > 0))
  }

  test("stopwordScrub with an unreachable df threshold is an exact " +
    "token-stream no-op (empty stoplist edge)") {
    Memo.clearCaches(spark)
    val out = Corpus.stopwordScrub(docs, dfFrac = 2.0, cap = 8)
    assert(out.filter(col("n_removed") =!= 0).count() == 0L)
    // text_scrubbed equals the normalized token stream verbatim.
    val diff = out.join(docs, "doc_id")
      .filter(col("text_scrubbed") =!=
        array_join(expr(TextOps.toksS), " "))
      .count()
    assert(diff == 0L)
  }

  // ---- bigram LM score ----

  test("lmScore keeps degenerate (<2-token) docs in-band with " +
    "n_bigrams = 0 and null avg") {
    val sp = spark
    import sp.implicits._
    val tiny = Seq((1L, "hello world hello world"), (2L, "single"),
      (3L, ""), (4L, "hello world")).toDF("doc_id", "text")
    Memo.clearCaches(spark)
    val m = Corpus.lmScore(tiny, topV = 100)
      .select("doc_id", "n_bigrams", "sum_pmicro").as[(Long, Int, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: 3 bigrams; hello->world twice + world->hello once.
    // c(hello,world)=3, c(world,hello)=1, c(hello)=3, c(world)=1.
    // p(hello->world)=1e6, p(world->hello)=1e6 → sum 3e6.
    assert(m(1L) == ((3, 3000000L)))
    assert(m(2L) == ((0, 0L)) && m(3L) == ((0, 0L)))
    assert(m(4L) == ((1, 1000000L)))
    val avgs = Corpus.lmScore(tiny, topV = 100)
      .select("doc_id", "avg_pmicro").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(avgs(2L).isEmpty && avgs(3L).isEmpty)
    assert(avgs(1L).contains(1000000.0))
    Memo.clearCaches(spark)
  }

  test("lmScore top-V cap zeroes out-of-model transitions " +
    "deterministically (count-then-lexicographic tie-break)") {
    val sp = spark
    import sp.implicits._
    // Four distinct bigrams, all count 1: cap=2 keeps (a,b),(b,c) by
    // the (c_ab DESC, a, b) order; (c,d),(d,e) score 0.
    val tiny = Seq((1L, "a b c"), (2L, "c d e")).toDF("doc_id", "text")
    Memo.clearCaches(spark)
    val m = Corpus.lmScore(tiny, topV = 2)
      .select("doc_id", "sum_pmicro").as[(Long, Long)].collect().toMap
    assert(m(1L) == 2000000L, "in-model doc keeps full probability")
    assert(m(2L) == 0L, "out-of-model doc floors to 0")
    Memo.clearCaches(spark)
  }

  test("spanDecontaminate: bench fingerprint set broadcasts; every " +
    "corpus doc is reported; fraction edge sits exactly at minFrac") {
    val sp = spark
    import sp.implicits._
    Memo.clearCaches(spark)
    // doc 0 = bench {A}, via identical text. doc 1 identical to bench
    // (frac 1.0); doc 2 shares nothing (frac 0.0). Short texts take
    // the single-fingerprint path, making fractions exact.
    val tiny = Seq(
      (0L, "shared span"), (1L, "shared span"), (2L, "different!"))
      .toDF("doc_id", "text")
    val out = Corpus.spanDecontaminate(
      Corpus.docFps(tiny), col("doc_id") === 0L, minFrac = 1.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bench fingerprint set must broadcast")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"))
    val rows = out.select("doc_id", "n_bench", "contaminated")
      .as[(Long, Int, Boolean)].collect()
      .map { case (k, b, c) => k -> ((b, c)) }.toMap
    assert(rows.keySet == Set(1L, 2L),
      "all non-bench docs reported, bench rows excluded")
    assert(rows(1L) == ((1, true)), "frac == minFrac is contaminated")
    assert(rows(2L) == ((0, false)))
    Memo.clearCaches(spark)
  }

  test("dsirWeights: target-heavy features score positive, models " +
    "broadcast, degenerate docs stay in-band, and weights respond " +
    "to the target slice") {
    Memo.clearCaches(spark)
    val sp = spark
    import sp.implicits._
    // 3 target docs repeating "aa bb", 3 raw-only docs repeating
    // "cc dd", one 1-token doc (no bigram) — the aa→bb feature is
    // 100% of the target model but 50% of the raw, so target docs
    // must score positive and raw-only docs negative.
    val d = Seq(
      (1L, "aa bb aa bb aa bb", "en"), (2L, "aa bb aa bb", "en"),
      (3L, "aa bb", "en"), (4L, "cc dd cc dd cc dd", "de"),
      (5L, "cc dd cc dd", "de"), (6L, "cc dd", "de"),
      (7L, "solo", "en")).toDF("doc_id", "text", "lang")
    val out = Corpus.dsirWeights(d, col("lang") === "en", 256)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "target ids and both micro-models must broadcast")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"))
    val rows = out.select("doc_id", "n_feats", "avg_dw_micro")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.get(2)).map(_.toString.toDouble))))
      .toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      "every document reported, bigram-less ones included")
    assert(rows(7L) == ((0, None)), "degenerate doc: 0 feats, null avg")
    Seq(1L, 2L, 3L).foreach(id => assert(rows(id)._2.get > 0,
      s"target doc $id must weigh positive"))
    Seq(4L, 5L, 6L).foreach(id => assert(rows(id)._2.get < 0,
      s"raw-only doc $id must weigh negative"))
    // Widening the target to every doc makes p_t ≈ p_r: with all
    // langs targeted both models are the same counts, so every
    // weight collapses to 0 (floor rounding is shared).
    val flat = Corpus.dsirWeights(d, lit(true), 256)
      .filter(col("n_feats") > 0)
      .agg(sum(abs(col("sum_dw_micro")))).collect()(0).getLong(0)
    assert(flat == 0L, s"identical target/raw models must zero out")
    Memo.clearCaches(spark)
  }

  test("lmScore plan: model sides broadcast; the only corpus " +
    "shuffles are the bigram aggregates; the ranking window runs " +
    "over the model table, never the corpus") {
    Memo.clearCaches(spark)
    // The un-memoized plan: the memoized public entry returns a
    // persisted frame whose InMemoryRelation hides the shape.
    val out = Corpus.lmScorePlan(docs, topV = 512, cacheKey = "")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "capped model and unigram tables must broadcast")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"))
    // The top-V model cap must rank WITHOUT a window at all (r17): it
    // plans as TakeOrderedAndProject — per-partition top-V heaps, a
    // topV-bounded transfer — instead of the former global row_number
    // window that moved the whole bigram vocabulary to one task. And
    // if a window ever reappears, it must not run over a corpus frame.
    assert(plan.contains("TakeOrderedAndProject"),
      s"the model cap must plan as TakeOrderedAndProject:\n$plan")
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    windows.foreach { w =>
      assert(!w.child.output.exists(_.name == "doc_id"),
        s"ranking window must not run over a corpus frame: $w")
    }
    Memo.clearCaches(spark)
  }

  test("pplBuckets partitions the corpus exactly, each bucket count " +
    "matches the per-doc threshold rule recomputed from lmScore, and " +
    "misordered thresholds are rejected") {
    Memo.clearCaches(spark)
    val out = Corpus.pplBuckets(docs, headMin = 26000L, midMin = 23500L,
      topV = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Exact partition: every document lands in exactly one bucket.
    assert(out.values.sum == docs.count())
    // Recompute the expected bucket per doc from the SAME lmScore
    // table with driver-side integer arithmetic — the exactness claim
    // (sum >= n·T, no division) checked independently of the operator.
    val expected = Corpus.lmScore(docs, topV = 512)
      .select("n_bigrams", "sum_pmicro").collect()
      .map { r =>
        val n = r.getInt(0); val s = r.getLong(1)
        if (n == 0) "tail"
        else if (s >= n.toLong * 26000L) "head"
        else if (s >= n.toLong * 23500L) "middle"
        else "tail"
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out == expected,
      s"bucket counts diverged: got $out, expected $expected")
    // The fixture thresholds genuinely shard: more than one bucket.
    assert(out.size >= 2, s"thresholds never fired: $out")
    intercept[IllegalArgumentException] {
      Corpus.pplBuckets(docs, headMin = 1L, midMin = 2L, topV = 512)
    }
    Memo.clearCaches(spark)
  }

  test("spanScrubDocs: scrubbed text matches spanScrub's digest and " +
    "counts per doc, metadata passes through, null-text docs drop") {
    val sp = spark
    import sp.implicits._
    val fps = Corpus.docFps(docs)
    val byDigest = Corpus.spanScrub(docs, fps)
      .select("doc_id", "kept_chars", "kept_digest")
      .as[(Long, Int, String)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val rows = Corpus.spanScrubDocs(docs, fps)
      .select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).as("lc"), md5(col("text")).as("dg"),
        col("n_chars"))
      .collect()
    // Same doc set (both drop null-text rows) and, per doc, the SAME
    // reconstructed characters — digest equality, not just counts.
    assert(rows.length == byDigest.size)
    rows.foreach { r =>
      val (kc, dg) = byDigest(r.getLong(0))
      assert(r.getLong(5) == kc.toLong && r.getInt(3) == kc,
        s"doc ${r.getLong(0)}: n_chars ${r.getLong(5)} != $kc")
      assert(r.getString(4) == dg,
        s"doc ${r.getLong(0)}: scrubbed text digest diverged")
    }
    // Metadata survives: lang/source equal the source rows'.
    val meta = docs.filter(col("text").isNotNull)
      .select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)),
        Option(r.getString(2)))).toMap
    rows.foreach { r =>
      assert(meta(r.getLong(0)) ==
        (Option(r.getString(1)), Option(r.getString(2))))
    }
  }
}
