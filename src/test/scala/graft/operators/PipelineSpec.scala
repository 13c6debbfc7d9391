package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the corpus-preparation operators beyond the oracle
  * gate: plan shapes (what must broadcast), split determinism and
  * proportions, packing invariants.
  */
class PipelineSpec extends AnyFunSuite {

  private def docs = Dedup.docShingles(
    graft.Tables.t(TestSpark.spark, "/root/testdata/sf0.001", "documents"))

  test("decontaminate broadcasts the benchmark side; corpus never " +
    "self-joins") {
    val out = Pipeline.decontaminate(docs, col("doc_id") % 97 === 0, 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark shingles must broadcast")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("CartesianProduct"))
    // Overlap counts are positive by construction and the flag obeys
    // the threshold.
    val rows = out.select("n_overlap", "contaminated")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= 1)
      assert(r.getBoolean(1) == (r.getLong(0) >= 5))
    }
  }

  test("hash split is deterministic, partition-stable, and ~80/10/10") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ids = (0L until 10000L).toDF("doc_id")
    val split = ids.select(col("doc_id"),
      Pipeline.splitName(Pipeline.splitBucket(col("doc_id"))).as("split"))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 8000L) < 200)
    assert(math.abs(counts("val") - 1000L) < 150)
    assert(math.abs(counts("test") - 1000L) < 150)
    // Stable under repartitioning (rand()-based splits are not).
    val again = ids.repartition(7).select(col("doc_id"),
      Pipeline.splitName(Pipeline.splitBucket(col("doc_id"))).as("split"))
    assert(split.exceptAll(again).isEmpty)
  }

  test("seq_pack: bins are contiguous per group and no bin starts " +
    "past its budget") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Pipeline.packSequences(
      graft.Tables.t(spark, "/root/testdata/sf0.001", "documents"), 2048)
      .as[(Long, String, Int, Long, Long)].collect()
    val byLang = out.groupBy(_._2)
    byLang.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      // Offsets are exclusive prefix sums in doc_id order.
      var run = 0L
      sorted.foreach { case (_, _, nTok, off, bin) =>
        assert(off == run)
        assert(bin == off / 2048)
        run += nTok
      }
      // Bin ids are non-decreasing and gap-free.
      val bins = sorted.map(_._5)
      assert(bins.sameElements(bins.sorted))
      assert(bins.distinct.sameElements(bins.min to bins.max))
    }
  }

  test("seq_pack two-stage prefix sum: >1 task per language, output " +
    "identical to the single-window formulation") {
    val spark = TestSpark.spark
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // bucketWidth=64 so the 500-doc fixture spans ~8 buckets per lang.
    val twoStage = Pipeline.packSequences(docs, 2048, bucketWidth = 64)
    val plan = twoStage.queryExecution.executedPlan.toString
    // The per-doc window must partition on (lang, bkt) — the whole
    // point: no single reducer owns a language.
    assert("hashpartitioning\\(lang#\\d+, bkt#\\d+".r
      .findFirstIn(plan).isDefined,
      s"expected a (lang, bkt)-partitioned window, got:\n$plan")
    // Row-identical to the naive per-language window (the oracle's
    // formulation).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    val naive = docs
      .withColumn("toks", expr(TextOps.toksS))
      .select(col("doc_id"), col("lang"), size(col("toks")).as("n_tok"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("tok_offset") / lit(2048)))
      .select("doc_id", "lang", "n_tok", "tok_offset", "bin")
    assert(twoStage.orderBy("doc_id").collect().toSeq ==
      naive.orderBy("doc_id").collect().toSeq)
  }

  test("seq_pack keeps NULL-lang documents as their own partition " +
    "(null-safe bucket join)") {
    val spark = TestSpark.spark
    // Real corpus plus a synthetic null-lang slice: the two-stage
    // rewrite joins local offsets to bucket offsets on lang, and a
    // null-rejecting equi-join would silently DROP these rows (ADVICE
    // r5); the single-window formulation (and the seq_pack oracle's
    // PARTITION BY lang) keeps them as one partition.
    val base = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
    val nulled = base.limit(40)
      .select(col("doc_id") + 100000L, lit(null: String).as("lang"),
        col("text"))
      .toDF("doc_id", "lang", "text")
    val docs = base.union(nulled)
    val twoStage = Pipeline.packSequences(docs, 2048, bucketWidth = 64)
    assert(twoStage.filter(col("lang").isNull).count() == 40,
      "null-lang docs must survive the bucket-offset join")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    val naive = docs
      .withColumn("toks", expr(TextOps.toksS))
      .select(col("doc_id"), col("lang"), size(col("toks")).as("n_tok"))
      .withColumn("tok_offset",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("tok_offset") / lit(2048)))
      .select("doc_id", "lang", "n_tok", "tok_offset", "bin")
    assert(twoStage.orderBy("doc_id").collect().toSeq ==
      naive.orderBy("doc_id").collect().toSeq)
  }

  test("lengthFilter band-filters NULL-lang documents instead of " +
    "silently deleting them (null-safe bounds join)") {
    val spark = TestSpark.spark
    val base = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "text")
    val nulled = base.limit(40)
      .select(col("doc_id") + 100000L, lit(null: String).as("lang"),
        col("text"))
      .toDF("doc_id", "lang", "text")
    val out = Pipeline.lengthFilter(base.union(nulled), 0.05, 0.95)
    val nullKept = out.filter(col("lang").isNull).count()
    // The NULL group gets its own [p05, p95] band like every language;
    // with 40 rows the band keeps the inner ~90% (exact count depends
    // on ties, but silent deletion would be 0).
    assert(nullKept >= 30 && nullKept <= 40,
      s"null-lang docs must be band-filtered, not dropped (kept $nullKept)")
  }

  test("lengthFilter approx path: sketch bounds keep ≥99% of the exact " +
    "band and no out-of-band row strays in beyond the rank error") {
    val spark = TestSpark.spark
    val docsDf = graft.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val exact = Pipeline.lengthFilter(docsDf, 0.05, 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = Pipeline.lengthFilter(docsDf, 0.05, 0.95,
      approxBounds = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    val kept = (exact intersect approx).size.toDouble / exact.size
    assert(kept >= 0.99, s"approx band kept only ${kept * 100}% of exact")
    // Symmetric sanity: the approx band is a band, not a superset blowup.
    assert(approx.size <= (exact.size * 1.05).toInt + 5)
  }

  test("tfidf: df/N sides broadcast and per-doc ranks are 1..k") {
    val spark = TestSpark.spark
    import spark.implicits._
    val out = Pipeline.tfIdfTopK(
      graft.Tables.t(spark, "/root/testdata/sf0.001", "documents"), 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), "scalar N must broadcast")
    val ranks = out.groupBy("doc_id")
      .agg(collect_list(col("rk")).as("rks"))
      .select("rks").as[Seq[Int]].collect()
    ranks.foreach(rks => assert(rks.sorted == (1 to rks.size).toList))
  }

  test("redactPii counts and redacts emails/phones/IPv4s; clean and " +
    "null text pass through") {
    val spark = TestSpark.spark
    import spark.implicits._
    val fixture = Seq(
      (1L, "mail a.b+c@sub.example.org and x@y.io here"),
      (2L, "call +4915512345678 or +1234567 now"),
      (3L, "hosts 192.168.0.1 and 10.0.0.255"),
      (4L, "mixed bob@ex.com +7700900123 172.16.254.3"),
      (5L, "no pii at all, just words and 42 numbers"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Pipeline.redactPii(fixture)
      .select("doc_id", "n_email", "n_phone", "n_ip", "red")
      .as[(Long, Integer, Integer, Integer, String)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 2, 0, 0,
      "mail <EMAIL> and <EMAIL> here")))
    assert(out(1) == ((2L, 0, 2, 0, "call <PHONE> or <PHONE> now")))
    assert(out(2) == ((3L, 0, 0, 2, "hosts <IP> and <IP>")))
    assert(out(3) == ((4L, 1, 1, 1, "mixed <EMAIL> <PHONE> <IP>")))
    assert(out(4) == ((5L, 0, 0, 0,
      "no pii at all, just words and 42 numbers")))
    assert(out(5) == ((6L, null, null, null, null)))
    // Per-row only: no exchange in the plan.
    val plan = Pipeline.redactPii(fixture)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PII scrub must not shuffle:\n$plan")
  }

  test("budgetSelect threshold-then-boundary: bounded (lang, bkt) " +
    "window + broadcast joins, output identical to the single-window " +
    "formulation (null-lang rows included)") {
    val spark = TestSpark.spark
    val base = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    val nulled = base.limit(40)
      .select(col("doc_id") + 100000L, lit(null: String).as("lang"),
        col("n_chars"))
      .toDF("doc_id", "lang", "n_chars")
    val docs = base.union(nulled)
    // tieBucketWidth=16 so the boundary group spans many buckets.
    val twoStage = Pipeline.budgetSelect(docs, 20000L, tieBucketWidth = 16)
    val plan = twoStage.queryExecution.executedPlan.toString
    // Boundary ranking must be the bounded two-stage shape: the only
    // per-document window partitions on (lang, bkt) — never a
    // corpus-wide hashpartitioning(lang) window like the naive form.
    assert("hashpartitioning\\(lang#\\d+, bkt#\\d+".r
      .findFirstIn(plan).isDefined,
      s"expected a (lang, bkt)-partitioned boundary window, got:\n$plan")
    // The corpus side joins the tiny value-table slices broadcast —
    // no shuffled join anywhere in the operator.
    assert(plan.contains("BroadcastHashJoin"),
      s"full/boundary joins must broadcast the value table, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle for a join:\n$plan")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    def naive(in: org.apache.spark.sql.DataFrame, b: Long) = in
      .withColumn("cum", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .filter(col("cum") + col("n_chars") <= b)
      .select("doc_id", "lang", "n_chars")
    assert(twoStage.orderBy("doc_id").collect().toSeq ==
      naive(docs, 20000L).orderBy("doc_id").collect().toSeq)
    assert(twoStage.filter(col("lang").isNull).count() > 0,
      "null-lang docs must form their own budget pool, not vanish")
    // Degenerate all-tied corpus — the case the rewrite exists for:
    // every doc the same length puts a whole language in ONE value
    // group; admission must still be the first k_max docs by doc_id.
    import spark.implicits._
    val tied = (1L to 200L).map(i => (i, if (i % 2 == 0) "en" else "de", 10L))
      .toDF("doc_id", "lang", "n_chars")
    val tiedOut = Pipeline.budgetSelect(tied, 255L, tieBucketWidth = 16)
    assert(tiedOut.orderBy("doc_id").collect().toSeq ==
      naive(tied, 255L).orderBy("doc_id").collect().toSeq,
      "all-tied-length corpus must match the single-window formulation")
    // 255 div 10 = 25 docs per lang, lowest doc_ids first.
    assert(tiedOut.groupBy("lang").count().as[(String, Long)]
      .collect().toMap == Map("en" -> 25L, "de" -> 25L))
  }

  test("budgetSelect admits a doc iff it fits entirely in the " +
    "remaining budget") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq((1L, "x", 50L), (2L, "x", 30L), (3L, "x", 20L))
      .toDF("doc_id", "lang", "n_chars")
    // Greedy order is n_chars DESC: 50, 30, 20 with exclusive sums
    // 0, 50, 80. Budget 100 fits all three (80+20 = 100 exactly);
    // budget 99 drops only the last.
    def ids(b: Long) = Pipeline.budgetSelect(docs, b, tieBucketWidth = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(ids(100L) == Set(1L, 2L, 3L))
    assert(ids(99L) == Set(1L, 2L))
    assert(ids(49L) == Set.empty[Long])
  }

  test("budgetSelect with a custom score column: admission ordered by " +
    "score DESC (doc_id tiebreak) while budgeting chars — score ties " +
    "across varying sizes take the boundary prefix-SUM path") {
    val spark = TestSpark.spark
    import spark.implicits._
    // en: doc2 (score 9) admits first; the score-5 tie group (docs
    // 1, 3, 4 — sizes 40, 25, 30) straddles the budget, so admission
    // within it is a per-doc char prefix in doc_id order — a rank
    // would admit the wrong docs here.
    val docs = Seq(
      (1L, "en", 40L, 5L), (2L, "en", 10L, 9L), (3L, "en", 25L, 5L),
      (4L, "en", 30L, 5L), (5L, "en", 15L, 2L), (6L, "de", 50L, 1L),
      (7L, "de", 60L, 3L)).toDF("doc_id", "lang", "n_chars", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    val naive = docs
      .withColumn("cum", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .filter(col("cum") + col("n_chars") <= 70L)
      .select("doc_id", "lang", "n_chars")
    // tieBucketWidth=2 spreads the tie group over several buckets.
    val out = Pipeline.budgetSelect(docs, 70L, tieBucketWidth = 2,
      scoreCol = "score")
    assert(out.orderBy("doc_id").collect().toSeq ==
      naive.orderBy("doc_id").collect().toSeq)
    assert(out.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 7L))
    // Exact-exhaustion edge (r7 review): budget consumed exactly by
    // prior groups, next score group led (in doc_id order) by a
    // ZERO-char doc — the naive window still admits it (cum + 0 ≤ B),
    // so the boundary classification must use s_before ≤ B, not <.
    val edge = Seq((1L, "x", 100L, 9L), (2L, "x", 0L, 5L),
      (3L, "x", 10L, 5L)).toDF("doc_id", "lang", "n_chars", "score")
    val edgeOut = Pipeline.budgetSelect(edge, 100L, scoreCol = "score")
      .select("doc_id").as[Long].collect().toSet
    val edgeNaive = edge
      .withColumn("cum", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .filter(col("cum") + col("n_chars") <= 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(edgeOut == edgeNaive && edgeOut == Set(1L, 2L))
  }

  test("budgetSelectDocs preserves every column and admits exactly " +
    "budgetSelect's doc set (boundary + full paths, no corpus shuffle " +
    "join)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val narrow = Pipeline.budgetSelect(docs, 20000L)
      .select("doc_id").as[Long].collect().toSet
    val wide = Pipeline.budgetSelectDocs(docs, 20000L)
    assert(wide.columns.toSeq == docs.columns.toSeq,
      "document-preserving variant must keep the input schema")
    assert(wide.select("doc_id").as[Long].collect().toSet == narrow)
    // Null-cost docs are never admitted (same exclusion as narrow).
    val withNull = docs.unionByName(
      docs.limit(3).withColumn("doc_id", col("doc_id") + 500000L)
        .withColumn("n_chars", lit(null: java.lang.Long)))
    assert(Pipeline.budgetSelectDocs(withNull, 20000L)
      .filter(col("doc_id") >= 500000L).count() == 0)
    // The corpus attaches via broadcast joins only — never a
    // corpus-wide shuffled join (the boundary id list is small enough
    // that AQE broadcasts it here; adversarial cases degrade to
    // shuffling boundary docs only, never the full corpus).
    wide.collect()
    val plan = wide.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for a join:\n$plan")
  }

  test("mixtureSample: min(1, weight) keep rate per source, " +
    "deterministic and repartition-stable, null sources form a pool") {
    val spark = TestSpark.spark
    import spark.implicits._
    // big: 900 chars of 1000 over 2 sources → weight 500/900 ≈ 0.5556
    // (sampled); small: weight 5.0 (passes whole, repetition factor
    // reported by mixWeights, not duplicated here).
    val docs = ((1L to 900L).map((_, "big", 1L)) ++
      (1001L to 1100L).map((_, "small", 1L)))
      .toDF("doc_id", "source", "n_chars")
    val kept = Pipeline.mixtureSample(docs)
      .select("doc_id", "source").as[(Long, String)].collect()
    val bigKept = kept.filter(_._2 == "big").map(_._1).toSet
    assert(kept.count(_._2 == "small") == 100,
      "weight ≥ 1 source must pass through whole")
    assert(bigKept.nonEmpty && bigKept.size < 900,
      s"downweighted source must actually sample (kept ${bigKept.size})")
    // ~55.6% target rate; the multiplicative hash is uniform enough
    // that 900 keys land well inside ±10 points.
    assert(math.abs(bigKept.size / 900.0 - 0.5556) < 0.1)
    // Deterministic + partitioning-independent (the rand() failure).
    val again = Pipeline.mixtureSample(docs.repartition(13))
      .filter(col("source") === "big")
      .select("doc_id").as[Long].collect().toSet
    assert(again == bigKept)
    // Null sources are their own pool, not dropped.
    val withNull = docs.withColumn("source",
      when(col("doc_id") % 10 === 0, null: String).otherwise(col("source")))
    assert(Pipeline.mixtureSample(withNull)
      .filter(col("source").isNull).count() > 0)
  }

  test("mixWeights: uniform-target weights are exact integer micros " +
    "of total/(n_src*source)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 60L), (2L, "a", 40L),        // a: 100 chars
      (3L, "b", 200L), (4L, "b", 100L))      // b: 300 chars
      .toDF("doc_id", "source", "n_chars")
    val out = Pipeline.mixWeights(docs)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // total 400, 2 sources → target 200/source: a upweights 2.0,
    // b downweights 2/3 (floored micros).
    assert(out.toSeq == Seq(("a", 2L, 100L, 2000000L),
      ("b", 2L, 300L, 666666L)))
  }

  test("bm25TopK ranks rare-term hits over common-term-only docs and " +
    "rewards shorter documents at equal tf") {
    val spark = TestSpark.spark
    import spark.implicits._
    val corpus = (Seq(
      (1L, "rare common alpha beta"),          // the one rare-term doc
      (2L, "common alpha beta gamma"),
      (3L, "common common alpha beta gamma delta eps zeta eta theta")
    ) ++ (4L to 10L).map(i => (i, "alpha beta gamma delta")))
      .toDF("doc_id", "text")
    val out = Pipeline.bm25TopK(corpus, Seq("rare", "common"), k = 10)
      .as[(Long, Long, Long)].collect()
    // Top hit is the rare-term doc (idf dominates).
    assert(out.head._1 == 1L, s"expected doc 1 on top, got ${out.head}")
    assert(out.head._2 == 2L, "doc 1 hits both query terms")
    // Among common-only docs, doc 2 (short) outranks doc 3 (long,
    // higher tf but length-normalized down: tf saturation + b-norm).
    val rank = out.map(_._1).toSeq
    assert(rank.indexOf(2L) >= 0 && rank.indexOf(3L) >= 0 &&
      rank.indexOf(2L) < rank.indexOf(3L),
      s"length normalization inverted: $rank")
    // Docs with no query term never appear.
    assert(!rank.contains(4L))
  }

  test("bucket streams are pairwise independent: composing sampling " +
    "with splitting keeps all three splits represented") {
    val spark = TestSpark.spark
    import spark.implicits._
    val keys = (0L until 20000L).toSeq.toDF("doc_id")
    def share(b: org.apache.spark.sql.Column): Double =
      keys.filter(b).count().toDouble / 20000
    // A 50% balance-stream selection must still hold ~80/10/10 under
    // the split stream. With ONE shared multiplier the subset
    // b_down < 500 was ENTIRELY train (b_split < 500 < 800) — val and
    // test vanished from every downsampled corpus.
    val sampled = keys
      .filter(Pipeline.balanceBucket(col("doc_id")) < 500)
      .withColumn("split",
        Pipeline.splitName(Pipeline.splitBucket(col("doc_id"))))
    val splits = sampled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = splits.values.sum.toDouble
    assert(splits.keySet == Set("train", "val", "test"),
      s"a split vanished under composition: $splits")
    assert(math.abs(splits("train") / n - 0.8) < 0.05 &&
      math.abs(splits("val") / n - 0.1) < 0.03,
      s"composition skewed the split shares: $splits")
    // Same independence for the mixture stream vs the split stream:
    // micro-rate 0.05% keeps ~10 of 20k keys; a correlated stream put
    // every one of them in train.
    val mix = keys
      .filter(Pipeline.hashBucket(col("doc_id"), 1000000L,
        Pipeline.SampleMult) < 200000)
      .withColumn("split",
        Pipeline.splitName(Pipeline.splitBucket(col("doc_id"))))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(mix.keySet == Set("train", "val", "test"),
      s"mixture-sampled subset lost a split: $mix")
  }

  test("gopherRules: each rule fires for exactly its crafted violator, " +
    "token-less docs keep a failing row, and the plan has no window") {
    val spark = TestSpark.spark
    import spark.implicits._
    Memo.clearCaches(spark)
    // One doc per rule violation + one clean pass. Tokens are chosen
    // so exactly the targeted flags flip (mean lengths computed in the
    // comments).
    val good = ((1 to 24).map(i => f"word$i%02d") ++ Seq("the", "and"))
      .mkString(" ") // 26 toks, distinct, len 6·24+3+3=150 ∈ [104, 260]
    // 7 toks < 20 (ok_ntok fails) but every other rule holds: len
    // 3+3+6+6+7+5+5 = 35 ≥ 28, top_tf 1 (5 ≤ 7), 7 distinct, 2 stops.
    val short = "the and alphas bravos charlie delta echos"
    val rep = (Seq("extra", "other") ++ Seq.fill(30)("spams") ++
      Seq("the", "and")).mkString(" ")
    // 34 toks, 4 distinct (40 < 102 → ok_rep fails), top_tf 30
    // (150 > 34 → ok_top fails); mean len 164/34 ≈ 4.8 keeps ok_wlen.
    val nostop = (1 to 25).map(i => f"token$i%02d").mkString(" ")
    val tiny = Seq((1L, good), (2L, short), (3L, rep), (4L, nostop),
      (5L, "")).toDF("doc_id", "text")
    val out = Pipeline.gopherRules(tiny)
    val rows = out.collect().map { r =>
      r.getLong(0) -> Seq("ok_ntok", "ok_wlen", "ok_stop", "ok_rep",
        "ok_top", "pass").map(c => r.getBoolean(r.fieldIndex(c)))
    }.toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L),
      "every doc — including the token-less one — must get a row")
    assert(rows(1L) == Seq(true, true, true, true, true, true))
    assert(rows(2L) == Seq(false, true, true, true, true, false))
    assert(rows(3L)(3) == false && rows(3L)(4) == false &&
      rows(3L)(1) == true && rows(3L)(5) == false,
      s"repetition doc must fail ok_rep+ok_top only: ${rows(3L)}")
    assert(rows(4L) == Seq(true, true, false, true, true, false))
    assert(rows(5L)(5) == false, "empty doc cannot pass")
    // Scale shape: one bounded aggregate — no window operator at all.
    val wins = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty, "gopherRules must not plan a window")
    Memo.clearCaches(spark)
  }

  test("retrievalMetrics: hand-computed metrics on an equal-length " +
    "corpus, zero-relevant guard, and rank pruning via WindowGroupLimit") {
    val spark = TestSpark.spark
    import spark.implicits._
    Memo.clearCaches(spark)
    // Five docs of EQUAL token count (dl = 8) so bm25 ranks purely by
    // tf: q-tf 4, 3, 2, 1, 0. With rel ⇔ tf ≥ 3 and k = 3:
    // n_rel = 2, top-3 = docs 1,2,3 → hits = 2, first_rel_rk = 1.
    def pad(id: Long, n: Int): String =
      (1 to n).map(i => s"f$id$i").mkString(" ")
    val tiny = Seq(
      (1L, "q q q q " + pad(1, 4)),
      (2L, "q q q " + pad(2, 5)),
      (3L, "q q " + pad(3, 6)),
      (4L, "q " + pad(4, 7)),
      (5L, pad(5, 8))).toDF("doc_id", "text")
    val out = Pipeline.retrievalMetrics(tiny, Seq("q", "zz"), k = 3,
      minTf = 3L)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSet == Set("q"),
      "absent terms (df = 0) must not fabricate rows")
    val r = rows.head
    assert(r.getLong(r.fieldIndex("n_rel")) == 2L)
    assert(r.getLong(r.fieldIndex("hits_at_k")) == 2L)
    assert(r.getLong(r.fieldIndex("first_rel_rk")) == 1L)
    assert(r.getLong(r.fieldIndex("precision_micro")) == 666666L)
    assert(r.getLong(r.fieldIndex("recall_micro")) == 1000000L)
    assert(r.getLong(r.fieldIndex("mrr_micro")) == 1000000L)
    // Zero-relevant term: minTf above every tf → recall/mrr 0, rank
    // null — the 'dup' path at the fixture, pinned here explicitly.
    val none = Pipeline.retrievalMetrics(tiny, Seq("q"), k = 3,
      minTf = 99L).collect().head
    assert(none.getLong(none.fieldIndex("n_rel")) == 0L)
    assert(none.isNullAt(none.fieldIndex("first_rel_rk")))
    assert(none.getLong(none.fieldIndex("recall_micro")) == 0L)
    assert(none.getLong(none.fieldIndex("mrr_micro")) == 0L)
    // The rk ≤ k filter must plan as WindowGroupLimit (per-partition
    // top-k pre-prune before the shuffle — the cosine_topk pattern),
    // not a full per-term sort.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must pre-prune via WindowGroupLimit:\n$plan")
    Memo.clearCaches(spark)
  }

  test("shardShuffle: banded two-stage rank ≡ plain per-shard window, " +
    "band count layout-invisible, positions dense 1-based") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (0L until 5000L).toDF("doc_id")
    val out = Pipeline.shardShuffle(docs, nShards = 8, nBands = 64)
    // The contract the oracle states: plain per-shard ROW_NUMBER over
    // the scrambled key. (Fine as a REFERENCE at test scale; the
    // operator exists because this window is a corpus/nShards-row
    // single task.)
    val k = Pipeline.hashBucket(col("doc_id"), 4294967296L,
      Pipeline.ShuffleMult)
    val ref = docs.select(col("doc_id"), k.as("k"))
      .withColumn("shard", col("k") % 8)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("k", "doc_id")).cast("long"))
      .select("doc_id", "shard", "pos")
    assert(out.exceptAll(ref).isEmpty && ref.exceptAll(out).isEmpty,
      "banded rank must equal the per-shard window rank")
    // The band knob is an execution detail, not a layout input.
    val oneBand = Pipeline.shardShuffle(docs, nShards = 8, nBands = 1)
    assert(out.exceptAll(oneBand).isEmpty,
      "nBands must be invisible in the output")
    // Dense 1..n positions per shard; hash-uniform shard sizes.
    val g = out.groupBy("shard").agg(count(lit(1)).as("n"),
      min("pos").as("mn"), max("pos").as("mx"))
      .as[(Long, Long, Long, Long)].collect()
    assert(g.length == 8)
    g.foreach { case (s, n, mn, mx) =>
      assert(mn == 1L && mx == n, s"shard $s positions not dense 1..$n")
    }
    val sizes = g.map(_._2)
    assert(sizes.min > 400 && sizes.max < 900,
      s"shard sizes far from uniform: ${sizes.toSeq}")
  }

  test("upsampleEpochs: per-doc copies = capped floor(weight) + the " +
    "deterministic fractional copy; reps contiguous; NULL-weight " +
    "source drops") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (
      (0 until 2).map(i => (i.toLong, "srcA", 100L)) ++
        (100 until 150).map(i => (i.toLong, "srcB", 100L)) ++
        (200 until 300).map(i => (i.toLong, "srcC", 400L)) ++
        (400 until 402).map(i => (i.toLong, "srcD", 0L))
      ).toDF("doc_id", "source", "n_chars")
    val out = Pipeline.upsampleEpochs(docs, maxEpochs = 4)
      .as[(Long, String, Long)].collect()
    // Hand-model mixWeights: tot=45200, 4 sources.
    // wA = 45200e6/(4·200)   = 56_500_000 → n_full 4 (capped), frac 0
    // wB = 45200e6/(4·5000)  =  2_260_000 → n_full 2, frac 260000
    // wC = 45200e6/(4·40000) =    282_500 → n_full 0, frac 282500
    // wD = NULL (zero chars) → dropped
    def frac(id: Long): Long =
      ((id * Pipeline.UpsampleMult) % 4294967296L) % 1000000L
    def expected(id: Long, src: String): Long = src match {
      case "srcA" => 4L
      case "srcB" => 2L + (if (frac(id) < 260000L) 1L else 0L)
      case "srcC" => if (frac(id) < 282500L) 1L else 0L
      case _ => 0L
    }
    val byDoc = out.groupBy(_._1)
    docs.as[(Long, String, Long)].collect().foreach { case (id, src, _) =>
      val reps = byDoc.getOrElse(id, Array.empty).map(_._3).sorted.toSeq
      val n = expected(id, src)
      assert(reps == (0L until n),
        s"doc $id ($src): reps $reps, expected 0 until $n")
    }
    // The fractional stream genuinely splits srcB (both 2- and 3-copy
    // docs exist) — otherwise the test proves only the caps.
    val bCounts = (100 until 150)
      .map(i => expected(i.toLong, "srcB")).toSet
    assert(bCounts == Set(2L, 3L), s"srcB fixture degenerate: $bCounts")
  }
}
