package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public deduplication API over a corpus DataFrame — the operators a
  * training-data pipeline calls directly (the declared oracle queries in
  * DedupQueries are thin wrappers over these).
  *
  * Scale design: inverted-index blocking with a document-frequency cap
  * (never all-pairs), integer count-prefilters ahead of array work, LSH
  * band-bucket joins for candidates, exact-Jaccard verification so
  * outputs are hash-independent.
  */
object Dedup {

  import TextOps._

  /** Shingles occurring in more docs than this are dropped from the
    * inverted index (stop-shingle df-cut; a hot shingle otherwise
    * produces quadratic candidates in one reducer at scale).
    */
  val DfCap = 25

  private val shingleCache =
    mutable.Map.empty[(org.apache.spark.sql.SparkSession, String),
      DataFrame]

  /** (doc_id, sh) with non-empty distinct 3-word shingle sets, computed
    * once per (session, cache key): tokenization is CPU-bound and every
    * dedup operator consumes the same sets. See TextOps.shinglesS for the
    * HOF eval-cost rules this obeys.
    */
  def docShingles(df: DataFrame, cacheKey: String = ""): DataFrame =
    synchronized {
      val k = (df.sparkSession, cacheKey)
      if (cacheKey.nonEmpty && shingleCache.contains(k)) shingleCache(k)
      else {
        graft.functions.GraftFunctions.register(df.sparkSession)
        val p = df.sparkSession.sparkContext.defaultParallelism
        val out = df.repartition(p, col("doc_id"))
          .withColumn("toks", expr(toksS))
          // Native single-pass shingling (graft.functions.Shingles3) —
          // same output as the HOF chain shinglesS, ~no interpreted
          // lambdas or slice copies (ShinglesSpec asserts equality).
          .withColumn("sh", expr("shingles3(toks)"))
          .select(col("doc_id"), col("sh"))
          .filter(size(col("sh")) > 0)
          .persist()
        if (cacheKey.nonEmpty) shingleCache(k) = out
        out
      }
    }

  /** Deterministic exact dedup: keep the lowest-ordered row per key. */
  def exactDedup(df: DataFrame, keys: Seq[String],
      tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact Jaccard over shingle-set columns `sha`/`shb` (distinct-set
    * semantics; ints divided as doubles — deterministic).
    */
  val jaccard: Column =
    expr("cast(size(array_intersect(sha, shb)) as double) " +
      "/ size(array_union(sha, shb))")

  /** Attach exact Jaccard to candidate (da, db) pairs. */
  def withJaccard(pairs: DataFrame, docs: DataFrame): DataFrame =
    pairs
      .join(docs.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
      .join(docs.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
      .select(col("da"), col("db"), jaccard.as("jaccard"))

  /** Near-dup pairs with exact Jaccard ≥ p/q, candidates from the
    * hashed inverted index with df cap and the exact integer
    * count-prefilter c·(q+p) ≥ p·(|a|+|b|).
    *
    * Pair generation: group the index by shingle, collect the (≤ DfCap)
    * sorted doc ids, and expand combinations locally — one shuffle on
    * the shingle hash and one on the pair, instead of a df-filter join
    * plus a self-join that reshuffles the index twice. The df cap is
    * what bounds the per-group expansion to DfCap²/2.
    */
  def nearDupPairs(docs: DataFrame, p: Int, q: Int): DataFrame = {
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
    val inv = docs.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), expr("xxhash64(s)").as("h"))
    val grouped = inv.groupBy("h")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, DfCap))
    val pairCounts = grouped
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |    y -> named_struct('da', x, 'db', y))))""".stripMargin))
        .as("pr"))
      .groupBy(col("pr.da").as("da"), col("pr.db").as("db"))
      .agg(count(lit(1)).as("c"))
    val candidates = pairCounts
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
      .filter(col("c") * (q + p) >= (col("sa") + col("sb")) * p)
      .select("da", "db")
    withJaccard(candidates, docs)
      .filter(col("jaccard") >= lit(p.toDouble) / q)
  }

  /** MinHash-LSH verified near-dup pairs: band-bucket candidates
    * (native MinHashBands expression, 16 bands × 2 rows) verified with
    * exact Jaccard ≥ p/q — output independent of the banding hash.
    */
  def minhashNearDupPairs(docs: DataFrame, p: Int, q: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val b = banded(docs)
    val cand = b.as("a").join(b.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    withJaccard(cand, docs)
      .filter(col("jaccard") >= lit(p.toDouble) / q)
  }

  /** Banded (doc_id, band, sig) signatures for LSH candidate joins. */
  private def banded(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("sh"),
        posexplode(expr(
          "minhash_bands16x2(transform(sh, s -> xxhash64(s)))")))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "sig")
      .drop("sh")

  /** Incremental near-dup detection — the production dedup shape: a new
    * batch checked against the EXISTING corpus (never corpus×corpus).
    * The incoming side is banded and broadcast (a day's intake vs a
    * 100 TB corpus whose band signatures are precomputed and, at scale,
    * bucketed by (band, sig) so the probe reads only matching buckets);
    * candidates are verified with exact Jaccard as always, so the output
    * is independent of the banding hash.
    *
    * Input frames are (doc_id, sh) as produced by docShingles. Output:
    * (new_id, corpus_id, jaccard) with jaccard ≥ p/q.
    */
  def incrementalNearDupPairs(corpus: DataFrame, incoming: DataFrame,
      p: Int, q: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val nb = banded(incoming)
      .withColumnRenamed("doc_id", "new_id")
    val cand = banded(corpus).join(broadcast(nb), Seq("band", "sig"))
      .select(col("new_id"), col("doc_id").as("corpus_id"))
      .distinct()
    cand
      .join(incoming.select(col("doc_id").as("new_id"),
        col("sh").as("sha")), "new_id")
      .join(corpus.select(col("doc_id").as("corpus_id"),
        col("sh").as("shb")), "corpus_id")
      .select(col("new_id"), col("corpus_id"), jaccard.as("jaccard"))
      .filter(col("jaccard") >= lit(p.toDouble) / q)
  }

  /** Connected components over a near-dup pair graph — the step that
    * turns pairs into a dedup decision: every doc in a component maps to
    * the component's minimum doc_id (the canonical representative; rows
    * with doc_id == cluster_id are the keepers).
    *
    * Pregel-style min-label propagation with path compression: each
    * iteration takes the per-node min over neighbor labels (one hop),
    * then shortcuts every label to its label's label (pointer jumping),
    * so convergence is O(log diameter), not O(diameter). The driver only
    * checks a convergence flag; the data never leaves the cluster.
    */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // Iterative lineage discipline: every iteration ends in an EAGER
    // localCheckpoint, which truncates the plan to the materialized
    // rows. Plain persist chains are a trap here — unpersisting an old
    // iteration CASCADE-invalidates every cached plan built on it, so
    // later actions silently recompute the entire iteration history
    // (measured 10× blowup). In production, swap localCheckpoint
    // (executor-storage) for reliable checkpointing.
    val edges = pairs.select(col("da").as("a"), col("db").as("b"))
      .union(pairs.select(col("db").as("a"), col("da").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "b")
          .withColumnRenamed("lbl", "nlbl"), "b")
        .select(col("a").as("id"), col("nlbl").as("lbl"))
      // hop feeds both sides of the compression self-join; inlined (not
      // checkpointed) on purpose — the propagate stage computes twice
      // inside the ONE checkpoint job below, which is cheaper than a
      // second eager materialization job per iteration.
      val hop = labels.select(col("id"), col("lbl"))
        .union(viaEdges)
        .groupBy("id").agg(min(col("lbl")).as("lbl"))
      // Path compression: follow the label pointer one step (labels are
      // always node ids, so the self-join matches) — halves the
      // remaining distance to the component minimum each iteration.
      val next = hop
        .join(hop.select(col("id").as("lbl"), col("lbl").as("lbl2")),
          "lbl")
        .select(col("id"), least(col("lbl"), col("lbl2")).as("lbl"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("lbl", "old"), "id")
        .filter(col("lbl") < col("old")).isEmpty
      labels = next
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Portable 63-bit SimHash fingerprints per doc (native SimHash63
    * expression over polynomial token hashes — bit-stable across
    * engines; swap the token hash for xxhash64 in production where
    * cross-engine parity is not required).
    */
  def simhashFingerprints(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.repartition(col("doc_id"))
      .withColumn("toks", expr(toksS))
      .filter(size(col("toks")) > 0)
      .withColumn("th", expr(
        """transform(toks, t ->
          |  aggregate(split(t, ''), 0L,
          |    (a, c) -> (a * 31 + ascii(c)) % 1000000007))""".stripMargin))
      .select(col("doc_id"), expr("simhash63(th)").as("simhash"))
  }
}
