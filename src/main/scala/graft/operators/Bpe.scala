package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine byte-pair-encoding (Sennrich et al. 2016) — the
  * tokenizer-aware counterpart of the whitespace token counts every
  * budget/packing operator uses (VERDICT r12 #6): real curation
  * decisions count MODEL tokens, and the model's tokenizer is a BPE
  * vocab trained on the corpus itself.
  *
  * Training is the classic vocabulary-table trick: the corpus
  * collapses ONCE to (word, freq) — vocabulary-sized, the memoized
  * [[Pipeline.docTerms]] pass — and all k merge rounds run over that
  * table, never the corpus. Each round is (1) adjacent-pair counts
  * weighted by word frequency — one vocabulary-sized shuffle of
  * (a, b, partial-count) rows, (2) a single-row argmax collect
  * (count DESC, then (a, b) lexicographic — the integer-exact
  * deterministic tie-break; collecting ONE row per round is the
  * bounded-collect contract), (3) the greedy left-to-right merge
  * applied per word by the codegen'd
  * [[graft.functions.BpeMergePass]]. `localCheckpoint` truncates the
  * per-round lineage (the bloom_pruned_join eager-materialization
  * precedent — k chained rounds would otherwise recompute round 1
  * k times); a production run on a real cluster checkpoints the
  * vocab table to reliable storage instead (the dedup
  * connected-components precedent, Dedup.scala).
  *
  * Determinism contract (the DuckDB oracle unrolls ALL k rounds as
  * CTEs — the semdedup_trained Lloyd-unroll precedent): pair counts
  * are exact integers; the argmax tie-break is total; merge
  * application is [[graft.functions.BpeMergePass]]'s single greedy
  * pass, which the oracle mirrors relationally. No RNG, no floats,
  * so any engine reproduces the same merge list bit-for-bit.
  *
  * Scale: (word, freq) is vocabulary-sized (~10⁷ rows at 100 TB —
  * MBs·avg-word-len), so rounds are cheap regardless of corpus size;
  * the corpus is touched exactly once (docTerms, shared with every
  * other retrieval/curation operator). Token counting joins docTerms
  * back to the trained word→piece-count map on `term` — both sides
  * already term-keyed; AQE broadcasts the map when it is small.
  */
object Bpe {

  /** One learned merge: rank (1-based), the pair, and its corpus
    * count at selection time.
    */
  final case class Merge(rk: Int, a: String, b: String, c: Long)

  /** The trained model: the ordered merge list (the vocab delta —
    * each merge mints exactly one new vocab symbol `a+b`) and the
    * final per-word symbol table (word, freq, syms).
    */
  final case class Model(merges: Seq[Merge], vocab: DataFrame)

  /** Train `k` merges over the corpus's word-frequency table.
    * Memoized per (session, cacheKey, k) — `bpe_vocab` and
    * `bpe_token_count` share one training run per corpus, the
    * docTerms/docFps memo discipline.
    */
  def train(docs: DataFrame, k: Int, cacheKey: String = ""): Model = {
    val spark = docs.sparkSession
    if (cacheKey.isEmpty) trainPlan(docs, k, cacheKey)
    else modelCache.synchronized(
      modelCache.getOrElseUpdate((spark, cacheKey, k),
        trainPlan(docs, k, cacheKey)))
  }

  private def trainPlan(docs: DataFrame, k: Int,
      cacheKey: String): Model = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // (word, freq): total corpus occurrences per distinct token.
    // split(word, '') = one element per code point, no empties —
    // parity-pinned against DuckDB's string_split (BpeSpec).
    // cacheKey flows through to docTerms so training SHARES the
    // per-corpus memoized table with every other consumer instead of
    // persisting a keyless duplicate.
    var vocab = Pipeline.docTerms(docs, cacheKey)
      .groupBy(col("term").as("word"))
      .agg(sum("tf").as("freq"))
      .withColumn("syms", expr("split(word, '')"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var dry = false
    while (r <= k && !dry) {
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) as a, " +
            "element_at(syms, i + 1) as b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) {
        // Adjacent pairs ran dry before k merges (every word is one
        // symbol): STOP and return the merges found so far — the
        // oracle's unrolled rounds mirror this exactly (an empty
        // argmax round leaves w_r = w_{r-1} via the LEFT JOIN and
        // contributes no merge row), so a degenerate corpus keeps
        // engine ≡ oracle instead of diverging require-vs-empty
        // (ADVICE r13).
        dry = true
      } else {
        val (a, b, c) =
          (best.head.getString(0), best.head.getString(1),
            best.head.getLong(2))
        // Tokens are norm_tokens output ([a-z0-9]+), so symbols embed
        // safely as SQL string literals; guard the assumption anyway.
        require((a + b).matches("[a-z0-9]+"),
          s"bpe symbol escaped the normalized charset: '$a'+'$b'")
        merges += Merge(r, a, b, c)
        vocab = vocab.withColumn("syms",
          expr(s"bpe_merge(syms, '$a', '$b')")).localCheckpoint()
        r += 1
      }
    }
    Model(merges.result(), vocab)
  }

  /** The merge list as a DataFrame — `bpe_vocab`'s result shape:
    * (rk, a, b, merged, c) in training order.
    */
  def mergesDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.merges.map(m => (m.rk, m.a, m.b, m.a + m.b, m.c))
      .toDF("rk", "a", "b", "merged", "c")
  }

  /** Per-document token counts under the trained vocab: whitespace
    * tokens (the engine's historical unit) next to BPE pieces (the
    * model-true unit budgets should use). One join of the memoized
    * docTerms table against the vocabulary-sized word→pieces map.
    */
  def tokenCounts(docs: DataFrame, model: Model,
      cacheKey: String = ""): DataFrame = {
    val pieces = model.vocab
      .select(col("word").as("term"), size(col("syms")).as("n_syms"))
    Pipeline.docTerms(docs, cacheKey)
      .join(pieces, "term")
      .groupBy("doc_id")
      .agg(sum("tf").cast("long").as("n_tokens_ws"),
        sum(col("tf") * col("n_syms")).cast("long").as("n_tokens_bpe"))
  }

  /** Session-scoped trained models (the ScaleQueries.zStoreCache
    * pattern — keyed storage, bounded by corpora-per-session).
    */
  private val modelCache = scala.collection.mutable.Map.empty[
    (SparkSession, String, Int), Model]
}
