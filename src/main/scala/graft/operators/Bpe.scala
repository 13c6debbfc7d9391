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

  /** The initial (word, freq, syms) vocabulary table — shared by the
    * sequential and batched trainers. cacheKey flows through to
    * docTerms so training SHARES the per-corpus memoized table with
    * every other consumer instead of persisting a keyless duplicate.
    * split(word, '') = one element per code point, no empties —
    * parity-pinned against DuckDB's string_split (BpeSpec).
    */
  private def initialVocab(docs: DataFrame,
      cacheKey: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    Pipeline.docTerms(docs, cacheKey)
      .groupBy(col("term").as("word"))
      .agg(sum("tf").as("freq"))
      .withColumn("syms", expr("split(word, '')"))
      .localCheckpoint()
  }

  /** Adjacent-pair counts over the current vocab, ranked by the total
    * tie-break (count DESC, then (a, b)) — the shared argmax plan of
    * both trainers; one vocabulary-sized shuffle.
    */
  private def rankedPairs(vocab: DataFrame): DataFrame = vocab
    .filter(size(col("syms")) >= 2)
    .select(col("freq"), explode(expr(
      "transform(sequence(1, size(syms) - 1), i -> " +
        "struct(element_at(syms, i) as a, " +
        "element_at(syms, i + 1) as b))")).as("p"))
    .groupBy(col("p.a").as("a"), col("p.b").as("b"))
    .agg(sum("freq").as("c"))
    .orderBy(col("c").desc, col("a"), col("b"))

  private def trainPlan(docs: DataFrame, k: Int,
      cacheKey: String): Model = {
    var vocab = initialVocab(docs, cacheKey)
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var dry = false
    while (r <= k && !dry) {
      val best = rankedPairs(vocab).limit(1).collect()
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

  /** Batched training — the k=32k scale path (VERDICT r13 #3):
    * [[train]] runs ONE Spark round (pair-count job + single-row
    * collect) per merge, which is correct and bounded at the declared
    * k=8 but means 32k sequential driver rounds for a real vocab. This
    * mode selects up to `m` merges per round from one ranked pair-count
    * job — greedily, in the same total order, deferring a candidate
    * (a, b) to the next round iff an already-selected (aᵢ, bᵢ → mintᵢ)
    * can perturb its occurrences: `a = bᵢ` (the candidate's head can be
    * consumed as merge i's trailing symbol — "aᵢ bᵢ b" destroys one),
    * `b = aᵢ` (tail consumed as merge i's leading — "a aᵢ bᵢ"), or
    * either operand equals mintᵢ (pairs touching the fresh mint have
    * no batch-start count). Sharing a HEAD (a = aᵢ) or a TAIL (b = bᵢ)
    * is provably safe — "o r" cannot lose its r to an (e, r) merge,
    * since that r is preceded by o, not e — which is what lets natural
    * text batch at all (top pairs share frequent letters constantly).
    * The batch applies as `m` nested [[graft.functions.BpeMergePass]]
    * calls in ONE projection pass over the vocabulary table.
    *
    * Round-count bound: the first-ranked candidate is always selected,
    * so every round learns ≥ 1 and ≤ m merges — between ⌈k/m⌉ and k
    * driver rounds (k/m when the top-m are pairwise disjoint, the
    * common case on natural text where top pairs come from different
    * words).
    *
    * Equivalence contract (honest limit): symbol-disjointness makes
    * every selected pair's count invariant under the batch's earlier
    * merges (merging (a1,b1) only perturbs pairs touching a1, b1, or
    * the mint, and creates no new (aj,bj) adjacency), so WHEN the
    * sequential trainer's next m argmaxes are exactly these pairs,
    * batched ≡ sequential — merge list, counts, and final vocab
    * bit-for-bit (BpeSpec pins a corpus where m=4 reproduces the
    * sequential list in one round). It can diverge when a mid-batch
    * mint creates a NEW pair whose count overtakes a later selection
    * (sequential would pick the new pair; batched cannot see it until
    * the next round) — the standard batched-BPE approximation, traded
    * for the k/m round count.
    *
    * `candCap` bounds the driver-side candidate collect (the bounded-
    * collect contract): scanning more rows only helps find disjoint
    * pairs, never changes which pair ranks first.
    *
    * Returns the model plus the number of driver rounds actually run.
    */
  def trainBatched(docs: DataFrame, k: Int, m: Int,
      cacheKey: String = ""): (Model, Int) = {
    require(m >= 1, s"batch size must be >= 1, got $m")
    if (cacheKey.isEmpty) trainBatchedPlan(docs, k, m, cacheKey)
    else batchedCache.synchronized(
      batchedCache.getOrElseUpdate((docs.sparkSession, cacheKey, k, m),
        trainBatchedPlan(docs, k, m, cacheKey)))
  }

  private def trainBatchedPlan(docs: DataFrame, k: Int, m: Int,
      cacheKey: String): (Model, Int) = {
    val candCap = math.max(16, 8 * m)
    var vocab = initialVocab(docs, cacheKey)
    val merges = Seq.newBuilder[Merge]
    var learned = 0
    var rounds = 0
    var dry = false
    while (learned < k && !dry) {
      val cands = rankedPairs(vocab).limit(candCap).collect()
      if (cands.isEmpty) dry = true
      else {
        rounds += 1
        val picked = Seq.newBuilder[(String, String, Long)]
        // Conflict sets per the scaladoc's invariance rule.
        val heads = scala.collection.mutable.Set.empty[String]
        val tails = scala.collection.mutable.Set.empty[String]
        val mints = scala.collection.mutable.Set.empty[String]
        var i = 0
        var n = 0
        while (i < cands.length && n < math.min(m, k - learned)) {
          val (a, b, c) = (cands(i).getString(0), cands(i).getString(1),
            cands(i).getLong(2))
          val mint = a + b
          if (!tails(a) && !heads(b) && !mints(a) && !mints(b)) {
            require(mint.matches("[a-z0-9]+"),
              s"bpe symbol escaped the normalized charset: '$a'+'$b'")
            picked += ((a, b, c))
            heads += a; tails += b; mints += mint
            n += 1
          }
          i += 1
        }
        val batch = picked.result()
        batch.foreach { case (a, b, c) =>
          learned += 1
          merges += Merge(learned, a, b, c)
        }
        // One projection pass applies the whole batch: nested
        // bpe_merge calls, selection order innermost — order is
        // immaterial under the disjointness guard, but matching the
        // selection order keeps the plan readable.
        val applied = batch.foldLeft("syms") { case (e, (a, b, _)) =>
          s"bpe_merge($e, '$a', '$b')"
        }
        vocab = vocab.withColumn("syms", expr(applied)).localCheckpoint()
      }
    }
    (Model(merges.result(), vocab), rounds)
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

  /** [[trainBatched]]'s memo — same discipline, keyed by (k, m) too
    * so the batched and sequential trainers never share an entry
    * (their models can legitimately differ outside the equivalence
    * regime).
    */
  private val batchedCache = scala.collection.mutable.Map.empty[
    (SparkSession, String, Int, Int), (Model, Int)]
}
