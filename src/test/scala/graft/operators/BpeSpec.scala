package graft.operators

import graft.TestSpark
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE stack on the shapes the corpus-level oracle cannot
  * isolate: bpe_merge's greedy left-to-right overlap semantics (the
  * single definition the DuckDB gaps-and-islands formulation must
  * match), the deterministic argmax tie-break, and a hand-computed
  * end-to-end training + token-count run on a fixture corpus.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def merge(syms: Seq[String], a: String,
      b: String): Seq[String] = {
    GraftFunctions.register(spark)
    Seq(Tuple1(syms)).toDF("s")
      .select(expr(s"bpe_merge(s, '$a', '$b')")).head().getSeq[String](0)
  }

  test("bpe_merge: greedy left-to-right, overlap runs take even " +
    "offsets, no-match identity") {
    assert(merge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(merge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(merge(Seq("a", "b", "a", "b"), "a", "b") === Seq("ab", "ab"))
    assert(merge(Seq("x", "a", "a", "b", "y"), "a", "a") ===
      Seq("x", "aa", "b", "y"))
    assert(merge(Seq("b", "a"), "a", "b") === Seq("b", "a"))
    assert(merge(Seq("a"), "a", "a") === Seq("a"))
    assert(merge(Seq("a", "b"), "a", "b") === Seq("ab"))
    // Multi-char symbols from earlier rounds merge like any other.
    assert(merge(Seq("ab", "cd", "ab"), "ab", "cd") === Seq("abcd", "ab"))
    // A merged symbol never re-matches within the same pass: after
    // taking (a, ab) at the front, the fresh "aab" is not a left
    // operand for the match at the original positions 3-4.
    assert(merge(Seq("a", "ab", "ab"), "a", "ab") === Seq("aab", "ab"))
  }

  test("train: hand-computed merges, counts, and tie-break on a " +
    "fixture corpus") {
    // Words: "aa"×2, "ab"×1, "ba"×1, "ca"×1.
    // Round 1 pairs: (a,a)→2, (a,b)→1, (b,a)→1, (c,a)→1 → (a,a).
    // Round 2: "aa"→[aa] gone from pairs; (a,b)/(b,a)/(c,a) tie at 1
    // → lexicographic min (a,b).
    // Round 3: (b,a) vs (c,a) tie → (b,a).
    val docs = Seq(
      (1L, "aa ab"),
      (2L, "aa ba"),
      (3L, "ca")
    ).toDF("doc_id", "text")
    val m = Bpe.train(docs, k = 3)
    assert(m.merges.map(x => (x.rk, x.a, x.b, x.c)) === Seq(
      (1, "a", "a", 2L), (2, "a", "b", 1L), (3, "b", "a", 1L)))
    val vocab = m.vocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(vocab === Map(
      "aa" -> Seq("aa"), "ab" -> Seq("ab"), "ba" -> Seq("ba"),
      "ca" -> Seq("c", "a")))
    // Token counts: doc 1 = aa(1) + ab(1) pieces = 2; doc 3: ca = 2.
    val counts = Bpe.tokenCounts(docs, m).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(counts === Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 1L, 2L)))
  }

  test("train stops early when adjacent pairs run dry and returns the " +
    "merges found so far (engine ≡ oracle on degenerate corpora)") {
    // All single-char words: zero mergeable pairs at round 1.
    val single = Seq((1L, "a b c"), (2L, "b c")).toDF("doc_id", "text")
    val m0 = Bpe.train(single, k = 3)
    assert(m0.merges.isEmpty)
    assert(m0.vocab.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toSeq ===
      Seq("a" -> Seq("a"), "b" -> Seq("b"), "c" -> Seq("c")))
    // Dries after one merge: "ab" collapses to one symbol, round 2 has
    // no pairs left — k = 3 yields exactly 1 merge, vocab intact.
    val one = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m1 = Bpe.train(one, k = 3)
    assert(m1.merges.map(x => (x.rk, x.a, x.b, x.c)) ===
      Seq((1, "a", "b", 2L)))
    val counts = Bpe.tokenCounts(one, m1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(counts === Seq((1L, 2L, 2L)))
  }

  test("trainBatched: m=4 reproduces the sequential merge list in ONE " +
    "driver round on a disjoint-top-pairs corpus (the k/m bound)") {
    // Four pairwise-disjoint top pairs with strictly ordered counts:
    // (a,b)×8, (c,d)×4, (e,f)×2, (g,h)×1. Sequential learns them in 4
    // rounds; each merge collapses its 2-char word to one symbol, so
    // no mint ever creates a competing pair — batched ≡ sequential by
    // construction, in a single batch.
    val docs = Seq(
      (1L, "ab ab ab ab ab ab ab ab cd cd"),
      (2L, "cd cd ef ef gh")
    ).toDF("doc_id", "text")
    val seq4 = Bpe.train(docs, k = 4)
    val (bat4, rounds) = Bpe.trainBatched(docs, k = 4, m = 4)
    assert(rounds === 1)
    assert(bat4.merges === seq4.merges)
    assert(bat4.merges.map(x => (x.rk, x.a, x.b, x.c)) === Seq(
      (1, "a", "b", 8L), (2, "c", "d", 4L), (3, "e", "f", 2L),
      (4, "g", "h", 1L)))
    val sv = seq4.vocab.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toSeq
    val bv = bat4.vocab.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toSeq
    assert(bv === sv)
  }

  test("trainBatched: overlapping candidates defer to later rounds and " +
    "still reproduce the sequential list (shared-symbol guard)") {
    // BpeSpec's hand-computed corpus: round-1 candidates (a,a)→2,
    // (a,b)→1, (b,a)→1, (c,a)→1 ALL share 'a' — the guard admits only
    // the argmax per round, so batching degrades to sequential (3
    // rounds) instead of corrupting counts.
    val docs = Seq(
      (1L, "aa ab"), (2L, "aa ba"), (3L, "ca")
    ).toDF("doc_id", "text")
    val (bat, rounds) = Bpe.trainBatched(docs, k = 3, m = 4)
    assert(rounds === 3)
    assert(bat.merges.map(x => (x.rk, x.a, x.b, x.c)) === Seq(
      (1, "a", "a", 2L), (2, "a", "b", 1L), (3, "b", "a", 1L)))
    assert(bat.merges === Bpe.train(docs, k = 3).merges)
  }

  test("trainBatched: m=4 reproduces the sequential list on the " +
    "sf0.001 documents corpus up to the documented mint-pair limit") {
    val docs = graft.Tables.t(TestSpark.spark, "/root/testdata/sf0.001",
      "documents")
    // k=7: every sequential argmax through round 7 is a batch-start
    // pair — m=4 batching reproduces the list in 2 rounds instead
    // of 7.
    val seq7 = Bpe.train(docs, k = 7)
    val (bat7, rounds7) = Bpe.trainBatched(docs, k = 7, m = 4)
    assert(bat7.merges === seq7.merges,
      s"batched diverged within 7 merges after $rounds7 rounds")
    assert(rounds7 < 7, s"batching bought nothing: $rounds7 rounds")
    // k=8 names the HONEST LIMIT the scaladoc documents: sequential
    // round 8 picks (p, ar) — a pair of round 7's MINT, invisible to
    // batch-start counts — so batched diverges exactly there.
    val seq8 = Bpe.train(docs, k = 8)
    assert(seq8.merges(7).b === "ar",
      "fixture drift: merge 8 no longer selects the round-7 mint")
    val (bat8, _) = Bpe.trainBatched(docs, k = 8, m = 4)
    assert(bat8.merges.take(7) === seq8.merges.take(7))
    assert(bat8.merges(7) !== seq8.merges(7),
      "mint-pair divergence expected at merge 8 — if batching now " +
        "sees mint pairs, strengthen the equivalence contract")
  }

  test("train memoizes per (session, cacheKey, k) and stays " +
    "deterministic across repeat runs") {
    val docs = Seq((1L, "xy xy yz")).toDF("doc_id", "text")
    val m1 = Bpe.train(docs, k = 2, cacheKey = "bpe-spec")
    val m2 = Bpe.train(docs, k = 2, cacheKey = "bpe-spec")
    assert(m1 eq m2)
    val m3 = Bpe.train(docs, k = 2)
    assert(m3.merges === m1.merges)
  }
}
