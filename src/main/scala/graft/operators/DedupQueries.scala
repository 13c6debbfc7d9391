package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM training-data pipeline — exact,
  * MinHash+LSH banding, n-gram Jaccard, and SimHash. All formulated for
  * scale: partitioned window for exact dedup (never a global sort),
  * inverted-index blocking with a document-frequency cap for pair
  * generation (never an all-pairs cross join), and LSH band-bucket joins
  * for candidate generation.
  */
object DedupQueries {

  import Tables.t
  import TextOps._

  /** Documents with their distinct 3-shingle sets (non-empty). Staged
    * through a materialized `toks` column: the shingle expression
    * references `toks` several times, which (a) keeps CollapseProject
    * from inlining the tokenizer and (b) means the regex normalization
    * runs once per row, not once per shingle (see TextOps.shinglesS).
    */
  private def docShingles(df: DataFrame): DataFrame = {
    // Spread the CPU-heavy tokenize across all cores before it runs: the
    // documents file scans as one partition, and AQE would coalesce a
    // column-only repartition of so few bytes right back — the explicit
    // partition count opts out of coalescing (the work is CPU-bound, not
    // byte-bound). Persisted because every consumer (inverted index ×2,
    // sizes, jaccard ×2) would otherwise recompute the interpreted
    // shingle expressions from the scan.
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(p, col("doc_id"))
      .withColumn("toks", expr(toksS))
      .withColumn("sh", expr(shinglesS("toks")))
      .select(col("doc_id"), col("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
  }

  /** Exact Jaccard over two shingle-set columns — integer set sizes
    * divided as doubles: deterministic and identical across engines.
    */
  private val jaccard: org.apache.spark.sql.Column =
    expr("cast(size(array_intersect(sha, shb)) as double) " +
      "/ size(array_union(sha, shb))")

  /** Shingle document-frequency cap: shingles occurring in more than this
    * many docs are dropped from the inverted index. Standard df-cut — at
    * 100 TB a stop-shingle would otherwise produce quadratic candidate
    * pairs in one reducer.
    */
  private val DfCap = 25

  /** Join shingle sets back onto candidate pairs and compute exact
    * Jaccard.
    */
  private def withJaccard(pairs: DataFrame, docs: DataFrame): DataFrame =
    pairs
      .join(docs.select(col("doc_id").as("da"), col("sh").as("sha")), "da")
      .join(docs.select(col("doc_id").as("db"), col("sh").as("shb")), "db")
      .select(col("da"), col("db"), jaccard.as("jaccard"))

  /** DuckDB mirror of blockedPairs + withJaccard. */
  private def pairsOracle(minJ: String): String =
    s"""WITH $docShinglesCteD,
       |inv AS (SELECT doc_id, unnest(sh) AS s FROM d),
       |rare AS (SELECT s FROM inv GROUP BY s HAVING COUNT(*) <= $DfCap),
       |pruned AS (SELECT doc_id, s FROM inv WHERE s IN (SELECT s FROM rare)),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM pruned a JOIN pruned b
       |    ON a.s = b.s AND a.doc_id < b.doc_id
       |), j AS (
       |  SELECT da, db,
       |         CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
       |           / len(list_distinct(x.sh || y.sh)) AS jaccard
       |  FROM pairs JOIN d x ON x.doc_id = da JOIN d y ON y.doc_id = db
       |)
       |SELECT da, db, jaccard FROM j WHERE jaccard >= $minJ
       |ORDER BY da, db""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // X1: exact dedup — deterministic survivor per key via partitioned
    // row_number (shuffles once on the key; no global sort; at 100 TB the
    // per-key groups stay small so no skew blow-up).
    QuerySpec("dedup_exact",
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (PARTITION BY lang, source
        |                            ORDER BY doc_id) AS rn
        |  FROM documents
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .drop("rn")
        .orderBy("doc_id")
    },

    // N-gram Jaccard near-dup: exact Jaccard over candidate pairs from
    // inverted-index blocking with a df cap, count-prefiltered. The
    // common-shingle count c from the inverted index gives an exact
    // integer lower bound: jaccard ≥ 3/10 ⟺ 13·c ≥ 3·(|a|+|b|), so the
    // expensive set-intersection runs only on pairs that can pass —
    // at 100 TB this is the difference between array ops on every
    // co-blocked pair and on true near-dup candidates only. The final
    // jaccard filter makes the prefilter output-preserving, so the
    // oracle needs no mirror of it.
    QuerySpec("ngram_jaccard", pairsOracle("0.3")) { (s, dir) =>
      val docs = docShingles(t(s, dir, "documents"))
      val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
      // Inverted index over hashed shingles: 8-byte join keys instead of
      // ~20-char strings. Output-preserving: a hash-collision-induced
      // candidate pair is removed by the exact-Jaccard verification, and
      // a true near-dup pair shares many shingles, so losing one bucket
      // to a (≈2^-64) collision cannot lose the pair.
      val inv = docs.select(col("doc_id"), explode(col("sh")).as("s"))
        .select(col("doc_id"), expr("xxhash64(s)").as("h"))
      val rare = inv.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") <= DfCap).select("h")
      val pruned = inv.join(rare, "h")
      val pairCounts = pruned.as("a").join(pruned.as("b"),
          col("a.h") === col("b.h") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("c"))
      val candidates = pairCounts
        .join(sizes.select(col("doc_id").as("da"), col("sz").as("sa")),
          "da")
        .join(sizes.select(col("doc_id").as("db"), col("sz").as("sb")),
          "db")
        .filter(col("c") * 13 >= (col("sa") + col("sb")) * 3)
        .select("da", "db")
      withJaccard(candidates, docs)
        .filter(col("jaccard") >= 0.3)
        .orderBy("da", "db")
    },

    // MinHash + LSH banding: 32 minhashes (xxhash64-seeded), 16 bands × 2
    // rows; candidate pairs = band-bucket collisions; candidates are then
    // VERIFIED with exact Jaccard ≥ 0.8 so the output is independent of
    // the hash function. Oracle: exhaustive blocked exact Jaccard ≥ 0.8
    // (for j ≥ 0.9 the 16×2 banding misses a pair with probability
    // (1 - j²)^16 < 1e-11, so LSH recall is exact on near-dup data).
    // At 100 TB the band-bucket join shuffles on (band, signature) — no
    // all-pairs stage anywhere.
    QuerySpec("minhash_lsh", pairsOracle("0.8")) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val docs = docShingles(t(s, dir, "documents"))
      // Band signatures via the native MinHashBands expression (codegen
      // tight loop). Earlier formulations — transform(bands, j ->
      // aggregate(sh, ...)) (re-scans sh per band: HOFs don't codegen
      // and single-reference aliases inline into lambdas) and a
      // struct-pair zip_with fold (allocates per shingle) — were 4–30×
      // slower and GC-noisy.
      val banded = docs
        .select(col("doc_id"), col("sh"),
          posexplode(expr(
            "minhash_bands16x2(transform(sh, s -> xxhash64(s)))")))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "sig")
        .drop("sh")
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      val docsK = docs
      withJaccard(cand, docsK)
        .filter(col("jaccard") >= 0.8)
        .orderBy("da", "db")
    },

    // SimHash fingerprints: portable 63-bit simhash built from a
    // polynomial token hash (fold of char codes mod 1e9+7) so the oracle
    // computes bit-identical fingerprints. Production would swap the
    // token hash for xxhash64 — the banding/fold structure is identical.
    // (simhash repartitions for the same single-file-scan reason as
    // docShingles.)
    QuerySpec("simhash",
      s"""SELECT doc_id,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_reverse(
         |    list_transform(
         |      list_reduce(list_prepend(
         |          list_transform(range(0, 63), i -> CAST(0 AS BIGINT)),
         |          list_transform(th, h ->
         |            list_transform(range(0, 63), i ->
         |              CASE WHEN ((h * (2 * i + 3) + i) % 1000000007) % 2
         |                     = 1 THEN CAST(1 AS BIGINT)
         |                   ELSE CAST(-1 AS BIGINT) END))),
         |        (acc, w) -> list_transform(range(1, 64),
         |                      i -> acc[i] + w[i])),
         |      s -> CASE WHEN s > 0 THEN CAST(1 AS BIGINT)
         |                ELSE CAST(0 AS BIGINT) END))),
         |    (a, b) -> a * 2 + b) AS simhash
         |FROM (
         |  SELECT doc_id, list_transform(toks, t ->
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(t, ''), c ->
         |        CAST(ascii(c) AS BIGINT))),
         |      (a, c) -> (a * 31 + c) % 1000000007)) AS th
         |  FROM (SELECT doc_id, $toksD AS toks FROM documents)
         |  WHERE len(toks) > 0
         |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      t(s, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("toks", expr(toksS))
        .filter(size(col("toks")) > 0)
        .withColumn("th", expr(
          """transform(toks, t ->
            |  aggregate(split(t, ''), 0L,
            |    (a, c) -> (a * 31 + ascii(c)) % 1000000007))""".stripMargin))
        // Native codegen bit fold (graft.functions.SimHash63) — same
        // integer math as the oracle, bit-identical; replaces an
        // interpreted zip_with accumulator that allocated a 63-element
        // array per token.
        .select(col("doc_id"), expr("simhash63(th)").as("simhash"))
        .orderBy("doc_id")
    }
  )
}
