package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline (north-star
  * extension surface): normalization, token statistics, token frequency,
  * n-gram language-ID heuristic, quality scoring, BPE-ish token counting,
  * and winnowing-style document fingerprinting. All built-in codegen'd
  * expressions (higher-order functions) — no UDFs — so the plans stay
  * inside WholeStageCodegen and scale linearly with input.
  */
object TextQueries {

  import Tables.t
  import TextOps._

  val all: Seq[QuerySpec] = Seq(

    // X2: normalize + hash. md5 is identical across engines, so the whole
    // normalization chain is hash-checked without shipping long strings.
    QuerySpec("text_normalize",
      s"""SELECT doc_id, md5($normD) AS norm_hash,
         |       CAST(len($toksD) AS INTEGER) AS n_tokens
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        expr(s"md5($normS)").as("norm_hash"),
        expr(s"size($toksS)").as("n_tokens"))
        .orderBy("doc_id")
    },

    // X4: per-document token/char statistics.
    QuerySpec("token_stats",
      s"""SELECT doc_id,
         |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
         |       CAST(len($toksD) AS INTEGER) AS n_tokens,
         |       CAST(length(text) AS INTEGER) AS n_chars_actual
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        expr("size(split(text, ' '))").as("n_ws_tokens"),
        expr(s"size($toksS)").as("n_tokens"),
        length(col("text")).as("n_chars_actual"))
        .orderBy("doc_id")
    },

    // X4: corpus-level token frequency: per-term sums over the memoized
    // (doc_id, term, tf) table (Pipeline.docTerms — one tokenize pass
    // per session shared with tfidf_topk), then top-k. sum(tf) over
    // docs ≡ count of raw token occurrences, so the oracle is the plain
    // unnest formulation. The explode_outer/staged-Project/repartition
    // rules this depends on live in docTerms' scaladoc.
    QuerySpec("token_freq",
      s"""SELECT token, COUNT(*) AS cnt
         |FROM (SELECT unnest($toksD) AS token FROM documents)
         |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin) {
      (s, dir) =>
        Pipeline.docTerms(t(s, dir, "documents"), cacheKey = dir)
          .groupBy("term").agg(sum(col("tf")).as("cnt"))
          .select(col("term").as("token"), col("cnt"))
          .orderBy(col("cnt").desc, col("token"))
          .limit(100)
    },

    // Language-ID: stopword-overlap heuristic with a deterministic
    // tie-break chain (en > de > es > fr, else 'und').
    QuerySpec("lang_id",
      s"""SELECT doc_id, n_en, n_de, n_es, n_fr,
         |  ${TextOps.predLangCase} AS pred_lang
         |FROM (
         |  SELECT doc_id,
         |    CAST(${langHitsD(stopEn)} AS INTEGER) AS n_en,
         |    CAST(${langHitsD(stopDe)} AS INTEGER) AS n_de,
         |    CAST(${langHitsD(stopEs)} AS INTEGER) AS n_es,
         |    CAST(${langHitsD(stopFr)} AS INTEGER) AS n_fr
         |  FROM (SELECT doc_id, $toksD AS toks FROM documents)
         |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", expr(toksS))
        .select(
          col("doc_id"),
          expr(langHitsS(stopEn)).as("n_en"),
          expr(langHitsS(stopDe)).as("n_de"),
          expr(langHitsS(stopEs)).as("n_es"),
          expr(langHitsS(stopFr)).as("n_fr"))
        .withColumn("pred_lang", expr(TextOps.predLangCase))
        .orderBy("doc_id")
    },

    // Label-vs-heuristic confusion matrix over lang_id's predictor —
    // the calibration table read before trusting the heuristic as a
    // filter (which true languages it mislabels, and as what). Same
    // per-row stopword-hit expressions, then one |langs|²-bounded
    // aggregate; the corpus never shuffles before the counts.
    QuerySpec("lang_confusion",
      s"""SELECT lang, pred_lang, COUNT(*) AS n FROM (
         |  SELECT lang,
         |    ${TextOps.predLangCase} AS pred_lang
         |  FROM (
         |    SELECT lang,
         |      ${langHitsD(stopEn)} AS n_en,
         |      ${langHitsD(stopDe)} AS n_de,
         |      ${langHitsD(stopEs)} AS n_es,
         |      ${langHitsD(stopFr)} AS n_fr
         |    FROM (SELECT lang, $toksD AS toks FROM documents)))
         |GROUP BY lang, pred_lang
         |ORDER BY lang NULLS FIRST, pred_lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", expr(toksS))
        .select(
          col("lang"),
          expr(langHitsS(stopEn)).as("n_en"),
          expr(langHitsS(stopDe)).as("n_de"),
          expr(langHitsS(stopEs)).as("n_es"),
          expr(langHitsS(stopFr)).as("n_fr"))
        .withColumn("pred_lang", expr(TextOps.predLangCase))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },

    // Quality scoring: length / stopword-density / token-shape features
    // combined into one deterministic per-row double score.
    QuerySpec("quality_score",
      s"""SELECT doc_id, n_tokens, avg_token_len, stop_ratio,
         |       CAST(round((0.5 * stop_ratio
         |         + 0.3 * least(n_tokens / 100.0, 1.0)
         |         + 0.2 * least(avg_token_len / 8.0, 1.0)) * 1000000)
         |         AS BIGINT) AS score_micro
         |FROM (
         |  SELECT doc_id,
         |    CAST(len(toks) AS INTEGER) AS n_tokens,
         |    CAST(list_reduce(list_prepend(0, list_transform(toks,
         |      x -> length(x))), (a, b) -> a + b) AS DOUBLE)
         |      / greatest(len(toks), 1) AS avg_token_len,
         |    CAST(len(list_filter(toks, x -> list_contains(
         |      ${arrD(stopEn)}, x))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS stop_ratio
         |  FROM (SELECT doc_id, $toksD AS toks FROM documents)
         |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // Memoized quality table (Pipeline.docQuality) — one tokenize
      // pass per session shared with token_budget_score. The micro
      // quantization lives there: the raw weighted sum is
      // FMA-sensitive (DuckDB fuses a*b+c, Spark doesn't → 1-ulp skew).
      Pipeline.docQuality(t(s, dir, "documents"), cacheKey = dir)
        .select("doc_id", "n_tokens", "avg_token_len", "stop_ratio",
          "score_micro")
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens + a BPE-ish regex tokenizer
    // (letter runs | digit runs | single punctuation).
    QuerySpec("token_count",
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws,
        |       CAST(len(regexp_extract_all(lower(text),
        |         '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        expr("size(split(text, ' '))").as("n_ws"),
        expr("size(regexp_extract_all(lower(text), " +
          "'[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").as("n_bpe"))
        .orderBy("doc_id")
    },

    // Intra-document repetition: distinct-token ratio — the boilerplate/
    // spam signal (low ratio = heavy repetition). Exact integer counts,
    // one float division.
    QuerySpec("repetition_stats",
      s"""SELECT doc_id,
         |       CAST(len(toks) AS INTEGER) AS n_tokens,
         |       CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
         |       CAST(len(list_distinct(toks)) AS DOUBLE)
         |         / greatest(len(toks), 1) AS distinct_ratio
         |FROM (SELECT doc_id, $toksD AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("toks", expr(toksS))
        .select(
          col("doc_id"),
          expr("size(toks)").as("n_tokens"),
          expr("size(array_distinct(toks))").as("n_distinct"),
          expr("cast(size(array_distinct(toks)) as double) " +
            "/ greatest(size(toks), 1)").as("distinct_ratio"))
        .orderBy("doc_id")
    },

    // Document chunking: overlapping 50-token windows with stride 40 —
    // the LLM-ingest reshape (one row per chunk). Chunk content is
    // hash-checked (md5 of the joined tokens) instead of shipping long
    // strings through the comparator.
    QuerySpec("doc_chunk",
      s"""SELECT doc_id, CAST(i AS INTEGER) AS chunk_id,
         |       CAST(len(toks[i*40+1 : i*40+50]) AS INTEGER) AS n_tokens,
         |       md5(array_to_string(toks[i*40+1 : i*40+50], ' '))
         |         AS chunk_hash
         |FROM (SELECT doc_id, $toksD AS toks FROM documents),
         |     unnest(range(0, greatest(CAST(ceil(len(toks) / 40.0)
         |                                   AS INTEGER), 1))) t(i)
         |WHERE len(toks) > 0
         |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("toks", expr(toksS))
        .filter(expr("size(toks) > 0"))
        // Chunk structs staged in a Project, exploded as an attribute
        // (outer + post-filter: see token_freq's InferFiltersFromGenerate
        // note — a plain explode re-evaluates this whole expression as an
        // inferred pre-filter).
        .withColumn("chunks", expr(
          """transform(sequence(0, cast(ceil(size(toks) / 40.0) as int) - 1),
            |  i -> named_struct(
            |    'chunk_id', cast(i as int),
            |    'n_tokens', size(slice(toks, i * 40 + 1, 50)),
            |    'chunk_hash', md5(concat_ws(' ',
            |        slice(toks, i * 40 + 1, 50)))))""".stripMargin))
        .select(col("doc_id"), explode_outer(col("chunks")).as("c"))
        .filter(col("c").isNotNull)
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          col("c.n_tokens").as("n_tokens"),
          col("c.chunk_hash").as("chunk_hash"))
        .orderBy("doc_id", "chunk_id")
    },

    // Deterministic stratified sampling: per-language rates via the
    // ANSI-proof multiplicative hash on its OWN stream (reproducible
    // across engines and runs — no RNG state). The linear
    // (doc_id·48271 + 11) % 100 it replaces was a pure residue-class
    // selector (48271 ≡ 71 mod 100 — selection depended only on
    // doc_id mod 100, systematically biased for any corpus structure
    // periodic in the low digits), and a shared stream with
    // hash_split would nest the thresholds — Pipeline's multiplier
    // table.
    QuerySpec("stratified_sample",
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id * 668265261) % 4294967296) % 100 <
        |      CASE WHEN lang = 'en' THEN 50 ELSE 10 END
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(Pipeline.hashBucket(col("doc_id"), 100L,
          Pipeline.StratifyMult) <
          when(col("lang") === "en", 50).otherwise(10))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Winnowing-style fingerprint: md5 over char 8-grams, min per window
    // of 4, distinct-sorted, folded into one digest. md5 is portable, so
    // the whole fingerprint hash-matches across engines. Selection runs
    // in the native single-pass winnow_fps (WinnowFpsSpec pins it to
    // the HOF chain the oracle spells out, which is O(chars²) per doc —
    // interpreted ArrayTransform + per-position UTF8String seeks — and
    // would not survive real document lengths); n_grams is arithmetic,
    // not a materialized gram array.
    QuerySpec("doc_fingerprint",
      s"""SELECT doc_id,
         |  CAST(len(grams) AS INTEGER) AS n_grams,
         |  md5(array_to_string(list_sort(list_distinct(
         |    CASE WHEN len(grams) >= 4 THEN
         |      list_transform(range(1, len(grams) - 2),
         |        j -> list_min(grams[j:j+3]))
         |    ELSE [list_min(grams)] END)), '')) AS fp
         |FROM (
         |  SELECT doc_id,
         |    CASE WHEN length(norm) >= 8 THEN
         |      list_transform(range(1, length(norm) - 6),
         |        i -> md5(substring(norm, i, 8)))
         |    ELSE [md5(norm)] END AS grams
         |  FROM (SELECT doc_id, $normD AS norm FROM documents)
         |) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("norm", expr(normS))
        .select(
          col("doc_id"),
          expr("cast(if(length(norm) >= 8, length(norm) - 7, 1) as int)")
            .as("n_grams"),
          expr("md5(concat_ws('', array_sort(winnow_fps(norm))))")
            .as("fp"))
        .orderBy("doc_id")
    },

    // Token-distribution Shannon entropy (nats) — the
    // gibberish/keyword-stuffing signal distinct_ratio can't see (it
    // ignores HOW skewed the repeated mass is). Identity used:
    // H = ln n − (Σ tf·ln tf)/n over per-doc term counts, so the only
    // per-term float is tf·ln(tf) — quantized to an integer BEFORE
    // the sum, making the aggregate order-independent (the
    // embedding_centroid trick; a raw double Σ would be
    // summation-order-sensitive across engines and partitions). tf=1
    // terms contribute exactly 0. Reads the memoized docTerms table —
    // no extra tokenize pass. Empty docs have no term rows in either
    // engine and drop out identically. MILLI quantum by design — see
    // Pipeline.tokenEntropy for the transcendental-rounding rationale.
    QuerySpec("token_entropy",
      s"""SELECT doc_id,
         |       CAST(n AS INTEGER) AS n_tokens,
         |       CAST(nd AS INTEGER) AS n_distinct,
         |       CAST(round((ln(CAST(n AS DOUBLE))
         |         - (CAST(sq AS DOUBLE) / 1000.0) / CAST(n AS DOUBLE))
         |         * 1000) AS BIGINT) AS entropy_milli
         |FROM (
         |  SELECT doc_id, SUM(tf) AS n, COUNT(*) AS nd,
         |         SUM(CAST(round(tf * ln(CAST(tf AS DOUBLE)) * 1000)
         |             AS BIGINT)) AS sq
         |  FROM (SELECT doc_id, term, COUNT(*) AS tf
         |        FROM (SELECT doc_id, unnest($toksD) AS term
         |              FROM documents)
         |        GROUP BY doc_id, term)
         |  GROUP BY doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Pipeline.tokenEntropy(t(s, dir, "documents"), cacheKey = dir)
        .orderBy("doc_id")
    }
  )
}
