package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation chain COMPOSED into one oracle-gated query (VERDICT r13
  * next-round #1): ChainSoak proves the composition's row counts and
  * plan invariants at 100× amplification, but until now no CORRECTNESS
  * row hash-gated the composed OUTPUT. `curation_chain` runs the whole
  * training-data pipeline end to end —
  *
  *   shingle → minhash pairs → clusters → dedupKeep → spanScrubDocs
  *     → budgetSelectDocs → mixtureSample → packSequences
  *
  * — and emits a single summary row: per-stage survivor counts plus
  * order-independent digests of the packed corpus (its layout rows AND
  * its exact scrubbed texts), so the DuckDB oracle witnesses every
  * stage's composed effect, not just each stage in isolation. The
  * oracle chains the SAME per-stage CTEs the individual queries gate
  * (DedupQueries.dupesCtes, CorpusQueries.scrubCtes, and the
  * token_budget / mix_sample / seq_pack window SQL), so a divergence
  * anywhere in the composition hash-mismatches here even while every
  * stage stays green alone.
  *
  * Scale shape: inherits each stage's design — bucketed candidate
  * generation over the memoized shingle cache, one codegen'd scrub
  * pass, banded prefix-sum budget/pack (no whole-language reducer),
  * broadcast mixture weights — and the summary scalars are ungrouped
  * aggregates combined by crossJoin(broadcast(1-row)) (the
  * PlanInvariantsSpec-sanctioned scalar-stats shape). The only
  * driver-side collect is the languages-sized budget table (the
  * ChainSoak precedent). Digests are 40-bit md5 prefixes (bit_xor +
  * sum both BIGINT-safe at any SF; xor alone misses even-multiplicity
  * differences, sum alone misses xor-symmetric swaps — FaultSoak's
  * digest argument).
  *
  * The per-language admission budget is data-derived (half the
  * smallest language's post-scrub char mass — SF-proportional, so the
  * boundary machinery engages at every fixture instead of admitting
  * or rejecting whole languages), computed identically by both
  * engines.
  */
object ChainQueries {

  import Tables.t

  /** Dedup survivors scrubbed — the chain's shared expensive prefix,
    * memoized per (session, corpus): clusters → left-anti keep →
    * span-scrub keeping lang/source and replacing text/n_chars with
    * the post-scrub values. First-carrier attribution runs over the
    * SURVIVOR set (fps of removed near-dups must not scrub the
    * canonical copies that outlived them), reusing the memoized
    * full-corpus fp table via one semi-join.
    */
  private def scrubbedKept(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_scrubbed", s, dir, persistIt = true) {
      val docs = t(s, dir, "documents")
      val kept = docs.join(chainDupes(s, dir), Seq("doc_id"), "left_anti")
      val keptFps = Corpus.docFps(docs, cacheKey = dir)
        .join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
      Corpus.spanScrubDocs(kept, keptFps)
    }

  /** Non-canonical near-dup cluster member ids (dedup_keep's drop set),
    * off the memoized shingle/cluster caches.
    */
  private def chainDupes(s: SparkSession, dir: String): DataFrame =
    Dedup.clusters(
      Dedup.docShingles(t(s, dir, "documents"), cacheKey = dir), 4, 5,
      cacheKey = dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")

  /** Budget-admitted scrubbed docs, memoized: the summary row reads
    * the chain's tail frames several times (counts, xor digests, sum
    * digests, the distinct-pack count), and without persistence every
    * scalar aggregate would re-run budget→mix→pack from scratch —
    * 3-7 recomputations of the corpus tail per execution. Keyed memos
    * (one per stage, the docShingles discipline) make each stage
    * materialize once per (session, corpus).
    */
  private def selected(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_sel", s, dir, persistIt = true) {
      val scr = scrubbedKept(s, dir)
      // Languages-sized driver aggregate (ChainSoak's budget shape):
      // half the smallest language's post-scrub char mass. An EMPTY
      // scrubbed corpus (all null-text) budgets 0 and flows zero rows
      // through — the oracle's MIN over an empty bud is NULL with the
      // same effect, so the degenerate corpus keeps engine ≡ oracle
      // (the Bpe dry-pairs rule, ADVICE r13) instead of erroring
      // engine-side only.
      val langMass = scr.groupBy("lang").agg(sum("n_chars").as("c"))
        .collect().map(_.getLong(1))
      val budget = if (langMass.isEmpty) 0L else langMass.min / 2
      Pipeline.budgetSelectDocs(scr, budget)
    }

  private def sampled(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_sam", s, dir, persistIt = true) {
      Pipeline.mixtureSample(selected(s, dir))
        .select("doc_id", "lang", "text")
    }

  private def packedLayout(s: SparkSession, dir: String): DataFrame =
    Memo.memo("chain_packed", s, dir, persistIt = true) {
      Pipeline.packSequencesBy(
        sampled(s, dir).select(col("doc_id"), col("lang"),
          expr("cast(size(filter(split(text, ' '), x -> x != '')) " +
            "as int)").as("n_tok")), cap = 2048)
    }

  /** 40-bit BIGINT from an md5 hex prefix — both engines' portable
    * row-hash unit (the winnow_fps64 hex-to-int64 contract, shortened
    * so SUM over any fixture stays far under 2^63).
    */
  private def h40(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  val all: Seq[QuerySpec] = Seq(

    QuerySpec("curation_chain",
      s"""WITH RECURSIVE ${DedupQueries.dupesCtes},
         |surv AS MATERIALIZED (
         |        SELECT doc_id, text, lang, source FROM documents
         |        WHERE doc_id NOT IN (SELECT doc_id FROM dupes)),
         |${CorpusQueries.scrubCtes("surv")},
         |scr AS MATERIALIZED (
         |        SELECT dl.doc_id, k.lang, k.source,
         |               COALESCE(ks.kt, '') AS text,
         |               CAST(COALESCE(ks.kc, 0) AS BIGINT) AS n_chars
         |        FROM dl LEFT JOIN ks USING (doc_id)
         |        JOIN surv k ON dl.doc_id = k.doc_id),
         |bud AS (SELECT MIN(c) // 2 AS b FROM (
         |          SELECT CAST(SUM(n_chars) AS BIGINT) AS c
         |          FROM scr GROUP BY lang)),
         |sel AS MATERIALIZED (
         |        SELECT doc_id, lang, source, text, n_chars FROM (
         |          SELECT doc_id, lang, source, text, n_chars,
         |                 COALESCE(SUM(n_chars) OVER (PARTITION BY lang
         |                   ORDER BY n_chars DESC, doc_id
         |                   ROWS BETWEEN UNBOUNDED PRECEDING
         |                     AND 1 PRECEDING),
         |                   0) AS cum
         |          FROM scr)
         |        WHERE cum + n_chars <= (SELECT b FROM bud)),
         |ms AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars_tot
         |       FROM sel GROUP BY source),
         |mw AS (SELECT source,
         |         CAST((1000000 *
         |             CAST((SELECT SUM(chars_tot) FROM ms) AS HUGEINT))
         |           // NULLIF(CAST((SELECT COUNT(*) FROM ms) AS HUGEINT)
         |                * chars_tot, 0)
         |           AS BIGINT) AS weight_micro
         |       FROM ms),
         |sam AS MATERIALIZED (
         |        SELECT sel.doc_id, sel.lang, sel.text
         |        FROM sel JOIN mw
         |          ON sel.source IS NOT DISTINCT FROM mw.source
         |        WHERE ((doc_id * 2246822519) % 4294967296) % 1000000
         |              < CASE WHEN weight_micro IS NULL THEN NULL
         |                     ELSE least(weight_micro, 1000000) END),
         |tok AS (SELECT doc_id, lang, text,
         |          CAST(len(list_filter(string_split(text, ' '),
         |            x -> x != '')) AS BIGINT) AS n_tok
         |        FROM sam),
         |pk AS (SELECT doc_id, lang, text, n_tok,
         |         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang
         |           ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |           0) AS BIGINT) AS tok_offset
         |       FROM tok),
         |ph AS MATERIALIZED (
         |       SELECT lang, text,
         |         CAST(floor(tok_offset / 2048) AS BIGINT) AS bin,
         |         CAST(('0x' || substring(md5(
         |             CAST(doc_id AS VARCHAR) || ':' ||
         |             COALESCE(lang, '<null>') || ':' ||
         |             CAST(n_tok AS VARCHAR) || ':' ||
         |             CAST(tok_offset AS VARCHAR) || ':' ||
         |             CAST(CAST(floor(tok_offset / 2048) AS BIGINT)
         |               AS VARCHAR)), 1, 10)) AS BIGINT) AS hr
         |       FROM pk)
         |SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         |       (SELECT COUNT(*) FROM surv) AS n_kept,
         |       (SELECT COUNT(*) FROM sel) AS n_selected,
         |       (SELECT CAST(COALESCE(SUM(n_chars), 0) AS BIGINT)
         |        FROM sel) AS sel_chars,
         |       (SELECT COUNT(*) FROM sam) AS n_sampled,
         |       (SELECT COUNT(*) FROM
         |          (SELECT DISTINCT lang, bin FROM ph)) AS n_packs,
         |       (SELECT COALESCE(BIT_XOR(CAST(('0x' ||
         |            substring(md5(text), 1, 10)) AS BIGINT)), 0)
         |        FROM ph) AS text_xor,
         |       (SELECT COALESCE(BIT_XOR(hr), 0) FROM ph) AS pack_xor,
         |       (SELECT CAST(COALESCE(SUM(hr), 0) AS BIGINT) FROM ph)
         |         AS pack_sum""".stripMargin) { (s, dir) =>
    // The whole 1-row summary memoizes LINEAGE-TRUNCATED (the
    // clusters-memo pattern): a plain persist still re-ANALYZES the
    // full nested chain plan on every count — measured 2.7-3.1 s of
    // pure driver planning per warm call over already-cached data.
    // localCheckpoint replaces the plan with a 1-row LogicalRDD, so a
    // warm call costs milliseconds; Memo's release path owns the
    // checkpoint blocks.
    Memo.memo("chain_summary", s, dir, persistIt = false) {
      val docs = t(s, dir, "documents")
      val sel = selected(s, dir)
      val sam = sampled(s, dir)
      val packed = packedLayout(s, dir)
      val packRow = concat_ws(":",
        col("doc_id").cast("string"),
        coalesce(col("lang"), lit("<null>")),
        col("n_tok").cast("string"),
        col("tok_offset").cast("string"),
        col("bin").cast("string"))
      val aDocs = docs.agg(count(lit(1)).as("n_docs"))
      val aKept = docs.join(chainDupes(s, dir), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_kept"))
      val aSel = sel.agg(count(lit(1)).as("n_selected"),
        coalesce(sum("n_chars"), lit(0L)).as("sel_chars"))
      val aSam = sam.select(h40(col("text")).as("th"))
        .agg(count(lit(1)).as("n_sampled"),
          coalesce(expr("bit_xor(th)"), lit(0L)).as("text_xor"))
      val aPacks = packed.select("lang", "bin").distinct()
        .agg(count(lit(1)).as("n_packs"))
      val aLayout = packed.select(h40(packRow).as("hr"))
        .agg(coalesce(expr("bit_xor(hr)"), lit(0L)).as("pack_xor"),
          coalesce(sum("hr"), lit(0L)).as("pack_sum"))
      aDocs.crossJoin(broadcast(aKept))
        .crossJoin(broadcast(aSel))
        .crossJoin(broadcast(aSam))
        .crossJoin(broadcast(aPacks))
        .crossJoin(broadcast(aLayout))
        .localCheckpoint()
    }
    })
}
