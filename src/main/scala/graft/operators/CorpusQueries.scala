package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Declared corpus-governance queries — oracle-checked wrappers over
  * [[Corpus]]: domain reputation stats/filtering, snapshot diffing,
  * the corpus-derived stopword scrub, and the integer bigram-LM
  * quality score.
  */
object CorpusQueries {

  import Tables.t
  import TextOps.toksD

  /** DuckDB CTE chain ending in `agg(doc_id, n_bigrams, sum_pmicro)` —
    * the bigram-LM scoring shared VERBATIM by the `lm_score` and
    * `ppl_bucket` oracles (one definition, two consumers — the
    * predLangCase discipline). Mirrors [[Corpus.lmScore]] at topV=512.
    */
  private val lmAggCtesD: String =
    s"""tk AS (SELECT doc_id, $toksD AS toks FROM documents),
       |ix AS (SELECT doc_id, toks,
       |         unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
       |       FROM tk),
       |bi AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b FROM ix),
       |cab AS (SELECT a, b, COUNT(*) AS c_ab FROM bi GROUP BY a, b),
       |capped AS (
       |  SELECT a, b, c_ab FROM (
       |    SELECT a, b, c_ab,
       |           row_number() OVER (ORDER BY c_ab DESC, a, b) AS rk
       |    FROM cab)
       |  WHERE rk <= 512),
       |ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a
       |       FROM cab GROUP BY a),
       |sc AS (
       |  SELECT bi.doc_id,
       |         CAST(CAST(coalesce(capped.c_ab, 0) AS HUGEINT) * 1000000
       |           // ca.c_a AS BIGINT) AS p_micro
       |  FROM bi LEFT JOIN capped USING (a, b) JOIN ca USING (a)),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
       |         CAST(SUM(p_micro) AS BIGINT) AS sum_pmicro
       |  FROM sc GROUP BY doc_id)""".stripMargin

  /** kll_quantiles' oracle, shared verbatim with the streamed
    * `streaming_quantiles` (the transformWithState run converges to
    * the same per-source summary — one SQL definition, two consumers).
    */
  val kllQuantilesSql: String =
    """SELECT source,
      |  CAST(quantile_disc(length(text), 0.25) AS BIGINT) AS p25,
      |  CAST(quantile_disc(length(text), 0.50) AS BIGINT) AS p50,
      |  CAST(quantile_disc(length(text), 0.75) AS BIGINT) AS p75,
      |  CAST(quantile_disc(length(text), 0.95) AS BIGINT) AS p95,
      |  COUNT(*) AS n_vals
      |FROM documents WHERE text IS NOT NULL
      |GROUP BY source ORDER BY source""".stripMargin

  /** hll_distinct's oracle, shared verbatim with the streamed
    * `streaming_distinct` (the transformWithState HLL state converges
    * to the same per-source cardinality — one SQL definition, two
    * consumers; the kllQuantilesSql pattern).
    */
  val hllDistinctSql: String =
    s"""WITH tq AS (SELECT doc_id, unnest(${TextOps.toksD}) AS term
       |            FROM documents),
       |u AS (SELECT DISTINCT d.source, tq.term
       |      FROM tq JOIN documents d USING (doc_id))
       |SELECT source, COUNT(*) AS distinct_terms
       |FROM u GROUP BY source
       |UNION ALL
       |SELECT '__all__' AS source, COUNT(DISTINCT term)
       |FROM u
       |ORDER BY source""".stripMargin

  /** The span-scrub CTE chain over `table` (doc_id, text …): winnowing
    * fingerprints `e`, first-carrier attribution, and the per-character
    * DuckDB-only reconstruction of each doc's scrubbed text — ends in
    * `dl` (normed docs), `ks` (doc_id, kc kept-char count, kt kept
    * text) and `ns` (doc_id, n_sc scrubbed-span count). Shared verbatim
    * by `span_scrub` (over documents) and the composed `curation_chain`
    * oracle (over the dedup survivor set). The Spark twin is the
    * O(chars) codegen'd scrub_spans64 pass (functions.ScrubSpans64).
    */
  /** `pfx` renames every CTE (e → ${pfx}e, dl → ${pfx}dl, …) so one
    * WITH can chain TWO scrub passes over different union tables — the
    * two-epoch incremental chain needs per-epoch attribution sets.
    * The default empty prefix keeps every existing caller semantically
    * unchanged.
    */
  private[operators] def scrubCtes(table: String,
      pfx: String = ""): String =
    s"""${TextOps.spanFpsCte(table, pfx)},
       |${pfx}fst AS (SELECT fp, MIN(doc_id) AS first_doc FROM ${pfx}e
       |       GROUP BY fp),
       |${pfx}stale AS (SELECT doc_id, fp FROM ${pfx}e
       |          JOIN ${pfx}fst USING (fp)
       |          WHERE first_doc < doc_id),
       |${pfx}dl AS (SELECT doc_id, norm, length(norm) AS ln
       |       FROM (SELECT doc_id, ${TextOps.normD} AS norm
       |             FROM $table WHERE text IS NOT NULL)),
       |${pfx}g AS (SELECT doc_id, norm, ln,
       |        unnest(range(1, (CASE WHEN ln >= 8 THEN ln - 7
       |                              ELSE 1 END) + 1)) AS pos
       |      FROM ${pfx}dl),
       |${pfx}gf AS (SELECT doc_id, pos,
       |         CASE WHEN ln >= 8 THEN pos + 7 ELSE ln END AS fin,
       |         CAST(('0x' || substring(md5(CASE WHEN ln >= 8
       |             THEN substring(norm, pos, 8) ELSE norm END), 1, 15))
       |           AS BIGINT) AS gfp
       |       FROM ${pfx}g),
       |${pfx}sc AS (SELECT gf.doc_id, gf.pos, gf.fin
       |       FROM ${pfx}gf gf JOIN ${pfx}stale s ON gf.doc_id = s.doc_id
       |                           AND gf.gfp = s.fp),
       |${pfx}cov AS (SELECT DISTINCT doc_id, p FROM (
       |          SELECT doc_id, unnest(range(pos, fin + 1)) AS p
       |          FROM ${pfx}sc)),
       |${pfx}ch AS (SELECT doc_id, norm, unnest(range(1, ln + 1)) AS p
       |       FROM ${pfx}dl),
       |${pfx}kept AS (SELECT ch.doc_id, ch.p,
       |           substring(ch.norm, ch.p, 1) AS c
       |         FROM ${pfx}ch ch LEFT JOIN ${pfx}cov cov
       |           ON ch.doc_id = cov.doc_id
       |                              AND ch.p = cov.p
       |         WHERE cov.p IS NULL),
       |${pfx}ks AS (SELECT doc_id, COUNT(*) AS kc,
       |              string_agg(c, '' ORDER BY p) AS kt
       |       FROM ${pfx}kept GROUP BY doc_id),
       |${pfx}ns AS (SELECT doc_id, COUNT(*) AS n_sc FROM ${pfx}sc
       |       GROUP BY doc_id)"""
      .stripMargin

  val all: Seq[QuerySpec] = Seq(

    // Source (domain) reputation table: one bounded hash-aggregate.
    // avg_chars is BIGINT-sum / BIGINT-count — exact IEEE division,
    // bit-identical across engines without quantization.
    QuerySpec("domain_stats",
      """SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |       COUNT(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY source ORDER BY source NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Corpus.domainStats(t(s, dir, "documents")).orderBy("source")
    },

    // Reputation filter: documents from sources whose mean length
    // clears 280 chars (drops ~a third of the 251–343 source-average
    // band at every SF, so the filter genuinely bites). Passing-source
    // table broadcasts; the corpus never shuffles.
    QuerySpec("domain_filter",
      """WITH s AS (
        |  SELECT source,
        |         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source, d.lang, d.n_chars,
        |       s.avg_chars AS source_avg_chars
        |FROM documents d JOIN s ON d.source IS NOT DISTINCT FROM s.source
        |WHERE s.avg_chars >= 280.0 AND s.avg_chars <= 1000000.0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.domainFilter(t(s, dir, "documents"),
        loAvg = 280.0, hiAvg = 1000000.0)
        .orderBy("doc_id")
    },

    // Snapshot promotion diff: current documents vs a deterministic
    // next snapshot (doc_id % 11 = 0 deleted, % 7 = 0 revised,
    // % 13 = 0 re-ingested under a shifted id), rolled up to
    // per-status counts. One full-outer shuffle over md5-digest
    // projections — bucketed-by-doc_id snapshots make it
    // zero-shuffle at scale.
    QuerySpec("corpus_diff",
      """WITH b AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
        |              ELSE text END AS text
        |  FROM documents WHERE doc_id % 11 != 0
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 13 = 0),
        |a AS (SELECT doc_id, md5(text) AS h_prev, TRUE AS in_prev
        |      FROM documents),
        |bh AS (SELECT doc_id, md5(text) AS h_next, TRUE AS in_next
        |       FROM b)
        |SELECT status, COUNT(*) AS n_docs FROM (
        |  SELECT CASE WHEN in_prev IS NULL THEN 'added'
        |              WHEN in_next IS NULL THEN 'removed'
        |              WHEN h_prev IS DISTINCT FROM h_next THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN bh USING (doc_id))
        |GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val next = d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)))
      Corpus.corpusDiffCounts(d, next).orderBy("status")
    },

    // Term-level vocabulary churn across the SAME snapshot fixture as
    // corpus_diff: per-term token mass before/after, delta, and
    // gained/lost/kept status. Each snapshot reduces to a vocab-sized
    // mass table; one full-outer join on term compares them — corpus
    // payloads never move (the corpusDiff digest pattern, term-level).
    QuerySpec("vocab_churn",
      s"""WITH b AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % 11 != 0
         |  UNION ALL
         |  SELECT doc_id + 10000000 AS doc_id, text
         |  FROM documents WHERE doc_id % 13 = 0),
         |pa AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_prev
         |       FROM (SELECT unnest($toksD) AS term FROM documents)
         |       GROUP BY term),
         |pb AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_next
         |       FROM (SELECT unnest($toksD) AS term FROM b)
         |       GROUP BY term)
         |SELECT term, coalesce(c_prev, 0) AS c_prev,
         |       coalesce(c_next, 0) AS c_next,
         |       coalesce(c_next, 0) - coalesce(c_prev, 0) AS delta,
         |       CASE WHEN coalesce(c_prev, 0) = 0 THEN 'gained'
         |            WHEN coalesce(c_next, 0) = 0 THEN 'lost'
         |            ELSE 'kept' END AS status
         |FROM pa FULL OUTER JOIN pb USING (term)
         |ORDER BY term""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
      val next = d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)))
      Corpus.vocabChurn(d, next, cacheKey = dir).orderBy("term")
    },

    // Corpus-derived stopword scrub: the 8 highest-df tokens at
    // ≥ 50% document frequency (30 of 31 vocab tokens qualify, so
    // the cap's (df DESC, term) tie-break genuinely bites) removed
    // from every document. Stoplist broadcasts as ONE array row;
    // the corpus never shuffles.
    QuerySpec("stopword_scrub",
      s"""WITH tq AS (SELECT doc_id, unnest($toksD) AS term
         |            FROM documents),
         |dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df
         |        FROM tq GROUP BY term),
         |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
         |st AS (SELECT term FROM dfq CROSS JOIN nd
         |       WHERE CAST(df AS DOUBLE) >= 0.5 * n_docs
         |       ORDER BY df DESC, term LIMIT 8),
         |sl AS (SELECT coalesce(list(term ORDER BY term), []) AS stops
         |       FROM st)
         |SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
         |       CAST(len(toks) - len(kept) AS INTEGER) AS n_removed,
         |       array_to_string(kept, ' ') AS text_scrubbed
         |FROM (
         |  SELECT doc_id, toks, list_filter(toks,
         |           x -> NOT list_contains(sl.stops, x)) AS kept
         |  FROM (SELECT doc_id, $toksD AS toks FROM documents)
         |  CROSS JOIN sl)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.stopwordScrub(t(s, dir, "documents"),
        dfFrac = 0.5, cap = 8, cacheKey = dir)
        .orderBy("doc_id")
    },

    // Exact-substring duplication rate: the winnowing fingerprint
    // selection of doc_fingerprint, un-folded, counted across the
    // corpus; a span is duplicated iff its fingerprint is in ≥ 2
    // docs. The frequency join is an honest corpus-sized shuffle
    // on fp (the ngram_jaccard precedent) — see Corpus.spanDupRate.
    // Ingestion-order content novelty: a span fingerprint is novel to
    // the FIRST document (lowest doc_id) carrying it — the "keep the
    // original, score re-crawls down" curation signal, asymmetric
    // where span_dup_rate is symmetric. Shares the memoized docFps
    // table; the oracle recomputes first-occurrence with MIN per fp.
    QuerySpec("novelty_score",
      s"""WITH ${TextOps.spanFpsCteD},
         |fst AS (SELECT fp, MIN(doc_id) AS first_doc FROM e GROUP BY fp)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_fps,
         |       CAST(COUNT(*) FILTER (WHERE first_doc = doc_id)
         |         AS INTEGER) AS n_novel,
         |       CAST(COUNT(*) FILTER (WHERE first_doc = doc_id)
         |         AS DOUBLE) / COUNT(*) AS novelty
         |FROM e JOIN fst USING (fp)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.noveltyScore(
        Corpus.docFps(t(s, dir, "documents"), cacheKey = dir))
        .orderBy("doc_id")
    },

    QuerySpec("span_dup_rate",
      s"""WITH ${TextOps.spanFpsCteD},
         |dfc AS (SELECT fp, COUNT(*) AS n_docs_fp FROM e GROUP BY fp)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_fps,
         |       CAST(COUNT(*) FILTER (WHERE n_docs_fp >= 2)
         |         AS INTEGER) AS n_dup,
         |       CAST(COUNT(*) FILTER (WHERE n_docs_fp >= 2)
         |         AS DOUBLE) / COUNT(*) AS dup_rate
         |FROM e JOIN dfc USING (fp)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.spanDupRate(
        Corpus.docFps(t(s, dir, "documents"), cacheKey = dir))
        .orderBy("doc_id")
    },

    // Span-level benchmark decontamination: verbatim-overlap complement
    // of the token-shingle `decontaminate` (same deterministic
    // doc_id % 97 eval slice); a corpus doc is contaminated when ≥ 20%
    // of its winnowing fingerprints occur in the benchmark slice. The
    // benchmark fingerprint set broadcasts; the corpus streams once —
    // see Corpus.spanDecontaminate.
    QuerySpec("span_decontaminate",
      s"""WITH ${TextOps.spanFpsCteD},
         |bench AS (SELECT DISTINCT fp FROM e WHERE doc_id % 97 = 0)
         |SELECT e.doc_id, CAST(COUNT(*) AS INTEGER) AS n_fps,
         |       CAST(COUNT(b.fp) AS INTEGER) AS n_bench,
         |       CAST(COUNT(b.fp) AS DOUBLE) / COUNT(*) AS bench_frac,
         |       CAST(COUNT(b.fp) AS DOUBLE) / COUNT(*) >= 0.2
         |         AS contaminated
         |FROM e LEFT JOIN bench b ON e.fp = b.fp
         |WHERE e.doc_id % 97 != 0
         |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin) { (s, dir) =>
      Corpus.spanDecontaminate(
        Corpus.docFps(t(s, dir, "documents"), cacheKey = dir),
        col("doc_id") % 97 === 0, minFrac = 0.2)
        .orderBy("doc_id")
    },

    // Span-level dedup SCRUB (Lee et al.) — the transform the span
    // measures above only report: every span whose winnowing
    // fingerprint has an earlier carrier (min doc_id — novelty_score's
    // first-carrier attribution) is removed; the first carrier keeps
    // its text untouched. The digest-of-kept-text column makes the
    // oracle witness the reconstructed TEXTS, not just counts — green
    // only if both engines keep exactly the same characters. Spark
    // side is one O(chars) codegen'd pass per doc
    // (functions.ScrubSpans64); the per-character reconstruction below
    // is the DuckDB-only formulation.
    QuerySpec("span_scrub",
      s"""WITH ${scrubCtes("documents")}
         |SELECT doc_id,
         |       CAST(COALESCE(kc, 0) AS INTEGER) AS kept_chars,
         |       CAST(COALESCE(n_sc, 0) AS INTEGER) AS scrubbed_spans,
         |       md5(COALESCE(kt, '')) AS kept_digest
         |FROM dl LEFT JOIN ks USING (doc_id) LEFT JOIN ns USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.spanScrub(t(s, dir, "documents"),
        Corpus.docFps(t(s, dir, "documents"), cacheKey = dir))
        .orderBy("doc_id")
    },

    // Per-source distinctive terms by exact integer-micro lift —
    // PMI's transcendental-free monotone surrogate (top-k by lift IS
    // top-k by PMI). Min support 5 guards the hapax blowup; the term
    // table is the memoized docTerms (one tokenize per session). All
    // arithmetic BIGINT-exact, floor division in both engines.
    QuerySpec("term_lift",
      s"""WITH tq AS (SELECT doc_id, unnest($toksD) AS term
         |            FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tq
         |       GROUP BY doc_id, term),
         |st AS (SELECT d.source, tf.term,
         |              CAST(SUM(tf.tf) AS BIGINT) AS c_st
         |       FROM tf JOIN documents d USING (doc_id)
         |       GROUP BY d.source, tf.term),
         |gt AS (SELECT term, CAST(SUM(c_st) AS BIGINT) AS c_t
         |       FROM st GROUP BY term),
         |ts AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS t_s
         |       FROM st GROUP BY source),
         |tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS t FROM st),
         |scored AS (
         |  SELECT st.source, st.term, st.c_st,
         |         CAST(CAST(st.c_st AS HUGEINT) * tot.t * 1000000
         |              // (CAST(gt.c_t AS HUGEINT) * ts.t_s)
         |           AS BIGINT) AS lift_micro
         |  FROM st JOIN gt USING (term) JOIN ts USING (source)
         |  CROSS JOIN tot
         |  WHERE st.c_st >= 5)
         |SELECT source, term, c_st, lift_micro,
         |       CAST(rk AS INTEGER) AS rk
         |FROM (
         |  SELECT source, term, c_st, lift_micro, row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY lift_micro DESC, term) AS rk
         |  FROM scored)
         |WHERE rk <= 3 ORDER BY source NULLS FIRST, rk""".stripMargin) { (s, dir) =>
      Corpus.termLift(t(s, dir, "documents"), minCount = 5, k = 3,
        cacheKey = dir)
        .orderBy("source", "rk")
    },

    // DSIR importance weights: target slice = the 'en' documents,
    // features = bigrams hashed into 256 buckets (bigram vocabulary is
    // 916, so feature collisions are genuinely exercised), weight =
    // mean per-feature p_target − p_raw in integer micros. The oracle
    // replicates the hash (md5-hex-prefix-to-int64, the winnow_fps64
    // contract), both micro-models, and the scoring joins — see
    // Corpus.dsirWeights for the broadcast-everything scale shape.
    QuerySpec("dsir_weights",
      s"""WITH tk AS (SELECT doc_id, $toksD AS toks FROM documents),
         |ix AS (SELECT doc_id, toks,
         |         unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i
         |       FROM tk),
         |bi AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b FROM ix),
         |f AS (SELECT doc_id,
         |        CAST(('0x' || substring(md5(a || ' ' || b), 1, 15))
         |          AS BIGINT) % 256 AS fid
         |      FROM bi),
         |tf AS (SELECT f.fid FROM f JOIN documents d USING (doc_id)
         |       WHERE d.lang = 'en'),
         |pt AS (SELECT fid, CAST(CAST(COUNT(*) AS HUGEINT) * 1000000
         |         // (SELECT COUNT(*) FROM tf) AS BIGINT) AS pt_micro
         |       FROM tf GROUP BY fid),
         |pr AS (SELECT fid, CAST(CAST(COUNT(*) AS HUGEINT) * 1000000
         |         // (SELECT COUNT(*) FROM f) AS BIGINT) AS pr_micro
         |       FROM f GROUP BY fid),
         |sc AS (SELECT f.doc_id,
         |         coalesce(pt_micro, 0) - coalesce(pr_micro, 0) AS dw
         |       FROM f LEFT JOIN pt USING (fid)
         |       LEFT JOIN pr USING (fid)),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_feats,
         |          CAST(SUM(dw) AS BIGINT) AS sum_dw_micro
         |        FROM sc GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(agg.n_feats, 0) AS n_feats,
         |       coalesce(agg.sum_dw_micro, 0) AS sum_dw_micro,
         |       CASE WHEN agg.n_feats > 0
         |            THEN CAST(agg.sum_dw_micro AS DOUBLE)
         |                 / agg.n_feats
         |       END AS avg_dw_micro
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      Corpus.dsirWeights(t(s, dir, "documents"),
        col("lang") === "en", nBuckets = 256, cacheKey = dir)
        .orderBy("doc_id")
    },

    // Bigram-LM quality score over a top-512 model (bigram vocabulary
    // is 916, so capping bites and out-of-model transitions exercise
    // the floor-smoothing path). All-integer probabilities — see
    // Corpus.lmScore for the exactness argument.
    QuerySpec("lm_score",
      s"""WITH $lmAggCtesD
         |SELECT d.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
         |       coalesce(agg.sum_pmicro, 0) AS sum_pmicro,
         |       CASE WHEN agg.n_bigrams > 0
         |            THEN CAST(agg.sum_pmicro AS DOUBLE) / agg.n_bigrams
         |       END AS avg_pmicro
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.lmScore(t(s, dir, "documents"), topV = 512,
        cacheKey = dir)
        .orderBy("doc_id")
    },

    // CCNet-style perplexity bucketing: head / middle / tail shards by
    // the bigram-LM mean transition probability, with fixed integer
    // thresholds (26000 / 23500 micros ≈ the corpus p67 / p33, so all
    // three shards are populated at every SF). The comparison is
    // sum_pmicro >= n_bigrams·T — no division anywhere; shares the
    // lm_score CTE chain verbatim AND the memoized Spark-side model.
    QuerySpec("ppl_bucket",
      s"""WITH $lmAggCtesD,
         |lb AS (
         |  SELECT d.doc_id, d.n_chars,
         |         coalesce(agg.n_bigrams, 0) AS n_bigrams,
         |         coalesce(agg.sum_pmicro, 0) AS sum_pmicro
         |  FROM documents d LEFT JOIN agg USING (doc_id))
         |SELECT bucket, COUNT(*) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
         |       CAST(SUM(sum_pmicro) AS BIGINT) AS sum_pmicro_total
         |FROM (
         |  SELECT *, CASE WHEN n_bigrams = 0 THEN 'tail'
         |                 WHEN sum_pmicro >= n_bigrams * 26000
         |                   THEN 'head'
         |                 WHEN sum_pmicro >= n_bigrams * 23500
         |                   THEN 'middle'
         |                 ELSE 'tail' END AS bucket
         |  FROM lb)
         |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      Corpus.pplBuckets(t(s, dir, "documents"),
        headMin = 26000L, midMin = 23500L, topV = 512, cacheKey = dir)
        .orderBy("bucket")
    },

    // Top-duplicated spans: the boilerplate leaderboard over the
    // memoized winnowing-fingerprint table (Corpus.topDupSpans — one
    // fp-keyed aggregate + top-k, shared docFps pass with the other
    // span operators).
    QuerySpec("top_dup_spans",
      s"""WITH ${TextOps.spanFpsCteD}
         |SELECT fp, COUNT(*) AS n_docs,
         |       CAST(MIN(doc_id) AS BIGINT) AS example_doc
         |FROM e GROUP BY fp HAVING COUNT(*) >= 2
         |ORDER BY n_docs DESC, fp LIMIT 50""".stripMargin) { (s, dir) =>
      Corpus.topDupSpans(
        Corpus.docFps(t(s, dir, "documents"), cacheKey = dir), k = 50)
    },

    // Cross-source verbatim-overlap matrix (Corpus.sourceOverlap —
    // distinct (digest, source) collapse before the bounded digest
    // self-join; result is sources²-sized per key kind). Both
    // dedup_content keys are reported: the full md5(norm) byte-mirror
    // digest (empty until sf0.1's 8 cross-source dups) and the 60-char
    // normalized-prefix boilerplate digest (23 pairs at the sf0.01
    // gate, so the pairing logic is genuinely differentiated there).
    QuerySpec("source_overlap",
      s"""WITH n AS (SELECT ${TextOps.normD} AS norm, source
         |           FROM documents),
         |hf AS (SELECT DISTINCT md5(norm) AS h, source FROM n),
         |hp AS (SELECT DISTINCT md5(substring(norm, 1, 60)) AS h,
         |              source FROM n)
         |SELECT 'full' AS key_kind, a.source AS src_a,
         |       b.source AS src_b, COUNT(*) AS n_shared
         |FROM hf a JOIN hf b ON a.h = b.h AND a.source < b.source
         |GROUP BY 2, 3
         |UNION ALL
         |SELECT 'prefix', a.source, b.source, COUNT(*)
         |FROM hp a JOIN hp b ON a.h = b.h AND a.source < b.source
         |GROUP BY 2, 3
         |ORDER BY key_kind, src_a, src_b""".stripMargin) { (s, dir) =>
      // One memoized normalization+digest pass feeds both key kinds.
      val hd = Corpus.sourceDigests(t(s, dir, "documents"),
        cacheKey = dir)
      Corpus.sourceOverlapPairs(
          hd.select(col("hf").as("h"), col("source")))
        .withColumn("key_kind", lit("full"))
        .unionByName(
          Corpus.sourceOverlapPairs(
            hd.select(col("hp").as("h"), col("source")))
            .withColumn("key_kind", lit("prefix")))
        .select("key_kind", "src_a", "src_b", "n_shared")
        .orderBy("key_kind", "src_a", "src_b")
    },

    // DataSketches HLL distinct-term estimates per source, plus the
    // global row MERGED from the per-source sketches (hll_union_agg) —
    // the mergeable-sketch rollup contract in the oracle gate. The
    // oracle compares against EXACT COUNT(DISTINCT): legitimate
    // because at the fixture's vocab cardinality every sketch is still
    // a coupon list (estimate == exact, deterministic — DataSketches'
    // hash is seed-fixed), so a green row proves sketch build, merge,
    // and estimate agree with truth; the error bound in the estimation
    // regime (~1.6% rsd at lgK=12, 200k distinct) is SketchSpec's
    // gate, where exactness is impossible by construction.
    // Theta-sketch distinct intersections (ThetaSketches): per-source
    // term sketches built with NO term-keyed shuffle (per-partition
    // partials → sketch-sized per-source union), pairwise intersected
    // driver-side over the sources-sized list. The oracle recomputes
    // every pair's |distinct(A) ∩ distinct(B)| exactly — green because
    // the fixture vocab keeps every sketch in exact mode (< k entries)
    // and DataSketches' update seed is fixed; the estimation-regime
    // envelope and partial-union ≡ direct-build are SketchSpec gates.
    QuerySpec("theta_overlap",
      s"""WITH tq AS (SELECT doc_id, unnest(${toksD}) AS term
         |            FROM documents),
         |u AS (SELECT DISTINCT d.source, tq.term
         |      FROM tq JOIN documents d USING (doc_id))
         |SELECT a.source AS src_a, b.source AS src_b,
         |       COUNT(*) AS shared_terms
         |FROM u a JOIN u b ON a.term = b.term AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      ThetaSketches.sourceOverlapEstimates(
          Pipeline.docTerms(docs, cacheKey = dir)
            .join(docs.select("doc_id", "source"), "doc_id"))
        .orderBy("src_a", "src_b")
    },

    // Count–min-sketch document frequencies (Corpus.cmsDocFreq): the
    // sketch is built distributed (one pass over the memoized
    // docTerms), then BROADCAST so candidates enumerate and
    // point-query distributed too — the driver holds only the
    // KB-sized sketch, never the vocabulary. Oracle compares against
    // EXACT df — legitimate because at width ⌈2/eps⌉ = 20,000 the
    // fixture vocab is collision-free and the seed is fixed, so the
    // estimate EQUALS truth deterministically; the collision regime
    // (overestimate-only) and shard-merge ≡ single-pass are
    // SketchSpec's gates.
    QuerySpec("cms_df",
      s"""WITH tq AS (SELECT doc_id, unnest(${toksD}) AS term
         |            FROM documents),
         |g AS (SELECT DISTINCT doc_id, term FROM tq)
         |SELECT term, COUNT(*) AS est_df
         |FROM g GROUP BY term ORDER BY term""".stripMargin) { (s, dir) =>
      Corpus.cmsDocFreq(t(s, dir, "documents"), cacheKey = dir)
        .orderBy("term")
    },

    QuerySpec("hll_distinct", CorpusQueries.hllDistinctSql) { (s, dir) =>
      Corpus.hllDistinctTerms(t(s, dir, "documents"), cacheKey = dir)
        .orderBy("source")
    },

    // KLL grouped quantiles (QuantileSketches): per-source document-
    // length p25/p50/p75/p95 from per-partition partial sketches
    // merged per source — the shuffle moves KB sketches, never values;
    // an exact grouped percentile would per-group-sort the corpus.
    // Oracle compares against SQL-standard percentile_disc — legitimate
    // because every fixture group holds ≤ k values, so the sketch has
    // never compacted and getQuantile(q, INCLUSIVE) IS percentile_disc
    // (smallest value whose inclusive rank reaches q), deterministically.
    // The randomized-compaction estimation regime (rank-error envelope,
    // merge ≡ single-pass exactness) is SketchSpec's gate.
    QuerySpec("kll_quantiles", CorpusQueries.kllQuantilesSql) { (s, dir) =>
      QuantileSketches.sourceLengthQuantiles(t(s, dir, "documents"))
        .orderBy("source")
    },

    // Length-outlier curation driven by the KLL cutoffs
    // (QuantileSketches.lengthTrim): keep documents inside the
    // per-source [p05, p95] character-length band — cutoffs off the
    // sketch (no per-group sort), sources-sized cutoff table
    // broadcast into the corpus filter. Oracle recomputes the band
    // with percentile_disc — identical in the never-compacted regime.
    QuerySpec("quantile_trim",
      """WITH d AS (SELECT doc_id, source, length(text) AS n_chars
        |           FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT source,
        |        quantile_disc(n_chars, 0.05) AS lo,
        |        quantile_disc(n_chars, 0.95) AS hi
        |      FROM d GROUP BY source)
        |SELECT doc_id, d.source, n_chars
        |FROM d JOIN c USING (source)
        |WHERE n_chars BETWEEN lo AND hi
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      QuantileSketches.lengthTrim(t(s, dir, "documents"))
        .orderBy("doc_id")
    },

    // Frequent-items heavy hitters (HeavyHitters): terms above 2% of
    // all token occurrences from ONE docTerms scan — per-partition
    // Misra–Gries partials merged driver-side (partitions-sized byte
    // list, the codebook-loop pattern), no term-keyed shuffle. Oracle
    // compares against the exact HAVING — legitimate because the
    // fixture vocab fits the map (no purge has occurred → estimates
    // equal truth and NO_FALSE_POSITIVES selects exactly
    // count > total/divisor); the purge regime (bounds hold, no false
    // negatives, deterministic merge) is SketchSpec's gate.
    QuerySpec("heavy_hitters",
      s"""WITH tq AS (SELECT unnest(${toksD}) AS term FROM documents),
         |tot AS (SELECT COUNT(*) AS n FROM tq)
         |SELECT term, COUNT(*) AS est_count
         |FROM tq, tot
         |GROUP BY term, tot.n
         |HAVING COUNT(*) > tot.n // 50
         |ORDER BY term""".stripMargin) { (s, dir) =>
      HeavyHitters.termHeavyHitters(t(s, dir, "documents"), cacheKey = dir)
        .orderBy("term")
    }
  )
}
