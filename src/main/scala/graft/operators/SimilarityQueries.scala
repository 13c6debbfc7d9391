package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float] → computed in
  * double): brute-force cosine top-k as the exact baseline, a
  * hyperplane-LSH bucketed variant as the 100 TB scale path, and a
  * threshold near-dup pair query.
  *
  * Cosine is computed as a *sequential* fold (Spark `aggregate` HOF);
  * the DuckDB oracle mirrors the same fold (list_reduce) so the doubles
  * are bit-identical — no rounding fudge needed.
  */
object SimilarityQueries {

  import Tables.t

  /** Number of query vectors (vec_id < NQ) searched against the corpus
    * (vec_id >= NQ).
    */
  private val NQ = 5

  // Spark-side fragments over array<double> columns: the native codegen
  // expression (graft.functions.ArrayDotProduct). Same sequential fold
  // as the HOF formulation and the DuckDB oracle — bit-identical output.
  private def dotS(a: String, b: String): String = s"array_dot($a, $b)"

  private def normS(v: String): String = s"sqrt(${dotS(v, v)})"

  // DuckDB mirrors (1-based lists). Sequential fold matches Spark's.
  private def dotD(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), " +
      "(acc, x) -> acc + x)"

  private def normD(v: String): String = s"sqrt(${dotD(v, v)})"

  /** Hyperplane-LSH bucket: 8 sign bits of dot products against
    * deterministic LCG-generated planes (plane[j][d] =
    * ((1103515245*(j*64+d) + 12345) mod 2^31) mod 1024 - 512). The
    * formula — not a literal matrix — is embedded in both engines.
    * BIGINT arithmetic throughout (the LCG product overflows int32).
    */
  /** The planes are constants — computed here with the same LCG formula
    * the oracle uses and embedded as array literals, so Catalyst folds
    * them once at analysis instead of re-running a (non-foldable) HOF
    * transform per row: a transform(sequence(...)) plane build cost
    * 8×64 interpreted lambda evals per input row.
    */
  private def plane(j: Int): String =
    (0 until 64).map { d =>
      val v = ((1103515245L * (j * 64 + d) + 12345L) % 2147483648L) %
        1024L - 512L
      s"${v}D"
    }.mkString("array(", ", ", ")")

  private val bucketS: String =
    (0 until 8).map(j => s"if(array_dot(v, ${plane(j)}) >= 0, 1L, 0L)")
      .zipWithIndex
      .map { case (bit, j) => s"shiftleft($bit, ${7 - j})" }
      .mkString(" + ")

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

  /** Query vectors vs corpus with per-row norms precomputed. */
  private def sides(df: DataFrame): (DataFrame, DataFrame) = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val e = df.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        expr(normS("v")).as("qn"))
    val c = e.filter(col("vec_id") >= NQ)
      .select(col("vec_id").as("n_id"), col("v").as("cv"),
        expr(normS("v")).as("cn"))
    (q, c)
  }

  private val cosCol =
    expr(s"${dotS("qv", "cv")} / (qn * cn)")

  val all: Seq[QuerySpec] = Seq(

    // Brute-force cosine top-k: corpus × broadcast(queries) — the exact
    // baseline. Scale shape: the small query side broadcasts; the corpus
    // streams through one pass; top-k per query via partitioned window.
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
      val (q, c) = sides(t(s, dir, "embeddings"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      c.crossJoin(broadcast(q))
        .select(col("q_id"), col("n_id"), cosCol.as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("q_id", "n_id", "rn", "cos")
        .orderBy("q_id", "rn")
    },

    // LSH-bucketed ANN: queries join only same-bucket corpus vectors —
    // the scale path (bucket join instead of full scan; at 100 TB the
    // corpus is hash-partitioned by bucket and each query probes one
    // partition).
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
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val b = e.select(col("vec_id"), col("v"),
        expr(bucketS).as("bucket"), expr(normS("v")).as("nrm"))
      val q = b.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("bucket"), col("nrm").as("qn"))
      val c = b.filter(col("vec_id") >= NQ)
        .select(col("vec_id").as("n_id"), col("v").as("cv"),
          col("bucket"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id"))
      c.join(broadcast(q), "bucket")
        .select(col("q_id"), col("n_id"), cosCol.as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("q_id", "n_id", "rn", "cos")
        .orderBy("q_id", "rn")
    },

    // Per-label centroids: positional explode → quantize each component
    // to an integer micro-value → exact integer sums → one double
    // division. Quantization makes the aggregation order-independent
    // (double sums are not); the 1e-6 resolution is far below embedding
    // noise. One shuffle on (label, pos).
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
        t(s, dir, "embeddings")
          .select(col("label"),
            posexplode(col("embedding").cast("array<double>"))
              .as(Seq("p", "component")))
          .select(col("label"), (col("p") + 1).cast("int").as("pos"),
            round(col("component") * 1000000).cast("long").as("q"))
          .groupBy("label", "pos")
          .agg(
            (sum(col("q")).cast("double") /
              (lit(1000000.0) * count(lit(1)))).as("centroid"),
            count(lit(1)).as("n"))
          .orderBy("label", "pos")
    },

    // Embedding-cosine near-dup pairs within a label block, threshold
    // 0.95. Label blocking bounds the pair space (the LSH bucket above is
    // the unblocked scale path).
    QuerySpec("embedding_neardup",
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
         |           FROM embeddings),
         |n AS (SELECT vec_id, label, v, ${normD("v")} AS nrm FROM e)
         |SELECT a.vec_id AS va, b.vec_id AS vb,
         |       ${dotD("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
         |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${dotD("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.95
         |ORDER BY va, vb""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", expr(normS("v")))
      val a = e.select(col("vec_id").as("va"), col("label"),
        col("v").as("qv"), col("nrm").as("qn"))
      val b = e.select(col("vec_id").as("vb"), col("label"),
        col("v").as("cv"), col("nrm").as("cn"))
      a.join(b, Seq("label"))
        .filter(col("va") < col("vb"))
        .select(col("va"), col("vb"), cosCol.as("cos"))
        .filter(col("cos") >= 0.95)
        .orderBy("va", "vb")
    }
  )
}
