package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management building blocks for 100 TB operation.
  * These are library operators (exercised by ScaleOpsSpec) rather than
  * declared oracle queries — their *results* equal the naive formulation
  * by construction; what differs is the physical plan.
  */
object ScaleOps {

  /** Two-stage salted sum/count aggregate: groupBy(key, salt) partial →
    * groupBy(key) final. Breaks a hot key across `salts` reducers — the
    * manual fallback when AQE skew-join splitting doesn't apply (single
    * giant group in an aggregation). Map-side partial aggregation already
    * handles *moderate* skew; salting is for keys whose partials alone
    * overwhelm one reducer.
    */
  def saltedSumCount(df: DataFrame, key: Column, metric: Column,
      salts: Int): DataFrame =
    df.select(key.as("k"), metric.as("m"))
      // DETERMINISTIC salt: a grouping key derived from
      // monotonically_increasing_id() (the previous formulation) is the
      // SPARK-23207 retry hazard — a recomputed map task re-salts its
      // rows differently than the partials some reducers already
      // fetched, silently double-counting or dropping rows. Hashing the
      // row's own values spreads a hot key across salts whenever the
      // metric varies (identical (k, m) duplicates share a salt — skew
      // relief degrades only in the all-duplicates corner, correctness
      // never).
      .withColumn("salt", pmod(hash(col("k"), col("m")), lit(salts)))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("m")).as("s"), count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(sum(col("s")).as("total"), sum(col("c")).as("n"))

  /** Bucketed range self-join: pairs of rows with the same key whose
    * timestamps lie within `windowUs` microseconds, without an
    * inequality join (which plans as a nested loop). Each row probes its
    * own time bucket ±1 (bucket width = windowUs), so a true pair meets
    * on exactly one bucket value — equi-join on (key, bucket), then the
    * exact |Δt| filter. Output: (key, ea, eb, gap_us) with ea < eb.
    */
  def bucketedRangeSelfJoin(df: DataFrame, key: Column, id: Column,
      tsUs: Column, windowUs: Long): DataFrame = {
    val e = df.select(key.as("k"), id.as("id"), tsUs.as("us"))
    // Integer division for the bucket (a double division would lose
    // precision near 2^53 and round instead of floor).
    val bucket = expr(s"us div ${windowUs}L")
    val own = e.withColumn("b", bucket)
    val probe = e
      .withColumn("b0", bucket)
      .withColumn("b",
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")
    own.as("a").join(probe.as("p"),
        col("a.k") === col("p.k") && col("a.b") === col("p.b") &&
          col("a.id") < col("p.id"))
      .filter(abs(col("a.us") - col("p.us")) <= windowUs)
      .select(col("a.k").as("k"), col("a.id").as("ea"),
        col("p.id").as("eb"), (col("p.us") - col("a.us")).as("gap_us"))
  }

  /** Broadcast-hint helper: the small side of an enrichment join must
    * broadcast (the reference's 8-row dim pattern). Spark auto-broadcasts
    * under the threshold; the explicit hint pins the plan when statistics
    * are missing (e.g. post-transform dims with unknown size).
    */
  def broadcastEnrich(fact: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)
}
