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
      .withColumn("salt", pmod(hash(col("k"), monotonically_increasing_id()),
        lit(salts)))
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("m")).as("s"), count(lit(1)).as("c"))
      .groupBy(col("k"))
      .agg(sum(col("s")).as("total"), sum(col("c")).as("n"))

  /** Broadcast-hint helper: the small side of an enrichment join must
    * broadcast (the reference's 8-row dim pattern). Spark auto-broadcasts
    * under the threshold; the explicit hint pins the plan when statistics
    * are missing (e.g. post-transform dims with unknown size).
    */
  def broadcastEnrich(fact: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)
}
