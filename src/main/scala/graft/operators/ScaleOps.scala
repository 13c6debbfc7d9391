package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Rolling z-score anomaly detection over an event stream — flag
    * events whose value deviates from the per-key rolling baseline.
    * Cross-engine exactness via the agg_stats moment trick: quantize
    * value to integer MILLIS, keep the rolling sums (S, SS) in exact
    * int64, and derive z = (n·x − S) / sqrt(n·SS − S²) from those
    * integers — the remaining double ops (−, ×, /, sqrt) are
    * IEEE-correctly-rounded from identical inputs, so any engine
    * produces identical bits. No stddev_samp (whose Welford vs
    * sum-of-squares internals differ across engines). Headroom: with
    * |x| ≤ ~3e6 millis and frame ≤ 32, n·SS stays well under int64.
    * Scale: one shuffle on user_id; O(1)-per-row rolling integer sums
    * in the frame; no global window. z is NULL while the baseline is
    * thin (n < minN) or flat (zero variance).
    */
  def rollingZScore(events: DataFrame, frame: Int = 20,
      minN: Int = 5, threshMicro: Long = 2000000L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(frame - 1), 0)
    events
      .withColumn("x", expr("cast(round(value * 1000) as bigint)"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sw", sum(col("x")).over(w))
      .withColumn("ssw", sum(expr("x * x")).over(w))
      .select(
        col("event_id"), col("user_id"),
        expr("cast(n as int)").as("n_w"),
        expr(
          s"""case when n >= $minN and n*ssw - sw*sw > 0
             |     then cast(round(cast(n*x - sw as double)
             |            / sqrt(cast(n*ssw - sw*sw as double))
             |            * 1000000) as bigint)
             |     else null end""".stripMargin).as("z_micro"))
      .withColumn("is_anomaly",
        expr(s"z_micro is not null and abs(z_micro) >= $threshMicro"))
  }
}
