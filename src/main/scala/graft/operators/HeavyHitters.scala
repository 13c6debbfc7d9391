package graft.operators

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-items (Misra–Gries style) heavy hitters over corpus terms
  * — "which terms exceed x% of all token occurrences" WITHOUT the
  * term-keyed aggregation `token_freq` pays. The exact answer groups
  * the corpus by term; the sketch answer is one scan:
  *
  *   docTerms scan → per-partition ItemsSketch partials (weighted
  *   update with tf, memory ≤ maxMapSize entries, independent of
  *   partition size) → driver-side merge over the partitions-sized
  *   byte list (the codebook-loop pattern) → getFrequentItems reads
  *   off the KB-sized merged sketch.
  *
  * Deterministic: the purge step (subtract the median counter, evict
  * non-positives) involves no randomness, so unlike KLL the ESTIMATION
  * regime is also reproducible. Counts are EXACT (error 0) while no
  * purge has occurred — guaranteed when distinct terms ≤ 0.75 ×
  * maxMapSize, the regime the oracle exercises; after purges the
  * per-item error is bounded by `getMaximumError` ≤ 3.5 n / maxMapSize
  * and NO_FALSE_NEGATIVES still returns a superset of every true
  * heavy hitter — SketchSpec's gate.
  */
object HeavyHitters {

  private val serde = new ArrayOfStringsSerDe

  /** Serialized-form round-trip — sidecar staging and merge reuse. */
  def toBytes(sk: ItemsSketch[String]): Array[Byte] = sk.toByteArray(serde)

  def fromBytes(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance[String](Memory.wrap(b), serde)

  /** Merge serialized sketches in the given order into one — the
    * per-epoch sidecar merge (TermStatsStore): KB inputs, driver-side.
    * Callers pass a STABLY ordered list (merge order steers the purge
    * sequence; the error bounds hold under any order, determinism
    * needs stability).
    */
  def mergeAll(sketches: Seq[Array[Byte]],
      maxMapSize: Int): ItemsSketch[String] = {
    val m = new ItemsSketch[String](maxMapSize)
    sketches.foreach(b => m.merge(fromBytes(b)): Unit)
    m
  }

  /** Heavy-hitter rows off a sketch: items whose lower bound clears
    * streamLength/divisor (NO_FALSE_POSITIVES — the guaranteed-true
    * subset; equal to the exact `HAVING count > total/divisor` while
    * no purge has occurred).
    */
  def hitterRows(sk: ItemsSketch[String],
      divisor: Long): Seq[(String, Long)] =
    sk.getFrequentItems(sk.getStreamLength / divisor,
        ErrorType.NO_FALSE_POSITIVES)
      .toSeq
      .map(r => (r.getItem, r.getEstimate))
      .sortBy(_._1)

  /** One merged frequent-items sketch over the (term, tf) stream.
    *
    * Two-tier merge so the driver never holds per-partition state: the
    * per-partition partials (≤ maxMapSize entries each) shuffle to at
    * most `reducers` executor-side mergers, and the driver collects ≤
    * `reducers` sketches regardless of input partition count — at 10k
    * scan partitions a flat collect would hand the driver GBs of
    * partials. MERGE ORDER is deterministic (tier membership is
    * `partitionId % reducers`; every merge happens in sorted id
    * order). Full run-to-run determinism additionally needs a
    * run-stable per-partition UPDATE order: guaranteed where it
    * matters — the no-purge regime, where results are order-
    * independent exact counts — while purge-regime estimates can vary
    * with shuffle fetch order upstream (the error bounds and the
    * no-false-negative contract hold regardless; SketchSpec gates
    * those, not byte identity).
    */
  def termSketch(terms: DataFrame, maxMapSize: Int,
      reducers: Int = 64): ItemsSketch[String] = {
    val spark = terms.sparkSession
    import spark.implicits._
    val tier2 = terms
      .select(col("term").cast("string"), col("tf").cast("long"))
      .as[(String, Long)]
      .rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val sk = new ItemsSketch[String](maxMapSize)
        it.foreach { case (t, w) => sk.update(t, w) }
        Iterator.single((idx, sk.toByteArray(serde)))
      }
      .groupBy { case (idx, _) => idx % reducers }
      .map { case (r, its) =>
        (r, mergeAll(its.toSeq.sortBy(_._1).map(_._2), maxMapSize)
          .toByteArray(serde))
      }
      .collect()
    mergeAll(tier2.sortBy(_._1).map(_._2).toSeq, maxMapSize)
  }

  /** Terms whose total occurrence count exceeds streamLength/divisor,
    * with estimates. NO_FALSE_POSITIVES keeps only items whose LOWER
    * bound clears the threshold — in the no-purge regime lower =
    * estimate = truth, so the returned set is exactly
    * `HAVING count > total/divisor` (the oracle shape); under purges
    * it is the guaranteed-true subset, the conservative side for
    * governance decisions.
    */
  def termHeavyHitters(docs: DataFrame, divisor: Long = 50L,
      maxMapSize: Int = 32768, cacheKey: String = ""): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    hitterRows(termSketch(Pipeline.docTerms(docs, cacheKey), maxMapSize),
        divisor)
      .toDF("term", "est_count")
  }
}
