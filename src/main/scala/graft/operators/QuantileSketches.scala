package graft.operators

import scala.collection.mutable

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** KLL quantile sketches over grouped numeric columns — the
  * distribution question the theta/HLL/CMS pillar cannot answer:
  * "what is the p95 document length per source" without a per-group
  * sort. An exact grouped percentile is a per-group ORDER BY — at
  * 100 TB that is a corpus-sized shuffle whose reduce side must hold
  * every group's values; KLL answers any rank/quantile question from
  * per-group sketches built with NO value shuffle at all:
  *
  *   scan → per-partition partial sketches (one per group seen,
  *   ≤ ~k retained values each, independent of partition row count)
  *   → per-group merge (the shuffle moves partitions × groups
  *   KB-sized sketches, never values) → quantile reads off the
  *   groups-sized sketch table.
  *
  * Same manual map-side combine as [[ThetaSketches]]. Answers are
  * EXACT while a group's value count stays ≤ k (no compaction has
  * occurred — the regime the oracle exercises, where
  * `getQuantile(q, INCLUSIVE)` IS SQL-standard `percentile_disc(q)`:
  * the smallest value whose inclusive rank reaches q). In the
  * estimation regime compaction is randomized, so answers carry
  * KLL's ~1.65%/√k normalized rank-error envelope — SketchSpec's
  * gate, not the oracle's.
  */
object QuantileSketches {

  /** Per-group merged KLL sketches over (group, value) pairs.
    * Partial-per-partition then sketch-sized per-group reduce — the
    * only group-keyed shuffle payload is serialized sketches.
    *
    * MEMORY CONTRACT: a partition holds one ~k-value sketch per group
    * it sees, so the group key must be governance-scale (sources,
    * domains, languages — the ThetaSketches bound). For
    * high-cardinality keys, pre-aggregate with `groupBy(key)` +
    * repartition on the key first so each partition sees few groups.
    */
  def groupedSketches(vals: Dataset[(String, Double)],
      k: Int): Dataset[(String, Array[Byte])] = {
    val spark = vals.sparkSession
    import spark.implicits._
    vals
      .mapPartitions { it =>
        val partials = mutable.Map.empty[String, KllDoublesSketch]
        it.foreach { case (g, v) =>
          partials.getOrElseUpdate(g, KllDoublesSketch.newHeapInstance(k))
            .update(v)
        }
        partials.iterator.map { case (g, sk) => (g, sk.toByteArray) }
      }
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val m = KllDoublesSketch.newHeapInstance(k)
        it.foreach { case (_, b) =>
          m.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
        }
        (g, m.toByteArray)
      }
  }

  /** The (source, length) value stream every length-quantile consumer
    * sketches — null-text rows carry no length to rank. ONE definition
    * shared by the direct operator AND the store sidecar staging
    * (TermStatsStore): the store-merged ≡ one-pass parity contract
    * holds only while both sketch the byte-identical stream.
    */
  private[operators] def lengthVals(
      docs: DataFrame): Dataset[(String, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter(col("text").isNotNull)
      .select(col("source").cast("string"),
        length(col("text")).cast("double"))
      .as[(String, Double)]
  }

  /** Merge serialized KLL sketches into one — the per-source
    * epoch-sidecar merge (TermStatsStore): KB inputs, driver-side.
    * Exactness survives the merge while the combined value count
    * stays ≤ k (no compaction has ever fired).
    */
  def mergeAll(sketches: Seq[Array[Byte]], k: Int = 1024): Array[Byte] = {
    val m = KllDoublesSketch.newHeapInstance(k)
    sketches.foreach(b =>
      m.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    m.toByteArray
  }

  /** (p25, p50, p75, p95, n) off one serialized sketch. Quantile
    * values surface as BIGINT: lengths are integral and the INCLUSIVE
    * answer is always one of the ingested values, so the cast is
    * lossless and keeps the oracle hash engine-independent.
    */
  def lengthQuantileRow(b: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(b))
    def q(r: Double) = sk.getQuantile(r, INCLUSIVE).toLong
    (q(0.25), q(0.5), q(0.75), q(0.95), sk.getN)
  }

  /** Per-source document-length quantiles (p25/p50/p75/p95 of
    * `length(text)`) plus the sketch's exact stream count.
    */
  def sourceLengthQuantiles(docs: DataFrame, k: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    groupedSketches(lengthVals(docs), k)
      .map { case (src, b) =>
        val (p25, p50, p75, p95, n) = lengthQuantileRow(b)
        (src, p25, p50, p75, p95, n)
      }
      .toDF("source", "p25", "p50", "p75", "p95", "n_vals")
  }

  /** Length-outlier curation: keep documents whose character length
    * lies within the per-source [lo, hi] percentile band, cutoffs read
    * off the KLL sketches instead of a per-group corpus sort. The
    * cutoff table is sources-sized and BROADCAST — the corpus is
    * scanned once for the sketch build and once for the filter, with
    * no value shuffle in either pass. Emits (doc_id, source, n_chars)
    * for the kept documents.
    */
  def lengthTrim(docs: DataFrame, lo: Double = 0.05, hi: Double = 0.95,
      k: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cuts = groupedSketches(lengthVals(docs), k)
      .map { case (src, b) =>
        val sk = KllDoublesSketch.heapify(Memory.wrap(b))
        (src, sk.getQuantile(lo, INCLUSIVE).toLong,
          sk.getQuantile(hi, INCLUSIVE).toLong)
      }
      .toDF("source", "lo_len", "hi_len")
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .join(broadcast(cuts), "source")
      .filter(col("n_chars").between(col("lo_len"), col("hi_len")))
      .select("doc_id", "source", "n_chars")
  }
}
