package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The documents half of the at-rest layout story (VERDICT r8
  * directive 2; siblings: Dedup.writeSignatureStore — the (band, sig)-
  * bucketed signature table — and Similarity.writeIvfStore — the
  * cell-partitioned vector table).
  *
  * A 100 TB document corpus lives PARTITIONED BY source: governance
  * queries (domain stats/filters, per-source dup shares, term lift,
  * mixture sampling) are all source-scoped or source-grouped, so the
  * layout turns their scans into directory-pruned reads — a
  * source-filtered pass reads that source's files and nothing else,
  * and source-grouped aggregation starts from source-clustered input.
  * Intake appends land as new files under their source directory
  * (dynamic partition append), never rewriting resident data — the
  * documents counterpart of the signature store's "the corpus never
  * reshuffles on intake" contract, pinned by AtRestLayoutSpec.
  */
object AtRestStores {

  /** Write the documents table partitioned by source. Source
    * cardinality is governance-sized (tens to thousands), so the
    * directory fan-out stays far below filesystem limits; a source
    * whose files are tiny is compacted by the normal maxRecordsPerFile
    * / AQE-coalesce levers, not a layout change.
    */
  def writeDocumentsStore(docs: DataFrame, path: String): Unit =
    docs.write.partitionBy("source").mode("overwrite").parquet(path)

  /** Read the store back; filters on `source` prune at the directory
    * level (assert PartitionFilters in the scan, not Filter above it).
    */
  def documentsStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
