package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Keyed-upsert sink for foreachBatch: the contract the reference's
  * "upsertToMySQL" claims but does not implement (it appends into a
  * PRIMARY KEY (window_start, location) table —
  * spark_consumer_kafka.py:131-157; first late-data re-emission under
  * update output mode would violate the PK). Here: rows whose key already
  * exists are replaced by the new batch's row (INSERT … ON DUPLICATE KEY
  * UPDATE semantics), parquet-backed.
  *
  * Writes happen through executors (DataFrame parquet writer — never a
  * driver-side row loop); the merge is an anti-join on the key, which at
  * scale is a broadcast of the (small) changed-keys set against the
  * store. Batches are applied atomically via write-to-temp + directory
  * swap.
  *
  * `mergeMin = true` switches the collision rule from replace-with-
  * latest to MERGE BY MIN over every non-key column (union + one
  * keyed min-aggregate — the LSM-fold shape): the store converges to
  * the per-key minimum across every batch ever applied, which is what
  * a TTL-bounded canonical-keeper election requires — an evicted key's
  * re-emission carries a locally-elected (higher) keeper, and the
  * store-side min re-canonicalizes it against the resident value
  * (StatefulOps.canonicalKeepersBounded's contract).
  */
final class ParquetUpsertSink(val path: String, val keyCols: Seq[String],
    val mergeMin: Boolean = false) {

  def upsert(batch: DataFrame, batchId: Long): Unit = synchronized {
    // If a previous swap crashed between its two moves, the store lives
    // at .bak — restore it BEFORE reading, or this batch would merge
    // against nothing and the backup would be discarded below.
    recover()
    // The batch drives multiple actions (isEmpty, then a write whose
    // plan references it twice) — persist per the foreachBatch
    // contract, or the upstream stateful aggregation re-executes up to
    // three times per trigger.
    batch.persist()
    try upsertPersisted(batch)
    finally batch.unpersist(): Unit
  }

  private def upsertPersisted(batch0: DataFrame): Unit = {
    // Empty-batch short-circuit (reference A7, spark_consumer_kafka.py:132).
    if (batch0.isEmpty) return
    // Enforce the PK invariant WITHIN the batch too: a non-key-unique
    // batch (anything other than a key-unique streaming aggregate)
    // would union intra-batch duplicates straight into the store.
    // Under mergeMin the keyed min-aggregate below is already
    // key-unique and order-free — no winner selection needed.
    val batch =
      if (mergeMin) batch0 else SinkOps.keyUniqueLatest(batch0, keyCols)
    val spark = batch.sparkSession
    val dir = new File(path)
    val nonKey = batch.columns.filterNot(keyCols.contains).toSeq
    require(!mergeMin || nonKey.nonEmpty,
      "mergeMin needs at least one non-key column to take the min of")
    def minMerged(rows: DataFrame): DataFrame = rows
      .groupBy(keyCols.map(rows(_)): _*)
      .agg(org.apache.spark.sql.functions.min(nonKey.head)
          .as(nonKey.head),
        nonKey.tail.map(c => org.apache.spark.sql.functions.min(c)
          .as(c)): _*)
    val merged =
      if (!dir.exists()) { if (mergeMin) minMerged(batch) else batch }
      else if (mergeMin)
        minMerged(spark.read.parquet(path).unionByName(batch))
      else {
        val existing = spark.read.parquet(path)
        existing.join(batch.select(keyCols.map(batch(_)): _*),
            keyCols, "left_anti")
          .unionByName(batch)
      }
    val tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    // Crash-safe swap: park the old store aside BEFORE moving the new one
    // in, so no window exists where both the old and new data are gone —
    // a crash leaves either the old store (at path or .bak) or the new
    // one in place, never nothing.
    val bak = Paths.get(path + ".bak")
    deleteRecursively(bak.toFile)
    if (dir.exists())
      Files.move(Paths.get(path), bak, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(path),
      StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(bak.toFile)
  }

  /** Recover after a crash: if only the .bak survives (crash between the
    * two moves), restore it. Called before first use of an existing store.
    */
  def recover(): Unit = synchronized {
    val bak = Paths.get(path + ".bak")
    if (!new File(path).exists() && bak.toFile.exists())
      Files.move(bak, Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Current store contents (for assertions / downstream reads). A
    * post-crash read before any upsert must also see the .bak backup,
    * so recover first. Takes the sink monitor and MATERIALIZES the
    * snapshot (eager localCheckpoint) before returning: an unlocked
    * lazy read could list files mid-directory-swap — or list them now
    * and execute after a swap moved them away. The returned frame is
    * therefore a point-in-time snapshot, independent of later upserts.
    */
  def read(spark: org.apache.spark.sql.SparkSession): DataFrame =
    synchronized {
      recover()
      spark.read.parquet(path).localCheckpoint()
    }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) f.delete(): Unit
  }
}

/** Sink-shared batch normalization — ONE definition of the
  * intra-batch PK dedup rule so the parquet and JDBC upsert sinks
  * cannot drift apart on winner selection.
  */
private[graft] object SinkOps {

  /** Deterministic key-unique projection: per key, the GREATEST
    * non-key struct wins (any total order works for the PK contract;
    * greatest-struct is stable under shuffle order and engine
    * version). Keys with no non-key columns dedup plainly.
    */
  def keyUniqueLatest(batch0: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val nonKey = batch0.columns.filterNot(keyCols.contains).toSeq
    if (nonKey.isEmpty) batch0.dropDuplicates(keyCols)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(batch0(_)): _*)
        .orderBy(nonKey.map(c => batch0(c).desc): _*)
      batch0
        .withColumn("__rn",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(org.apache.spark.sql.functions.col("__rn") === 1)
        .drop("__rn")
    }
  }
}
