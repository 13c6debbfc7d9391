package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of expensive pipeline intermediates
  * (shingle sets, LSH band signatures, verified pair sets, cluster
  * labels, per-doc term counts). The dedup/corpus-prep operators
  * compose — `dedupKeep` consumes `clusters` consumes `verifiedPairs`
  * consumes `docShingles`; `tfIdfTopK` and `token_freq` share
  * `docTerms` — and without memoization each declared query re-runs
  * the whole upstream pipeline (tokenization is the CPU-dominant
  * stage; ReuseExchange cannot collapse branches whose column pruning
  * differs).
  *
  * Bounds: each named cache holds ONE live key per session (only one
  * corpus dir is active per process; inserting a different key evicts
  * and unpersists the old entry). `clearCaches` releases everything,
  * including localCheckpoint RDD storage behind checkpoint-truncated
  * plans (Dataset.unpersist alone leaves those blocks behind).
  *
  * Invalidation contract: a DataFrame returned from a memoized
  * operator is backed by persisted/checkpointed storage owned by the
  * cache — eviction or `clearCaches` invalidates it (checkpoint-
  * truncated plans cannot be recomputed once their blocks are
  * dropped). Do not retain references across eviction.
  */
private[graft] object Memo {

  private val caches =
    mutable.Map.empty[String, mutable.Map[(SparkSession, String), DataFrame]]

  /** The materialized RDDs behind a localCheckpoint'ed plan —
    * Dataset.unpersist only releases CacheManager entries, so checkpoint
    * storage must be dropped at the RDD level.
    */
  def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  private def release(df: DataFrame, blocking: Boolean): Unit = {
    df.unpersist(blocking)
    checkpointRdds(df).foreach(_.unpersist(blocking))
  }

  /** Build-or-reuse under `(cacheName, session, key)`. An empty key
    * disables memoization (the frame is still persisted when
    * `persistIt` — ownership passes to the caller, who unpersists).
    *
    * The key must uniquely determine the RESULT: callers fold every
    * semantic parameter (thresholds p/q, corpus identity) into it —
    * two calls with the same key but different inputs would silently
    * return the first result.
    */
  def memo(cacheName: String, spark: SparkSession, key: String,
      persistIt: Boolean)(build: => DataFrame): DataFrame = synchronized {
    if (key.isEmpty) { if (persistIt) build.persist() else build }
    else {
      val cache = caches.getOrElseUpdate(cacheName, mutable.Map.empty)
      cache.getOrElse((spark, key), {
        // Bound the cache: evict (and unpersist) other keys of this
        // session before inserting — only one corpus dir is live at a
        // time, and persisted storage would otherwise leak for the
        // life of the session.
        cache.keys.filter(k => k._1 == spark && k._2 != key).toList
          .foreach(k =>
            cache.remove(k).foreach(release(_, blocking = false)))
        val df = if (persistIt) build.persist() else build
        cache((spark, key)) = df
        df
      })
    }
  }

  /** Unpersist and drop every memoized DataFrame of `spark` (all
    * sessions when null), including localCheckpoint storage behind the
    * cluster labels. Call at the end of a Verify/Bench run; a test
    * asserts no persisted RDDs remain after this.
    */
  def clearCaches(spark: SparkSession = null): Unit = synchronized {
    caches.values.foreach { cache =>
      cache.keys.filter(k => spark == null || k._1 == spark).toList
        .foreach(k => cache.remove(k).foreach(release(_, blocking = true)))
    }
  }
}
