package graft.operators

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerApplicationEnd}
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
  * Lifecycle beyond explicit clearCaches: the first memo against a
  * SparkContext installs an application-end listener that DROPS every
  * entry (and keyless-frame registration) when the context stops — the
  * storage died with the context, so only the references need
  * releasing; a long-lived process that stops and recreates Spark does
  * not accumulate dead sessions or frames (MemoLifecycleSpec asserts a
  * released session is weakly collectable). Note the inherent limit: a
  * session DISCARDED without stop or clearCaches cannot be detected —
  * its persisted storage is pinned by the shared CacheManager
  * regardless, so the only sound releases are explicit or at
  * context end.
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

  /** Keyless persisted frames handed to callers ("ownership passes to
    * the caller") — ALSO tracked here so `clearCaches` releases any the
    * caller leaked (ADVICE r5: pre-existing keyless call sites were
    * written against no-persist semantics and never unpersist).
    * Reference-identity keyed; unpersisting twice is a no-op, so a
    * disciplined caller's own unpersist composes fine.
    */
  private val keyless = mutable.Set.empty[DataFrame]

  /** Contexts whose application-end drop hook is installed. */
  private val hooked = mutable.Set.empty[org.apache.spark.SparkContext]

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

  private def installHook(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (!hooked.contains(sc)) {
      hooked += sc
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            e: SparkListenerApplicationEnd): Unit = dropAll()
      })
    }
  }

  /** Drop every reference WITHOUT unpersisting — for application end,
    * where the storage is already gone and unpersist would throw on the
    * stopped context.
    */
  private def dropAll(): Unit = synchronized {
    caches.values.foreach(_.clear())
    keyless.clear()
    hooked.clear()
  }

  /** Per-(cache, session, key) build locks — transient (removed after
    * each build completes), so no strong session references accumulate.
    */
  private val buildLocks =
    new java.util.concurrent.ConcurrentHashMap[
      (String, SparkSession, String), Object]()

  /** Build-or-reuse under `(cacheName, session, key)`. An empty key
    * disables memoization (the frame is still persisted when
    * `persistIt` — ownership passes to the caller, who unpersists;
    * clearCaches backstops leaked ones).
    *
    * The key must uniquely determine the RESULT: callers fold every
    * semantic parameter (thresholds p/q, corpus identity) into it —
    * two calls with the same key but different inputs would silently
    * return the first result.
    *
    * Concurrency: `build` runs OUTSIDE the process-global monitor —
    * some builds are minutes of eager Spark jobs (connected
    * components), and holding the global lock through them would
    * serialize every memoized operator in the JVM, including cache
    * hits for unrelated sessions. A per-key lock serializes concurrent
    * builders of the SAME key (second one reuses the first's result);
    * recursive builds (clusters → pairs → bands → shingles) acquire
    * key locks in one consistent order, so no cycles. Eviction of the
    * session's previous key happens only AFTER the new build
    * succeeds — a throwing build must not destroy the old cached
    * entry (or the checkpoint-backed frames callers still hold).
    */
  def memo(cacheName: String, spark: SparkSession, key: String,
      persistIt: Boolean)(build: => DataFrame): DataFrame = {
    synchronized { installHook(spark) }
    if (key.isEmpty) {
      val df = if (persistIt) build.persist() else build
      synchronized {
        // Bound the tracking set: entries the caller already released
        // (per the ownership contract) report no live storage — drop
        // them so a long-lived service calling keyless operators per
        // batch does not accumulate one strong DataFrame reference per
        // call forever. Genuinely leaked (still-stored) frames stay
        // tracked for clearCaches. Liveness covers BOTH storage forms:
        // Dataset persistence AND the localCheckpoint RDD blocks
        // behind checkpoint-truncated plans (a clusters() result is
        // storageLevel NONE at the Dataset layer yet pins executor
        // storage through its LogicalRDD — the persistIt=false frames
        // are tracked precisely so clearCaches can release those).
        keyless.filterInPlace(k =>
          k.storageLevel != org.apache.spark.storage.StorageLevel.NONE ||
            checkpointRdds(k).exists(_.getStorageLevel !=
              org.apache.spark.storage.StorageLevel.NONE))
        keyless += df
      }
      df
    } else {
      def lookup(): Option[DataFrame] = synchronized {
        caches.getOrElseUpdate(cacheName, mutable.Map.empty)
          .get((spark, key))
      }
      lookup().getOrElse {
        val lockKey = (cacheName, spark, key)
        val lock = buildLocks.computeIfAbsent(lockKey, _ => new Object)
        try lock.synchronized {
          lookup().getOrElse {
            val df = if (persistIt) build.persist() else build
            synchronized {
              val cache = caches.getOrElseUpdate(cacheName,
                mutable.Map.empty)
              // Put-if-absent, not overwrite: after a FAILED build the
              // lock entry is gone while a blocked builder still holds
              // the old lock object, so two builders can race past the
              // miss on different lock objects. Whoever inserts second
              // must not displace (and thereby leak the persist of)
              // the winner — release the duplicate and reuse.
              cache.get((spark, key)) match {
                case Some(winner) =>
                  if (persistIt) release(df, blocking = false)
                  winner
                case None =>
                  // Bound the cache AFTER the successful build: evict
                  // (and unpersist) the session's other keys — only
                  // one corpus dir is live at a time, and persisted
                  // storage would otherwise leak for the life of the
                  // session.
                  cache.keys.filter(k => k._1 == spark && k._2 != key)
                    .toList.foreach(k =>
                      cache.remove(k).foreach(release(_, blocking = false)))
                  cache((spark, key)) = df
                  df
              }
            }
          }
        } finally buildLocks.remove(lockKey): Unit
      }
    }
  }

  /** Test hook: keyed entries plus tracked keyless frames held for
    * `spark` — MemoLifecycleSpec asserts this reaches 0 after
    * clearCaches (i.e. Memo retains no strong reference to the session
    * or its frames; whether the session object itself then collects
    * depends on Spark-internal thread-locals, not on Memo).
    */
  private[graft] def entryCount(spark: SparkSession): Int = synchronized {
    caches.values.map(_.keys.count(_._1 eq spark)).sum +
      keyless.count(_.sparkSession eq spark)
  }

  /** Unpersist and drop every memoized DataFrame of `spark` (all
    * sessions when null) — keyed entries AND tracked keyless frames —
    * including localCheckpoint storage behind the cluster labels. Call
    * at the end of a Verify/Bench run; a test asserts no persisted
    * RDDs remain after this. After the drop no strong reference to the
    * released sessions survives in Memo (MemoLifecycleSpec).
    */
  def clearCaches(spark: SparkSession = null): Unit = synchronized {
    caches.values.foreach { cache =>
      cache.keys.filter(k => spark == null || k._1 == spark).toList
        .foreach(k => cache.remove(k).foreach(release(_, blocking = true)))
    }
    keyless.filter(df => spark == null || (df.sparkSession eq spark))
      .toList.foreach { df =>
        keyless -= df
        release(df, blocking = true)
      }
  }
}
