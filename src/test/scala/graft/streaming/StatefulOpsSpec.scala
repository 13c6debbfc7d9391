package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulOpsSpec extends AnyFunSuite {

  import StatefulOps._

  // Drives a runningTotals variant through two triggers and returns the
  // last emission per key.
  private def drive(name: String,
      f: org.apache.spark.sql.Dataset[KeyedValue] =>
        org.apache.spark.sql.Dataset[RunningTotal])
      : Map[String, RunningTotal] = {
    val spark = TestSpark.spark
    import spark.implicits._
    val source = MemoryStream[KeyedValue](spark)
    val query = f(source.toDS())
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    source.addData(KeyedValue("a", 1.0), KeyedValue("a", 2.0),
      KeyedValue("b", 10.0))
    query.processAllAvailable()
    source.addData(KeyedValue("a", 3.0))
    query.processAllAvailable()
    query.stop()
    // Memory sink in update mode appends each emission; the LAST row per
    // key is the current state.
    spark.table(name).as[RunningTotal].collect()
      .groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.n) }
  }

  test("transformWithState accumulates running totals across batches") {
    val last = drive("running_totals_tws", runningTotals)
    assert(last("a") == RunningTotal("a", 3L, 6.0))
    assert(last("b") == RunningTotal("b", 1L, 10.0))
  }

  test("mapGroupsWithState fallback is behavior-identical") {
    val last = drive("running_totals_mgws", runningTotalsMgws)
    assert(last("a") == RunningTotal("a", 3L, 6.0))
    assert(last("b") == RunningTotal("b", 1L, 10.0))
  }

  test("canonical-keeper election: order- and batching-insensitive, " +
    "converges to min per content key") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Adversarial feed: duplicates arrive LATE-keeper-first, split so
    // group "k2" straddles the batch boundary — the second batch's
    // lower id must beat the recovered state's earlier election.
    val feed = Seq(
      DocKey("k1", 7L), DocKey("k1", 3L), DocKey("k2", 9L),
      DocKey("k3", 4L)) ++ Seq(
      DocKey("k2", 2L), DocKey("k1", 5L), DocKey("k3", 8L))
    val source = MemoryStream[DocKey](spark)
    // Per-batch emissions captured WITH their batch id (ADVICE r13: a
    // min over all emissions would mask a broken ValueState recovery —
    // an early correct emission hides a wrong later one; the property
    // under test is the LAST emission per key).
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Keeper)]
    val query = canonicalKeepers(source.toDS())
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Keeper],
          id: Long) =>
        val rows = b.collect()
        emitted.synchronized { emitted ++= rows.map(id -> _) }: Unit
      }
      .start()
    feed.grouped(4).foreach { chunk =>
      source.addData(chunk.toSeq: _*)
      query.processAllAvailable()
    }
    query.stop()
    val last = emitted.synchronized {
      emitted.groupBy(_._2.h)
        .map { case (k, v) => k -> v.maxBy(_._1)._2.keeper }
    }
    assert(last == Map("k1" -> 3L, "k2" -> 2L, "k3" -> 4L))
    // The straddling group's batch-2 emissions specifically: k2's new
    // minimum wins AND k1/k3's recovered round-1 elections beat their
    // higher round-2 arrivals — state recovery asserted on the
    // emissions themselves, not on a convergence artifact.
    val batch2 = emitted.synchronized {
      emitted.filter(_._1 == 1L).map(e => e._2.h -> e._2.keeper).toMap
    }
    assert(batch2 == Map("k1" -> 3L, "k2" -> 2L, "k3" -> 4L))
  }

  test("bounded keeper election: TTL evicts cold keys from state, a " +
    "recurring cold key re-elects locally (the eviction witness), and " +
    "min-over-emissions still equals the global minimum") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Under TimeMode.ProcessingTime every TTL-cleanup no-data batch
    // advances the clock and schedules another — processAllAvailable
    // never settles (the declared streaming_dedup_bounded run hit the
    // same livelock under AvailableNow). Eviction is lazy-on-access
    // with these off; the assertions below account for that.
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndSaved = spark.conf.get(ndKey)
    spark.conf.set(ndKey, "false")
    try {
    val ttl = java.time.Duration.ofMillis(300)
    val source = MemoryStream[DocKey](spark)
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Keeper)]
    val query = canonicalKeepersBounded(source.toDS(), ttl)
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Keeper],
          id: Long) =>
        val rows = b.collect()
        emitted.synchronized { emitted ++= rows.map(id -> _) }: Unit
      }
      .start()
    def stateRows: Long = query.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)

    source.addData(DocKey("a", 1L), DocKey("b", 2L), DocKey("c", 3L),
      DocKey("d", 4L), DocKey("e", 5L))
    query.processAllAvailable()
    val hotRows = stateRows
    Thread.sleep(ttl.toMillis * 3)
    // "a" recurs COLD with a higher id: live state would emit 1; an
    // evicted key re-elects locally and must emit 50.
    source.addData(DocKey("x", 100L), DocKey("a", 50L))
    query.processAllAvailable()
    val aBatch2 = emitted.synchronized {
      emitted.filter(e => e._1 == 1L && e._2.h == "a").map(_._2.keeper)
    }
    Thread.sleep(ttl.toMillis * 3)
    source.addData(DocKey("y", 200L))
    query.processAllAvailable()
    val finalRows = stateRows
    query.stop()

    assert(hotRows == 5L, s"hot window must hold all 5 keys: $hotRows")
    assert(aBatch2 == Seq(50L),
      s"evicted key must re-elect locally, got $aBatch2")
    // The bound: state after eviction holds the hot window, not the
    // 7-key lifetime key space (batch-3 cleanup removes the expired
    // batch-1/2 entries; only keys touched within the TTL remain).
    assert(finalRows >= 1L && finalRows < 7L,
      s"state did not shrink below the lifetime key count: $finalRows")
    // The safety argument canonicalKeepersBounded documents: min over
    // ALL emissions equals the global min per key, evictions included
    // — which is exactly what a mergeMin ParquetUpsertSink stores.
    val byMin = emitted.synchronized {
      emitted.groupBy(_._2.h)
        .map { case (k, v) => k -> v.map(_._2.keeper).min }
    }
    assert(byMin == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L,
      "e" -> 5L, "x" -> 100L, "y" -> 200L))
    } finally spark.conf.set(ndKey, ndSaved)
  }

  test("event-time keeper election: watermark passage evicts a cold " +
    "key's state, a post-eviction recurrence re-elects locally, and " +
    "min-over-emissions still equals the global minimum") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // (h, docId, event-time epoch seconds)
    val source = MemoryStream[(String, Long, Long)](spark)
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Keeper)]
    val keyed = source.toDS().toDF("h", "docId", "sec")
      .select(col("h"), col("docId"),
        col("sec").cast("timestamp").as("ts"))
      .as[DocKeyT]
      .withWatermark("ts", "10 seconds")
    val query = canonicalKeepersEventTime(keyed, delayMs = 5000L)
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Keeper],
          id: Long) =>
        val rows = b.collect()
        emitted.synchronized { emitted ++= rows.map(id -> _) }: Unit
      }
      .start()

    // Event time 10s: timers land at 15s; watermark after the batch is
    // 0s (10s − 10s delay), so nothing can fire yet.
    source.addData(("a", 5L, 10L), ("b", 9L, 10L))
    query.processAllAvailable()
    // A far-future key advances the watermark to 190s AFTER this batch
    // (watermark updates post-batch — the a/b timers survive it).
    source.addData(("c", 1L, 200L))
    query.processAllAvailable()
    // This batch opens with watermark 190s ≥ the 15s expiry: the a/b
    // timers fire and their election state clears.
    source.addData(("d", 2L, 201L))
    query.processAllAvailable()
    // "a" recurs with a HIGHER id: live state would emit min(5,7)=5;
    // watermark-evicted state re-elects locally and must emit 7 — the
    // eviction witness.
    source.addData(("a", 7L, 202L))
    query.processAllAvailable()
    query.stop()

    val aEmissions = emitted.synchronized {
      emitted.filter(_._2.h == "a").sortBy(_._1).map(_._2.keeper)
    }
    assert(aEmissions == Seq(5L, 7L),
      s"expected live election then evicted re-election, got $aEmissions")
    // The min-merge safety argument is eviction-rule-agnostic: min over
    // ALL emissions equals the global min per key — exactly what the
    // EpochMinStore downstream converges to under either clock.
    val byMin = emitted.synchronized {
      emitted.groupBy(_._2.h)
        .map { case (k, v) => k -> v.map(_._2.keeper).min }
    }
    assert(byMin ==
      Map("a" -> 5L, "b" -> 9L, "c" -> 1L, "d" -> 2L))
  }

  test("streaming KLL state: quantiles over a microbatch split equal " +
    "the batch sketch over the whole corpus (exact regime)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val vals = docs.select(
        org.apache.spark.sql.functions.col("source").cast("string"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("double"))
      .as[(String, Double)].collect()
      .map { case (s, v) => KeyedValue(s, v) }
    val source = MemoryStream[KeyedValue](spark)
    val query = keyQuantiles(source.toDS())
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("kll_state")
      .start()
    // Three microbatches — state must carry the sketch across triggers.
    vals.grouped(math.max(vals.length / 3, 1)).foreach { chunk =>
      source.addData(chunk.toSeq: _*)
      query.processAllAvailable()
    }
    query.stop()
    val last = spark.table("kll_state").as[KeyQuantiles].collect()
      .groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.nVals) }
    val want = graft.operators.QuantileSketches
      .sourceLengthQuantiles(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> KeyQuantiles(r._1, r._2, r._3, r._4, r._5, r._6))
      .toMap
    assert(last == want,
      "streamed sketch state diverged from the one-pass batch sketch")
  }

  test("streaming HLL state: distinct counts over a microbatch split " +
    "equal the batch hll_sketch_agg path (coupon regime)") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val terms = docs.select(
        org.apache.spark.sql.functions.col("source").cast("string"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("norm_tokens(text)"))
          .as("term"))
      .as[(String, String)].collect()
      .flatMap { case (s, t) =>
        Seq(KeyedTerm(s, t), KeyedTerm("__all__", t)) }
    val source = MemoryStream[KeyedTerm](spark)
    val query = keyDistinct(source.toDS())
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("hll_state")
      .start()
    // Three microbatches — the serialized sketch must carry across
    // triggers (a per-batch sketch would undercount every key).
    terms.grouped(math.max(terms.length / 3, 1)).foreach { chunk =>
      source.addData(chunk.toSeq: _*)
      query.processAllAvailable()
    }
    query.stop()
    val last = spark.table("hll_state").as[KeyDistinct].collect()
      .groupBy(_.key)
      .map { case (k, v) => k -> v.map(_.distinct_terms).max }
    val want = graft.operators.Corpus.hllDistinctTerms(docs)
      .as[(String, Long)].collect().toMap
    assert(last == want,
      "streamed HLL state diverged from the batch sketch path")
  }
}
