package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** Custom keyed state beyond windowed aggregation — built on
  * `transformWithState` (Spark 4's arbitrary-stateful-processing
  * operator), the primitive for state the built-in operators can't
  * express (running totals across the whole stream lifetime, not per
  * window).
  *
  * The reference needs only windowed state (T5); this is the extension
  * point a production pipeline reaches for next (e.g. per-source running
  * document counts feeding dedup back-pressure). State is per-key and
  * partition-local after the groupByKey shuffle — at 1000 executors each
  * task owns its key range's state store; nothing is driver-side.
  *
  * `transformWithState` REQUIRES the RocksDB state store provider
  * (GraftConf sets it session-wide — also the right provider for
  * large state: off-heap, incremental changelog checkpointing). The
  * legacy `mapGroupsWithState` formulation is kept as
  * [[runningTotalsMgws]], the documented fallback for deployments
  * pinned to the HDFS-backed provider; StatefulOpsSpec asserts both
  * produce identical results.
  */
object StatefulOps {

  final case class KeyedValue(key: String, value: Double)

  final case class RunningTotal(key: String, n: Long, total: Double)

  /** One ValueState[RunningTotal] per key; unbounded lifetime (pass a
    * TTLConfig for unbounded-key deployments — state TTL is a
    * first-class transformWithState feature, one of the reasons to
    * migrate off mapGroupsWithState's manual timeout bookkeeping).
    */
  private final class RunningTotalProcessor
      extends StatefulProcessor[String, KeyedValue, RunningTotal] {
    @transient private var state: ValueState[RunningTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningTotal]("runningTotal",
        Encoders.product[RunningTotal], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      val prev =
        if (state.exists()) state.get() else RunningTotal(key, 0L, 0.0)
      // Sorted fold (the ZScoreProcessor discipline): the group
      // iterator reflects shuffle fetch order, and a Double sum is
      // order-sensitive — an unsorted fold would make totals differ
      // across task retries and across the RocksDB/HDFS twins.
      val next = rows.toSeq.sortBy(_.value).foldLeft(prev)((acc, r) =>
        RunningTotal(key, acc.n + 1, acc.total + r.value))
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Running (count, total) per key, emitted each trigger for keys seen
    * in the batch. Update output mode; no TTL — state lives for the
    * stream's lifetime (bound it with a TTLConfig in unbounded-key
    * deployments).
    */
  def runningTotals(ds: Dataset[KeyedValue]): Dataset[RunningTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  private def update(key: String, rows: Iterator[KeyedValue],
      state: GroupState[RunningTotal]): RunningTotal = {
    val prev = state.getOption.getOrElse(RunningTotal(key, 0L, 0.0))
    // Sorted fold — see RunningTotalProcessor.
    val next = rows.toSeq.sortBy(_.value).foldLeft(prev)((acc, r) =>
      RunningTotal(key, acc.n + 1, acc.total + r.value))
    state.update(next)
    next
  }

  /** [[runningTotals]] on the legacy `mapGroupsWithState` API —
    * fallback for sessions that cannot run the RocksDB provider.
    */
  def runningTotalsMgws(ds: Dataset[KeyedValue]): Dataset[RunningTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .mapGroupsWithState[RunningTotal, RunningTotal](
        GroupStateTimeout.NoTimeout)(update)
  }

  // ---- Streaming rolling z-score (batch analog: ScaleOps.rollingZScore) --

  /** Streaming input row: ts pre-converted to epoch micros (a Long
    * keeps the state encoder and cross-engine semantics trivial). */
  final case class ZEvent(eventId: Long, userId: Long, tsUs: Long,
      value: Double)

  /** Output contract — column-for-column the batch operator's row. */
  final case class ZScore(eventId: Long, userId: Long, nW: Int,
      zMicro: Option[Long], isAnomaly: Boolean)

  /** Per-key ring of the last frame−1 quantized values, oldest first. */
  final case class ZRing(xs: List[Long])

  /** z = (n·x − S)/sqrt(n·SS − S²) from exact integer rolling moments:
    * quantization and the final round use BigDecimal HALF_UP
    * (bit-matching Spark SQL `round`, which diverges from math.round
    * on negative .5 boundaries).
    */
  private def zFrom(n: Long, x: Long, s: Long, ss: Long, minN: Int,
      threshMicro: Long): (Int, Option[Long], Boolean) = {
    val varN = n * ss - s * s
    if (n >= minN && varN > 0) {
      val z = (n * x - s).toDouble / math.sqrt(varN.toDouble)
      val zMicro = java.math.BigDecimal.valueOf(z * 1000000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      (n.toInt, Some(zMicro), math.abs(zMicro) >= threshMicro)
    } else (n.toInt, None, false)
  }

  private def quantMillis(value: Double): Long =
    java.math.BigDecimal.valueOf(value * 1000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private final class ZScoreProcessor(frame: Int, minN: Int,
      threshMicro: Long)
      extends StatefulProcessor[Long, ZEvent, ZScore] {
    @transient private var ring: ValueState[ZRing] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getValueState[ZRing]("zring",
        Encoders.product[ZRing], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ZEvent],
        timerValues: TimerValues): Iterator[ZScore] = {
      // In-batch determinism: process a key's rows in event-time order
      // (the shuffled iterator order is not stable). CROSS-batch order
      // is arrival order by construction — stream/batch parity holds
      // for in-order feeds; late rows get the baseline as of arrival
      // (the streaming-native semantics).
      val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.eventId))
      // Rolling S/SS maintained incrementally: O(frame) rebuild once
      // per (key, batch) from the ≤ frame−1 restored ring values,
      // then O(1) add/evict per event — integer sums, so the rolling
      // update is exact (no FP cancellation drift).
      val buf = scala.collection.mutable.ArrayDeque.from(
        if (ring.exists()) ring.get().xs else Nil)
      var s = 0L; var ss = 0L
      buf.foreach { v => s += v; ss += v * v }
      val out = sorted.map { e =>
        val x = quantMillis(e.value)
        buf.append(x); s += x; ss += x * x
        if (buf.size > frame) {
          val old = buf.removeHead(); s -= old; ss -= old * old
        }
        val (nW, zMicro, anom) =
          zFrom(buf.size.toLong, x, s, ss, minN, threshMicro)
        ZScore(e.eventId, e.userId, nW, zMicro, anom)
      }
      if (buf.size > frame - 1) buf.removeHead()
      ring.update(ZRing(buf.toList))
      out.iterator
    }
  }

  /** Streaming rolling z-score anomaly detection — the per-event
    * [[graft.operators.ScaleOps.rollingZScore]] contract (same window,
    * same integer-moment math, same NULL-while-thin/flat rule) as a
    * `transformWithState` stream: one ValueState ring of ≤ frame−1
    * Longs per user, so state size is bounded and key-sharded across
    * executors. StreamingZScoreSpec pins exact row parity against the
    * batch operator on an in-order feed split across microbatches.
    */
  def zScores(ds: Dataset[ZEvent], frame: Int = 20, minN: Int = 5,
      threshMicro: Long = 2000000L): Dataset[ZScore] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.userId)
      .transformWithState(new ZScoreProcessor(frame, minN, threshMicro),
        TimeMode.None(), OutputMode.Update())
  }

  // ---- Streaming canonical-keeper election (batch analog: the
  //      min-doc_id-per-content-key keep rule of dedup_content /
  //      Dedup.exactDedup) ----

  /** One streamed document reference: its content key (e.g. md5 of a
    * normalized-text prefix) and its id.
    */
  final case class DocKey(h: String, docId: Long)

  /** The elected canonical carrier for a content key — the document
    * every later duplicate defers to.
    */
  final case class Keeper(h: String, keeper: Long)

  /** min(docId) per content key as ValueState — the DETERMINISTIC
    * streaming dedup: `dropDuplicatesWithinWatermark` keeps whichever
    * duplicate its shuffle happened to deliver first within a
    * micro-batch, so replays and retries can elect different rows;
    * electing the MINIMUM makes the winner a pure function of the
    * data regardless of batch boundaries, within-batch arrival order,
    * or restarts — and equal to the batch keep-lowest-doc_id rule, so
    * the streamed store converges to the batch oracle. State is one
    * Long per distinct content key; an unbounded-key production
    * deployment scopes it with a TTLConfig (the arrival-horizon
    * analog of dropDuplicatesWithinWatermark's delay).
    */
  private final class KeeperProcessor
      extends StatefulProcessor[String, DocKey, Keeper] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("keeper",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocKey],
        timerValues: TimerValues): Iterator[Keeper] = {
      var mn = if (state.exists()) state.get() else Long.MaxValue
      rows.foreach(r => if (r.docId < mn) mn = r.docId)
      state.update(mn)
      Iterator.single(Keeper(key, mn))
    }
  }

  /** Per-trigger emission of each seen key's current keeper; upsert
    * by `h` downstream and the store converges to min-per-key.
    */
  def canonicalKeepers(ds: Dataset[DocKey]): Dataset[Keeper] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.h)
      .transformWithState(new KeeperProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[KeeperProcessor]] with a BOUNDED hot window (VERDICT r13 #4):
    * election state carries a processing-time TTL, so stream state
    * holds only keys seen within the window instead of every key the
    * stream has ever carried — at 100 TB the unbounded form is the
    * whole dedup index living in RocksDB. The safety argument for
    * evicting: every emission is the min over a SUBSET of a key's
    * rows (state, when alive, is itself such a min), and every row is
    * covered by its batch's emission — so the min over all emissions
    * equals the global min regardless of evictions. Downstream must
    * therefore MERGE-BY-MIN into the at-rest store
    * (ParquetUpsertSink's mergeMin) rather than overwrite: a cold key
    * recurring after eviction re-emits a locally-elected (possibly
    * higher) keeper, and the store-side min is what re-canonicalizes
    * it against the resident value — state is a best-effort
    * suppression cache, the at-rest store is the source of truth.
    */
  private final class BoundedKeeperProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, DocKey, Keeper] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("keeper",
        Encoders.scalaLong, new TTLConfig(ttl))

    override def handleInputRows(key: String, rows: Iterator[DocKey],
        timerValues: TimerValues): Iterator[Keeper] = {
      var mn = if (state.exists()) state.get() else Long.MaxValue
      rows.foreach(r => if (r.docId < mn) mn = r.docId)
      state.update(mn)
      Iterator.single(Keeper(key, mn))
    }
  }

  /** [[canonicalKeepers]] with TTL-bounded election state — pair with
    * a min-merging upsert sink (see BoundedKeeperProcessor's safety
    * argument). TTL needs a clock: TimeMode.ProcessingTime.
    */
  def canonicalKeepersBounded(ds: Dataset[DocKey],
      ttl: java.time.Duration): Dataset[Keeper] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.h)
      .transformWithState(new BoundedKeeperProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** [[DocKey]] carrying its event time — the input of the
    * watermark-evicted election.
    */
  final case class DocKeyT(h: String, docId: Long,
      ts: java.sql.Timestamp)

  /** [[BoundedKeeperProcessor]] with EVENT-TIME eviction (VERDICT r14
    * next-round #6): the reference's streaming semantics (SURVEY §2.7)
    * bound state by WATERMARK, not wall clock — a key's election state
    * drops when the watermark passes its last-seen event time plus
    * `delayMs` (the `dropDuplicatesWithinWatermark` shape, with the
    * deterministic-min election instead of keep-first-delivered).
    * Mechanism: one event-time timer per key, re-registered at every
    * arrival (previous timers deleted — a key's state must outlive
    * recurring arrivals), cleared state on expiry. The min-merge
    * safety argument is eviction-rule-agnostic — every emission is
    * still the min of a subset and every row is covered — so the SAME
    * [[EpochMinStore]] downstream converges to the global min under
    * either clock (StatefulOpsSpec pins eviction + re-election +
    * store-side convergence against the batch rule).
    */
  private final class EventTimeKeeperProcessor(delayMs: Long)
      extends StatefulProcessor[String, DocKeyT, Keeper] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("keeper",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocKeyT],
        timerValues: TimerValues): Iterator[Keeper] = {
      val rs = rows.toSeq
      var mn = if (state.exists()) state.get() else Long.MaxValue
      rs.foreach(r => if (r.docId < mn) mn = r.docId)
      state.update(mn)
      // Slide the eviction horizon to last-seen + delay: delete any
      // previously registered timer first, or a stale earlier timer
      // would evict a key that is still arriving. Materialize the
      // timer list BEFORE deleting — mutating the timer column family
      // under the provider's live iterator is undefined (RocksDB).
      getHandle.listTimers().toSeq.foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      rs.map(_.ts.getTime).maxOption.foreach(last =>
        getHandle.registerTimer(last + delayMs))
      Iterator.single(Keeper(key, mn))
    }

    override def handleExpiredTimer(key: String,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[Keeper] = {
      state.clear()
      Iterator.empty
    }
  }

  /** [[canonicalKeepersBounded]] with watermark (event-time) eviction —
    * the input must carry a watermark on `ts` (set it upstream with
    * `withWatermark` before the groupByKey). Pair with a min-merging
    * store, exactly as the processing-time form.
    */
  def canonicalKeepersEventTime(ds: Dataset[DocKeyT],
      delayMs: Long): Dataset[Keeper] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.h)
      .transformWithState(new EventTimeKeeperProcessor(delayMs),
        TimeMode.EventTime(), OutputMode.Update())
  }

  // ---- Streaming per-key quantiles (batch analog:
  //      operators.QuantileSketches.sourceLengthQuantiles) ----

  /** Serialized KLL sketch as keyed state — the mergeable-sketch
    * pattern applied to STREAMING: state per key is ≤ a few KB
    * regardless of how many values the key has ever seen, the
    * bound that makes lifetime-of-the-stream distribution tracking
    * viable where a value buffer would grow without limit.
    */
  final case class SketchState(sk: Array[Byte])

  /** Emitted each trigger for keys seen in the batch: the CURRENT
    * distribution summary over everything the key has streamed.
    */
  final case class KeyQuantiles(key: String, p25: Long, p50: Long,
      p75: Long, p95: Long, nVals: Long)

  private final class QuantileProcessor(k: Int)
      extends StatefulProcessor[String, KeyedValue, KeyQuantiles] {
    @transient private var state: ValueState[SketchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SketchState]("kll",
        Encoders.product[SketchState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
        timerValues: TimerValues): Iterator[KeyQuantiles] = {
      import org.apache.datasketches.kll.KllDoublesSketch
      import org.apache.datasketches.memory.Memory
      val sk =
        if (state.exists())
          KllDoublesSketch.heapify(Memory.wrap(state.get().sk))
        else KllDoublesSketch.newHeapInstance(k)
      // Sorted fold (the RunningTotalProcessor discipline): KLL's
      // buffer layout depends on update order, so an unsorted fold
      // would let shuffle fetch order leak into the state bytes across
      // task retries. Sorting makes the bytes retry-stable in the
      // never-compacted regime (≤ k values per key — no randomness has
      // entered); past that, compaction draws random bits, so only the
      // rank-error envelope — not byte identity — is the contract.
      rows.toSeq.sortBy(_.value).foreach(r => sk.update(r.value))
      val bytes = sk.toByteArray
      state.update(SketchState(bytes))
      val (p25, p50, p75, p95, n) =
        graft.operators.QuantileSketches.lengthQuantileRow(bytes)
      Iterator.single(KeyQuantiles(key, p25, p50, p75, p95, n))
    }
  }

  /** Streaming per-key quantiles — the batch
    * [[graft.operators.QuantileSketches.sourceLengthQuantiles]]
    * contract as a `transformWithState` stream: one KLL sketch per key
    * as ValueState, updated per microbatch, current p25/p50/p75/p95
    * emitted each trigger. Exact (equal to percentile_disc over
    * everything streamed) while a key's value count stays ≤ k;
    * StatefulOpsSpec pins batch parity across a microbatch split.
    */
  def keyQuantiles(ds: Dataset[KeyedValue],
      k: Int = 1024): Dataset[KeyQuantiles] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new QuantileProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** One keyed term observation — the input row of [[keyDistinct]]. */
  final case class KeyedTerm(key: String, term: String)

  /** Emitted each trigger for keys seen in the batch: the CURRENT
    * distinct-term cardinality over everything the key has streamed.
    */
  final case class KeyDistinct(key: String, distinct_terms: Long)

  private final class DistinctProcessor(lgK: Int)
      extends StatefulProcessor[String, KeyedTerm, KeyDistinct] {
    @transient private var state: ValueState[SketchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SketchState]("hll",
        Encoders.product[SketchState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedTerm],
        timerValues: TimerValues): Iterator[KeyDistinct] = {
      import org.apache.datasketches.hll.HllSketch
      val sk =
        if (state.exists()) HllSketch.heapify(state.get().sk)
        else new HllSketch(lgK)
      // Sorted fold, same rationale as QuantileProcessor: HLL's
      // coupon-list layout records insertion order, so sorting keeps
      // the state BYTES retry-stable in the exact (coupon) regime.
      // The ESTIMATE is order-independent in every regime.
      rows.toSeq.map(_.term).sorted.foreach(t => sk.update(t))
      state.update(SketchState(sk.toUpdatableByteArray))
      Iterator.single(KeyDistinct(key, Math.round(sk.getEstimate)))
    }
  }

  /** Streaming per-key distinct cardinality — the batch
    * [[graft.operators.Corpus.hllDistinctTerms]] contract as a
    * `transformWithState` stream: one serialized HLL sketch per key as
    * ValueState (KB-bounded for the stream's lifetime, where a seen-set
    * would grow with the vocabulary), updated per microbatch, the
    * current cardinality emitted each trigger. Same lgK and estimator
    * as the batch `hll_sketch_agg`/`hll_sketch_estimate` path, so
    * stream and batch agree exactly while a key stays in the HLL
    * coupon regime (≲ 2^(lgK−2) distinct values) — the regime the
    * declared fixtures sit in; past it, both carry the same HLL error
    * envelope. StatefulOpsSpec pins batch parity across a microbatch
    * split.
    */
  def keyDistinct(ds: Dataset[KeyedTerm],
      lgK: Int = 12): Dataset[KeyDistinct] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new DistinctProcessor(lgK),
        TimeMode.None(), OutputMode.Update())
  }
}
