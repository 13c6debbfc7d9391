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
      val next = rows.foldLeft(prev)((acc, r) =>
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
    val next = rows.foldLeft(prev)((acc, r) =>
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
}
