package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom keyed state beyond windowed aggregation —
  * `mapGroupsWithState`, the Structured Streaming primitive for state
  * the built-in operators can't express (running totals across the whole
  * stream lifetime, not per window).
  *
  * The reference needs only windowed state (T5); this is the extension
  * point a production pipeline reaches for next (e.g. per-source running
  * document counts feeding dedup back-pressure). State is per-key and
  * partition-local after the groupByKey shuffle — at 1000 executors each
  * task owns its key range's state store; nothing is driver-side.
  */
object StatefulOps {

  final case class KeyedValue(key: String, value: Double)

  final case class RunningTotal(key: String, n: Long, total: Double)

  private def update(key: String, rows: Iterator[KeyedValue],
      state: GroupState[RunningTotal]): RunningTotal = {
    val prev = state.getOption.getOrElse(RunningTotal(key, 0L, 0.0))
    val next = rows.foldLeft(prev)((acc, r) =>
      RunningTotal(key, acc.n + 1, acc.total + r.value))
    state.update(next)
    next
  }

  /** Running (count, total) per key, emitted each trigger for keys seen
    * in the batch. Update output mode; no timeout — state lives for the
    * stream's lifetime (bound it with a timeout in unbounded-key
    * deployments).
    */
  def runningTotals(ds: Dataset[KeyedValue]): Dataset[RunningTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .mapGroupsWithState[RunningTotal, RunningTotal](
        GroupStateTimeout.NoTimeout)(update)
  }
}
