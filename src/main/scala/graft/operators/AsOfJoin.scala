package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic operator Spark's join surface lacks —
  * composed from built-ins per the preference order (SURVEY.md §7.3 /
  * guide: compose before custom-plan): for each left row, attach the
  * latest right row with `right.ts <= left.ts` within the same key.
  *
  * Shape: tag both sides, union, carry the last right payload forward
  * over a (key, ts)-sorted window, keep left rows. One shuffle on the
  * key and one in-partition sort — the same data movement a dedicated
  * AsOfJoinExec (sort-merge style) would perform, so there is no
  * scale penalty for composing it. Inclusive boundary: at equal ts the
  * right row sorts first (kind 0 < 1), matching DuckDB ASOF semantics.
  */
object AsOfJoin {

  /** Left as-of join. `rightPayload` columns come back as
    * `asof_<name>`, null when no right row precedes the left row.
    * Right payload nulls are handled correctly (the carried value is a
    * struct of the whole payload, not per-column).
    */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightPayload: Seq[String]): DataFrame = {
    // Silent-drop guard: the final cleanup drops the payload columns,
    // and a LEFT column sharing a payload name would vanish with them.
    val collisions = rightPayload.toSet
      .intersect(left.columns.toSet -- Set(key, tsCol))
    require(collisions.isEmpty,
      s"leftAsOf: left columns ${collisions.mkString(", ")} collide " +
        "with rightPayload names — rename one side")
    val l = left.withColumn("__kind", lit(1))
    val r = right
      .select((Seq(key, tsCol) ++ rightPayload).map(col): _*)
      // A null right timestamp can never satisfy right.ts <= left.ts
      // (DuckDB ASOF agrees) — unfiltered it would sort FIRST
      // (nulls-first ascending) and be carried into every left row.
      .filter(col(tsCol).isNotNull)
      .withColumn("__kind", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // TIE CONTRACT: among several right rows at the identical
    // (key, ts), the GREATEST payload struct wins — without the third
    // sort key, `last(...)` picked whichever duplicate the shuffle
    // ordered last (run-to-run nondeterministic, and DuckDB's ASOF
    // picks its own arbitrary winner, so the oracle gate assumes a
    // tie-free right side). Left rows carry a NULL tie key
    // (nulls-first, before every kind-0 payload — irrelevant to the
    // result since `last` filters kind 0, but it keeps the sort
    // total).
    val tie = when(col("__kind") === 0,
      struct(rightPayload.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__kind"), tie.asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__carried",
      last(
        when(col("__kind") === 0,
          struct(rightPayload.map(col): _*)),
        ignoreNulls = true).over(w))
    val out = carried.filter(col("__kind") === 1)
    rightPayload
      .foldLeft(out)((df, p) =>
        df.withColumn(s"asof_$p", col(s"__carried.$p")))
      .drop("__kind", "__carried")
      .drop(rightPayload: _*)
  }
}
