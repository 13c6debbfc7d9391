package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality summary a pipeline
  * runs before trusting a new drop: per column, row/non-null/distinct
  * counts plus typed min/max. ONE aggregate over one scan produces a
  * single wide row, reshaped in-plan (`stack`) to one row per column —
  * no per-column scans, no driver-side collection.
  *
  * Cross-engine value discipline (the oracle contract):
  * - integer and string columns surface min/max as strings (integer
  *   and binary-collation string rendering is engine-identical);
  * - timestamps are pinned through an explicit format so neither
  *   engine's default rendering leaks in;
  * - doubles surface as integer-micro quantized BIGINTs
  *   (`floor(x*1e6 + 0.5)` — the same IEEE ops in any engine), never
  *   as formatted strings (float-to-string is engine-specific).
  *
  * Exact `countDistinct` over several columns plans as an EXPAND
  * (input × columns before the partial aggregate) — the right trade
  * at audit scale; a 100 TB routine profile should swap in
  * `approx_count_distinct` (HLL) per column, which keeps the single
  * pass with no expand.
  */
object Profile {

  /** Column kinds steering the min/max representation. */
  sealed trait Kind
  case object IntLike extends Kind
  case object StrLike extends Kind
  case object TsLike extends Kind
  case object DblLike extends Kind

  def dataProfile(df: DataFrame, cols: Seq[(String, Kind)]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (c, k) =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd")) ++ (k match {
        case DblLike => Seq(
          expr(s"CAST(floor(min(`$c`) * 1000000 + 0.5) AS BIGINT)")
            .as(s"${c}__mnm"),
          expr(s"CAST(floor(max(`$c`) * 1000000 + 0.5) AS BIGINT)")
            .as(s"${c}__mxm"))
        case TsLike => Seq(
          date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss")
            .as(s"${c}__mns"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss")
            .as(s"${c}__mxs"))
        case _ => Seq(
          min(col(c)).cast("string").as(s"${c}__mns"),
          max(col(c)).cast("string").as(s"${c}__mxs"))
      })
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val tuples = cols.map { case (c, k) =>
      val (mns, mxs, mnm, mxm) = k match {
        case DblLike => ("CAST(NULL AS STRING)", "CAST(NULL AS STRING)",
          s"`${c}__mnm`", s"`${c}__mxm`")
        case _ => (s"`${c}__mns`", s"`${c}__mxs`",
          "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)")
      }
      s"'$c', `${c}__nn`, `${c}__nd`, $mns, $mxs, $mnm, $mxm"
    }
    wide.selectExpr("n_rows",
        s"stack(${cols.size}, ${tuples.mkString(", ")}) AS " +
          "(column_name, n_nonnull, n_distinct, min_str, max_str, " +
          "min_micro, max_micro)")
      .select("column_name", "n_rows", "n_nonnull", "n_distinct",
        "min_str", "max_str", "min_micro", "max_micro")
  }
}
