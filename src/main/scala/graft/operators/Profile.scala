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
    require(cols.nonEmpty,
      "dataProfile needs at least one column — an empty list would " +
        "generate a malformed stack(0, ) selectExpr")
    // TWO sort-free streaming aggregates, not one: a string min/max
    // buffer is immutable, and mixing it into the countDistinct
    // aggregate demotes the WHOLE thing to a SortAggregate whose
    // grouped first level SORTS the (columns+1)x expanded input — a
    // corpus sort at scale. Split, each pass is sortless: counts +
    // exact distincts carry only long buffers (HashAggregate over the
    // expand), and the ungrouped min/max SortAggregate has no keys to
    // sort by. The two 1-row results meet on a constant-key broadcast
    // hash join (not a crossJoin — keeps the plan inside the
    // no-cartesian invariant).
    val countAggs = count(lit(1)).as("n_rows") +:
      cols.flatMap { case (c, _) =>
        Seq(count(col(c)).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"))
      }
    val mmAggs = cols.flatMap { case (c, k) =>
      k match {
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
      }
    }
    val wide = df.agg(countAggs.head, countAggs.tail: _*)
      .withColumn("__j", lit(1))
      .join(broadcast(df.agg(mmAggs.head, mmAggs.tail: _*)
        .withColumn("__j", lit(1))), "__j")
      .drop("__j")
    stackProfile(wide, cols)
  }

  /** [[dataProfile]] with `approx_count_distinct` — the routine
    * 100 TB form: HLL buffers are mutable AND need no expand, so the
    * WHOLE profile (counts, distincts, min/max) fuses into ONE
    * ungrouped aggregate over ONE streaming scan, no sort, no second
    * pass (ungrouped SortAggregate — forced by the string min/max
    * buffers — has no keys to sort by). n_distinct carries HLL's
    * ~1.6% default rsd; everything else is exact.
    */
  def approxProfile(df: DataFrame, cols: Seq[(String, Kind)],
      rsd: Double = 0.016): DataFrame = {
    require(cols.nonEmpty,
      "approxProfile needs at least one column — an empty list would " +
        "generate a malformed stack(0, ) selectExpr")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (c, k) =>
      Seq(count(col(c)).as(s"${c}__nn"),
        approx_count_distinct(col(c), rsd).as(s"${c}__nd")) ++ (k match {
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
    stackProfile(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  private def stackProfile(wide: DataFrame,
      cols: Seq[(String, Kind)]): DataFrame = {
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

  /** Declarative data-quality constraints, all evaluated from ONE
    * aggregate over one scan (the dataProfile discipline): the gate a
    * pipeline runs before admitting a drop into the corpus stores.
    * Observations surface integer-micro (ratios ×1e6, floor — exact
    * integer arithmetic both engines) so pass/fail AND the observed
    * value are oracle-comparable.
    */
  sealed trait Check { def name: String; def column: String }
  /** non-null fraction ≥ minRatio (micro) */
  final case class Complete(column: String, minRatioMicro: Long)
      extends Check { val name = "complete" }
  /** distinct == non-null (key candidate) */
  final case class Unique(column: String) extends Check {
    val name = "unique"
  }
  /** min/max inside [lo, hi] (micro, doubles) */
  final case class InRange(column: String, loMicro: Long, hiMicro: Long)
      extends Check { val name = "in_range" }

  def qualityChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty,
      "qualityChecks needs at least one check — an empty list would " +
        "generate a malformed stack(0, ) selectExpr")
    val aggs = count(lit(1)).as("n_rows") +: checks.zipWithIndex.flatMap {
      case (Complete(c, _), i) =>
        Seq(count(col(c)).as(s"c$i"))
      case (Unique(c), i) =>
        Seq(count(col(c)).as(s"c${i}n"), countDistinct(col(c)).as(s"c$i"))
      case (InRange(c, _, _), i) => Seq(
        expr(s"CAST(floor(min(`$c`) * 1000000 + 0.5) AS BIGINT)")
          .as(s"c${i}mn"),
        expr(s"CAST(floor(max(`$c`) * 1000000 + 0.5) AS BIGINT)")
          .as(s"c${i}mx"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val tuples = checks.zipWithIndex.map {
      case (ch @ Complete(c, minR), i) =>
        // observed = non-null ratio (micro); n_rows = 0 passes. The
        // pass predicate compares in DECIMAL(38,0): BIGINT×1e6
        // overflows Long past ~9.2e12 rows — precisely the scale this
        // gate targets (ANSI mode would throw mid-admission; non-ANSI
        // would wrap and mis-verdict).
        s"'${ch.name}', '$c', " +
          s"CAST(floor(c$i * 1000000.0 / greatest(n_rows, 1)) AS BIGINT)" +
          s", n_rows = 0 OR CAST(c$i AS DECIMAL(38,0)) * 1000000 >= " +
          s"CAST(n_rows AS DECIMAL(38,0)) * $minR"
      case (ch @ Unique(c), i) =>
        s"'${ch.name}', '$c', c$i, c$i = c${i}n"
      case (ch @ InRange(c, lo, hi), i) =>
        // observed = the worse-side violation witness (min if it
        // breaches lo, else max); empty column (NULL min) passes.
        s"'${ch.name}', '$c', coalesce(IF(c${i}mn < $lo, c${i}mn, " +
          s"c${i}mx), 0L), c${i}mn IS NULL OR " +
          s"(c${i}mn >= $lo AND c${i}mx <= $hi)"
    }
    wide.selectExpr(
        s"stack(${checks.size}, ${tuples.mkString(", ")}) AS " +
          "(check_name, column_name, observed, passed)")
      .select("check_name", "column_name", "observed", "passed")
  }
}
