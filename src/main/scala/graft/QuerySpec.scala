package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query over a testdata dir plus
  * (when SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * over the same parquet files. Keys and column names must match exactly —
  * the driver sorts columns by name before hashing values.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))

  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}
