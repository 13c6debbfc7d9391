package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each declared query is a capability from SURVEY.md §2 (reference parity)
  * or §2.9 / the LLM-pipeline extension surface. Specs live next to their
  * implementations; this object only assembles the maps.
  */
object SparkEntry {

  /** All declared queries, in capability order. */
  val specs: Seq[QuerySpec] =
    CoreQueries.all ++ FlagshipQueries.all ++ AnalyticQueries.all ++
      RelationalQueries.all ++ FunctionQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ PipelineQueries.all ++
      CorpusQueries.all ++ ChainQueries.all ++
      MultimodalQueries.all ++ ScaleQueries.all ++
      graft.streaming.StreamingPipelineQuery.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference-analog plan: parse → filter → tumbling-window
    * multi-agg → broadcast dim join → derived per-million metric
    * (spark_consumer_kafka.py:55-128).
    */
  def entry(spark: SparkSession): DataFrame =
    EventPipeline.flagship(
      Tables.t(spark, "/root/testdata/sf0.001", "events"),
      Tables.eventTypeDim(spark),
      Tables.eventPropsSchema)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
