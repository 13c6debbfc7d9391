package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}

/** Production connector surfaces mirroring the reference's I/O config.
  * Construct-only in this offline environment (no Kafka connector jar, no
  * JDBC driver on the classpath): each helper returns the fully-configured
  * reader/writer; the terminal `.load()`/`.save()` needs the connector at
  * runtime. The test harness substitutes parquet (batch) and MemoryStream
  * (streaming) behind the same plans.
  */
object Connectors {

  /** One connection-option map shared by reader and writer — a
    * connection-level change (driver class, timeouts) edits one place.
    */
  private def jdbcOptions(url: String, table: String, user: String,
      password: String): Map[String, String] = Map(
    "url" -> url, "dbtable" -> table, "user" -> user,
    "password" -> password, "driver" -> "com.mysql.cj.jdbc.Driver")

  /** JDBC batch source for the dimension table
    * (reference: spark_consumer_kafka.py:28-35).
    */
  def jdbcDimReader(spark: SparkSession, url: String, table: String,
      user: String, password: String): DataFrameReader =
    spark.read
      .format("jdbc")
      .options(jdbcOptions(url, table, user, password))

  /** JDBC batch sink for per-micro-batch writes
    * (reference: spark_consumer_kafka.py:138-146). The reference uses
    * mode("append") into a PRIMARY KEY table — kept here for parity, but
    * the streaming path should use the keyed-upsert contract
    * (graft.streaming.ParquetUpsertSink semantics; on MySQL:
    * INSERT … ON DUPLICATE KEY UPDATE via a custom foreachBatch writer)
    * because update output mode re-emits keys (SURVEY.md §4.4.2).
    */
  def jdbcSinkWriter(df: DataFrame, url: String, table: String,
      user: String, password: String): DataFrameWriter[Row] =
    df.write
      .format("jdbc")
      .options(jdbcOptions(url, table, user, password))
      .mode("append")

  /** Kafka value sink for the producer path
    * (reference: kafka_producer.py:41-52 — acks=all, retries; expressed
    * as Spark Kafka-sink options). Expects a `value` string column
    * (to_json output — see the `to_json_roundtrip` query).
    */
  def kafkaSinkWriter(df: DataFrame, bootstrapServers: String,
      topic: String): DataFrameWriter[Row] =
    df.write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("kafka.acks", "all")
      .option("kafka.retries", "10")
      .option("kafka.linger.ms", "100")
}
