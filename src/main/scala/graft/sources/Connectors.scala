package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}

/** Production connector surfaces mirroring the reference's I/O config.
  * The Kafka surfaces are construct-only in this offline environment (no
  * Kafka connector jar); the JDBC surfaces are EXECUTABLE — the driver
  * class is a parameter (production default: MySQL, the reference's
  * database), and JdbcRoundTripSpec drives the same reader/writer
  * end-to-end against embedded Derby (`/opt/spark/jars` ships it), so
  * the dim-load → flagship-join → aggregate-writeback path the
  * reference runs against MySQL executes for real here.
  */
object Connectors {

  /** The reference's production driver (spark_consumer_kafka.py:28-35). */
  val MysqlDriver = "com.mysql.cj.jdbc.Driver"

  /** Embedded Derby — the offline-executable stand-in shipped with
    * Spark's own jars; used by the round-trip spec.
    */
  val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** One connection-option map shared by reader and writer — a
    * connection-level change (driver class, timeouts) edits one place.
    */
  private def jdbcOptions(url: String, table: String, user: String,
      password: String, driver: String): Map[String, String] = Map(
    "url" -> url, "dbtable" -> table, "user" -> user,
    "password" -> password, "driver" -> driver)

  /** JDBC batch source for the dimension table
    * (reference: spark_consumer_kafka.py:28-35).
    */
  def jdbcDimReader(spark: SparkSession, url: String, table: String,
      user: String, password: String,
      driver: String = MysqlDriver): DataFrameReader =
    spark.read
      .format("jdbc")
      .options(jdbcOptions(url, table, user, password, driver))

  /** JDBC batch sink for per-micro-batch writes
    * (reference: spark_consumer_kafka.py:138-146). The reference uses
    * mode("append") into a PRIMARY KEY table — kept here for parity, but
    * the streaming path should use the keyed-upsert contract
    * (graft.streaming.ParquetUpsertSink semantics; on MySQL:
    * INSERT … ON DUPLICATE KEY UPDATE via a custom foreachBatch writer)
    * because update output mode re-emits keys (SURVEY.md §4.4.2).
    */
  def jdbcSinkWriter(df: DataFrame, url: String, table: String,
      user: String, password: String,
      driver: String = MysqlDriver): DataFrameWriter[Row] =
    df.write
      .format("jdbc")
      .options(jdbcOptions(url, table, user, password, driver))
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
      .options(kafkaSinkOptions(bootstrapServers, topic))

  /** The exact Kafka-sink option map as DATA (the writer above consumes
    * it verbatim; KafkaSurfaceSpec pins it golden — see
    * CovidStreamPipeline.kafkaSourceOptions for the rationale).
    * Reference parity: acks=all + bounded retries + small linger
    * (kafka_producer.py:41-52).
    */
  def kafkaSinkOptions(bootstrapServers: String,
      topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "topic" -> topic,
    "kafka.acks" -> "all",
    "kafka.retries" -> "10",
    "kafka.linger.ms" -> "100")
}
