package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity batch operators (SURVEY.md §2.1–§2.6), one declared
  * query each, oracle-checked against DuckDB on the same parquet.
  *
  * Parity rules applied throughout (SURVEY.md §7.4.2):
  *  - every query totally ordered;
  *  - sums of non-integral doubles go through DECIMAL casts (exact,
  *    order-independent); averages are exact-sum / count (deterministic
  *    double division);
  *  - null-on-failure coercion uses try_cast in Spark / TRY_CAST in DuckDB
  *    (the reference's `int(float(x)) or 0` semantics, kafka_producer.py:76-77);
  *  - DuckDB SUM(INTEGER) returns HUGEINT → always CAST to BIGINT to match
  *    Spark's LongType.
  */
object CoreQueries {

  import Tables.t

  val all: Seq[QuerySpec] = Seq(

    // S2: dim load + select/alias/cast (spark_consumer_kafka.py:28-41)
    QuerySpec("dim_scan",
      """SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS name,
        |       CAST(n_regionkey AS BIGINT) AS region_id
        |FROM nation ORDER BY id""".stripMargin) { (s, dir) =>
      t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("id"),
        col("n_name").as("name"),
        col("n_regionkey").cast(LongType).as("region_id"))
        .orderBy("id")
    },

    // P1: column select + alias (spark_consumer_kafka.py:37-41)
    QuerySpec("project_alias",
      """SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment,
        |       c_acctbal AS balance
        |FROM customer ORDER BY id""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("balance"))
        .orderBy("id")
    },

    // P2/F3: selectExpr with SQL casts (spark_consumer_kafka.py:65)
    QuerySpec("cast_expr",
      """SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS okey_str,
        |       CAST(CAST(o_totalprice AS DECIMAL(20,2)) AS DOUBLE)
        |         AS price_dec
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // The DECIMAL(20,2) cast is the capability; the output surfaces it
      // as DOUBLE (exact for 2-decimal values) so the stringified compare
      // can't trip on decimal trailing zeros ('1234.50' vs '1234.5').
      t(s, dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(o_orderkey AS STRING) AS okey_str",
        "CAST(CAST(o_totalprice AS DECIMAL(20,2)) AS DOUBLE) AS price_dec")
        .orderBy("o_orderkey")
    },

    // P5/F8: 3-way null-rejection conjunction (spark_consumer_kafka.py:74)
    QuerySpec("filter_notnull",
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  AND user_id IS NOT NULL
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type").isNotNull && col("value").isNotNull &&
          col("user_id").isNotNull)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    },

    // P6: comparison predicate (reference README.md:125-126)
    QuerySpec("filter_range",
      """SELECT event_id, user_id, value FROM events
        |WHERE value IS NOT NULL AND value > 0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .filter(col("value").isNotNull && col("value") > 0)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // P7: int(float(x))-with-default-0 coercion (kafka_producer.py:76-77)
    // Both casts are try_cast: the inner one nulls unparseable strings,
    // the outer one nulls NaN/out-of-int-range doubles — so the coercion
    // stays total (→ 0) under ANSI mode too, where a plain double→int
    // cast of NaN throws CAST_OVERFLOW.
    QuerySpec("coerce_default",
      """SELECT p_partkey,
        |       COALESCE(TRY_CAST(TRUNC(TRY_CAST(p_brand AS DOUBLE)) AS INTEGER),
        |         0) AS brand_num,
        |       COALESCE(TRY_CAST(TRUNC(TRY_CAST(CAST(p_size AS VARCHAR)
        |         AS DOUBLE)) AS INTEGER), 0) AS size_num,
        |       COALESCE(TRY_CAST(TRUNC(p_retailprice) AS INTEGER), 0)
        |         AS price_int
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        coalesce(expr("try_cast(try_cast(p_brand AS DOUBLE) AS INT)"),
          lit(0)).as("brand_num"),
        coalesce(expr(
          "try_cast(try_cast(CAST(p_size AS STRING) AS DOUBLE) AS INT)"),
          lit(0)).as("size_num"),
        coalesce(expr(
          "try_cast(try_cast(CAST(p_retailprice AS STRING) AS DOUBLE) AS INT)"),
          lit(0)).as("price_int"))
        .orderBy("p_partkey")
    },

    // F2: to_timestamp with format (spark_consumer_kafka.py:69)
    QuerySpec("ts_parse",
      """SELECT event_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd"), "yyyy-MM-dd")
          .as("day_ts"))
        .orderBy("event_id")
    },

    // F1: from_json with declared schema (spark_consumer_kafka.py:66)
    QuerySpec("json_parse",
      """SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        from_json(col("props"), Tables.eventPropsSchema).getField("k")
          .as("k"))
        .orderBy("event_id")
    },

    // P4: nested-field access (spark_consumer_kafka.py:68-72,91-92)
    QuerySpec("struct_access",
      """SELECT event_id, user_id AS uid, event_type AS et
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .withColumn("s",
          struct(col("user_id").as("uid"), col("event_type").as("et")))
        .select(col("event_id"), col("s.uid").as("uid"),
          col("s.et").as("et"))
        .orderBy("event_id")
    },

    // F3: Decimal(20,x) casts at rest (spark_consumer_kafka.py:126)
    QuerySpec("decimal_cast",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(20,4)) AS DOUBLE)
        |         AS price4,
        |       CAST(CAST(l_discount AS DECIMAL(20,4)) AS DOUBLE) AS disc4
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        // DECIMAL(20,4) cast exercised internally, surfaced as DOUBLE
        // (exact: source values have ≤2 decimals) — see cast_expr note.
        t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").cast(DecimalType(20, 4))
            .cast(DoubleType).as("price4"),
          col("l_discount").cast(DecimalType(20, 4))
            .cast(DoubleType).as("disc4"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    // A6: count(*) (spark_consumer_kafka.py:136, README.md:131)
    QuerySpec("count_all",
      "SELECT COUNT(*) AS n FROM lineitem") { (s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("n"))
    },

    // L1: top-k = sort + limit (README.md:127) → TakeOrderedAndProjectExec
    QuerySpec("limit_head",
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select("event_id", "event_type", "value")
        .orderBy(col("value").desc, col("event_id"))
        .limit(20)
    },

    // S5: CSV scan — schema-on-read parse of delimited text
    // (kafka_producer.py:61-62 analog), lossless roundtrip.
    QuerySpec("csv_scan",
      """SELECT event_id, event_type, value FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(concat_ws(",", col("event_id"), col("event_type"),
          col("value")).as("line"))
        .select(from_csv(col("line"),
          StructType(Seq(
            StructField("event_id", LongType),
            StructField("event_type", StringType),
            StructField("value", DoubleType))),
          Map.empty[String, String]).as("c"))
        .select(col("c.event_id").as("event_id"),
          col("c.event_type").as("event_type"),
          col("c.value").as("value"))
        .orderBy("event_id")
    },

    // Columnar-source breadth beyond parquet: ORC write + read back
    // through Spark's native orc datasource (orc-core ships in
    // /opt/spark/jars), then a grouped aggregate over the round-trip.
    // The oracle aggregates the SAME rows straight from the parquet
    // table, so the query is green only if the ORC transport is
    // lossless for longs/strings. The write is part of the query by
    // design — the capability under test is the format round-trip,
    // not a cached file.
    QuerySpec("orc_roundtrip",
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        |       CAST(MAX(doc_id) AS BIGINT) AS max_doc
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, dir) =>
        val path = java.nio.file.Files
          .createTempDirectory("graft-orc").toString + "/docs"
        t(s, dir, "documents").select("doc_id", "lang", "n_chars")
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("sum_chars"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("lang")
    },

    // File-based JSON-lines source (the crawl-dump ingest format):
    // rows serialized to .json files and read back through
    // spark.read.schema(...).json — the SOURCE counterpart of the
    // string-level from_json query (json_parse). Same lossless-
    // round-trip oracle shape as orc_roundtrip.
    QuerySpec("jsonl_scan",
      """SELECT source, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        val path = java.nio.file.Files
          .createTempDirectory("graft-jsonl").toString + "/docs"
        t(s, dir, "documents").select("doc_id", "source", "n_chars")
          .write.mode("overwrite").json(path)
        s.read.schema(StructType(Seq(
            StructField("doc_id", LongType),
            StructField("source", StringType),
            StructField("n_chars", LongType))))
          .json(path)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").cast("long").as("sum_chars"))
          .orderBy("source")
    },

    // Additive schema evolution on the READ path — the lakehouse
    // contract every long-lived corpus store hits: epoch 1 was written
    // before a column existed, epoch 2 after, and a mergeSchema read
    // over both must surface the union schema with the old epoch's
    // rows NULL in the new column (no rewrite of resident files, no
    // rows lost, no values fabricated). The split is doc_id parity so
    // both epochs cover every source; the oracle replicates the NULL
    // pattern with FILTER clauses. The WRITE-side gate (type changes
    // rejected against the merged resident schema) is
    // StoreMaintenanceSpec's.
    QuerySpec.build("schema_merge",
      """SELECT source, COUNT(*) AS n_docs,
        |       COUNT(*) FILTER (WHERE doc_id % 2 = 1) AS n_evolved,
        |       CAST(COALESCE(SUM(n_chars) FILTER (WHERE doc_id % 2 = 1),
        |                     0) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        val path = java.nio.file.Files
          .createTempDirectory("graft-evolve").toString + "/docs"
        val docs = t(s, dir, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .select("doc_id", "source")
          .write.mode("overwrite").parquet(path)
        docs.filter(col("doc_id") % 2 === 1)
          .select("doc_id", "source", "n_chars")
          .write.mode("append").parquet(path)
        s.read.option("mergeSchema", "true").parquet(path)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(col("n_chars")).as("n_evolved"),
            coalesce(sum("n_chars"), lit(0L)).cast("long")
              .as("sum_chars"))
          .orderBy("source")
    },

    // Flat-text file source (the rawest crawl-dump shape): each row
    // serialized as one `doc_id\ttext` line through the text
    // datasource, read back, re-split, and content-checked via
    // count/char-mass/distinct-md5/id-sum — green only if every line
    // survives byte-for-byte. Safe because the corpus text carries no
    // newline/tab (asserted at all SFs before this query shipped);
    // a corpus with either needs the jsonl/parquet transports instead.
    // NULL text is excluded on BOTH sides: concat_ws silently skips
    // NULL, so a null-text row would serialize as the bare doc_id and
    // round-trip with text == its own id digits, while the oracle
    // keeps NULL semantics — a silent parity break the fixtures don't
    // currently exercise but a real corpus would.
    QuerySpec("text_scan",
      """SELECT COUNT(*) AS n_docs,
        |       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
        |       COUNT(DISTINCT md5(text)) AS n_distinct,
        |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM documents WHERE text IS NOT NULL""".stripMargin) { (s, dir) =>
      val path = java.nio.file.Files
        .createTempDirectory("graft-text").toString + "/docs"
      t(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
        .write.mode("overwrite").text(path)
      s.read.text(path)
        .select(
          expr("cast(substring_index(value, '\t', 1) as bigint)")
            .as("doc_id"),
          expr("substring(value, instr(value, '\t') + 1)").as("text"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("sum_chars"),
          countDistinct(md5(col("text"))).as("n_distinct"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
    },

    // S6/F7: to_json(struct(...)) serialization (kafka_producer.py:79-87)
    QuerySpec("to_json_roundtrip",
      """SELECT event_id,
        |       '{"event_id":' || event_id || ',"event_type":"' || event_type
        |         || '"}' AS js
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("js"))
        .orderBy("event_id")
    },

    // P3/F4/F5: withColumn-derived per-row arithmetic metric
    // (spark_consumer_kafka.py:109-112)
    QuerySpec("derived_metric",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS revenue,
        |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("charged"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    // §3.2 composed producer pipeline: delimited ingest → presence
    // validation → int(float(x))-or-0 coercion → JSON wire format
    // (kafka_producer.py:61-88 end to end; the Kafka send itself is the
    // construct-only Connectors.kafkaSinkWriter surface).
    QuerySpec("producer_pipeline",
      """SELECT event_id,
        |       '{"event_id":' || event_id || ',"event_type":"' || event_type
        |         || '","value_int":'
        |         || COALESCE(TRY_CAST(TRUNC(value) AS INTEGER), 0) || '}' AS js
        |FROM events
        |WHERE event_type IS NOT NULL AND value IS NOT NULL
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(concat_ws(",", col("event_id"), col("event_type"),
          col("value")).as("line"))
        .select(from_csv(col("line"),
          StructType(Seq(
            StructField("event_id", LongType),
            StructField("event_type", StringType),
            StructField("value", StringType))),
          Map.empty[String, String]).as("c"))
        .select(col("c.event_id").as("event_id"),
          col("c.event_type").as("event_type"), col("c.value").as("value"))
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"),
            coalesce(
              expr("try_cast(try_cast(value AS DOUBLE) AS INT)"),
              lit(0)).as("value_int"))).as("js"))
        .orderBy("event_id")
    },

    // F6: current_timestamp — nondeterministic, oracle omitted
    // (spark_consumer_kafka.py:127); driver records rows-only check.
    QuerySpec.noOracle("processing_time") { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), current_timestamp().as("processing_time"))
        .orderBy("event_id")
    }
  )
}
