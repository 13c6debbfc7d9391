package graft.operators

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed band-signature store: the at-rest layout the
  * incremental dedup scale story assumes (a 100 TB corpus maintains its
  * (band, sig)-bucketed signatures; intake batches probe them without
  * ever reshuffling the corpus).
  */
class DedupStoreSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("store probe join shuffles ONLY the incoming side; results match " +
    "the non-stored incremental path") {
    val spark = TestSpark.spark
    val wh = Files.createTempDirectory("graft-sigstore").toString
    val sh = Dedup.docShingles(Tables.t(spark, dir, "documents"))
    val corpus = sh.filter(col("doc_id") % 5 =!= 0)
    val incoming = sh.filter(col("doc_id") % 5 === 0)

    Dedup.writeSignatureStore(corpus, s"$wh/sig_store", "sig_store")
    val store = Dedup.signatureStore(spark, "sig_store")

    // Stored rows are exactly the banded corpus.
    val direct = Dedup.bandSignatures(corpus)
    assert(store.exceptAll(direct).isEmpty &&
      direct.exceptAll(store).isEmpty)

    // Intake too large to broadcast (threshold off): the sort-merge
    // probe must exchange ONLY the incoming side — the store's bucketed
    // layout already satisfies the join's (band, sig) distribution.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedABS = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Spark's auto-bucketed-scan heuristic drops the bucketed layout in
    // this one-sided shape under AQE (both sides then exchange); pin
    // bucketed scans ON for signature-store probes — the production
    // guidance that ships with writeSignatureStore.
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val probe = store.join(
        Dedup.bandSignatures(incoming).withColumnRenamed("doc_id", "new_id"),
        Seq("band", "sig"))
      // AQE finalizes the plan only on execution, and count() would
      // execute a DIFFERENT QueryExecution — collect() runs this one.
      probe.collect()
      // AdaptiveSparkPlan.toString prints BOTH the final and the
      // initial plan — count exchanges in the final section only.
      val planStr = probe.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges =
        "Exchange hashpartitioning\\(band".r.findAllIn(planStr).size
      assert(exchanges == 1,
        s"expected exactly the incoming-side exchange, got: $planStr")
      assert(planStr.contains("Bucketed: true"), planStr)
      // End-to-end parity: incremental pairs through the store equal
      // the in-memory-banded result.
      val viaStore = Dedup.incrementalNearDupPairs(corpus, incoming, 4, 5,
        broadcastIncoming = Some(false), corpusBands = store)
      val direct2 = Dedup.incrementalNearDupPairs(corpus, incoming, 4, 5,
        broadcastIncoming = Some(false))
      assert(viaStore.exceptAll(direct2).isEmpty &&
        direct2.exceptAll(viaStore).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", savedABS)
      spark.sql("DROP TABLE IF EXISTS sig_store")
    }
  }

  test("store probe through a >BandCap bucket: every intake member " +
    "links to the canonical min; probeCap bounds candidates without " +
    "breaking connectivity") {
    val spark = TestSpark.spark
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-sighot").toString
    // 150 identical docs (> BandCap = 100): every band has ONE hot
    // (band, sig) bucket holding the whole corpus. Corpus-internal
    // pairs therefore take the bounded-star fallback; this pins that
    // the STORE PROBE path composes with that star into a single
    // cluster labeled by the canonical min.
    val sh = (1 to 10).map(i => 0xFEED0000L + i)
    val corpus = (0L until 150L).map((_, sh)).toDF("doc_id", "sh")
    val incoming = (1000L until 1010L).map((_, sh)).toDF("doc_id", "sh")
    Dedup.writeSignatureStore(corpus, s"$wh/sig_hot", "sig_hot")
    try {
      val store = Dedup.signatureStore(spark, "sig_hot")
      // Uncapped probe: every intake doc matches all 150 members.
      val probe = Dedup.incrementalNearDupPairs(corpus, incoming, 4, 5,
        corpusBands = store)
      assert(probe.count() == 10L * 150L)
      // Capped probe: ≤ probeCap matches per intake doc, and the
      // bucket MIN (doc 0, the canonical keeper) always among them.
      val capped = Dedup.incrementalNearDupPairs(corpus, incoming, 4, 5,
        corpusBands = store, probeCap = 20)
        .select("new_id", "corpus_id").as[(Long, Long)].collect()
      assert(capped.groupBy(_._1).forall { case (_, ms) =>
        ms.length <= 20 && ms.exists(_._2 == 0L)
      }, "each intake doc: bounded matches, canonical min included")
      assert(capped.map(_._1).distinct.length == 10)
      // Connectivity loop: corpus-internal star pairs (BandCap
      // fallback) + capped probe pairs cluster into ONE component
      // labeled 0 covering all 160 docs.
      val internal = Dedup.minhashNearDupPairs(corpus, 4, 5)
        .select("da", "db")
      assert(internal.count() == 149, "star fallback engaged")
      val probePairs = Dedup.incrementalNearDupPairs(corpus, incoming,
        4, 5, corpusBands = store, probeCap = 20)
        .select(col("new_id").as("da"), col("corpus_id").as("db"))
      val clusters = Dedup.nearDupClusters(internal.union(probePairs))
      assert(clusters.count() == 160)
      assert(clusters.select("cluster_id").distinct()
        .as[Long].collect().toSeq == Seq(0L),
        "intake + star corpus must form one cluster under the min")
    } finally spark.sql("DROP TABLE IF EXISTS sig_hot")
  }

  test("streaming intake probes the store: streamingNearDup with " +
    "corpusBands = signatureStore equals the in-memory-banded run") {
    val spark = graft.TestSpark.spark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-sigstream").toString
    val docs = Tables.t(spark, dir, "documents")
    val sh = Dedup.docShingles(docs)
    val corpus = sh.filter(col("doc_id") % 2 =!= 0)
    Dedup.writeSignatureStore(corpus, s"$wh/sig_stream", "sig_stream")
    try {
      val incomingDocs = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toSeq
      val collected =
        scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      val src = MemoryStream[(Long, String)](spark)
      val ckpt = Files.createTempDirectory("graft-snds").toString
      val q = graft.streaming.StreamOps.streamingNearDup(
        src.toDF().toDF("doc_id", "text"), corpus, 4, 5, ckpt,
        corpusBands = Dedup.signatureStore(spark, "sig_stream")) {
        (matches, _) =>
          collected ++= matches.select("new_id", "corpus_id")
            .as[(Long, Long)].collect()
      }
      src.addData(incomingDocs: _*)
      q.processAllAvailable()
      q.stop()
      val oneShot = Dedup.incrementalNearDupPairs(
        corpus, sh.filter(col("doc_id") % 2 === 0), 4, 5)
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(collected.toSet == oneShot && oneShot.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS sig_stream")
  }
}
