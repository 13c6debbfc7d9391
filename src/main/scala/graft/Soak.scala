package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalability soak for the dedup chain: amplify the documents corpus
  * N× (each copy doc_id-offset so ids stay unique — every document
  * gains N−1 exact near-dup partners, a worst-case duplication profile
  * far denser than real corpora), write it as parquet, and run
  * shingling → banded candidate generation → exact-Jaccard verify →
  * connected components end-to-end with wall times per stage.
  *
  * What this demonstrates beyond the fixture-scale bench: the capped
  * bucket expansion under heavy duplication (every (band, sig) bucket
  * holds ≥ N docs), pair counts that grow as N²·docs (C(N,2) per
  * duplicate group), and CC convergence on a graph with ~corpus-many
  * components. Stage times should grow ~linearly in total pair count,
  * not quadratically in corpus size — if they don't, a shuffle is
  * misbehaving.
  *
  *   SPARK_GRAFT_SOAK_N=10 sbt "runMain graft.Soak"
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SOAK_N", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val soakDir = java.nio.file.Files
      .createTempDirectory("graft-soak").toString
    val base = Tables.t(spark, srcDir, "documents")
      .select("doc_id", "text")
    (0 until n).map(k => base.withColumn("doc_id",
        col("doc_id") + lit(k * 10000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$soakDir/documents.parquet")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.t(spark, soakDir, "documents")
    val (nDocs, tShingle) = timed {
      operators.Dedup.docShingles(docs, cacheKey = soakDir).count()
    }
    val sh = operators.Dedup.docShingles(docs, cacheKey = soakDir)
    val (nPairs, tPairs) = timed {
      operators.Dedup.minhashNearDupPairs(sh, 4, 5, cacheKey = soakDir)
        .count()
    }
    val (nClusters, tCC) = timed {
      operators.Dedup.clusters(sh, 4, 5, cacheKey = soakDir)
        .filter(col("doc_id") === col("cluster_id")).count()
    }
    println(s"""{"metric":"soak","n_copies":$n,"docs":$nDocs,""" +
      s""""pairs":$nPairs,"clusters":$nClusters,""" +
      s""""sec_shingle":$tShingle,"sec_pairs":$tPairs,"sec_cc":$tCC}""")
    operators.Dedup.clearCaches(spark)
    spark.stop()
  }
}
