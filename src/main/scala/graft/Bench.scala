package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A query that throws is reported as -1.0 (and to
  * stderr) and excluded from the total — a broken query must not masquerade
  * as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session before timing: JVM/Hadoop/codegen init otherwise
    // lands entirely on the first query (~3.5 s on this host), distorting
    // its number. Touches a real parquet read + a shuffle.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val selected = if (args.nonEmpty) SparkEntry.specs.filter(s => args.contains(s.name))
      else SparkEntry.specs
    val results = selected.map { spec =>
      val t0 = System.nanoTime()
      val ok =
        try { spec.fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${spec.name} FAILED: ${e.getMessage}")
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] ${spec.name} ${if (ok) f"$dt%.2f" else "FAIL"}s")
      spec.name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
