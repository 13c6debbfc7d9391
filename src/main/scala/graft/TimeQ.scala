package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: args = sfDir then query names; prints
  * cold + warm wall seconds and row counts per query. Shares Bench's
  * session shape (local[32], ANSI on, 32 shuffle partitions).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftConf.tune(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    for (n <- args.drop(1)) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      val t1 = System.nanoTime()
      val c2 = SparkEntry.queries(n)(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"$n%-22s cold ${(t1 - t0) / 1e9}%6.2f s  warm ${(t2 - t1) / 1e9}%6.2f s  rows=$c%d/$c2%d")
    }
    spark.stop()
  }
}
