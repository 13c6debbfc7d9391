package graft

import org.apache.spark.sql.SparkSession

/** One shared session across all suites (session startup dominates test
  * wall time otherwise). Config mirrors the driver harness: UTC, ANSI off
  * (reference PySpark 3.5 semantics), small shuffle parallelism.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(s)
    s
  }
}
