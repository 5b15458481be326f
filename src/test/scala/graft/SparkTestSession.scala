package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (same confs as
  * [[GraftSession]], smaller parallelism for test latency). */
object SparkTestSession {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.session
}
