package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites — built by
  * [[GraftSession]] (single conf source of truth), smaller parallelism
  * for test latency. */
object SparkTestSession {
  lazy val session: SparkSession =
    GraftSession.build("graft-test", "local[4]", "4")
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.session
}
