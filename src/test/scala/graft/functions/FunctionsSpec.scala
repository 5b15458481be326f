package graft.functions

import graft.SparkTestSession
import graft.sources.Amplify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the UDAF surface and load amplification (R11). */
class FunctionsSpec extends AnyFunSuite with SparkTestSession {

  test("Welford variance matches built-in var_samp") {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val welford = udaf(WelfordVariance)
    val row = df.agg(
      welford(col("c_acctbal")).as("w"),
      var_samp(col("c_acctbal")).as("v")).collect().head
    val (w, v) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(w - v) / math.abs(v) < 1e-9, s"welford=$w var_samp=$v")
  }

  test("Welford handles tiny groups (n<2 -> null, matching var_samp)") {
    import spark.implicits._
    val welford = udaf(WelfordVariance)
    val rows = Seq(("a", Some(1.0)), ("b", Some(2.0)), ("b", Some(4.0)),
        ("b", None)) // NULL input must be skipped, not counted as 0.0
      .toDF("k", "x")
      .groupBy("k").agg(welford(col("x")).as("v"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("a").isEmpty)
    assert(math.abs(rows("b").get.asInstanceOf[Double] - 2.0) < 1e-12)
  }

  test("Amplify replicates n-fold without shuffling the amplified side") {
    val df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val amp = Amplify(df, 7)
    assert(amp.count() == df.count() * 7)
    assert(amp.columns.toSeq == df.columns.toSeq)
    val plan = amp.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
