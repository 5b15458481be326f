package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection (SPARK-32268): at warehouse scale a
  * selective dimension predicate should prune fact-side rows BEFORE the
  * shuffle, not after the join. Catalyst's `InjectRuntimeFilter` does
  * exactly that — creation side aggregates a bloom filter over its join
  * keys, application side gains a `might_contain` filter under its scan
  * — but only when the size thresholds say it pays. This spec lowers
  * the application-side threshold to model 100 TB relative sizes on
  * sf0.001 data and proves the engine's canonical dim⋈fact join shape
  * is ELIGIBLE for the rewrite, with results unchanged. At real scale
  * no conf change is needed: the feature is on by default and the
  * 10 GB application-side threshold is what a fact table exceeds. */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter on the fact join leg") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB")
      // keep the join a shuffle join — the broadcast path has its own
      // pruning story and the injection rule correctly skips it
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val orders = spark.read.parquet(s"$dir/orders.parquet")
      val customer = spark.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
      val joined = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected into:\n$optimized")

      // the rewrite must not change results: compare against the plain
      // plan with the injection disabled
      val rows = joined.collect()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
      assert(!plain.queryExecution.optimizedPlan.toString
        .contains("might_contain"))
      assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq.sorted ==
        plain.collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted)
    } finally keys.foreach { k =>
      saved(k).fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
