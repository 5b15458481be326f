package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting contract: identical results to the unsalted operation, with
  * the shuffle key provably widened to (key, salt). */
class SkewSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape salting exists for
  private lazy val skewed = spark.range(10000)
    .select(col("id"),
      when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7))
        .as("k"),
      (col("id") % 100).cast("double").as("v"))

  private lazy val dim =
    skewed.select("k").distinct().withColumn("tag", upper(col("k")))

  test("saltedJoin returns exactly the plain join's rows") {
    val plain = skewed.join(dim, "k")
      .select("id", "k", "tag").collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "id", salts = 8)
      .select("id", "k", "tag").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 10000)
  }

  test("saltedJoin shuffles on (key, salt), not key alone") {
    val plan = Skew.saltedJoin(skewed, dim, "k", "id", salts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), plan)
    // the big side's exchange must carry the widened key
    assert(plan.contains("hashpartitioning(k#") && plan.contains("_salt#"),
      s"shuffle key not widened:\n$plan")
  }

  test("inputs already carrying a _salt column are not clobbered") {
    // withColumn would silently REPLACE a caller's _salt and corrupt the
    // join — the salt column must dodge existing names instead
    val withSalt = skewed.withColumn("_salt", lit("mine"))
    val dimSalt = dim.withColumn("_salt", lit("theirs"))
    val got = Skew.saltedJoin(withSalt, dimSalt, "k", "id", salts = 4)
    // same column surface as the plain join (both callers' _salt survive)
    val plain = withSalt.join(dimSalt, "k")
    assert(got.columns.toSeq == plain.columns.toSeq)
    // 10k join rows survive and both callers' values are intact
    val rows = got.collect()
    assert(rows.length == 10000)
    val salts = got.columns.zipWithIndex.filter(_._1 == "_salt").map(_._2)
    assert(rows.forall(r => salts.map(r.getString).toSet == Set("mine", "theirs")))

    val agg = Skew.saltedSumCount(withSalt, "k", "v", "id", salts = 4)
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(agg.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet == direct)
  }

  test("AQE splits the skewed sort-merge join partition at runtime (skew=true)") {
    // the adaptive counterpart to salting: same Zipfian shape, but the
    // split happens at runtime from actual partition sizes. Thresholds
    // are lowered so test-sized data trips them; confs restored after.
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    // getOption-style capture; a conf can exist with a NULL default,
    // which set() rejects — treat it as unset
    val saved = keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val big = spark.range(300000).select(
        when(col("id") % 10 < 9, "hot")
          .otherwise(concat(lit("k"), col("id") % 97)).as("k"),
        col("id").as("v"))
      // exactly one dim row per key, so the join neither drops nor
      // multiplies rows
      val dim = spark.range(97)
        .select(concat(lit("k"), col("id")).as("k"), col("id").as("tag"))
        .union(Seq(("hot", -1L)).toDF("k", "tag"))
      // no keyed operator (or pushable filter) AFTER the join: a
      // downstream hash requirement makes AQE keep the partitioning and
      // skip the skew split, and a filter would be pushed below the
      // join and deflate the skew itself. collect() materializes THIS
      // dataset's QueryExecution so the final adaptive plan is
      // inspectable on it (the WarehouseSpec AQE pattern); the payload
      // is 2 longs + a short string per row.
      val joined = big.join(dim, "k")
      assert(joined.collect().length == 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"no runtime skew split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedSumCount equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, "k", "v", "id", salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
