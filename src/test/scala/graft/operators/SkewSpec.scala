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

  test("saltedSumCount equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, "k", "v", "id", salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
