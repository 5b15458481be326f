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

  test("saltedSumCount equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, "k", "v", "id", salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
