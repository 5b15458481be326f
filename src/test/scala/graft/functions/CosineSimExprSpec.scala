package graft.functions

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen cosine must be BIT-identical to the HOF
  * formulation (same float→double widening, same sequential fold), or
  * swapping it in would silently shift oracle hashes. */
class CosineSimExprSpec extends AnyFunSuite with SparkTestSession {

  private def native(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    GraftColumnBridge.column(CosineSimExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  test("native cosine is bit-identical to the HOF cosine on real pairs") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      .filter(col("ia") < 40)
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      .filter(col("ib") < 40)
    val both = a.crossJoin(b)
      .select(col("ia"), col("ib"),
        Similarity.cosineHof(col("ea"), col("eb")).as("hof"),
        native(col("ea"), col("eb")).as("nat"))
      .collect()
    assert(both.length == 1600)
    both.foreach { r =>
      val (h, n) = (r.getDouble(2), r.getDouble(3))
      assert(java.lang.Double.doubleToLongBits(h) ==
        java.lang.Double.doubleToLongBits(n),
        s"(${r.getLong(0)},${r.getLong(1)}): hof=$h native=$n")
    }
  }

  test("cosine_sim registers as a SQL function (extensions path)") {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib,
        |       round(cosine_sim(a.embedding, b.embedding), 6) s
        |FROM emb_sql a JOIN emb_sql b
        |  ON a.vec_id = 0 AND b.vec_id IN (1, 2, 3)
        |ORDER BY ib""".stripMargin).collect()
    assert(viaSql.length == 3)
    val viaCol = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") === 0)
      .crossJoin(spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .filter(col("vec_id").isin(1, 2, 3))
        .select(col("vec_id").as("ib"), col("embedding").as("eb")))
      .select(col("ib"), round(Similarity.cosine(col("embedding"), col("eb")), 6).as("s"))
      .orderBy("ib").collect()
    assert(viaSql.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      viaCol.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("null input yields null; zero vector yields NaN (HOF parity)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1f, 0f), Array(1f, 0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1f, 0f)),
      (3L, Array(0f, 0f), Array(1f, 0f))
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"), native(col("a"), col("b")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(1.0))
    assert(got(2L).isEmpty)       // null array → null
    assert(got(3L).exists(_.isNaN)) // zero vector → NaN, as the HOF
  }

  test("a null ELEMENT yields null, as the HOF (no scoring on partial data)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(1f), Some(0f))),
      (2L, Seq[Option[Float]](Some(1f), Some(0f)), Seq[Option[Float]](Some(1f), Some(0f)))
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"),
      native(col("a").cast("array<float>"), col("b").cast("array<float>")).as("nat"),
      Similarity.cosineHof(col("a").cast("array<float>"), col("b").cast("array<float>")).as("hof"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(got(1L) == ((true, true)), "null element must null out both paths")
    assert(got(2L) == ((false, false)))
  }

  test("length-mismatched arrays yield null, as the HOF (malformed rows drop out)") {
    import spark.implicits._
    val rows = Seq((1L, Array(1f, 0f, 0f), Array(1f, 0f)))
      .toDF("id", "a", "b")
    val r = rows.select(
      native(col("a"), col("b")).as("nat"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()(0)
    assert(r.isNullAt(0), s"native returned ${r.get(0)} for a dim mismatch")
    assert(r.isNullAt(1)) // the parity reference agrees
  }
}
