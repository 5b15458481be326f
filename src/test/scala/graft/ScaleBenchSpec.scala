package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale harness's load-bearing claim is that corpus growth is
  * LINEAR BY CONSTRUCTION — k× replication with per-replica salting
  * must yield exactly k× the pair workload, never the k² copy-pathology
  * naive replication produces. That property is what makes the measured
  * scaling exponents interpretable, so it gets its own proof. */
class ScaleBenchSpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"

  test("scaleDocs: near-dup pairs grow exactly k×, never across replicas") {
    val pairs1 = Dedup.ngramJaccardPairs(
      ScaleBench.scaleDocs(spark, sf, 1), "doc_id", "text", 3, 0.6)
      .count()
    val scaled = ScaleBench.scaleDocs(spark, sf, 3)
    val pairs3 = Dedup.ngramJaccardPairs(scaled, "doc_id", "text", 3, 0.6)
    // every pair stays inside one replica (ids share the replica stride)
    val crossReplica = pairs3
      .filter(col("da").divide(10000000L).cast("long") =!=
        col("db").divide(10000000L).cast("long"))
      .count()
    assert(crossReplica == 0, "salting failed: cross-replica near-dups")
    assert(pairs3.count() == 3 * pairs1,
      s"pair workload is not linear: ${pairs3.count()} vs 3×$pairs1")
  }

  test("naive replication WOULD explode pairs — the pathology the salt avoids") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(50)
    val naive = docs.crossJoin(spark.range(3).toDF("rep"))
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        col("text"))
    val pairs = Dedup.ngramJaccardPairs(naive, "doc_id", "text", 3, 0.6)
    // each doc is now a perfect dup of its 2 siblings: ≥ 3 pairs per
    // doc from replication alone — super-linear in k, quadratic in
    // replica count, exactly what a scale benchmark must not measure
    assert(pairs.count() >= 3 * docs.count(),
      "expected the copy-pathology under unsalted replication")
  }

  test("scaleEmb: replicas are noised — no zero-distance duplicate pairs") {
    val emb = ScaleBench.scaleEmb(spark, sf, 2)
    val base = emb.filter(col("vec_id") < 10000000L)
      .select(col("vec_id").as("id0"), col("embedding").as("e0"))
    val rep = emb.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("id0"),
        col("embedding").as("e1"))
    val identical = base.join(rep, "id0")
      .filter(col("e0") === col("e1"))
      .count()
    assert(identical == 0, "replica embeddings must differ from originals")
    // and the noise is deterministic: same build twice → same bytes
    val again = ScaleBench.scaleEmb(spark, sf, 2)
      .filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("id0"),
        col("embedding").as("e2"))
    assert(rep.join(again, "id0").filter(col("e1") =!= col("e2")).count() == 0)
  }
}
