package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch main: measure the RECALL of q41c's bench config (tables=8,
  * bits=11, 500 probes, k=3) against the exact kNN under the identical
  * load, at both oracle SFs — the r7 verdict's open item: the
  * probe-vs-exact speedup headline is only meaningful at a known recall.
  * Prints per-SF mean recall@3 and the floor distribution (how many
  * probes keep 3/2/1/0 of their exact top-3). */
object Q41cRecall {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-q41c-recall")
    val configs = Seq((32, 6), (16, 5), (32, 5))
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 500)
      val exact = Similarity.knnBatch(emb, probes, "vec_id", "embedding", k = 3)
        .select("probe_id", "nn_id").persist()
      exact.count()
      for ((tables, bits) <- configs) {
        val idx = Similarity.annBucketFrame(emb, "vec_id", "embedding",
          tables = tables, bits = bits)
        val ann = Similarity.annCosineTopKFrom(idx, probes, "vec_id", "embedding",
            k = 3, tables = tables, bits = bits)
          .select("probe_id", "nn_id")
        val hits = exact.join(ann, Seq("probe_id", "nn_id"))
          .groupBy("probe_id").agg(count(lit(1)).as("hits"))
        val dist = probes.select(col("vec_id").as("probe_id"))
          .join(hits, Seq("probe_id"), "left")
          .select(coalesce(col("hits"), lit(0L)).as("hits"))
          .groupBy("hits").count().orderBy(col("hits").desc)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val n = probes.count()
        val mean = dist.map { case (h, c) => h * c }.sum.toDouble / (3.0 * n)
        println(f"== $sf  tables=$tables%2d bits=$bits%2d  probes=$n  recall@3=$mean%.4f  " +
          s"dist=${(0L to 3L).reverse.map(h => s"$h:${dist.getOrElse(h, 0L)}").mkString(" ")}")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
