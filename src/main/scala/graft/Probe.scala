package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Scratch main: per-probe q41 ANN hit counts across LSH configs. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-probe")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 5)
      val exact = Similarity.knnBatch(emb, probes, "vec_id", "embedding", k = 3)
        .select(col("probe_id"), col("nn_id"))
      for ((tables, bits) <- Seq((8, 4), (16, 4), (16, 5), (32, 5), (16, 6))) {
        val ann = Similarity.annCosineTopK(emb, probes, "vec_id", "embedding",
            k = 3, tables = tables, bits = bits)
          .select(col("probe_id"), col("nn_id"))
        val hits = exact.join(ann, Seq("probe_id", "nn_id"))
          .groupBy("probe_id").agg(count(lit(1)).as("h"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val line = (0L to 4L).map(p => s"$p:${hits.getOrElse(p, 0L)}").mkString(" ")
        println(s"== $sf t=$tables b=$bits  $line")
      }
    }
    spark.stop()
  }
}
