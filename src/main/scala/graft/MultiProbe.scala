package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch main: multi-probe LSH recall/cost surface. A deliberately
  * coarse config (few tables, log₂N bits — the third-decade regime where
  * fixed `tables` stops holding recall) is probed at flips=0/2/4 under
  * the q41c 500-probe load; prints recall@3, hit distribution, and the
  * probe-only wall time per flips setting (index prebuilt + cached, so
  * the timing isolates the probe join exactly like q41c). */
object MultiProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-multiprobe")
    val configs = Seq((16, 8), (16, 7))
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 500)
      val exact = Similarity.knnBatch(emb, probes, "vec_id", "embedding", k = 3)
        .select("probe_id", "nn_id").persist()
      exact.count()
      for ((tables, bits) <- configs) {
        val idx = Similarity.annBucketFrame(emb, "vec_id", "embedding",
          tables = tables, bits = bits).persist()
        idx.count()
        for (flips <- Seq(0, 4, 6)) {
          // min-of-2 probe wall time, result forced via count
          def once(): (Double, Long) = {
            val t0 = System.nanoTime()
            val n = Similarity.annCosineTopKFromMulti(idx, probes, "vec_id",
              "embedding", k = 3, tables = tables, bits = bits, flips = flips)
              .count()
            ((System.nanoTime() - t0) / 1e9, n)
          }
          val (t1, _) = once(); val (t2, _) = once()
          val ann = Similarity.annCosineTopKFromMulti(idx, probes, "vec_id",
              "embedding", k = 3, tables = tables, bits = bits, flips = flips)
            .select("probe_id", "nn_id")
          val hits = exact.join(ann, Seq("probe_id", "nn_id"))
            .groupBy("probe_id").agg(count(lit(1)).as("hits"))
          val dist = probes.select(col("vec_id").as("probe_id"))
            .join(hits, Seq("probe_id"), "left")
            .select(coalesce(col("hits"), lit(0L)).as("hits"))
            .groupBy("hits").count()
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val n = probes.count()
          val mean = dist.map { case (h, c) => h * c }.sum.toDouble / (3.0 * n)
          println(f"== $sf t=$tables%2d b=$bits%2d flips=$flips  " +
            f"recall@3=$mean%.4f  probe_s=${math.min(t1, t2)}%.3f  " +
            s"dist=${(0L to 3L).reverse.map(h => s"$h:${dist.getOrElse(h, 0L)}").mkString(" ")}")
        }
        idx.unpersist()
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
