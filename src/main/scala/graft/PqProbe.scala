package graft

import org.apache.spark.sql.functions._

/** Scratch measurement main: per-probe PQ hit counts (vs exact top-3)
  * across candidate cuts and codebook layouts at both oracle SFs —
  * the q83 contract (ok = hits >= 2 per probe) must hold at BOTH
  * before a config ships (the round-7 sf0.1 rerun caught candidates
  * =100 failing probe 3 there). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-pq-probe")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val probes = emb.filter(col("vec_id") < 5)
      val exact = graft.operators.Similarity
        .knnBatch(emb, probes, "vec_id", "embedding", k = 3)
        .select("probe_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (perSub <- Seq(true, false); cand <- Seq(100, 150, 200)) {
        val pq = graft.operators.Similarity
          .pqCosineTopK(emb, probes, "vec_id", "embedding", k = 3,
            candidates = cand, perSubspace = perSub)
          .select("probe_id", "nn_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val hits = (0L until 5L).map(p =>
          (exact & pq).count(_._1 == p)).mkString(",")
        println(s"== $sf perSub=$perSub cand=$cand hits=[$hits]")
      }
      // IVF-PQ composite (q214): recall surface over nprobe × candidates
      // × subspaces. Measured r11: the contract config (nprobe=12,
      // subs=16, cand=150) recalls 3/3 on every probe at BOTH SFs;
      // nprobe=8 leaves an sf0.01 cell miss (probe 1 at 2/3, candidate-
      // insensitive), subs=8 at cand=150 leaves sf0.1 ADC misses
      // (fixed by cand=300 OR the finer subs=16 residual codebook).
      for (nprobe <- Seq(8, 12); cand <- Seq(150, 300); subs <- Seq(8, 16)) {
        val ivfpq = graft.operators.Similarity
          .ivfPqTopK(emb, probes, "vec_id", "embedding", k = 3,
            nlist = 16, nprobe = nprobe, candidates = cand,
            subspaces = subs)
          .select("probe_id", "nn_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val hits = (0L until 5L).map(p =>
          (exact & ivfpq).count(_._1 == p)).mkString(",")
        println(s"== $sf ivfpq nprobe=$nprobe cand=$cand subs=$subs hits=[$hits]")
      }
      // the q53 IVF contract config (nlist=16, nprobe=8) + the spec's
      // tighter nprobe=4
      for (nprobe <- Seq(4, 8)) {
        val ivf = graft.operators.Similarity
          .ivfCosineTopK(emb, probes, "vec_id", "embedding", k = 3,
            nlist = 16, nprobe = nprobe)
          .select("probe_id", "nn_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val hits = (0L until 5L).map(p =>
          (exact & ivf).count(_._1 == p)).mkString(",")
        println(s"== $sf ivf nprobe=$nprobe hits=[$hits]")
      }
    }
    spark.stop()
  }
}
