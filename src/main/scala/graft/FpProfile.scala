package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/**
 * Scratch measurement main for the SURVEY §7.4 decision-ledger item,
 * open since round 2: "lift the fingerprint UDF to a codegen Expression
 * only if it exceeds 30% of ingest wall time."
 *
 * Method: the Bench ingest corpus (200k events / 32 files), full
 * scan → parse → flatten → noop write, min-of-3 per config:
 *   A. real fingerprint UDF (the shipped path)
 *   B. identity fingerprint (`col("query")`) — same plan shape, same
 *      digest md5 downstream, zero normalization work
 * The A−B gap is the fingerprint's share. Result is recorded in
 * SCALE.md §7; the ledger item closes either way.
 */
object FpProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-fp-profile")
    val dir = Bench.ingestLog(200000, 32)
    try {
      def run(fp: Column): Unit =
        graft.slowlog.SlowLogTable.flatten(
          graft.slowlog.SlowLogSource.readRaw(spark, dir.toString), fp)
          .write.format("noop").mode("overwrite").save()
      def timed(fp: Column): Double = {
        val t0 = System.nanoTime(); run(fp); (System.nanoTime() - t0) / 1e9
      }
      val viaUdf: Column = graft.slowlog.SlowLogTable.fingerprintUdf(col("query"))
      val viaExpr: Column = graft.slowlog.SlowLogTable.fingerprintCol(col("query"))
      val ident: Column = col("query")
      // warm every plan, then interleave timed passes so drift (GC,
      // page cache) hits the configs symmetrically
      run(viaUdf); run(viaExpr); run(ident)
      val a = Seq.fill(3)(timed(viaUdf)).min
      val e = Seq.fill(3)(timed(viaExpr)).min
      val b = Seq.fill(3)(timed(ident)).min
      val shareUdf = (a - b) / a * 100
      val shareExpr = (e - b) / e * 100
      println(f"fp_profile udf=${a}%.3fs expr=${e}%.3fs identity=${b}%.3fs " +
        f"share_udf=${shareUdf}%.1f%% share_expr=${shareExpr}%.1f%%")
    } finally {
      val entries = java.nio.file.Files.list(dir)
      try entries.forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally entries.close()
      java.nio.file.Files.deleteIfExists(dir)
    }
    spark.stop()
  }
}
