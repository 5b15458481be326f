package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming funnel's ordering/state contract: intra-batch
  * disorder sorted away, cross-batch advancement through the
  * checkpointed state store (incl. across query restarts), conversion
  * window enforced, reached stages emitted exactly once. */
class StreamingFunnelSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", LongType),
    StructField("event_type", StringType)))

  private def run(srcDir: String, ckpt: String, outDir: String,
                  maxGap: Option[Long] = None): Unit = {
    import spark.implicits._
    val q = StreamingFunnel.progress(
        spark.readStream.schema(schema).parquet(srcDir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        maxGap)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000); q.stop()
  }

  private def emitted(outDir: String): Set[(Long, Int, Long)] =
    spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("funnel progress: intra-batch sort, cross-batch state, restart persistence") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-sfx-src").toString
    val outDir = Files.createTempDirectory("graft-sfx-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-sfx-ckpt").toString

    // batch 1: u1's click ARRIVES before its view but is later in event
    // time → the sort makes view@10 then click@20 both count; u2's
    // click@5 precedes its view@10 in EVENT time → stage 1 only
    Seq((1L, 20L, "click"), (1L, 10L, "view"),
        (2L, 5L, "click"), (2L, 10L, "view"))
      .toDF("user_id", "ts", "event_type")
      .write.mode("append").parquet(srcDir)
    run(srcDir, ckpt, outDir)
    assert(emitted(outDir) == Set((1L, 1, 10L), (1L, 2, 20L), (2L, 1, 10L)))

    // batch 2 (fresh query, same checkpoint — a RESTART): u1 purchases
    // (state remembers stage 2 @20), u2 clicks late but validly
    Seq((1L, 30L, "purchase"), (2L, 40L, "click"))
      .toDF("user_id", "ts", "event_type")
      .write.mode("append").parquet(srcDir)
    run(srcDir, ckpt, outDir)
    assert(emitted(outDir) == Set((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
      (2L, 1, 10L), (2L, 2, 40L)))
  }

  test("at-rest rollup of the streamed log equals the batch funnel") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-sfr-src").toString
    val outDir = Files.createTempDirectory("graft-sfr-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-sfr-ckpt").toString
    // an in-order log (the reconciliation contract's premise): 3 users
    // reach view, 2 click, 1 purchases; plus a duplicated progress
    // append (the replay caveat) that the distinct count must absorb
    val log = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 11L, "view"), (2L, 25L, "click"),
      (3L, 12L, "view"), (3L, 13L, "browse"))
    log.toDF("user_id", "ts", "event_type")
      .write.mode("append").parquet(srcDir)
    run(srcDir, ckpt, outDir)
    // simulate a crash-replayed micro-batch: re-append one emitted row
    spark.read.parquet(outDir).limit(1)
      .write.mode("append").parquet(outDir)
    val stages = Seq("view", "click", "purchase")
    val streamed = StreamingFunnel.funnelTable(
        spark.read.parquet(outDir), stages)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = graft.operators.Behavior.funnel(
        log.toDF("user_id", "ts", "event_type"),
        "user_id", org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_type"), stages)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(batch == Seq((1L, "view", 3L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("funnel progress: conversion window rejects late transitions") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-sfw-src").toString
    val outDir = Files.createTempDirectory("graft-sfw-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-sfw-ckpt").toString
    Seq((1L, 10L, "view"), (1L, 15L, "click"),   // within gap 50
        (2L, 10L, "view"), (2L, 100L, "click"))  // outside
      .toDF("user_id", "ts", "event_type")
      .write.mode("append").parquet(srcDir)
    run(srcDir, ckpt, outDir, maxGap = Some(50L))
    assert(emitted(outDir) == Set((1L, 1, 10L), (1L, 2, 15L), (2L, 1, 10L)))
  }
}
