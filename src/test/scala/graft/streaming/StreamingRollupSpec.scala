package graft.streaming

import graft.SparkTestSession
import graft.operators.Rollup
import graft.sources.Warehouse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming rollup contract: per-batch partials append blind onto
  * the at-rest table across micro-batches AND query restarts, the
  * merged read equals a batch recompute over everything that arrived,
  * and a REPLAYED batch (the crash-recovery case) collapses exactly via
  * the batch-id stamp — streamed ≡ batch, the SlowLogStreamSpec
  * reconciliation pattern applied to aggregate maintenance. */
class StreamingRollupSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType(Seq(
    StructField("d", LongType), StructField("ty", StringType),
    StructField("v", LongType)))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet

  test("streamed partial appends equal batch recompute across a restart; replay collapses") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-srl-src").toString
    val ckpt = Files.createTempDirectory("graft-srl-ckpt").toString
    val tbl = "graft_bench_stream_rollup"
    Warehouse.dropWithLocation(spark, tbl)

    def runOnce(): Unit = {
      val q = StreamingRollup.rollupSink(
        spark.readStream.schema(schema).parquet(srcDir),
        col("d"), col("ty"), col("v"), tbl, ckpt)
      q.processAllAvailable(); q.stop()
    }

    val b1 = Seq((1L, "a", 10L), (1L, "a", 14L), (1L, "b", 7L),
      (2L, "a", 3L)).toDF("d", "ty", "v")
    b1.write.mode("append").parquet(srcDir)
    runOnce()

    // fresh query, same checkpoint — batch 2 appends onto batch 1's rows
    val b2 = Seq((1L, "a", 2L), (2L, "a", 40L), (3L, "c", 5L))
      .toDF("d", "ty", "v")
    b2.write.mode("append").parquet(srcDir)
    runOnce()

    val all = spark.read.parquet(srcDir)
    val expected = rows(Rollup.finalizeRollup(
      Rollup.dailyPartials(all, col("d"), col("ty"), col("v"))))
    assert(rows(StreamingRollup.readRollup(spark, tbl)) == expected)

    // crash-recovery replay: re-append batch 2's partials under its
    // ORIGINAL batch id — bit-identical rows, so the merged read is
    // unchanged (a count-doubling bug would show here immediately)
    val before = spark.table(tbl).count()
    StreamingRollup.appendBatch(b2, batchId = 1L, col("d"), col("ty"),
      col("v"), tbl)
    assert(spark.table(tbl).count() > before) // the dup rows ARE stored
    assert(rows(StreamingRollup.readRollup(spark, tbl)) == expected)

    // a NEW id for the same data is a genuine new batch and must count
    StreamingRollup.appendBatch(b2, batchId = 99L, col("d"), col("ty"),
      col("v"), tbl)
    assert(rows(StreamingRollup.readRollup(spark, tbl)) != expected)

    Warehouse.dropWithLocation(spark, tbl)
  }
}
