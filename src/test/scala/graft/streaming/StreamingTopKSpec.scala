package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The streaming heavy-hitter contract: per-shard Space-Saving state
  * accumulates across micro-batches AND query restarts; the rolled-up
  * at-rest log equals exact counting when capacity suffices; with a
  * tight capacity the Space-Saving guarantees (containment +
  * bounded overestimate) hold and emissions stay capacity-bounded. */
class StreamingTopKSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType(Seq(StructField("item", StringType)))

  /** Drive the stream with foreachBatch appending the Update-mode
    * emissions to a parquet log — the at-rest posture a dashboard
    * tails. */
  private def run(srcDir: String, ckpt: String, outDir: String): Unit = {
    val q = StreamingTopK.hitters(
        spark.readStream.schema(schema).parquet(srcDir),
        "item", k = 5, capacity = 64, shards = 4)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[HitterUpdate], _: Long) =>
        batch.write.mode("append").parquet(outDir): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000); q.stop()
  }

  private def top(outDir: String): Seq[(String, Long)] =
    StreamingTopK.hittersTable(spark.read.parquet(outDir), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  private def exactTop(df: DataFrame, k: Int): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    df.groupBy("item").count()
      .orderBy(col("count").desc, col("item")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("streamed hitters equal exact counts across batches and a restart") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-stk-src").toString
    val outDir = Files.createTempDirectory("graft-stk-out").toString + "/log"
    val ckpt = Files.createTempDirectory("graft-stk-ckpt").toString

    val b1 = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e", "f")).toDF("item")
    b1.write.mode("append").parquet(srcDir)
    run(srcDir, ckpt, outDir)
    assert(top(outDir) == exactTop(spark.read.parquet(srcDir), 5))

    // fresh query, same checkpoint — state survives the restart and
    // batch-2 counts ACCUMULATE onto batch-1's
    val b2 = (Seq.fill(4)("c") ++ Seq.fill(2)("f") ++ Seq("a", "g")).toDF("item")
    b2.write.mode("append").parquet(srcDir)
    run(srcDir, ckpt, outDir)
    assert(top(outDir) == exactTop(spark.read.parquet(srcDir), 5))
    // c rose past b only because state accumulated (2+4=6 > 3); it ties
    // a (5+1) and the sketch's (count desc, item) rule breaks the tie
    assert(top(outDir).take(2) == Seq(("a", 6L), ("c", 6L)))
  }

  test("tight capacity: containment + bounded overestimate, emissions bounded") {
    import spark.implicits._
    // one shard, capacity 3, heavily skewed: x dominates
    val items = (Seq.fill(30)("x") ++ Seq.fill(10)("y") ++
      (1 to 12).map(i => s"noise$i")).toDF("item")
    val out = StreamingTopK.hitters(items, "item", k = 3, capacity = 3,
        shards = 1)
      .collect() // batch-mode flatMapGroupsWithState: one fold, one emission
    assert(out.length <= 3)
    val byItem = out.map(u => u.item -> u).toMap
    // any item with frequency > n/capacity (52/3 ≈ 17) must be present
    assert(byItem.contains("x"))
    // Space-Saving invariant: count overestimates, count - err understates
    val x = byItem("x")
    assert(x.count >= 30 && x.count - x.err <= 30)
  }
}
