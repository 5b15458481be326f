package graft.streaming

import graft.operators.Qan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Drift-on-arrival monitoring: each micro-batch is tested against a
 * STORED reference distribution with the exact-integer two-sample KS
 * statistic (q248's [[Qan.ksDrift]]) — the streaming half of the
 * monitor shelf (PSI/KS/chi-square run batch; this runs at the door).
 *
 * The reference lives at rest as per-(group, unit) counts
 * (`(group, units, c)` — [[referenceCounts]] builds it, a plain
 * Warehouse table holds it). Per trigger, the batch's value counts
 * union the stored counts tagged by side and feed the SAME ksDrift
 * operator the batch surface uses, so the stream and batch monitors
 * cannot drift from each other. One row per (batch, group) appends to
 * `outPath` in a batch-id-keyed directory (Overwrite — replay
 * rewrites, never duplicates; the [[StreamingClassify]] idempotency
 * rule).
 *
 * Refreshing the reference between triggers (rebuild or blind-append
 * more counts — they are additive partials, the q201 rule) re-arms the
 * NEXT trigger with no restart.
 *
 * Scale posture: per trigger the exchange carries batch-distinct plus
 * reference-distinct (group, unit) rows — the reference rides
 * pre-aggregated, never the raw history; the KS windows are
 * group-partitioned cumulative sums, no collect anywhere.
 */
object StreamingMonitor {

  /** Build the at-rest reference side: exact per-(group, unit) counts
    * of the baseline corpus — additive partials, safe to blind-append
    * (the scorer re-aggregates on read). */
  def referenceCounts(ref: DataFrame, groupCol: String,
                      unitsCol: String): DataFrame =
    ref.select(col(groupCol).as("group"), col(unitsCol).cast("long").as("units"))
      .groupBy("group", "units")
      .agg(count(lit(1)).as("c"))

  /** One monitoring round — also the batch incremental API: KS of
    * `batch` against the stored reference counts, per group. */
  def ksAgainstReference(batch: DataFrame, groupCol: String,
                         unitsCol: String, refCounts: DataFrame): DataFrame = {
    val cur = batch
      .select(col(groupCol).as("group"), col(unitsCol).cast("long").as("units"))
      .groupBy("group", "units")
      .agg(count(lit(1)).as("c"))
      .withColumn("is_ref", lit(false))
    val ref = refCounts
      .groupBy("group", "units").agg(sum("c").as("c"))
      .withColumn("is_ref", lit(true))
    Qan.ksDriftWeighted(cur.unionByName(ref), "group", "units", "c", "is_ref")
  }

  def ksServe(docs: DataFrame, groupCol: String, unitsCol: String,
              refTable: String, outPath: String,
              checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val spark = batch.sparkSession
        ksAgainstReference(batch, groupCol, unitsCol, spark.table(refTable))
          .write.mode("overwrite")
          .parquet(s"$outPath/batch_id=$bid")
        ()
      }
      .start()
}
