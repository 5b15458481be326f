package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Load amplification (SURVEY.md §2.1 R11): replicate a dataset n× for
 * sink/ingest benchmarking, as the reference's re-ingest-N-times flag.
 * A broadcast-range cross join — no shuffle of the amplified side; each
 * input partition emits its rows n times.
 */
object Amplify {
  def apply(df: DataFrame, n: Int): DataFrame =
    df.crossJoin(broadcast(
      df.sparkSession.range(n.toLong).select(col("id").as("_copy"))))
      .drop("_copy")
}
