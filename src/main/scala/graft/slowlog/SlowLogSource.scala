package graft.slowlog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, TextInputFormat}
import org.apache.spark.rdd.NewHadoopRDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed slow-log scan (SURVEY.md §2.1 R1–R2, §1.2 mapping).
 *
 * Spark-first design instead of the reference's single-goroutine file
 * tail:
 *
 *  1. `TextInputFormat` with record delimiter `"\n# Time: "` splits the
 *     log at event boundaries, so a 100 TB log directory parallelizes
 *     across executors with no seen-it-all coordinator. Each record is
 *     one or more complete events (consecutive same-second events share
 *     one `# Time:` header and therefore one record).
 *  2. Each record runs the sequential [[SlowLogParser]] state machine via
 *     `mapPartitions` — identical semantics to the reference parser
 *     within a record.
 *  3. The one cross-record dependency — `use db` carry — is re-established
 *     declaratively with a `last(db, ignoreNulls)` running window per
 *     file ordered by byte offset. This is the only shuffle in the scan,
 *     keyed by file; slow logs rotate, so files bound partition size.
 *     (A single never-rotated 100 TB file would serialize this window —
 *     at that point carry semantics are inherently sequential.)
 *
 * Limitation shared with the record-delimiter trick: a line inside a
 * quoted SQL string that begins with `# Time: ` splits a record early;
 * the same text also confuses line-based parsers, pt-query-digest
 * included.
 */
object SlowLogSource {

  private val Delim = "\n# Time: "
  private val DelimPrefixBytes = "# Time: ".getBytes("UTF-8").length

  /** Raw distributed scan: one row per event, plus the source `file`
    * column, `db` filled across records. */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", Delim)
    val hrdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .asInstanceOf[NewHadoopRDD[LongWritable, Text]]

    val events = hrdd.mapPartitionsWithInputSplit { (split, iter) =>
      val file = split.asInstanceOf[FileSplit].getPath.toString
      iter.flatMap { case (k, v) =>
        val off = k.get()
        // Records after the first lost the consumed "# Time: " delimiter:
        // restore the header so the state machine sees a complete event.
        val (text, base) =
          if (off == 0L) (v.toString, 0L)
          else ("# Time: " + v.toString, math.max(0L, off - DelimPrefixBytes))
        SlowLogParser.parseString(text, base).map(e => (file, e))
      }
    }

    events.toDF("file", "event").select(col("file"), col("event.*"))
      .transform(fillCarry)
  }

  /** Typed event stream with reference (sequential-carry) semantics. */
  def read(spark: SparkSession, path: String): Dataset[SlowLogEvent] = {
    import spark.implicits._
    readRaw(spark, path).drop("file").as[SlowLogEvent]
  }

  /** Session-carried fields re-established across record boundaries:
    * `use db` and the Percona rate annotations carry forward to later
    * events that set none of their own — last non-null per file in
    * byte-offset order. One window spec, one sort, all three fills. */
  private def fillCarry(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("file").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("db", last("db", ignoreNulls = true).over(w))
      .withColumn("rateType", last("rateType", ignoreNulls = true).over(w))
      .withColumn("rateLimit", last("rateLimit", ignoreNulls = true).over(w))
  }
}
