package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Interchange text formats (JSON-Lines + CSV) as first-class
 * sources/sinks beside parquet and JDBC — the formats corpus drops
 * arrive in before they are columnarized.
 *
 * Scale rules baked in:
 *  - writes are one file per partition, no driver funnel — repartition
 *    upstream if file-count targets matter;
 *  - reads take an EXPLICIT schema: schema inference is a full extra
 *    pass over the data (at 100 TB, a second 100 TB scan) and type
 *    guesses drift between samples — the caller always knows the
 *    schema, so the API refuses to infer;
 *  - CSV is header+quoted (quotes/commas/escapes/embedded newlines
 *    round-trip, spec-proven) but stays a LAST-RESORT interchange:
 *    empty strings come back null (documented lossy edge), multiLine
 *    parsing makes each file a single input split (the price of
 *    newline round-trip — another reason to land into parquet
 *    immediately), and nothing prunes or pushes down.
 */
object FileFormats {

  /** Write as JSON-Lines (one JSON object per line, per-partition
    * parallel writers). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Read JSON-Lines with the caller's schema (never inferred). */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write as headered CSV with standard quoting. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Read headered CSV with the caller's schema (never inferred).
    * `multiLine` is on so quoted fields containing newlines (which
    * [[writeCsv]] quotes correctly) parse as one record instead of
    * splitting into corrupt rows. */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true").csv(path)
}
