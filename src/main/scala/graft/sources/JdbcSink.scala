package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Batched JDBC sink (SURVEY.md §2.1 R10) — the Spark analog of the
 * reference's accumulate-N-rows / commit / repeat insert loop.
 *
 * Spark's JDBC writer already IS that loop, per partition: each task
 * opens a connection, feeds a PreparedStatement in `batchsize` chunks,
 * and commits per partition — so `numPartitions` is the reference's
 * "concurrent ingest workers" knob. Against a cluster sink (ClickHouse
 * et al.) leave partitioning alone and size `batchsize` at 10⁴–10⁵; an
 * embedded single-writer target (DuckDB in the offline tests) needs
 * `numPartitions = Some(1)` since concurrent writers would conflict on
 * the file lock.
 */
object JdbcSink {

  def write(
      df: DataFrame,
      url: String,
      table: String,
      driver: String,
      mode: String = "append",
      batchSize: Int = 10000,
      numPartitions: Option[Int] = None,
      createTableColumnTypes: Option[String] = None,
      truncate: Boolean = false): Unit = {
    if (url.startsWith("jdbc:duckdb:")) DuckDbDialect.register()
    if (ClickHouseDialect.canHandle(url)) ClickHouseDialect.register()
    // repartition, NOT coalesce: coalesce(n) is a narrow dependency that
    // would collapse the whole upstream parse/fingerprint pipeline into
    // n tasks; one shuffle of the final rows keeps ingest parallel and
    // lets the knob raise partition counts too.
    val repartitioned = numPartitions match {
      case Some(n) => df.repartition(n)
      case None => df
    }
    val w = repartitioned.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .option("batchsize", batchSize.toLong)
      .option("isolationLevel", "READ_COMMITTED")
    createTableColumnTypes.foreach(t => w.option("createTableColumnTypes", t))
    // truncate-on-overwrite preserves a pre-created table (engine
    // clause, column types, grants) instead of drop-and-recreate —
    // mandatory for ClickHouse, whose tables Spark cannot CREATE
    // without an ENGINE clause (Ingest.prepareClickHouse owns the DDL)
    if (truncate) w.option("truncate", "true")
    w.mode(mode).save()
  }

  /** Read a JDBC table back (round-trip verification / QAN reads). */
  def read(spark: org.apache.spark.sql.SparkSession, url: String,
           table: String, driver: String): DataFrame = {
    if (url.startsWith("jdbc:duckdb:")) DuckDbDialect.register()
    if (ClickHouseDialect.canHandle(url)) ClickHouseDialect.register()
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .load()
  }
}
