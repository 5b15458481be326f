package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{CoreQueries, ExtQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the 5-way join + agg shape (q05) so the smoke path exercises
    * scan, broadcast join, shuffle agg, and sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q05_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ExtQueries.oracles

  /** Bench-only timings ([[ExtQueries.benchOnly]]) — merged into the
    * benchmark inventory by [[Bench]], NEVER into [[queries]]: they have
    * no oracle and must not dilute the 83-entry correctness surface. */
  def benchExtra: Map[String, (SparkSession, String) => DataFrame] =
    ExtQueries.benchOnly
}
