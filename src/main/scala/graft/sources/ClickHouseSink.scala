package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.types.StructType

/**
 * Out-of-band ClickHouse table preparation for the ingest CLI — the
 * create-if-missing half of the reference's sink contract (SURVEY.md
 * §1.1: the upstream ships fixed `queries` DDL in its README and
 * assumes the table exists; here the DDL GENERATES from the wide
 * schema via [[ClickHouseDialect.createTableDdl]] and executes before
 * the first batch insert, so a networked user is one `-dsn
 * jdbc:clickhouse://…` flag away from the full round trip).
 *
 * Offline boundary (deliberate, documented): statement GENERATION is
 * golden-tested (`clickhouse_wide_schema.golden`); EXECUTION needs a
 * live server plus the ClickHouse JDBC driver jar, neither present in
 * this environment. [[prepareStatements]] is split out so the spec
 * asserts exactly the statements a networked [[ensureTable]] run would
 * execute — not a paraphrase of them.
 */
object ClickHouseSink {

  /** The statements [[ensureTable]] executes, in order: today just the
    * month-partitioned MergeTree create-if-missing for the wide table.
    * A schema-migration statement stream would append here. */
  def prepareStatements(schema: StructType, table: String): Seq[String] =
    Seq(ClickHouseDialect.createTableDdl(schema, table))

  /** Execute [[prepareStatements]] against the target over plain JDBC
    * (driver-side, once per ingest run — DDL is not a distributed
    * concern). Needs the driver jar on the classpath and a reachable
    * server; see the offline boundary note above. */
  def ensureTable(url: String, driver: String, schema: StructType,
                  table: String): Unit = {
    Class.forName(driver)
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try prepareStatements(schema, table).foreach(st.execute)
      finally st.close()
    } finally conn.close()
  }
}
