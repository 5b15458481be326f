package graft.sources

import java.sql.SQLException
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/**
 * Spark `JdbcDialect` for DuckDB, the offline stand-in sink for the
 * reference's ClickHouse target (SURVEY.md M3).
 *
 * Two fixes over the generic dialect:
 *  - Spark 4's `tableExists` probe rethrows the probe failure unless
 *    `isObjectNotFoundException` recognizes it; DuckDB reports missing
 *    tables as a plain `Catalog Error: ... does not exist!` SQLException
 *    with no SQLState, so the generic classifier rethrows and the first
 *    write to a fresh database dies.
 *  - the generic dialect maps BooleanType to `BIT(1)`, which DuckDB's
 *    parser rejects; map it (and StringType) to native DuckDB types.
 */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  // DuckDB TRUNCATE never cascades (no FK actions) — and Spark's JDBC
  // writer only takes the truncate=true overwrite path when the dialect
  // says Some(false); the default None silently falls back to
  // drop-and-recreate, defeating the option (the ClickHouse contract's
  // executable stand-in needs the real truncate path)
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  // Only the table-missing shape: a broad "Catalog Error" match would
  // classify missing functions/columns as table-not-found and send
  // Spark down the create-table path instead of surfacing the error.
  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val m = e.getMessage
    m != null && m.contains("Table with name") && m.contains("does not exist")
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
    case StringType => Some(JdbcType("VARCHAR", java.sql.Types.VARCHAR))
    case FloatType => Some(JdbcType("FLOAT", java.sql.Types.FLOAT))
    case ByteType => Some(JdbcType("TINYINT", java.sql.Types.TINYINT))
    case _ => None
  }

  private val registered = new AtomicBoolean(false)

  /** Register with Spark's dialect registry (idempotent). */
  def register(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
