package graft.sources

import java.sql.SQLException
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/**
 * Spark `JdbcDialect` for ClickHouse — the reference's ACTUAL sink
 * (SURVEY.md §1.1: one wide `queries` table, bulk-inserted over the
 * native/JDBC protocol `[U: main.go DSN handling]`). The offline test
 * environment has no ClickHouse server and no resolvable JDBC driver, so
 * the wire round-trip is untestable here (README notes the limitation);
 * what IS tested offline is everything this object GENERATES: the type
 * mapping, identifier quoting, and the MergeTree DDL for the wide table.
 * [[DuckDbDialect]] remains the stand-in for executable round-trips.
 *
 * Dialect choices, all public ClickHouse semantics:
 *  - identifiers quote with backticks (ClickHouse accepts both backtick
 *    and double-quote; backtick survives the widest client matrix);
 *  - Spark types map to the classic ClickHouse scalar set — `String`,
 *    `UInt8` for booleans (the pre-`Bool` convention the ~2019 upstream
 *    targeted), `Int8/16/32/64`, `Float32/64`, `DateTime64(6)` for
 *    microsecond timestamps, `Date` for dates;
 *  - nullable Spark fields wrap as `Nullable(T)` in generated DDL —
 *    ClickHouse columns are non-nullable by default, the exact inverse
 *    of the SQL standard, so forgetting the wrapper turns every null
 *    insert into a runtime error (the wide table avoids the wrapper
 *    by construction: its metric columns are coalesced NOT-NULL with
 *    0/""/false defaults, matching the reference's DDL shape);
 *  - a bare CREATE TABLE is invalid in ClickHouse — every table needs
 *    `ENGINE = ...`; [[createTableOptions]] supplies the MergeTree
 *    clause for Spark's JDBC writer, [[createTableDdl]] emits the whole
 *    statement for out-of-band DDL (the reference ships fixed DDL in
 *    its README the same way).
 */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean = {
    val u = url.toLowerCase(java.util.Locale.ROOT)
    u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:")
  }

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** ClickHouse TRUNCATE never cascades (no foreign keys exist), and
    * declaring it lets Spark's JDBC writer take the `truncate=true`
    * overwrite path — which is the ONLY valid overwrite for ClickHouse:
    * the drop-and-recreate default would re-issue Spark's ENGINE-less
    * CREATE TABLE, invalid on a live server. [[graft.Ingest]] maps
    * `-mode overwrite` on a ClickHouse DSN to this path. */
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** Standard ClickHouse truncate statement (the base dialect's shape,
    * pinned here so a Spark default change cannot silently emit
    * unsupported SQL). */
  override def getTruncateQuery(table: String,
      cascade: Option[Boolean] = isCascadingTruncateTable()): String =
    s"TRUNCATE TABLE $table"

  /** ClickHouse reports a missing table as error code 60
    * (`UNKNOWN_TABLE`); the JDBC driver surfaces it as an SQLException
    * whose message carries the server error ("Code: 60" and/or the
    * UNKNOWN_TABLE symbol). Without this classifier Spark 4's
    * `tableExists` probe rethrows and the first write to a fresh
    * database dies — the same failure shape DuckDB had. */
  override def isObjectNotFoundException(e: SQLException): Boolean = {
    val m = e.getMessage
    e.getErrorCode == 60 ||
      (m != null && (m.contains("UNKNOWN_TABLE") ||
        (m.contains("Code: 60") && m.contains("doesn't exist"))))
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("String", java.sql.Types.VARCHAR))
    case BooleanType => Some(JdbcType("UInt8", java.sql.Types.TINYINT))
    case ByteType => Some(JdbcType("Int8", java.sql.Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", java.sql.Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", java.sql.Types.INTEGER))
    case LongType => Some(JdbcType("Int64", java.sql.Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", java.sql.Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", java.sql.Types.DOUBLE))
    case TimestampType => Some(JdbcType("DateTime64(6)", java.sql.Types.TIMESTAMP))
    case DateType => Some(JdbcType("Date", java.sql.Types.DATE))
    case _ => None
  }

  /** ClickHouse type for one Spark field, with the `Nullable(T)`
    * wrapper ClickHouse requires for null-accepting columns. */
  def clickHouseType(field: StructField): String = {
    val base = getJDBCType(field.dataType)
      .getOrElse(throw new IllegalArgumentException(
        s"no ClickHouse mapping for ${field.dataType.sql} (column ${field.name})"))
      .databaseTypeDefinition
    if (field.nullable) s"Nullable($base)" else base
  }

  /** `createTableOptions` clause for Spark's JDBC writer: the engine
    * spec a plain Spark `CREATE TABLE` lacks. Default mirrors the
    * reference's layout intent — month-partitioned MergeTree ordered by
    * (digest, ts), the access path of every QAN query. */
  def createTableOptions(orderBy: Seq[String] = Seq("digest", "ts"),
                         partitionBy: Option[String] = Some("toYYYYMM(ts)"))
      : String = {
    val part = partitionBy.map(p => s" PARTITION BY $p").getOrElse("")
    s"ENGINE = MergeTree()$part ORDER BY (${orderBy.map(quoteIdentifier).mkString(", ")})"
  }

  /** Full CREATE TABLE statement for a Spark schema — the out-of-band
    * DDL path (the reference README's fixed DDL, generated instead of
    * hand-kept). Unit-tested offline; execution needs a live server. */
  def createTableDdl(schema: StructType, table: String,
                     orderBy: Seq[String] = Seq("digest", "ts"),
                     partitionBy: Option[String] = Some("toYYYYMM(ts)"))
      : String = {
    val cols = schema.fields
      .map(f => s"  ${quoteIdentifier(f.name)} ${clickHouseType(f)}")
      .mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS ${quoteIdentifier(table)} (
       |$cols
       |) ${createTableOptions(orderBy, partitionBy)}""".stripMargin
  }

  /** Single-row INSERT statement shape for the wide table (what the
    * JDBC writer prepares per batch row) — exposed for the offline SQL
    * spec; the writer itself builds the equivalent internally. */
  def insertSql(schema: StructType, table: String): String = {
    val names = schema.fields.map(f => quoteIdentifier(f.name)).mkString(", ")
    val marks = schema.fields.map(_ => "?").mkString(", ")
    s"INSERT INTO ${quoteIdentifier(table)} ($names) VALUES ($marks)"
  }

  private val registered = new AtomicBoolean(false)

  /** Register with Spark's dialect registry (idempotent). */
  def register(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
