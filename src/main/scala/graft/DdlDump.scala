package graft

/** Scratch main: print the generated ClickHouse DDL + INSERT for the
  * REAL wide schema (golden-file source for ClickHouseDialectSpec). */
object DdlDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-ddldump")
    val dir = java.nio.file.Files.createTempDirectory("graft-ddl")
    java.nio.file.Files.writeString(dir.resolve("one.log"),
      """# Time: 2024-02-01T08:00:00.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.100000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |SET timestamp=1706774400;
        |SELECT 1;
        |""".stripMargin)
    val wide = graft.slowlog.SlowLogTable.flatten(
      graft.slowlog.SlowLogSource.readRaw(spark, dir.toString))
    println("=== DDL ===")
    println(graft.sources.ClickHouseDialect.createTableDdl(wide.schema, "queries"))
    println("=== INSERT ===")
    println(graft.sources.ClickHouseDialect.insertSql(wide.schema, "queries"))
    spark.stop()
  }
}
