package graft.slowlog

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** End-to-end: distributed record-delimiter scan → events → wide table.
  * Includes a forced-small-split run to prove split-boundary safety of
  * the distributed reader (SURVEY.md §7 hard part 2). */
class SlowLogSparkSpec extends AnyFunSuite with SparkTestSession {

  private def writeFixture(dir: Path, name: String, text: String): Unit =
    Files.writeString(dir.resolve(name), text)

  private lazy val logDir: Path = {
    val dir = Files.createTempDirectory("graft-slowlog")
    // file 1: the FIXTURES.md representative log (3 events)
    writeFixture(dir, "slow001.log", SlowLogFixtures.slow001)
    // file 2: 40 events sharing 20 Time headers, db carry from one use
    val sb = new StringBuilder
    for (i <- 0 until 20) {
      sb.append(f"# Time: 2024-01-15T11:${i / 60}%02d:${i % 60}%02d.000000Z\n")
      for (j <- 0 until 2) {
        sb.append("# User@Host: u[u] @ h [10.0.0.1]  Id: 7\n")
        sb.append(f"# Query_time: 0.${i}%06d  Lock_time: 0.000001 Rows_sent: $j%d  Rows_examined: ${i * j}%d\n")
        if (i == 0 && j == 0) sb.append("use carried_db;\n")
        sb.append(f"SET timestamp=${1705315200L + i}%d;\n")
        sb.append(f"SELECT c$j%d FROM t$i%d WHERE k = $i%d;\n")
      }
    }
    writeFixture(dir, "slow002.log", sb.result())
    dir
  }

  test("distributed read: all events, both files, db carry across records") {
    val evs = SlowLogSource.read(spark, logDir.toString + "/*.log").collect()
    assert(evs.length == 43) // 3 + 40
    val f2 = evs.filter(_.user == "u")
    assert(f2.length == 40)
    // every event in file 2 carries the db set once at the head of the file
    assert(f2.forall(_.db == "carried_db"))
    // same-second second event got the shared Time header via record grouping
    assert(f2.map(_.query).toSet.size == 40)
  }

  test("distributed read equals sequential parse (file 2)") {
    val text = Files.readString(logDir.resolve("slow002.log"))
    val seq = SlowLogParser.parseString(text)
    val dist = SlowLogSource.read(spark, logDir.resolve("slow002.log").toString)
      .collect().sortBy(_.offset).toVector
    assert(dist == seq)
  }

  test("split-boundary safety: forced 256-byte input splits, same result") {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val prev = conf.get(key)
    conf.set(key, "256")
    try {
      val dist = SlowLogSource.read(spark, logDir.resolve("slow002.log").toString)
        .collect().sortBy(_.offset).toVector
      val seq = SlowLogParser.parseString(Files.readString(logDir.resolve("slow002.log")))
      assert(dist == seq)
    } finally {
      if (prev == null) conf.unset(key) else conf.set(key, prev)
    }
  }

  test("flatten: wide table columns, digest identity, defaults") {
    val wide = SlowLogTable.flatten(SlowLogSource.readRaw(spark, logDir.resolve("slow001.log").toString))
    val rows = wide.orderBy("offset").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getAs[String]("fingerprint") ==
      "select o_orderkey, o_totalprice from orders where o_custkey in(?+) and o_orderstatus = ?")
    assert(r1.getAs[String]("digest") ==
      Fingerprint.digestId(r1.getAs[String]("fingerprint")))
    assert(r1.getAs[Double]("query_time") == 0.003218)
    assert(r1.getAs[Long]("rows_sent") == 10L)
    // absent metrics default to 0 / false
    assert(r1.getAs[Long]("merge_passes") == 0L)
    assert(!r1.getAs[Boolean]("full_scan"))
    val r2 = rows(1)
    assert(r2.getAs[Boolean]("full_scan"))
    assert(r2.getAs[Long]("innodb_io_r_bytes") == 1638400L)
    assert(r2.getAs[Double]("innodb_io_r_wait") == 0.5)
    // admin event flattens too, with a digest over the passthrough fp
    val r3 = rows(2)
    assert(r3.getAs[Boolean]("admin"))
    assert(r3.getAs[String]("fingerprint") == "administrator command: Quit")
  }

  test("SQL registration: fingerprint/digest_id usable from spark.sql") {
    SlowLogTable.registerFunctions(spark)
    val row = spark.sql(
      "SELECT fingerprint('SELECT * FROM t WHERE a = 5') fp, digest_id('select ?') d")
      .collect().head
    assert(row.getString(0) == "select * from t where a = ?")
    assert(row.getString(1).matches("[0-9A-F]{16}"))
  }
}
