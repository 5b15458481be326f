package graft.operators

import graft.SparkTestSession
import graft.slowlog.{SlowLogSource, SlowLogTable}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end QAN report over an ingested log: the reference's full
  * user journey (log → events → wide table → top-queries report). */
class QanSpec extends AnyFunSuite with SparkTestSession {

  private lazy val wide = {
    val dir = Files.createTempDirectory("graft-qan")
    val sb = new StringBuilder
    // digest A: 6 slow calls; digest B: 3 fast calls; two users on A
    for (i <- 0 until 9) {
      val (tbl, qt, user) =
        if (i < 6) ("orders", 0.5 + i * 0.1, if (i % 2 == 0) "alice" else "bob")
        else ("nation", 0.001, "alice")
      sb.append(f"# Time: 2024-01-15T10:0${i / 6}%d:0$i%02d.000000Z\n")
      sb.append(s"# User@Host: $user[$user] @ h [10.0.0.1]\n")
      sb.append(f"# Query_time: $qt%.6f  Lock_time: 0.000001 Rows_sent: 5  Rows_examined: ${100 * (i + 1)}%d\n")
      sb.append(f"SET timestamp=${1705312800L + i}%d;\n")
      sb.append(s"SELECT * FROM $tbl WHERE k = $i;\n")
    }
    Files.writeString(dir.resolve("qan.log"), sb.result())
    SlowLogTable.flatten(SlowLogSource.readRaw(spark, dir.toString))
  }

  test("profile ranks digests by total time with correct aggregates") {
    val prof = Qan.profile(wide).collect()
    assert(prof.length == 2)
    val top = prof(0)
    assert(top.getAs[String]("fingerprint") == "select * from orders where k = ?")
    assert(top.getAs[Long]("cnt") == 6L)
    assert(top.getAs[Long]("n_users") == 2L)
    assert(math.abs(top.getAs[Double]("total_time") - (0.5 + 0.6 + 0.7 + 0.8 + 0.9 + 1.0)) < 1e-9)
    assert(top.getAs[Long]("rows_examined") == (1 to 6).map(_ * 100L).sum)
    val second = prof(1)
    assert(second.getAs[String]("fingerprint") == "select * from nation where k = ?")
    assert(second.getAs[Long]("cnt") == 3L)
  }

  test("sparkline buckets per digest and hour") {
    val sl = Qan.sparkline(wide, "hour").collect()
    // all events fall in hour 10:00; 2 digests → 2 rows
    assert(sl.length == 2)
    assert(sl.map(_.getAs[Long]("cnt")).sum == 9L)
  }

  test("load breakdown rolls up db and user") {
    val rows = Qan.loadByDbUser(wide).collect()
    // rollup: grand total + per-db + per-(db,user)
    val grand = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("cnt") == 9L)
  }
}
