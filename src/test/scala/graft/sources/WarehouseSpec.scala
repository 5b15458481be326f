package graft.sources

import graft.SparkTestSession
import graft.slowlog.{SlowLogSource, SlowLogTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Proves the SCALE.md §2 layout claims on the real write paths:
  * date-partition pruning and bucketed no-shuffle aggregation. */
class WarehouseSpec extends AnyFunSuite with SparkTestSession {

  private lazy val wide = {
    val dir = Files.createTempDirectory("graft-wh")
    val sb = new StringBuilder
    for (day <- 15 to 17; i <- 0 until 4) {
      sb.append(f"# Time: 2024-01-$day%02dT10:00:0$i%d.000000Z\n")
      sb.append("# User@Host: u[u] @ h [10.0.0.1]\n")
      sb.append(f"# Query_time: 0.100000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: $i%d\n")
      sb.append(s"SELECT * FROM t$i WHERE k = $day;\n")
    }
    Files.writeString(dir.resolve("wh.log"), sb.result())
    SlowLogTable.flatten(SlowLogSource.readRaw(spark, dir.toString))
  }

  test("date-partitioned layout prunes partitions for time-ranged reads") {
    val out = Files.createTempDirectory("graft-wh-out").toString + "/queries"
    Warehouse.writePartitioned(wide, out)
    // three day-partitions written
    val days = Warehouse.read(spark, out).select("q_date").distinct().count()
    assert(days == 3)
    val filtered = Warehouse.read(spark, out)
      .filter(col("q_date") === "2024-01-16")
    val scan = filtered.queryExecution.executedPlan.toString
    // the date predicate reaches the scan as a partition filter
    assert(scan.contains("PartitionFilters") && scan.contains("q_date"), scan)
    assert(filtered.count() == 4)
  }

  test("digest-bucketed table aggregates per digest without an exchange") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    Warehouse.saveBucketed(wide, "queries_bucketed", buckets = 4)
    try {
      val agg = spark.table("queries_bucketed")
        .groupBy("digest").agg(count(lit(1)).as("cnt"), sum("query_time").as("t"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg still shuffles:\n$plan")
      assert(agg.count() == wide.select("digest").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS queries_bucketed")
    }
  }
}
