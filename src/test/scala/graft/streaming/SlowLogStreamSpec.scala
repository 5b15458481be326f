package graft.streaming

import graft.SparkTestSession
import graft.slowlog.{SlowLogFixtures, SlowLogParser}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import scala.collection.mutable.ArrayBuffer

/** Streaming surface tests (SURVEY.md M4): record framing parity with the
  * batch parser, checkpoint resume as the offset-tracking analog,
  * watermarked windowed aggregation, stateful dedup, session windows, and
  * the foreachBatch JDBC sink. */
class SlowLogStreamSpec extends AnyFunSuite with SparkTestSession {

  private def tempDir(prefix: String): Path = Files.createTempDirectory(prefix)

  private def eventFile(i: Int, nEvents: Int, sameSecond: Boolean = false): String = {
    val sb = new StringBuilder
    for (j <- 0 until nEvents) {
      val sec = if (sameSecond) 0 else j
      sb.append(f"# Time: 2024-02-0${i + 1}%dT08:00:$sec%02d.000000Z\n")
      sb.append("# User@Host: u[u] @ h [10.0.0.1]\n")
      sb.append(f"# Query_time: 0.10000$j%d  Lock_time: 0.000001 Rows_sent: $j%d  Rows_examined: 10\n")
      sb.append(f"SET timestamp=${1706774400L + i * 3600 + sec}%d;\n")
      sb.append(f"SELECT c FROM t$i%d WHERE k = $j%d;\n")
    }
    sb.result()
  }

  test("restoreHeader: lineSep-framed records reparse to the batch result") {
    val text = SlowLogFixtures.slow001
    val whole = SlowLogParser.parseString(text)
    val records = text.split("\n# Time: ", -1)
    val streamed = records.flatMap(r =>
      SlowLogParser.parseString(SlowLogStream.restoreHeader(r)))
    assert(streamed.length == whole.length)
    assert(streamed.map(_.query).toSeq == whole.map(_.query).toSeq)
    assert(streamed.map(_.ts).toSeq == whole.map(_.ts).toSeq)
  }

  test("restoreHeader: CRLF records keep their Time header (batch parity)") {
    val text = SlowLogFixtures.slow001.replace("\n", "\r\n")
    val whole = SlowLogParser.parseString(text)
    // the streaming lineSep "\n# Time: " leaves a post-delimiter record
    // starting with the bare timestamp value followed by "\r\n..."
    val records = text.split("\n# Time: ", -1)
    val streamed = records.flatMap(r =>
      SlowLogParser.parseString(SlowLogStream.restoreHeader(r)))
    assert(streamed.length == whole.length)
    assert(streamed.map(_.ts).toSeq == whole.map(_.ts).toSeq)
    assert(streamed.forall(_.ts != null))
  }

  test("checkpoint resume: restarted query processes only new files (offset parity)") {
    val logDir = tempDir("graft-stream-in")
    val ckpt = tempDir("graft-stream-ckpt").toString
    val batchCounts = ArrayBuffer.empty[Long]

    def runOnce(): Unit = {
      val q = SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batchCounts.synchronized { batchCounts += b.count() }
          ()
        }
        .start()
      q.awaitTermination(60000)
      q.stop()
    }

    Files.writeString(logDir.resolve("f1.log"), eventFile(0, 3))
    runOnce()
    assert(batchCounts.sum == 3, s"first run: $batchCounts")

    Files.writeString(logDir.resolve("f2.log"), eventFile(1, 5))
    runOnce()
    // resume: f1 is in the checkpoint's file log, only f2's events arrive
    assert(batchCounts.sum == 8, s"after resume: $batchCounts")
  }

  test("parseChunk: two-chunk parse equals the one-pass concatenated parse") {
    // the property eventsWithSessionCarry is built on: splitting a log at
    // ANY record boundary and handing the SessionCarry across must yield
    // the same events as a single sequential pass
    val chunk1 =
      """# Time: 2024-02-01T08:00:00.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.100000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |# Log_slow_rate_type: query  Log_slow_rate_limit: 20
        |use shopdb;
        |SET timestamp=1706774400;
        |SELECT a FROM t1;
        |""".stripMargin
    val chunk2 =
      """# Time: 2024-02-01T08:01:00.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.200000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |SET timestamp=1706774460;
        |SELECT b FROM t2;
        |""".stripMargin
    val whole = SlowLogParser.parseString(chunk1 + chunk2)
    val (ev1, carry) = SlowLogParser.parseChunk(chunk1)
    val (ev2, _) = SlowLogParser.parseChunk(chunk2, carry)
    val twoPass = ev1 ++ ev2
    assert(twoPass.map(e => (e.query, e.db, e.rateType, e.rateLimit)) ==
      whole.map(e => (e.query, e.db, e.rateType, e.rateLimit)))
    // the carried state did the work: chunk 2 alone has no db/rate
    assert(ev2.head.db == "shopdb" && ev2.head.rateLimit.contains(20L))
    val (cold, _) = SlowLogParser.parseChunk(chunk2)
    assert(cold.head.db == null && cold.head.rateLimit.isEmpty)
  }

  test("session carry: use db in batch 1 governs the stream's batch-2 events across a restart") {
    // SURVEY §7 hard part 4: the reference's single tailing reader keeps
    // session state between reads; here the state store keeps it between
    // micro-batches AND query restarts. Two rotation chunks of one
    // logical stream arrive in separate runs sharing a checkpoint.
    val logDir = tempDir("graft-carry-in")
    val ckpt = tempDir("graft-carry-ckpt").toString
    val seen = ArrayBuffer.empty[(String, String, Option[Long])]
    def runOnce(): Unit = {
      val q = SlowLogStream.eventsWithSessionCarry(spark, logDir.toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.slowlog.SlowLogEvent], _: Long) =>
            seen.synchronized {
              seen ++= b.collect().map(e => (e.query, e.db, e.rateLimit))
            }
            ()
        }
        .start()
      q.awaitTermination(60000)
      q.stop()
    }
    Files.writeString(logDir.resolve("slow.log"),
      """# Time: 2024-02-01T08:00:00.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.100000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |# Log_slow_rate_type: query  Log_slow_rate_limit: 20
        |use shopdb;
        |SET timestamp=1706774400;
        |SELECT a FROM t1;
        |""".stripMargin)
    runOnce()
    assert(seen.toList == List(("SELECT a FROM t1", "shopdb", Some(20L))))
    // second chunk of the SAME stream (rotation suffix), no use/rate of
    // its own, delivered to a RESTARTED query
    Files.writeString(logDir.resolve("slow.log.1"),
      """# Time: 2024-02-01T08:01:00.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.200000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |SET timestamp=1706774460;
        |SELECT b FROM t2;
        |""".stripMargin)
    // an unrelated stream in the same dir must NOT inherit shopdb
    Files.writeString(logDir.resolve("other.log"),
      """# Time: 2024-02-01T08:01:30.000000Z
        |# User@Host: u[u] @ h [10.0.0.1]
        |# Query_time: 0.300000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1
        |SET timestamp=1706774490;
        |SELECT c FROM t3;
        |""".stripMargin)
    runOnce()
    val byQuery = seen.toList.groupBy(_._1)
    assert(byQuery("SELECT b FROM t2") == List(("SELECT b FROM t2", "shopdb", Some(20L))),
      s"carry lost across batches/restart: $seen")
    assert(byQuery("SELECT c FROM t3") == List(("SELECT c FROM t3", null, None)),
      s"carry leaked across streams: $seen")
  }

  test("stream-stream interval join correlates replica rows within the delay") {
    val primDir = tempDir("graft-ss-prim")
    val replDir = tempDir("graft-ss-repl")
    def log(t0: Long, n: Int): String = {
      val sb = new StringBuilder
      for (j <- 0 until n) {
        sb.append("# Time: 2024-02-01T08:00:00.000000Z\n")
        sb.append("# User@Host: u[u] @ h [10.0.0.1]\n")
        sb.append(f"# Query_time: 0.100000  Lock_time: 0.000001 Rows_sent: 1  Rows_examined: 1\n")
        sb.append(f"SET timestamp=${t0 + j * 600}%d;\n") // 10 min apart
        sb.append(s"SELECT c FROM rep WHERE k = $j;\n")
      }
      sb.result()
    }
    val t0 = 1706774400L
    // replica executes the same digest 30 s before each primary row —
    // inside the 5 min maxDelay; the 10 min spacing keeps pairs unique
    Files.writeString(primDir.resolve("p.log"), log(t0, 3))
    Files.writeString(replDir.resolve("r.log"), log(t0 - 30, 3))
    val joined = SlowLogStream.intervalJoin(
      SlowLogStream.wideRows(SlowLogStream.events(spark, primDir.toString)),
      SlowLogStream.wideRows(SlowLogStream.events(spark, replDir.toString)),
      key = "digest")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    val rows = spark.table("ss_join").collect()
    assert(rows.length == 3, s"expected 3 pairs, got ${rows.toSeq}")
    assert(rows.forall(_.getAs[Long]("lag_s") == 30L), rows.toSeq)
  }

  test("left-outer interval join emits unmatched left rows once the watermark proves absence") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val lDir = tempDir("graft-ssoj-l").toString
    val rDir = tempDir("graft-ssoj-r").toString
    val ckpt = tempDir("graft-ssoj-ckpt").toString
    val outDir = tempDir("graft-ssoj-out").toString + "/out"
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampType)))
    def rows(dir: String, xs: Seq[(String, Long)]): Unit =
      xs.map { case (k, s) => (k, new java.sql.Timestamp(s * 1000L)) }
        .toDF("k", "ts").write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val j = SlowLogStream.intervalJoinOuter(
        spark.readStream.schema(schema).parquet(lDir),
        spark.readStream.schema(schema).parquet(rDir), key = "k")
      val q = j.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000); q.stop()
    }
    val t0 = 1706774400L
    // a matches (replica 120 s earlier); b has NO right-side echo
    rows(lDir, Seq(("a", t0), ("b", t0)))
    rows(rDir, Seq(("a", t0 - 120)))
    runOnce()
    // later traffic on BOTH sides advances the watermark past b's
    // match horizon; eviction runs against the PREVIOUS batch's
    // watermark, so push twice
    rows(lDir, Seq(("c", t0 + 3600)))
    rows(rDir, Seq(("c", t0 + 3480)))
    runOnce()
    rows(lDir, Seq(("d", t0 + 7200)))
    rows(rDir, Seq(("d", t0 + 7080)))
    runOnce()
    val out = spark.read.parquet(outDir)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(2)), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    // matched rows carry their lag; the orphan emits with nulls
    assert(out("a")._2.contains(120L) && out("c")._2.contains(120L) &&
      out("d")._2.contains(120L), out.toString)
    assert(out.contains("b") && out("b")._1.isEmpty && out("b")._2.isEmpty,
      s"unmatched left row missing or non-null: $out")
  }

  test("watermarked tumbling per-digest aggregation") {
    val logDir = tempDir("graft-stream-agg")
    // 4 events in one second-window, same digest (same fingerprint shape)
    Files.writeString(logDir.resolve("f.log"), eventFile(0, 4, sameSecond = true))
    val agg = SlowLogStream.digestWindowedAgg(
      SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString)),
      windowLen = "1 minute", watermark = "2 minutes")
    val q = agg.writeStream.format("memory").queryName("digest_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    val rows = spark.table("digest_agg").collect()
    // all 4 events share one fingerprint (k = ? normalized) and one window
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("cnt") == 4L)
    // unsampled log: the rate-scaled count degenerates to the count
    assert(rows.head.getAs[Long]("cnt_scaled") == 4L)
  }

  test("streaming latency sketch merges onto the batch sketch exactly") {
    val logDir = tempDir("graft-stream-sketch")
    Files.writeString(logDir.resolve("f.log"), eventFile(0, 4, sameSecond = true))
    val sk = SlowLogStream.digestLatencySketch(
      SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString)),
      windowLen = "1 minute", watermark = "2 minutes")
    val q = sk.writeStream.format("memory").queryName("lat_sketch")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    // summed across windows, the streamed counters must EQUAL the batch
    // sketch of the same log — same bucket arithmetic, counts add — so
    // streamed rows can append straight onto the at-rest sketch table
    // grouped on the at-rest key (digest, day, bucket): the projected
    // `day` column must line up with the batch sketch's, not just the
    // bucket arithmetic
    val streamed = spark.table("lat_sketch")
      .groupBy("digest", "day", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    val batchWide = graft.slowlog.SlowLogTable.flatten(
      graft.slowlog.SlowLogSource.readRaw(spark, logDir.toString))
    val batch = graft.operators.Qan.latencySketch(batchWide)
      .groupBy("digest", "day", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(streamed == batch)
    assert(streamed.values.sum == 4L)
  }

  test("sliding windows emit one row per overlapping window") {
    val logDir = tempDir("graft-stream-slide")
    Files.writeString(logDir.resolve("f.log"), eventFile(0, 4, sameSecond = true))
    val agg = SlowLogStream.digestWindowedAgg(
      SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString)),
      windowLen = "2 minutes", watermark = "5 minutes", slide = Some("1 minute"))
    val q = agg.writeStream.format("memory").queryName("slide_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    val rows = spark.table("slide_agg").collect()
    // one event instant, 2-minute windows sliding by 1 → two windows
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("cnt") == 4L))
  }

  test("dropDuplicatesWithinWatermark collapses replayed events") {
    val logDir = tempDir("graft-stream-dedup")
    val one = eventFile(0, 3)
    // the same log shipped twice (replay) in two files
    Files.writeString(logDir.resolve("a.log"), one)
    Files.writeString(logDir.resolve("b.log"), one)
    val dedup = SlowLogStream.dedupWithinWatermark(
      SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString)))
    val counts = ArrayBuffer.empty[Long]
    val q = dedup.writeStream
      .option("checkpointLocation", tempDir("graft-dedup-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        counts.synchronized { counts += b.count() }; ()
      }.start()
    q.awaitTermination(60000); q.stop()
    assert(counts.sum == 3, s"expected 3 unique of 6 shipped, got $counts")
  }

  test("session windows group a user's burst into one session") {
    val logDir = tempDir("graft-stream-sess")
    Files.writeString(logDir.resolve("f.log"), eventFile(0, 5))
    val sess = SlowLogStream.userSessions(
      SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString)),
      gap = "10 minutes", watermark = "1 hour")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000); q.stop()
    val rows = spark.table("sessions").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_queries") == 5L)
  }

  test("flatMapGroupsWithState: per-digest totals survive a restart") {
    val logDir = tempDir("graft-stream-state")
    val ckpt = tempDir("graft-state-ckpt").toString
    val seen = ArrayBuffer.empty[(String, Long)]

    def runOnce(): Unit = {
      val totals = SlowLogStream.digestRunningTotals(
        SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString)))
      val q = totals.writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[DigestTotals], _: Long) =>
          seen.synchronized {
            seen ++= b.collect().map(t => (t.digest, t.cnt))
          }
          ()
        }
        .start()
      q.awaitTermination(60000); q.stop()
    }

    // file 1: 3 events, all the same fingerprint shape → one digest
    Files.writeString(logDir.resolve("s1.log"), eventFile(0, 3, sameSecond = true))
    runOnce()
    // identical query shape again in a new file → same digest, new state run
    Files.writeString(logDir.resolve("s2.log"), eventFile(0, 3, sameSecond = true))
    runOnce()

    val byRun = seen.toList
    assert(byRun.map(_._2).contains(3L), s"first run totals: $byRun")
    // cumulative across restart: the second run reports 6, not 3
    assert(byRun.map(_._2).contains(6L), s"state not restored: $byRun")
  }

  test("transformWithState: per-digest totals survive a restart (RocksDB provider)") {
    // the Spark-4 arbitrary-state API needs the RocksDB provider
    // (multiple column families); conf restored after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = scala.util.Try(spark.conf.get(key)).toOption.flatMap(Option(_))
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val logDir = tempDir("graft-tws-state")
      val ckpt = tempDir("graft-tws-ckpt").toString
      val seen = ArrayBuffer.empty[(String, Long)]

      def runOnce(): Unit = {
        val totals = SlowLogStream.digestRunningTotalsTws(
          SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString)))
        val q = totals.writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.Dataset[DigestTotals], _: Long) =>
            seen.synchronized {
              seen ++= b.collect().map(t => (t.digest, t.cnt))
            }
            ()
          }
          .start()
        q.awaitTermination(60000); q.stop()
      }

      Files.writeString(logDir.resolve("t1.log"), eventFile(0, 3, sameSecond = true))
      runOnce()
      Files.writeString(logDir.resolve("t2.log"), eventFile(0, 3, sameSecond = true))
      runOnce()

      val byRun = seen.toList
      assert(byRun.map(_._2).contains(3L), s"first run totals: $byRun")
      // ValueState restored from the checkpoint: cumulative 6, not 3
      assert(byRun.map(_._2).contains(6L), s"state not restored: $byRun")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("foreachBatch JDBC sink lands streamed events in the warehouse") {
    val logDir = tempDir("graft-stream-jdbc")
    Files.writeString(logDir.resolve("f.log"), eventFile(0, 4))
    val url = s"jdbc:duckdb:${tempDir("graft-stream-db").resolve("s.db")}"
    val wide = SlowLogStream.wideRows(SlowLogStream.events(spark, logDir.toString))
      // DuckDB boolean DDL handled by the registered dialect
    val q = SlowLogStream.startJdbcSink(wide, url, "queries",
      "org.duckdb.DuckDBDriver", tempDir("graft-jdbc-ckpt").toString)
    q.processAllAvailable(); q.stop()
    val back = graft.sources.JdbcSink.read(spark, url, "queries",
      "org.duckdb.DuckDBDriver")
    assert(back.count() == 4L)
    assert(back.select("digest").distinct().count() == 1L)
  }
}
