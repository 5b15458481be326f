package graft.streaming

import graft.slowlog.{SlowLogEvent, SlowLogParser, SlowLogTable}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Cumulative per-digest totals carried in the state store. */
final case class DigestState(cnt: Long, totalTime: Double)

/** One update row emitted per digest per micro-batch. */
final case class DigestTotals(digest: String, cnt: Long, totalTime: Double)

/**
 * Structured-Streaming analog of the reference's tail-the-log loop
 * (SURVEY.md §2.2 streaming block, M4). The file-source checkpoint IS the
 * reference's byte-offset resume: files already listed in the checkpoint
 * are never reprocessed, so a restarted query continues exactly where it
 * stopped (R1/R10 parity, proven in the spec).
 *
 * Record framing: the text source splits on the `"\n# Time: "` record
 * separator, same as the batch scan. The consumed header is restored by
 * inspecting the first line — a post-delimiter record begins directly
 * with the timestamp VALUE (the separator ate `"# Time: "`), while a
 * file-head record begins with banner junk or a complete `# Time:` line;
 * only the former gets the prefix back.
 *
 * `use db` carry on the streaming path comes in two grades: the
 * splittable [[events]] source carries within-record only (cross-record
 * carry requires total byte order, which an unordered distributed stream
 * cannot replay — events keep their explicit db or null), while
 * [[eventsWithSessionCarry]] restores FULL reference semantics for
 * rotated/shipped logs by holding each logical stream's session state in
 * the checkpointed state store across micro-batches.
 *
 * The `offset` column is RECORD-RELATIVE here (the streaming text source
 * exposes no file byte offsets), so unlike the batch path it is not an
 * idempotency key. Resume/exactly-once accounting on this path comes
 * from the file-source checkpoint plus the `foreachBatch` batch id —
 * never from `offset`.
 */
object SlowLogStream {

  private val TsStart =
    """^(\d{6}\s+\d{1,2}:\d{2}:\d{2}.*|\d{4}-\d{2}-\d{2}[T ].*)""".r

  /** Restore the record-separator prefix when the record starts with a
    * bare timestamp value. Exposed for the parser-parity test. */
  def restoreHeader(record: String): String = {
    // strip a trailing '\r' too: java regex '.' excludes line terminators,
    // so a CRLF log would otherwise never match TsStart and silently lose
    // its '# Time:' header (the batch parser handles CRLF; keep parity)
    val firstLine = record.takeWhile(c => c != '\n' && c != '\r')
    firstLine match {
      case TsStart(_) => "# Time: " + record
      case _ => record
    }
  }

  /** Streaming event source over a growing directory of slow logs. */
  def events(spark: SparkSession, dir: String): Dataset[SlowLogEvent] = {
    import spark.implicits._
    spark.readStream
      .format("text")
      .option("lineSep", "\n# Time: ")
      .load(dir)
      .as[String]
      .flatMap(rec => SlowLogParser.parseString(restoreHeader(rec)))
  }

  /** Streaming wide-table rows (fingerprint + digest + flattened
    * metrics) — the unit every downstream stream consumes. */
  def wideRows(events: Dataset[SlowLogEvent]): DataFrame =
    SlowLogTable.flatten(events.toDF())

  /** Logical-stream key for a chunk file: full path with any numeric
    * rotation suffix stripped, so `…/slow.log`, `…/slow.log.1`,
    * `…/slow.log.2` all belong to one tailed stream. */
  def defaultStreamKey(file: String): String =
    file.replaceAll("\\.\\d+$", "")

  /** Rotation order within one micro-batch: numeric-aware on the
    * trailing suffix (`.2` before `.10` — lexical order gets this
    * wrong past single digits), with the suffix-less head file first. */
  private[streaming] def rotationOrder(file: String): (String, Long) = {
    val m = "\\.(\\d+)$".r.findFirstMatchIn(file)
    m match {
      case Some(g) => (file.substring(0, g.start), g.group(1).toLong)
      case None => (file, -1L)
    }
  }

  /**
   * [[events]] with FULL session carry — SURVEY §7 hard part 4, closed:
   * a `use db` (or rate-limit annotation) seen in one micro-batch
   * governs events of the same logical stream in every later
   * micro-batch, exactly like the reference's single tailing reader.
   *
   * Shape: one row per CHUNK FILE (`wholetext`), grouped by logical
   * stream ([[defaultStreamKey]] strips rotation suffixes), ordered by
   * rotation number within the batch, parsed by the batch state machine
   * seeded with the stream's stored [[SlowLogParser.SessionCarry]] —
   * which then goes back to the state store for the next batch
   * (checkpointed, so carry survives restarts too). Two-chunk parse ≡
   * one concatenated parse is spec-proven at the parser level.
   *
   * Scale contract: this path holds ONE CHUNK's text per task — right
   * for rotated/shipped slow logs (bounded by the rotation size), wrong
   * for one giant unrotated file; bulk history loads should use the
   * batch scan, and order-insensitive streams can keep the splittable
   * [[events]] source. Parallelism is per logical stream — a fleet of
   * database hosts shipping logs fans out naturally.
   */
  def eventsWithSessionCarry(spark: SparkSession, dir: String,
                             streamKey: String => String = defaultStreamKey)
      : Dataset[SlowLogEvent] = {
    import spark.implicits._
    val keyFn = streamKey
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .load(dir)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .groupByKey { case (file, _) => keyFn(file) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, chunks: Iterator[(String, String)],
         state: GroupState[SlowLogParser.SessionCarry]) =>
          var carry = state.getOption.getOrElse(SlowLogParser.SessionCarry.empty)
          val out = Vector.newBuilder[SlowLogEvent]
          chunks.toVector.sortBy { case (f, _) => rotationOrder(f) }
            .foreach { case (_, text) =>
              val (evs, next) = SlowLogParser.parseChunk(text, carry)
              out ++= evs
              carry = next
            }
          state.update(carry)
          out.result().iterator
      }
  }

  /**
   * QAN sparkline as a stream: per-digest tumbling (or, with `slide` <
   * `windowLen`, sliding) window aggregates with late-data drop. Emits
   * (window, digest, cnt, cnt_scaled, total_time, rows_sent) —
   * `cnt_scaled` applies the Percona rate-limit multiplier exactly
   * like the batch [[graft.operators.Qan.profile]], so a sampled log
   * streams true call volume too.
   */
  def digestWindowedAgg(wide: DataFrame,
                        windowLen: String = "1 minute",
                        watermark: String = "2 minutes",
                        slide: Option[String] = None): DataFrame =
    wide
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide.getOrElse(windowLen)),
        col("digest"))
      .agg(count(lit(1)).as("cnt"),
        sum(greatest(col("rate_limit"), lit(1L))).as("cnt_scaled"),
        sum("query_time").as("total_time"),
        sum("rows_sent").as("rows_sent"))

  /**
   * Streaming HDR latency sketch (round 9): per-(window, digest, bucket)
   * counts with late-data drop — the STREAMING face of
   * [[graft.operators.Qan.latencySketch]], sharing its exact bucket
   * arithmetic ([[graft.operators.Pipeline.hdrBucketOf]], query_time
   * scaled to µs). The at-rest table is keyed (digest, day, bucket), so
   * each row also carries `day` projected from the window start:
   * `.select("digest", "day", "bucket", "cnt")` appends straight onto
   * the stored sketch and merges by addition (windows never straddle a
   * day boundary at sub-day lengths). State per open window is bounded
   * by |digests| × ~1000 buckets — counters, never events — and the
   * watermark reclaims it; this is how the p95 dashboard stays current
   * without ever re-scanning the fact table.
   */
  def digestLatencySketch(wide: DataFrame,
                          windowLen: String = "1 minute",
                          watermark: String = "2 minutes"): DataFrame =
    wide
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("digest"),
        graft.operators.Pipeline.hdrBucketOf(col("query_time") * 1e4))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("day", to_date(col("window.start")).cast("string"))

  /** Stateful dedup: first occurrence of each (digest, ts) within the
    * watermark horizon (replayed/duplicated log shipments collapse). */
  def dedupWithinWatermark(wide: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    wide
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest", "ts")

  /** Per-user session windows over event time (gap-based). */
  def userSessions(wide: DataFrame,
                   gap: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame =
    wide
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user"))
      .agg(count(lit(1)).as("n_queries"),
        sum("query_time").as("total_time"))

  /**
   * Arbitrary-state analog of the reference's in-process session state
   * (SURVEY.md §2.2 R6 row): cumulative per-digest totals via
   * `flatMapGroupsWithState`. State lives in the checkpointed state
   * store, so totals survive query restarts — proven in the spec.
   */
  def digestRunningTotals(wide: DataFrame): Dataset[DigestTotals] = {
    val spark = wide.sparkSession
    import spark.implicits._
    wide.select(col("digest"), col("query_time"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (digest: String, rows: Iterator[(String, Double)],
         state: GroupState[DigestState]) =>
          var s = state.getOption.getOrElse(DigestState(0L, 0.0))
          rows.foreach { case (_, qt) => s = DigestState(s.cnt + 1, s.totalTime + qt) }
          state.update(s)
          Iterator(DigestTotals(digest, s.cnt, s.totalTime))
      }
  }

  /** [[digestRunningTotals]] on the Spark-4 `transformWithState` API —
    * explicit state-variable handles (here one `ValueState`) instead of
    * the single `GroupState` blob. Requires the RocksDB state store
    * provider (multiple column families); same output contract as the
    * fMGWS version, equality + restart proven in the spec. */
  class DigestTotalsProcessor
      extends StatefulProcessor[String, (String, Double), DigestTotals] {
    @transient private var state: ValueState[DigestState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DigestState]("totals",
        org.apache.spark.sql.Encoders.product[DigestState], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Double)],
                                 timerValues: TimerValues): Iterator[DigestTotals] = {
      var s = Option(state.get()).getOrElse(DigestState(0L, 0.0))
      rows.foreach { case (_, qt) => s = DigestState(s.cnt + 1, s.totalTime + qt) }
      state.update(s)
      Iterator.single(DigestTotals(key, s.cnt, s.totalTime))
    }
  }

  def digestRunningTotalsTws(wide: DataFrame): Dataset[DigestTotals] = {
    val spark = wide.sparkSession
    import spark.implicits._
    wide.select(col("digest"), col("query_time"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new DigestTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /**
   * Stream-stream interval join: each left wide-row matches right
   * wide-rows with the same `key` whose event time lies in
   * `[left.ts - maxDelay, left.ts]` — e.g. primary-vs-replica slow-log
   * correlation ("which replica executions trailed this primary
   * query, and by how much"). Both sides carry watermarks, so Spark
   * BOUNDS the join state: a buffered right row is dropped once the
   * left watermark passes its ts + maxDelay — state is
   * O(traffic × horizon), never unbounded history. Output:
   * (key, l_ts, r_ts, lag_s), append-mode capable.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   maxDelay: String = "5 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(col(key), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, col(key) === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $maxDelay") &&
        col("r_ts") <= col("l_ts"))
      .select(col(key), col("l_ts"), col("r_ts"),
        (unix_timestamp(col("l_ts")) - unix_timestamp(col("r_ts")))
          .as("lag_s"))
  }

  /**
   * LEFT-OUTER watermarked interval join — [[intervalJoin]] plus the
   * rows it can never show: a left row with NO right match inside its
   * interval emits with null right columns once the watermark passes
   * its match horizon (`l_ts`, i.e. the latest possible partner) — the
   * "primary query that no replica ever echoed" row an inner join
   * silently drops. State stays watermark-bounded exactly like the
   * inner form; unmatched emissions are necessarily LATE by up to the
   * watermark delay (they exist only once absence is provable), and in
   * practice surface on a SUBSEQUENT trigger, since eviction runs
   * against the watermark the previous batch established.
   */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, key: String,
                        maxDelay: String = "5 minutes",
                        watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(col(key), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, col(key) === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $maxDelay") &&
        col("r_ts") <= col("l_ts"), "leftOuter")
      .select(col(key), col("l_ts"), col("r_ts"),
        (unix_timestamp(col("l_ts")) - unix_timestamp(col("r_ts")))
          .as("lag_s"))
  }

  /**
   * Batched-idempotent JDBC sink: `foreachBatch` + the [[graft.sources.JdbcSink]]
   * batch writer — the reference's accumulate/commit loop per micro-batch,
   * with the checkpoint providing exactly-once file accounting.
   */
  def startJdbcSink(wide: DataFrame, url: String, table: String,
                    driver: String, checkpointDir: String,
                    trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                    batchSize: Int = 10000,
                    numPartitions: Option[Int] = Some(1))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = wide.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.JdbcSink.write(batch, url, table, driver,
          batchSize = batchSize, numPartitions = numPartitions)
      }
    trigger.foreach(w.trigger)
    w.start()
  }
}
