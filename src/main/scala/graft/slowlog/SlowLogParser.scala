package graft.slowlog

import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.collection.mutable

/**
 * Line-oriented state machine that turns a MySQL/Percona slow-query log
 * into [[SlowLogEvent]]s (SURVEY.md §2.1 R2–R6; format per public
 * MySQL/Percona documentation — the reference checkout is empty, so this
 * is built from the documented format, not ported code).
 *
 * Handled, single pass, O(1) memory per event:
 *  - both `# Time:` formats — old `yymmdd H:MM:SS` and ISO-8601
 *    (`2024-01-15T10:00:01.123456Z`, offset forms too);
 *  - `# User@Host: user[user] @ host [ip]  Id: N` (host falls back to the
 *    bracketed IP; `Id` becomes the `Thread_id` number metric);
 *  - generic `# Key: value` metric lines into three typed maps — values
 *    `Yes`/`No` → bool, integral → long, decimal → double; `Schema:` sets
 *    the event db; non-numeric strings (e.g. rate-limit annotations) are
 *    ignored;
 *  - `use db` session carry across events, `SET timestamp=N` override
 *    (wins over `# Time:`, second precision);
 *  - `# administrator command: X` → admin event;
 *  - multi-line statements (accumulated until the next header);
 *  - truncated tail at EOF (emitted if a statement was seen);
 *  - leading non-header banner junk (mysqld startup lines) skipped.
 *
 * Known line-level ambiguity, shared with any line-based slow-log parser:
 * a *line* inside a quoted SQL string that itself starts with `# ` is
 * indistinguishable from a header line.
 */
object SlowLogParser {

  private val OldTime =
    """^#\s+Time:\s+(\d{6})\s+(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d+))?\s*$""".r
  private val UserHost =
    """^#\s+User@Host:\s*([^\[\s]*)(?:\[([^\]]*)\])?\s*@\s*([^\s\[]*)\s*(?:\[([^\]]*)\])?(?:.*?\bId:\s*(\d+))?\s*$""".r
  // value must not itself be the next `Key:` token — an EMPTY value
  // (`# Schema:  Last_errno: 0`, the normal shape when no default db is
  // selected) must not swallow the following key as its value
  private val MetricPair = """(\w+):[ \t]*(?!\w+:)(\S+)""".r
  // Percona rate-limit annotation, combined shape: `# Rate_limit: query:100`
  // (type:limit in one token — the generic pair scanner would mis-read it
  // as a bogus `query: 100` number metric, so it is cut out first). The
  // two-key shape `Log_slow_rate_type: query  Log_slow_rate_limit: 100`
  // is dispatched by key in the generic scanner, like `Schema:`.
  private val RateCombined = """\bRate_limit:[ \t]*(\w+):(\d+)""".r
  private val SetTimestamp = """(?i)^\s*SET\s+timestamp\s*=\s*(\d+)\s*;?\s*$""".r
  private val UseDb = """(?i)^\s*use\s+`?([\w$]+)`?\s*;?\s*$""".r
  private val IntVal = """[+-]?\d+""".r
  private val FloatVal = """[+-]?\d*\.\d+(?:[eE][+-]?\d+)?""".r

  /** Parse a whole log text sequentially (reference semantics, incl. use-db
    * carry). Offsets are UTF-8 byte positions relative to `baseOffset`. */
  def parseString(text: String, baseOffset: Long = 0L): Vector[SlowLogEvent] =
    parseLines(linesWithOffsets(text, baseOffset)).toVector

  /** The session-carry state a log CHUNK hands to its successor: last
    * `use`/`# Schema:` db and last rate-limit annotation. This is what a
    * tailing reader keeps between reads of a rotated/growing log — the
    * streaming path persists it per logical stream in the state store
    * ([[graft.streaming.SlowLogStream.eventsWithSessionCarry]]). */
  final case class SessionCarry(db: String, rateType: String,
                                rateLimit: Long, headerSeen: Boolean)
  object SessionCarry {
    val empty: SessionCarry = SessionCarry(null, null, -1L, headerSeen = false)
  }

  /** [[parseString]] for one chunk of a LOGICAL stream: seeds the session
    * state from the previous chunk's hand-off and returns the state this
    * chunk ends with. Parsing chunk₁ then chunk₂ through this is
    * event-identical to parsing chunk₁ ++ chunk₂ in one pass (spec-proven)
    * — the property that makes cross-micro-batch `use db` carry exact. */
  def parseChunk(text: String,
                 initial: SessionCarry = SessionCarry.empty,
                 baseOffset: Long = 0L): (Vector[SlowLogEvent], SessionCarry) = {
    val it = new ParseIterator(linesWithOffsets(text, baseOffset), initial)
    val events = it.toVector
    (events, it.sessionCarry)
  }

  /** Lines of `text` paired with the UTF-8 byte offset of each line
    * start. Hand-rolled split handling \n, \r\n, and lone \r terminators
    * with true byte accounting (linesIterator + len+1 drifted one byte
    * per CRLF line, corrupting the resume offsets). */
  def linesWithOffsets(text: String, baseOffset: Long = 0L): Iterator[(Long, String)] =
    new Iterator[(Long, String)] {
      private var pos = 0
      private var off = baseOffset
      override def hasNext: Boolean = pos < text.length
      override def next(): (Long, String) = {
        val start = pos
        val startOff = off
        var i = pos
        while (i < text.length && text.charAt(i) != '\n' && text.charAt(i) != '\r')
          i += 1
        val line = text.substring(start, i)
        // consume the terminator: \r\n as one, else single \n or \r
        val termLen =
          if (i >= text.length) 0
          else if (text.charAt(i) == '\r' && i + 1 < text.length &&
                   text.charAt(i + 1) == '\n') 2
          else 1
        pos = i + termLen
        off = startOff + utf8Len(text, start, i) + termLen
        (startOff, line)
      }
    }

  /** UTF-8 byte length of text[from, until) without allocating. */
  private def utf8Len(s: String, from: Int, until: Int): Long = {
    var i = from
    var n = 0L
    while (i < until) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1
            else if (c < 0x800) 2
            else if (Character.isHighSurrogate(c)) { i += 1; 4 }
            else 3)
      i += 1
    }
    n
  }

  /**
   * Streaming parse of (byteOffset, line) pairs. The returned iterator is
   * lazy: events are emitted as soon as their terminating boundary (next
   * header or EOF) is seen — this is what runs inside `mapPartitions`.
   */
  def parseLines(lines: Iterator[(Long, String)]): Iterator[SlowLogEvent] =
    new ParseIterator(lines, SessionCarry.empty)

  private final class ParseIterator(lines: Iterator[(Long, String)],
                                    initial: SessionCarry)
      extends Iterator[SlowLogEvent] {
      private var out: SlowLogEvent = _

      // session state, seeded from the previous chunk's hand-off (empty
      // for a standalone parse)
      private var sessionDb: String = initial.db
      // rate-limit annotations carry forward like `use db`: Percona
      // writes them where sampling starts, and they govern every event
      // logged after (pt-query-digest applies the same log-level carry)
      private var sessionRateType: String = initial.rateType
      private var sessionRateLimit = initial.rateLimit
      // banner-skipping only applies to the head of the logical STREAM,
      // not of each chunk: the carry records whether an earlier chunk
      // already saw a header (so a chunk starting mid-statement keeps
      // its lines instead of treating them as banner junk)
      private var seenHeader = initial.headerSeen

      /** The state to seed the NEXT chunk with — read after exhaustion. */
      def sessionCarry: SessionCarry =
        SessionCarry(sessionDb, sessionRateType, sessionRateLimit, seenHeader)

      // current-event state
      private var evOffset = -1L
      private var ts: Timestamp = _
      private var admin = false
      private var user: String = _
      private var host: String = _
      private var db: String = _
      private var rateType: String = _
      private var rateLimit = -1L
      private val query = new StringBuilder
      private var timeM = mutable.LinkedHashMap.empty[String, Double]
      private var numM = mutable.LinkedHashMap.empty[String, Long]
      private var boolM = mutable.LinkedHashMap.empty[String, Boolean]
      private var inQuery = false

      private def resetEvent(keepTs: Boolean): Unit = {
        evOffset = -1L
        if (!keepTs) ts = null
        admin = false; user = null; host = null; db = null
        rateType = null; rateLimit = -1L
        query.clear()
        timeM = mutable.LinkedHashMap.empty
        numM = mutable.LinkedHashMap.empty
        boolM = mutable.LinkedHashMap.empty
        inQuery = false
      }

      private def flush(keepTs: Boolean): Unit = {
        if (query.nonEmpty || admin) {
          var q = query.result().trim
          if (q.endsWith(";")) q = q.substring(0, q.length - 1).trim
          val effDb = if (db != null) db else sessionDb
          // Any explicit db (use OR # Schema:) becomes the session carry:
          // this makes sequential carry identical to the distributed
          // last-non-null window fill, by construction.
          if (db != null) sessionDb = db
          // rate annotations: same explicit-becomes-carry rule
          if (rateType != null) sessionRateType = rateType
          if (rateLimit >= 0) sessionRateLimit = rateLimit
          val effRateType = if (rateType != null) rateType else sessionRateType
          val effRateLimit = if (rateLimit >= 0) rateLimit else sessionRateLimit
          out = SlowLogEvent(evOffset, ts, admin, q, user, host, effDb,
            effRateType, if (effRateLimit >= 0) Some(effRateLimit) else None,
            timeM.toMap, numM.toMap, boolM.toMap)
        }
        resetEvent(keepTs)
      }

      private def handleHeaderish(off: Long, line: String): Unit = {
        seenHeader = true
        if (evOffset < 0) evOffset = off
        val body = line.drop(1).trim // after '#'
        if (body.startsWith("administrator command:")) {
          admin = true
          var q = body
          if (q.endsWith(";")) q = q.substring(0, q.length - 1)
          query.clear(); query.append(q.trim)
          inQuery = true
        } else if (body.startsWith("Time:")) {
          line match {
            case OldTime(ymd, h, m, s, frac) =>
              val yy = ymd.substring(0, 2).toInt
              val year = if (yy < 70) 2000 + yy else 1900 + yy
              val ldt = LocalDateTime.of(year, ymd.substring(2, 4).toInt,
                ymd.substring(4, 6).toInt, h.toInt, m.toInt, s.toInt,
                if (frac == null) 0 else (frac.padTo(9, '0').take(9)).toInt)
              ts = Timestamp.from(ldt.toInstant(ZoneOffset.UTC))
            case _ =>
              val v = body.drop(5).trim
              ts = parseIsoTs(v).orNull
          }
        } else if (body.startsWith("User@Host:")) {
          line match {
            case UserHost(u1, u2, h1, h2, id) =>
              user = if (u1 != null && u1.nonEmpty) u1 else u2
              host = if (h1 != null && h1.nonEmpty) h1 else h2
              if (id != null)
                try numM("Thread_id") = id.toLong
                catch { case _: NumberFormatException => () }
            case _ => ()
          }
        } else {
          // generic metrics line (toLong/toDouble guarded: a corrupt or
          // adversarial log line must skip a metric, not kill the task).
          // Schema and the rate annotations are dispatched on the KEY,
          // before value-shape typing — a digits-only database name
          // (`Schema: 2024`, legal in MySQL) must set the db, not become
          // a number metric, and `Log_slow_rate_limit: 100` must become
          // the typed rate field, not an anonymous metric.
          // substring pre-check so the regex never runs on the ~all
          // metric lines that carry no rate annotation (hot parse path)
          val scanLine = if (!line.contains("Rate_lim")) line
          else RateCombined.findFirstMatchIn(line) match {
            case Some(m) => // `Rate_limit: query:100` — typed, then cut
              rateType = m.group(1)
              try rateLimit = m.group(2).toLong
              catch { case _: NumberFormatException => () }
              line.substring(0, m.start) + line.substring(m.end)
            case None => line
          }
          MetricPair.findAllMatchIn(scanLine).foreach { m =>
            val k = m.group(1); val v = m.group(2)
            if (k == "Schema") { if (v.nonEmpty) db = v }
            else if (k == "Log_slow_rate_type") { if (v.nonEmpty) rateType = v }
            else if (k == "Log_slow_rate_limit") {
              try rateLimit = v.toLong
              catch { case _: NumberFormatException => () }
            }
            else v match {
              case "Yes" => boolM(k) = true
              case "No" => boolM(k) = false
              case IntVal() =>
                try numM(k) = v.toLong catch { case _: NumberFormatException => () }
              case FloatVal() =>
                try timeM(k) = v.toDouble catch { case _: NumberFormatException => () }
              case _ => ()
            }
          }
        }
      }

      private def processLine(off: Long, rawLine: String): Unit = {
        val line = rawLine.stripLineEnd
        val isHeader = line.startsWith("#")
        if (isHeader) {
          val body = line.drop(1).trim
          val startsNew = body.startsWith("Time:") ||
            (inQuery && !body.isEmpty)
          if (startsNew && (query.nonEmpty || admin)) {
            val keepTs = !body.startsWith("Time:")
            flush(keepTs)
          } else if (body.startsWith("Time:") && !inQuery) {
            // Time header while still assembling headers: reset partial state
            // (two Time lines in a row = empty event, silently dropped).
            resetEvent(keepTs = false)
          }
          handleHeaderish(off, line)
        } else if (!seenHeader) {
          // mysqld startup banner / column captions before the first header
          ()
        } else {
          line match {
            case SetTimestamp(epoch) if !inQuery =>
              if (evOffset < 0) evOffset = off
              try ts = new Timestamp(epoch.toLong * 1000L)
              catch { case _: NumberFormatException => () }
            case UseDb(d) if !inQuery =>
              if (evOffset < 0) evOffset = off
              db = d; sessionDb = d
            case _ =>
              if (line.trim.nonEmpty || inQuery) {
                if (evOffset < 0) evOffset = off
                inQuery = true
                if (query.nonEmpty) query.append('\n')
                query.append(line)
              }
          }
        }
      }

      private def advance(): Unit = {
        while (out == null && lines.hasNext) {
          val (off, line) = lines.next()
          processLine(off, line)
        }
        if (out == null && !lines.hasNext && (query.nonEmpty || admin))
          flush(keepTs = false) // truncated tail at EOF
      }

      override def hasNext: Boolean = {
        if (out == null) advance()
        out != null
      }

      override def next(): SlowLogEvent = {
        if (!hasNext) throw new NoSuchElementException("end of log")
        val e = out; out = null; e
      }
    }

  /**
   * Carry-ONLY scan of a chunk: the [[SessionCarry]] that
   * [[parseChunk]] would return, at a fraction of its cost — no query
   * assembly, no timestamp parsing, no metric-map building, and the
   * metric regex runs only on lines that can possibly carry a
   * Schema/rate key (a `contains` pre-filter skips it on the hot
   * metric lines). This is the phase-1 pass of the distributed
   * session-carry resolution ([[SlowLogSource.readRaw]]): per input
   * split, the carry-out feeds the NEXT split's seed, which is what
   * lets the full parse run carry-resolved in one pass with no
   * full-width exchange.
   *
   * Equivalence with the real parser's carry transitions is
   * spec-enforced property-style (`scanCarry ≡ parseChunk._2` on the
   * golden fixtures AND the generated re-chunking corpus) — the state
   * machine below mirrors `processLine`/`flush` line-for-line on the
   * carry-relevant branches, including the subtle ones: `use` updates
   * the session IMMEDIATELY at its line, `# Schema:` only when its
   * event FLUSHES (an event with no query text never flushes and its
   * Schema never becomes carry), and rate annotations follow the
   * flush rule like Schema.
   */
  def scanCarry(text: String,
                initial: SessionCarry = SessionCarry.empty): SessionCarry = {
    var sessionDb = initial.db
    var sessionRateType = initial.rateType
    var sessionRateLimit = initial.rateLimit
    var seenHeader = initial.headerSeen
    // per-event carry-relevant state (the flush/reset twins)
    var admin = false
    var hasQuery = false
    var db: String = null
    var rateType: String = null
    var rateLimit = -1L
    var inQuery = false
    def resetEvent(): Unit = {
      admin = false; hasQuery = false; db = null
      rateType = null; rateLimit = -1L; inQuery = false
    }
    def flushCarry(): Unit = {
      if (hasQuery || admin) {
        if (db != null) sessionDb = db
        if (rateType != null) sessionRateType = rateType
        if (rateLimit >= 0) sessionRateLimit = rateLimit
      }
      resetEvent()
    }
    val lines = linesWithOffsets(text, 0L)
    while (lines.hasNext) {
      val line = lines.next()._2.stripLineEnd
      if (line.startsWith("#")) {
        val body = line.drop(1).trim
        val startsNew = body.startsWith("Time:") || (inQuery && body.nonEmpty)
        if (startsNew && (hasQuery || admin)) flushCarry()
        else if (body.startsWith("Time:") && !inQuery) resetEvent()
        seenHeader = true
        if (body.startsWith("administrator command:")) {
          admin = true; hasQuery = true; inQuery = true
        } else if (!body.startsWith("Time:") &&
                   !body.startsWith("User@Host:")) {
          // metric line — only the Schema/rate keys matter for carry;
          // skip the regex entirely when none can be present
          val scanLine = if (!line.contains("Rate_lim")) line
          else RateCombined.findFirstMatchIn(line) match {
            case Some(m) =>
              rateType = m.group(1)
              try rateLimit = m.group(2).toLong
              catch { case _: NumberFormatException => () }
              line.substring(0, m.start) + line.substring(m.end)
            case None => line
          }
          if (scanLine.contains("Schema") ||
              scanLine.contains("Log_slow_rate")) {
            MetricPair.findAllMatchIn(scanLine).foreach { m =>
              val k = m.group(1); val v = m.group(2)
              if (k == "Schema") { if (v.nonEmpty) db = v }
              else if (k == "Log_slow_rate_type") {
                if (v.nonEmpty) rateType = v
              } else if (k == "Log_slow_rate_limit") {
                try rateLimit = v.toLong
                catch { case _: NumberFormatException => () }
              }
            }
          }
        }
      } else if (seenHeader) {
        line match {
          case SetTimestamp(_) if !inQuery => ()
          case UseDb(d) if !inQuery => db = d; sessionDb = d
          case _ =>
            if (line.trim.nonEmpty || inQuery) { inQuery = true; hasQuery = true }
        }
      }
    }
    if (hasQuery || admin) flushCarry()
    SessionCarry(sessionDb, sessionRateType, sessionRateLimit, seenHeader)
  }

  private val IsoLocal = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  private def parseIsoTs(v: String): Option[Timestamp] = {
    def attempt[A](f: => A): Option[A] =
      try Some(f) catch { case _: Exception => None }
    attempt(Timestamp.from(Instant.parse(v)))
      .orElse(attempt(Timestamp.from(OffsetDateTime.parse(v).toInstant)))
      .orElse(attempt(Timestamp.from(
        LocalDateTime.parse(v, IsoLocal).toInstant(ZoneOffset.UTC))))
  }
}
