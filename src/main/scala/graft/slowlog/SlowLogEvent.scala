package graft.slowlog

import java.sql.Timestamp

/**
 * One parsed slow-query-log event (SURVEY.md §1.1 item 2, FIXTURES.md §B).
 *
 * Mirrors the public shape of the MySQL/Percona slow-log record: identity
 * fields plus three typed metric maps. `offset` is the byte offset of the
 * event's first header line within its source file (the reference's
 * resume/idempotency handle). `db` is the effective database — explicit
 * (`use db` / `# Schema:`) or carried forward from the session's last
 * `use` (carry is applied by the sequential parser; the distributed reader
 * re-establishes it with a window fill, see [[SlowLogSource]]).
 */
final case class SlowLogEvent(
    offset: Long,
    ts: Timestamp,
    admin: Boolean,
    query: String,
    user: String,
    host: String,
    db: String,
    timeMetrics: Map[String, Double],
    numberMetrics: Map[String, Long],
    boolMetrics: Map[String, Boolean])
