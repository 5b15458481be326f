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
 *
 * `rateType`/`rateLimit` are the Percona log-sampling annotations
 * (SURVEY.md §1.1 event table, `log_slow_rate_type`/`log_slow_rate_limit`):
 * when rate limiting is active only 1-in-`rateLimit` sessions/queries are
 * logged, so every logged event statistically represents `rateLimit`
 * executions — QAN aggregates must scale by it or under-count sampled
 * workloads by that factor ([[graft.operators.Qan.profile]]'s
 * `cnt_scaled`). Like `use db`, the annotation is written where sampling
 * starts and applies onward, so both readers carry it forward
 * (sequential session state here; window fill in [[SlowLogSource]]).
 * `rateType` is null and `rateLimit` None when the log carries no
 * annotation (absent ≠ `rateLimit=1`, which is an EXPLICIT sampling-off
 * marker that must reset a carried value — that distinction is what lets
 * the window fill re-establish carry without inventing state).
 */
final case class SlowLogEvent(
    offset: Long,
    ts: Timestamp,
    admin: Boolean,
    query: String,
    user: String,
    host: String,
    db: String,
    rateType: String,
    rateLimit: Option[Long],
    timeMetrics: Map[String, Double],
    numberMetrics: Map[String, Long],
    boolMetrics: Map[String, Boolean])
