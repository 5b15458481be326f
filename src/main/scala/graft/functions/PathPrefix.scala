package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One event in a navigation path: order key (ts, id), payload `ty`. */
final case class PathEvent(ts: Long, id: Long, ty: String)

/**
 * Bounded first-`depth` aggregate for [[graft.operators.Behavior
 * .topPaths]] (the r12 q116 rewrite): keeps the `depth` smallest
 * events by `(ts, id)` per group and emits their types joined with
 * `>` — the path string directly.
 *
 * Why an Aggregator instead of the window formulation it replaced:
 * `row_number` + filter sorts the ENTIRE event stream inside the
 * entity-key exchange (the n·log n + spill stage behind q116's 1.30
 * scaling exponent, BENCH_SCALED.json) to keep `depth` rows per
 * entity. This buffer is a mergeable summary — ≤ `depth` events at
 * every partial, so the map side combines BEFORE the exchange and
 * only `depth` rows per (task, entity) ever cross the wire; no stage
 * sorts anything larger than a `depth`-element insert.
 *
 * Buffers stay sorted by `(ts, id)`; `merge` is a two-sorted-list
 * merge truncated at `depth`. Deterministic for distinct `(ts, id)`
 * keys (the callers' event ids are unique).
 */
final class PathPrefix(depth: Int)
    extends Aggregator[PathEvent, Seq[PathEvent], String] {
  require(depth >= 1, "depth must be >= 1")

  override def zero: Seq[PathEvent] = Vector.empty

  private def before(a: PathEvent, b: PathEvent): Boolean =
    a.ts < b.ts || (a.ts == b.ts && a.id < b.id)

  override def reduce(b: Seq[PathEvent], e: PathEvent): Seq[PathEvent] = {
    if (b.length >= depth && !before(e, b.last)) b
    else {
      val i = b.indexWhere(x => before(e, x))
      val ins =
        if (i < 0) b :+ e
        else (b.take(i) :+ e) ++ b.drop(i)
      if (ins.length > depth) ins.take(depth) else ins
    }
  }

  override def merge(a: Seq[PathEvent], b: Seq[PathEvent]): Seq[PathEvent] = {
    val out = Vector.newBuilder[PathEvent]
    var (i, j, n) = (0, 0, 0)
    while (n < depth && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && before(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[PathEvent]): String = r.map(_.ty).mkString(">")

  override def bufferEncoder: Encoder[Seq[PathEvent]] = ExpressionEncoder()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
