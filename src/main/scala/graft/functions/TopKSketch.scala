package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One reported heavy hitter: estimated count overstates the true count
  * by at most `err`. */
final case class TopItem(item: String, count: Long, err: Long)

/**
 * Space-Saving heavy-hitters sketch (Metwally et al., "Efficient
 * computation of frequent and top-k elements in data streams") as a
 * typed `Aggregator` — the analog of ClickHouse's `topK()` that the
 * QAN surface exposes, with bounded memory at any cardinality.
 *
 * At most `capacity` counters are kept; an untracked item evicts the
 * minimum counter and inherits its count as error. Guarantee: any item
 * with true frequency > n/capacity is present, and reported counts
 * overestimate by at most the reported `err`. `merge` sums counters
 * (absent = 0) and re-truncates to capacity — the standard mergeable
 * summary, so Spark's partial/final split works unchanged.
 */
final class TopKSketch(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[TopItem]] {
  require(capacity >= k, "capacity must be >= k")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(b: Map[String, (Long, Long)], item: String): Map[String, (Long, Long)] = {
    if (item == null) b
    else b.get(item) match {
      case Some((c, e)) => b.updated(item, (c + 1, e))
      case None if b.size < capacity => b.updated(item, (1L, 0L))
      case None =>
        val (minItem, (minC, _)) = b.minBy { case (i, (c, _)) => (c, i) }
        (b - minItem).updated(item, (minC + 1, minC))
    }
  }

  override def merge(a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    // Mergeable-summaries rule (Agarwal et al.): an item absent from a
    // FULL summary may have been evicted with count up to that summary's
    // minimum counter, so credit min as both count and error — treating
    // absence as 0 would let merged counts UNDERstate true frequencies.
    def minOf(m: Map[String, (Long, Long)]): Long =
      if (m.size < capacity) 0L else m.valuesIterator.map(_._1).min
    val (minA, minB) = (minOf(a), minOf(b))
    val combined = (a.keySet ++ b.keySet).iterator.map { i =>
      val (ca, ea) = a.getOrElse(i, (minA, minA))
      val (cb, eb) = b.getOrElse(i, (minB, minB))
      i -> (ca + cb, ea + eb)
    }.toMap
    if (combined.size <= capacity) combined
    else combined.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(capacity).toMap
  }

  override def finish(r: Map[String, (Long, Long)]): Seq[TopItem] =
    r.toSeq.sortBy { case (i, (c, _)) => (-c, i) }
      .take(k)
      .map { case (i, (c, e)) => TopItem(i, c, e) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopItem]] = ExpressionEncoder()
}

object TopKSketch {
  /** Sketch with the conventional capacity = 5×k headroom. */
  def apply(k: Int): TopKSketch = new TopKSketch(k, k * 5)
}
