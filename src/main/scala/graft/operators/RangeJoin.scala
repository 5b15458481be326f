package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval-containment ("range") join, the sibling of [[AsOfJoin]]: for
 * each left POINT row, every right INTERVAL row with
 * `lo <= point <= hi` on equal keys — which Catalyst, given the raw
 * range predicate, can only execute as a broadcast nested loop (or a
 * full cartesian when the build side outgrows broadcast): O(points ×
 * intervals) per key, the classic 100 TB cliff.
 *
 * Binned rewrite: pick a `binWidth`, explode each interval into the
 * integer bins it overlaps (`sequence(floor(lo/w), floor(hi/w))` — one
 * row per covered bin), map each point to its single bin, and
 * equi-join on `(keys, bin)` with an exact containment post-filter. A
 * point lies in exactly ONE bin and an interval appears at most once
 * per bin, so the join is exact with no duplicate pairs and no
 * distinct pass. Cost: shuffle both sides on `(keys, bin)` —
 * hash/sort-merge, AQE-skew-splittable — plus an interval blow-up of
 * `len/w + 1` rows; size `w` to the TYPICAL interval length so the
 * blow-up is a small constant. Degenerate long intervals fatten hot
 * bins — the salting/cap patterns from the dedup operators apply
 * unchanged on top of the binned frame.
 *
 * Null semantics match SQL `BETWEEN` inside a join: a NULL point, lo,
 * hi, or key never matches (nulls drop at the bin computation or the
 * equi-join). Inverted intervals (`lo > hi`) match nothing and are
 * dropped up front — Spark's `sequence` would otherwise step BACKWARD
 * through the bins and fabricate matches for the reversed range.
 */
object RangeJoin {

  /**
   * @param points    left rows, each carrying a point value
   * @param intervals right rows, each carrying an [lo, hi] interval
   * @param keys      equi-key column names on both sides (may be empty;
   *                  then the join distributes on the bin alone)
   * @param pointCol  numeric point column on `points`
   * @param loCol     inclusive lower bound column on `intervals`
   * @param hiCol     inclusive upper bound column on `intervals`
   * @param binWidth  bin size in value units — tune to the typical
   *                  interval length (blow-up = len/binWidth + 1)
   * @return points' columns plus intervals' non-key columns, one output
   *         row per matching (point, interval) pair
   */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointCol: String, loCol: String, hiCol: String,
                binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binned = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    points
      .withColumn("_bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, keys :+ "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /**
   * Interval-OVERLAP join — [[rangeJoin]] generalized to intervals on
   * BOTH sides: one output row per (left, right) pair on equal keys with
   * `lLo <= rHi AND rLo <= lHi` (closed-interval overlap). The naive
   * predicate is again a nested loop per key; here both sides explode
   * into the integer bins they cover and equi-join on `(keys, bin)`.
   *
   * A pair overlapping k shared bins would surface k times; instead of a
   * distinct pass (a second shuffle carrying the whole output), each
   * pair is counted exactly once at its OWNERSHIP bin — the first bin
   * both intervals cover, `max(floor(lLo/w), floor(rLo/w))`: overlap
   * means `max(lLo,rLo) <= min(lHi,rHi)`, so that bin is inside both
   * ranges, and `floor` is monotone so greatest-of-floors is
   * floor-of-greatest. The post-filter is a per-row predicate — the
   * only shuffle in the plan is the one equi-join exchange.
   *
   * Same skew calculus as [[rangeJoin]]: blow-up = len/binWidth + 1 per
   * interval; degenerate long intervals fatten their bins and the dedup
   * hot-key cap / salting patterns apply on the binned frames.
   */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lLoCol: String, lHiCol: String,
                  rLoCol: String, rHiCol: String,
                  binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(lo) <= col(hi))
      .withColumn("_bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(left, lLoCol, lHiCol)
      .join(binned(right, rLoCol, rHiCol), keys :+ "_bin")
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .filter(col("_bin") === greatest(
        floor(col(lLoCol) / binWidth).cast("long"),
        floor(col(rLoCol) / binWidth).cast("long")))
      .drop("_bin")
  }
}
