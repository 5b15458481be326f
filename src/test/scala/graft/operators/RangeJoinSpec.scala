package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned range-join contract: exactly the naive BETWEEN join's rows
  * (including multi-interval matches and SQL null semantics), with the
  * nested-loop plan provably replaced by an equi-join. */
class RangeJoinSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  // points 0..999 with a key; intervals of width 80 at stride 25, so
  // same-key intervals (75 apart) overlap by 5 and some points match
  // two intervals of ONE key — plus pathological rows: null point,
  // null bounds, inverted interval
  private lazy val points = spark.range(1000)
    .select(col("id").as("pid"),
      (col("id") % 3).as("k"),
      when(col("id") === 7, lit(null)).otherwise(col("id").cast("double"))
        .as("v"))

  private lazy val intervals = spark.range(40)
    .select(col("id").as("band"),
      (col("id") % 3).as("k"),
      when(col("id") === 5, lit(null)).otherwise((col("id") * 25.0))
        .as("lo"),
      when(col("id") === 6, lit(null)).otherwise((col("id") * 25.0 + 80.0))
        .as("hi"))
    // one inverted interval: must match nothing, not walk bins backward
    .union(Seq((99L, 0L, 500.0, 100.0)).toDF("band", "k", "lo", "hi"))

  private def naive =
    points.join(intervals, Seq("k"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "band")

  test("binned join returns exactly the naive BETWEEN join's pairs") {
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = RangeJoin.rangeJoin(points, intervals, Seq("k"),
        "v", "lo", "hi", binWidth = 25.0)
      .select("pid", "band")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // sanity: overlaps really occur (points in two bands of the same key)
    val multi = got.groupBy(_._1).count(_._2.size > 1)
    assert(multi > 0, "fixture lost its overlapping-interval coverage")
  }

  test("bin width does not change the answer, only the blow-up") {
    val a = RangeJoin.rangeJoin(points, intervals, Seq("k"),
        "v", "lo", "hi", binWidth = 7.0)
      .select("pid", "band").collect().map(_.toSeq).toSet
    val b = RangeJoin.rangeJoin(points, intervals, Seq("k"),
        "v", "lo", "hi", binWidth = 200.0)
      .select("pid", "band").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("keyless join distributes on the bin alone") {
    val expected = points.crossJoin(intervals.drop("k"))
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "band").collect().map(_.toSeq).toSet
    val got = RangeJoin.rangeJoin(points, intervals.drop("k"), Seq(),
        "v", "lo", "hi", binWidth = 25.0)
      .select("pid", "band").collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("the binned plan carries no nested loop or cartesian product") {
    for (keys <- Seq(Seq("k"), Seq.empty[String])) {
      val plan = RangeJoin.rangeJoin(points, intervals, keys,
          "v", "lo", "hi", binWidth = 25.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"binned range join (keys=$keys) fell back to a nested loop:\n$plan")
    }
    // while the naive KEYLESS range join IS the nested loop — the
    // cliff this operator exists to avoid (with an equi-key Catalyst
    // plans hash/SMJ on the key and keeps the range as a residual
    // condition, which still degenerates per hot key)
    val naiveKeyless = points.join(intervals.drop("k"),
        col("v") >= col("lo") && col("v") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(naiveKeyless.contains("BroadcastNestedLoopJoin") ||
      naiveKeyless.contains("CartesianProduct"))
  }

  // -- interval-overlap join -------------------------------------------

  // left intervals of width 40 at stride 11, right of width 17 at
  // stride 7 — lengths straddle several 25-wide bins, so most pairs
  // share >1 bin and the ownership-bin dedup is genuinely exercised
  private lazy val lIv = spark.range(100)
    .select(col("id").as("lid"), (col("id") % 3).as("k"),
      (col("id") * 11.0).as("llo"), (col("id") * 11.0 + 40.0).as("lhi"))
  private lazy val rIv = spark.range(150)
    .select(col("id").as("rid"), (col("id") % 3).as("k"),
      (col("id") * 7.0).as("rlo"), (col("id") * 7.0 + 17.0).as("rhi"))
    // inverted interval: must match nothing
    .union(Seq((999L, 0L, 300.0, 200.0)).toDF("rid", "k", "rlo", "rhi"))

  test("overlap join returns exactly the naive overlap pairs, once each") {
    val expected = lIv.join(rIv, Seq("k"))
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").collect().map(_.toSeq).toSet
    val rows = RangeJoin.overlapJoin(lIv, rIv, Seq("k"),
        "llo", "lhi", "rlo", "rhi", binWidth = 25.0)
      .select("lid", "rid").collect().map(_.toSeq)
    assert(rows.toSet == expected)
    // ownership-bin dedup: each pair appears EXACTLY once, no distinct
    assert(rows.length == rows.toSet.size,
      "a pair surfaced in more than one shared bin")
    // multi-bin pairs really occur (widths > binWidth)
    assert(expected.nonEmpty && rows.nonEmpty)
  }

  test("overlap join: bin width does not change the answer") {
    val a = RangeJoin.overlapJoin(lIv, rIv, Seq("k"),
        "llo", "lhi", "rlo", "rhi", binWidth = 5.0)
      .select("lid", "rid").collect().map(_.toSeq).toSet
    val b = RangeJoin.overlapJoin(lIv, rIv, Seq("k"),
        "llo", "lhi", "rlo", "rhi", binWidth = 400.0)
      .select("lid", "rid").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("overlap join plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.overlapJoin(lIv, rIv, Seq("k"),
        "llo", "lhi", "rlo", "rhi", binWidth = 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap join fell back to a nested loop:\n$plan")
  }
}
