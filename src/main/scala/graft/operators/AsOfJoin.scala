package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time ("as-of") join, which Spark lacks natively: for each left
 * row, the latest right row with `rightTs <= leftTs` on equal keys.
 *
 * Composed the scale-safe way: tag both sides, union, and take
 * `last(payload, ignoreNulls)` over a running window per key ordered by
 * (ts, side, tiebreak) — right rows at an equal timestamp sort before
 * left rows, giving `<=` semantics, and the caller's tiebreak column
 * makes equal-timestamp right rows deterministic. ONE shuffle on the
 * key, zero range cross products — versus a range-condition join that
 * Catalyst can only execute as a broadcast nested loop.
 */
object AsOfJoin {

  /**
   * @param left     rows to enrich
   * @param right    versioned rows to match from
   * @param keys     equi-join key column names (present on both sides)
   * @param leftTs   left event-time column (orderable)
   * @param rightTs  right event-time column (same type)
   * @param rightVal right payload column to attach
   * @param rightTie unique right column breaking equal-ts ties
   * @param as       name of the attached column on the output
   * @return left's columns plus `as` (null where no right row precedes)
   */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightVal: String,
           rightTie: String, as: String): DataFrame = {
    val keyCols = keys.map(col)
    val tieType = right.schema(rightTie).dataType

    // The matched payload rides inside a STRUCT: the struct itself is
    // null only on left placeholder rows, so a right row whose payload
    // column is genuinely NULL still counts as the latest match (a bare
    // last(_val, ignoreNulls) would skip it and attach a stale value).
    // SQL semantics for the predicate (r.key = l.key AND r.ts <= l.ts):
    // a right row with a NULL key or NULL ts can never match — drop them
    // up front (the window would otherwise group NULL keys together and
    // sort NULL ts first, fabricating matches). Left rows with NULL key
    // or ts need no special handling: their partition then holds no
    // right rows / the null-first sort puts them before every right row,
    // so they naturally get a null match.
    val matchableRight =
      keys.foldLeft(right.filter(col(rightTs).isNotNull))(
        (df, k) => df.filter(col(k).isNotNull))

    val l = left.select(
      keyCols :+
        col(leftTs).as("_ts") :+
        lit(1).as("_side") :+
        lit(null).cast(new org.apache.spark.sql.types.StructType()
          .add("v", right.schema(rightVal).dataType)).as("_m") :+
        lit(null).cast(tieType).as("_tie") :+
        struct(left.columns.map(col): _*).as("_row"): _*)
    val r = matchableRight.select(
      keyCols :+
        col(rightTs).as("_ts") :+
        lit(0).as("_side") :+
        struct(col(rightVal).as("v")).as("_m") :+
        col(rightTie).as("_tie") :+
        lit(null).cast(l.schema("_row").dataType).as("_row"): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_last", last(col("_m"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_row.$c").as(c)) :+
        col("_last.v").as(as): _*)
  }
}
