package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for shuffle joins (SCALE.md §1): when a join key is
 * Zipfian (a handful of hot keys carry most rows), hash partitioning
 * sends every hot-key row to one task and the stage runs at the speed
 * of its worst straggler. Salting splits each hot key across `salts`
 * partitions: the big side gets a deterministic salt derived from a
 * row-unique column, the small side is replicated once per salt value,
 * and the join key becomes (key, salt).
 *
 * Trade-off: small-side rows are duplicated `salts`× (so this suits
 * dimension-sized right sides), in exchange for a `salts`× fan-out of
 * every hot key's rows. AQE's skew-join handles sort-merge skew
 * adaptively at runtime; explicit salting is the static tool for when
 * the skew is known and extreme, or the join is hash-based.
 *
 * The salt is `pmod(xxhash64(uniqueCol), salts)` — deterministic, so
 * results are reproducible and the q57 oracle (a plain join) matches.
 */
object Skew {

  /** A working-column name absent from every input frame: a fixed
    * "_salt" would be silently REPLACED by withColumn if an input
    * already carried that column, producing wrong joins/aggregates
    * instead of an error (round-3 advice). */
  private def freshSaltCol(frames: DataFrame*): String =
    Iterator.from(0).map(i => if (i == 0) "_salt" else s"_salt$i")
      .find(n => !frames.exists(_.columns.contains(n))).get

  /** Inner equi-join of a skewed big side with a small side on `key`,
    * with the shuffle key widened to (key, salt). Result set is
    * IDENTICAL to `big.join(small, key)` — only the partitioning
    * changes. `bigUnique` must be non-null per row (any id column). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigUnique: String, salts: Int): DataFrame = {
    // salts = 0 would make pmod NULL on every row and silently join to
    // nothing — fail loudly instead
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = freshSaltCol(big, small)
    val saltedBig = big.withColumn(saltCol,
      pmod(xxhash64(col(bigUnique)), lit(salts.toLong)))
    val saltedSmall = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, Seq(key, saltCol)).drop(saltCol)
  }

  /** Two-phase aggregation with a salted first phase: partials group on
    * (key, salt) — spreading a hot key over `salts` reducers — and the
    * final phase merges the partials per key. `sum`/`count` only (the
    * mergeable aggregates); equality with the direct aggregation is the
    * spec's contract. Spark's map-side partial aggregation already
    * covers most groupBy skew; this is for when the REDUCE side of one
    * key exceeds a single task (extreme cardinality-1-ish skew). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     uniqueCol: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltCol = freshSaltCol(df)
    df.withColumn(saltCol, pmod(xxhash64(col(uniqueCol)), lit(salts.toLong)))
      .groupBy(col(key), col(saltCol))
      .agg(sum(col(valueCol)).as("_ps"), count(lit(1)).as("_pc"))
      .groupBy(col(key))
      .agg(sum("_ps").as("sum"), sum("_pc").as("cnt"))
  }
}
