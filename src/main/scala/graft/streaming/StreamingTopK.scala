package graft.streaming

import graft.functions.TopKSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One shard's current heavy-hitter row: `ver` is the shard's emission
  * version (increments per micro-batch that touched the shard), so an
  * at-rest log can reconstruct each shard's LATEST snapshot — an item
  * evicted between versions must not be resurrected from an old row. */
case class HitterUpdate(shard: Int, ver: Long, item: String,
                        count: Long, err: Long)

/** Per-shard state: the Space-Saving counter table (bounded by the
  * sketch capacity, never the item cardinality) + the emission
  * version. */
case class TopKShardState(counters: Map[String, (Long, Long)], ver: Long)

/**
 * Streaming heavy hitters — the online face of the batch
 * [[graft.functions.TopKSketch]] UDAF (q51/q133): items hash into
 * `shards` disjoint groups, each group folds the SAME Space-Saving
 * `reduce` the batch aggregator uses into checkpointed state, and each
 * micro-batch emits the shard's refreshed top-k (Update mode — the
 * dashboard keeps the latest row set per shard).
 *
 * Sharding makes the sketch distributed without merge error: an item
 * lives in exactly ONE shard, so per-shard guarantees (any item with
 * shard frequency > n_shard/capacity is tracked; counts overestimate
 * by ≤ err) carry to the union, and the global top-k is the top-k of
 * the per-shard snapshots — [[hittersTable]] is that rollup over the
 * appended update log.
 *
 * State per shard is ≤ capacity counters — memory is
 * shards × capacity regardless of cardinality or stream length, the
 * same bound the reference's in-ClickHouse `topK()` relies on.
 */
object StreamingTopK {

  /** Fold the stream into per-shard Space-Saving state and emit each
    * touched shard's current top-k every micro-batch. */
  def hitters(events: DataFrame, itemCol: String, k: Int, capacity: Int,
              shards: Int = 32): Dataset[HitterUpdate] = {
    require(shards > 0, "shards must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val sketch = new TopKSketch(k, capacity) // reduce/finish reused verbatim
    events
      .select(col(itemCol).cast("string")).as[String]
      .filter((i: String) => i != null)
      // String.hashCode is pinned by the JLS — shard routing is stable
      // across JVMs, restarts, and engine versions
      .groupByKey(item => math.floorMod(item.hashCode, shards))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, items: Iterator[String],
         state: org.apache.spark.sql.streaming.GroupState[TopKShardState]) =>
          val prev = state.getOption.getOrElse(TopKShardState(Map.empty, 0L))
          var m = prev.counters
          items.foreach(i => m = sketch.reduce(m, i))
          val ver = prev.ver + 1
          state.update(TopKShardState(m, ver))
          sketch.finish(m)
            .map(ti => HitterUpdate(shard, ver, ti.item, ti.count, ti.err))
            .iterator
      }
  }

  /** Roll an at-rest update log (appended [[HitterUpdate]] rows) up to
    * the CURRENT global top-k: each shard contributes only its latest
    * version (older snapshots may contain since-evicted items — taking
    * "latest per item" would resurrect them), then rank on
    * (count desc, item) — the batch sketch's own selection rule. */
  def hittersTable(updates: DataFrame, k: Int): DataFrame = {
    val latest = updates
      .groupBy(col("shard").as("_shard")).agg(max("ver").as("_maxver"))
    updates.join(latest,
        col("shard") === col("_shard") && col("ver") === col("_maxver"))
      .select(col("item"), col("count"), col("err"))
      .orderBy(col("count").desc, col("item"))
      .limit(k)
  }
}
