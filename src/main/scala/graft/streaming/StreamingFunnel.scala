package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A newly reached funnel stage for one entity (1-based `stage_ord`,
  * reached at event time `reached_at` — same µs convention as the
  * batch [[graft.operators.Behavior.funnel]]). */
case class FunnelProgress(key: Long, stage_ord: Int, reached_at: Long)

/** Per-entity funnel state: the reach time of every stage passed so
  * far (strictly increasing; length = stages reached). */
case class FunnelSt(times: Seq[Long])

/**
 * Streaming ordered funnel — the online face of
 * [[graft.operators.Behavior.funnel]]: entities advance through the
 * stage sequence as events arrive, and every NEWLY reached stage emits
 * one [[FunnelProgress]] row (Append mode — a stage is reached at most
 * once per entity, so the output is exactly the conversion log a
 * dashboard tails).
 *
 * State per entity is one timestamp per reached stage — bounded by
 * |stages|, never the event history — in the checkpointed state store,
 * so conversions survive restarts (spec-proven).
 *
 * Ordering semantics (the streaming tradeoff, pinned by the spec):
 * within a micro-batch events are sorted by event time before the
 * state fold, so intra-batch disorder is immaterial; ACROSS batches
 * advancement is monotone — a late-arriving earlier event cannot
 * revise an already-recorded stage time (the batch operator, which
 * sees all data, is the reconciliation path — the same
 * stream-now/batch-backfill split as the latency-sketch pair).
 *
 * `maxGap` mirrors the batch conversion window: stage k counts only
 * within `maxGap` of the stage-(k−1) time.
 */
object StreamingFunnel {

  def progress(events: DataFrame, keyCol: String, tsCol: String,
               typeCol: String, stages: Seq[String],
               maxGap: Option[Long] = None): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val gap = maxGap
    events
      .select(col(keyCol).cast("long"), col(tsCol).cast("long"),
        col(typeCol).cast("string"))
      .as[(Long, Long, String)]
      .flatMap { case (k, t, ty) =>
        stageIdx.get(ty).map(si => (k, t, si)) // non-stage events drop early
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Int)],
         state: GroupState[FunnelSt]) =>
          var times = state.getOption.map(_.times.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[FunnelProgress]
          rows.toVector.sortBy(r => (r._2, r._3)).foreach { case (_, t, si) =>
            val withinGap = times.lastOption.forall(prev =>
              t > prev && gap.forall(g => t <= prev + g))
            if (si == times.length && (times.isEmpty || withinGap)) {
              times = times :+ t
              out += FunnelProgress(key, times.length, t)
            }
          }
          state.update(FunnelSt(times))
          out.result().iterator
      }
  }

  /**
   * Roll an at-rest conversion log (appended [[FunnelProgress]] rows)
   * up to [[graft.operators.Behavior.funnel]]'s exact output shape
   * `(stage_ord, stage, n_entities)` — the reconciliation surface the
   * stream/batch split documents: over an in-order log the streamed
   * log rolled up here EQUALS the batch operator's result
   * (spec-proven), and over a disordered log the batch operator is the
   * backfill that revises it. `n_entities` is a distinct count per
   * stage: a crash-replayed micro-batch may append duplicate progress
   * rows (the documented exactly-once caveat), and the distinct makes
   * the rollup immune to them. Every stage gets a row (zero when
   * nothing reached it), like the batch operator — the spine is the
   * |stages|-row literal array, broadcast by construction.
   */
  def funnelTable(progress: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spine = progress.sparkSession.range(1, stages.size + 1)
      .select(col("id").as("stage_ord"),
        element_at(array(stages.map(lit): _*), col("id").cast("int"))
          .as("stage"))
    val counts = progress
      .groupBy(col("stage_ord").cast("long").as("stage_ord"))
      .agg(count_distinct(col("key")).as("_n"))
    spine.join(counts, Seq("stage_ord"), "left")
      .select(col("stage_ord"), col("stage"),
        coalesce(col("_n"), lit(0L)).as("n_entities"))
      .orderBy("stage_ord")
  }
}
