package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The QAN (Query Analytics) report surface — the queries the reference's
 * users actually run against the ClickHouse `queries` table (SURVEY.md
 * §2.1 closing note / §3.3), expressed natively over the wide table
 * produced by [[graft.slowlog.SlowLogTable.flatten]].
 *
 * At 100 TB these group on `digest` over a date-partitioned,
 * digest-bucketed table (SCALE.md §2): partition pruning handles the time
 * range, bucketing removes the exchange under the aggregate.
 */
object Qan {

  /**
   * Per-digest profile, the canonical "top queries" report: call count,
   * total/avg/p95 latency, rows scanned/returned, user spread, first/last
   * seen, one representative fingerprint. Ordered by SCALED total time,
   * worst first — for a rate-limited log, pt-query-digest ranks by the
   * sampling-corrected load, so a heavily-sampled heavy hitter outranks an
   * unsampled lighter query. On an unsampled log `total_time_scaled ==
   * total_time` and the ordering degenerates to the raw one.
   */
  /** `p95Accuracy` is `percentile_approx`'s rank-error budget (error ≤
    * group_size / accuracy ranks): the default suits production group
    * sizes; the oracle entry raises it past the test group sizes so the
    * sketch degenerates to the exact percentile both engines agree on. */
  def profile(wide: DataFrame, topN: Int = 100,
              p95Accuracy: Int = 10000): DataFrame =
    wide.groupBy("digest")
      .agg(
        min("fingerprint").as("fingerprint"),
        count(lit(1)).as("cnt"),
        // Percona-sampled logs keep 1-in-rate_limit events, so each
        // logged row represents rate_limit executions: the scaled count
        // is the workload's TRUE call volume (pt-query-digest applies
        // the same multiplier — to every additive aggregate, hence the
        // scaled load total below too). rate_limit ≤ 1 (unsampled /
        // sampling off) contributes exactly 1.
        sum(greatest(col("rate_limit"), lit(1L))).as("cnt_scaled"),
        sum("query_time").as("total_time"),
        sum(col("query_time") * greatest(col("rate_limit"), lit(1L)))
          .as("total_time_scaled"),
        avg("query_time").as("avg_time"),
        // pt-query-digest's V/M column (variance-to-mean ratio, the
        // index of dispersion): ~0 for a consistent query, large when
        // the same digest swings between fast and slow executions — the
        // classic "sometimes hits the bad plan / cold cache" signal.
        // Population variance over the logged sample, like pt's sumsq
        // formulation; single-call digests report 0, not null.
        stddev_pop("query_time").as("stddev_time"),
        (var_pop("query_time") / avg("query_time")).as("vm_ratio"),
        percentile_approx(col("query_time"), lit(0.95), lit(p95Accuracy)).as("p95_time"),
        sum("rows_examined").as("rows_examined"),
        sum("rows_sent").as("rows_sent"),
        countDistinct(col("user")).as("n_users"),
        min("ts").as("first_seen"),
        max("ts").as("last_seen"),
        // pt-query-digest's worst-case EXAMPLE: the raw text (and time)
        // of the slowest execution of this digest — what a DBA pastes
        // into EXPLAIN. Deterministic tiebreak through (ts, offset) so
        // equal-latency calls can't flap the report between runs.
        max_by(col("query"),
          struct(col("query_time"), col("ts"), col("offset"))).as("example_query"),
        max_by(col("ts"),
          struct(col("query_time"), col("ts"), col("offset"))).as("example_ts"))
      .orderBy(col("total_time_scaled").desc, col("digest"))
      .limit(topN)

  /**
   * Time-bucketed per-digest sparkline (the QAN chart series). Carries both
   * raw and rate-limit-scaled series so a sampled window charts its true
   * load, same multiplier contract as [[profile]].
   */
  def sparkline(wide: DataFrame, bucket: String = "hour"): DataFrame =
    wide.groupBy(date_trunc(bucket, col("ts")).as("bucket"), col("digest"))
      .agg(count(lit(1)).as("cnt"),
        sum(greatest(col("rate_limit"), lit(1L))).as("cnt_scaled"),
        sum("query_time").as("total_time"),
        sum(col("query_time") * greatest(col("rate_limit"), lit(1L)))
          .as("total_time_scaled"))
      .orderBy("bucket", "digest")

  /** [[sparkline]] (hour grain) WITHOUT the event rescan — rebuilt from
    * the digest-grain core partials ([[digestPartials]]: integer-µs
    * sums per (digest, hr)). Time columns round once at the
    * presentation edge (the q201/q105 sum-magnitude rule — the stored
    * integers are exact, a raw double re-sum is not), so readers
    * compare this against an event-level sparkline rounded the same
    * way. Hour is the partials' native grain; coarser buckets
    * re-aggregate the calendar-sized frame, never events. */
  def sparklineFromPartials(core: DataFrame): DataFrame =
    core.groupBy("digest", "hr")
      .agg(sum("cnt").as("cnt"), sum("sum_rate").as("cnt_scaled"),
        sum("sum_time_us").as("_tus"), sum("sum_load_us").as("_lus"))
      .select(timestamp_micros(col("hr") * 3600000000L).as("bucket"),
        col("digest"), col("cnt"), col("cnt_scaled"),
        round(col("_tus") / 1e6, 4).as("total_time"),
        round(col("_lus") / 1e6, 4).as("total_time_scaled"))
      .orderBy("bucket", "digest")

  /**
   * Two-window trend comparison — pt-query-digest's `--history` question
   * ("which queries got worse?") as one operator: per key, load and call
   * count on each side of `split`, the absolute load delta, and the
   * after/before ratio (null when the key is new — absent before the
   * split). Ranked by delta, worst regression first.
   *
   * Deliberately a SINGLE aggregation over conditional sums rather than
   * two windowed aggregates joined: one shuffle on the key, map-side
   * partials, no join — the two-CTE + full-outer-join formulation a SQL
   * user would write costs two scans and an extra exchange at any scale.
   * `loadCol`/`split` are caller-supplied expressions so the rate-scaled
   * load (`query_time * greatest(rate_limit, 1)`) and any split rule
   * (constant timestamp, broadcast midpoint column) plug in unchanged.
   */
  def compareWindows(df: DataFrame, keyCol: String, tsCol: String,
                     loadCol: org.apache.spark.sql.Column,
                     split: org.apache.spark.sql.Column): DataFrame = {
    val before = col(tsCol) < split
    df.groupBy(keyCol)
      .agg(
        coalesce(sum(when(before, loadCol)), lit(0.0)).as("load_before"),
        coalesce(sum(when(!before, loadCol)), lit(0.0)).as("load_after"),
        count(when(before, lit(1))).as("cnt_before"),
        count(when(!before, lit(1))).as("cnt_after"))
      .withColumn("load_delta", col("load_after") - col("load_before"))
      .withColumn("load_ratio",
        col("load_after") / when(col("load_before") =!= 0.0, col("load_before")))
      .orderBy(col("load_delta").desc, col(keyCol))
  }

  /**
   * Apdex per key — the classic latency-SLO rollup over a query-class
   * report: `(satisfied + tolerating/2) / total`, where a call is
   * satisfied at latency ≤ `t` and tolerating at `t < latency ≤ 4t`
   * (the standard Apdex tolerating window). Worst-scoring keys first,
   * which is the page a responder actually reads.
   *
   * One hash aggregation — the three class counts are conditional
   * counts inside the same `groupBy`, so the scan and shuffle are paid
   * once no matter how many thresholds a caller adds. `latencyCol` is a
   * caller expression so the rate-scaled or raw latency plugs in
   * unchanged (same contract as [[compareWindows]]'s `loadCol`).
   */
  def apdex(df: DataFrame, keyCol: String,
            latencyCol: org.apache.spark.sql.Column, t: Double): DataFrame =
    df.groupBy(keyCol)
      .agg(
        count(lit(1)).as("cnt"),
        count(when(latencyCol <= t, lit(1))).as("satisfied"),
        count(when(latencyCol > t && latencyCol <= 4 * t, lit(1)))
          .as("tolerating"))
      .withColumn("apdex",
        round((col("satisfied") + col("tolerating") / lit(2.0)) / col("cnt"), 4))
      .orderBy(col("apdex").asc, col(keyCol))

  /** [[apdex]] WITHOUT the event rescan — the satisfaction index from
    * the digest-grain core partials' n_sat/n_tol counters. The
    * threshold is the one the partials were BUILT with
    * ([[digestPartials]]'s apdexT) — a different t needs the event
    * scan, which is why the counters persist at all. Exact integers +
    * the same single division → bit-identical to the event-level run
    * at the stored t. */
  def apdexFromPartials(core: DataFrame): DataFrame =
    core.groupBy("digest")
      .agg(sum("cnt").as("cnt"), sum("n_sat").as("satisfied"),
        sum("n_tol").as("tolerating"))
      .withColumn("apdex",
        round((col("satisfied") + col("tolerating") / lit(2.0)) / col("cnt"), 4))
      .orderBy(col("apdex").asc, col("digest"))

  /**
   * Series densification — fill the missing buckets of an aggregated
   * time series with zeros over the series' own [min, max] bucket
   * range: sparklines and rate charts read wrong when silence is
   * absent instead of zero. The spine is |keys| × |buckets| rows built
   * from a one-row broadcast bounds frame + a `sequence` explode — no
   * driver-side range materialization — and the original series joins
   * back by (key, bucket). Calendar-bounded output; the fact table is
   * scanned only by the aggregation that produced `series`.
   */
  def densify(series: DataFrame, keyCol: String, bucketCol: String,
              cntCol: String): DataFrame = {
    val bounds = series.agg(min(col(bucketCol)).as("_lo"),
      max(col(bucketCol)).as("_hi"))
    val spine = series.select(keyCol).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"))).as(bucketCol))
    spine.join(series, Seq(keyCol, bucketCol), "left")
      .withColumn(cntCol, coalesce(col(cntCol), lit(0L)))
      .orderBy(keyCol, bucketCol)
  }

  /**
   * A/B comparison with a Welch t statistic per key — the experiment
   * readout over hash-assigned arms ([[Pipeline.hashBucket16]] gives
   * deterministic, engine-reproducible assignment): per key, both
   * arms' n/mean/sample-variance as CONDITIONAL aggregates of one
   * `groupBy` (one scan, one shuffle — the [[compareWindows]] shape),
   * then `t = (m_a − m_b) / √(v_a/n_a + v_b/n_b)`. Rounding happens
   * once, at the output — intermediate moments stay full-precision.
   */
  def abWelch(df: DataFrame, keyCol: String, armACol: Column,
              valueCol: Column): DataFrame =
    df.groupBy(keyCol)
      .agg(
        count(when(armACol, lit(1))).as("n_a"),
        count(when(!armACol, lit(1))).as("n_b"),
        avg(when(armACol, valueCol)).as("_m_a"),
        avg(when(!armACol, valueCol)).as("_m_b"),
        var_samp(when(armACol, valueCol)).as("_v_a"),
        var_samp(when(!armACol, valueCol)).as("_v_b"))
      .select(col(keyCol), col("n_a"), col("n_b"),
        round(col("_m_a"), 4).as("mean_a"),
        round(col("_m_b"), 4).as("mean_b"),
        round((col("_m_a") - col("_m_b")) /
          sqrt(col("_v_a") / col("n_a") + col("_v_b") / col("n_b")), 4)
          .as("t_stat"))
      .orderBy(keyCol)

  /**
   * Pareto load concentration — "which query classes make up the first
   * `threshold` of total load?": classes ranked by load, cumulative
   * share computed over that (deterministic) order, rows kept while
   * the PREVIOUS row's rounded share is still under the threshold —
   * i.e. the row that CROSSES the threshold is included, so the head
   * returned always covers at least `threshold` of total load (and is
   * never empty when the top class alone exceeds it). The capacity-planning
   * readout next to [[profile]]: the head you optimize, the tail you
   * rate-limit. Per-class loads round BEFORE the running sum so both
   * engines accumulate identical values in the identical (load desc,
   * key) order; the rank window runs over the class-aggregated frame —
   * vocabulary-sized at any data scale, the same contract as
   * [[profile]]'s top-N.
   */
  def paretoLoad(df: DataFrame, keyCol: String, loadCol: Column,
                 threshold: Double): DataFrame = {
    val agg = df.groupBy(keyCol).agg(round(sum(loadCol), 4).as("load"))
    val w = Window.orderBy(col("load").desc, col(keyCol))
    agg
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("_cum", sum("load").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(agg.agg(sum("load").as("_tot"))))
      .withColumn("cum_share", round(col("_cum") / col("_tot"), 4))
      .withColumn("_prev_share",
        lag(col("cum_share"), 1).over(Window.orderBy(col("rn"))))
      .filter(col("_prev_share").isNull || col("_prev_share") < threshold)
      .select(col(keyCol), col("rn"), col("load"), col("cum_share"))
      .orderBy("rn")
  }

  /**
   * Gini concentration — [[paretoLoad]]'s scalar companion: per group,
   * the inequality coefficient of load across its classes
   * (`G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n` over ascending-sorted loads;
   * 0 = uniform, →1 = one class carries everything). The one number a
   * dashboard trends to see load concentrating before the Pareto head
   * visibly shifts. Class loads round before ranking (the q134
   * determinism rule); one rank window per group over the
   * class-aggregated frame, then a group rollup.
   */
  def giniConcentration(df: DataFrame, groupCol: String, keyCol: String,
                        loadCol: Column): DataFrame = {
    val loads = df.groupBy(col(groupCol), col(keyCol))
      .agg(round(sum(loadCol), 4).as("_l"))
    val w = Window.partitionBy(groupCol).orderBy(col("_l"), col(keyCol))
    loads.withColumn("_rn", row_number().over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_classes"),
        sum(col("_l")).as("_tot"),
        sum(col("_l") * col("_rn")).as("_ws"))
      .select(col(groupCol), col("n_classes"),
        round(lit(2.0) * col("_ws") / (col("n_classes") * col("_tot")) -
          (col("n_classes") + lit(1.0)) / col("n_classes"), 4).as("gini"))
      .orderBy(groupCol)
  }

  /**
   * Chi-square contingency cells — the independence test between two
   * categorical dimensions (is latency class independent of schema?
   * does event mix differ by user ring?): per (a, b) cell the observed
   * count, the independence-expected count `rowTot·colTot/n`, and the
   * cell's χ² contribution `(o−e)²/e`; `Σ contrib` against the
   * χ²((|a|−1)(|b|−1)) table is the test. One observed aggregation
   * plus two margin aggregates DERIVED from it (category-sized, never
   * rescanning the input) and a broadcast one-row total; every number
   * is arithmetic on exact counts, rounded once at the output.
   */
  def chiSquareCells(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val obs = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
    val rowTot = obs.groupBy("a").agg(sum("o").as("_ra"))
    val colTot = obs.groupBy("b").agg(sum("o").as("_cb"))
    val n = obs.agg(sum("o").as("_n"))
    val e = col("_ra").cast("double") * col("_cb") / col("_n")
    obs.join(rowTot, "a").join(colTot, "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("o"),
        round(e, 4).as("expected"),
        round(pow(col("o") - e, 2) / e, 4).as("contrib"))
      .orderBy("a", "b")
  }

  /**
   * New-query detection — the review-table question ("which query
   * classes appeared for the first time in this window?"): per key,
   * first/last seen and call count, flagged `is_new` when the key has
   * NO occurrence before `cutoff`. New keys first, newest first.
   *
   * `first_seen >= cutoff ⟺ zero occurrences before cutoff`, so the
   * flag is a conditional count inside the one aggregation rather than
   * a comparison against the aggregate — which lets `cutoff` be any
   * row-level expression (constant, broadcast midpoint column) without
   * a second pass.
   */
  def firstSeen(df: DataFrame, keyCol: String, tsCol: org.apache.spark.sql.Column,
                cutoff: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(keyCol)
      .agg(
        min(tsCol).as("first_seen"),
        max(tsCol).as("last_seen"),
        count(lit(1)).as("cnt"),
        (count(when(tsCol < cutoff, lit(1))) === 0).as("is_new"))
      .orderBy(col("is_new").desc, col("first_seen").desc, col(keyCol))

  /** Load breakdown by database and user (QAN filters sidebar). */
  /**
   * Per-(digest, day) latency sketch — the AT-REST shape of the profile's
   * percentile columns (round 9). [[profile]]'s `p95_time` rescans rows
   * for the window it reports; at 100 TB the dashboard wants "p95 per
   * digest over ANY date range" without touching the fact table again.
   * This persists the [[Pipeline.hdrSketch]] frame at microsecond
   * granularity (`query_time` seconds × 1e6 — sub-µs latency differences
   * are below the log's own resolution), partitioned by day: a new day
   * APPENDS its sketch rows without rewriting history, and
   * [[latencyPercentilesFrom]] merges whatever day slice the report asks
   * for. Kilobytes per digest-day, exact-mergeable counts (the q91
   * contract: ≤12.5% one-sided bucket error, spec-bounded).
   */
  def latencySketch(wide: DataFrame): DataFrame =
    Pipeline.hdrSketch(
      wide.withColumn("day", to_date(col("ts")).cast("string"))
        .withColumn("qt_us", col("query_time") * 1e4), // ×1e6 µs / ×100 sketch scaling
      "qt_us", Seq("digest", "day"))

  /** p50/p95/p99 (seconds) per digest from a (slice of a) stored
    * [[latencySketch]] frame: merge counts, walk buckets — never the
    * fact table. Filter the sketch on `day` first for ranged reports. */
  def latencyPercentilesFrom(sketch: DataFrame): DataFrame =
    Pipeline.hdrQuantiles(Pipeline.hdrMerge(sketch, Seq("digest")),
        Seq("digest"), Seq(50, 95, 99))
      .select(col("digest"), col("n_rows"),
        (col("p50") / 1e4).as("p50_time"),
        (col("p95") / 1e4).as("p95_time"),
        (col("p99") / 1e4).as("p99_time"))

  def loadByDbUser(wide: DataFrame): DataFrame =
    wide.rollup("db", "user")
      .agg(count(lit(1)).as("cnt"),
        sum(greatest(col("rate_limit"), lit(1L))).as("cnt_scaled"),
        sum("query_time").as("total_time"),
        sum(col("query_time") * greatest(col("rate_limit"), lit(1L)))
          .as("total_time_scaled"))
      .orderBy(col("db").asc_nulls_first, col("user").asc_nulls_first)

  /**
   * Robust per-digest latency anomaly detection — the QAN alerting
   * question ("which hours was this query abnormally slow?") answered
   * with the median/MAD rule: an hour is anomalous when its load
   * deviates from the digest's median hourly load by more than
   * `k × MAD` (median absolute deviation). Median/MAD, not mean/stddev,
   * because slow-log load is exactly the heavy-tailed signal that drags
   * a mean toward its own outliers — the classic robust-statistics fix.
   *
   * Cross-engine determinism: the hourly load is rounded BEFORE the
   * medians (so both engines feed identical doubles into the identical
   * linear-interpolation percentile — SURVEY §2.3 rule 6), and the flag
   * compares against the ROUNDED median/MAD, making the boundary
   * arithmetic bit-identical in any IEEE engine.
   *
   * Scale shape: one (digest, hour) aggregation over the fact table,
   * then two digest-keyed exact medians over the ALREADY-aggregated
   * hourly frame — |digests| × |hours| rows, kilobytes per digest
   * regardless of fact-table size — and two joins on the low-cardinality
   * digest key (AQE broadcasts them). The fact table is scanned once.
   */
  def latencyAnomaly(wide: DataFrame, k: Double = 3.0): DataFrame =
    anomalyFromHourly(wide
      .groupBy(col("digest"), date_trunc("hour", col("ts")).as("hr"))
      .agg(round(sum("query_time"), 4).as("load")), k)

  /** [[latencyAnomaly]] WITHOUT the event rescan — hourly loads rebuilt
    * from stored digest-grain partials ([[digestPartials]] core layout:
    * integer-µs `sum_time_us` per (digest, hr)), merged on read, then
    * the same median ± k·MAD rule. The hour index converts back to the
    * timestamp [[latencyAnomaly]] emits, so the two paths produce the
    * same frame (spec-pinned in ReportSpec). */
  def latencyAnomalyFromPartials(core: DataFrame, k: Double = 3.0)
      : DataFrame =
    anomalyFromHourly(core
      .groupBy("digest", "hr")
      .agg(round(sum("sum_time_us") / 1e6, 4).as("load"))
      .withColumn("hr", timestamp_micros(col("hr") * 3600000000L)), k)

  /** The shared median ± k·MAD tail over an hourly `(digest, hr, load)`
    * frame — both load computations round to 4 dp BEFORE the robust
    * statistics, so the event-level and partials-fed paths see
    * identical inputs. */
  private def anomalyFromHourly(hourly: DataFrame, k: Double): DataFrame = {
    val med = hourly.groupBy("digest")
      .agg(round(percentile(col("load"), lit(0.5)), 4).as("med"))
    val mad = hourly.join(med, Seq("digest"))
      .groupBy("digest")
      .agg(round(percentile(abs(col("load") - col("med")), lit(0.5)), 4)
        .as("mad"))
    hourly.join(med, Seq("digest")).join(mad, Seq("digest"))
      .select(col("digest"), col("hr"), col("load"), col("med"), col("mad"),
        (abs(col("load") - col("med")) > lit(k) * col("mad"))
          .as("is_anomaly"))
  }

  /**
   * Population Stability Index between a reference and a current slice
   * of a metric, per group — the standard "did this week's latency /
   * value distribution drift from last week's" monitor (PSI < 0.1
   * stable, 0.1–0.25 moderate, > 0.25 major shift). Values land in
   * fixed-width bins (`floor(value/binWidth)` — data-independent edges,
   * so two engines and two time windows bin identically); both slices'
   * bin masses get add-one smoothing over the group's OBSERVED bin set
   * (p = (c+1)/(n+B)), which keeps every log finite without dropping
   * empty-on-one-side bins — exactly the bins where drift lives.
   * `PSI = Σ (p−q)·ln(p/q)`. Returns `(groupCol, n_ref, n_cur, psi)`,
   * psi rounded after the sum (rule 2; ≤ a few dozen bins per group, so
   * accumulation order cannot reach the 4th decimal).
   *
   * Scale shape: one (group, bin) hash aggregate with map-side combine
   * over the scan, one tiny per-group rollup, one broadcast-sized join
   * back — bin cardinality is bounded by construction, so every frame
   * after the first aggregate is group-space-sized, never event-sized.
   */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
               isRefCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val cnt = df
      .select(col(groupCol),
        floor(col(valueCol) / binWidth).cast("long").as("_bin"),
        col(isRefCol))
      .groupBy(col(groupCol), col("_bin"))
      .agg(sum(when(col(isRefCol), 1L).otherwise(0L)).as("_cr"),
        sum(when(!col(isRefCol), 1L).otherwise(0L)).as("_cc"))
    val tot = cnt.groupBy(col(groupCol))
      .agg(sum("_cr").as("_nr"), sum("_cc").as("_nc"),
        count(lit(1)).as("_nb"))
    val p = (col("_cr") + 1).cast("double") / (col("_nr") + col("_nb"))
    val q = (col("_cc") + 1).cast("double") / (col("_nc") + col("_nb"))
    cnt.join(tot, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max("_nr").as("n_ref"), max("_nc").as("n_cur"),
        round(sum((p - q) * log(p / q)), 4).as("psi"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov drift per group, in EXACT integer
   * arithmetic — the distribution-shift monitor next to [[psiDrift]]
   * (PSI needs bins and smoothing; KS is binless and parameter-free):
   * `D = max_v |F_ref(v) − F_cur(v)|` over the pooled distinct values,
   * computed as `max |cumRef(v)·n_cur − cumCur(v)·n_ref|` so the
   * statistic's NUMERATOR and both sample sizes ship exact (no double
   * CDFs to drift cross-engine); the one double division happens at
   * the presentation edge (q105/q201 rule). The argmax location ties
   * toward the smaller value. `unitsCol` must be PRE-SCALED exact
   * integers (cents/µs — the q204/q207 monitor convention).
   *
   * The cross products are guarded against silent long wrap (the r12
   * monitor rule — raise, don't diverge from the oracle): both
   * operands bounded by group row counts, so the guard binds only past
   * ~2e9-row sides.
   *
   * Scale shape: one (group, value) aggregate, one cumulative window
   * per group (value-ordered), one argmax window — all key-partitioned,
   * no collect, no cross join.
   *
   * Output: `(group, n_ref, n_cur, d_num, ks, at_units)`.
   */
  def ksDrift(df: DataFrame, groupCol: String, unitsCol: String,
              isRefCol: String): DataFrame =
    ksDriftWeighted(df.withColumn("_ksw", lit(1L)), groupCol, unitsCol,
      "_ksw", isRefCol)

  /**
   * [[ksDrift]] over PRE-AGGREGATED counts — `weightCol` rows carry
   * per-(group, unit, side) multiplicities instead of one row per
   * observation, which is how a stored reference distribution rides
   * into the streaming monitor ([[graft.streaming.StreamingMonitor]])
   * without re-exploding its history. `ksDrift` is this with weight 1;
   * identical math and output contract.
   */
  def ksDriftWeighted(df: DataFrame, groupCol: String, unitsCol: String,
                      weightCol: String, isRefCol: String): DataFrame = {
    def guardedTimes(a: Column, b: Column): Column = {
      val ok = abs(a.cast("double") * b.cast("double")) < lit(4.4e18)
      when(assert_true(ok, concat(lit("ksDrift cross product exceeds " +
        "the integer-exact magnitude bound (|product| >= 4.4e18) - " +
        "segment the series before scanning; operands "),
        a, lit(" * "), b)).isNull, a * b)
    }
    val per = df
      .select(col(groupCol).as("_g"), col(unitsCol).cast("long").as("_u"),
        col(weightCol).cast("long").as("_w"), col(isRefCol).as("_r"))
      .groupBy("_g", "_u")
      .agg(sum(when(col("_r"), col("_w")).otherwise(0L)).as("_c1"),
        sum(when(!col("_r"), col("_w")).otherwise(0L)).as("_c2"))
    val wc = Window.partitionBy("_g").orderBy("_u")
    val tot = per.groupBy("_g")
      .agg(sum("_c1").as("_n1"), sum("_c2").as("_n2"))
    val dn = per
      .select(col("_g"), col("_u"),
        sum("_c1").over(wc).as("_f1"), sum("_c2").over(wc).as("_f2"))
      .join(tot, "_g")
      .select(col("_g"), col("_u"), col("_n1"), col("_n2"),
        abs(guardedTimes(col("_f1"), col("_n2")) -
          guardedTimes(col("_f2"), col("_n1"))).as("_dn"))
    val wr = Window.partitionBy("_g").orderBy(col("_dn").desc, col("_u"))
    dn.withColumn("_rn", row_number().over(wr))
      .filter(col("_rn") === 1)
      // a group with an empty side has no defined KS (and ANSI division
      // would raise): drop it — a drift test needs both samples
      .filter(col("_n1") > 0 && col("_n2") > 0)
      .select(col("_g").as(groupCol), col("_n1").as("n_ref"),
        col("_n2").as("n_cur"), col("_dn").as("d_num"),
        round(col("_dn").cast("double") /
          (col("_n1").cast("double") * col("_n2").cast("double")), 6)
          .as("ks"),
        col("_u").as("at_units"))
  }

  /**
   * Per-digest drill-down detail — the one QAN review-UI shape the
   * surface lacked (r12 verdict item 8): everything the profile row
   * links to for ONE digest, as a single tall frame the CLI can print
   * and an oracle can UNION together. Sections, in a fixed
   * `(section, ord, label, value)` schema (`value` double, 4 dp where
   * fractional):
   *
   *  - `profile` — cnt, cnt_scaled, total_time, avg_time, n_users;
   *  - `sparkline` — per-hour rate-scaled load (ord = epoch hour, the
   *    drilled chart under the profile row);
   *  - `examples` — the `topExamples` worst calls by latency (label =
   *    the example query text, the tie order (query_time, ts, offset)
   *    shared with q94's example pick);
   *  - `apdex` — satisfied / tolerating / frustrated counts + score;
   *  - `users` / `schemas` — rate-scaled load by user / db, the
   *    drill-down links out of the detail view.
   *
   * Scale shape: every section aggregates the SAME digest-filtered
   * scan (a digest-bucketed warehouse prunes to one bucket's files;
   * the filter reaches the parquet scan as a PushedFilter), and every
   * post-aggregate frame is bounded (hours: calendar; users/dbs:
   * drill-down top-k; examples: top-k) — the rank windows run on
   * those bounded frames only, the q94/Search precedent.
   */
  def digestDetail(wide: DataFrame, digest: String, apdexT: Double = 0.5,
                   topExamples: Int = 3, topDrill: Int = 5): DataFrame = {
    val w = wide.filter(col("digest") === digest)
    val load = col("query_time") * greatest(col("rate_limit"), lit(1L))
    val profile = w.agg(
        count(lit(1)).as("_cnt"),
        sum(greatest(col("rate_limit"), lit(1L))).as("_cs"),
        round(sum(col("query_time")), 4).as("_tt"),
        round(avg(col("query_time")), 4).as("_avg"),
        countDistinct(col("user")).as("_nu"))
      .select(expr("stack(5, " +
        "1L, 'cnt', cast(_cnt as double), " +
        "2L, 'cnt_scaled', cast(_cs as double), " +
        "3L, 'total_time', _tt, " +
        "4L, 'avg_time', _avg, " +
        "5L, 'n_users', cast(_nu as double)) as (ord, label, value)"))
      .select(lit("profile").as("section"), col("ord"), col("label"),
        col("value"))
    val spark = w
      // integer div, not `/`: double true-division can round UP at an
      // hour boundary before the cast truncates (epoch_us rule)
      .groupBy(expr("unix_micros(ts) div 3600000000").as("ord"))
      .agg(round(sum(load), 4).as("value"))
      .select(lit("sparkline").as("section"), col("ord"),
        date_format(timestamp_micros(col("ord") * 3600000000L),
          "yyyy-MM-dd HH:00").as("label"), col("value"))
    val examples = w
      .select(col("query"), col("query_time"), col("ts"), col("offset"))
      .orderBy(col("query_time").desc, col("ts"), col("offset"))
      .limit(topExamples)
      .withColumn("ord", row_number().over(Window.orderBy(
        col("query_time").desc, col("ts"), col("offset"))).cast("long"))
      .select(lit("examples").as("section"), col("ord"),
        col("query").as("label"), round(col("query_time"), 4).as("value"))
    val apdexRows = w.agg(
        count(lit(1)).as("_cnt"),
        count(when(col("query_time") <= apdexT, lit(1))).as("_sat"),
        count(when(col("query_time") > apdexT &&
          col("query_time") <= 4 * apdexT, lit(1))).as("_tol"))
      .select(expr("stack(4, " +
        "1L, 'satisfied', cast(_sat as double), " +
        "2L, 'tolerating', cast(_tol as double), " +
        "3L, 'frustrated', cast(_cnt - _sat - _tol as double), " +
        // SQL-literal 2.0 parses as DECIMAL — cast through double so
        // the branch types agree and the score matches the oracle's
        // double arithmetic
        "4L, 'apdex', round((cast(_sat as double) + " +
        "cast(_tol as double) / 2.0) / cast(_cnt as double), 4)) " +
        "as (ord, label, value)"))
      .select(lit("apdex").as("section"), col("ord"), col("label"),
        col("value"))
    def drill(section: String, byCol: String): DataFrame = w
      .groupBy(col(byCol).as("label"))
      .agg(round(sum(load), 4).as("value"))
      .orderBy(col("value").desc, col("label"))
      .limit(topDrill)
      .withColumn("ord", row_number().over(Window.orderBy(
        col("value").desc, col("label"))).cast("long"))
      .select(lit(section).as("section"), col("ord"), col("label"),
        col("value"))
    profile.unionByName(spark).unionByName(examples)
      .unionByName(apdexRows)
      .unionByName(drill("users", "user"))
      .unionByName(drill("schemas", "db"))
      .orderBy("section", "ord", "label")
  }

  /**
   * Digest-grain MERGEABLE partials for the drill-down page — the
   * streaming/at-rest twin of [[digestDetail]] (the r12 verdict's
   * stretch: the batch surface's review page, fed purely from stored
   * partials a daily or streamed batch blind-appends, the q201 rollup
   * posture at digest grain). Four frames, every one a commutative
   * monoid under append + merge-on-read:
   *
   *  - CORE `(digest, hr, cnt, sum_rate, sum_time_us, sum_load_us,
   *    n_sat, n_tol)` — hourly so the sparkline falls out and every
   *    profile/apdex number is a column sum. Time rides as INTEGER µs
   *    (the rollup determinism contract — float partial sums would
   *    make the stored table arrival-order-dependent); the apdex
   *    threshold is BAKED at build time (classification is not
   *    mergeable across thresholds — document the T a table carries).
   *  - USERS / SCHEMAS `(digest, user|db, sum_load_us)` — drill-down
   *    load partials; merged row count per digest IS the exact
   *    distinct-user count (countDistinct does not merge; a keyed
   *    partial table does — the q210 lesson without the sketch).
   *  - EXAMPLES `(digest, query, query_time, ts, offset)` — each
   *    batch's `topExamples` worst calls; merge = union → re-top-k
   *    (a bounded max-k is a monoid; k rows per digest per batch).
   *
   * Append cost ∝ batch at any corpus size; no stored-table read.
   */
  def digestPartials(wide: DataFrame, apdexT: Double = 0.5,
                     topExamples: Int = 3): (DataFrame, DataFrame,
      DataFrame, DataFrame) = {
    val rate = greatest(col("rate_limit"), lit(1L))
    val timeUs = round(col("query_time") * 1e6).cast("long")
    val core = wide
      .select(col("digest"),
        expr("unix_micros(ts) div 3600000000").as("hr"),
        rate.as("_r"), timeUs.as("_us"), (timeUs * rate).as("_lus"),
        when(col("query_time") <= apdexT, 1L).otherwise(0L).as("_sat"),
        when(col("query_time") > apdexT &&
          col("query_time") <= 4 * apdexT, 1L).otherwise(0L).as("_tol"))
      .groupBy("digest", "hr")
      .agg(count(lit(1)).as("cnt"), sum("_r").as("sum_rate"),
        sum("_us").as("sum_time_us"), sum("_lus").as("sum_load_us"),
        sum("_sat").as("n_sat"), sum("_tol").as("n_tol"))
    def byCol(c: String) = wide
      .select(col("digest"), col(c).as("label"), (timeUs * rate).as("_lus"))
      .groupBy("digest", "label")
      .agg(sum("_lus").as("sum_load_us"))
    val examples = wide
      .select(col("digest"), col("query"), col("query_time"), col("ts"),
        col("offset"))
      .withColumn("_rn", row_number().over(Window.partitionBy("digest")
        .orderBy(col("query_time").desc, col("ts"), col("offset"))))
      .filter(col("_rn") <= topExamples).drop("_rn")
    (core, byCol("user"), byCol("db"), examples)
  }

  /**
   * [[digestDetail]] rebuilt from stored [[digestPartials]] — same
   * tall `(section, ord, label, value)` schema, merge-on-read over
   * tables that may hold many appended batches. If the stream stamped
   * a `batch_id` column, collapse replays UPSTREAM (dropDuplicates on
   * batch_id + the frame's keys, the
   * [[graft.streaming.StreamingRollup]] rule) before passing the
   * frames in. Values present as
   * `round(µs / 1e6, 4)` — exact-integer internals, one division at
   * the presentation edge; section-by-section equality with the
   * event-level [[digestDetail]] is the ReportSpec golden.
   */
  def digestDetailFromPartials(core: DataFrame, users: DataFrame,
                               schemas: DataFrame, examples: DataFrame,
                               digest: String,
                               topExamples: Int = 3,
                               topDrill: Int = 5): DataFrame = {
    val c = core.filter(col("digest") === digest)
      .groupBy("hr")
      .agg(sum("cnt").as("cnt"), sum("sum_rate").as("sum_rate"),
        sum("sum_time_us").as("sum_time_us"),
        sum("sum_load_us").as("sum_load_us"),
        sum("n_sat").as("n_sat"), sum("n_tol").as("n_tol"))
    val nUsers = users.filter(col("digest") === digest)
      .select("label").distinct().count()
    val profile = c.agg(
        sum("cnt").as("_cnt"), sum("sum_rate").as("_cs"),
        round(sum("sum_time_us") / 1e6, 4).as("_tt"),
        round(sum("sum_time_us") / 1e6 / sum("cnt"), 4).as("_avg"))
      .select(expr("stack(5, " +
        "1L, 'cnt', cast(_cnt as double), " +
        "2L, 'cnt_scaled', cast(_cs as double), " +
        "3L, 'total_time', _tt, " +
        "4L, 'avg_time', _avg, " +
        s"5L, 'n_users', cast(${nUsers}L as double)) as (ord, label, value)"))
      .select(lit("profile").as("section"), col("ord"), col("label"),
        col("value"))
    val spark = c
      .select(col("hr").as("ord"),
        date_format(timestamp_micros(col("hr") * 3600000000L),
          "yyyy-MM-dd HH:00").as("label"),
        round(col("sum_load_us") / 1e6, 4).as("value"))
      .select(lit("sparkline").as("section"), col("ord"), col("label"),
        col("value"))
    val ex = examples.filter(col("digest") === digest)
      .orderBy(col("query_time").desc, col("ts"), col("offset"))
      .limit(topExamples)
      .withColumn("ord", row_number().over(Window.orderBy(
        col("query_time").desc, col("ts"), col("offset"))).cast("long"))
      .select(lit("examples").as("section"), col("ord"),
        col("query").as("label"), round(col("query_time"), 4).as("value"))
    val apdexRows = c.agg(
        sum("cnt").as("_cnt"), sum("n_sat").as("_sat"),
        sum("n_tol").as("_tol"))
      .select(expr("stack(4, " +
        "1L, 'satisfied', cast(_sat as double), " +
        "2L, 'tolerating', cast(_tol as double), " +
        "3L, 'frustrated', cast(_cnt - _sat - _tol as double), " +
        "4L, 'apdex', round((cast(_sat as double) + " +
        "cast(_tol as double) / 2.0) / cast(_cnt as double), 4)) " +
        "as (ord, label, value)"))
      .select(lit("apdex").as("section"), col("ord"), col("label"),
        col("value"))
    def drill(section: String, t: DataFrame): DataFrame = t
      .filter(col("digest") === digest)
      .groupBy("label")
      .agg(round(sum("sum_load_us") / 1e6, 4).as("value"))
      .orderBy(col("value").desc, col("label"))
      .limit(topDrill)
      .withColumn("ord", row_number().over(Window.orderBy(
        col("value").desc, col("label"))).cast("long"))
      .select(lit(section).as("section"), col("ord"), col("label"),
        col("value"))
    profile.unionByName(spark).unionByName(ex).unionByName(apdexRows)
      .unionByName(drill("users", users))
      .unionByName(drill("schemas", schemas))
      .orderBy("section", "ord", "label")
  }

  /** Per-digest display loads off stored [[digestPartials]] CORE rows —
    * the feed for the Pareto/Gini concentration views from partials
    * (merge, one presentation division, round BEFORE the running sum —
    * the q134 rule holds because each digest's load rounds here). */
  def digestLoadsFromPartials(core: DataFrame): DataFrame =
    core.groupBy("digest")
      .agg(round(sum("sum_load_us") / 1e6, 4).as("load"))
}
