package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The wide-table warehouse layout from SCALE.md §2, made concrete:
 * date-partitioned (partition pruning for every time-windowed QAN query)
 * and optionally digest-bucketed (per-digest aggregates and joins
 * co-locate without an exchange).
 */
object Warehouse {

  /** ~4M index rows per bucket ≈ 100–300 MB parquet per bucket file for
    * the small index-row shapes saved here (band/code/posting/tf rows,
    * 20–40 B each) — inside the guide-§6 128 MB–1 GB file-size window. */
  private val RowsPerBucket = 4L * 1000 * 1000

  /**
   * Scale-adaptive bucket count (r16 verdict item 3; guide §6 file
   * sizing + §2.2 fewer-larger partitions): the caller's `buckets` is
   * the FLOOR — the historical local layout — and the count GROWS with
   * the frame so per-bucket files stay near [[RowsPerBucket]], capped
   * at 1024. Resolution order:
   *
   *  1. `spark.graft.buckets` session conf — the cluster submission's
   *     explicit posture (a 100 TB corpus whose band frame carries
   *     ~10¹¹ rows wants the 1024 cap; a 1 TB one ~256);
   *  2. the optimizer's ROW-COUNT stats when present (analyzed upstream
   *     tables / range-shaped sources) — `rows / RowsPerBucket`;
   *     size-only estimates are deliberately ignored (they inflate
   *     multiplicatively through joins and explodes, and a spurious
   *     1024-way local layout would be a silent regression);
   *  3. the floor — raw-parquet local runs land here, so the bench
   *     layout is byte-identical to every prior round.
   *
   * Bucket-count changes never break probes: bucket pruning and
   * exchange-free joins key off the CATALOG spec of the table actually
   * written, and appends follow the stored spec (see
   * [[bucketsOfOrElse]]).
   */
  private[sources] def adaptiveBuckets(df: DataFrame, floor: Int): Int = {
    val cap = 1024
    df.sparkSession.conf.getOption("spark.graft.buckets") match {
      case Some(b) => math.max(floor, math.min(cap, b.toInt))
      case None =>
        df.queryExecution.optimizedPlan.stats.rowCount
          .map(r => (r / RowsPerBucket).min(cap).max(floor).toInt)
          .getOrElse(floor)
    }
  }

  /** Bucket count an APPEND must use: the stored table's catalog spec
    * when it exists (an append computed from a small batch frame must
    * match the layout the original — possibly adaptive — save chose;
    * Spark rejects mismatches loudly, this resolves them correctly),
    * else the caller's count (append-creates). */
  private def bucketsOfOrElse(spark: SparkSession, table: String,
                              fallback: Int): Int = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (cat.tableExists(ident))
      cat.getTableMetadata(ident).bucketSpec.map(_.numBuckets)
        .getOrElse(fallback)
    else fallback
  }

  /** One resolution rule for every bucketed saver: Append follows the
    * stored catalog spec; Overwrite sizes adaptively with the caller's
    * count as floor. */
  private def resolveBuckets(df: DataFrame, table: String, caller: Int,
                             mode: SaveMode): Int =
    if (mode == SaveMode.Append)
      bucketsOfOrElse(df.sparkSession, table, caller)
    else adaptiveBuckets(df, caller)

  /** Write the wide table date-partitioned: `.../q_date=YYYY-MM-DD/`.
    * Time-ranged readers prune whole partitions (verified in the spec
    * via PartitionFilters in the scan). */
  def writePartitioned(wide: DataFrame, path: String,
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    wide.withColumn("q_date", to_date(col("ts")))
      .write.mode(mode)
      .partitionBy("q_date")
      .parquet(path)

  /** Read back with partition pruning available on `q_date`. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Make `saveAsTable` idempotent ACROSS JVMs: an in-memory catalog
    * forgets managed tables at shutdown but their warehouse LOCATION
    * survives, and the next session's CREATE then fails with
    * LOCATION_ALREADY_EXISTS. (A Hive/production metastore never
    * orphans; this is the embedded-catalog dev/bench shape.)
    *
    * Data-safety contract: when the catalog KNOWS the table, `DROP TABLE`
    * alone is correct — Spark deletes a MANAGED location itself and must
    * NOT delete an EXTERNAL one (the catalog never owned that data). The
    * manual delete applies only to the orphan case (no catalog entry),
    * and the path is the catalog's own `defaultTablePath` for the parsed
    * identifier — honoring the current database and `db.tbl` qualifiers
    * instead of assuming `<warehouse>/<name>`. */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (cat.tableExists(ident)) {
      spark.sql(s"DROP TABLE $table")
    } else {
      val path = new org.apache.hadoop.fs.Path(cat.defaultTablePath(ident))
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }

  /** Append one table of a (possibly multi-table) index with the
    * standard bucketed layout — the admission crash-recovery path's
    * surgical repair (append only the table the crash cut off; a full
    * re-append of a two-table index would duplicate the committed
    * half's rows). Append-creates the table if it does not exist. */
  private[graft] def appendBucketedTable(df: DataFrame, table: String,
                                         bucketCol: String,
                                         buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(bucketsOfOrElse(df.sparkSession, table, buckets), bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /**
   * Register the wide table as a digest-bucketed, date-partitioned
   * managed table: per-digest aggregation over it needs no shuffle
   * (bucketing pre-distributes by digest), which is the dominant QAN
   * access path. Requires a session with a warehouse dir (any local or
   * cluster metastore).
   */
  def saveBucketed(wide: DataFrame, table: String, buckets: Int = 32,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) dropWithLocation(wide.sparkSession, table)
    wide.withColumn("q_date", to_date(col("ts")))
      .write.mode(mode)
      .bucketBy(resolveBuckets(wide, table, buckets, mode), "digest")
      .sortBy("digest")
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Persist an ANN LSH bucket frame
   * ([[graft.operators.Similarity.annBucketFrame]]: `(id, emb, table,
   * key)`) bucketed by `key` — the SCALE.md §5 "index as a table layout":
   * a probe lookup filtering on its bucket keys scans only the matching
   * file buckets (`SelectedBucketsCount` in the plan), never the whole
   * corpus. `sortBy(key)` keeps same-bucket runs contiguous for the
   * within-file scan.
   */
  def saveAnnIndex(bucketFrame: DataFrame, table: String, buckets: Int = 32,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(bucketFrame.sparkSession, table)
    bucketFrame.write.mode(mode)
      .bucketBy(resolveBuckets(bucketFrame, table, buckets, mode), "key")
      .sortBy("key")
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Collect table + column statistics for a saved warehouse table — the
   * CBO feed (SCALE.md §2): row count and per-column ndv/min/max/nulls
   * on the columns QAN queries filter and join by. With
   * `spark.sql.cbo.enabled`, a selective digest filter's cardinality is
   * then estimated from ndv instead of assumed un-selective, which is
   * what lets the planner broadcast a filtered fact slice it would
   * otherwise sort-merge (spec-proven plan flip). On a cluster this
   * runs once per load batch — stats scans are column-pruned and cheap
   * relative to the load itself.
   */
  def analyzeTable(spark: SparkSession, table: String,
                   columns: Seq[String] = Seq("digest", "q_date")): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS " +
      s"FOR COLUMNS ${columns.mkString(", ")}")
  }

  /**
   * Persist a SimHash band frame
   * ([[graft.operators.Dedup.simHashBandFrame]]: `(id, sh, band, key)`)
   * bucketed by `key` — the text-near-dup twin of [[saveAnnIndex]]:
   * a probe document's band keys become a bucket-pruned scan
   * (`SelectedBucketsCount`), and the banded near-dup self-join reads
   * both sides already hash-distributed on `key`, so the join needs no
   * exchange (bucketing on a subset of the `(band, key)` join keys
   * still satisfies its clustering). Index once, probe forever.
   */
  def saveSimHashIndex(bandFrame: DataFrame, table: String, buckets: Int = 32,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(bandFrame.sparkSession, table)
    bandFrame.write.mode(mode)
      .bucketBy(resolveBuckets(bandFrame, table, buckets, mode), "key")
      .sortBy("key")
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Persist a MinHash-LSH index
   * ([[graft.operators.Dedup.minHashBandFrame]]: `(id, band, key)`, plus
   * the shingle frame [[graft.operators.Dedup.shingles]] the exact
   * Jaccard verification consumes) — the fuzzy-dedup twin of
   * [[saveSimHashIndex]]: bands bucket by `key` so a probe document's
   * band keys become a bucket-pruned scan (`SelectedBucketsCount`) and
   * the banded self-join reads both sides pre-distributed on `key`;
   * shingles land in `<table>_shingles` bucketed by the id so the
   * verify joins co-locate on their id keys. The signature model is
   * stateless (seed-derived xxhash64 mins — no fit, no params table),
   * so `SaveMode.Append` with batch-encoded frames is the entire
   * incremental-maintenance story: nothing can drift, nothing can
   * corrupt. Index once, probe forever.
   */
  def saveMinHashIndex(bandFrame: DataFrame, shingles: DataFrame,
                       table: String, idCol: String = "doc_id",
                       buckets: Int = 32,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      dropWithLocation(bandFrame.sparkSession, table)
      dropWithLocation(bandFrame.sparkSession, s"${table}_shingles")
    }
    bandFrame.write.mode(mode)
      .bucketBy(resolveBuckets(bandFrame, table, buckets, mode), "key")
      .sortBy("key")
      .format("parquet")
      .saveAsTable(table)
    shingles.write.mode(mode)
      .bucketBy(
        resolveBuckets(shingles, s"${table}_shingles", buckets, mode), idCol)
      .sortBy(idCol)
      .format("parquet")
      .saveAsTable(s"${table}_shingles")
  }

  /**
   * Persist a posting frame ([[graft.operators.Search.postings]]:
   * distinct `(doc_id, token)`) bucketed by `token` — the inverted
   * index at rest, the lexical twin of [[saveSimHashIndex]]: a search
   * touching k query terms scans only those terms' file buckets
   * (`SelectedBucketsCount`), never the corpus postings, and
   * [[graft.operators.Search.conjunctiveSearch]] consumes the stored
   * table unchanged. `sortBy(token)` keeps each term's posting run
   * contiguous inside its bucket.
   */
  def saveInvertedIndex(postings: DataFrame, table: String, buckets: Int = 32,
                        mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(postings.sparkSession, table)
    postings.write.mode(mode)
      .bucketBy(resolveBuckets(postings, table, buckets, mode), "token")
      .sortBy("token")
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Persist a winnowing fingerprint frame
   * ([[graft.operators.Dedup.winnowingFingerprints]] after the
   * df screen: distinct `(doc_id, fp_hash)`) bucketed by `fp_hash` —
   * the THIRTEENTH at-rest family, the MOSS-style match index: a probe
   * batch's selected hashes join the stored side pre-distributed on
   * the hash (the batch side shuffles, the standing table never does),
   * and growing the corpus is [[appendWinnowIndex]] — a blind bucketed
   * append (selection is per-document and stateless, so appended
   * batches screened under the same df discipline compose exactly).
   */
  def saveWinnowIndex(selected: DataFrame, table: String, buckets: Int = 32,
                      mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(selected.sparkSession, table)
    selected.write.mode(mode)
      .bucketBy(resolveBuckets(selected, table, buckets, mode), "fp_hash")
      .sortBy("fp_hash")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Grow a stored winnowing index by one batch's selected fingerprints
    * — blind bucketed append (`buckets` must match the original save). */
  def appendWinnowIndex(selected: DataFrame, table: String,
                        buckets: Int = 32): Unit =
    appendBucketedTable(selected, table, "fp_hash", buckets)

  /**
   * Persist a char-trigram posting frame
   * ([[graft.operators.Search.trigramPostings]]: distinct
   * `(doc_id, gram)`) bucketed by `gram` — the substring-search index
   * at rest (the pg_trgm analog of [[saveInvertedIndex]]): a
   * `%pattern%` probe touches only its own trigrams' file buckets
   * (`SelectedBucketsCount`), never the corpus postings. Admitting new
   * docs is [[appendTrigramIndex]] — a blind bucketed append, the
   * standing table never read or rewritten (the rollup/index-append
   * discipline; duplicate grams across batches are harmless, the
   * searcher's per-doc distinct absorbs them).
   */
  def saveTrigramIndex(postings: DataFrame, table: String, buckets: Int = 32,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(postings.sparkSession, table)
    postings.write.mode(mode)
      .bucketBy(resolveBuckets(postings, table, buckets, mode), "gram")
      .sortBy("gram")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Blind no-refit append of a new batch's trigram postings into a
    * [[saveTrigramIndex]] table — cost ∝ batch, flat in the standing
    * index size. */
  def appendTrigramIndex(postings: DataFrame, table: String,
                         buckets: Int = 32): Unit =
    saveTrigramIndex(postings, table, buckets, SaveMode.Append)

  /**
   * Persist an aggregate rollup of MERGEABLE PARTIALS
   * ([[graft.operators.Rollup.dailyPartials]]: `(day, event_type, cnt,
   * sum_v, min_v, max_v)`) bucketed by `day`. Appending a batch's
   * partials is a blind bucketed write — the standing table is never
   * read, never rewritten; duplicate partial rows per key are merged on
   * read by [[graft.operators.Rollup.finalizeRollup]], whose aggregate
   * runs exchange-free off the bucketed scan (partitioning on `day`
   * satisfies the (day, event_type) clustering). Incremental cost ∝
   * batch; read cost ∝ keys × batches (compact via [[compactTable]]
   * when append history accumulates).
   */
  def saveRollup(partials: DataFrame, table: String, buckets: Int = 8,
                 mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(partials.sparkSession, table)
    partials.write.mode(mode)
      .bucketBy(resolveBuckets(partials, table, buckets, mode), "day")
      .sortBy("day")
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Persist per-domain admitted-count PARTIALS
   * `(reg_domain, n, batch_id)` bucketed by domain — the q201 rollup
   * discipline applied to the domain-cap admission axis
   * ([[graft.streaming.StreamingDedup.admitBatchDomainCap]]): appends
   * are blind (the standing table is never read at write time), and a
   * replayed batch collapses via its batch_id stamp when the counts
   * merge on read. Bucketing by `reg_domain` keeps the merge
   * aggregate exchange-free off the scan.
   *
   * Stamp namespace contract (see
   * [[graft.streaming.StreamingDedup.domainCountsOf]]): batch_id >= 0
   * is RESERVED for admission rounds — the admission's committed-probe
   * treats a present non-negative stamp as proof that round committed,
   * so a caller SEEDING history here with batch_id 0 would silently
   * swallow structured streaming's first micro-batch (bids start at
   * 0). Direct caller-seeded history must use NEGATIVE stamps (e.g.
   * -1, or -(i+1) per synthetic past batch); negative-stamp rows
   * always sum on read and are never probed.
   */
  def saveDomainCounts(partials: DataFrame, table: String,
                       buckets: Int = 8,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(partials.sparkSession, table)
    partials.write.mode(mode)
      .bucketBy(resolveBuckets(partials, table, buckets, mode), "reg_domain")
      .sortBy("reg_domain")
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Persist canonical-URL keys `(<id>, url_key)` bucketed by the key —
   * the stored half of URL-level exact dedup
   * ([[graft.streaming.StreamingDedup.urlDedupAdmission]]): a probe
   * batch's anti-join shuffles only the batch side (the standing scan
   * is bucket-partitioned on `url_key`). Stateless like the trigram
   * saver — keys are content-derived, so blind Append is safe; the id
   * column rides along for the crash-recovery presence probe.
   */
  def saveUrlKeyIndex(keys: DataFrame, table: String,
                      buckets: Int = 32,
                      mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(keys.sparkSession, table)
    keys.write.mode(mode)
      .bucketBy(resolveBuckets(keys, table, buckets, mode), "url_key")
      .sortBy("url_key")
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Persist a lexical cosine index: the CAPPED tf frame
   * ([[graft.operators.Dedup.cappedLexicalTf]]: `(doc_id, tok, tf)`)
   * bucketed by token — a probe batch's candidate join shuffles only
   * the batch side — plus the squared norms (`<table>_norms`, computed
   * over the SAME capped vectors so stored probes score the exact
   * cosine of what was indexed). Stateless like the MinHash saver:
   * nothing is fitted, so Append is safe for batches whose tokens
   * respect the original cap semantics (admission appends survivors).
   */
  def saveLexicalIndex(cappedTf: DataFrame, norms: DataFrame, table: String,
                       buckets: Int = 32,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      dropWithLocation(cappedTf.sparkSession, table)
      dropWithLocation(cappedTf.sparkSession, s"${table}_norms")
    }
    cappedTf.write.mode(mode)
      .bucketBy(resolveBuckets(cappedTf, table, buckets, mode), "tok")
      .sortBy("tok")
      .format("parquet")
      .saveAsTable(table)
    norms.write.mode(mode).format("parquet")
      .saveAsTable(s"${table}_norms")
  }

  /**
   * Persist a Naive Bayes model at rest — the TWELFTH at-rest family,
   * and the first that is a trained MODEL rather than an index: the
   * per-(label, token) count partials
   * ([[graft.operators.TextAnalysis.naiveBayesFit]]: `(_lab, tok, c)`)
   * bucketed by `tok` (scoring joins test postings on token — the
   * stored side never shuffles) plus the per-label partials
   * (`<table>_labels`: `(_lab, tot, n_docs)`) as a plain table.
   *
   * Both frames are pure ADDITIVE partials (the q201 rollup
   * discipline), so [[appendNbModel]]'s blind Append + the scorer's
   * merge-on-read is EXACTLY a retrain on the union — incremental
   * model updates with no refit and no approximation (spec-pinned:
   * half+half append ≡ one-shot fit).
   *
   * Alongside, a ONE-ROW `<table>_params` `(vocab_size)` — the SQ8
   * `_params` pattern — records |V| at write time so every serve
   * ([[graft.operators.TextAnalysis.naiveBayesScoreStored]]) skips a
   * full distinct-count pass over the standing count table. Vocab is
   * NOT additive (appended batches share tokens), so [[appendNbModel]]
   * recomputes it over the merged stored table once per append —
   * write-time cost, paid once, instead of a serve-time scan paid on
   * every classification call.
   */
  def saveNbModel(counts: DataFrame, labelStats: DataFrame, table: String,
                  buckets: Int = 32,
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      dropWithLocation(counts.sparkSession, table)
      dropWithLocation(counts.sparkSession, s"${table}_labels")
      dropWithLocation(counts.sparkSession, s"${table}_params")
    }
    counts.write.mode(mode)
      .bucketBy(resolveBuckets(counts, table, buckets, mode), "tok")
      .sortBy("tok")
      .format("parquet")
      .saveAsTable(table)
    labelStats.write.mode(mode).format("parquet")
      .saveAsTable(s"${table}_labels")
    writeNbParams(counts.sparkSession, table)
  }

  /** Recompute the one-row NB `_params` table `(vocab_size)` from the
    * stored count table — called by [[saveNbModel]]/[[appendNbModel]]
    * after every write so serves never scan for |V|. Reads the
    * tok-bucketed table (distinct on the bucket key — no shuffle of
    * the stored side) and overwrites the one-row result. */
  private def writeNbParams(spark: SparkSession, table: String): Unit = {
    val vocab = spark.table(table)
      .agg(count_distinct(col("tok")).as("vocab_size"))
    dropWithLocation(spark, s"${table}_params")
    vocab.write.mode(SaveMode.Overwrite).format("parquet")
      .saveAsTable(s"${table}_params")
  }

  /** Persist a centroid table (`(label, centroid)` — k rows, e.g.
    * [[graft.operators.TextAnalysis]]-adjacent
    * [[graft.operators.Similarity.kMediansCentroids]] or
    * `medianCentroids`) as a plain table: the standalone twin of the
    * IVF saver's `_centroids` side table, for fit-once /
    * assign-forever routing without a refit. */
  def saveCentroids(centroids: DataFrame, table: String,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    savePlainTable(centroids, table, mode)

  /** Persist a monitor reference-distribution count frame
    * ([[graft.streaming.StreamingMonitor.referenceCounts]]:
    * `(group, units, c)`) as a plain table. The counts are additive
    * partials (the q201 rule) — Append re-arms the streaming monitor
    * with more baseline mass, no rebuild, and the weighted-KS scorer
    * merges on read. */
  def saveReferenceCounts(counts: DataFrame, table: String,
                          mode: SaveMode = SaveMode.Overwrite): Unit =
    savePlainTable(counts, table, mode)

  /** Persist a learned BPE merge table
    * ([[graft.operators.Bpe.mergeTable]]: rank-ordered
    * `(rnk, ml, mr, cnt)`) — the tokenizer model at rest; serving
    * replays it as one chained-replace projection
    * ([[graft.operators.Bpe.applyStats]]), never re-learning. */
  def saveBpeMerges(merges: DataFrame, table: String,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    savePlainTable(merges, table, mode)

  private def savePlainTable(df: DataFrame, table: String,
                             mode: SaveMode): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(df.sparkSession, table)
    df.write.mode(mode).format("parquet").saveAsTable(table)
  }

  /**
   * Persist an embedding corpus in the MRL/matryoshka serving layout:
   * the first `prefixDim` coordinates materialized as their own
   * `pre` column beside the full vector, so a truncated-dimension
   * first pass ([[graft.operators.Similarity.matryoshkaTopKStored]])
   * reads prefixDim/dim of the vector bytes via plain Parquet column
   * pruning — the layout lever SCALE.md §20 names. Append is safe
   * (per-row derived column, nothing fitted).
   */
  def saveEmbeddingsWithPrefix(emb: DataFrame, idCol: String,
                               embCol: String, prefixDim: Int,
                               table: String,
                               mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite)
      dropWithLocation(emb.sparkSession, table)
    emb.select(col(idCol), col(embCol),
        slice(col(embCol), 1, prefixDim).as("pre"))
      .write.mode(mode).format("parquet").saveAsTable(table)
  }

  /** Grow a stored NB model by one batch's count partials — blind
    * Append on both tables (additive semantics; `buckets` must match
    * the original save), then refresh the one-row `_params` vocab
    * count over the merged table (|V| is not additive across batches;
    * recomputing at append time keeps serves scan-free). */
  def appendNbModel(counts: DataFrame, labelStats: DataFrame,
                    table: String, buckets: Int = 32): Unit = {
    appendBucketedTable(counts, table, "tok", buckets)
    labelStats.write.mode(SaveMode.Append).format("parquet")
      .saveAsTable(s"${table}_labels")
    writeNbParams(counts.sparkSession, table)
  }

  /**
   * Persist an IVF cell frame
   * ([[graft.operators.Similarity.ivfIndex]]: `(id, emb, cell)`)
   * bucketed by `cell` — the inverted file at rest: a probe touching
   * its `nprobe` nearest cells scans only those cells' file buckets
   * (`SelectedBucketsCount`), never the corpus. The companion centroid
   * table (nlist rows) is written as a plain table alongside,
   * `<table>_centroids`.
   */
  def saveIvfIndex(cells: DataFrame, centroids: DataFrame, table: String,
                   buckets: Int = 16,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      dropWithLocation(cells.sparkSession, table)
      dropWithLocation(cells.sparkSession, s"${table}_centroids")
    }
    cells.write.mode(mode)
      .bucketBy(resolveBuckets(cells, table, buckets, mode), "cell")
      .sortBy("cell")
      .format("parquet")
      .saveAsTable(table)
    centroids.write.mode(mode).format("parquet")
      .saveAsTable(s"${table}_centroids")
  }

  /**
   * Persist a PQ code index
   * ([[graft.operators.Similarity.pqIndex]]: codes `(id, sub, code)` +
   * codebook `(sub, code, centroid)`, written as `<table>` and
   * `<table>_codebook`). No pruning key — an ADC query scans every
   * code row by design; the at-rest win is SIZE (subspaces small ints
   * per vector, ~32× under the raw embeddings). Codes are bucketed by
   * `id` so the post-ADC candidate re-rank can co-locate with an
   * id-bucketed corpus table without an exchange.
   */
  def savePqIndex(codes: DataFrame, codebook: DataFrame, table: String,
                  buckets: Int = 32,
                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      dropWithLocation(codes.sparkSession, table)
      dropWithLocation(codes.sparkSession, s"${table}_codebook")
    }
    codes.write.mode(mode)
      .bucketBy(resolveBuckets(codes, table, buckets, mode), "id")
      .sortBy("id")
      .format("parquet")
      .saveAsTable(table)
    codebook.write.mode(mode).format("parquet")
      .saveAsTable(s"${table}_codebook")
  }

  /**
   * Persist an SQ8 scalar-quantized index
   * ([[graft.operators.Similarity.sq8Index]]: codes `(id, code)` +
   * a ONE-ROW params table `(mins, scales)`, `<table>_params`) — the
   * PQ layout's training-free sibling: no pruning key (a probe scans
   * every code row by design), the at-rest win is SIZE (one int per
   * dimension vs a float — and int codes ≤255 dictionary/bit-pack far
   * below 4 bytes in parquet). Codes bucket by `id` for the exact
   * re-rank co-location, like [[savePqIndex]]. Appending new rows
   * needs no helper: encode against the stored params
   * (`sq8Index`'s arithmetic is stateless given params) and
   * `saveSq8Index(..., SaveMode.Append)` leaves the params table
   * untouched only when told to — use mode Append and skip the params
   * write via `writeParams = false`.
   */
  def saveSq8Index(codes: DataFrame, params: DataFrame, table: String,
                   buckets: Int = 32,
                   mode: SaveMode = SaveMode.Overwrite,
                   writeParams: Boolean = true): Unit = {
    // An Append that also appends params would leave a 2-row params
    // table; sq8CosineTopKFrom crossJoins it, silently duplicating every
    // candidate. Fail fast instead of relying on the docstring.
    require(mode != SaveMode.Append || !writeParams,
      "saveSq8Index: Append must pass writeParams = false (the params " +
        "table is one-row by contract; appending would corrupt probes)")
    if (mode == SaveMode.Overwrite) {
      dropWithLocation(codes.sparkSession, table)
      if (writeParams) dropWithLocation(codes.sparkSession, s"${table}_params")
    }
    codes.write.mode(mode)
      .bucketBy(resolveBuckets(codes, table, buckets, mode), "id")
      .sortBy("id")
      .format("parquet")
      .saveAsTable(table)
    if (writeParams)
      params.write.mode(mode).format("parquet")
        .saveAsTable(s"${table}_params")
  }

  // ── Incremental index maintenance ─────────────────────────────────────
  //
  // At 100 TB an index is NEVER rebuilt for a daily batch: new rows are
  // encoded against the EXISTING model (LSH/SimHash are stateless
  // seed-derived hashes; IVF/PQ encode with the stored centroids/codebook
  // via Similarity.ivfAssign / Similarity.pqEncode) and their index rows
  // appended to the bucketed table. `bucketBy` + Append verifies the
  // bucket spec against the catalog, so an append can't silently degrade
  // the layout — Spark rejects a mismatched bucket count. LSH and SimHash
  // appends need no dedicated helper (saveAnnIndex/saveSimHashIndex with
  // SaveMode.Append ARE the append path); IVF/PQ need these two because
  // their Overwrite savers also rewrite the model tables, which an append
  // must leave untouched.

  /** Append already-assigned cell rows ([[graft.operators.Similarity.ivfAssign]])
    * to a stored IVF index, leaving `<table>_centroids` untouched. */
  def appendIvfIndex(cells: DataFrame, table: String,
                     buckets: Int = 16): Unit =
    cells.write.mode(SaveMode.Append)
      .bucketBy(bucketsOfOrElse(cells.sparkSession, table, buckets), "cell")
      .sortBy("cell")
      .format("parquet")
      .saveAsTable(table)

  /** Append already-encoded code rows ([[graft.operators.Similarity.pqEncode]])
    * to a stored PQ index, leaving `<table>_codebook` untouched. */
  def appendPqIndex(codes: DataFrame, table: String,
                    buckets: Int = 32): Unit =
    codes.write.mode(SaveMode.Append)
      .bucketBy(bucketsOfOrElse(codes.sparkSession, table, buckets), "id")
      .sortBy("id")
      .format("parquet")
      .saveAsTable(table)

  /**
   * Persist an IVF-PQ composite index
   * ([[graft.operators.Similarity.ivfPqIndex]]: codes
   * `(id, cell, sub, code)` + centroids `(cell, centroid)` +
   * residual codebook `(sub, code, centroid)`, written as `<table>`,
   * `<table>_centroids`, `<table>_codebook`). Codes bucket by `cell` —
   * the pruning key: a probe's nprobe cell lookups become bucket-pruned
   * scans, and the rows they read are `subspaces` small ints per
   * vector, so the at-rest index combines IVF's read-WHERE pruning with
   * PQ's read-WHAT compression — the only posture that holds when
   * neither the corpus nor a cell's embeddings fit a scan budget.
   */
  def saveIvfPqIndex(codes: DataFrame, centroids: DataFrame,
                     codebook: DataFrame, table: String,
                     buckets: Int = 16,
                     mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      dropWithLocation(codes.sparkSession, table)
      dropWithLocation(codes.sparkSession, s"${table}_centroids")
      dropWithLocation(codes.sparkSession, s"${table}_codebook")
    }
    codes.write.mode(mode)
      .bucketBy(resolveBuckets(codes, table, buckets, mode), "cell")
      .sortBy("cell")
      .format("parquet")
      .saveAsTable(table)
    centroids.write.mode(mode).format("parquet")
      .saveAsTable(s"${table}_centroids")
    codebook.write.mode(mode).format("parquet")
      .saveAsTable(s"${table}_codebook")
  }

  /** Append already-encoded code rows
    * ([[graft.operators.Similarity.ivfPqEncode]] against the stored
    * centroid + codebook tables) to a stored IVF-PQ index, leaving both
    * quantizer tables untouched. */
  def appendIvfPqIndex(codes: DataFrame, table: String,
                       buckets: Int = 16): Unit =
    codes.write.mode(SaveMode.Append)
      .bucketBy(bucketsOfOrElse(codes.sparkSession, table, buckets), "cell")
      .sortBy("cell")
      .format("parquet")
      .saveAsTable(table)

  /** Data files currently under a table's location (parquet parts only —
    * excludes _SUCCESS and metadata). The observability half of
    * [[compactTable]]. */
  def tableFileCount(spark: SparkSession, table: String): Int = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(ident).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(loc, true)
    var n = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  /**
   * Compact a managed table in place, preserving its bucket/sort/partition
   * spec. Every `Append` to a bucketed table lays down one MORE file per
   * bucket, so a streaming admission loop ([[graft.streaming.StreamingDedup]])
   * or daily [[appendIvfIndex]]/[[appendPqIndex]] batch grows k files per
   * bucket after k appends — and at 100 TB the small-files problem is a
   * real scan-cost and NameNode/listing tax (every probe opens k footers
   * per selected bucket instead of 1). The rewrite reads the table once,
   * writes a staging table with the IDENTICAL catalog spec (so bucket
   * pruning and exchange-free joins survive), then atomically swaps it in
   * via RENAME. Returns (files before, files after).
   *
   * This is the maintenance companion of the append path: appends keep
   * ingest O(batch); a periodic compaction keeps reads O(corpus/buckets).
   *
   * Crash safety: the swap renames the LIVE table aside first
   * (`t → t_old`, `t_compacting → t`, drop `t_old`), so every crash
   * point leaves a complete, queryable copy of the data under SOME name
   * and recovery is at most one rename — unlike a DROP-then-RENAME
   * ordering, which has a window where no table exists under the
   * original name at all. The only remaining window is between the two
   * renames, where a reader sees `t` briefly missing but `t_old` +
   * `t_compacting` both hold full copies. (A metastore with
   * transactional DDL — or table formats with commit protocols — closes
   * even that; this is the embedded-catalog shape.)
   */
  def compactTable(spark: SparkSession, table: String): (Int, Int) = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = cat.getTableMetadata(ident)
    val before = tableFileCount(spark, table)
    val staging = table + "_compacting"
    val retired = table + "_old"
    dropWithLocation(spark, staging)
    dropWithLocation(spark, retired) // stale leftover from a prior crash
    var w = spark.table(table).write.mode(SaveMode.Overwrite)
      .format(meta.provider.getOrElse("parquet"))
    meta.bucketSpec.foreach { spec =>
      w = w.bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
      if (spec.sortColumnNames.nonEmpty)
        w = w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    }
    if (meta.partitionColumnNames.nonEmpty)
      w = w.partitionBy(meta.partitionColumnNames: _*)
    w.saveAsTable(staging)
    spark.sql(s"ALTER TABLE $table RENAME TO $retired")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    // RENAME moves the table directory but per-PARTITION catalog entries
    // can still record pre-rename locations (URI-normalization-dependent:
    // `file:/` entries get rewritten, `file:///` ones don't), so a
    // partitioned table reads back empty — or worse, the retired table's
    // entries keep pointing INTO the live directory. Heal the live table
    // from the filesystem FIRST (every partition dir exists, so MSCK
    // rewrites each entry), and strip the retired table down to
    // metadata-only partitions (retainData) before dropping it: a
    // managed DROP deletes partition locations outside its own dir,
    // which with a stale cross-pointer is live data.
    if (meta.partitionColumnNames.nonEmpty) {
      spark.sql(s"MSCK REPAIR TABLE $table")
      val retIdent = spark.sessionState.sqlParser.parseTableIdentifier(retired)
      cat.dropPartitions(retIdent, cat.listPartitions(retIdent).map(_.spec),
        ignoreIfNotExists = true, purge = false, retainData = true)
    }
    spark.sql(s"DROP TABLE $retired")
    spark.catalog.refreshTable(table)
    (before, tableFileCount(spark, table))
  }

  /**
   * Schema migration across parquet partition generations — the WRITE
   * half of the q258 story: a standing path-based dataset whose older
   * batches lack columns (or carry old names/types) is rewritten ONCE
   * to one unified schema, so every future reader drops the
   * `mergeSchema` tax and the null-coalescing special cases.
   *
   *  - `renames`: old → new column name (applied where the old name
   *    exists; generations already on the new name pass through).
   *  - `casts`: column → target SQL type, applied EXPLICITLY — the
   *    migration is where a type unifies, never silently at read time.
   *  - `addDefaults`: column → default expression; generations missing
   *    the column (merged read surfaces NULL) take the default via
   *    coalesce, generations that never had it at all gain it.
   *
   * Crash safety is [[compactTable]]'s staging-rename discipline on
   * directories: the migrated copy writes COMPLETELY to
   * `<path>_migrating`, then `path → <path>_old`,
   * `<path>_migrating → path`, delete `<path>_old` — every crash point
   * leaves a full copy under some name. The entry is self-healing: a
   * missing live dir with a retired copy present (death between the
   * two renames) restores the retired copy first, and stale
   * `_migrating`/`_old` leftovers from any prior crash are cleared
   * before the rewrite, so re-running the SAME migration after any
   * crash converges (the spec drives each window).
   *
   * Scale shape: one read + one write of the dataset — the same cost
   * class as compaction, amortized over every subsequent read; the
   * transform itself is map-only column arithmetic.
   */
  def migrateSchema(spark: SparkSession, path: String,
                    renames: Map[String, String] = Map.empty,
                    casts: Map[String, String] = Map.empty,
                    addDefaults: Map[String, Column] = Map.empty,
                    partitionCols: Seq[String] = Seq.empty): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + "_migrating")
    val retired = new org.apache.hadoop.fs.Path(path + "_old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal a prior crash between the two renames: the retired copy is
    // the complete pre-migration dataset — restore it and redo
    if (!fs.exists(live) && fs.exists(retired))
      require(fs.rename(retired, live), s"crash recovery rename failed: " +
        s"$retired -> $live")
    require(fs.exists(live), s"migrateSchema: no dataset at $path")
    if (fs.exists(staging)) fs.delete(staging, true) // stale half-write
    if (fs.exists(retired)) fs.delete(retired, true) // stale retired copy
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    val renamed = renames.foldLeft(merged) { case (df, (o, n)) =>
      if (!df.columns.contains(o)) df
      // generations split ACROSS the rename (old batches wrote `o`,
      // new batches already write `n`): the merged frame carries both
      // columns, each NULL on the other generation's rows — fold the
      // old into the new, then drop it (a bare rename would collide)
      else if (df.columns.contains(n))
        df.withColumn(n, coalesce(col(n), col(o))).drop(o)
      else df.withColumnRenamed(o, n)
    }
    val casted = casts.foldLeft(renamed) { case (df, (c, t)) =>
      if (df.columns.contains(c)) df.withColumn(c, col(c).cast(t)) else df
    }
    val unified = addDefaults.foldLeft(casted) { case (df, (c, dflt)) =>
      if (df.columns.contains(c)) df.withColumn(c, coalesce(col(c), dflt))
      else df.withColumn(c, dflt)
    }
    val w = unified.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(staging.toString)
    require(fs.rename(live, retired), s"swap rename failed: $live -> $retired")
    require(fs.rename(staging, live), s"swap rename failed: $staging -> $live")
    fs.delete(retired, true)
  }
}
