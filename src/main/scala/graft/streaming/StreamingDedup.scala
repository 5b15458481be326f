package graft.streaming

import graft.operators.Dedup
import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Online near-duplicate ADMISSION CONTROL — the shape a 100 TB training
 * corpus actually ingests through: documents arrive as a stream, and a
 * document is admitted only if nothing like it has been admitted
 * before. The at-rest SimHash index ([[graft.sources.Warehouse.saveSimHashIndex]])
 * is both the memory and the output: each micro-batch probes it, and
 * the survivors' band rows are appended so later batches (and every
 * other consumer of the index) see them immediately.
 *
 * Per micro-batch:
 *   1. fingerprint + band the batch with the SAME stateless seed-derived
 *      model as the stored index ([[graft.operators.Dedup.simHashBandFrame]]
 *      — no fit, so batch and index encodings can never drift);
 *   2. resolve WITHIN-batch near-dups (banded pair join → connected
 *      components → min-id representative) so one batch cannot admit two
 *      copies of the same new document;
 *   3. probe the stored index ([[graft.operators.Dedup.simHashMatchesAgainst]]):
 *      representatives within `maxHamming` of any admitted document are
 *      rejected. Non-representatives follow their representative
 *      (transitive-closure semantics across the batch∪index graph, same
 *      closure contract as the batch dedup operators);
 *   4. append survivors' bands to the index and survivors to `outPath`.
 *
 * Cost per batch ∝ batch size, not corpus size: the index join is
 * bucket-colocated on the band key and the batch side broadcasts; the
 * append encodes only the batch (the measured-flat maintenance property,
 * BENCH_SCALED `ivf_append`/`pq_append`).
 *
 * Exactly-once: the file-source checkpoint guarantees each input file is
 * processed once per query lifetime. A batch REPLAYED after a mid-batch
 * crash may append duplicate index/output rows for its own survivors —
 * duplicate band rows never change admission decisions (the probe is a
 * distinct-semijoin), but consumers of `outPath` that need exact-once
 * rows should dedup on `idCol` (cheap: survivors are globally unique by
 * construction). Making the output write conditional on the batch id
 * (the JdbcSink pattern) is the strict alternative.
 */
object StreamingDedup {

  def simHashAdmission(docs: DataFrame, idCol: String, textCol: String,
                       indexTable: String, outPath: String,
                       checkpointDir: String,
                       maxHamming: Int = 16,
                       indexBuckets: Int = 32): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, idCol, textCol, indexTable, outPath,
          maxHamming, indexBuckets)
      }
      .start()

  /** One admission round — also the BATCH incremental-dedup API (ship a
    * day's partition against the standing index without a stream). */
  def admitBatch(batch: DataFrame, idCol: String, textCol: String,
                 indexTable: String, outPath: String,
                 maxHamming: Int = 16, indexBuckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      val bands = Dedup.simHashBandFrame(b, idCol,
        split(col(textCol), " ")).persist()
      try {
        // within-batch: one representative per near-dup cluster
        val within = Dedup.simHashNearDupPairsFrom(bands, idCol, maxHamming)
        val dropWithin = Dedup.dedupClustersStar(within, "da", "db")
          .filter(col("node") =!= col("lbl"))
          .select(col("node").as(idCol))
        val repBands = bands.join(dropWithin, Seq(idCol), "left_anti")
        // vs the standing index: reject anything already admitted.
        // localCheckpoint (eager) SEVERS the plan from the index table
        // before we append to it below — a lazy plan would re-probe the
        // table at output-write time, find the survivors' own
        // just-appended bands, and self-reject every admitted document
        // (persist() is not enough: the table append recaches dependent
        // plans). Checkpointed rows are (id, sh, band, key) — scalar,
        // batch-sized, never corpus-sized.
        val survivorBands = (
          if (spark.catalog.tableExists(indexTable)) {
            val hit = Dedup.simHashMatchesAgainst(
              repBands, spark.table(indexTable), idCol, maxHamming)
            repBands.join(hit, Seq(idCol), "left_anti")
          } else repBands
        ).localCheckpoint()
        val survivorIds = survivorBands.select(idCol).distinct()
        val survivors = b.join(survivorIds, Seq(idCol), "left_semi")
        // admit: index first (later batches must see these bands even if
        // the output write below fails and the batch replays)
        Warehouse.saveSimHashIndex(survivorBands, indexTable,
          buckets = indexBuckets,
          mode = if (spark.catalog.tableExists(indexTable)) SaveMode.Append
                 else SaveMode.ErrorIfExists)
        survivors.write.mode(SaveMode.Append).parquet(outPath)
      } finally bands.unpersist()
    } finally b.unpersist()
  }

  /**
   * MinHash-LSH admission — [[simHashAdmission]]'s Jaccard twin over the
   * at-rest MinHash index ([[graft.sources.Warehouse.saveMinHashIndex]]):
   * a document is admitted only if no already-admitted document has
   * word-n-gram Jaccard ≥ `threshold` with it. Same four-step batch
   * shape (stateless encode → within-batch dedup → index probe → append
   * bands+shingles+output), same exactly-once caveats.
   */
  def minHashAdmission(docs: DataFrame, idCol: String, textCol: String,
                       indexTable: String, outPath: String,
                       checkpointDir: String,
                       n: Int = 3, threshold: Double = 0.6,
                       indexBuckets: Int = 32): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatchMinHash(batch, idCol, textCol, indexTable, outPath,
          n, threshold, indexBuckets)
      }
      .start()

  /** One MinHash admission round — also the BATCH incremental
    * fuzzy-dedup API (ship a day's partition against the standing index
    * without a stream). */
  def admitBatchMinHash(batch: DataFrame, idCol: String, textCol: String,
                        indexTable: String, outPath: String,
                        n: Int = 3, threshold: Double = 0.6,
                        indexBuckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      val sh = Dedup.shingles(b, idCol, textCol, n).persist()
      // bands derive from the persisted shingle frame — shingling the
      // batch once, not twice
      val bands = Dedup.minHashBandFrameFromShingles(sh, idCol).persist()
      try {
        // within-batch: one representative per fuzzy-dup cluster
        val within = Dedup.minHashDedupPairsFrom(bands, sh, idCol, threshold)
        val dropWithin = Dedup.dedupClustersStar(within, "da", "db")
          .filter(col("node") =!= col("lbl"))
          .select(col("node").as(idCol))
        val repBands = bands.join(dropWithin, Seq(idCol), "left_anti")
        val repSh = sh.join(dropWithin, Seq(idCol), "left_anti")
        // vs the standing index. Rejection is tracked by ID (not by
        // surviving band rows): a document with fewer than n words has
        // NO shingles and therefore no band rows, but it is not a
        // duplicate of anything and must still be admitted.
        // localCheckpoint SEVERS the rejected-id plan from the index
        // tables before the append below, exactly as the SimHash path
        // documents (a lazy plan would re-probe the tables post-append
        // and self-reject every admitted document); the frame is an id
        // list, batch-bounded, never corpus-sized.
        val rejectedIds = (
          if (spark.catalog.tableExists(indexTable)) {
            val hit = Dedup.minHashMatchesAgainst(
              repBands, repSh,
              spark.table(indexTable), spark.table(s"${indexTable}_shingles"),
              idCol, threshold)
            dropWithin.union(hit)
          } else dropWithin
        ).localCheckpoint()
        val survivorBands = bands.join(rejectedIds, Seq(idCol), "left_anti")
        val survivorSh = sh.join(rejectedIds, Seq(idCol), "left_anti")
        val survivors = b.join(rejectedIds, Seq(idCol), "left_anti")
        // admit: index first (later batches must see these rows even if
        // the output write below fails and the batch replays)
        Warehouse.saveMinHashIndex(survivorBands, survivorSh, indexTable,
          idCol = idCol, buckets = indexBuckets,
          mode = if (spark.catalog.tableExists(indexTable)) SaveMode.Append
                 else SaveMode.ErrorIfExists)
        survivors.write.mode(SaveMode.Append).parquet(outPath)
      } finally { bands.unpersist(); sh.unpersist() }
    } finally b.unpersist()
  }

  /**
   * Lexical-cosine admission — the third member of the admission trio
   * (SimHash hamming, MinHash Jaccard, bag-of-words cosine), over the
   * at-rest lexical index ([[graft.sources.Warehouse.saveLexicalIndex]]):
   * a document is admitted only if no already-admitted document has
   * exact tf-cosine ≥ `threshold` with it. Same four-step batch shape,
   * same exactly-once caveats. The df cap is corpus-local by design:
   * the standing index was capped over its build corpus, each appended
   * batch caps within itself (a batch is its own small corpus — the
   * same stop words emerge wherever the distribution matches).
   */
  def lexicalAdmission(docs: DataFrame, idCol: String, textCol: String,
                       indexTable: String, outPath: String,
                       checkpointDir: String,
                       threshold: Double = 0.8, maxDf: Long = 400L,
                       indexBuckets: Int = 32): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatchLexical(batch, idCol, textCol, indexTable, outPath,
          threshold, maxDf, indexBuckets)
      }
      .start()

  /** One lexical-cosine admission round — also the BATCH incremental
    * API (ship a day's partition against the standing index without a
    * stream). */
  def admitBatchLexical(batch: DataFrame, idCol: String, textCol: String,
                        indexTable: String, outPath: String,
                        threshold: Double = 0.8, maxDf: Long = 400L,
                        indexBuckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      // within-batch: one representative per cosine cluster
      val within = Dedup.lexicalCosinePairs(b, idCol, textCol,
        threshold, maxDf)
      val dropWithin = Dedup.dedupClustersStar(within, "da", "db")
        .filter(col("node") =!= col("lbl"))
        .select(col("node").as(idCol))
      val reps = b.join(dropWithin, Seq(idCol), "left_anti")
      // vs the standing index; localCheckpoint severs the rejected-id
      // plan from the index tables before the append (the MinHash
      // path's self-rejection hazard) — an id list, batch-bounded
      val rejectedIds = (
        if (spark.catalog.tableExists(indexTable)) {
          val hit = Dedup.lexicalCosineAgainst(reps, idCol, textCol,
              spark.table(indexTable), spark.table(s"${indexTable}_norms"),
              threshold)
            .select(col("probe_id").as(idCol)).distinct()
          dropWithin.union(hit)
        } else dropWithin
      ).localCheckpoint()
      val survivors = b.join(rejectedIds, Seq(idCol), "left_anti")
      // admit: index first (later batches must see these rows even if
      // the output write below fails and the batch replays). A doc
      // with EMPTY text has no tf rows — admitted, unmatchable, fine.
      val sTf = Dedup.cappedLexicalTf(survivors, idCol, textCol, maxDf)
        .persist()
      try {
        Warehouse.saveLexicalIndex(sTf, Dedup.lexicalNorms(sTf), indexTable,
          buckets = indexBuckets,
          mode = if (spark.catalog.tableExists(indexTable)) SaveMode.Append
                 else SaveMode.ErrorIfExists)
        survivors.write.mode(SaveMode.Append).parquet(outPath)
      } finally sTf.unpersist()
    } finally b.unpersist()
  }

  /**
   * SEMANTIC admission — the fourth member of the quartet (SimHash =
   * structure, MinHash = content, lexical = vocabulary, this =
   * MEANING): a document is admitted only if no admitted document's
   * EMBEDDING sits within `threshold` cosine, against the at-rest
   * sign-LSH index ([[graft.sources.Warehouse.saveAnnIndex]] layout —
   * the bucket frame carries raw embeddings, so candidates from the
   * bucket-colocated join verify by EXACT cosine; admission is never
   * decided on a hash collision alone). The SemDeDup corpus posture,
   * run at the door instead of as a batch sweep.
   *
   * Same law as the other three: within-batch representatives first
   * ([[graft.operators.Dedup.embeddingNearDupPairs]] → star CC →
   * min-id rep), the index rejects across batches, survivors' bucket
   * rows append (stateless seed-derived model — batch and index
   * encodings can never drift), cost ∝ batch.
   */
  def semanticAdmission(docs: DataFrame, idCol: String, embCol: String,
                        indexTable: String, outPath: String,
                        checkpointDir: String, threshold: Double = 0.9,
                        tables: Int = 8, bits: Int = 8, dim: Int = 64,
                        indexBuckets: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatchSemantic(batch, idCol, embCol, indexTable, outPath,
          threshold, tables, bits, dim, indexBuckets)
      }
      .start()

  /** One semantic admission round — also the BATCH incremental API. */
  def admitBatchSemantic(batch: DataFrame, idCol: String, embCol: String,
                         indexTable: String, outPath: String,
                         threshold: Double = 0.9, tables: Int = 8,
                         bits: Int = 8, dim: Int = 64,
                         indexBuckets: Int = 16): Unit = {
    import graft.operators.Similarity
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      // within-batch: one representative per cosine-≥threshold cluster
      val within = Dedup.embeddingNearDupPairs(b, idCol, embCol,
        threshold, tables, bits, dim)
      val dropWithin = Dedup.dedupClustersStar(within, "da", "db")
        .filter(col("node") =!= col("lbl"))
        .select(col("node").as(idCol))
      val reps = b.join(dropWithin, Seq(idCol), "left_anti")
      // vs the standing index: shared bucket → exact cosine ≥ threshold
      // (raw embeddings ride the stored frame); localCheckpoint severs
      // the rejected-id plan from the index table before the append
      val rejectedIds = (
        if (spark.catalog.tableExists(indexTable)) {
          val probeFrame = reps.select(col(idCol).as("_pid"),
            col(embCol).as("_e_p"),
            posexplode(Similarity.lshKeysArray(tables, bits, dim)(
              col(embCol))).as(Seq("table", "key")))
          val hit = spark.table(indexTable)
            .join(probeFrame, Seq("table", "key"))
            .filter(Similarity.cosine(col("emb"), col("_e_p")) >= threshold)
            .select(col("_pid").as(idCol)).distinct()
          dropWithin.union(hit)
        } else dropWithin
      ).localCheckpoint()
      val survivors = b.join(rejectedIds, Seq(idCol), "left_anti")
      // admit: index first (later batches must see these rows even if
      // the output write replays); null embeddings have no bucket rows
      // — admitted, unmatchable, the per-row degrade contract
      Warehouse.saveAnnIndex(
        Similarity.annBucketFrame(survivors, idCol, embCol, tables, bits, dim),
        indexTable, buckets = indexBuckets,
        mode = if (spark.catalog.tableExists(indexTable)) SaveMode.Append
               else SaveMode.ErrorIfExists)
      survivors.write.mode(SaveMode.Append).parquet(outPath)
    } finally b.unpersist()
  }

  /**
   * SPAN admission — the FIFTH admission axis (SimHash = structure,
   * MinHash = content, lexical = vocabulary, semantic = meaning, this
   * = VERBATIM SPANS): a document is rejected when ≥ `threshold` of
   * its distinct character trigrams are contained in one already-
   * admitted document — the near-verbatim-copy / quoted-wholesale
   * signal that token-set axes dilute (a copy with light edits keeps
   * almost all its char grams). The standing memory is the q225
   * trigram index ([[graft.sources.Warehouse.saveTrigramIndex]]);
   * survivors' postings append blind.
   *
   * Hot grams are df-capped on BOTH sides (batch df and standing df
   * among the probed grams only — the latter a bucket-pruned count,
   * never an index scan): stop-word-like grams ("he ", " th") would
   * otherwise fan the containment join corpus-wide, the q52
   * `maxShingleDf` lesson. Containment is computed over the capped
   * gram sets; a doc whose every gram is capped away (pathological
   * boilerplate) has no containment evidence and is admitted — the
   * per-row degrade contract.
   */
  def trigramAdmission(docs: DataFrame, idCol: String, textCol: String,
                       indexTable: String, outPath: String,
                       checkpointDir: String,
                       threshold: Double = 0.9, maxDf: Long = 1000L,
                       indexBuckets: Int = 32): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatchTrigram(batch, idCol, textCol, indexTable, outPath,
          threshold, maxDf, indexBuckets)
      }
      .start()

  /** One span-containment admission round — also the BATCH incremental
    * API. */
  def admitBatchTrigram(batch: DataFrame, idCol: String, textCol: String,
                        indexTable: String, outPath: String,
                        threshold: Double = 0.9, maxDf: Long = 1000L,
                        indexBuckets: Int = 32): Unit = {
    import graft.operators.Search
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      val bp = Search.trigramPostings(b, idCol, textCol)
      val bCapped = bp.join(
          bp.groupBy("gram").agg(count(lit(1)).as("_df"))
            .filter(col("_df") <= maxDf).select("gram"), "gram")
        .persist()
      val sizes = bCapped.groupBy("doc_id").agg(count(lit(1)).as("_n"))
      // within-batch: newer doc contained in an older one → drop newer
      val dropWithin = bCapped.select(col("doc_id").as("_nb"), col("gram"))
        .join(bCapped.select(col("doc_id").as("_ob"), col("gram")), "gram")
        .filter(col("_nb") > col("_ob"))
        .groupBy("_nb", "_ob").agg(count(lit(1)).as("_common"))
        .join(sizes.withColumnRenamed("doc_id", "_nb"), "_nb")
        .filter(col("_common") >= col("_n") * threshold)
        .select(col("_nb").as(idCol)).distinct()
      // vs the standing index: bucket-pruned gram lookups, standing-df
      // cap over the probed grams only, containment per (probe, stored)
      val rejectedIds = (
        if (spark.catalog.tableExists(indexTable)) {
          val probeGrams = bCapped
            .join(dropWithin.withColumnRenamed(idCol, "doc_id"),
              Seq("doc_id"), "left_anti")
          val probed = spark.table(indexTable)
            .join(probeGrams.select("gram").distinct(), "gram")
            .persist()
          try {
            val kept = probed.join(
              probed.groupBy("gram").agg(count(lit(1)).as("_sdf"))
                .filter(col("_sdf") <= maxDf).select("gram"), "gram")
            val hit = probeGrams
              .select(col("doc_id").as("_pid"), col("gram"))
              .join(kept.select(col("doc_id").as("_sid"), col("gram")), "gram")
              .groupBy("_pid", "_sid").agg(count(lit(1)).as("_common"))
              .join(sizes.withColumnRenamed("doc_id", "_pid"), "_pid")
              .filter(col("_common") >= col("_n") * threshold)
              .select(col("_pid").as(idCol)).distinct()
            dropWithin.union(hit).localCheckpoint()
          } finally probed.unpersist()
        } else dropWithin.localCheckpoint()
      )
      val survivors = b.join(rejectedIds, Seq(idCol), "left_anti")
      // admit: index first (replay safety); a sub-3-char doc has no
      // gram rows — admitted, unmatchable, the per-row degrade contract
      Warehouse.saveTrigramIndex(
        Search.trigramPostings(survivors, idCol, textCol), indexTable,
        buckets = indexBuckets,
        mode = if (spark.catalog.tableExists(indexTable)) SaveMode.Append
               else SaveMode.ErrorIfExists)
      survivors.write.mode(SaveMode.Append).parquet(outPath)
      bCapped.unpersist()
    } finally b.unpersist()
  }
}
