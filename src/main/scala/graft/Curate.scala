package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pii, Pipeline, TextAnalysis, Url}

/**
 * Web-curation CLI — the one-command entry point over the URL/domain
 * curation family (the r15-verdict #7 ask), pairing [[Ingest]]/
 * [[Report]] on the slow-log side. Runs the q265 recipe end-to-end on
 * a parquet corpus and writes HRW-routed shards:
 *
 *   canonicalize (string + IDN/percent) → parse → blocklist gate →
 *   quality gate → URL-level exact dedup → content exact dedup →
 *   near-dup clusters (shingle Jaccard, min-id representative) →
 *   per-domain cap → rendezvous shard
 *
 * with the per-domain scorecard (raw / blocked / low-quality /
 * url-dup / exact-dup / near-dup / over-cap / kept) on stdout.
 *
 *   runMain graft.Curate -in <parquet> -out <dir>
 *     [-id doc_id] [-text text] [-url url | -synthesize]
 *     [-threshold 0.6] [-cap 15] [-shards 8]
 *     [-minQuality 0.35] [-blocklist d1,d2,...] [-redactPii]
 *
 * `-synthesize` derives the deterministic demo URL from (id, lang) —
 * the oracle corpus carries no url column; a real crawl passes
 * `-url <col>`. Stage order is the standard recipe's: governance and
 * quality gates first (rejects must not burn pair budget), content
 * dedup before the cap (a mirror on two domains burns quota nowhere),
 * cap last (quota applies to unique content). Every stage is the same
 * operator the oracle entries check — this main only composes them.
 */
object Curate {

  final case class Config(
      in: String = null,
      out: String = null,
      idCol: String = "doc_id",
      textCol: String = "text",
      urlCol: Option[String] = None,
      synthesize: Boolean = false,
      threshold: Double = 0.6,
      cap: Int = 15,
      shards: Int = 8,
      minQuality: Option[Double] = None,
      blocklist: Seq[String] = Nil,
      robots: Seq[(String, String)] = Nil,
      psl: Option[String] = None,
      redactPii: Boolean = false)

  def parseArgs(args: Array[String]): Config = {
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Config = rest match {
      case "-in" :: v :: t => loop(t, c.copy(in = v))
      case "-out" :: v :: t => loop(t, c.copy(out = v))
      case "-id" :: v :: t => loop(t, c.copy(idCol = v))
      case "-text" :: v :: t => loop(t, c.copy(textCol = v))
      case "-url" :: v :: t => loop(t, c.copy(urlCol = Some(v)))
      case "-synthesize" :: t => loop(t, c.copy(synthesize = true))
      case "-threshold" :: v :: t => loop(t, c.copy(threshold = v.toDouble))
      case "-cap" :: v :: t => loop(t, c.copy(cap = v.toInt))
      case "-shards" :: v :: t => loop(t, c.copy(shards = v.toInt))
      case "-minQuality" :: v :: t =>
        loop(t, c.copy(minQuality = Some(v.toDouble)))
      case "-blocklist" :: v :: t =>
        loop(t, c.copy(blocklist = v.split(',').toSeq.filter(_.nonEmpty)))
      case "-robots" :: v :: t =>
        // dom=/prefix pairs, comma-separated: -robots a.com=/search,b.org=/
        loop(t, c.copy(robots = v.split(',').toSeq.filter(_.nonEmpty).map { r =>
          val i = r.indexOf('=')
          require(i > 0 && i < r.length - 1,
            s"-robots expects dom=/prefix pairs, got '$r'")
          (r.substring(0, i), r.substring(i + 1))
        }))
      case "-psl" :: v :: t => loop(t, c.copy(psl = Some(v)))
      case "-redactPii" :: t => loop(t, c.copy(redactPii = true))
      case Nil => c
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown flag: $other")
    }
    val c = loop(args.toList, Config())
    require(c.in != null, "-in <parquet dir> is required")
    require(c.out != null, "-out <dir> is required")
    require(c.urlCol.isDefined ^ c.synthesize,
      "pass exactly one of -url <col> or -synthesize")
    require(c.cap >= 1, "-cap must be >= 1")
    require(c.shards >= 1, "-shards must be >= 1")
    require(c.threshold > 0 && c.threshold <= 1, "-threshold must be in (0,1]")
    c
  }

  /** The recipe as one composition; returns the per-domain scorecard
    * (also printed by main) after writing `out/shard=K` parquet. */
  def run(spark: SparkSession, c: Config): DataFrame = {
    val id = col(c.idCol)
    val raw = spark.read.parquet(c.in)
    val withUrl = c.urlCol match {
      case Some(u) => raw.withColumn("_url", col(u))
      case None => raw.withColumn("_url",
        Url.syntheticUrl(id, coalesce(col("lang"), lit("xx"))))
    }
    // stage 0+1: canonical key + parse — both map-only; the canonical
    // form (not the raw URL) feeds the parse so host/domain keys agree
    // with the dedup key. -psl <file> swaps the eTLD+1 heuristic for a
    // public-suffix-list snapshot (published line format).
    val canon = withUrl.withColumn("url_canon",
      Url.canonicalizeUrlExt(col("_url")))
    val parts = (c.psl match {
      case Some(f) =>
        import scala.jdk.CollectionConverters._
        Url.urlParts(canon, col("url_canon"),
          java.nio.file.Files.readAllLines(
            java.nio.file.Paths.get(f)).asScala.toSeq)
      case None => Url.urlParts(canon, col("url_canon"))
    }).withColumn("reg_domain",
      coalesce(col("reg_domain"), lit("(invalid-url)")))
    val rawCensus = parts.groupBy("reg_domain").agg(count(lit(1)).as("n_raw"))
    // stage 2: governance gates (both broadcast anti-joins, map-side):
    // whole-domain blocklist, then robots-style path-prefix disallows
    val blocked =
      if (c.blocklist.isEmpty) parts
      else Url.blocklistFilter(parts,
        spark.createDataFrame(c.blocklist.map(Tuple1(_)))
          .toDF("reg_domain"))
    val gated =
      if (c.robots.isEmpty) blocked
      else Url.robotsGate(blocked,
        spark.createDataFrame(c.robots).toDF("reg_domain", "path_prefix"))
    // stage 3: quality gate (per-doc codegen metrics, map-only)
    val surviving = c.minQuality match {
      case Some(t) =>
        gated.filter(TextAnalysis.qualityScore(col(c.textCol)) >= t)
      case None => gated
    }
    // stage 4: URL-level exact dedup — one winner per canonical URL,
    // content-keyed rank (the cheap pre-content reject)
    val urlDeduped = surviving.withColumn("_rk",
        row_number().over(Window.partitionBy("url_canon")
          .orderBy(md5(id.cast("string")), id)))
      .filter(col("_rk") === 1).drop("_rk")
    // stage 5: content exact dedup (min-id per identical text)
    val keepExact = urlDeduped.groupBy(md5(col(c.textCol)).as("_h"))
      .agg(min(id).as(c.idCol)).select(c.idCol)
    val exactDeduped = urlDeduped.join(keepExact, Seq(c.idCol), "left_semi")
    // stage 6: near-dup clusters at the threshold, min-id rep survives
    // (cost-based direct-vs-PPJoin dispatch — q26's posture)
    val pairs = Dedup.jaccardPairsAuto(exactDeduped, c.idCol, c.textCol,
      n = 3, threshold = c.threshold)
    val drop = Dedup.dedupClusters(pairs, "da", "db")
      .filter(col("node") =!= col("lbl"))
      .select(col("node").as(c.idCol))
    val nearDeduped = exactDeduped.join(drop, Seq(c.idCol), "left_anti")
    // stage 7: per-domain cap (WindowGroupLimit pre-caps map-side)
    val kept = Url.perDomainCap(nearDeduped, c.idCol, c.cap)
    // stage 7.5 (optional): PII scrub on the KEPT set only — redaction
    // after all attrition stages so rejected docs never pay the regex
    // pass; map-only, so it adds zero shuffles to the plan
    val scrubbed =
      if (c.redactPii)
        kept.withColumn(c.textCol, Pii.redactPii(col(c.textCol)))
      else kept
    // stage 8: HRW shard routing + write
    scrubbed.withColumn("shard",
        Pipeline.rendezvousShard(id.cast("string"), c.shards))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .parquet(c.out)
    // scorecard: every stage's per-domain attrition, left-stitched
    // onto the raw census (blocked domains show n_raw with zero kept)
    def census(df: DataFrame, name: String): DataFrame =
      df.groupBy("reg_domain").agg(count(lit(1)).as(name))
    rawCensus
      .join(census(gated, "n_allowed"), Seq("reg_domain"), "left")
      .join(census(surviving, "n_quality"), Seq("reg_domain"), "left")
      .join(census(urlDeduped, "n_url_uniq"), Seq("reg_domain"), "left")
      .join(census(exactDeduped, "n_exact_uniq"), Seq("reg_domain"), "left")
      .join(census(nearDeduped, "n_near_uniq"), Seq("reg_domain"), "left")
      .join(census(kept, "n_kept"), Seq("reg_domain"), "left")
      .na.fill(0L)
      .orderBy("reg_domain")
  }

  def main(args: Array[String]): Unit = {
    val c = parseArgs(args)
    val spark = GraftSession.build("graft-curate")
    try {
      val card = run(spark, c)
      // bounded print: domain cardinality, not corpus size
      System.err.println(
        "reg_domain\tn_raw\tn_allowed\tn_quality\tn_url_uniq\tn_exact_uniq\tn_near_uniq\tn_kept")
      card.collect().foreach(r => System.err.println(
        (0 until r.length).map(r.get).mkString("\t")))
    } finally spark.stop()
  }
}
