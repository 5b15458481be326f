package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DBSCAN over ε-pair frames: role assignment (core/border/noise),
  * component-min cluster labels, deterministic border attachment, and
  * an end-to-end planted-blob run through exact cosine pairs. */
class DbscanSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  private def points(ids: Long*) = ids.toDF("id")

  test("roles and labels on a hand graph: chain, singleton core, noise") {
    // 1-2-3-4 chain of ε-pairs; minPts=2 → 2,3 core (degree 2), 1,4
    // border; 9 isolated noise; 5-6-7 triangle all core (degree 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L)).toDF("da", "db")
    val got = Dedup.dbscanLabels(points(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L),
        "id", pairs, "da", "db", minPts = 2)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "border", 2L), (2L, "core", 2L), (3L, "core", 2L),
      (4L, "border", 2L), (5L, "core", 5L), (6L, "core", 5L),
      (7L, "core", 5L), (9L, "noise", -1L)), got.toSeq)
  }

  test("a core with no core neighbor is its own singleton cluster") {
    // star: 10 has 3 leaf neighbors (core at minPts=3); leaves have
    // degree 1 → border, attached to 10's singleton cluster
    val pairs = Seq((10L, 11L), (10L, 12L), (10L, 13L)).toDF("da", "db")
    val got = Dedup.dbscanLabels(points(10L, 11L, 12L, 13L), "id",
        pairs, "da", "db", minPts = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, "core", 10L), (11L, "border", 10L),
      (12L, "border", 10L), (13L, "border", 10L)), got.toSeq)
  }

  test("border between two clusters attaches to the MIN label") {
    // two complete-K4 blobs (degree 3 = core at minPts 3); 5 touches a
    // core of each (degree 2 < 3 → border), deterministic min(1, 7) = 1
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = Seq((7L, 8L), (7L, 9L), (7L, 11L), (8L, 9L), (8L, 11L), (9L, 11L))
    val pairs = (k4a ++ k4b ++ Seq((5L, 3L), (5L, 7L))).toDF("da", "db")
    val got = Dedup.dbscanLabels(
        points(1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 11L), "id",
        pairs, "da", "db", minPts = 3)
      .filter(col("id") === 5L)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("border", 1L)), got.toSeq)
  }

  test("planted blobs through exact cosine pairs cluster exactly") {
    // three tight blobs of 5 near-identical unit-ish vectors plus 4
    // isolated randoms — exact ε-pairs at 0.95, minPts 3: every blob
    // member sees its 4 blobmates (core), isolates see nobody (noise)
    // zero-centered, murmur-mixed coordinates: both a linear-in-(seed,i)
    // generator and java.util.Random's first draw correlate across
    // nearby seeds, colliding "isolates" with blobs at cosine ≈ 1
    // (both hit live here) — only a real mixer keeps them independent
    def vec(seed: Int): Seq[Float] = Seq.tabulate(16) { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"v$seed:$i")
      (h & 0xffff).toFloat / 65536f - 0.5f
    }
    def near(v: Seq[Float], j: Int): Seq[Float] =
      v.zipWithIndex.map { case (x, i) => x * (1f + 0.001f * ((i + j) % 3)) }
    val blob = (b: Int, base: Seq[Float]) =>
      (0 until 5).map(j => ((b * 10 + j).toLong, near(base, j)))
    val rows = blob(0, vec(1)) ++ blob(1, vec(7)) ++ blob(2, vec(13)) ++
      Seq((90L, vec(23)), (91L, vec(29)), (92L, vec(31)), (93L, vec(37)))
    val emb = rows.toDF("id", "v")
    val pairs = emb.select(col("id").as("da"), col("v").as("_a"))
      .join(emb.select(col("id").as("db"), col("v").as("_b")),
        col("da") < col("db"))
      .filter(Similarity.cosine(col("_a"), col("_b")) >= 0.95)
      .select("da", "db")
    val got = Dedup.dbscanLabels(emb, "id", pairs, "da", "db", minPts = 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq.sorted
    val expected = (0 until 3).flatMap(b =>
      (0 until 5).map(j => ((b * 10 + j).toLong, "core", (b * 10).toLong))) ++
      Seq((90L, "noise", -1L), (91L, "noise", -1L), (92L, "noise", -1L),
        (93L, "noise", -1L))
    assert(got == expected.sorted, got)
  }

  test("semanticDecontaminate flags exactly the near-holdout rows") {
    val holdout = Seq((1L, Seq(1f, 0f, 0f, 0f))).toDF("id", "v")
    val corpus = Seq(
      (10L, Seq(0.99f, 0.01f, 0f, 0f)), // near copy → flagged
      (11L, Seq(0f, 1f, 0f, 0f)),       // orthogonal → clean
      (12L, Seq(-1f, 0f, 0f, 0f))).toDF("id", "v") // opposite → clean
    val got = Similarity.semanticDecontaminate(corpus, holdout, "id", "v",
        tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 1 && got.head._1 == 10L && got.head._2 == 1L &&
      got.head._3 > 0.99, got.toSeq)
  }

  test("empty pair frame: every point is noise") {
    val pairs = Seq.empty[(Long, Long)].toDF("da", "db")
    val got = Dedup.dbscanLabels(points(1L, 2L), "id", pairs, "da", "db", 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.isNullAt(2)))
    assert(got.toSet == Set((1L, "noise", true), (2L, "noise", true)))
  }
}
