package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the multimodal plumbing: schema/batch shape,
  * determinism, partition preservation, and pruning behavior — the parts
  * that stay when the stub decoders are swapped for real codecs. */
class MediaPipelineSpec extends AnyFunSuite with SparkTestSession {

  private lazy val media =
    MediaPipeline.syntheticMedia(spark, "/root/testdata/sf0.001").repartition(4)

  test("decode: one feature row per record, fixed dim, deterministic") {
    val feats = MediaPipeline.decodeFeatures(media, dim = 16)
    val rows = feats.collect()
    assert(rows.length == media.count())
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(_.features.forall(f => f >= -1f && f <= 1f)))
    // deterministic: same input → identical vectors
    val again = MediaPipeline.decodeFeatures(media, dim = 16).collect()
    assert(rows.sortBy(_.docId).map(_.features.toSeq).toSeq ==
      again.sortBy(_.docId).map(_.features.toSeq).toSeq)
  }

  test("decode preserves partitioning (iterator-to-iterator, no shuffle)") {
    val feats = MediaPipeline.decodeFeatures(media)
    assert(feats.rdd.getNumPartitions == media.rdd.getNumPartitions)
    // and the physical plan has no exchange on top of the scan
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
  }

  test("frame sampling fans out to n frames covering all bytes") {
    val frames = MediaPipeline.frameSample(media, n = 4)
    val byDoc = frames.collect().groupBy(_.docId)
    val sizes = media.collect().map(r => r.docId -> r.media.length).toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.length <= 4 && fs.nonEmpty)
      assert(fs.map(_.frame).sorted.toSeq == (0 until fs.length))
      // frames partition a prefix of the blob contiguously
      assert(fs.map(_.bytes.length).sum <= sizes(id))
    }
  }

  test("metadata-only query prunes the binary column from the scan") {
    val kinds = media.toDF().select("docId", "meta.kind")
    val scan = kinds.queryExecution.executedPlan.toString
    assert(!scan.contains("media"), s"binary column not pruned:\n$scan")
    assert(kinds.distinct().count() > 0)
  }

  test("resize composes on decoded features") {
    val f32 = MediaPipeline.resizeFeatures(
      MediaPipeline.decodeFeatures(media, dim = 16), newDim = 32)
    assert(f32.collect().forall(_.features.length == 32))
  }
}
