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

  test("compressed-audio WAVs dispatch to the real decoder, not the stub") {
    import spark.implicits._
    val sine = Array.tabulate(1600)(i =>
      (math.sin(i * 0.05) * 20000).toInt.toShort)
    val pcm = MediaCodecs.encodeWavPcm16(sine)
    val mulaw = MediaCodecs.encodeWavG711(sine, mulaw = true)
    val adpcm = MediaCodecs.encodeWavImaAdpcm(sine, blockAlign = 256)._1
    val records = Seq(
      MediaRecord(1L, pcm, MediaMeta("audio", 0, 0, 16000)),
      MediaRecord(2L, mulaw, MediaMeta("audio", 0, 0, 8000)),
      MediaRecord(3L, adpcm, MediaMeta("audio", 0, 0, 8000))).toDS()
    val byId = MediaPipeline.decodeFeaturesAuto(records).collect()
      .map(f => f.docId -> f.features).toMap
    // real decode → 8 RMS windows; the stub fallback would emit 16 dims
    assert(byId.values.forall(_.length == 8))
    // all three containers carry the same signal, so the compressed
    // paths must land within quantization distance of the PCM features
    val ref = byId(1L)
    for (id <- Seq(2L, 3L); (a, b) <- ref.zip(byId(id)))
      assert(math.abs(a - b) < 0.01f, s"doc $id diverged from PCM features")
  }

  test("probeMedia: header facts per blob without decode, no shuffle") {
    import spark.implicits._
    val mp3 = {
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte
      Array.fill(5)(f).flatten
    }
    val wav = MediaCodecs.encodeWavPcm16(new Array[Short](8000), 16000)
    val records = Seq(
      MediaRecord(1L, mp3, MediaMeta("audio", 0, 0, 44100)),
      MediaRecord(2L, wav, MediaMeta("audio", 0, 0, 16000)),
      MediaRecord(3L, "opaque stub bytes".getBytes, MediaMeta("video", 0, 0, 0))
    ).toDS().repartition(2)
    val probes = MediaPipeline.probeMedia(records)
    assert(probes.rdd.getNumPartitions == records.rdd.getNumPartitions)
    val byId = probes.collect().map(p => p.docId -> p).toMap
    assert(byId(1L).container == "mp3" && byId(1L).sampleRate == 44100
      && byId(1L).frames == 5)
    assert(byId(2L).container == "wav" && byId(2L).codec == "pcm"
      && byId(2L).durationMs == 500)
    assert(byId(3L).container == "unknown" && byId(3L).durationMs == -1L)
  }
}
