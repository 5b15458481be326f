package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed metadata carried alongside an opaque media blob. */
final case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)

/** One media item: id + raw bytes + metadata. The bytes stay opaque
  * `binary` all the way through the plan — only the decode boundary
  * touches them. */
final case class MediaRecord(docId: Long, media: Array[Byte], meta: MediaMeta)

/** Decoded fixed-width feature vector per item. */
final case class MediaFeatures(docId: Long, kind: String, features: Array[Float])

/** A sampled frame (or audio chunk): item id, frame index, bytes. */
final case class MediaFrame(docId: Long, frame: Int, bytes: Array[Byte])

/** Header-derived media facts ([[MediaCodecs.probeInfo]]): one row per
  * blob, `container = "unknown"` when no parser claims the bytes. */
final case class MediaProbe(docId: Long, container: String, codec: String,
  sampleRate: Int, channels: Int, durationMs: Long, frames: Long, tracks: Int)

/**
 * Multimodal column plumbing (task north star): image/audio/video as
 * opaque binary columns with typed metadata, decode / feature-extract /
 * frame-sample as iterator-to-iterator `mapPartitions` over typed
 * Datasets — the Scala-native analog of `mapInPandas` batch UDFs (no
 * Python bridge in this engine; the batch shape, schema, and
 * partitioning ARE the real contract and are tested).
 *
 * ==== CODEC BOUNDARY ====
 * IMAGES decode for REAL in pure JVM, compressed or not
 * ([[MediaCodecs]]: P6 PPM hand-parsed; JPEG/PNG/GIF/BMP/TIFF through
 * the JDK's own `javax.imageio` since round 7 — real entropy/DCT
 * decode, headless-safe, zero added dependencies), all landing on one
 * packed-RGB [[MediaCodecs.Raster]] so per-cell mean-RGB features and
 * nearest-neighbor resize are codec-agnostic. AUDIO decodes for real
 * (windowed RMS features) for WAV PCM16 and — round 8 — for the
 * compressed G.711 mu-law/a-law and IMA ADPCM WAV payloads, and VIDEO
 * frame extraction is real for animated GIF and MJPEG-in-AVI
 * (round 8: the RIFF walker composed with the JPEG decoder).
 * [[decodeFeaturesAuto]] dispatches on magic bytes. The remaining stub
 * boundary is PERCEPTUAL audio (MP3/AAC) and inter-frame-coded video
 * (H.264/...) — the JDK has no decoder for those, so such bytes take
 * the deterministic `stubDecode` fallback and a production deployment
 * replaces only that leaf (JNI/javacpp). Every Spark-side contract —
 * schema, encoders, partition preservation, batch iteration — is real
 * and unchanged either way.
 *
 * Scale notes (100 TB): decode is the expensive stage, so it must be
 * (a) iterator-to-iterator (no partition materialization — constant
 * memory per task), (b) behind column pruning (metadata-only queries
 * never deserialize `media`), and (c) free to repartition first —
 * blob tables are written with small `maxPartitionBytes` targets so one
 * straggling 4K video doesn't serialize a task for minutes.
 */
object MediaPipeline {

  /** Deterministic fake "decode": rolling polynomial fold of the bytes
    * into `dim` accumulators, scaled to [-1, 1]. Replace with a real
    * codec in production (see STUB BOUNDARY above). */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      acc(d) = (acc(d) * 31 + (bytes(i) & 0xff)) % 1000003L
      i += 1
    }
    acc.map(v => ((v.toDouble / 1000003.0) * 2 - 1).toFloat)
  }

  /** Feature extraction over media blobs — iterator-to-iterator, one
    * output row per input row, partitioning preserved. */
  def decodeFeatures(records: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map(r => MediaFeatures(r.docId, r.meta.kind, stubDecode(r.media, dim)))
    }
  }

  /** Container/codec metadata for every blob WITHOUT sample decode
    * (round 9): MP3 and ADTS-AAC frame walks, MP4 `mvhd`, WAV `fmt `,
    * AVI `avih` — the formats whose sample decode sits behind the stub
    * boundary still yield real duration/codec/rate facts from headers.
    * This is the selection stage a media pipeline runs FIRST at 100 TB:
    * filter/bucket/price by duration and codec over header bytes, and
    * only the surviving rows ever reach the expensive decode stage.
    * Same iterator-to-iterator, partition-preserving contract. */
  def probeMedia(records: Dataset[MediaRecord]): Dataset[MediaProbe] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.probeInfo(r.media) match {
          case Some(i) => MediaProbe(r.docId, i.container, i.codec,
            i.sampleRate, i.channels, i.durationMs, i.frames, i.tracks)
          case None => MediaProbe(r.docId, "unknown", "unknown", -1, -1, -1L, -1L, -1)
        }
      }
    }
  }

  /** Format-dispatching decode: real decoders for every image format
    * (P6 PPM hand-parsed; JPEG/PNG/GIF/BMP/TIFF via ImageIO — each →
    * 2×2-cell mean RGB, 12 floats) and for WAV audio (8-window RMS)
    * including REAL decompression of G.711 mu-law/a-law and IMA ADPCM
    * payloads (round 8); deterministic stub fallback for perceptual
    * audio (MP3/AAC) and inter-frame video. Same iterator-to-iterator
    * / partition-preserving contract as [[decodeFeatures]]. */
  def decodeFeaturesAuto(records: Dataset[MediaRecord],
                         stubDim: Int = 16): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val feats = MediaCodecs.decodePpm(r.media)
          .orElse(MediaCodecs.decodeImage(r.media))
          .map(MediaCodecs.imageFeatures(_))
          .orElse(MediaCodecs.decodeWavAudio(r.media)
            .map(MediaCodecs.audioFeatures(_)))
          .getOrElse(stubDecode(r.media, stubDim))
        MediaFeatures(r.docId, r.meta.kind, feats)
      }
    }
  }

  /** Real image resize: image blobs (PPM or any ImageIO format) are
    * decoded, nearest-neighbor resampled, and re-encoded — PPM stays
    * PPM, compressed formats re-encode as lossless PNG (resizing into
    * a fresh lossy generation would compound JPEG artifacts); metadata
    * updated. Non-image blobs pass through untouched.
    * Iterator-to-iterator. */
  def resizeImages(records: Dataset[MediaRecord], nw: Int,
                   nh: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        MediaCodecs.decodePpm(r.media) match {
          case Some(raster) =>
            val resized = MediaCodecs.resizeNearest(raster, nw, nh)
            r.copy(media = MediaCodecs.encodePpm(resized),
              meta = r.meta.copy(width = nw, height = nh))
          case None => MediaCodecs.decodeImage(r.media) match {
            case Some(raster) =>
              val resized = MediaCodecs.resizeNearest(raster, nw, nh)
              r.copy(media = MediaCodecs.encodePng(resized),
                meta = r.meta.copy(width = nw, height = nh))
            case None => r
          }
        }
      }
    }
  }

  /** Frame sampling: n evenly spaced frames. REAL for two video-ish
    * containers: animated GIF (inter-frame delta compositing honoring
    * per-frame offsets and disposal) and MJPEG-in-AVI (RIFF chunk walk +
    * ImageIO JPEG decode per frame) — both emitted as lossless PNG
    * bytes. Other formats fall back to byte slices (a real H.264 impl
    * would seek keyframes — no JDK decoder exists). Generator-shaped —
    * one input row fans out to ≤n rows. */
  def frameSample(records: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      MediaCodecs.gifFrames(r.media, n)
        .orElse(MediaCodecs.aviMjpegFrames(r.media, n)) match {
        case Some(frames) =>
          frames.iterator.zipWithIndex.map { case (raster, f) =>
            MediaFrame(r.docId, f, MediaCodecs.encodePng(raster))
          }
        case None =>
          val len = r.media.length
          if (len == 0 || n <= 0) Iterator.empty
          else {
            val step = math.max(1, len / n)
            (0 until n).iterator.takeWhile(f => f * step < len).map { f =>
              val from = f * step
              val until = math.min(len, from + step)
              MediaFrame(r.docId, f,
                java.util.Arrays.copyOfRange(r.media, from, until))
            }
          }
      }
    }
  }

  /** "Resize" stub: re-extract features at a different width — shows the
    * decode→transform composition without a codec. */
  def resizeFeatures(features: Dataset[MediaFeatures], newDim: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.mapPartitions { it =>
      it.map { f =>
        val out = Array.tabulate(newDim)(i =>
          f.features(i % f.features.length))
        MediaFeatures(f.docId, f.kind, out)
      }
    }
  }

  /** Test/demo corpus: documents' text bytes dressed as media blobs. */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id as docId", "cast(text as binary) as media",
        "named_struct('kind', case when doc_id % 3 = 0 then 'image' when doc_id % 3 = 1 then 'audio' else 'video' end, 'width', 64, 'height', 64, 'sampleRate', 16000) as meta")
      .as[MediaRecord]
  }
}
