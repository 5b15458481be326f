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

/**
 * Multimodal column plumbing (task north star): image/audio/video as
 * opaque binary columns with typed metadata, decode / feature-extract /
 * frame-sample as iterator-to-iterator `mapPartitions` over typed
 * Datasets — the Scala-native analog of `mapInPandas` batch UDFs (no
 * Python bridge in this engine; the batch shape, schema, and
 * partitioning ARE the real contract and are tested).
 *
 * ==== STUB BOUNDARY ====
 * The byte-level decoders below are deterministic FAKES: this container
 * carries no image/audio codecs, so `stubDecode` derives features from
 * the raw bytes with a rolling fold and `frameSample` slices the byte
 * array. A production deployment replaces ONLY these two leaf functions
 * with real codec calls (JNI/javacpp); every Spark-side contract —
 * schema, encoders, partition preservation, batch iteration — is real
 * and unchanged.
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

  /** Frame sampling: n evenly spaced frames (byte slices in the stub;
    * real impl seeks keyframes). Generator-shaped — one input row fans
    * out to n rows. */
  def frameSample(records: Dataset[MediaRecord], n: Int): Dataset[MediaFrame] = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val len = r.media.length
      if (len == 0 || n <= 0) Iterator.empty
      else {
        val step = math.max(1, len / n)
        (0 until n).iterator.takeWhile(f => f * step < len).map { f =>
          val from = f * step
          val until = math.min(len, from + step)
          MediaFrame(r.docId, f, java.util.Arrays.copyOfRange(r.media, from, until))
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
