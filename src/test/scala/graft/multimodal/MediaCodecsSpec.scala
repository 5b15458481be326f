package graft.multimodal

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The real-codec layer: exact-value decode/resize/feature assertions
  * for the pure-JVM PPM and WAV paths, malformed-input fallback, and
  * the Dataset-level dispatch. */
class MediaCodecsSpec extends AnyFunSuite with SparkTestSession {

  import MediaCodecs._

  // 2×2 PPM: red, green / blue, white
  private val px = Array[Int](
    255, 0, 0,   0, 255, 0,
    0, 0, 255,   255, 255, 255)
  private def raster2x2 = Raster(2, 2, px.map(_.toByte))

  test("PPM round trip: encode → decode recovers dimensions and pixels") {
    val bytes = encodePpm(raster2x2)
    val got = decodePpm(bytes).get
    assert(got.width == 2 && got.height == 2)
    assert(got.rgb.toSeq == raster2x2.rgb.toSeq)
  }

  test("PPM decode handles comments and rejects malformed inputs") {
    val withComment =
      "P6\n# a netpbm comment\n2 2\n255\n".getBytes("US-ASCII") ++
        raster2x2.rgb
    assert(decodePpm(withComment).exists(_.width == 2))
    assert(decodePpm("P5\n2 2\n255\n".getBytes ++ raster2x2.rgb).isEmpty,
      "P5 (grayscale) must not decode as P6")
    assert(decodePpm(encodePpm(raster2x2).dropRight(1)).isEmpty,
      "truncated pixel data must not decode")
    assert(decodePpm(Array[Byte]()).isEmpty)
  }

  test("hostile headers and chunk sizes fall back to None, never crash") {
    // 65536×65536 wraps w*h*3 to 0 in Int arithmetic — must be None,
    // not a corrupt empty Raster that crashes feature extraction
    val hugePpm = "P6\n65536 65536\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(1)
    assert(decodePpm(hugePpm).isEmpty)
    // 50000×50000 wraps negative
    val negPpm = "P6\n50000 50000\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(1)
    assert(decodePpm(negPpm).isEmpty)
    // WAV data-chunk size near Int.MaxValue wraps the bounds guard
    val wav = encodeWavPcm16(Array.tabulate(16)(_.toShort))
    val corrupt = wav.clone()
    val sizePos = 40 // "data" chunk size field
    corrupt(sizePos) = 0xf0.toByte; corrupt(sizePos + 1) = 0xff.toByte
    corrupt(sizePos + 2) = 0xff.toByte; corrupt(sizePos + 3) = 0x7f.toByte
    assert(decodeWavPcm16(corrupt).isEmpty)
  }

  test("imageFeatures: 2×2 grid over a 2×2 raster is the exact pixels") {
    val f = imageFeatures(raster2x2, grid = 2)
    // cell order: (0,0)=red, (0,1)=green, (1,0)=blue, (1,1)=white
    val expected = Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f, 1f, 1f, 1f)
    assert(f.length == 12)
    f.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6) }
  }

  test("resizeNearest: upscale 2×2 → 4×4 replicates each source pixel") {
    val up = resizeNearest(raster2x2, 4, 4)
    assert(up.width == 4 && up.height == 4)
    for (y <- 0 until 4; x <- 0 until 4) {
      val si = ((y / 2) * 2 + (x / 2)) * 3
      val di = (y * 4 + x) * 3
      assert((0 until 3).forall(c => up.rgb(di + c) == raster2x2.rgb(si + c)),
        s"pixel ($x,$y) does not replicate its source")
    }
    // and features are invariant under pixel replication
    val f0 = imageFeatures(raster2x2, 2)
    val f1 = imageFeatures(up, 2)
    f0.zip(f1).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
  }

  test("WAV PCM16 round trip and windowed RMS of a known square wave") {
    // 1600 samples alternating ±8192 → RMS = 8192/32768 = 0.25 everywhere
    val sq = Array.tabulate(1600)(i => if (i % 2 == 0) 8192 else -8192)
      .map(_.toShort)
    val bytes = encodeWavPcm16(sq)
    val got = decodeWavPcm16(bytes).get
    assert(got.toSeq == sq.toSeq)
    val rms = audioFeatures(got, nWin = 8)
    assert(rms.length == 8)
    rms.foreach(v => assert(math.abs(v - 0.25f) < 1e-4, s"rms $v"))
    // non-PCM16 variants must fall through
    assert(decodeWavPcm16("RIFFxxxxNOPE".getBytes).isEmpty)
    assert(decodeWavPcm16(Array[Byte]()).isEmpty)
  }

  test("PNG round trip through ImageIO is lossless to the exact pixel") {
    val bytes = encodePng(raster2x2)
    assert(looksLikeCompressedImage(bytes))
    val got = decodeImage(bytes).get
    assert(got.width == 2 && got.height == 2)
    assert(got.rgb.toSeq == raster2x2.rgb.toSeq)
  }

  test("JPEG decode is a real DCT decode: lossy but close, never a stub") {
    // a smooth 16×16 gradient (JPEG's favorable case — saturated 2×2
    // primaries would be shredded by 4:2:0 chroma subsampling): decoded
    // pixels must be within lossy tolerance of the source and NOT what
    // the stub would fabricate from the same bytes
    val w = 16
    val rgb = new Array[Byte](w * w * 3)
    for (y <- 0 until w; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = (x * 16).toByte; rgb(i + 1) = (y * 16).toByte
      rgb(i + 2) = ((x + y) * 8).toByte
    }
    val grad = Raster(w, w, rgb)
    val bytes = encodeJpeg(grad)
    assert(looksLikeCompressedImage(bytes))
    val got = decodeImage(bytes).get
    assert(got.width == w && got.height == w)
    val maxErr = got.rgb.toSeq.zip(grad.rgb.toSeq)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 32, s"JPEG decode error too large: $maxErr")
    val feats = imageFeatures(got)
    assert(feats.length == 12)
    assert(feats.toSeq != MediaPipeline.stubDecode(bytes, 12).toSeq)
  }

  test("decodeImage rejects non-images and truncated streams, never throws") {
    assert(decodeImage("plain text, no magic".getBytes).isEmpty)
    // valid PNG magic, garbage stream
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)
    assert(decodeImage(fake).isEmpty)
    val truncated = encodePng(raster2x2).take(20)
    assert(decodeImage(truncated).isEmpty)
  }

  // 8×8 four-color checkerboard (the JDK GIF WRITER corrupts frames
  // smaller than ~8×8 — see encodeGif's doc; reader is fine)
  private def checker8: Raster = {
    val colors = Array(
      Array(255, 0, 0), Array(0, 255, 0), Array(0, 0, 255),
      Array(255, 255, 255))
    val rgb = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8; ch <- 0 until 3)
      rgb((y * 8 + x) * 3 + ch) = colors((x + y) % 4)(ch).toByte
    Raster(8, 8, rgb)
  }

  test("GIF frame extraction: real decoded frames, evenly sampled, composited") {
    // 6 solid-color frames (palette-exact in GIF); sample 3 of 6
    val colors = Seq(
      (255, 0, 0), (0, 255, 0), (0, 0, 255),
      (255, 255, 0), (0, 255, 255), (255, 0, 255))
    def solid(c: (Int, Int, Int)) = Raster(8, 8,
      Array.fill(64)(Array(c._1.toByte, c._2.toByte, c._3.toByte)).flatten)
    val gif = encodeGif(colors.map(solid))
    assert(looksLikeGif(gif) && looksLikeCompressedImage(gif))
    val frames = gifFrames(gif, 3).get
    // evenly spaced: indices 0, 2, 4 → red, blue, cyan
    assert(frames.length == 3)
    assert(frames.map(f => (f.width, f.height)).forall(_ == ((8, 8))))
    val got = frames.map(f =>
      ((f.rgb(0) & 0xff), (f.rgb(1) & 0xff), (f.rgb(2) & 0xff)))
    assert(got == Vector(colors(0), colors(2), colors(4)))
    // non-GIF and malformed GIFs yield None, never throw
    assert(gifFrames("not a gif".getBytes, 3).isEmpty)
    assert(gifFrames(gif.take(10), 3).isEmpty)
  }

  test("optimized GIF: delta frames honor offsets and disposal on the logical screen") {
    // the externally-produced shape (r8 ADVICE): partial frames at
    // non-zero offsets over a 16×16 logical screen. Composited at (0,0)
    // these would corrupt — the assertion pins every region per frame.
    def solid(w: Int, h: Int, c: (Int, Int, Int)) = Raster(w, h,
      Array.fill(w * h)(Array(c._1.toByte, c._2.toByte, c._3.toByte)).flatten)
    val gif = encodeGifFrames(Seq(
      (solid(16, 16, (255, 0, 0)), 0, 0, "none"),
      // green patch shown at (8,4), then its RECT restores to background
      (solid(8, 8, (0, 255, 0)), 8, 4, "restoreToBackgroundColor"),
      (solid(8, 8, (0, 0, 255)), 0, 8, "none")))
    val frames = gifFrames(gif, 3).get
    assert(frames.length == 3)
    assert(frames.forall(f => f.width == 16 && f.height == 16))
    def px(f: Raster, x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * f.width + x) * 3
      ((f.rgb(i) & 0xff), (f.rgb(i + 1) & 0xff), (f.rgb(i + 2) & 0xff))
    }
    val (red, green, blue, black) =
      ((255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 0, 0))
    assert(px(frames(0), 0, 0) == red && px(frames(0), 15, 15) == red)
    // frame 1: green ONLY in its (8,4)+8×8 rect, red everywhere else
    assert(px(frames(1), 8, 4) == green && px(frames(1), 15, 11) == green)
    assert(px(frames(1), 7, 4) == red && px(frames(1), 8, 3) == red)
    assert(px(frames(1), 0, 0) == red && px(frames(1), 15, 15) == red)
    // frame 2: the green rect restored to background (black in this
    // renderer), blue patch at (0,8), untouched regions still red
    assert(px(frames(2), 8, 4) == black && px(frames(2), 15, 11) == black)
    assert(px(frames(2), 0, 8) == blue && px(frames(2), 7, 15) == blue)
    assert(px(frames(2), 0, 0) == red && px(frames(2), 15, 0) == red)
  }

  test("MJPEG-in-AVI: frames extract through the RIFF walk + JPEG decode") {
    def solid(c: (Int, Int, Int)) = Raster(16, 16,
      Array.fill(256)(Array(c._1.toByte, c._2.toByte, c._3.toByte)).flatten)
    val colors = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0))
    val avi = encodeMjpegAvi(colors.map(solid))
    assert(looksLikeAvi(avi) && !looksLikeGif(avi))
    val frames = aviMjpegFrames(avi, 2).get
    // evenly spaced 2 of 4 → frames 0 (red) and 2 (blue); JPEG is lossy
    // so assert channel dominance with tolerance, like the JPEG spec
    assert(frames.length == 2)
    assert(frames.forall(f => f.width == 16 && f.height == 16))
    def center(f: Raster): Seq[Int] = {
      val i = (8 * 16 + 8) * 3
      Seq(f.rgb(i) & 0xff, f.rgb(i + 1) & 0xff, f.rgb(i + 2) & 0xff)
    }
    assert(center(frames(0)).zip(Seq(255, 0, 0)).forall {
      case (got, want) => math.abs(got - want) <= 24 })
    assert(center(frames(1)).zip(Seq(0, 0, 255)).forall {
      case (got, want) => math.abs(got - want) <= 24 })
    // non-AVI, truncated AVI, and AVI with no MJPEG payload all → None
    assert(aviMjpegFrames("RIFFxxxx not avi".getBytes, 2).isEmpty)
    assert(aviMjpegFrames(avi.take(avi.length / 2), 2).isEmpty)
    assert(aviMjpegFrames(encodeWavPcm16(Array[Short](1, 2, 3)), 2).isEmpty)
  }

  test("frameSample emits real PNG frames for GIF, byte slices otherwise") {
    import spark.implicits._
    val gif = encodeGif(Seq(checker8, checker8, checker8, checker8))
    val other = "0123456789abcdef".getBytes
    val records = Seq(
      MediaRecord(1L, gif, MediaMeta("video", 8, 8, 0)),
      MediaRecord(2L, other, MediaMeta("video", 0, 0, 0))
    ).toDS()
    val got = MediaPipeline.frameSample(records, 2)
      .collect().groupBy(_.docId)
    // GIF: 2 sampled frames, each a decodable PNG of the checkerboard
    assert(got(1L).length == 2)
    got(1L).foreach { f =>
      val r = decodeImage(f.bytes).get
      assert(r.width == 8 && r.height == 8)
      assert(r.rgb.toSeq == checker8.rgb.toSeq)
    }
    // non-GIF: the byte-slice fallback covers all bytes
    assert(got(2L).map(_.bytes.toSeq).reduce(_ ++ _) == other.toSeq)
  }

  test("frameSample handles a real MJPEG AVI container") {
    import spark.implicits._
    def solid(c: (Int, Int, Int)) = Raster(16, 16,
      Array.fill(256)(Array(c._1.toByte, c._2.toByte, c._3.toByte)).flatten)
    val avi = encodeMjpegAvi(Seq(solid((255, 0, 0)), solid((0, 0, 255))))
    val records = Seq(
      MediaRecord(1L, avi, MediaMeta("video", 16, 16, 0))).toDS()
    val got = MediaPipeline.frameSample(records, 2).collect().sortBy(_.frame)
    assert(got.length == 2)
    got.foreach { f =>
      val r = decodeImage(f.bytes).get // PNG-decodable full frames
      assert(r.width == 16 && r.height == 16)
    }
    // red frame then blue frame, JPEG-lossy tolerance
    val first = decodeImage(got(0).bytes).get
    val second = decodeImage(got(1).bytes).get
    assert((first.rgb(0) & 0xff) > 200 && (first.rgb(2) & 0xff) < 60)
    assert((second.rgb(2) & 0xff) > 200 && (second.rgb(0) & 0xff) < 60)
  }

  test("decodeFeaturesAuto dispatches by magic bytes inside the Dataset") {
    import spark.implicits._
    val img = encodePpm(raster2x2)
    val wav = encodeWavPcm16(Array.tabulate(64)(i =>
      (if (i % 2 == 0) 8192 else -8192).toShort))
    val other = "not a media container".getBytes
    val png = encodePng(raster2x2)
    val records = Seq(
      MediaRecord(1L, img, MediaMeta("image", 2, 2, 0)),
      MediaRecord(2L, wav, MediaMeta("audio", 0, 0, 16000)),
      MediaRecord(3L, other, MediaMeta("video", 0, 0, 0)),
      MediaRecord(4L, png, MediaMeta("image", 2, 2, 0))
    ).toDS().repartition(2)
    val got = MediaPipeline.decodeFeaturesAuto(records, stubDim = 16)
      .collect().map(f => f.docId -> f).toMap
    assert(got(1L).features.length == 12) // real PPM path
    assert(math.abs(got(1L).features(0) - 1f) < 1e-6) // red cell
    assert(got(2L).features.length == 8) // real WAV path
    assert(math.abs(got(2L).features(0) - 0.25f) < 1e-4)
    assert(got(3L).features.length == 16) // stub fallback
    assert(got(3L).features.toSeq ==
      MediaPipeline.stubDecode(other, 16).toSeq)
    // compressed image takes the REAL ImageIO path on executors: PNG is
    // lossless, so its features equal the PPM-decoded original's exactly
    assert(got(4L).features.toSeq == got(1L).features.toSeq)
  }

  test("resizeImages resizes PPM blobs and passes other blobs through") {
    import spark.implicits._
    val img = encodePpm(raster2x2)
    val other = "opaque".getBytes
    val records = Seq(
      MediaRecord(1L, img, MediaMeta("image", 2, 2, 0)),
      MediaRecord(2L, other, MediaMeta("video", 0, 0, 0))
    ).toDS()
    val got = MediaPipeline.resizeImages(records, 4, 4)
      .collect().map(r => r.docId -> r).toMap
    val resized = decodePpm(got(1L).media).get
    assert(resized.width == 4 && resized.height == 4)
    assert(got(1L).meta.width == 4 && got(1L).meta.height == 4)
    assert(got(2L).media.toSeq == other.toSeq, "non-PPM must pass through")
    // compressed input: decoded via ImageIO, resized, re-encoded PNG —
    // pixel-exact vs resizing the raw raster (both paths lossless)
    import spark.implicits._
    val viaPng = MediaPipeline.resizeImages(
        Seq(MediaRecord(3L, encodePng(raster2x2),
          MediaMeta("image", 2, 2, 0))).toDS(), 4, 4)
      .collect().head
    val decodedBack = decodeImage(viaPng.media).get
    assert(decodedBack.width == 4 && decodedBack.height == 4)
    assert(decodedBack.rgb.toSeq == resizeNearest(raster2x2, 4, 4).rgb.toSeq)
    assert(viaPng.meta.width == 4 && viaPng.meta.height == 4)
  }

  test("G.711: every codeword is an exact encode/decode fixed point") {
    // THE canonical G.711 conformance check: expand each of the 256
    // codewords and compress the result back.
    for (c <- 0 until 256) {
      val a = alawDecode(c)
      assert(alawEncode(a) == c, f"alaw codeword 0x$c%02x: decoded $a")
      val m = mulawDecode(c)
      // mu-law has a negative zero: 0x7f decodes to 0, which canonically
      // re-encodes as positive zero 0xff — the one non-fixed-point
      val expected = if (c == 0x7f) 0xff else c
      assert(mulawEncode(m) == expected, f"mulaw codeword 0x$c%02x: decoded $m")
      // and decode∘encode is idempotent on sample values for both laws
      assert(mulawDecode(mulawEncode(m)) == m)
      assert(alawDecode(alawEncode(a)) == a)
    }
  }

  test("G.711 WAV round trip: quantization error bounded, features match PCM") {
    val sine = Array.tabulate(1600)(i =>
      (math.sin(i * 0.05) * 24000).toInt.toShort)
    for (mulaw <- Seq(true, false)) {
      val bytes = encodeWavG711(sine, mulaw = mulaw)
      val got = decodeWavAudio(bytes).get
      assert(got.length == sine.length)
      // log-PCM error: half a quantization interval, which scales with
      // the segment — ≤ |x|/12 + 40 covers both laws with margin
      sine.zip(got).foreach { case (x, y) =>
        assert(math.abs(x - y) <= math.abs(x.toInt) / 12 + 40,
          s"sample $x decoded as $y (mulaw=$mulaw)")
      }
      val f0 = audioFeatures(sine)
      val f1 = audioFeatures(got)
      f0.zip(f1).foreach { case (a, b) => assert(math.abs(a - b) < 0.01f) }
      // the PCM16-only decoder must NOT accept a compressed WAV
      assert(decodeWavPcm16(bytes).isEmpty)
    }
  }

  test("IMA ADPCM: decoder bit-exactly reproduces the encoder reconstruction") {
    val sine = Array.tabulate(1000)(i =>
      (math.sin(i * 0.03) * 12000).toInt.toShort)
    // blockAlign 64 → 121 samples/block → 9 blocks, the last one partial
    val (bytes, recon) = encodeWavImaAdpcm(sine, blockAlign = 64)
    val got = decodeWavAudio(bytes).get
    // ADPCM is lossy, but the decoder tracks the encoder's predictor
    // state exactly — the contract is bit-equality with the encoder's
    // own reconstruction, and `fact` trims the padded final block
    assert(got.length == sine.length)
    assert(got.toSeq == recon.toSeq)
    // a 4:1 predictive codec tracks a smooth signal closely
    sine.zip(got).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 2000, s"ADPCM drifted: $x vs $y")
    }
    assert(bytes.length < sine.length, "ADPCM output is ~4x smaller than PCM16")
  }

  test("compressed-audio WAV decode rejects what it cannot decode") {
    val sine = Array.tabulate(200)(i => (math.sin(i * 0.1) * 8000).toInt.toShort)
    // stereo ADPCM is out of scope → None (stub fallback), never garbage
    val (monoBytes, _) = encodeWavImaAdpcm(sine, blockAlign = 64)
    val stereo = monoBytes.clone()
    stereo(22) = 2 // channels field of the fmt chunk
    assert(decodeWavAudio(stereo).isEmpty)
    // unknown format tag → None
    val unknownTag = monoBytes.clone()
    unknownTag(20) = 0x55 // MPEG Layer 3 would be 0x55
    assert(decodeWavAudio(unknownTag).isEmpty)
    // truncating mid-block drops only the incomplete final block
    val full = decodeWavAudio(monoBytes).get
    assert(full.length == sine.length)
    assert(decodeWavAudio("RIFFxxxxNOPE".getBytes).isEmpty)
  }

  // ── Container metadata probe (round 9) ───────────────────────────────

  /** One MPEG-1 Layer III frame, 128 kbps @ 44100 Hz stereo, zero
    * payload: header 0xFF 0xFB 0x90 0x00, frame length 417. */
  private def mp3Frame: Array[Byte] = {
    val f = new Array[Byte](417)
    f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte; f(3) = 0x00
    f
  }

  test("mp3Info: frame walk counts frames, skips ID3v2, reads rate/channels") {
    val id3 = new Array[Byte](110)
    id3(0) = 'I'; id3(1) = 'D'; id3(2) = '3'; id3(3) = 3
    id3(9) = 100 // syncsafe size: 100 bytes after the 10-byte header
    val bytes = id3 ++ Array.fill(10)(mp3Frame).flatten
    val info = mp3Info(bytes).get
    assert(info.container == "mp3" && info.codec == "mpeg1-layer3")
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.frames == 10)
    // 10 frames × 1152 samples / 44100 Hz = 261.22 ms
    assert(info.durationMs == 261)
    assert(mp3Info("not audio at all".getBytes).isEmpty)
  }

  test("mp3Info: ID3v2.4 footer flag adds 10 bytes; tag padding resyncs") {
    // footer flag (bit 4 of flags byte 5): audio starts 10 + size + 10 in
    val id3 = new Array[Byte](120)
    id3(0) = 'I'; id3(1) = 'D'; id3(2) = '3'; id3(3) = 4
    id3(5) = 0x10; id3(9) = 100 // syncsafe size 100 + 10-byte footer
    val footered = mp3Info(id3 ++ Array.fill(3)(mp3Frame).flatten).get
    assert(footered.frames == 3 && footered.sampleRate == 44100)
    // understated tag size (real tags pad): the resync scan must find the
    // first frame instead of hard-failing at the stale offset
    val padded = new Array[Byte](110)
    padded(0) = 'I'; padded(1) = 'D'; padded(2) = '3'; padded(3) = 3
    padded(9) = 50 // claims 50, actual gap to audio is 100
    val resynced = mp3Info(padded ++ Array.fill(3)(mp3Frame).flatten).get
    assert(resynced.frames == 3)
    // no ID3 tag → still must sync at byte 0 (no whole-file scan)
    assert(mp3Info(Array[Byte](0, 0, 0, 0) ++ mp3Frame).isEmpty)
  }

  test("adtsInfo: AAC frame walk reads rate, channels, and 1024-sample duration") {
    // 7-byte ADTS header: MPEG-4 AAC-LC, sr index 4 (44100), 2 channels,
    // frameLen 32 (7 header + 25 payload)
    val frame = new Array[Byte](32)
    frame(0) = 0xff.toByte; frame(1) = 0xf1.toByte
    frame(2) = 0x50; frame(3) = 0x80.toByte; frame(4) = 4; frame(5) = 0
    val bytes = Array.fill(43)(frame).flatten
    val info = adtsInfo(bytes).get
    assert(info.container == "aac-adts" && info.codec == "aac")
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.frames == 43)
    // 43 × 1024 / 44100 = 998.4 ms
    assert(info.durationMs == 998)
  }

  test("mp4Info: box walk finds brand, mvhd v0/v1 duration, and trak count") {
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(tp.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mvhdV0 = box("mvhd", {
      val p = java.nio.ByteBuffer.allocate(100)
      p.putInt(0)           // version 0 + flags
        .putInt(0).putInt(0) // creation, modification
        .putInt(600)         // timescale
        .putInt(1800)        // duration → 3.0 s
      p.array()
    })
    val traks = box("trak", Array.empty) ++ box("trak", Array.empty)
    val bytes = ftyp ++ box("moov", mvhdV0 ++ traks)
    val info = mp4Info(bytes).get
    assert(info.container == "mp4" && info.codec == "isom")
    assert(info.durationMs == 3000 && info.tracks == 2)
    // version-1 mvhd: 64-bit times, timescale shifted to offset 20
    val mvhdV1 = box("mvhd", {
      val p = java.nio.ByteBuffer.allocate(112)
      p.putInt(0x01000000)       // version 1 + flags
        .putLong(0).putLong(0)   // creation, modification (64-bit)
        .putInt(1000)            // timescale
        .putLong(2500)           // duration → 2.5 s
      p.array()
    })
    val v1 = mp4Info(ftyp ++ box("moov", mvhdV1)).get
    assert(v1.durationMs == 2500 && v1.tracks == 0)
    assert(mp4Info("junkjunkjunkjunk".getBytes).isEmpty)
  }

  test("wavInfo and aviInfo read facts from the fixtures this suite encodes") {
    val wav = wavInfo(encodeWavPcm16(new Array[Short](16000), 16000)).get
    assert(wav.codec == "pcm" && wav.sampleRate == 16000 && wav.channels == 1)
    assert(wav.durationMs == 1000) // 16000 samples at 16 kHz
    val mu = wavInfo(encodeWavG711(new Array[Short](8000), mulaw = true, 8000)).get
    assert(mu.codec == "g711-mulaw" && mu.durationMs == 1000)
    val avi = aviInfo(encodeMjpegAvi(Seq(raster2x2, raster2x2, raster2x2), fps = 10)).get
    assert(avi.codec == "vids" || avi.codec == "mjpg") // strh fccType/handler
    assert(avi.frames == 3 && avi.durationMs == 300 && avi.tracks == 1)
  }

  test("probeInfo dispatches by magic bytes and rejects garbage") {
    assert(probeInfo(Array.fill(10)(mp3Frame).flatten).get.container == "mp3")
    assert(probeInfo(encodeWavPcm16(new Array[Short](100), 8000)).get.container == "wav")
    assert(probeInfo(encodeMjpegAvi(Seq(raster2x2))).get.container == "avi")
    assert(probeInfo("garbage bytes everywhere".getBytes).isEmpty)
    assert(probeInfo(null).isEmpty)
    assert(probeInfo(Array[Byte](1, 2)).isEmpty)
  }
}
