package graft.multimodal

/**
 * Pure-JVM media decoders — no external codec libraries:
 *
 *  - UNCOMPRESSED containers hand-parsed: binary PPM (P6) rasters and
 *    RIFF/WAV PCM16 audio (header walk + sample access);
 *  - COMPRESSED images through the JDK's own `javax.imageio` (round 7):
 *    JPEG, PNG, GIF, BMP, TIFF ship with `java.desktop` in every
 *    Java 17, headless included — real entropy/DCT decode, not a stub;
 *  - VIDEO containers whose frames are intra-coded images: animated GIF
 *    (delta compositing with offsets/disposal) and MJPEG-in-AVI
 *    (round 8: the RIFF walk composed with the JPEG decoder).
 *
 *  - COMPRESSED AUDIO that is bit-exactly specified integer math
 *    (round 8): ITU-T G.711 mu-law/a-law (2:1 log-PCM) and mono IMA
 *    ADPCM (4:1 predictive nibbles) decode for real from the public
 *    specs — no DSP library involved.
 *
 * The remaining stub boundary in [[MediaPipeline]] is PERCEPTUAL audio
 * (MP3/AAC) and inter-frame-coded video (H.264…), for which the JDK
 * genuinely has no decoder. Even for those, container METADATA is real
 * (round 9, [[probeInfo]]): MP3/ADTS frame walks, MP4 box walks, and
 * the RIFF headers yield codec/rate/channel/duration facts without any
 * sample decode — the selection stage runs on headers alone.
 *
 * All functions are driver/executor-agnostic pure byte-array code:
 * they run inside `mapPartitions` with constant memory per record.
 */
object MediaCodecs {

  /** One-time per-JVM ImageIO setup: headless AWT (executors have no
    * display) and no disk cache (a temp file per decode would turn the
    * hot decode path into small-file IO). */
  private lazy val imageIoReady: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Magic-byte sniff for the formats [[decodeImage]] handles. Checked
    * BEFORE ImageIO is touched, so arbitrary non-image blobs (the
    * common case in a mixed corpus) skip reader discovery entirely. */
  def looksLikeCompressedImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
        (b(2) & 0xff) == 0xff) ||                              // JPEG
      ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G') ||                                        // PNG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') || // GIF
      (b(0) == 'B' && b(1) == 'M') ||                          // BMP
      (b(0) == 0x49 && b(1) == 0x49 && b(2) == 0x2a && b(3) == 0) || // TIFF LE
      (b(0) == 0x4d && b(1) == 0x4d && b(2) == 0 && b(3) == 0x2a))   // TIFF BE

  /** Compressed-image decode via the JDK's ImageIO (JPEG/PNG/GIF/BMP/
    * TIFF) to the same packed-RGB [[Raster]] the PPM path produces, so
    * resize + feature extraction are codec-agnostic downstream. None
    * for non-image bytes (cheap magic check) and for malformed streams
    * (callers fall back, a hostile blob must never kill the task). */
  def decodeImage(bytes: Array[Byte]): Option[Raster] = {
    if (!looksLikeCompressedImage(bytes)) return None
    imageIoReady
    try {
      Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          rgb(i * 3) = ((p >> 16) & 0xff).toByte
          rgb(i * 3 + 1) = ((p >> 8) & 0xff).toByte
          rgb(i * 3 + 2) = (p & 0xff).toByte
          i += 1
        }
        Raster(w, h, rgb)
      }
    } catch { case _: Exception => None }
  }

  private def toBufferedImage(r: Raster): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(r.width, r.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](r.width * r.height)
    var i = 0
    while (i < px.length) {
      px(i) = ((r.rgb(i * 3) & 0xff) << 16) |
        ((r.rgb(i * 3 + 1) & 0xff) << 8) | (r.rgb(i * 3 + 2) & 0xff)
      i += 1
    }
    img.setRGB(0, 0, r.width, r.height, px, 0, r.width)
    img
  }

  private def encodeVia(r: Raster, format: String): Array[Byte] = {
    imageIoReady
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBufferedImage(r), format, bos)
    bos.toByteArray
  }

  /** PNG encode (lossless — the round-trip and resize output format). */
  def encodePng(r: Raster): Array[Byte] = encodeVia(r, "png")

  /** JPEG encode (lossy; test fixtures for the compressed-decode path). */
  def encodeJpeg(r: Raster): Array[Byte] = encodeVia(r, "jpg")

  /** True when the bytes are a GIF container (the one multi-frame
    * format the JDK can decode — animated GIF is the poor man's
    * video). */
  def looksLikeGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  /**
   * REAL frame extraction for animated GIFs: up to `n` evenly spaced
   * frames decoded via the JDK GIF reader and returned as [[Raster]]s.
   * Frames are composited over the previous frame (GIF inter-frame
   * patches can be partial — a raw `reader.read(i)` of a delta frame
   * is a fragment, not the image), matching how a video decoder emits
   * full frames from P-frames. None for non-GIF or malformed bytes.
   */
  def gifFrames(bytes: Array[Byte], n: Int): Option[Vector[Raster]] = {
    if (!looksLikeGif(bytes) || n <= 0) return None
    imageIoReady
    val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!it.hasNext) return None
    val reader = it.next()
    try {
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val total = reader.getNumImages(true)
      if (total <= 0) return None
      // canvas = the LOGICAL SCREEN from the stream metadata, not frame
      // 0's raster: optimized GIFs ship partial delta frames positioned
      // by per-frame (left, top) offsets — compositing everything at
      // (0,0) on a frame-0-sized canvas corrupts exactly those files
      // (r7 ADVICE). Fall back to frame 0's extent if the descriptor is
      // absent/zero (malformed but decodable streams).
      val (sw, sh) = gifLogicalScreen(reader)
      // evenly spaced frame indices (always includes frame 0); decode
      // sequentially compositing deltas, keep only the sampled ones
      val want = (0 until math.min(n, total))
        .map(i => i.toLong * total / math.min(n, total)).map(_.toInt).toSet
      var canvas: java.awt.image.BufferedImage = null
      val out = Vector.newBuilder[Raster]
      for (i <- 0 until total if i <= want.max) {
        val frame = reader.read(i)
        val (fx, fy, disposal) = gifFrameMeta(reader, i)
        if (canvas == null) {
          val w = if (sw > 0) sw else fx + frame.getWidth
          val h = if (sh > 0) sh else fy + frame.getHeight
          canvas = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
        }
        // restore-to-previous frames revert the canvas AFTER display
        val snapshot =
          if (disposal == "restoreToPrevious") {
            val c = new java.awt.image.BufferedImage(canvas.getWidth,
              canvas.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = c.createGraphics()
            try g.drawImage(canvas, 0, 0, null) finally g.dispose()
            c
          } else null
        val g = canvas.createGraphics()
        try g.drawImage(frame, fx, fy, null) finally g.dispose()
        if (want.contains(i)) {
          val w = canvas.getWidth; val h = canvas.getHeight
          val px = canvas.getRGB(0, 0, w, h, null, 0, w)
          val rgb = new Array[Byte](w * h * 3)
          var j = 0
          while (j < px.length) {
            val p = px(j)
            rgb(j * 3) = ((p >> 16) & 0xff).toByte
            rgb(j * 3 + 1) = ((p >> 8) & 0xff).toByte
            rgb(j * 3 + 2) = (p & 0xff).toByte
            j += 1
          }
          out += Raster(w, h, rgb)
        }
        // disposal applies after the frame was shown: background-restore
        // clears the frame's RECT (to the canvas base color — this
        // renderer has no transparency channel, so background = black),
        // previous-restore reverts the whole canvas
        disposal match {
          case "restoreToBackgroundColor" =>
            val g2 = canvas.createGraphics()
            try {
              g2.setColor(java.awt.Color.BLACK)
              g2.fillRect(fx, fy, frame.getWidth, frame.getHeight)
            } finally g2.dispose()
          case "restoreToPrevious" =>
            val g2 = canvas.createGraphics()
            try g2.drawImage(snapshot, 0, 0, null) finally g2.dispose()
          case _ => () // none / doNotDispose: frame persists
        }
      }
      Some(out.result())
    } catch { case _: Exception => None }
    finally reader.dispose()
  }

  /** Logical screen (width, height) from the GIF stream metadata; (0,0)
    * when the descriptor is missing. */
  private def gifLogicalScreen(reader: javax.imageio.ImageReader): (Int, Int) =
    try {
      val root = reader.getStreamMetadata
        .getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val lsd = root.getElementsByTagName("LogicalScreenDescriptor")
      if (lsd.getLength == 0) (0, 0)
      else {
        val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
        (e.getAttribute("logicalScreenWidth").toInt,
          e.getAttribute("logicalScreenHeight").toInt)
      }
    } catch { case _: Exception => (0, 0) }

  /** Per-frame (left, top, disposalMethod) from the GIF image metadata;
    * ((0,0), "none") when absent. */
  private def gifFrameMeta(reader: javax.imageio.ImageReader,
                           i: Int): (Int, Int, String) =
    try {
      val root = reader.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val idn = root.getElementsByTagName("ImageDescriptor")
      val (x, y) =
        if (idn.getLength == 0) (0, 0)
        else {
          val e = idn.item(0).asInstanceOf[org.w3c.dom.Element]
          (e.getAttribute("imageLeftPosition").toInt,
            e.getAttribute("imageTopPosition").toInt)
        }
      val gce = root.getElementsByTagName("GraphicControlExtension")
      val disposal =
        if (gce.getLength == 0) "none"
        else gce.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute("disposalMethod")
      (x, y, disposal)
    } catch { case _: Exception => (0, 0, "none") }

  /** Decoded raster: width, height, packed RGB bytes (3 per pixel,
    * row-major). */
  final case class Raster(width: Int, height: Int, rgb: Array[Byte])

  /** Binary PPM (P6, maxval 255) decode. Accepts `#` comments and any
    * whitespace between header tokens, per the netpbm spec. Returns
    * None when the bytes are not a well-formed P6 image (callers fall
    * back to the stub path). */
  def decodePpm(bytes: Array[Byte]): Option[Raster] = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def nextToken(): Option[String] = {
      while (pos < bytes.length &&
        (isWs(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#') // comment runs to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      if (pos > start) Some(new String(bytes, start, pos - start, "US-ASCII"))
      else None
    }
    def nextInt(): Option[Int] = nextToken().flatMap(_.toIntOption)
    for {
      magic <- nextToken() if magic == "P6"
      w <- nextInt() if w > 0
      h <- nextInt() if h > 0
      maxval <- nextInt() if maxval == 255
      // exactly ONE whitespace byte separates the header from the data
      _ <- if (pos < bytes.length && isWs(bytes(pos))) { pos += 1; Some(()) }
           else None
      data <- {
        // Long arithmetic: a corrupt/hostile header like 65536×65536
        // wraps w*h*3 in Int (to 0 here) and would yield a corrupt
        // Raster that crashes downstream instead of the documented
        // None fallback
        val need = w.toLong * h * 3
        if (bytes.length - pos >= need)
          Some(java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt))
        else None
      }
    } yield Raster(w, h, data)
  }

  /** P6 encode — the write side of the round trip (tests, resize
    * output). */
  def encodePpm(r: Raster): Array[Byte] = {
    val header = s"P6\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + r.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(r.rgb, 0, out, header.length, r.rgb.length)
    out
  }

  /** Nearest-neighbor resize — a real resampler (the classic O(nw·nh)
    * kernel), not a feature shuffle. */
  def resizeNearest(r: Raster, nw: Int, nh: Int): Raster = {
    require(nw > 0 && nh > 0, s"resize target must be positive, got ${nw}x$nh")
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = y * r.height / nh
      var x = 0
      while (x < nw) {
        val sx = x * r.width / nw
        val si = (sy * r.width + sx) * 3
        val di = (y * nw + x) * 3
        out(di) = r.rgb(si); out(di + 1) = r.rgb(si + 1); out(di + 2) = r.rgb(si + 2)
        x += 1
      }
      y += 1
    }
    Raster(nw, nh, out)
  }

  /** Mean R, G, B per grid cell (grid × grid cells, row-major),
    * normalized to [0, 1] — a fixed-width 3·grid² feature vector. Cells
    * get the floor-partitioned pixel ranges, so any raster ≥ grid px a
    * side works. */
  def imageFeatures(r: Raster, grid: Int = 2): Array[Float] = {
    val out = new Array[Float](grid * grid * 3)
    val counts = new Array[Int](grid * grid)
    val sums = new Array[Long](grid * grid * 3)
    var y = 0
    while (y < r.height) {
      val cy = math.min(grid - 1, y * grid / r.height)
      var x = 0
      while (x < r.width) {
        val cx = math.min(grid - 1, x * grid / r.width)
        val cell = cy * grid + cx
        val si = (y * r.width + x) * 3
        sums(cell * 3) += r.rgb(si) & 0xff
        sums(cell * 3 + 1) += r.rgb(si + 1) & 0xff
        sums(cell * 3 + 2) += r.rgb(si + 2) & 0xff
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var c = 0
    while (c < grid * grid) {
      var ch = 0
      while (ch < 3) {
        out(c * 3 + ch) =
          if (counts(c) == 0) 0f
          else (sums(c * 3 + ch).toDouble / counts(c) / 255.0).toFloat
        ch += 1
      }
      c += 1
    }
    out
  }

  /** Raster as a palette-indexed image with its EXACT color table —
    * what the GIF writer needs: fed a direct-color image it derives
    * its own palette and (JDK quirk, reproduced on 17.0.20) miscolors
    * small images. >256 distinct colors falls back to direct color
    * and accepts the writer's quantization. */
  private def toIndexedImage(r: Raster): java.awt.image.BufferedImage = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[Int, Byte]
    var i = 0
    while (i < r.width * r.height && seen.size <= 256) {
      val p = ((r.rgb(i * 3) & 0xff) << 16) |
        ((r.rgb(i * 3 + 1) & 0xff) << 8) | (r.rgb(i * 3 + 2) & 0xff)
      if (!seen.contains(p)) seen(p) = seen.size.toByte
      i += 1
    }
    if (seen.size > 256) return toBufferedImage(r)
    val n = math.max(2, seen.size)
    val (rs, gs, bs) = (new Array[Byte](n), new Array[Byte](n), new Array[Byte](n))
    seen.foreach { case (p, idx) =>
      rs(idx & 0xff) = ((p >> 16) & 0xff).toByte
      gs(idx & 0xff) = ((p >> 8) & 0xff).toByte
      bs(idx & 0xff) = (p & 0xff).toByte
    }
    val icm = new java.awt.image.IndexColorModel(8, n, rs, gs, bs)
    val img = new java.awt.image.BufferedImage(r.width, r.height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = img.getRaster
    i = 0
    while (i < r.width * r.height) {
      val p = ((r.rgb(i * 3) & 0xff) << 16) |
        ((r.rgb(i * 3 + 1) & 0xff) << 8) | (r.rgb(i * 3 + 2) & 0xff)
      raster.setSample(i % r.width, i / r.width, 0, seen(p) & 0xff)
      i += 1
    }
    img
  }

  /** Animated-GIF encode from rasters (test fixture builder; exact for
    * ≤256 distinct colors per frame via an explicit palette). JDK
    * writer quirk (reproduced on 17.0.20): frames SMALLER than ~8×8
    * come back with corrupted trailing pixels — the LZW encoder, not
    * the reader, so fixtures must be ≥8×8; externally-produced GIFs
    * decode fine at any size. */
  def encodeGif(frames: Seq[Raster]): Array[Byte] =
    encodeGifFrames(frames.map(r => (r, 0, 0, "none")))

  /** [[encodeGif]] with explicit per-frame placement `(raster, left,
    * top, disposalMethod)` — builds OPTIMIZED-GIF fixtures: partial
    * delta frames at non-zero offsets with disposal semantics, the
    * common externally-produced shape [[gifFrames]] must composite
    * correctly (frame 0 should cover the screen so the writer derives
    * the right logical size). */
  def encodeGifFrames(frames: Seq[(Raster, Int, Int, String)]): Array[Byte] = {
    imageIoReady
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (r, x, y, disposal) =>
        val img = toIndexedImage(r)
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img),
          writer.getDefaultWriteParam)
        val fmt = "javax_imageio_gif_image_1.0"
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        def node(name: String): javax.imageio.metadata.IIOMetadataNode = {
          val ns = root.getElementsByTagName(name)
          if (ns.getLength > 0)
            ns.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          else {
            val n = new javax.imageio.metadata.IIOMetadataNode(name)
            root.appendChild(n)
            n
          }
        }
        val gce = node("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        val idn = node("ImageDescriptor")
        idn.setAttribute("imageLeftPosition", x.toString)
        idn.setAttribute("imageTopPosition", y.toString)
        idn.setAttribute("imageWidth", r.width.toString)
        idn.setAttribute("imageHeight", r.height.toString)
        idn.setAttribute("interlaceFlag", "FALSE")
        meta.setFromTree(fmt, root)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** RIFF/WAV PCM16 decode: walks the chunk list for `fmt ` (PCM,
    * 16-bit) and `data`, returns the interleaved samples. None for
    * anything else (compressed/float WAVs fall back to the stub). */
  def decodeWavPcm16(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var pos = 12
    var pcm16 = false
    var samples: Option[Array[Short]] = None
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = le32(bytes, pos + 4)
      // Long guard: a corrupt size near Int.MaxValue wraps pos+8+size
      // negative and would bypass the bounds check
      if (size < 0 || pos + 8L + size > bytes.length) return None
      if (id == "fmt " && size >= 16)
        pcm16 = le16(bytes, pos + 8) == 1 && le16(bytes, pos + 8 + 14) == 16
      else if (id == "data") {
        val n = size / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = le16(bytes, pos + 8 + i * 2).toShort
          i += 1
        }
        samples = Some(out)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (pcm16) samples else None
  }

  /** RMS energy per window (`nWin` equal slices), normalized by
    * Short.MaxValue — the standard fixed-width audio energy profile. */
  def audioFeatures(samples: Array[Short], nWin: Int = 8): Array[Float] = {
    val out = new Array[Float](nWin)
    if (samples.isEmpty) return out
    var w = 0
    while (w < nWin) {
      val from = (w.toLong * samples.length / nWin).toInt
      val until = ((w + 1).toLong * samples.length / nWin).toInt
      if (until > from) {
        var acc = 0.0
        var i = from
        while (i < until) { acc += samples(i).toDouble * samples(i); i += 1 }
        out(w) = (math.sqrt(acc / (until - from)) / 32768.0).toFloat
      }
      w += 1
    }
    out
  }

  /** True when the bytes are a RIFF AVI container. */
  def looksLikeAvi(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI "

  /**
   * REAL video-container frame extraction for MJPEG-in-AVI: the same
   * RIFF chunk walk as [[decodeWavPcm16]] (AVI is RIFF, recursing into
   * `LIST` chunks to reach `movi`) composed with the ImageIO JPEG
   * decode — each `##dc`/`##db` stream chunk whose payload starts with
   * a JPEG SOI marker is one compressed frame. Up to `n` evenly spaced
   * frames come back as [[Raster]]s; None for non-AVI bytes, corrupt
   * chunk lists, or streams with no decodable MJPEG frames (a DivX AVI
   * falls back to the stub path like any other compressed video).
   */
  def aviMjpegFrames(bytes: Array[Byte], n: Int): Option[Vector[Raster]] = {
    if (!looksLikeAvi(bytes) || n <= 0) return None
    val jpegs = Vector.newBuilder[Array[Byte]]
    def walk(from: Int, until: Int): Boolean = {
      var pos = from
      while (pos + 8 <= until) {
        val id = tag(bytes, pos)
        val size = le32(bytes, pos + 4)
        if (size < 0 || pos + 8L + size > until) return false // corrupt list
        if (id == "LIST" && size >= 4) {
          if (!walk(pos + 12, pos + 8 + size)) return false
        } else if ((id.endsWith("dc") || id.endsWith("db")) && size >= 3 &&
            (bytes(pos + 8) & 0xff) == 0xff && (bytes(pos + 9) & 0xff) == 0xd8) {
          jpegs += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      true
    }
    if (!walk(12, bytes.length)) return None
    val all = jpegs.result()
    if (all.isEmpty) return None
    val k = math.min(n, all.size)
    val picked = (0 until k).map(i => all((i.toLong * all.size / k).toInt))
    val decoded = picked.map(decodeImage)
    if (decoded.exists(_.isEmpty)) None
    else Some(decoded.map(_.get).toVector)
  }

  /** Minimal MJPEG AVI encode (test fixture builder): RIFF('AVI ') with
    * an `hdrl` header list (avih + one MJPG `strl`) and a `movi` list of
    * one `00dc` JPEG chunk per frame — the structure real muxers emit,
    * minus the optional seek index. */
  def encodeMjpegAvi(frames: Seq[Raster], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val jpegs = frames.map(encodeJpeg)
    val (w, h) = (frames.head.width, frames.head.height)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer
        .allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      out.array() // trailing pad byte (if any) stays zero
    }
    def list(listType: String, children: Seq[Array[Byte]]): Array[Byte] = {
      val body = children.foldLeft(listType.getBytes("US-ASCII")) {
        (acc, c) => acc ++ c
      }
      chunk("LIST", body)
    }
    def struct(n: Int)(fill: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      fill(b)
      b.array()
    }
    val avih = chunk("avih", struct(56) { b =>
      b.putInt(1000000 / fps) // µs per frame
        .putInt(0).putInt(0).putInt(0)
        .putInt(frames.size) // total frames
        .putInt(0).putInt(1) // streams
        .putInt(0).putInt(w).putInt(h)
    })
    val strh = chunk("strh", struct(56) { b =>
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0)
        .putInt(1).putInt(fps) // scale / rate
        .putInt(0).putInt(frames.size)
        .putInt(0).putInt(0).putInt(0)
    })
    val strf = chunk("strf", struct(40) { b =>
      b.putInt(40).putInt(w).putInt(h)
        .putShort(1).putShort(24)
        .put("MJPG".getBytes("US-ASCII"))
        .putInt(w * h * 3)
    })
    val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
    val movi = list("movi", jpegs.map(chunk("00dc", _)))
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    chunk("RIFF", riffBody)
  }

  // --- Compressed audio (round 8): G.711 and IMA ADPCM -----------------
  //
  // The "compressed audio is stubbed" boundary was too wide: two real
  // compressed-audio families are bit-exactly specified integer codecs
  // with public reference implementations (ITU-T G.711; IMA ADPCM from
  // the IMA Digital Audio Focus Group spec, the `0x11` WAV format) and
  // need no DSP library. Only perceptual codecs (MP3/AAC) remain out of
  // reach without a real decoder dependency.

  /** ITU-T G.711 mu-law expand: 8-bit codeword -> linear PCM16. */
  def mulawDecode(code: Int): Short = {
    val u = ~code & 0xff
    val t = ((((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7))
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** ITU-T G.711 mu-law compress (16-bit domain, pairs with
    * [[mulawDecode]]: `encode(decode(c)) == c` for every codeword but
    * negative zero 0x7f, which canonically re-encodes as 0xff). */
  def mulawEncode(sample: Short): Int = {
    var s = sample.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += 0x84
    var exp = 7
    while (exp > 0 && (s & (1 << (exp + 7))) == 0) exp -= 1
    val mant = (s >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** ITU-T G.711 a-law expand: 8-bit codeword -> linear PCM16. */
  def alawDecode(code: Int): Short = {
    val a = (code ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; t <<= seg - 1 }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** ITU-T G.711 a-law compress (16-bit domain, exact inverse of
    * [[alawDecode]] on all 256 codewords — a-law has no negative-zero
    * codeword, its smallest magnitude is 8). */
  def alawEncode(sample: Short): Int = {
    var s = sample.toInt
    val sign = if (s >= 0) 0x80 else { s = -s; 0 }
    if (s > 32635) s = 32635
    val compressed =
      if (s < 256) s >> 4
      else {
        var exp = 7
        while (exp > 1 && (s & (1 << (exp + 7))) == 0) exp -= 1
        (exp << 4) | ((s >> (exp + 3)) & 0x0f)
      }
    (compressed ^ sign ^ 0x55) & 0xff
  }

  /** IMA ADPCM quantizer step table (89 entries, from the IMA spec). */
  private val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA ADPCM step-index adjustment per 3-bit magnitude. */
  private val imaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM decode step: (pred, idx, nibble) -> (pred', idx').
    * Shared verbatim by decoder and encoder reconstruction, which is
    * what makes decode(encode(x)) bit-identical to the encoder's own
    * predicted signal. */
  private def imaStep(pred: Int, idx: Int, n: Int): (Int, Int) = {
    val step = imaStepTable(idx)
    var diff = step >> 3
    if ((n & 1) != 0) diff += step >> 2
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 4) != 0) diff += step
    val p = math.max(-32768, math.min(32767,
      if ((n & 8) != 0) pred - diff else pred + diff))
    val i = math.max(0, math.min(88, idx + imaIndexTable(n & 7)))
    (p, i)
  }

  /** Parsed `fmt ` chunk + `data` span + optional `fact` sample count. */
  private case class WavLayout(tag: Int, channels: Int, bits: Int,
                               blockAlign: Int, dataOff: Int, dataLen: Int,
                               factSamples: Int)

  private def wavLayout(bytes: Array[Byte]): Option[WavLayout] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    var fact = -1
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos + 8L + size > bytes.length) return None
      if (id == "fmt " && size >= 16)
        fmt = Some((le16(bytes, pos + 8), le16(bytes, pos + 8 + 2),
          le16(bytes, pos + 8 + 14), le16(bytes, pos + 8 + 12)))
      else if (id == "data") data = Some((pos + 8, size))
      else if (id == "fact" && size >= 4) fact = le32(bytes, pos + 8)
      pos += 8 + size + (size & 1)
    }
    for ((t, ch, bits, ba) <- fmt; (off, len) <- data)
      yield WavLayout(t, ch, bits, ba, off, len, fact)
  }

  /**
   * WAV audio decode with REAL decompression (round 8): linear PCM16
   * out of PCM16 (format tag 1), G.711 a-law (6) / mu-law (7) — the
   * 2:1 telephony log-PCM codecs — and mono IMA ADPCM (0x11), the 4:1
   * predictive nibble codec (per-block predictor/step-index header,
   * low nibble first). None for anything else: perceptual codecs
   * (MP3/AAC) genuinely need a DSP decoder the JVM does not ship, and
   * those bytes keep the deterministic stub fallback.
   */
  def decodeWavAudio(bytes: Array[Byte]): Option[Array[Short]] =
    wavLayout(bytes).flatMap { w =>
      w.tag match {
        case 1 if w.bits == 16 =>
          val n = w.dataLen / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = le16(bytes, w.dataOff + i * 2).toShort; i += 1 }
          Some(out)
        case 6 | 7 =>
          val out = new Array[Short](w.dataLen)
          val mu = w.tag == 7
          var i = 0
          while (i < w.dataLen) {
            val c = bytes(w.dataOff + i) & 0xff
            out(i) = if (mu) mulawDecode(c) else alawDecode(c)
            i += 1
          }
          Some(out)
        case 0x11 if w.channels == 1 && w.blockAlign >= 5 =>
          val perBlock = 1 + (w.blockAlign - 4) * 2
          val builder = Array.newBuilder[Short]
          var blk = 0
          while ((blk + 1) * w.blockAlign <= w.dataLen) {
            val off = w.dataOff + blk * w.blockAlign
            var pred = le16(bytes, off).toShort.toInt
            var idx = math.max(0, math.min(88, bytes(off + 2) & 0xff))
            builder += pred.toShort
            var s = 1
            while (s < perBlock) {
              val b = bytes(off + 4 + (s - 1) / 2) & 0xff
              val nib = if ((s - 1) % 2 == 0) b & 0x0f else b >> 4
              val (p, i) = imaStep(pred, idx, nib)
              pred = p; idx = i
              builder += pred.toShort
              s += 1
            }
            blk += 1
          }
          val all = builder.result()
          // `fact` records the true sample count (the final block may
          // be logically short even though physically full-size)
          Some(if (w.factSamples >= 0 && w.factSamples < all.length)
            all.take(w.factSamples) else all)
        case _ => None
      }
    }

  /** G.711 WAV encode (test fixture builder; mono, tag 6/7). */
  def encodeWavG711(samples: Array[Short], mulaw: Boolean,
                    sampleRate: Int = 8000): Array[Byte] = {
    val data = samples.map(s =>
      (if (mulaw) mulawEncode(s) else alawEncode(s)).toByte)
    val pad = data.length & 1
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + 4 + 8 +
        data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + 18 + 8 + 4 + 8 + data.length + pad)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(if (mulaw) 7 else 6).putShort(1)
      .putInt(sampleRate).putInt(sampleRate)
      .putShort(1).putShort(8).putShort(0)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    out.array()
  }

  /**
   * IMA ADPCM WAV encode (test fixture builder; mono, tag 0x11).
   * Returns the container bytes AND the encoder's own reconstructed
   * signal — ADPCM is lossy, but the decoder tracks the encoder's
   * predictor exactly, so `decodeWavAudio(bytes) == reconstruction`
   * bit-for-bit is the codec's correctness contract.
   */
  def encodeWavImaAdpcm(samples: Array[Short], blockAlign: Int = 256,
                        sampleRate: Int = 8000): (Array[Byte], Array[Short]) = {
    require(blockAlign >= 5, "blockAlign must fit the 4-byte header")
    val perBlock = 1 + (blockAlign - 4) * 2
    val nBlocks = (samples.length + perBlock - 1) / perBlock
    val data = new Array[Byte](nBlocks * blockAlign)
    val recon = new Array[Short](nBlocks * perBlock)
    var idx = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * perBlock
      val off = blk * blockAlign
      // header: predictor = first sample of the block, current index
      var pred: Int = samples(math.min(base, samples.length - 1)).toInt
      data(off) = (pred & 0xff).toByte
      data(off + 1) = ((pred >> 8) & 0xff).toByte
      data(off + 2) = idx.toByte
      recon(base) = pred.toShort
      var s = 1
      while (s < perBlock) {
        // past the input, encode silence continuation (delta to 0)
        val target: Int =
          if (base + s < samples.length) samples(base + s).toInt else 0
        val step = imaStepTable(idx)
        var delta = target - pred
        var nib = 0
        if (delta < 0) { nib = 8; delta = -delta }
        if (delta >= step) { nib |= 4; delta -= step }
        if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
        if (delta >= (step >> 2)) { nib |= 1 }
        val (p, i) = imaStep(pred, idx, nib)
        pred = p; idx = i
        recon(base + s) = pred.toShort
        val bytePos = off + 4 + (s - 1) / 2
        if ((s - 1) % 2 == 0) data(bytePos) = (nib & 0x0f).toByte
        else data(bytePos) = (data(bytePos) | (nib << 4)).toByte
        s += 1
      }
      blk += 1
    }
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 +
        data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + 20 + 8 + 4 + 8 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / perBlock)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(perBlock.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    (out.array(), recon.take(samples.length))
  }

  /** WAV PCM16 mono encode (test fixture builder). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }

  // --- Container metadata probe (round 9) ------------------------------
  //
  // Sample DECODE for perceptual codecs (MP3/AAC payloads, inter-frame
  // video) is out of reach without codec libraries — but their container
  // METADATA is plain public-spec byte arithmetic. At 100 TB that is the
  // difference between "opaque blob" and "filterable row": duration,
  // codec, sample-rate, and channel facts let a pipeline select/bucket/
  // price media WITHOUT paying decode, and they are exactly what the
  // stub boundary does not need. Frame walks are O(frames) over the
  // byte array with constant memory — mapPartitions-safe.

  /** Codec/container facts read from headers only — no sample decode.
    * `durationMs` is computed from frame/sample counts; -1 fields mean
    * "not applicable" (e.g. channels for a video container). */
  final case class MediaInfo(container: String, codec: String,
    sampleRate: Int, channels: Int, durationMs: Long, frames: Long,
    tracks: Int)

  /** MPEG-1/2/2.5 Layer III header walk (ID3v2 skipped): per-frame
    * bitrate tables from the public spec, so VBR durations accumulate
    * exactly. None unless at least one valid frame parses. */
  def mp3Info(bytes: Array[Byte]): Option[MediaInfo] = {
    var pos = 0
    // ID3v2: "ID3" + version(2) + flags + 28-bit syncsafe size; the size
    // excludes the 10-byte header AND, when the footer flag (bit 4 of the
    // flags byte, ID3v2.4) is set, the 10-byte footer after the tag
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      pos = 10 + (((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f))
      if ((bytes(5) & 0x10) != 0) pos += 10
      // Resync: tolerate tag padding / a mis-stated tag size by scanning
      // forward for the next frame sync word (11 set bits) instead of
      // hard-failing at an unlucky offset. Only after an ID3 tag — an
      // untagged stream must still sync at byte 0, or a whole-file scan
      // would let arbitrary binaries masquerade as MP3.
      while (pos + 1 < bytes.length &&
          !((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xe0) == 0xe0))
        pos += 1
    }
    val brMpeg1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    val brMpeg2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    val srMpeg1 = Array(44100, 48000, 32000, 0)
    var frames = 0L
    var durUs = 0.0
    var sr0 = 0
    var ch0 = 0
    var version0 = ""
    var ok = true
    while (ok && pos + 4 <= bytes.length) {
      val b1 = bytes(pos) & 0xff; val b2 = bytes(pos + 1) & 0xff
      val b3 = bytes(pos + 2) & 0xff; val b4 = bytes(pos + 3) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) ok = false
      else {
        val verBits = (b2 >> 3) & 3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layerBits = (b2 >> 1) & 3 // 1 = Layer III
        val brIdx = (b3 >> 4) & 15
        val srIdx = (b3 >> 2) & 3
        val padding = (b3 >> 1) & 1
        if (layerBits != 1 || verBits == 1 || srIdx == 3 ||
            brIdx == 0 || brIdx == 15) ok = false
        else {
          val mpeg1 = verBits == 3
          val kbps = (if (mpeg1) brMpeg1 else brMpeg2)(brIdx)
          val sr = verBits match {
            case 3 => srMpeg1(srIdx)
            case 2 => srMpeg1(srIdx) / 2
            case _ => srMpeg1(srIdx) / 4
          }
          val samplesPerFrame = if (mpeg1) 1152 else 576
          val frameLen = samplesPerFrame / 8 * kbps * 1000 / sr + padding
          if (frameLen <= 4 || pos + frameLen > bytes.length) ok = false
          else {
            if (frames == 0) {
              sr0 = sr
              ch0 = if (((b4 >> 6) & 3) == 3) 1 else 2
              version0 = verBits match {
                case 3 => "mpeg1-layer3"
                case 2 => "mpeg2-layer3"
                case _ => "mpeg2.5-layer3"
              }
            }
            frames += 1
            durUs += samplesPerFrame * 1e6 / sr
            pos += frameLen
          }
        }
      }
    }
    if (frames == 0) None
    else Some(MediaInfo("mp3", version0, sr0, ch0,
      math.round(durUs / 1000), frames, 1))
  }

  /** ADTS AAC header walk: 1024 samples per frame, frame length from the
    * 13-bit header field. None unless at least one valid frame parses. */
  def adtsInfo(bytes: Array[Byte]): Option[MediaInfo] = {
    val srTable = Array(96000, 88200, 64000, 48000, 44100, 32000, 24000,
      22050, 16000, 12000, 11025, 8000, 0, 0, 0, 0)
    var pos = 0
    var frames = 0L
    var sr0 = 0
    var ch0 = 0
    var ok = true
    while (ok && pos + 7 <= bytes.length) {
      val b1 = bytes(pos) & 0xff; val b2 = bytes(pos + 1) & 0xff
      if (b1 != 0xff || (b2 & 0xf6) != 0xf0) ok = false
      else {
        val srIdx = (bytes(pos + 2) >> 2) & 15
        val ch = ((bytes(pos + 2) & 1) << 2) | ((bytes(pos + 3) >> 6) & 3)
        val frameLen = ((bytes(pos + 3) & 3) << 11) |
          ((bytes(pos + 4) & 0xff) << 3) | ((bytes(pos + 5) >> 5) & 7)
        if (srTable(srIdx) == 0 || frameLen < 7 ||
            pos + frameLen > bytes.length) ok = false
        else {
          if (frames == 0) { sr0 = srTable(srIdx); ch0 = ch }
          frames += 1
          pos += frameLen
        }
      }
    }
    if (frames == 0) None
    else Some(MediaInfo("aac-adts", "aac", sr0, ch0,
      math.round(frames * 1024 * 1000.0 / sr0), frames, 1))
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** ISO BMFF (MP4/MOV) box walk: `ftyp` major brand, `moov/mvhd`
    * timescale+duration (v0 and v1), `trak` count. Codec naming would
    * need `stsd` per track; the brand is the honest container-level
    * answer. */
  def mp4Info(bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 12 || tag(bytes, 4) != "ftyp") return None
    var brand = "mp4"
    var timescale = 0L
    var duration = -1L
    var tracks = 0
    def walk(from: Long, until: Long): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        var size = be32(bytes, pos.toInt)
        val boxType = tag(bytes, pos.toInt + 4)
        var header = 8L
        if (size == 1 && pos + 16 <= until) { // 64-bit largesize
          size = (be32(bytes, pos.toInt + 8) << 32) | be32(bytes, pos.toInt + 12)
          header = 16L
        } else if (size == 0) size = until - pos // box runs to end
        if (size < header || pos + size > until) return // corrupt: stop
        boxType match {
          case "ftyp" if size >= header + 4 =>
            brand = tag(bytes, (pos + header).toInt).trim
          case "moov" => walk(pos + header, pos + size)
          case "trak" => tracks += 1
          case "mvhd" if size >= header + 4 =>
            val v = bytes((pos + header).toInt) & 0xff
            if (v == 1 && size >= header + 4 + 16 + 12) {
              timescale = be32(bytes, (pos + header + 20).toInt)
              duration = (be32(bytes, (pos + header + 24).toInt) << 32) |
                be32(bytes, (pos + header + 28).toInt)
            } else if (v == 0 && size >= header + 4 + 8 + 8) {
              timescale = be32(bytes, (pos + header + 12).toInt)
              duration = be32(bytes, (pos + header + 16).toInt)
            }
          case _ => ()
        }
        pos += size
      }
    }
    walk(0, bytes.length.toLong)
    if (timescale <= 0) None
    else Some(MediaInfo("mp4", brand, -1, -1,
      duration * 1000 / timescale, -1, tracks))
  }

  /** RIFF/WAV `fmt ` facts + `data` size → duration via byte rate;
    * covers the compressed WAV variants ([[mulawDecode]] family) too. */
  def wavInfo(bytes: Array[Byte]): Option[MediaInfo] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var pos = 12
    var codec = ""
    var sr = 0
    var ch = 0
    var byteRate = 0
    var dataLen = -1L
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos + 8L + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        codec = le16(bytes, pos + 8) match {
          case 1 => "pcm"
          case 6 => "g711-alaw"
          case 7 => "g711-mulaw"
          case 0x11 => "ima-adpcm"
          case other => s"wav-0x${other.toHexString}"
        }
        ch = le16(bytes, pos + 10)
        sr = le32(bytes, pos + 12)
        byteRate = le32(bytes, pos + 16)
      } else if (id == "data") dataLen = size.toLong
      pos += 8 + size + (size & 1)
    }
    if (codec.isEmpty || dataLen < 0 || byteRate <= 0) None
    else Some(MediaInfo("wav", codec, sr, ch,
      dataLen * 1000 / byteRate, -1, 1))
  }

  /** AVI `avih` facts: µs-per-frame × total frames → duration; stream
    * count from the main header; codec from the first `strh` handler. */
  def aviInfo(bytes: Array[Byte]): Option[MediaInfo] = {
    if (!looksLikeAvi(bytes)) return None
    var usPerFrame = 0L
    var totalFrames = 0L
    var streams = 0
    var codec = "avi"
    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        val id = tag(bytes, pos)
        val size = le32(bytes, pos + 4)
        if (size < 0 || pos + 8L + size > until) return
        if (id == "LIST") walk(pos + 12, pos + 8 + size)
        else if (id == "avih" && size >= 28) {
          usPerFrame = le32(bytes, pos + 8).toLong & 0xffffffffL
          totalFrames = le32(bytes, pos + 24).toLong & 0xffffffffL
          streams = le32(bytes, pos + 32)
        } else if (id == "strh" && size >= 8 && codec == "avi")
          codec = tag(bytes, pos + 12).trim.toLowerCase
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    if (usPerFrame <= 0) None
    else Some(MediaInfo("avi", codec, -1, -1,
      usPerFrame * totalFrames / 1000, totalFrames, streams))
  }

  /** Magic-byte dispatch over every container this object understands —
    * the metadata face of [[graft.multimodal.MediaPipeline.decodeFeaturesAuto]]'s
    * decode dispatch. */
  def probeInfo(bytes: Array[Byte]): Option[MediaInfo] =
    if (bytes == null || bytes.length < 4) None
    else if (tag(bytes, 0) == "RIFF" && bytes.length >= 12 && tag(bytes, 8) == "WAVE")
      wavInfo(bytes)
    else if (looksLikeAvi(bytes)) aviInfo(bytes)
    else if (bytes.length >= 12 && tag(bytes, 4) == "ftyp") mp4Info(bytes)
    else mp3Info(bytes).orElse(adtsInfo(bytes))
}
