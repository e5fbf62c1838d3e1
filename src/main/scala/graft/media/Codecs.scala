package graft.media

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs — the real bodies behind the multimodal column
  * family (no native image/audio libraries ship in this environment, so
  * the formats are the ones a JVM can en/decode from spec alone):
  *
  *   - PPM P6 (binary RGB, ASCII header with comment support)
  *   - BMP (24-bit uncompressed BI_RGB; bottom-up AND top-down rows,
  *     4-byte row padding)
  *   - WAV (RIFF PCM 16-bit mono/LE, chunk-walking parser that skips
  *     unknown chunks like LIST/INFO)
  *   - GFV1, a trivial length-prefixed frame container standing in for a
  *     video demuxer (each frame is a complete PPM blob)
  *
  * plus nearest-neighbor resize over decoded RGB. Everything is a pure
  * function over byte arrays, serializable to executors by construction.
  * The reference treats media payloads as opaque dimension blobs
  * (`pdal/DimType.hpp` raw byte dims); codec parity has no reference
  * analog — these exist for the training-data pipeline surface.
  */
object Codecs {

  // ---------------------------------------------------------------- PPM

  /** P6 PPM: `P6\n<w> <h>\n255\n` + w*h*3 RGB bytes. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodePpm: need w*h*3 = ${w * h * 3} bytes, got ${rgb.length}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Minimal-but-correct P6 parser: magic, then three whitespace- or
    * comment-separated ints (w, h, maxval), ONE whitespace byte, then
    * the raster. Returns (w, h, rgb top-down row-major). */
  def decodePpm(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(b != null && b.length > 2 && b(0) == 'P' && b(1) == '6',
      "decodePpm: not a P6 PPM")
    var i = 2
    def skip(): Unit = {
      var go = true
      while (go && i < b.length) b(i) match {
        case ' ' | '\n' | '\r' | '\t' => i += 1
        case '#' => while (i < b.length && b(i) != '\n') i += 1
        case _ => go = false
      }
    }
    def readInt(): Int = {
      skip()
      require(i < b.length && b(i) >= '0' && b(i) <= '9',
        s"decodePpm: expected digit at byte $i")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    require(maxv == 255, s"decodePpm: only maxval 255 supported (got $maxv)")
    i += 1 // exactly one whitespace byte separates header from raster
    val need = w * h * 3
    require(b.length - i >= need,
      s"decodePpm: raster truncated (need $need, have ${b.length - i})")
    (w, h, java.util.Arrays.copyOfRange(b, i, i + need))
  }

  // ---------------------------------------------------------------- BMP

  /** 24-bit uncompressed BMP: 14-byte file header + 40-byte info header,
    * rows stored bottom-up in BGR order, each padded to 4 bytes. Input
    * rgb is top-down row-major RGB (the decode-side convention). */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeBmp: need w*h*3 = ${w * h * 3} bytes, got ${rgb.length}")
    val rowSize = (w * 3 + 3) & ~3
    val dataSize = rowSize * h
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        bb.put(rgb(o + 2)).put(rgb(o + 1)).put(rgb(o))
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Decodes 24-bit BI_RGB BMPs, honoring the data offset in the file
    * header (palette-less files written by other tools may still carry
    * gap bytes), row padding, and the negative-height top-down variant.
    * Returns (w, h, rgb top-down row-major). */
  def decodeBmp(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(b != null && b.length >= 54 && b(0) == 'B' && b(1) == 'M',
      "decodeBmp: not a BMP")
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val w = bb.getInt(18)
    val hRaw = bb.getInt(22)
    val bpp = bb.getShort(28)
    val comp = bb.getInt(30)
    require(bpp == 24 && comp == 0,
      s"decodeBmp: only 24-bit uncompressed supported (bpp=$bpp comp=$comp)")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"decodeBmp: bad dims ${w}x$hRaw")
    val rowSize = (w * 3 + 3) & ~3
    require(b.length >= dataOff + rowSize * h, "decodeBmp: raster truncated")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val ro = dataOff + srcRow * rowSize
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        out(o) = b(ro + x * 3 + 2)
        out(o + 1) = b(ro + x * 3 + 1)
        out(o + 2) = b(ro + x * 3)
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Dispatch on magic bytes: P6 PPM and BM BMP go to the hand-rolled
    * spec decoders; PNG / JPEG / GIF / TIFF go to the JDK's own
    * `javax.imageio` (pure-JVM, no native codec libraries — the readers
    * ship in the JDK's imageio module). GIF's "GIF8" magic is checked to
    * three bytes so it cannot collide with the GFV1 video container. */
  def decodeImage(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(b != null && b.length >= 4, "decodeImage: empty blob")
    if (b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P') decodeImageIO(b, "PNG")
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) decodeImageIO(b, "JPEG")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') decodeImageIO(b, "GIF")
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42) ||
             (b(0) == 'M' && b(1) == 'M' && b(3) == 42)) decodeImageIO(b, "TIFF")
    else throw new IllegalArgumentException(
      s"decodeImage: unknown magic 0x${(b(0) & 0xFF).toHexString}${(b(1) & 0xFF).toHexString}")
  }

  // ------------------------------------------------- ImageIO (pure JDK)

  /** Encode top-down row-major RGB via `javax.imageio` — fmt is any
    * writer the JDK registers (png, jpg, gif, tiff, bmp). PNG and TIFF
    * round-trip RGB losslessly; JPEG is lossy and GIF palettizes, so
    * exact-sum oracles only apply to the lossless members (the q114-style
    * gate encodes that split explicitly). Pure JVM: the ImageIO plugins
    * used here live in the JDK's java.desktop/imageio module, no native
    * codec jar involved. */
  def encodeImageIO(fmt: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeImageIO: need w*h*3 = ${w * h * 3} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((rgb(i * 3) & 0xFF) << 16) | ((rgb(i * 3 + 1) & 0xFF) << 8) |
        (rgb(i * 3 + 2) & 0xFF)
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, fmt, bos)
    require(ok, s"encodeImageIO: no ImageIO writer for '$fmt'")
    bos.toByteArray
  }

  /** Decode via `javax.imageio` to (w, h, top-down row-major RGB). */
  def decodeImageIO(b: Array[Byte], what: String): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    require(img != null, s"decodeImageIO: ImageIO could not parse $what blob")
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < px.length) {
      out(i * 3) = ((px(i) >> 16) & 0xFF).toByte
      out(i * 3 + 1) = ((px(i) >> 8) & 0xFF).toByte
      out(i * 3 + 2) = (px(i) & 0xFF).toByte
      i += 1
    }
    (w, h, out)
  }

  // ---------------------------------------------------------------- WAV

  /** RIFF/WAVE, PCM 16-bit mono little-endian: canonical 44-byte header
    * + samples. */
  def encodeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    require(rate > 0, s"encodeWav: bad rate $rate")
    val dataSize = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Chunk-walking parser: skips unknown chunks (LIST, fact, cue, ...)
    * with word alignment, requires PCM(1)/mono/16-bit, returns
    * (sampleRate, samples). */
  def decodeWav(b: Array[Byte]): (Int, Array[Short]) = {
    require(b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E',
      "decodeWav: not a RIFF/WAVE")
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var i = 12
    var rate = -1
    var samples: Array[Short] = null
    while (i + 8 <= b.length && (rate < 0 || samples == null)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = bb.getInt(i + 4)
      require(size >= 0 && i + 8 + size <= b.length,
        s"decodeWav: chunk '$id' overruns the file")
      if (id == "fmt ") {
        val fmt = bb.getShort(i + 8)
        val ch = bb.getShort(i + 10)
        rate = bb.getInt(i + 12)
        val bits = bb.getShort(i + 22)
        require(fmt == 1 && ch == 1 && bits == 16,
          s"decodeWav: only PCM/mono/16-bit supported (fmt=$fmt ch=$ch bits=$bits)")
      } else if (id == "data") {
        require(rate > 0, "decodeWav: data chunk before fmt chunk")
        val n = size / 2
        samples = new Array[Short](n)
        var j = 0
        while (j < n) { samples(j) = bb.getShort(i + 8 + j * 2); j += 1 }
      }
      i += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(samples != null, "decodeWav: no data chunk")
    (rate, samples)
  }

  // -------------------------------------------------------- GFV1 video

  /** GFV1 frame container: magic "GFV1", LE int32 frame count, then per
    * frame an LE int32 length + that many bytes (a complete PPM blob).
    * A stand-in demuxer with the access pattern a real one has: frame k
    * is reachable only by walking the k-1 preceding frame headers. */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "encodeVideo: no frames")
    val total = 8 + frames.map(4 + _.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GFV1".getBytes("US-ASCII")).putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  def videoFrameCount(b: Array[Byte]): Int = {
    require(b != null && b.length >= 8 && b(0) == 'G' && b(1) == 'F' &&
      b(2) == 'V' && b(3) == '1', "videoFrameCount: not a GFV1 container")
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getInt(4)
  }

  /** Extract frame k (0-based) by walking the length prefixes. */
  def decodeVideoFrame(b: Array[Byte], k: Int): Array[Byte] = {
    val n = videoFrameCount(b)
    require(k >= 0 && k < n, s"decodeVideoFrame: frame $k of $n")
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    var i = 8
    var f = 0
    // every hop is validated so a corrupt container (negative or
    // oversized length prefix) fails with the codec family's loud
    // IllegalArgumentException, not an IndexOutOfBounds or a
    // mispositioned read inside a later frame
    while (f <= k) {
      require(i + 4 <= b.length,
        s"decodeVideoFrame: frame $f header overruns file")
      val len = bb.getInt(i)
      require(len >= 0 && i + 4 + len <= b.length,
        s"decodeVideoFrame: frame $f length $len overruns file")
      if (f == k)
        return java.util.Arrays.copyOfRange(b, i + 4, i + 4 + len)
      i += 4 + len
      f += 1
    }
    throw new IllegalStateException("unreachable")
  }

  // ------------------------------------------------------------ resize

  /** Nearest-neighbor resize over decoded top-down RGB: source pixel of
    * target (x, y) is (floor(x*w/tw), floor(y*h/th)) — the floor-index
    * mapping an oracle can recompute with integer division. */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
      tw: Int, th: Int): Array[Byte] = {
    require(rgb.length == w * h * 3 && tw > 0 && th > 0,
      "resizeNearest: bad dims")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * w / tw).toInt
        val so = (sy * w + sx) * 3
        val o = (y * tw + x) * 3
        out(o) = rgb(so); out(o + 1) = rgb(so + 1); out(o + 2) = rgb(so + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
