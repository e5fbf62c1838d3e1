package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.media.{Codecs, Multimodal}

/** Pure-JVM codec round trips + the decode-side feature pass. */
class MediaCodecsSpec extends AnyFunSuite {
  import TestSpark._

  private def rgbOf(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((seed * 31 + i * 7) & 0xFF).toByte)

  test("PPM P6 round trip, comment-bearing header, truncation rejected") {
    val rgb = rgbOf(13, 7, 3)
    val enc = Codecs.encodePpm(13, 7, rgb)
    val (w, h, dec) = Codecs.decodePpm(enc)
    assert(w == 13 && h == 7 && dec.sameElements(rgb))
    // a header with comments (emitted by many tools) must parse
    val commented = ("P6\n# made by a tool\n13 # width\n7\n255\n"
      .getBytes("US-ASCII")) ++ rgb
    val (w2, h2, dec2) = Codecs.decodePpm(commented)
    assert(w2 == 13 && h2 == 7 && dec2.sameElements(rgb))
    intercept[IllegalArgumentException](
      Codecs.decodePpm(enc.take(enc.length - 1)))
    intercept[IllegalArgumentException](Codecs.decodePpm("P3\n".getBytes))
  }

  test("BMP round trip with row padding; top-down variant; truncation") {
    // w=5 -> row 15 bytes padded to 16: the padding path is exercised
    for ((w, h) <- Seq((5, 4), (4, 3), (1, 1), (17, 9))) {
      val rgb = rgbOf(w, h, w * 100 + h)
      val enc = Codecs.encodeBmp(w, h, rgb)
      val (dw, dh, dec) = Codecs.decodeBmp(enc)
      assert(dw == w && dh == h, s"dims for ${w}x$h")
      assert(dec.sameElements(rgb), s"pixels for ${w}x$h (padding/row order)")
    }
    // top-down BMP (negative height) decodes without the flip
    val rgb = rgbOf(5, 4, 9)
    val enc = Codecs.encodeBmp(5, 4, rgb)
    val bb = java.nio.ByteBuffer.wrap(enc).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -4) // height := -4 (top-down)
    // stored rows are bottom-up of rgb; reading them top-down yields the
    // vertical mirror
    val (_, _, dec) = Codecs.decodeBmp(enc)
    val mirrored = (0 until 4).flatMap(y =>
      rgb.slice((3 - y) * 5 * 3, (4 - y) * 5 * 3)).toArray
    assert(dec.sameElements(mirrored))
    intercept[IllegalArgumentException](Codecs.decodeBmp(enc.take(53)))
  }

  test("WAV PCM16 round trip; unknown chunks skipped; malformed rejected") {
    val samples = Array.tabulate(301)(i => ((i * 173) % 4096 - 2048).toShort)
    val enc = Codecs.encodeWav(16000, samples)
    val (rate, dec) = Codecs.decodeWav(enc)
    assert(rate == 16000 && dec.sameElements(samples))
    // splice an odd-sized LIST chunk between fmt and data: the walker
    // must skip it with word alignment
    val head = enc.take(36) // RIFF header + fmt chunk
    val tail = enc.drop(36) // data chunk
    val junk = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5, 0)).array()
    val spliced = head ++ junk ++ tail
    val (rate2, dec2) = Codecs.decodeWav(spliced)
    assert(rate2 == 16000 && dec2.sameElements(samples))
    intercept[IllegalArgumentException](Codecs.decodeWav("RIFFxxxx".getBytes))
  }

  test("GFV1 container: frame extraction walks preceding frames") {
    val frames = (0 until 5).map(k => Codecs.encodePpm(3, 2, rgbOf(3, 2, k)))
    val v = Codecs.encodeVideo(frames)
    assert(Codecs.videoFrameCount(v) == 5)
    for (k <- 0 until 5)
      assert(Codecs.decodeVideoFrame(v, k).sameElements(frames(k)), s"frame $k")
    intercept[IllegalArgumentException](Codecs.decodeVideoFrame(v, 5))
  }

  test("nearest-neighbor resize matches the floor-index mapping exactly") {
    val (w, h) = (10, 6)
    val rgb = rgbOf(w, h, 4)
    val out = Codecs.resizeNearest(w, h, rgb, 4, 3)
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3) {
      val sy = y * h / 3; val sx = x * w / 4
      assert(out((y * 4 + x) * 3 + c) == rgb((sy * w + sx) * 3 + c))
    }
    // identity resize is a no-op
    assert(Codecs.resizeNearest(w, h, rgb, w, h).sameElements(rgb))
  }

  test("synthRealMedia -> decodeFeatures: decoded sums equal the closed-" +
      "form payload arithmetic for all three kinds and both image formats") {
    import spark.implicits._
    val ids = spark.range(0, 60).select(col("id").as("n"),
      when(col("id") % 3 === 0, "image")
        .when(col("id") % 3 === 1, "audio").otherwise("video").as("kind"))
    val media = Multimodal.synthRealMedia(spark, ids)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 60)
    feats.foreach { r =>
      val n = r.getString(0).stripPrefix("m/").toLong
      val kind = r.getString(1)
      val w = (16 + n % 17).toInt; val h = (16 + (n / 8) % 13).toInt
      kind match {
        case "image" =>
          val cnt = w * h * 3
          val exp = (0 until cnt).map(i => (n * 7 + i) % 256)
          assert(r.getInt(2) == w && r.getInt(3) == h)
          assert(r.getLong(4) == cnt)
          assert(r.getLong(5) == exp.sum)
          assert(r.getLong(6) == exp.zipWithIndex.map { case (v, i) => i * v }.sum)
          val rexp = for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
            yield (n * 7 + ((y * h / 6) * w + (x * w / 8)) * 3 + c) % 256
          assert(r.getLong(7) == rexp.sum)
        case "audio" =>
          val ns = (256 + n % 200).toInt
          val exp = (0 until ns).map(i => (n * 13 + i * 17) % 4096 - 2048)
          assert(r.getLong(4) == ns && r.getLong(5) == exp.sum)
          assert(r.isNullAt(7))
        case "video" =>
          val nf = (2 + n % 4).toInt
          val cnt = w * h * 3
          val exp = (0 until cnt).map(i => (n * 7 + (nf - 1) * 101 + i) % 256)
          assert(r.getLong(5) == exp.sum,
            s"video n=$n last-frame sum (demuxer must skip ${nf - 1} frames)")
      }
    }
  }

  test("corrupt GFV1 containers fail loudly, never misposition a read") {
    val f0 = Codecs.encodePpm(4, 3, rgbOf(4, 3, 1))
    val good = Codecs.encodeVideo(Seq(f0, f0))
    // negative length prefix on frame 0
    val neg = good.clone()
    val bb = java.nio.ByteBuffer.wrap(neg)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(8, -5)
    intercept[IllegalArgumentException](Codecs.decodeVideoFrame(neg, 1))
    // oversized length prefix walks past the file end
    val big = good.clone()
    java.nio.ByteBuffer.wrap(big).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(8, good.length * 2)
    intercept[IllegalArgumentException](Codecs.decodeVideoFrame(big, 1))
    // truncated mid-header
    intercept[IllegalArgumentException](
      Codecs.decodeVideoFrame(good.take(10), 1))
  }

  test("ImageIO tier: PNG/TIFF round-trip RGB exactly; JPEG decodes to " +
      "bounded error; GIF/dispatch; unknown magic still rejected") {
    val w = 33; val h = 29
    val rgb = rgbOf(w, h, 5)
    for (fmt <- Seq("png", "tiff")) {
      val enc = Codecs.encodeImageIO(fmt, w, h, rgb)
      val (dw, dh, dec) = Codecs.decodeImage(enc) // magic-byte dispatch
      assert(dw == w && dh == h && dec.sameElements(rgb), s"$fmt lossless")
    }
    // JPEG: dims exact, pixels within a useful fidelity bound. The test
    // pattern is deliberately high-frequency (+7 per byte), so default-
    // quality 4:2:0 chroma subsampling costs ~15 mean abs error; an
    // uncorrelated decode would read ~85 — the bound separates "real
    // lossy decode" from "garbage" with a 4x margin.
    val jenc = Codecs.encodeImageIO("jpg", w, h, rgb)
    val (jw, jh, jdec) = Codecs.decodeImage(jenc)
    assert(jw == w && jh == h && jdec.length == rgb.length)
    val meanErr = rgb.zip(jdec)
      .map { case (a, b) => math.abs((a & 0xFF) - (b & 0xFF)) }.sum.toDouble /
      rgb.length
    assert(meanErr < 21.0, s"JPEG mean abs error $meanErr")
    // GIF palettizes: dims + count exact
    val genc = Codecs.encodeImageIO("gif", w, h, rgb)
    val (gw, gh, gdec) = Codecs.decodeImage(genc)
    assert(gw == w && gh == h && gdec.length == rgb.length)
    // GIF magic ("GIF8") must not collide with GFV1 video ("GFV1")
    val vid = Codecs.encodeVideo(Seq(Codecs.encodePpm(4, 3, rgbOf(4, 3, 2))))
    intercept[IllegalArgumentException](Codecs.decodeImage(vid))
    intercept[IllegalArgumentException](
      Codecs.decodeImage(Array[Byte](0x42, 0x13, 0x37, 0x00)))
  }

  test("synthImageIOMedia -> decodeFeatures: lossless formats equal the " +
      "closed-form arithmetic; lossy formats keep dims and count exact") {
    import spark.implicits._
    val ids = spark.range(0, 40).select(col("id").as("n"),
      when(col("id") % 4 === 0, "png").when(col("id") % 4 === 1, "jpg")
        .when(col("id") % 4 === 2, "tiff").otherwise("gif").as("fmt"))
    val media = Multimodal.synthImageIOMedia(spark, ids)
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 40)
    feats.foreach { r =>
      val parts = r.getString(0).split("/") // i/<fmt>/<n>
      val fmt = parts(1); val n = parts(2).toLong
      val w = (16 + n % 17).toInt; val h = (16 + (n / 8) % 13).toInt
      val cnt = w * h * 3
      assert(r.getInt(2) == w && r.getInt(3) == h && r.getLong(4) == cnt,
        s"$fmt n=$n dims/count")
      if (fmt == "png" || fmt == "tiff") {
        val exp = (0 until cnt).map(i => (n * 7 + i) % 256)
        assert(r.getLong(5) == exp.sum, s"$fmt n=$n psum")
        assert(r.getLong(6) ==
          exp.zipWithIndex.map { case (v, i) => i.toLong * v }.sum,
          s"$fmt n=$n wsum")
        val rexp = for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3)
          yield (n * 7 + ((y * h / 6) * w + (x * w / 8)) * 3 + c) % 256
        assert(r.getLong(7) == rexp.sum, s"$fmt n=$n rsum")
      }
    }
  }
}
