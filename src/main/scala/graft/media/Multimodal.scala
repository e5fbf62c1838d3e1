package graft.media

import org.apache.spark.sql.{DataFrame, Row, SparkSession, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-local batches.
  *
  * Two codec tiers coexist:
  *   - REAL codecs (Codecs.scala), all pure-JVM: hand-rolled PPM P6,
  *     24-bit BMP, RIFF PCM16 WAV and the GFV1 frame container, plus
  *     PNG / JPEG / GIF / TIFF through the JDK's own `javax.imageio`
  *     (the readers ship in java.desktop — no native codec jar).
  *     synthRealMedia / synthImageIOMedia / decodeFeatures run full
  *     encode→decode round trips over them (oracle-gated end-to-end).
  *   - STUBS only where a codec genuinely does not exist on a bare JVM:
  *     H.264-class video decode (GFV1+PPM stands in for the demuxer
  *     access pattern) and `decodeImageStub`'s fake header used by the
  *     feature-plumbing path. Swap the stub body for a real codec and
  *     nothing else changes — the batching, schema and null handling
  *     around it are the production shape.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType))))))

  /** Deterministic fake media blobs for the media_refs of a doc table:
    * 16-byte header (magic, width, height, frames) + seeded payload. */
  def synthMedia(spark: SparkSession, refs: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = refs.select(col("media_ref"), col("kind")).distinct()
      .as[(String, String)]
    rows.map { case (ref, kind) =>
      val seed = ref.hashCode.toLong & 0xFFFFFFFFL
      val w = (64 + (seed % 192)).toInt; val hgt = (64 + ((seed >> 3) % 192)).toInt
      val frames = if (kind == "video") (8 + (seed % 24)).toInt else 1
      val rate = if (kind == "audio") 16000 else 0
      val header = java.nio.ByteBuffer.allocate(16)
        .putInt(0x4D454449).putInt(w).putInt(hgt).putInt(frames).array()
      val payload = Array.tabulate[Byte](256)(i => ((seed + i * 31) & 0xFF).toByte)
      (ref, kind, header ++ payload, (w, hgt, rate, frames))
    }.toDF("media_ref", "kind", "content", "m")
      .select(col("media_ref"), col("kind"), col("content"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("n_frames")).as("meta"))
  }

  /** STUB decode: parses the fake 16-byte header. A real implementation
    * would invoke an image codec here; everything around it (partition
    * batching, schema, null handling) is production-shaped. */
  def decodeImageStub(content: Array[Byte]): (Int, Int) = {
    if (content == null || content.length < 16) (0, 0)
    else {
      val bb = java.nio.ByteBuffer.wrap(content)
      bb.getInt() // magic
      (bb.getInt(), bb.getInt())
    }
  }

  /** Feature extraction over media batches: per-partition iteration (the
    * Scala analog of mapInPandas batches), emitting a fixed-width feature
    * vector per blob. Feature math is a deterministic hash-projection
    * STUB standing in for a vision model forward pass. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType),
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = Encoders.row(outSchema)
    media.select("media_ref", "content").mapPartitions { it =>
      it.map { r =>
        val ref = r.getString(0)
        // null blobs (schema allows them) decode to (0,0) and hash to the
        // empty-payload feature vector instead of NPE-ing the task
        val content = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val (w, h) = decodeImageStub(content)
        val feats = Array.tabulate(dim) { i =>
          var acc = 1469598103934665603L
          var j = i
          while (j < math.min(content.length, 272)) {
            acc = (acc ^ content(j)) * 1099511628211L
            j += dim
          }
          (acc.toDouble / 9.223372036854776e18).toFloat
        }
        Row(ref, w, h, feats)
      }
    }(enc)
  }

  /** Frame sampling for video blobs: emits (media_ref, frame_idx) for
    * every nth frame — explode over the metadata, no decode needed. */
  def sampleFrames(media: DataFrame, everyNth: Int = 4): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_ref"),
        explode(sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)),
          lit(everyNth))).as("frame_idx"))

  /** Resize plumbing STUB: records target dims + pass-through payload (a
    * real impl would re-encode); keeps lineage columns intact. */
  def resizeStub(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(lit(w).as("width"), lit(h).as("height"),
      col("meta.sample_rate").as("sample_rate"), col("meta.n_frames").as("n_frames")))

  // ------------------------------------------------- real codec bodies

  /** REAL media synthesis over the pure-JVM codec family (Codecs): ids
    * (n: long, kind: image|audio|video) become actually-encoded blobs —
    * images alternate PPM (even n) and BMP (odd n) so both decoders are
    * exercised, audio is RIFF PCM16 WAV, video is a GFV1 container of
    * PPM frames. Payload formulas are integer arithmetic an external
    * oracle recomputes from n alone:
    *   pixel i of frame k:  (n*7 + k*101 + i) mod 256
    *   audio sample i:      ((n*13 + i*17) mod 4096) - 2048
    *   dims: w = 16 + n%17, h = 16 + (n/8)%13; frames = 2 + n%4;
    *   samples = 256 + n%200 at 16 kHz.
    * Per-partition tight loops, no UDFs, no driver collection. */
  def synthRealMedia(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("n").cast("long"), col("kind")).as[(Long, String)]
      .map { case (n, kind) =>
        val w = (16 + n % 17).toInt
        val h = (16 + (n / 8) % 13).toInt
        def frame(k: Int): Array[Byte] =
          Array.tabulate(w * h * 3)(i => ((n * 7 + k * 101L + i) % 256).toByte)
        val (content, meta) = kind match {
          case "image" =>
            val px = frame(0)
            (if (n % 2 == 0) Codecs.encodePpm(w, h, px)
             else Codecs.encodeBmp(w, h, px), (w, h, 0, 1))
          case "audio" =>
            val ns = (256 + n % 200).toInt
            val s = Array.tabulate(ns)(i =>
              (((n * 13 + i * 17L) % 4096) - 2048).toShort)
            (Codecs.encodeWav(16000, s), (0, 0, 16000, ns))
          case "video" =>
            val nf = (2 + n % 4).toInt
            (Codecs.encodeVideo((0 until nf).map(k =>
              Codecs.encodePpm(w, h, frame(k)))), (w, h, 0, nf))
          case other => throw new IllegalArgumentException(
            s"synthRealMedia: unknown kind '$other'")
        }
        (s"m/$n", kind, content, meta)
      }.toDF("media_ref", "kind", "content", "m")
      .select(col("media_ref"), col("kind"), col("content"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("n_frames")).as("meta"))
  }

  /** ImageIO-backed synthesis: ids (n: long, fmt: png|jpg|gif|tiff)
    * become really-encoded blobs through the JDK's `javax.imageio`
    * writers, same pixel formula as synthRealMedia so an external oracle
    * recomputes expected sums from n alone:
    *   pixel byte i: (n*7 + i) mod 256;  w = 16 + n%17, h = 16 + (n/8)%13
    * PNG and TIFF round-trip RGB losslessly (exact-sum oracle applies);
    * JPEG is lossy and GIF palettizes — for those only the decoded dims
    * and element count are oracle-exact, and decode fidelity is asserted
    * separately (MediaCodecsSpec bounds JPEG mean abs error). Emitted
    * kind is "image" so decodeFeatures dispatches through the same
    * magic-byte decode path as PPM/BMP. */
  def synthImageIOMedia(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("n").cast("long"), col("fmt")).as[(Long, String)]
      .map { case (n, fmt) =>
        val w = (16 + n % 17).toInt
        val h = (16 + (n / 8) % 13).toInt
        val px = Array.tabulate[Byte](w * h * 3)(i => ((n * 7 + i) % 256).toByte)
        (s"i/$fmt/$n", "image", Codecs.encodeImageIO(fmt, w, h, px),
          (w, h, 0, 1))
      }.toDF("media_ref", "kind", "content", "m")
      .select(col("media_ref"), col("kind"), col("content"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("sample_rate"), col("m._4").as("n_frames")).as("meta"))
  }

  /** Decode-side features over REAL blobs — every number here comes from
    * PARSING the encoded bytes, so a codec defect (row padding, BMP
    * bottom-up order, endianness, chunk walk, frame offsets) breaks the
    * output:
    *   pcnt   decoded element count (pixels*3 / samples)
    *   psum   plain sum of decoded values (unsigned bytes / signed samples)
    *   wsum   position-weighted sum Σ i·v_i — catches reorderings that a
    *          plain sum cannot (e.g. forgetting BMP's bottom-up rows)
    *   rsum   images only: resize to 8x6 nearest-neighbor, RE-ENCODE to
    *          PPM, re-decode, plain sum (a full codec round trip)
    * Video decodes its LAST frame, so the demuxer must walk every
    * preceding frame header. One tight mapPartitions pass, no UDFs. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType), StructField("kind", StringType),
      StructField("w", IntegerType), StructField("h", IntegerType),
      StructField("pcnt", LongType), StructField("psum", LongType),
      StructField("wsum", LongType), StructField("rsum", LongType)))
    val enc = Encoders.row(outSchema)
    media.select("media_ref", "kind", "content").mapPartitions { it =>
      it.map { r =>
        val ref = r.getString(0)
        val kind = r.getString(1)
        val content = r.getAs[Array[Byte]](2)
        def sums(vals: Array[Int]): (Long, Long, Long) = {
          var ps = 0L; var ws = 0L; var i = 0
          while (i < vals.length) { ps += vals(i); ws += i.toLong * vals(i); i += 1 }
          (vals.length.toLong, ps, ws)
        }
        kind match {
          case "image" =>
            val (w, h, rgb) = Codecs.decodeImage(content)
            val (cnt, ps, ws) = sums(rgb.map(_ & 0xFF))
            val rppm = Codecs.encodePpm(8, 6,
              Codecs.resizeNearest(w, h, rgb, 8, 6))
            val (_, _, rrgb) = Codecs.decodePpm(rppm)
            Row(ref, kind, w, h, cnt, ps, ws,
              rrgb.map(_ & 0xFF).foldLeft(0L)(_ + _))
          case "audio" =>
            val (_, samples) = Codecs.decodeWav(content)
            val (cnt, ps, ws) = sums(samples.map(_.toInt))
            Row(ref, kind, 0, 0, cnt, ps, ws, null)
          case "video" =>
            val nf = Codecs.videoFrameCount(content)
            val (w, h, rgb) = Codecs.decodePpm(
              Codecs.decodeVideoFrame(content, nf - 1))
            val (cnt, ps, ws) = sums(rgb.map(_ & 0xFF))
            Row(ref, kind, w, h, cnt, ps, ws, null)
          case other => throw new IllegalArgumentException(
            s"decodeFeatures: unknown kind '$other'")
        }
      }
    }(enc)
  }
}
