package graft.media

import org.apache.spark.sql.{DataFrame, Row, SparkSession, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in partition-local batches.
  *
  * The Spark-side machinery — schema, deterministic synthesis, batch
  * iteration shape, partition sizing — is real and tested; the codec
  * calls themselves are STUBS (this container ships no image/audio libs):
  * `decodeImageStub` parses our deterministic fake header instead of
  * libjpeg. Swap the stub body for a real codec and nothing else changes.
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
}
