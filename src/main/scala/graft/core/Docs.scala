package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** One interleaved text/media span inside a document.
  *
  * The span sequence `(kind, text, media_ref, order)` is the per-row
  * invariant every stage must preserve (BASELINE.json `input_hint`): spans
  * are opaque ride-along payload, the analog of PDAL dimensions a filter
  * does not declare (reference: pdal/PointView.hpp:100 — filters append
  * point ids to views, never rewrite undeclared dimensions).
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** A document-as-point: the PDAL point record (pdal/PointLayout.hpp:59-70)
  * re-expressed as a typed row. Spatial dims mirror pdal/Dimension.json
  * (X/Y/Z double at :3-16, Intensity uint16 at :23-26, Classification
  * uint8 at :60-64); `order_key` is the explicit, distributed-safe analog
  * of PDAL's PointId insertion order that "first point" semantics lean on
  * (filters/SplitterFilter.cpp:158-161, filters/VoxelDownsizeFilter.cpp:131-136).
  */
case class Doc(
    doc_id: String,
    spans: Seq[Span],
    x: Double,
    y: Double,
    z: Double,
    intensity: Int,
    classification: Int,
    return_number: Int,
    number_of_returns: Int,
    gps_time: Double,
    order_key: Long)

object Docs {
  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("text", StringType),
    StructField("media_ref", StringType),
    StructField("offset", IntegerType)))

  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanType)),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("intensity", IntegerType, nullable = false),
    StructField("classification", IntegerType, nullable = false),
    StructField("return_number", IntegerType, nullable = false),
    StructField("number_of_returns", IntegerType, nullable = false),
    StructField("gps_time", DoubleType, nullable = false),
    StructField("order_key", LongType, nullable = false)))

  /** Columns that make up the spatial/attribute core; everything else
    * (spans and any user columns) rides along untouched. */
  val coreDims: Seq[String] = Seq("x", "y", "z", "intensity", "classification",
    "return_number", "number_of_returns", "gps_time")
}

object GraftSession {
  /** Session tuned for this sandbox (local[N], one JVM). The settings are
    * the ones that matter at cluster scale too: AQE on (skew-join
    * splitting per SURVEY §7.4), shuffle partitions sized to cores not 200.
    */
  /** Shuffle scratch on tmpfs, one subdir per JVM; stale subdirs of dead
    * JVMs are swept at startup (a killed run must not leave GBs pinned in
    * RAM for later sessions). */
  private def localDir(): String = {
    val base = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
    try {
      java.nio.file.Files.createDirectories(base)
      val live = java.nio.file.Paths.get("/proc")
      val ls = java.nio.file.Files.list(base)
      try ls.forEach { p =>
        val name = p.getFileName.toString
        if (name.forall(_.isDigit) &&
            !java.nio.file.Files.exists(live.resolve(name))) {
          org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
        }
      } finally ls.close()
    } catch { case _: Exception => }
    base.resolve(ProcessHandle.current().pid().toString).toString
  }

  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.local.dir", localDir())
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
