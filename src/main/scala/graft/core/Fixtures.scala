package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.io.Source

/** Committed coordinate fixtures extracted once from the reference's test
  * data (FIXTURES.md §2). The golden tile/crop counts depend only on the
  * coordinate values, which we carry as a 1065-row CSV resource; spans are
  * re-synthesized deterministically so every golden test simultaneously
  * exercises the span-sequence invariant.
  */
object Fixtures {

  /** The 1065 points of `test/data/las/1.2-with-color.las` (x y z
    * intensity return_number number_of_returns classification gps_time),
    * with order_key = LAS record index (PDAL PointId). */
  def autzen1065(spark: SparkSession, seed: Long = 42L): DataFrame = {
    val in = getClass.getResourceAsStream("/graft/autzen1065.csv")
    val lines = Source.fromInputStream(in, "UTF-8").getLines().drop(1).toArray
    in.close()
    val rows = lines.zipWithIndex.map { case (l, i) =>
      val f = l.split(',')
      (f(0).toDouble, f(1).toDouble, f(2).toDouble, f(3).toInt, f(4).toInt,
        f(5).toInt, f(6).toInt, f(7).toDouble, i.toLong)
    }
    import spark.implicits._
    val base = spark.createDataset(rows.toSeq).toDF(
      "x", "y", "z", "intensity", "return_number", "number_of_returns",
      "classification", "gps_time", "order_key")
    base.select(
      format_string("doc%012d", col("order_key")).as("doc_id"),
      Synth.spansCol(col("order_key"), seed).as("spans"),
      col("x"), col("y"), col("z"), col("intensity"), col("classification"),
      col("return_number"), col("number_of_returns"), col("gps_time"),
      col("order_key"))
  }

  /** Gzipped (x, y, z, classification) fixture extracted from a reference
    * LAS file; order_key = record index. */
  private def lasCsvGz(spark: SparkSession, resource: String, seed: Long): DataFrame = {
    val in = new java.util.zip.GZIPInputStream(
      getClass.getResourceAsStream(resource))
    val lines = Source.fromInputStream(in, "UTF-8").getLines().drop(1).toArray
    in.close()
    val rows = lines.zipWithIndex.map { case (l, i) =>
      val f = l.split(',')
      (f(0).toDouble, f(1).toDouble, f(2).toDouble, f(3).toInt, i.toLong)
    }
    import spark.implicits._
    spark.createDataset(rows.toSeq)
      .toDF("x", "y", "z", "classification", "order_key")
      .select(
        format_string("doc%012d", col("order_key")).as("doc_id"),
        Synth.spansCol(col("order_key"), seed).as("spans"),
        col("x"), col("y"), col("z"), lit(0).as("intensity"),
        col("classification"), lit(1).as("return_number"),
        lit(1).as("number_of_returns"), lit(0.0).as("gps_time"),
        col("order_key"))
  }

  /** `test/data/las/sample_nc.las` (14408 unclassified pts) — source of
    * the neighborclassifier candidate golden. */
  def sampleNc(spark: SparkSession): DataFrame =
    lasCsvGz(spark, "/graft/sample_nc.csv.gz", seed = 101)

  /** `test/data/las/sample_c_thin.las` (2732 classified pts) — the
    * candidate set (NeighborClassifierFilterTest.cpp:183). */
  def sampleCThin(spark: SparkSession): DataFrame =
    lasCsvGz(spark, "/graft/sample_c_thin.csv.gz", seed = 102)

  /** WKT of `test/data/autzen/autzen-selection.wkt` (47-point crop golden,
    * test/unit/filters/CropFilterTest.cpp:210-212). */
  lazy val autzenSelectionWkt: String = {
    val in = getClass.getResourceAsStream("/graft/autzen-selection.wkt")
    val s = Source.fromInputStream(in, "UTF-8").mkString.trim
    in.close(); s
  }
}
