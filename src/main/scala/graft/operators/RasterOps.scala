package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{F, PnpGrid, Wkt}

/** Raster grid addressing shared by the raster<->vector operators: a
  * raster is a table (cell_x: int, cell_y: int, band columns...) over an
  * origin + resolution — the relational form of a GDAL dataset. */
case class RasterGrid(originX: Double, originY: Double, resolution: Double) {
  def cellX(x: Column): Column = floor((x - originX) / resolution).cast("long")
  def cellY(y: Column): Column = floor((y - originY) / resolution).cast("long")
  def centerX(cx: Column): Column = (cx + 0.5) * resolution + originX
  def centerY(cy: Column): Column = (cy + 0.5) * resolution + originY
}

/** filters.colorization analog (filters/ColorizationFilter.cpp:48):
  * sample raster band values at each point's pixel — an equi-join on the
  * pixel cell key; points outside the raster keep defaults (:221-223 —
  * left join + coalesce). Small rasters broadcast. */
object Colorization {
  /** @param bands (rasterColumn -> (outputDim, scale)) */
  def apply(df: DataFrame, raster: DataFrame, grid: RasterGrid,
      bands: Seq[(String, String, Double)],
      broadcastRaster: Boolean = true): DataFrame = {
    val r0 = raster.select(
      (Seq(col("cell_x"), col("cell_y")) ++ bands.map(b => col(b._1))): _*)
    val r = if (broadcastRaster) broadcast(r0) else r0
    val joined = df
      .withColumn("__rcx", grid.cellX(col("x")))
      .withColumn("__rcy", grid.cellY(col("y")))
      .join(r, col("__rcx") === r("cell_x") && col("__rcy") === r("cell_y"), "left")
    bands.foldLeft(joined) { case (d, (src, dst, scale)) =>
      val prev = if (d.columns.contains(dst)) col(dst) else lit(0)
      d.withColumn(dst, coalesce(col(src) * scale, prev))
    }.drop("__rcx", "__rcy", "cell_x", "cell_y")
      .drop(bands.map(_._1).filterNot(b => bands.exists(_._2 == b)): _*)
  }
}

/** filters.dem analog (filters/DEMFilter.cpp:48): keep points whose Z is
  * within [band*lo_mult, band*hi_mult] of the raster surface under them. */
object DemFilter {
  def apply(df: DataFrame, raster: DataFrame, grid: RasterGrid,
      band: String = "band1", loOffset: Double = -1e308, hiOffset: Double = 1e308): DataFrame = {
    val r = broadcast(raster.select(col("cell_x"), col("cell_y"), col(band).as("__dem")))
    df.withColumn("__rcx", grid.cellX(col("x")))
      .withColumn("__rcy", grid.cellY(col("y")))
      .join(r, col("__rcx") === r("cell_x") && col("__rcy") === r("cell_y"), "left")
      .filter(col("__dem").isNotNull &&
        col("z") >= col("__dem") + loOffset && col("z") <= col("__dem") + hiOffset)
      .drop("__rcx", "__rcy", "cell_x", "cell_y", "__dem")
  }
}

/** writers.gdal analog (io/GDALWriter.cpp:49, accumulators
  * io/private/GDALGrid.hpp:47-80): rasterize points into resolution-sized
  * cells; every point contributes to all cells whose center lies within
  * `radius` (GDALGrid::addPoint :77), producing per-cell
  * min/max/mean/count/stddev/idw — one explode + one groupBy, all
  * built-in aggregates plus an IDW pair (sum(v/d), sum(1/d)). */
object Rasterize {
  def apply(df: DataFrame, resolution: Double, valueCol: String = "z",
      radius: Double = 0.0, origin: Option[(Double, Double)] = None): DataFrame = {
    val rad = if (radius > 0) radius else resolution * math.sqrt(2.0)
    val (ox, oy) = origin.getOrElse {
      val r = df.agg(min("x"), min("y")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val g = RasterGrid(ox, oy, resolution)
    val reach = math.ceil(rad / resolution).toInt
    val offs = for (dx <- -reach to reach; dy <- -reach to reach)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
    val v = col(valueCol).cast("double")
    val exploded = df
      .select(v.as("__v"), col("x"), col("y"),
        g.cellX(col("x")).as("__cx0"), g.cellY(col("y")).as("__cy0"))
      .withColumn("__o", explode(array(offs: _*)))
      .select(col("__v"), col("x"), col("y"),
        (col("__cx0") + col("__o.dx")).as("cell_x"),
        (col("__cy0") + col("__o.dy")).as("cell_y"))
      .withColumn("__d", sqrt(
        pow(col("x") - g.centerX(col("cell_x")), 2) +
        pow(col("y") - g.centerY(col("cell_y")), 2)))
      .filter(col("__d") <= rad)
    exploded.groupBy("cell_x", "cell_y").agg(
      count(lit(1)).as("count"),
      min("__v").as("min"), max("__v").as("max"), avg("__v").as("mean"),
      coalesce(stddev_pop(col("__v")), lit(0.0)).as("stddev"),
      (sum(col("__v") / greatest(col("__d"), lit(1e-12))) /
        sum(lit(1.0) / greatest(col("__d"), lit(1e-12)))).as("idw"))
  }
}

/** filters.overlay analog (filters/OverlayFilter.cpp:51): assign a dim
  * from the FIRST (document-order) polygon containing each point. The
  * polygon set is broadcast as a chain of GridPnp expressions —
  * first-match-wins encoded as a single `when` cascade (no join needed
  * when polygons are few; for large sets use Crop.polygons + window). */
object Overlay {
  def apply(df: DataFrame, polygons: Seq[(String, Any)], dim: String): DataFrame = {
    require(polygons.nonEmpty, "overlay needs at least one polygon")
    val cascade = polygons.foldLeft[Column](null) { case (acc, (wkt, value)) =>
      val p = F.pnpContains(new PnpGrid(Wkt.parse(wkt)), col("x"), col("y"))
      val v = lit(value)
      if (acc == null) when(p, v) else acc.when(p, v)
    }
    val dt = df.schema(dim).dataType
    df.withColumn(dim, coalesce(cascade.cast(dt), col(dim)))
  }
}
