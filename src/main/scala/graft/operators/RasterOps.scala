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

/** filters.faceraster analog (filters/FaceRasterFilter.cpp:84-151):
  * rasterize a TIN — each raster cell whose center lies inside a mesh
  * face (edge-inclusive) takes the barycentric interpolation of the
  * face's vertex z at the cell center (pdal/private/MathUtils.cpp:
  * 407-443, = DelaunayCore.barycentricInterp). Cells covered by no face
  * are absent from the output (nodata at write time). Cell conventions
  * are the reference's (pdal/private/Raster.hpp:152-163): cell =
  * floor((p - origin) / edge), center = origin + (i + .5) * edge;
  * per-face candidate cells are the reference's clamped half-edge bbox
  * loop, auto-limits its computed origin/size (:88-95).
  *
  * Scale: three slim equi-joins (mesh -> vertex coords), one per-face
  * explode over the candidate cell rectangle — the same fanout as the
  * reference's loop, bounded by face-bbox/edge² — then barycentric
  * arithmetic as pure codegen'd columns and ONE groupBy(cell) to pick a
  * winner where edge-adjacent faces both claim a center (values there
  * agree up to FP; the reference's mesh-iteration last-face-wins
  * becomes max_by(canonical face key): deterministic and
  * partitioning-independent). No driver loop, no UDF. */
object FaceRaster {
  def apply(pts: DataFrame, mesh: DataFrame, edgeLength: Double,
      origin: Option[(Double, Double)] = None,
      widthHeight: Option[(Long, Long)] = None): DataFrame = {
    require(origin.isDefined == widthHeight.isDefined,
      "Must specify all or none of 'origin_x', 'origin_y', 'width' and 'height'.")
    val half = edgeLength / 2
    val edgeBit = edgeLength * 1e-6
    val (ox, oy, w, h) = (origin, widthHeight) match {
      case (Some((x0, y0)), Some((ww, hh))) => (x0, y0, ww, hh)
      case _ =>
        val b = pts.agg(min("x"), max("x"), min("y"), max("y")).head()
        val x0 = b.getDouble(0) - half; val y0 = b.getDouble(2) - half
        (x0, y0, ((b.getDouble(1) - x0) / edgeLength).toLong + 1L,
          ((b.getDouble(3) - y0) / edgeLength).toLong + 1L)
    }
    def v(n: String) = pts.select(col("order_key").as(n),
      col("x").as("x" + n), col("y").as("y" + n), col("z").as("z" + n))
    val f = mesh.join(v("a"), "a").join(v("b"), "b").join(v("c"), "c")
    def clampX(c: Column) = greatest(lit(0L), least(lit(w), c))
    def clampY(c: Column) = greatest(lit(0L), least(lit(h), c))
    val xmn = least(col("xa"), col("xb"), col("xc"))
    val xmx = greatest(col("xa"), col("xb"), col("xc"))
    val ymn = least(col("ya"), col("yb"), col("yc"))
    val ymx = greatest(col("ya"), col("yb"), col("yc"))
    val ax = clampX(floor((xmn + half - edgeBit - ox) / edgeLength).cast("long"))
    val bx = clampX(floor((xmx + half - ox) / edgeLength).cast("long"))
    val ay = clampY(floor((ymn + half - edgeBit - oy) / edgeLength).cast("long"))
    val by = clampY(floor((ymx + half - oy) / edgeLength).cast("long"))
    val cells = f
      .withColumn("__xi", explode(when(bx > ax, sequence(ax, bx - 1))))
      .withColumn("__yi", explode(when(by > ay, sequence(ay, by - 1))))
    val x = (col("__xi") + lit(0.5)) * edgeLength + ox
    val y = (col("__yi") + lit(0.5)) * edgeLength + oy
    // barycentricInterp replicated as columns (inclusive-edge contain)
    val detT = (col("yb") - col("yc")) * (col("xa") - col("xc")) +
      (col("xc") - col("xb")) * (col("ya") - col("yc"))
    val l1 = ((col("yb") - col("yc")) * (x - col("xc")) +
      (col("xc") - col("xb")) * (y - col("yc"))) / detT
    val l2 = ((col("yc") - col("ya")) * (x - col("xc")) +
      (col("xa") - col("xc")) * (y - col("yc"))) / detT
    cells
      .withColumn("__l1", l1).withColumn("__l2", l2)
      .filter(detT =!= 0.0 &&
        col("__l1") >= 0 && col("__l1") <= 1 &&
        col("__l2") >= 0 && col("__l2") <= 1 &&
        col("__l1") + col("__l2") <= 1)
      .withColumn("__v", col("__l1") * col("za") + col("__l2") * col("zb") +
        (lit(1.0) - col("__l1") - col("__l2")) * col("zc"))
      .groupBy(col("__xi").as("cell_x"), col("__yi").as("cell_y"))
      .agg(max_by(col("__v"), struct(col("a"), col("b"), col("c"))).as("band1"))
  }
}
