package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{F, PnpGrid, Wkt}

/** filters.crop analog (reference: filters/CropFilter.cpp:55): keep (or
  * drop, `outside=true`) points inside boxes / polygons / spheres. All
  * predicates are pure Catalyst columns, so they whole-stage-codegen and
  * push down to the source scan; polygon tests go through the broadcast
  * GridPnp expression. Multiple geometries produce one "view" per geometry
  * (PDAL PointViewSet, run :226-253) — modeled as a `view_id` column.
  */
object Crop {

  /** Inclusive box semantics per pdal/util/Bounds.hpp `contains`. */
  def boxPredicate(minx: Double, miny: Double, maxx: Double, maxy: Double): Column =
    col("x") >= minx && col("x") <= maxx && col("y") >= miny && col("y") <= maxy

  def box3dPredicate(minx: Double, miny: Double, minz: Double,
      maxx: Double, maxy: Double, maxz: Double): Column =
    boxPredicate(minx, miny, maxx, maxy) && col("z") >= minz && col("z") <= maxz

  def box2d(df: DataFrame, minx: Double, miny: Double, maxx: Double, maxy: Double,
      outside: Boolean = false): DataFrame = {
    val p = boxPredicate(minx, miny, maxx, maxy)
    df.filter(if (outside) !p else p)
  }

  def box3d(df: DataFrame, minx: Double, miny: Double, minz: Double,
      maxx: Double, maxy: Double, maxz: Double, outside: Boolean = false): DataFrame = {
    val p = box3dPredicate(minx, miny, minz, maxx, maxy, maxz)
    df.filter(if (outside) !p else p)
  }

  /** Polygon crop via the GridPnp-style broadcast grid
    * (filters/CropFilter.cpp:307-312). */
  def polygon(df: DataFrame, wkt: String, outside: Boolean = false): DataFrame = {
    val grid = new PnpGrid(Wkt.parse(wkt))
    val p = F.pnpContains(grid, col("x"), col("y"))
    df.filter(if (outside) !p else p)
  }

  /** One output view per geometry: emits view_id = geometry list index.
    * A point inside k geometries appears k times (PDAL emits one view per
    * geometry). */
  def polygons(df: DataFrame, wkts: Seq[String], outside: Boolean = false,
      viewCol: String = "view_id"): DataFrame = {
    val preds = wkts.map(w => F.pnpContains(new PnpGrid(Wkt.parse(w)), col("x"), col("y")))
    val hits = array(preds.zipWithIndex.map { case (p, i) =>
      when(if (outside) !p else p, lit(i)).otherwise(lit(null))
    }: _*)
    df.withColumn(viewCol, explode(filter(hits, _.isNotNull)))
  }

  /** Distance crop (filters/CropFilter.cpp:330-352): bbox prefilter then
    * strict `<` on squared distance; 3D iff the center is 3D. */
  def sphere(df: DataFrame, cx: Double, cy: Double, distance: Double,
      cz: Option[Double] = None, outside: Boolean = false): DataFrame = {
    val dx = abs(col("x") - cx); val dy = abs(col("y") - cy)
    val inBox = dx <= distance && dy <= distance
    val d2 = lit(distance * distance)
    val inside = cz match {
      case Some(z0) =>
        val dz = abs(col("z") - z0)
        inBox && dz <= distance && (dx * dx + dy * dy + dz * dz) < d2
      case None => inBox && (dx * dx + dy * dy) < d2
    }
    df.filter(if (outside) !inside else inside)
  }
}

/** filters.ferry analog (filters/FerryFilter.cpp:45): copy dims A => B. */
object Ferry {
  def apply(df: DataFrame, copies: Seq[(String, String)]): DataFrame =
    copies.foldLeft(df) { case (d, (from, to)) => d.withColumn(to, col(from)) }
}

/** filters.assign analog (filters/AssignFilter.cpp:48):
  * `Dim = value [WHERE condition]` — withColumn + when/otherwise. */
object Assign {
  def apply(df: DataFrame, dim: String, value: Column,
      condition: Option[Column] = None): DataFrame =
    condition match {
      case Some(c) => df.withColumn(dim,
        when(c, value.cast(df.schema(dim).dataType)).otherwise(col(dim)))
      case None => df.withColumn(dim, value.cast(df.schema(dim).dataType))
    }
}
