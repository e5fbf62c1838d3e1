package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** writers.ogr analog (io/OGRWriter.cpp:74-84 options, :241-270
  * writeView): point features with optional attribute dimensions, a
  * measure dimension (4th coordinate, like OGR's measured points), and
  * `multicount` grouping of consecutive points into MULTIPOINT
  * geometries. Output is newline-delimited GeoJSON features — the OGR
  * "GeoJSONSeq" driver's wire format — so the write is one pure-column
  * `to_json` projection per partition: fully distributed, no driver
  * assembly, no UDF. */
object OgrWriter {
  def writeGeoJson(df: DataFrame, path: String, attrDims: Seq[String] = Nil,
      measureDim: Option[String] = None, multiCount: Int = 1): Unit = {
    require(multiCount >= 1, "multicount must be greater than 0")
    require(multiCount == 1 || attrDims.isEmpty,
      "multicount > 1 incompatible with attr_dims") // OGRWriter.cpp:92-94
    val dims = if (attrDims == Seq("all"))
      df.columns.filterNot(Set("x", "y", "z")).toSeq else attrDims
    def coords: Column = measureDim match {
      case Some(m) => array(col("x"), col("y"), col("z"), col(m).cast("double"))
      case None => array(col("x"), col("y"), col("z"))
    }
    val out =
      if (multiCount == 1) {
        val geom = struct(lit("Point").as("type"), coords.as("coordinates"))
        val feature =
          if (dims.nonEmpty)
            struct(lit("Feature").as("type"), geom.as("geometry"),
              struct(dims.map(d => col(d).as(d)): _*).as("properties"))
          else struct(lit("Feature").as("type"), geom.as("geometry"))
        df.select(to_json(feature).as("value"))
      } else {
        // consecutive blocks of `multicount` points (stream order =
        // order_key) -> MULTIPOINT; grouping key is a scalable range
        // rank, not a single-partition window
        val mcols = Seq(col("order_key"), col("x"), col("y"), col("z")) ++
          measureDim.map(col) // measure rides into the MULTIPOINT coords
        val ranked = graft.operators.Order.globalRankBy(
          df.select(mcols: _*), Seq(col("order_key")), "__rn")
        ranked
          .withColumn("__g", floor(col("__rn") / multiCount)) // 0-based rank
          .groupBy("__g")
          .agg(array_sort(collect_list(struct(col("__rn"), coords.as("c"))))
            .as("cs"))
          .select(to_json(struct(lit("Feature").as("type"),
            struct(lit("MultiPoint").as("type"),
              transform(col("cs"), e => e.getField("c")).as("coordinates"))
              .as("geometry"))).as("value"), col("__g"))
          .orderBy("__g").select("value")
      }
    out.write.mode("overwrite").text(path)
  }
}

/** writers.raster / writers.faceraster analog (io/RasterWriter.cpp:
  * 66-79 options, writers.gdal io/GDALWriter.cpp:49): emit a rasterized
  * grid as an Arc/Info ASCII raster (.asc — the GDAL "AAIGrid" driver's
  * text format, writable and readable without GDAL). Row lines assemble
  * distributed — per-row `map_from_entries` + `sequence`/`transform`
  * nodata fill, all codegen'd column ops — and only the final
  * single-file concat is serial, which is inherent to the format (the
  * reference likewise writes one raster file per view). For tiled
  * multi-file output at scale, rasterize per tile and `partitionBy`
  * (FlexWriter '#' analog, pdal/FlexWriter.hpp:45-58). faceraster's TIN
  * interpolation (filters.delaunay) is in the out-of-scope ground
  * family; its writer path is this same grid emit. */
object AscWriter {
  def writeAsc(grid: DataFrame, path: String, band: String = "mean",
      nodata: Double = -9999.0, resolution: Double = 1.0,
      origin: (Double, Double) = (0.0, 0.0)): Unit = {
    val spark = grid.sparkSession
    val b = grid.agg(min("cell_x"), max("cell_x"), min("cell_y"), max("cell_y")).head()
    require(!b.isNullAt(0), "writers.raster: empty grid (no cells to rasterize)")
    val (cx0, cx1, cy0, cy1) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (ncols, nrows) = (cx1 - cx0 + 1, cy1 - cy0 + 1)
    val rows = grid
      .select(col("cell_y"), col("cell_x"), col(band).cast("double").as("v"))
      .groupBy("cell_y")
      .agg(map_from_entries(collect_list(struct(col("cell_x"), col("v")))).as("m"))
    // fill rows with no occupied cell at all, then cells within a row
    val allRows = spark.range(cy0, cy1 + 1).toDF("cell_y")
      .join(rows, Seq("cell_y"), "left")
    val line = concat_ws(" ", transform(sequence(lit(cx0), lit(cx1)),
      x => coalesce(element_at(col("m"), x), lit(nodata)).cast("string")))
    val tmp = path + ".tmp_asc"
    // .asc rows run north->south: descending cell_y, total order kept by
    // the post-sort coalesce(1)
    allRows.select(col("cell_y"), line.as("value"))
      .orderBy(desc("cell_y")).coalesce(1).select("value")
      .write.mode("overwrite").text(tmp)
    val header =
      s"""ncols $ncols
         |nrows $nrows
         |xllcorner ${origin._1 + cx0 * resolution}
         |yllcorner ${origin._2 + cy0 * resolution}
         |cellsize $resolution
         |NODATA_value $nodata
         |""".stripMargin
    import java.nio.file.{Files, Paths, StandardOpenOption}
    // NIO directory streams must be closed (same discipline as
    // GraftTable.withStream — an unclosed stream leaks an fd per call)
    val ls = Files.list(Paths.get(tmp))
    val part = try ls.filter(_.getFileName.toString
      .startsWith("part-")).findFirst().get() finally ls.close()
    Files.write(Paths.get(path), header.getBytes("UTF-8"))
    val outS = Files.newOutputStream(Paths.get(path), StandardOpenOption.APPEND)
    try Files.copy(part, outS) finally outS.close()
    // clean the spark staging dir
    val wk = Files.walk(Paths.get(tmp))
    try wk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally wk.close()
  }
}
