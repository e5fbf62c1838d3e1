package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{CellMath, F, PnpGrid, Wkt}

/** Cell-partitioned document store — the engine's EPT/COPC spatial-page
  * analog (io/EptReader.cpp:200-269 `overlaps` hierarchy walk,
  * io/CopcReader.cpp:163-175 page pruning) re-expressed as Iceberg-style
  * hidden partitioning: the table is laid out by a level-k grid cell of
  * (x, y), and spatial predicates compile to partition-value IN-lists so
  * the scan never opens non-overlapping partitions.
  *
  * On a real deployment the same shape rides Iceberg partition transforms
  * (`PARTITIONED BY (cell)`) and manifest pruning; plain
  * partitioned-parquet demonstrates the identical pruning contract with
  * the jars available here — the predicate shape (`cell IN (...)` +
  * exact geometry residual) is what Iceberg's planner consumes unchanged.
  */
object CellStore {
  /** Write `df` partitioned by the grid cell of (x, y). */
  def write(df: DataFrame, path: String, ox: Double, oy: Double,
      cellLen: Double, mode: String = "overwrite"): Unit =
    df.withColumn("cell", F.cellId(col("x"), col("y"), ox, oy, cellLen))
      .write.mode(mode).partitionBy("cell").parquet(path)

  /** Covering-cell IN-list of a polygon set at this store's grid. */
  def coveringCellIds(grid: PnpGrid, ox: Double, oy: Double,
      cellLen: Double): Seq[Long] =
    grid.coveringCells(cellLen, ox, oy)
      .distinct.map { case (cx, cy) => CellMath.pack(cx, cy) }

  /** Polygon crop with partition pushdown: polygon -> covering-cell
    * IN-list on the partition column (pruned at planning time, before
    * any file is opened) -> exact point-in-polygon residual on the
    * surviving partitions only. */
  def readPolygon(spark: SparkSession, path: String, wkt: String,
      ox: Double, oy: Double, cellLen: Double): DataFrame = {
    val grid = new PnpGrid(Wkt.parse(wkt))
    val cells = coveringCellIds(grid, ox, oy, cellLen)
    spark.read.parquet(path)
      .filter(col("cell").isin(cells: _*))
      .filter(F.pnpContains(grid, col("x"), col("y")))
  }

  /** Box crop with the same pushdown. */
  def readBox(spark: SparkSession, path: String, minx: Double, miny: Double,
      maxx: Double, maxy: Double, ox: Double, oy: Double, cellLen: Double): DataFrame = {
    val x0 = math.floor((minx - ox) / cellLen).toInt
    val x1 = math.floor((maxx - ox) / cellLen).toInt
    val y0 = math.floor((miny - oy) / cellLen).toInt
    val y1 = math.floor((maxy - oy) / cellLen).toInt
    val cells = for (cx <- x0 to x1; cy <- y0 to y1) yield CellMath.pack(cx, cy)
    spark.read.parquet(path)
      .filter(col("cell").isin(cells: _*))
      .filter(col("x") >= minx && col("x") <= maxx &&
        col("y") >= miny && col("y") <= maxy)
  }

  /** Partitions the physical scan will read vs the table total —
    * pruning evidence straight from the executed plan's file scan. */
  def scanPartitionCounts(df: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    require(scans.nonEmpty, "no file scan in plan")
    val s = scans.head
    (s.selectedPartitions.partitionCount.toLong,
      s.relation.location.listFiles(Seq.empty, Seq.empty).length.toLong)
  }
}
