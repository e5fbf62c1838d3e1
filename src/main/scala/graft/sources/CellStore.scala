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
  /** Write `df` partitioned by the grid cell of (x, y). The repartition
    * on the cell key co-locates each cell before the partitionBy write:
    * without it every incoming partition emits a file into every cell
    * directory it touches (P x C tiny files — a small-files explosion
    * that murders both this write and every later scan); with it each
    * cell directory holds one file per shuffle partition that owns the
    * cell, i.e. one. */
  def write(df: DataFrame, path: String, ox: Double, oy: Double,
      cellLen: Double, mode: String = "overwrite"): Unit =
    df.withColumn("cell", F.cellId(col("x"), col("y"), ox, oy, cellLen))
      .repartition(col("cell"))
      .write.mode(mode).partitionBy("cell").parquet(path)

  /** Covering-cell IN-list of a polygon set at this store's grid. */
  def coveringCellIds(grid: PnpGrid, ox: Double, oy: Double,
      cellLen: Double): Seq[Long] =
    grid.coveringCells(cellLen, ox, oy)
      .distinct.map { case (cx, cy) => CellMath.pack(cx, cy) }

  /** Literal IN-lists stop scaling past a few thousand covering cells
    * (driver-side plan construction is O(literals)); beyond this the
    * predicate switches to cell-coordinate ranges — O(1) size, prunes
    * the same partitions (partition pruning evaluates arbitrary
    * deterministic expressions over the partition column, and the
    * covering set is a bbox rectangle in cell space). */
  private val MaxInList = 4096

  private def cellPredicate(cells: Seq[Long]) =
    if (cells.length <= MaxInList) col("cell").isin(cells: _*)
    else {
      val xs = cells.map(CellMath.unpackX); val ys = cells.map(CellMath.unpackY)
      F.cellX(col("cell").cast("long")).between(xs.min, xs.max) &&
        F.cellY(col("cell").cast("long")).between(ys.min, ys.max)
    }

  /** Polygon crop with partition pushdown: polygon -> covering-cell
    * predicate on the partition column (pruned at planning time, before
    * any file is opened) -> exact point-in-polygon residual on the
    * surviving partitions only. */
  def readPolygon(spark: SparkSession, path: String, wkt: String,
      ox: Double, oy: Double, cellLen: Double): DataFrame = {
    val grid = new PnpGrid(Wkt.parse(wkt))
    val cells = coveringCellIds(grid, ox, oy, cellLen)
    spark.read.parquet(path)
      .filter(cellPredicate(cells))
      .filter(F.pnpContains(grid, col("x"), col("y")))
  }

  /** Box crop with the same pushdown. Cell ranges are computed with the
    * write path's binning (CellMath.cellCoord, trunc-then-decrement) —
    * floor would miss the partition holding points that sit exactly on
    * a negative cell boundary. */
  def readBox(spark: SparkSession, path: String, minx: Double, miny: Double,
      maxx: Double, maxy: Double, ox: Double, oy: Double, cellLen: Double): DataFrame = {
    val x0 = CellMath.cellCoord(minx, ox, cellLen)
    val x1 = CellMath.cellCoord(maxx, ox, cellLen)
    val y0 = CellMath.cellCoord(miny, oy, cellLen)
    val y1 = CellMath.cellCoord(maxy, oy, cellLen)
    val cells = for (cx <- x0 to x1; cy <- y0 to y1) yield CellMath.pack(cx, cy)
    spark.read.parquet(path)
      .filter(cellPredicate(cells))
      .filter(col("x") >= minx && col("x") <= maxx &&
        col("y") >= miny && col("y") <= maxy)
  }

  /** Partitions the physical scan will read vs the table total —
    * pruning evidence straight from the executed plan's file scan
    * (descends into AQE-wrapped plans, whose top node is a leaf). */
  def scanPartitionCounts(df: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    }.flatten
    val ss = scans(df.queryExecution.executedPlan)
    require(ss.nonEmpty, "no file scan in plan")
    val s = ss.head
    (s.selectedPartitions.partitionCount.toLong,
      s.relation.location.listFiles(Seq.empty, Seq.empty).length.toLong)
  }
}
