package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Docs
import graft.functions.F

/** Structured Streaming extension (beyond reference parity — PDAL has no
  * unbounded sources, SURVEY §1.4): a file-arrival doc stream tiled and
  * aggregated incrementally. The batch operators reuse directly because
  * tile assignment is a stateless codegen'd expression.
  */
object DocStream {

  /** File-arrival source over a directory of doc-table parquet drops. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Docs.schema).parquet(dir)

  /** Streaming tiler: stateless cell assignment (same Splitter expression
    * as batch — origin must be explicit in a stream, there is no "first
    * point"). */
  def tile(stream: DataFrame, length: Double, ox: Double, oy: Double): DataFrame =
    stream.withColumn("tile_id", F.cellId(col("x"), col("y"), ox, oy, length))

  /** Watermarked per-tile windowed density: event time derives from
    * gps_time (seconds since epoch base). */
  def tileDensity(stream: DataFrame, length: Double, ox: Double, oy: Double,
      window: String = "10 minutes", watermark: String = "30 minutes"): DataFrame =
    tile(stream, length, ox, oy)
      .withColumn("ts", timestamp_seconds(col("gps_time")))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("tile_id"))
      .agg(count(lit(1)).as("n"), avg("z").as("mean_z"))

  /** Stateful per-tile running counts via mapGroupsWithState — the
    * KeyValueGroupedDataset custom-state path. */
  def runningTileCounts(spark: SparkSession, stream: DataFrame,
      length: Double, ox: Double, oy: Double): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    tile(stream, length, ox, oy)
      .select(col("tile_id"), col("order_key"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (tile: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (tile, total)
      }.toDF("tile_id", "running_count")
  }
}
