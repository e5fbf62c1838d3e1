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

  /** Stream-stream AS-OF join of a doc-span stream against a media
    * stream on media_ref: each doc matches the LATEST media event whose
    * event time <= the doc's time; docs arriving before their media are
    * buffered in state and emitted when a matching media event lands
    * (the flatMapGroupsWithState custom-state path — Spark's built-in
    * stream-stream joins are equality+interval, not as-of).
    *
    * Per-key state is BOUNDED: only the latest `maxMediaHistory` media
    * versions and `maxPending` buffered docs are retained per media_ref
    * (oldest evicted first — a doc needing evicted history matches the
    * oldest retained version instead; at 16 versions that is the
    * pathological-upload case, not the steady state).
    *
    * @param docEvents  streaming (media_ref, ts, doc_id)
    * @param mediaEvents streaming (media_ref, ts, meta)
    * @return appended (doc_id, media_ref, doc_ts, media_ts, meta)
    */
  def asOfJoinMedia(spark: SparkSession, docEvents: DataFrame,
      mediaEvents: DataFrame, maxMediaHistory: Int = 16,
      maxPending: Int = 10000): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val tagged = docEvents.select(col("media_ref"), lit("doc").as("side"),
        col("ts").cast("long"), col("doc_id").cast("long"),
        lit(null).cast("string").as("meta"))
      .unionByName(mediaEvents.select(col("media_ref"), lit("media").as("side"),
        col("ts").cast("long"), lit(-1L).as("doc_id"), col("meta")))
    tagged.as[(String, String, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ref: String, it: Iterator[(String, String, Long, Long, String)],
         state: GroupState[(List[(Long, String)], List[(Long, Long)])]) =>
          var (mediaL, pend) = state.getOption.getOrElse(
            (List.empty[(Long, String)], List.empty[(Long, Long)]))
          val rows = it.toList
          // media kept sorted by ts desc: head-most match is the latest <= t
          mediaL = (mediaL ++ rows.filter(_._2 == "media").map(r => (r._3, r._5)))
            .sortBy(-_._1).take(maxMediaHistory)
          pend = pend ++ rows.filter(_._2 == "doc").map(r => (r._3, r._4))
          val (matched, still) = pend.partition { case (ts, _) =>
            mediaL.exists(_._1 <= ts) }
          state.update((mediaL, still.sortBy(-_._1).take(maxPending)))
          matched.iterator.map { case (ts, id) =>
            val m = mediaL.find(_._1 <= ts).get
            (id, ref, ts, m._1, m._2)
          }
      }.toDF("doc_id", "media_ref", "doc_ts", "media_ts", "meta")
  }

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
