package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** End-to-end exactly-once sink for targets without transactional
  * append: foreachBatch + a batchId-keyed commit manifest.
  *
  * Structured Streaming's checkpoint replays a failed/restarted batch
  * with the SAME batchId, so an idempotent batch write composes with
  * checkpointed offsets into exactly-once output: each batch lands in
  * its own `batch=<id>` directory (overwrite = replay-safe), and a
  * commit marker written AFTER the data makes the skip decision
  * crash-consistent — a batch that died mid-write has no marker and is
  * rewritten (overwritten) on replay; a batch with a marker is skipped
  * entirely. (Spark's built-in file sink gets the same guarantee via
  * its _spark_metadata log; this is the pattern for everything else —
  * JDBC upserts, object stores, external indexes.)
  */
object ExactlyOnceSink {

  /** Idempotent per-batch write; returns true if this call wrote the
    * batch, false if it was already committed (replay skipped).
    *
    * Markers resolve through the SAME Hadoop filesystem as the data —
    * s3a://, hdfs:// and file: URIs all land next to their batches;
    * java.nio paths would silently put markers on driver-local disk for
    * any non-local target, voiding the replay-skip and losing the
    * manifest on driver failover. */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(s"$path/_commits/$batchId")
    val fs = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return false
    batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")
    fs.mkdirs(marker.getParent)
    try fs.create(marker, false).close()
    catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => }
    true
  }

  /** Start the stream writing exactly-once parquet under `path`. */
  def parquet(stream: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        writeBatch(batch.toDF(), path, batchId); ()
      }
      .start()

  /** Stream into a GraftTable: one snapshot per microbatch, idempotent
    * by batchId tag — a replayed batch finds its tagged snapshot and
    * commits nothing, so checkpointed offsets + tagged commits give
    * exactly-once table appends (Iceberg's commit-dedup pattern), and
    * every microbatch becomes a time-travelable version. */
  def graftTable(stream: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.sources.GraftTable.commitIfAbsent(
          batch.toDF(), root, tag = s"batch-$batchId"); ()
      }
      .start()
}
