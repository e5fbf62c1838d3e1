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
    * batch, false if it was already committed (replay skipped). */
  def writeBatch(batch: DataFrame, path: String, batchId: Long): Boolean = {
    val marker = java.nio.file.Paths.get(path, "_commits", batchId.toString)
    if (java.nio.file.Files.exists(marker)) return false
    batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")
    java.nio.file.Files.createDirectories(marker.getParent)
    try java.nio.file.Files.createFile(marker)
    catch { case _: java.nio.file.FileAlreadyExistsException => }
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
}
