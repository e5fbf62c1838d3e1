package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpoint + per-partition lineage/metrics (north rule:
  * "every stage checkpoints per-partition lineage and row/byte metrics to
  * enable exact resume").
  *
  * Each stage output is written to `<dir>/stage=<i>_<name>/data` with a
  * `_SUCCESS`-gated commit; a sidecar `metrics` table records, per
  * physical partition: row count, approximate bytes, min/max order_key
  * (the lineage interval — which slice of the insertion order the
  * partition holds). `run` resumes from the LAST completed stage: earlier
  * stages are never recomputed, the exact parquet bytes are reloaded.
  */
class CheckpointRunner(spark: SparkSession, dir: String) {

  private def stagePath(i: Int, name: String) = s"$dir/stage=${i}_$name"

  /** A stage is complete only once its metrics sidecar committed — the
    * LAST write of the stage. Gating on data/_SUCCESS alone would let a
    * crash between the data and metrics writes resume past a stage whose
    * lineage sidecar never lands (the metrics would be missing forever);
    * gating on metrics re-runs such a stage, overwriting both cleanly. */
  private def completed(i: Int, name: String): Boolean =
    new org.apache.hadoop.fs.Path(stagePath(i, name) + "/metrics/_SUCCESS")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(stagePath(i, name) + "/metrics/_SUCCESS"))

  /** Approximate serialized row width: fixed numeric core + string/span
    * payload lengths. */
  private def byteCol(df: DataFrame) = {
    val strCols = df.schema.fields.filter(_.dataType ==
      org.apache.spark.sql.types.StringType).map(f => length(col(f.name)))
    val base = lit(8L * df.schema.fields.length)
    if (strCols.isEmpty) base else strCols.foldLeft(base)(_ + coalesce(_, lit(0)).cast("long"))
  }

  def run(input: DataFrame,
      stages: Seq[(String, DataFrame => DataFrame)]): DataFrame = {
    // find the last completed stage to resume from
    val lastDone = stages.zipWithIndex.reverse
      .find { case ((name, _), i) => completed(i, name) }.map(_._2)
    var cur = lastDone match {
      case Some(i) =>
        spark.read.parquet(stagePath(i, stages(i)._1) + "/data")
      case None => input
    }
    val start = lastDone.map(_ + 1).getOrElse(0)
    stages.zipWithIndex.drop(start).foreach { case ((name, fn), i) =>
      val out = fn(cur)
      out.write.mode("overwrite").parquet(stagePath(i, name) + "/data")
      val reread = spark.read.parquet(stagePath(i, name) + "/data")
      val hasOrder = reread.columns.contains("order_key")
      val metrics = reread
        .groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows"),
          sum(byteCol(reread)).as("approx_bytes"),
          (if (hasOrder) min("order_key")
           else lit(null).cast("long")).as("min_order_key"), // typed null:
          (if (hasOrder) max("order_key")                    // NullType cols
           else lit(null).cast("long")).as("max_order_key")) // break parquet
        .withColumn("stage", lit(i)).withColumn("stage_name", lit(name))
        .withColumn("committed_at", current_timestamp())
      metrics.write.mode("overwrite").parquet(stagePath(i, name) + "/metrics")
      cur = reread
    }
    cur
  }

  /** All recorded metrics across stages (the lineage sidecar). */
  def metrics(): DataFrame = spark.read.parquet(s"$dir/stage=*/metrics")
}
