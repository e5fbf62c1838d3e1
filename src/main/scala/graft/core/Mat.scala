package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-cutting materializer for iterative operators (kNN ring loop,
  * CC label propagation, LSH staging).
  *
  * On a real cluster set a reliable checkpoint dir
  * (`sparkContext.setCheckpointDir` on shared storage): materialized
  * state then survives executor loss and never pins a single JVM's block
  * manager. Without one (single-JVM test/bench runs) this falls back to
  * `localCheckpoint`, which is the right tool at that scale.
  */
object Mat {
  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)
}
