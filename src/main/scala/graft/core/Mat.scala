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

  /** Materialize `df` AND count rows where `changed` holds in the SAME
    * job (for iterative loops whose stop condition is "no row changed"):
    * an accumulator-bumping predicate rides the materialization pass, so
    * each round costs one job instead of materialize+count.
    *
    * The predicate is marked nondeterministic so Catalyst cannot push,
    * duplicate, or reorder it — exactly one evaluation per materialized
    * row. Task retries can only over-count (an extra loop round), never
    * under-count (premature termination is impossible).
    */
  def withChangedCount(df: DataFrame, changed: org.apache.spark.sql.Column)
      : (DataFrame, Long) = {
    val acc = df.sparkSession.sparkContext.longAccumulator("graft.changed")
    val bump = org.apache.spark.sql.functions.udf { (c: Boolean) =>
      if (c) acc.add(1L); true
    }.asNondeterministic()
    val mat = apply(df.filter(bump(changed)))
    (mat, acc.value)
  }
}
