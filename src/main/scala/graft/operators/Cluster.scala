package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** filters.cluster analog (filters/ClusterFilter.cpp:48): Euclidean
  * connected components within `tolerance` -> ClusterID.
  *
  * Distributed min-label propagation WITH pointer jumping (path halving)
  * over the radius-neighbor graph: each round every point takes the min
  * label of its neighborhood, then labels chase their own parents one
  * hop (lbl <- lbl(lbl)). The jump doubles the resolved distance per
  * round, so convergence is O(log diameter) rounds rather than
  * O(diameter) — the property that keeps long thin components (scan
  * lines, roads) from serializing the loop at scale. Materialization via
  * Mat (reliable checkpoint on clusters, localCheckpoint single-JVM).
  *
  * Dense-cell caveat: the edge list is O(sum of per-cell pair counts);
  * a blob of m points inside one tolerance-cell emits m^2 edges. That is
  * inherent to the reference semantics (every within-tolerance pair IS
  * an edge); cap the blowup upstream with voxel downsampling at
  * cell ~= tolerance when the data has dense blobs.
  */
object Cluster {
  def apply(df: DataFrame, tolerance: Double, minPoints: Long = 1,
      outCol: String = "cluster_id"): DataFrame = {
    val edges = graft.core.Mat(RadiusCount.pairs(df, tolerance).select("pk", "qk"))
    var labels = graft.core.Mat(
      df.select(col("order_key").as("k"), col("order_key").as("lbl")))
    var changed = 1L
    while (changed > 0) {
      // min over neighbor labels
      val nbrMin = edges.join(labels, edges("qk") === labels("k"))
        .groupBy(col("pk").as("k")).agg(min("lbl").as("nlbl"))
      // thread the previous label through so the changed-row count can
      // ride the materialization job (Mat.withChangedCount below)
      val prop = labels.join(nbrMin, Seq("k"), "left")
        .select(col("k"), col("lbl").as("__old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // pointer jump: follow the label's own label (labels are node keys)
      val parents = prop.select(col("k").as("lbl"), col("lbl").as("__plbl"))
      // change count rides the materialization pass: one job per round
      val (jumped, ch) = graft.core.Mat.withChangedCount(
        prop.join(parents, Seq("lbl"), "left")
          .select(col("k"), coalesce(col("__plbl"), col("lbl")).as("lbl"),
            col("__old")),
        col("lbl") =!= col("__old"))
      changed = ch
      labels = jumped.select("k", "lbl")
    }
    // densify: cluster id = 1-based rank of the root label, computed with
    // the range-partitioned global rank (roots only — small, but never a
    // single-partition window even when they aren't)
    val roots = labels.select("lbl").distinct()
    val dense = Order.globalRankBy(roots, Seq(col("lbl").asc), "__r")
      .select(col("lbl"), (col("__r") + 1).as("cid"))
    val sized = labels.groupBy("lbl").agg(count(lit(1)).as("__sz"))
    val withId = labels.join(dense, Seq("lbl")).join(sized, Seq("lbl"))
      .select(col("k").as("order_key"),
        when(col("__sz") >= minPoints, col("cid")).otherwise(lit(0L)).as(outCol))
    df.join(withId, Seq("order_key"), "left")
  }
}

/** filters.dbscan analog (filters/DBSCANFilter.cpp:51): core points have
  * >= min_points neighbors (self included) within eps; clusters = CC over
  * core points; border points join a neighboring core's cluster; noise
  * gets -1. */
object Dbscan {
  def apply(df: DataFrame, eps: Double, minPoints: Long,
      outCol: String = "cluster_id"): DataFrame = {
    val counts = RadiusCount(df, eps)
    val core = df.join(counts, Seq("order_key"), "left")
      .filter(coalesce(col("__rc"), lit(1L)) >= minPoints)
      .drop("__rc")
      .transform(d => graft.core.Mat(d))
    val coreClusters = Cluster(core, eps, outCol = "__ccid")
      .select(col("order_key").as("ck"), col("__ccid"))
    // border points: nearest core within eps (min core order_key wins)
    val pairs = RadiusCount.pairs(df, eps)
    val toCore = pairs.join(coreClusters, pairs("qk") === coreClusters("ck"))
      .groupBy(col("pk")).agg(min("__ccid").as("__bcid"))
    df.join(coreClusters.select(col("ck").as("order_key"), col("__ccid")),
        Seq("order_key"), "left")
      .join(toCore.select(col("pk").as("order_key"), col("__bcid")),
        Seq("order_key"), "left")
      .withColumn(outCol,
        coalesce(col("__ccid"), col("__bcid"), lit(-1L)))
      .drop("__ccid", "__bcid")
  }
}

/** filters.lloydkmeans analog (filters/LloydKMeansFilter.cpp:46): Lloyd
  * iterations entirely as DataFrame aggregates; deterministic init = the
  * k lowest order_key points (the reference seeds from the view — we pin
  * the deterministic variant). */
object KMeans {
  def apply(df: DataFrame, k: Int, maxIters: Int = 10,
      outCol: String = "cluster_id"): DataFrame = {
    var centroids = df.orderBy("order_key").limit(k)
      .select("x", "y", "z").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    var iter = 0
    var assignExpr: Column = null
    while (iter < maxIters) {
      assignExpr = assignCol(centroids)
      val next = df.withColumn("__c", assignExpr)
        .groupBy("__c").agg(avg("x"), avg("y"), avg("z"), count(lit(1)))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      val updated = centroids.indices.map(i => next.getOrElse(i, centroids(i))).toArray
      if (updated.sameElements(centroids)) iter = maxIters
      else { centroids = updated; iter += 1 }
    }
    df.withColumn(outCol, assignCol(centroids).cast("long"))
  }

  private def assignCol(cs: Array[(Double, Double, Double)]): Column = {
    val dists = cs.zipWithIndex.map { case ((cx, cy, cz), i) =>
      struct(((col("x") - cx) * (col("x") - cx) + (col("y") - cy) * (col("y") - cy) +
        (col("z") - cz) * (col("z") - cz)).as("d"), lit(i).as("i"))
    }
    array_min(array(dists: _*)).getField("i")
  }
}
