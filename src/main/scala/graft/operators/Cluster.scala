package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** filters.cluster analog (filters/ClusterFilter.cpp:48): Euclidean
  * connected components within `tolerance` -> ClusterID.
  *
  * Distributed label propagation over the radius-neighbor graph (the
  * standard large-graph CC pattern): labels start as order_key, every
  * round each point takes the min label of its neighborhood, iterate to
  * fixpoint (O(graph diameter) rounds, each one join+agg). Final ids are
  * densified by first-appearance order so they match PDAL's 1-based
  * discovery ids up to relabeling.
  */
object Cluster {
  def apply(df: DataFrame, tolerance: Double, minPoints: Long = 1,
      outCol: String = "cluster_id"): DataFrame = {
    val edges = RadiusCount.pairs(df, tolerance).select("pk", "qk")
      .localCheckpoint(eager = true)
    var labels = df.select(col("order_key").as("k"), col("order_key").as("lbl"))
      .localCheckpoint(eager = true)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges.join(labels, edges("qk") === labels("k"))
        .groupBy(col("pk")).agg(min("lbl").as("nlbl"))
      val updated = labels.join(nbrMin, labels("k") === nbrMin("pk"), "left")
        .select(col("k"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (col("nlbl") < col("lbl")).as("__chg"))
      changed = updated.filter(col("__chg")).count()
      labels = updated.select("k", "lbl").localCheckpoint(eager = true)
    }
    // densify: cluster id = 1-based rank of the root label (discovery order)
    val roots = labels.select("lbl").distinct()
    val w = org.apache.spark.sql.expressions.Window.orderBy("lbl")
    val dense = roots.withColumn("cid", row_number().over(w).cast("long"))
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
      .localCheckpoint(eager = true)
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
