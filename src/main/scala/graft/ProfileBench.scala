package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage scaling profile: which phase stops scaling with cores. */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = graft.core.GraftSession.local(cores, cores)
    import spark.implicits._

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] cores=$cores $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    val docs = graft.core.Synth.docs(spark, nDocs, seed = 42, numPartitions = cores * 4)
    time("warmup_count")(docs.count())
    time("synth_full_scan")(docs.agg(sum(length(col("doc_id"))),
      sum(size(col("spans")))).head())
    val cropped = graft.operators.Crop.box2d(docs, 635400, 848400, 638800, 853800)
    time("crop_count")(cropped.count())
    val tiled = graft.operators.Splitter(cropped, length = 500.0,
      origin = Some((635000.0, 848000.0)))
    time("splitter_count")(tiled.count())
    val coords = tiled.select("order_key", "x", "y", "z", "classification")
      .localCheckpoint(true)
    time("coords_checkpoint")(coords.count())
    time("knn_only") { // construction is eager now — time it all
      graft.operators.KnnJoin.knn(
        coords.select("order_key", "x", "y", "z"), coords, 5, cellSize = 50.0).count()
    }
    time("full_classify") {
      graft.operators.NeighborClassifier(tiled, k = 5, cellSize = 50.0)
        .select(count(lit(1))).head()
    }
    spark.stop()
  }
}
