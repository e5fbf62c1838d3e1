package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query plus the flagship
  * crop->splitter->kNN pipeline on SPARK_GRAFT_SF_DIR, one JSON line out. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.local(cpus, cpus)
    // warm the JVM/codegen path once on the smallest table
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def time(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 }
    }
    results("flagship_pipeline") =
      try time(SparkEntry.entry(spark).count()) catch { case _: Throwable => -1.0 }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Scaling-efficiency evidence for the north rule (BASELINE.json): the
  * same flagship job at local[8] vs local[32] on identical input; reports
  * docs/sec at both plus efficiency = (T8/T32)/4, appended to
  * BENCH/BASELINE.md. No real cluster exists in this sandbox — two
  * parallelism levels stand in for N and 4N executors (BASELINE.md
  * protocol). */
object ScalingBench {
  /** `run <docs> <cores>` — one measurement in a fresh JVM, appended to
    * BENCH/raw.tsv. `report <docs>` — min-of-runs per level ->
    * BENCH/BASELINE.md. Separate JVMs per level keep heap/GC state of one
    * level from polluting the other. */
  def main(args: Array[String]): Unit = args.toList match {
    case "run" :: d :: c :: Nil => runOnce(d.toLong, c.toInt)
    case "report" :: d :: lo :: hi :: Nil => report(d.toLong, lo.toInt, hi.toInt)
    case "report" :: d :: Nil => report(d.toLong, 8, 32)
    case _ =>
      val n = args.headOption.map(_.toLong).getOrElse(2000000L)
      runOnce(n, 8); runOnce(n, 32); report(n, 8, 32)
  }

  def runOnce(nDocs: Long, cores: Int): Unit = {
    // identical shuffle partitioning at both parallelism levels — only
    // the core count varies (a cluster sizes partitions to data, not to
    // the executor count)
    val spark = graft.core.GraftSession.local(cores, shufflePartitions = 128)
    try {
      import org.apache.spark.sql.functions._
      val docs = graft.core.Synth.docs(spark, nDocs, seed = 42, numPartitions = 128)
      // warm-up: force one full synth+scan so JIT/codegen costs drop out
      docs.select(count(lit(1))).head()
      val t0 = System.nanoTime()
      val cropped = graft.operators.Crop.box2d(docs, 635400, 848400, 638800, 853800)
      val tiled = graft.operators.Splitter(cropped, length = 500.0,
        origin = Some((635000.0, 848000.0)))
      val classified = graft.operators.NeighborClassifier(tiled, k = 5,
        cellSize = 50.0)
      val n = classified.select(count(lit(1)), sum("classification")).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(s"[scaling] cores=$cores docs=$nDocs out=$n secs=$secs docs/sec=${nDocs / secs}")
      val dir = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("raw.tsv"),
        s"$nDocs\t$cores\t$secs\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    } finally spark.stop()
  }

  def report(nDocs: Long, cLo: Int, cHi: Int): Unit = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("BENCH/raw.tsv")).toArray.map(_.toString)
      .map(_.split('\t')).filter(_(0).toLong == nDocs)
    def best(c: Int) = lines.filter(_(1).toInt == c).map(_(2).toDouble).min
    val t8 = best(cLo); val t32 = best(cHi)
    val ratio = cHi.toDouble / cLo
    val eff = (t8 / t32) / ratio
    println(f"[scaling] N=$cLo%d 4N=$cHi%d tN=$t8%.1f t4N=$t32%.1f speedup=${t8 / t32}%.2f efficiency=$eff%.3f")
    val f = java.nio.file.Paths.get("BENCH/BASELINE.md")
    val header =
      """# BENCH scaling evidence (local[8] vs local[32], same input)
        |
        |Flagship pipeline: synth docs -> crop(box) -> splitter(500, origin)
        |-> neighborclassifier(k=5) -> count. Fresh JVM per level, identical
        |128 shuffle partitions, best of repeated runs per level.
        |Efficiency = (T8/T32)/4, target >= 0.8 (BASELINE.json north rule,
        |sandbox protocol standing in for N vs 4N executors).
        |
        || docs | N -> 4N cores | docs/sec @N | docs/sec @4N | speedup | efficiency |
        ||---|---|---|---|---|---|
        |""".stripMargin
    val line = f"| $nDocs | $cLo -> $cHi | ${nDocs / t8}%.0f | ${nDocs / t32}%.0f | ${t8 / t32}%.2fx | $eff%.3f |"
    if (!java.nio.file.Files.exists(f)) java.nio.file.Files.writeString(f, header)
    java.nio.file.Files.writeString(f, java.nio.file.Files.readString(f) + line + "\n")
  }
}
