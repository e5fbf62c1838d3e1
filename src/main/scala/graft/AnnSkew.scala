package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF hot-cell skew study (VERDICT r3 #9): the scaladoc claim "cells
  * come from k-means, which splits dense regions into many cells by
  * construction" (ann/Ann.scala ivfPqTopK) measured, not asserted.
  *
  * Corpus: `hotFrac` of the vectors in ONE tight Gaussian blob (the
  * planted hot region — a boilerplate-embedding cluster at corpus
  * scale), the rest spread over a broad mixture. Three centroid sets
  * are compared on max-cell / mean-cell:
  *
  *   - space-uniform centroids (the strawman a fixed spatial grid is):
  *     the blob lands in ~1 cell -> ratio ~ hotFrac * nlist — the
  *     degenerate task that dies at 100 TB;
  *   - data-sampled seeds, 0 Lloyd rounds: seeds are drawn from the
  *     data distribution, so ~hotFrac*nlist of them sit inside the
  *     blob already — the ratio collapses;
  *   - data-sampled seeds + Lloyd rounds (the shipping trainIvfCentroids
  *     path): rounds tighten the allocation further.
  *
  * Appends a markdown table to BENCH/ivfpq_recall.md and FAILS LOUDLY
  * if the trained ratio exceeds the asserted bound (or the strawman
  * fails to demonstrate the problem, which would make the table
  * meaningless).
  *
  * Usage: runMain graft.AnnSkew [nVec] [dim] [nlist] [hotFrac]
  */
object AnnSkew {

  /** Deterministic mixture corpus with a planted hot blob at component 0
    * scaled down to sigmaHot. */
  def genCorpus(spark: org.apache.spark.sql.SparkSession, n: Long, dim: Int,
      hotFrac: Double, parts: Int = 32, nComp: Int = 200,
      sigma: Double = 0.9, sigmaHot: Double = 0.02): DataFrame = {
    import spark.implicits._
    val seedRnd = new java.util.SplittableRandom(7043L)
    val centers = Array.fill(nComp, dim)(seedRnd.nextGaussian())
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(0, n, 1, parts).mapPartitions { it =>
      val cs = bc.value
      it.map { idL =>
        val id = idL.longValue
        val r = new java.util.SplittableRandom(id * 0x9E3779B97F4A7C15L + 5L)
        val hot = r.nextDouble() < hotFrac
        val c = if (hot) cs(0) else cs(1 + r.nextInt(cs.length - 1))
        val s = if (hot) sigmaHot else sigma
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) { v(i) = (c(i) + s * r.nextGaussian()).toFloat; i += 1 }
        (id, v)
      }
    }.toDF("vec_id", "embedding")
  }

  /** Non-empty cell sizes of `corpus` under unit-normalized nearest-
    * centroid assignment (the same Coarse probe tree the search path
    * uses). */
  def cellSizes(corpus: DataFrame, cents: Array[Array[Double]],
      wsuper: Int = 8): Array[Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(graft.ann.Coarse.build(cents))
    val ws = wsuper
    corpus.select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        val c = bc.value
        it.map { v =>
          var nrm = 0.0; var i = 0
          while (i < v.length) { nrm += v(i) * v(i); i += 1 }
          val inv = (1.0 / math.max(math.sqrt(nrm), 1e-12)).toFloat
          val u = new Array[Float](v.length)
          i = 0
          while (i < v.length) { u(i) = v(i) * inv; i += 1 }
          c.nearest(u, ws)
        }
      }.toDF("cell").groupBy("cell").count()
      .select("count").as[Long].collect()
  }

  /** (maxCell, meanOverNlist, p99, nonEmptyCells, maxOverMean). */
  def stats(sizes: Array[Long], n: Long, nlist: Int)
      : (Long, Double, Long, Int, Double) = {
    val mx = sizes.max
    val mean = n.toDouble / nlist
    val sorted = sizes.sorted
    val p99 = sorted(math.min(sorted.length - 1, (sorted.length * 99) / 100))
    (mx, mean, p99, sizes.length, mx / mean)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val nlist = args.lift(2).map(_.toInt).getOrElse(256)
    val hotFrac = args.lift(3).map(_.toDouble).getOrElse(0.5)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, 16)
    val corpus = graft.core.Mat(genCorpus(spark, n, dim, hotFrac))

    // strawman: centroids uniform in SPACE (what a fixed grid/random-
    // plane cell layout does) — the hot blob cannot be subdivided
    val rnd = new java.util.SplittableRandom(99L)
    val uniform = Array.fill(nlist) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    val rows = scala.collection.mutable.ArrayBuffer[String]()
    def row(label: String, cents: Array[Array[Double]]): Double = {
      val t0 = System.nanoTime()
      val s = stats(cellSizes(corpus, cents), n, nlist)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[annskew] $label: max=${s._1} mean=${s._2}%.0f p99=${s._3} " +
        f"cells=${s._4} max/mean=${s._5}%.1f ($secs%.1f s)")
      rows += f"| $label | ${s._1} | ${s._2}%.0f | ${s._3} | ${s._4} | ${s._5}%.1f |"
      s._5
    }
    val strawman = row("space-uniform centroids", uniform)
    val r0 = row("data-sampled seeds, 0 Lloyd rounds",
      graft.ann.Ann.trainIvfCentroids(corpus, nlist, iters = 0))
    val r3 = row("data-sampled + 3 Lloyd rounds (shipping path)",
      graft.ann.Ann.trainIvfCentroids(corpus, nlist, iters = 3))

    val md = new StringBuilder()
      .append(s"\n## IVF hot-cell skew — $n vectors, dim $dim, nlist $nlist, ")
      .append(f"${hotFrac * 100}%.0f%% planted point-mass blob (graft.AnnSkew)\n\n")
      .append("The scan stage is a cell cogroup (one cell = one task); ")
      .append("max-cell/mean-cell IS the straggler factor. Bound asserted: ")
      .append("trained ratio <= 8.\n\n")
      .append("| centroids | max cell | mean (n/nlist) | p99 | non-empty | max/mean |\n")
      .append("|---|---|---|---|---|---|\n")
      .append(rows.mkString("\n")).append("\n")
    val f = java.nio.file.Paths.get("BENCH/ivfpq_recall.md")
    if (!java.nio.file.Files.exists(f))
      java.nio.file.Files.writeString(f, "# IVF-PQ operating-point study\n")
    java.nio.file.Files.writeString(f,
      java.nio.file.Files.readString(f) + md.toString)
    println("[annskew] appended BENCH/ivfpq_recall.md")
    require(strawman >= 10.0,
      f"strawman ratio $strawman%.1f too small — the planted blob is not " +
      "hot enough to demonstrate anything")
    require(r3 <= 8.0,
      f"trained max/mean $r3%.1f exceeds the 8x bound — k-means is not " +
      "splitting the hot region")
    require(r3 <= r0 * 1.5 + 1,
      f"Lloyd rounds made skew materially worse ($r0%.1f -> $r3%.1f)")
    spark.stop()
  }
}
