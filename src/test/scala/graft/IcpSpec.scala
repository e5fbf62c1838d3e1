package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Icp

/** filters.icp registration (filters/IterativeClosestPoint.cpp:53). */
class IcpSpec extends AnyFunSuite {
  import TestSpark._

  test("maxEigvec4: dominant eigenvector of a known symmetric 4x4") {
    // diag(7, 3, 1, -2) rotated by a permutation-free similarity is
    // overkill; the raw diagonal already exercises selection
    val v = Icp.maxEigvec4(Array(
      7, 0, 0, 0,
      0, 3, 0, 0,
      0, 0, 1, 0,
      0, 0, 0, -2.0))
    assert(math.abs(math.abs(v(0)) - 1.0) < 1e-12)
    // off-diagonal case: [[2,1],[1,2]] block has max eigvec (1,1)/sqrt2
    val v2 = Icp.maxEigvec4(Array(
      2, 1, 0, 0,
      1, 2, 0, 0,
      0, 0, 0.5, 0,
      0, 0, 0, 0.1))
    assert(math.abs(math.abs(v2(0)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(v2(0) - v2(1)) < 1e-10)
  }

  test("rigidFromMoments recovers a known rotation+translation") {
    val rnd = new scala.util.Random(9)
    val th = math.toRadians(17.0)
    val (c, s) = (math.cos(th), math.sin(th))
    val t = Array(4.0, -3.0, 2.5)
    val pts = Array.fill(200)(Array(rnd.nextDouble() * 50,
      rnd.nextDouble() * 50, rnd.nextDouble() * 50))
    // b -> a with a = R*b + t, R = rot about z
    val as = pts.map(b => Array(c * b(0) - s * b(1) + t(0),
      s * b(0) + c * b(1) + t(1), b(2) + t(2)))
    val n = pts.length.toDouble
    val sb = Array(0.0, 0, 0); val sa = Array(0.0, 0, 0)
    val sba = Array.fill(9)(0.0)
    pts.zip(as).foreach { case (b, a) =>
      for (i <- 0 until 3) { sb(i) += b(i); sa(i) += a(i) }
      for (i <- 0 until 3; j <- 0 until 3) sba(i * 3 + j) += b(i) * a(j)
    }
    val m = Icp.rigidFromMoments(n, sb, sa, sba)
    val want = Array(c, -s, 0, t(0), s, c, 0, t(1), 0, 0, 1, t(2), 0, 0, 0, 1)
    m.zip(want).zipWithIndex.foreach { case ((got, w), i) =>
      assert(math.abs(got - w) < 1e-9, s"element $i: $got vs $w")
    }
  }

  test("ICP registers a rotated+translated copy back onto the fixed cloud") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val fixed = (0 until 800).map { i =>
      (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100,
        rnd.nextDouble() * 30)
    }.toDF("order_key", "x", "y", "z")
    val th = math.toRadians(3.0)
    val (c, s) = (math.cos(th), math.sin(th))
    val moving = fixed.select(col("order_key"),
      (lit(c) * col("x") - lit(s) * col("y") + 5.0).as("x"),
      (lit(s) * col("x") + lit(c) * col("y") - 4.0).as("y"),
      (col("z") + 2.0).as("z"))
    val res = Icp(fixed, moving, maxIter = 30, cellSize = 25.0)
    assert(res.converged, s"not converged after ${res.iterations} iters")
    // registered moving must coincide with fixed pointwise
    val err = res.df.select(col("order_key"), col("x").as("mx"),
        col("y").as("my"), col("z").as("mz"))
      .join(fixed, "order_key")
      .select(max(sqrt((col("mx") - col("x")) * (col("mx") - col("x")) +
        (col("my") - col("y")) * (col("my") - col("y")) +
        (col("mz") - col("z")) * (col("mz") - col("z"))))).head().getDouble(0)
    assert(err < 1e-3, s"max registration error $err")
    // recovered transform is rigid: R^T R = I
    val t = res.transform
    val r = Array(t(0), t(1), t(2), t(4), t(5), t(6), t(8), t(9), t(10))
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => r(k * 3 + i) * r(k * 3 + j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("ICP composition: one 2-iteration run == two 1-iteration runs composed (t * tFinal)") {
    import spark.implicits._
    // Composition-order differential: running Icp twice with maxIter=1
    // (feeding the first result's cloud into the second) applies the
    // corrections sequentially BY CONSTRUCTION; a single maxIter=2 run
    // must accumulate the same total transform, which requires
    // pre-multiplication (tFinal' = t * tFinal). The scenario is
    // deliberately far from registered (25 deg on a lattice) so both
    // corrections are substantial and non-commuting.
    val fixed = (for (i <- 0 until 30; j <- 0 until 15)
      yield ((i * 15 + j).toLong, i * 1.0, j * 1.0, 0.3 * ((i * 7 + j * 3) % 5)))
      .toDF("order_key", "x", "y", "z")
    val th = math.toRadians(25.0)
    val (c, s) = (math.cos(th), math.sin(th))
    val moving = fixed.select(col("order_key"),
      (lit(c) * col("x") - lit(s) * col("y") + 0.4).as("x"),
      (lit(s) * col("x") + lit(c) * col("y") - 0.3).as("y"),
      (col("z") + 0.2).as("z"))
    val two = Icp(fixed, moving, maxIter = 2, cellSize = 8.0)
    val one = Icp(fixed, moving, maxIter = 1, cellSize = 8.0)
    val oneMore = Icp(fixed, one.df, maxIter = 1, cellSize = 8.0)
    // both transforms live in the fixed-centroid frame -> compose as 4x4
    val seq = Array.tabulate(16) { i =>
      val r = i / 4; val q = i % 4
      (0 until 4).map(k => oneMore.transform(r * 4 + k) * one.transform(k * 4 + q)).sum
    }
    // the corrections genuinely differ (non-trivial second step) ...
    val driftOfSecond = math.abs(oneMore.transform(0) - 1.0) +
      math.abs(oneMore.transform(3)) + math.abs(oneMore.transform(7))
    assert(driftOfSecond > 1e-3, s"second correction trivial: $driftOfSecond")
    // ... yet the 2-iteration accumulation equals the sequential product
    two.transform.zip(seq).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-9, s"element $i: $got vs $want")
    }
  }
}
