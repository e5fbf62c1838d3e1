package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GroundGrid, GridSurface, Pmf, Smrf, HagNn, HagDem,
  Zsmooth, SkewnessBalancing, RasterGrid}

/** Ground/terrain family: morphological ground classification, height
  * above ground, z-smoothing, skewness balancing. Reference behaviors:
  * filters/PMFFilter.cpp, filters/SMRFilter.cpp, filters/HagNnFilter.cpp,
  * filters/HagDemFilter.cpp, filters/ZsmoothFilter.cpp,
  * filters/SkewnessBalancingFilter.cpp. */
class GroundSpec extends AnyFunSuite {
  import TestSpark._

  /** Direct port of pdal::math::erodeDiamond/dilateDiamond
    * (pdal/private/MathUtils.cpp:258-329) as the local oracle for the
    * distributed tile+halo morphology. */
  private def localMorph(data: Array[Double], rows: Int, cols: Int,
      iterations: Int, erode: Boolean): Array[Double] = {
    var cur = data.clone()
    for (_ <- 0 until iterations) {
      val out = new Array[Double](cur.length)
      for (c <- 0 until cols; r <- 0 until rows) {
        val i = c * rows + r
        var best = cur(i)
        def consider(j: Int): Unit = {
          val v = cur(j)
          if (!v.isNaN && (best.isNaN || (if (erode) v < best else v > best)))
            best = v
        }
        if (r > 0) consider(i - 1)
        if (r < rows - 1) consider(i + 1)
        if (c > 0) consider(i - rows)
        if (c < cols - 1) consider(i + rows)
        out(i) = best
      }
      cur = out
    }
    cur
  }

  test("morphDiamond tile+halo == local reference loop (erode + dilate, halo crossing)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cols = 37; val rows = 29
    val data = Array.fill(cols * rows)(rnd.nextDouble() * 100)
    val g = GroundGrid(0, 0, 1.0, cols, rows)
    val df = (0 until cols).flatMap(c => (0 until rows).map(r =>
      (c, r, data(c * rows + r)))).toDF("c", "r", "z")
    for (iters <- Seq(1, 2, 5); erode <- Seq(true, false)) {
      // tile=8 << grid forces many tiles and halo exchange across them
      val got = GridSurface.morphDiamond(df, g, iters, erode, tile = 8)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val want = localMorph(data, rows, cols, iters, erode)
      assert(got.size == cols * rows)
      for (c <- 0 until cols; r <- 0 until rows)
        assert(got((c, r)) == want(c * rows + r),
          s"mismatch at ($c,$r) iters=$iters erode=$erode")
    }
  }

  test("inpaint: nearest-populated (k=1) and mean-of-8 fill the holes deterministically") {
    import spark.implicits._
    // 6x6 grid, only two populated cells
    val g = GroundGrid(0, 0, 1.0, 6, 6)
    val sparse = Seq((0, 0, 10.0), (5, 5, 40.0)).toDF("c", "r", "z")
    val dense = GridSurface.densify(sparse, g)
    assert(dense.count() == 36 && dense.filter(col("z").isNull).count() == 34)
    val near = GridSurface.inpaint(dense, g, k = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(near.size == 36)
    assert(near((1, 0)) == 10.0 && near((4, 5)) == 40.0)
    // cell (2,3) is equidistant from both (d2 = 13 each) -> the lower
    // reference cell key c*rows+r (cell (0,0), key 0) wins the tie
    assert(near((2, 3)) == 10.0)
    val avg = GridSurface.inpaint(dense, g, k = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // only two candidates exist: every hole is their running mean = 25
    assert(avg((3, 2)) == 25.0)
  }

  test("PMF: planted flat terrain + building block -> building is non-ground (filters.pmf)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 60x60 m flat terrain at z~0, 5x5 m building at z=12 in the middle
    val terrain = (0 until 3000).map { i =>
      val x = rnd.nextDouble() * 60; val y = rnd.nextDouble() * 60
      (i.toLong, x, y, rnd.nextDouble() * 0.1)
    }
    val building = (0 until 400).map { i =>
      val x = 27 + rnd.nextDouble() * 5; val y = 27 + rnd.nextDouble() * 5
      ((3000 + i).toLong, x, y, 12.0 + rnd.nextDouble() * 0.1)
    }
    val df = (terrain ++ building).toDF("order_key", "x", "y", "z")
    val out = Pmf(df, cellSize = 1.0, initialDistance = 0.5, maxDistance = 2.5,
      maxWindowSize = 20.0, slope = 1.0, returns = Seq.empty)
    val byClass = out.groupBy("classification")
      .agg(count(when(col("order_key") >= 3000, 1)).as("bldg"),
        count(when(col("order_key") < 3000, 1)).as("terr"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every building point must be non-ground; the vast majority of the
    // terrain stays ground (cells shadowed by the opening may flip)
    assert(byClass.getOrElse(2, (0L, 0L))._1 == 0L, "building leaked into ground")
    assert(byClass(2)._2 > 2500, s"too little terrain kept: ${byClass(2)._2}")
    assert(byClass(1)._1 == 400L)
  }

  test("PMF/SMRF: every point ignored -> pass-through, no crash (reference no-ops on empty)") {
    import spark.implicits._
    val df = (0 until 20).map(i => (i.toLong, i * 1.0, i * 2.0, 0.5))
      .toDF("order_key", "x", "y", "z")
    // ignore matches every row: the min/max grid aggregate sees no inliers
    val pm = Pmf(df, returns = Seq.empty, ignore = Some("Z[0:100]"))
    assert(pm.count() == 20 && pm.filter(col("classification") === 2).count() == 0)
    val sm = Smrf(df, returns = Seq.empty, ignore = Some("Z[0:100]"))
    assert(sm.count() == 20 && sm.filter(col("classification") === 2).count() == 0)
  }

  test("SMRF: planted terrain + building -> building non-ground, slope tolerated (filters.smrf)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // sloped terrain z = 0.05x, building block at z+10
    val terrain = (0 until 3000).map { i =>
      val x = rnd.nextDouble() * 60; val y = rnd.nextDouble() * 60
      (i.toLong, x, y, 0.05 * x + rnd.nextDouble() * 0.05)
    }
    val building = (0 until 400).map { i =>
      val x = 20 + rnd.nextDouble() * 6; val y = 20 + rnd.nextDouble() * 6
      ((3000 + i).toLong, x, y, 0.05 * x + 10.0 + rnd.nextDouble() * 0.1)
    }
    val df = (terrain ++ building).toDF("order_key", "x", "y", "z")
    val out = Smrf(df, cell = 1.0, slope = 0.15, scalar = 1.25,
      threshold = 0.5, window = 10.0, returns = Seq.empty)
    val bldgGround = out.filter(col("order_key") >= 3000 &&
      col("classification") === 2).count()
    val terrGround = out.filter(col("order_key") < 3000 &&
      col("classification") === 2).count()
    assert(bldgGround == 0L, "building leaked into ground")
    assert(terrGround > 2500L, s"too little terrain kept: $terrGround")
  }

  test("HagNn: coincident / IDW / max_distance / no-extrapolation semantics") {
    import spark.implicits._
    val pts = Seq(
      // ground
      (1L, 0.0, 0.0, 10.0, 2), (2L, 10.0, 0.0, 20.0, 2), (3L, 0.0, 10.0, 30.0, 2),
      // non-ground: coincident with ground point 1
      (10L, 0.0, 0.0, 15.0, 1),
      // non-ground: interior, IDW of the k nearest
      (11L, 2.0, 0.0, 18.0, 1),
      // non-ground: far outside the ground bbox
      (12L, 100.0, 100.0, 50.0, 1)
    ).toDF("order_key", "x", "y", "z", "classification")

    val one = HagNn(pts, count = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(one(1L) == 0.0 && one(2L) == 0.0)
    assert(one(10L) == 5.0) // coincident -> z1 = 10
    assert(one(11L) == 8.0) // nearest to (2,0) is g1 at d2=4 -> z1=10

    val three = HagNn(pts, count = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    // IDW for point 11: d2 to g1=4, g2=64, g3=104
    val w = Seq(1 / 4.0, 1 / 64.0, 1 / 104.0)
    val z1 = (10 * w(0) + 20 * w(1) + 30 * w(2)) / w.sum
    assert(math.abs(three(11L) - (18.0 - z1)) < 1e-12)

    // max_distance excludes the two far grounds -> only g1 contributes
    val md = HagNn(pts, count = 3, maxDistance = 5.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(math.abs(md(11L) - 8.0) < 1e-12)

    // no extrapolation: point 12 outside ground bbox keeps z -> hag 0
    val ne = HagNn(pts, count = 3, allowExtrapolation = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(ne(12L) == 0.0)
    // with extrapolation it interpolates instead
    assert(three(12L) != 0.0)
  }

  test("HagDem: raster join, zero_ground, off-raster default (filters.hag_dem)") {
    import spark.implicits._
    val raster = Seq((0, 0, 5.0), (1, 0, 7.0)).toDF("cell_x", "cell_y", "band1")
    val grid = RasterGrid(0, 0, 10.0)
    val pts = Seq(
      (1L, 3.0, 3.0, 15.0, 1),  // cell (0,0): hag = 10
      (2L, 13.0, 3.0, 10.0, 2), // ground + zero_ground -> 0
      (3L, 55.0, 3.0, 9.0, 1)   // off raster -> default 0
    ).toDF("order_key", "x", "y", "z", "classification")
    val out = HagDem(pts, raster, grid).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(out(1L) == 10.0 && out(2L) == 0.0 && out(3L) == 0.0)
    val noZero = HagDem(pts, raster, grid, zeroGround = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(noZero(2L) == 3.0)
  }

  test("Zsmooth == brute-force percentile over 2D radius neighbors (filters.zsmooth)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val pts = (0 until 300).map { i =>
      (i.toLong, rnd.nextDouble() * 20, rnd.nextDouble() * 20,
        rnd.nextDouble() * 50)
    }
    val df = pts.toDF("order_key", "x", "y", "z")
    for (pct <- Seq(0.0, 37.0, 50.0, 100.0)) {
      val got = Zsmooth(df, radius = 2.5, medianPercent = pct).collect()
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
      pts.foreach { case (id, x, y, z) =>
        val nbr = pts.filter { case (id2, x2, y2, _) =>
          id2 != id && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= 2.5 * 2.5
        }.map(_._4).sorted
        val want =
          if (nbr.isEmpty) z
          else if (nbr.size == 1) nbr.head
          else if (pct == 0.0) nbr.head
          else if (pct == 100.0) nbr.last
          else {
            val pos = pct / 100.0 * (nbr.size - 1)
            val low = pos.toInt
            val hf = pos - low
            nbr(low) * (1 - hf) + nbr(low + 1) * hf
          }
        assert(math.abs(got(id) - want) < 1e-9, s"id=$id pct=$pct")
      }
    }
  }

  /** Direct port of the reference's incremental-moment walk
    * (SkewnessBalancingFilter.cpp:60-106) as the semantic oracle. */
  private def localSkewnessBalance(zsSorted: Seq[Double]): Seq[Int] = {
    var m1 = 0.0; var m2 = 0.0; var m3 = 0.0
    var n = 0L
    var lastPositive = 0
    var skew = 0.0
    var lastSkew = Double.NaN
    val cls = Array.fill(zsSorted.size)(0)
    for (i <- zsSorted.indices) {
      val z = zsSorted(i)
      val n1 = n; n += 1
      val delta = z - m1; val dn = delta / n
      val t1 = delta * dn * n1
      m1 += dn
      m3 += t1 * dn * (n - 2) - 3 * dn * m2
      m2 += t1
      skew = math.sqrt(n.toDouble) * m3 / math.pow(m2, 1.5)
      if (skew > 0 && lastSkew <= 0) {
        for (j <- lastPositive to i - 1) cls(j) = 2
        lastPositive = i
      }
      lastSkew = skew
    }
    val tail = if (lastPositive == 0 && skew <= 0) 2 else 1
    for (j <- lastPositive until zsSorted.size) cls(j) = tail
    cls.toSeq
  }

  test("SkewnessBalancing matches the reference walk (filters.skewnessbalancing)") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    // integer-valued z keeps both formulations FP-exact in any sum order
    val zs = (0 until 2000).map(_ => rnd.nextInt(1000).toDouble) ++
      (0 until 30).map(_ => 5000.0 + rnd.nextInt(100)) // high outliers
    val df = zs.zipWithIndex.map { case (z, i) => (i.toLong, z) }
      .toDF("order_key", "z")
    val got = SkewnessBalancing(df)
      .select("order_key", "z", "classification").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val order = zs.zipWithIndex.sortBy { case (z, i) => (z, i) }
    val want = localSkewnessBalance(order.map(_._1))
    order.zipWithIndex.foreach { case ((_, id), pos) =>
      assert(got(id.toLong) == want(pos), s"order_key=$id pos=$pos")
    }
    // sanity: the planted high outliers are not ground
    (2000 until 2030).foreach(i => assert(got(i.toLong) == 1))
  }
}
