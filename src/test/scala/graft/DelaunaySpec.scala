package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DelaunayCore, DelaunayMesh, FaceRaster, HagDelaunay}

/** Delaunay family: the Bowyer-Watson core, the distributed certified
  * tile triangulation (filters.delaunay analog,
  * filters/DelaunayFilter.cpp:61-94), and Delaunay-interpolated height
  * above ground (filters/HagDelaunayFilter.cpp:149-222). */
class DelaunaySpec extends AnyFunSuite {
  import TestSpark._

  private def randomPoints(n: Int, seed: Long): (Array[Double], Array[Double]) = {
    val rnd = new scala.util.Random(seed)
    (Array.fill(n)(rnd.nextDouble() * 1000),
      Array.fill(n)(rnd.nextDouble() * 800))
  }

  /** Empty-circumcircle property: no input point strictly inside any
    * triangle's circumcircle (relative slack for FP predicates). */
  private def assertDelaunay(px: Array[Double], py: Array[Double],
      tris: Array[Int]): Unit = {
    var i = 0
    while (i < tris.length) {
      val (a, b, c) = (tris(i), tris(i + 1), tris(i + 2))
      val cc = DelaunayCore.circumcircle(px(a), py(a), px(b), py(b), px(c), py(c))
      assert(cc != null, s"degenerate triangle ($a,$b,$c) emitted")
      val slack = 1e-9 * cc(2)
      for (p <- px.indices if p != a && p != b && p != c) {
        val d2 = (px(p) - cc(0)) * (px(p) - cc(0)) + (py(p) - cc(1)) * (py(p) - cc(1))
        assert(d2 >= cc(2) - slack,
          s"point $p strictly inside circumcircle of ($a,$b,$c): d2=$d2 r2=${cc(2)}")
      }
      i += 3
    }
  }

  private def hullSize(px: Array[Double], py: Array[Double]): Int = {
    // Andrew's monotone chain, collinear points dropped (strict turns)
    val pts = px.indices.map(i => (px(i), py(i))).sortBy(identity).toArray
    def half(ps: Seq[(Double, Double)]): List[(Double, Double)] = {
      var st = List.empty[(Double, Double)]
      for (p <- ps) {
        while (st.size >= 2 && {
          val (b, a) = (st.head, st.tail.head)
          (b._1 - a._1) * (p._2 - a._2) - (b._2 - a._2) * (p._1 - a._1) <= 0
        }) st = st.tail
        st = p :: st
      }
      st
    }
    half(pts.toSeq).size + half(pts.reverse.toSeq).size - 2
  }

  test("core: empty circumcircle + Euler count on random points") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val (px, py) = randomPoints(250, seed)
      val tris = DelaunayCore.triangulate(px, py)
      assertDelaunay(px, py, tris)
      // triangles = 2n - 2 - h for a triangulation of the convex hull
      val h = hullSize(px, py)
      assert(tris.length / 3 == 2 * 250 - 2 - h,
        s"seed=$seed: got ${tris.length / 3} triangles, hull $h")
    }
  }

  test("core: grid input (massive cocircular ties) is a valid triangulation") {
    val m = 14
    val px = Array.tabulate(m * m)(i => (i % m).toDouble)
    val py = Array.tabulate(m * m)(i => (i / m).toDouble)
    val tris = DelaunayCore.triangulate(px, py)
    // a triangulation of the full (m-1)^2 square grid: 2 triangles per cell
    assert(tris.length / 3 == 2 * (m - 1) * (m - 1))
    // total area = grid area; every triangle has area 1/2 on the lattice
    var area = 0.0
    var i = 0
    while (i < tris.length) {
      val (a, b, c) = (tris(i), tris(i + 1), tris(i + 2))
      area += math.abs((px(b) - px(a)) * (py(c) - py(a)) -
        (py(b) - py(a)) * (px(c) - px(a))) / 2
      i += 3
    }
    assert(math.abs(area - (m - 1.0) * (m - 1.0)) < 1e-9)
  }

  test("core: duplicates collapse, collinear yields no triangles") {
    val px = Array(0.0, 1.0, 0.0, 1.0, 0.5)
    val py = Array(0.0, 1.0, 0.0, 1.0, 0.5) // all on y=x, with a duplicate
    assert(DelaunayCore.triangulate(px, py).isEmpty)
    val (qx, qy) = (Array(0.0, 4.0, 2.0, 0.0), Array(0.0, 0.0, 3.0, 0.0))
    val tris = DelaunayCore.triangulate(qx, qy)
    assert(tris.length == 3) // duplicate of vertex 0 skipped -> one triangle
  }

  test("mesh: distributed tiles+escalation == single-task triangulation") {
    import spark.implicits._
    val (px, py) = randomPoints(400, 13L)
    val df = px.indices.map(i => (i.toLong, px(i), py(i))).toDF("order_key", "x", "y")
    val local = DelaunayMesh(df, targetPerTile = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // force a 4x4 tile grid and halo escalation on sparse corners
    val dist = DelaunayMesh(df, targetPerTile = 25L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val missing = local.toSet -- dist.toSet
    val extra = dist.toSet -- local.toSet
    assert(local.nonEmpty && missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(10)} extra=${extra.take(10)} " +
        s"nLocal=${local.length} nDist=${dist.length}")
    // and the single-task result is itself Delaunay
    val triIdx = local.flatMap(t => Seq(t._1.toInt, t._2.toInt, t._3.toInt)).toArray
    assertDelaunay(px, py, triIdx)
  }

  test("mesh: tiled path on the degenerate sheared lattice (q55 scene) still exact") {
    import spark.implicits._
    // two shifted rows: slender triangles with huge circumdisks force
    // halo escalation (possibly to fullCover) in every tile; the unique
    // Delaunay triangulation must still come out exactly
    val n = 120
    val df = (1 to n).map { e =>
      val i = (e - 1) / 2
      (e.toLong, i + (if ((e - 1) % 2 == 1) 0.5 else 0.0), ((e - 1) % 2).toDouble)
    }.toDF("order_key", "x", "y")
    val got = DelaunayMesh(df, targetPerTile = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val m = n / 2
    val want = (0 until m - 1).flatMap { i =>
      Seq((2L * i + 1, 2L * i + 3, 2L * i + 2), (2L * i + 2, 2L * i + 3, 2L * i + 4))
    }.toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("mesh: interior void wider than tile+halo — point-less owner tiles must not drop triangles") {
    import spark.implicits._
    // annulus: triangles spanning the central void have circumcenters in
    // point-less interior tiles. A tile with no points in its examined
    // region produces NO cogroup group; before the presence-row fix it
    // silently left `active` and its owned triangles were never emitted.
    val n = 240
    val pts = (0 until n).map { i =>
      val a = 2 * math.Pi * i / n
      val r = 100.0 + (i % 3) // slight radial jitter, no cocircular quads
      (i.toLong, 100.0 + r * math.cos(a), 100.0 + r * math.sin(a))
    }
    val df = pts.toDF("order_key", "x", "y")
    val local = DelaunayMesh(df, targetPerTile = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // targetPerTile 15 -> gridN=4: the 2x2 central tiles see no points at
    // the default halo (void radius ~97 >> tile 50 x 0.125)
    val dist = DelaunayMesh(df, targetPerTile = 15L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(local.nonEmpty && dist == local,
      s"missing=${(local -- dist).take(8)} extra=${(dist -- local).take(8)} " +
        s"nLocal=${local.size} nDist=${dist.size}")
  }

  test("hag_delaunay: planar ground is reproduced exactly inside the hull") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // ground = jittered grid on the plane z = 3 + 0.25x - 0.5y
    val ground = (for (i <- 0 until 20; j <- 0 until 20) yield {
      val x = i * 10.0 + rnd.nextDouble(); val y = j * 10.0 + rnd.nextDouble()
      (1000L + i * 20 + j, x, y, 3 + 0.25 * x - 0.5 * y, 2)
    }).toSeq
    // queries strictly interior
    val queries = (0 until 150).map { q =>
      val x = 20 + rnd.nextDouble() * 150; val y = 20 + rnd.nextDouble() * 150
      (q.toLong, x, y, 50.0 + q, 1)
    }
    val df = (ground ++ queries).toDF("order_key", "x", "y", "z", "classification")
    val out = HagDelaunay(df, count = 10).select("order_key", "x", "y", "z",
      "height_above_ground").collect()
    for (r <- out) {
      val (k, x, y, z, hag) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
      if (k >= 1000L) assert(hag == 0.0)
      else {
        // interior query: any Delaunay triangle of plane samples
        // interpolates the plane; nearest-z fallback would be off by
        // O(plane slope * spacing) and fail this bound
        val want = z - (3 + 0.25 * x - 0.5 * y)
        assert(math.abs(hag - want) < 1e-9, s"key=$k hag=$hag want=$want")
      }
    }
  }

  test("hag_delaunay: coincident-xy fast path, extrapolation off, constant ground") {
    import spark.implicits._
    val df = Seq(
      (0L, 0.0, 0.0, 7.0, 2), (1L, 10.0, 0.0, 7.0, 2), (2L, 0.0, 10.0, 7.0, 2),
      (3L, 10.0, 10.0, 7.0, 2),
      (10L, 0.0, 0.0, 12.0, 1),   // coincident with ground key 0
      (11L, 5.0, 5.0, 9.0, 1),    // interior
      (12L, 50.0, 50.0, 20.0, 1)  // far outside the ground bbox
    ).toDF("order_key", "x", "y", "z", "classification")
    val on = HagDelaunay(df, count = 3).select("order_key", "height_above_ground")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(on(10L) == 5.0) // 12 - 7 via the coincident fast path
    assert(math.abs(on(11L) - 2.0) < 1e-12)
    assert(on(12L) == 13.0) // outside triangulation -> nearest ground z
    val off = HagDelaunay(df, count = 3, allowExtrapolation = false)
      .select("order_key", "height_above_ground")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(off(12L) == 0.0) // keeps own z -> HAG 0 (reference :205-211)
    assert(off(11L) == on(11L)) // in-bounds unaffected
  }

  test("faceraster == local port of the reference raster loop") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val n = 300
    val px = Array.fill(n)(rnd.nextDouble() * 100)
    val py = Array.fill(n)(rnd.nextDouble() * 80)
    val pz = Array.fill(n)(rnd.nextDouble() * 50)
    val df = (0 until n).map(i => (i.toLong, px(i), py(i), pz(i)))
      .toDF("order_key", "x", "y", "z")
    val mesh = DelaunayMesh(df)
    val edge = 2.5
    val got = FaceRaster(df, mesh, edge)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // local port of FaceRasterFilter.cpp:84-151 (computed limits,
    // half-edge bbox loop, last-face-wins) over the same mesh rows
    val half = edge / 2; val eb = edge * 1e-6
    val ox = px.min - half; val oy = py.min - half
    val w = ((px.max - ox) / edge).toLong + 1; val h = ((py.max - oy) / edge).toLong + 1
    val faces = mesh.collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt,
      r.getLong(2).toInt))
    val want = scala.collection.mutable.Map[(Long, Long), Double]()
    for ((a, b, c) <- faces) { // canonical order == engine's max_by order
      val (xmn, xmx) = (Seq(px(a), px(b), px(c)).min, Seq(px(a), px(b), px(c)).max)
      val (ymn, ymx) = (Seq(py(a), py(b), py(c)).min, Seq(py(a), py(b), py(c)).max)
      def cl(v: Long, hi: Long) = math.max(0L, math.min(hi, v))
      val ax = cl(math.floor((xmn + half - eb - ox) / edge).toLong, w)
      val bx = cl(math.floor((xmx + half - ox) / edge).toLong, w)
      val ay = cl(math.floor((ymn + half - eb - oy) / edge).toLong, h)
      val by = cl(math.floor((ymx + half - oy) / edge).toLong, h)
      for (xi <- ax until bx; yi <- ay until by) {
        val x = ox + (xi + 0.5) * edge; val y = oy + (yi + 0.5) * edge
        val v = DelaunayCore.barycentricInterp(px(a), py(a), pz(a),
          px(b), py(b), pz(b), px(c), py(c), pz(c), x, y)
        if (!v.isInfinity) want((xi, yi)) = v
      }
    }
    assert(got.keySet == want.keySet,
      s"cells differ: extra=${(got.keySet -- want.keySet).take(5)} " +
        s"missing=${(want.keySet -- got.keySet).take(5)}")
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"cell $k")
    assert(got.nonEmpty)
  }

  test("faceraster: planar TIN reproduces the plane at cell centers") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val pts = (0 until 200).map { i =>
      val x = rnd.nextDouble() * 60; val y = rnd.nextDouble() * 60
      (i.toLong, x, y, 2.0 + 0.5 * x - 0.25 * y)
    }.toDF("order_key", "x", "y", "z")
    val out = FaceRaster(pts, DelaunayMesh(pts), edgeLength = 1.0,
      origin = Some((0.0, 0.0)), widthHeight = Some((60L, 60L))).collect()
    assert(out.length > 2000) // most interior cells covered
    for (r <- out) {
      val x = (r.getLong(0) + 0.5) * 1.0; val y = (r.getLong(1) + 0.5) * 1.0
      assert(math.abs(r.getDouble(2) - (2.0 + 0.5 * x - 0.25 * y)) < 1e-9)
    }
  }

  test("hag_delaunay == brute-force local reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      (i.toLong, rnd.nextDouble() * 500, rnd.nextDouble() * 500,
        rnd.nextDouble() * 100, if (i % 4 == 0) 2 else 1)
    }
    val df = rows.toDF("order_key", "x", "y", "z", "classification")
    val got = HagDelaunay(df, count = 10).select("order_key", "height_above_ground")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val g = rows.filter(_._5 == 2)
    val (mnx, mxx) = (g.map(_._2).min, g.map(_._2).max)
    val (mny, mxy) = (g.map(_._3).min, g.map(_._3).max)
    for ((k, x0, y0, z0, cls) <- rows) {
      val want = if (cls == 2) 0.0 else {
        val nb = g.map(p => ((p._2 - x0) * (p._2 - x0) + (p._3 - y0) * (p._3 - y0),
          p._1, p._2, p._3, p._4)).sortBy(t => (t._1, t._2)).take(10)
        val z1 =
          if (nb.head._3 == x0 && nb.head._4 == y0 || nb.size == 1) nb.head._5
          else {
            val px = nb.map(_._3).toArray; val py = nb.map(_._4).toArray
            val pz = nb.map(_._5).toArray
            val tris = DelaunayCore.triangulate(px, py)
            var z = Double.PositiveInfinity
            var i = 0
            while (i < tris.length && z.isInfinity) {
              val (a, b, c) = (tris(i), tris(i + 1), tris(i + 2))
              z = DelaunayCore.barycentricInterp(px(a), py(a), pz(a),
                px(b), py(b), pz(b), px(c), py(c), pz(c), x0, y0)
              i += 3
            }
            if (z.isInfinity) nb.head._5 else z
          }
        z0 - z1
      }
      assert(got(k) == want, s"key=$k got=${got(k)} want=$want")
    }
  }
}
