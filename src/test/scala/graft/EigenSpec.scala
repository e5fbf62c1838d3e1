package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Eigen3, EigenFeatures, OptimalNeighborhood, PlaneFit, MiniballFilter}

class EigenSpec extends AnyFunSuite {
  import TestSpark._

  test("Eigen3 closed form: eigen invariants + known matrices") {
    // diagonal
    val d = Eigen3.decompose(3, 0, 0, 2, 0, 1)
    assert(d.take(3).toSeq == Seq(3.0, 2.0, 1.0))
    // full symmetric: invariants trace and determinant
    val (xx, xy, xz, yy, yz, zz) = (4.0, 1.0, 0.5, 3.0, 0.25, 2.0)
    val r = Eigen3.decompose(xx, xy, xz, yy, yz, zz)
    val trace = xx + yy + zz
    val det = xx * (yy * zz - yz * yz) - xy * (xy * zz - yz * xz) +
      xz * (xy * yz - yy * xz)
    assert(math.abs(r(0) + r(1) + r(2) - trace) < 1e-9)
    assert(math.abs(r(0) * r(1) * r(2) - det) < 1e-9)
    assert(r(0) >= r(1) && r(1) >= r(2))
    // normal is a unit eigenvector of the smallest eigenvalue: A*n = l3*n
    val n = Array(r(3), r(4), r(5))
    val an = Array(
      xx * n(0) + xy * n(1) + xz * n(2),
      xy * n(0) + yy * n(1) + yz * n(2),
      xz * n(0) + yz * n(1) + zz * n(2))
    (0 to 2).foreach(i => assert(math.abs(an(i) - r(2) * n(i)) < 1e-9))
  }

  test("planar cloud: high planarity, normal ~ plane normal (filters.normal)") {
    import spark.implicits._
    // points on plane z = 0.2x + 0.1y with tiny noise
    val rnd = new scala.util.Random(5)
    val pts = (0 until 400).map { i =>
      val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
      (i.toLong, x, y, 0.2 * x + 0.1 * y + rnd.nextGaussian() * 0.01, 0)
    }.toDF("order_key", "x", "y", "z", "classification")
    val out = EigenFeatures(pts, k = 12)
    val r = out.agg(avg("planarity"), avg("sphericity"),
      avg("normal_x"), avg("normal_y"), avg("normal_z")).head()
    assert(r.getDouble(0) > 0.5, s"planarity ${r.getDouble(0)}")
    assert(r.getDouble(1) < 0.05, s"sphericity ${r.getDouble(1)}")
    // plane z = 0.2x + 0.1y -> normal ∝ (-0.2, -0.1, 1)
    val n = Array(r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val exp = {
      val v = Array(-0.2, -0.1, 1.0); val l = math.sqrt(v.map(a => a * a).sum)
      v.map(_ / l)
    }
    (0 to 2).foreach(i => assert(math.abs(n(i) - exp(i)) < 0.05,
      s"normal($i)=${n(i)} expected ${exp(i)}"))
    assert(out.filter(col("coplanar") === 1).count() > 300)
    assert(out.filter(col("rank") =!= 2 && col("rank") =!= 3).count() < 50)
  }

  test("volumetric cloud: low planarity, higher sphericity") {
    val docs = graft.core.Synth.docs(spark, 400, seed = 17)
    val out = EigenFeatures(docs, k = 10)
    assert(out.count() == 400)
    val sph = out.agg(avg("sphericity")).head().getDouble(0)
    assert(sph > 0.02, s"sphericity $sph should be clearly nonzero for a 3D cloud")
  }

  test("optimalneighborhood: differential vs reference selection " +
      "(OptimalNeighborhoodFilter.cpp:72-165)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    // flat sheet: entropy decreases as the neighborhood grows (planarity
    // sharpens) -> optimum at kMax
    val flat = (0 until 300).map(i =>
      (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100,
        rnd.nextGaussian() * 0.001))
      .toDF("order_key", "x", "y", "z")
    val out = OptimalNeighborhood(flat, kMin = 6, kMax = 12)
    assert(out.count() == 300)
    assert(out.filter(col("optimal_knn").isNull).count() == 0)
    assert(out.filter(col("optimal_radius") <= 0).count() == 0)
    // differential: replicate the reference selection (prefix sample
    // covariance -> eigenentropy -> argmin, ties to smallest k) in plain
    // Scala for a sample of points and compare k and radius exactly
    val all = flat.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val got = out.select("order_key", "optimal_knn", "optimal_radius")
      .filter(col("order_key") < 10).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    got.foreach { case (qid, (gk, gr)) =>
      val (_, qx, qy, qz) = all.find(_._1 == qid).get
      val nbrs = all.map { case (cid, x, y, z) =>
        val d2 = (x - qx) * (x - qx) + (y - qy) * (y - qy) + (z - qz) * (z - qz)
        (d2, cid, x - qx, y - qy, z - qz)
      }.sortBy(t => (t._1, t._2)).take(12)
      var best = (Double.MaxValue, 0, 0.0)
      for (k <- 6 to 12) {
        val pre = nbrs.take(k)
        val n = k.toDouble
        def m(f: ((Double, Long, Double, Double, Double)) => Double) = pre.map(f).sum / n
        val (mx, my, mz) = (m(_._3), m(_._4), m(_._5))
        val f = n / (n - 1)
        val e = Eigen3.decompose(
          (m(t => t._3 * t._3) - mx * mx) * f, (m(t => t._3 * t._4) - mx * my) * f,
          (m(t => t._3 * t._5) - mx * mz) * f, (m(t => t._4 * t._4) - my * my) * f,
          (m(t => t._4 * t._5) - my * mz) * f, (m(t => t._5 * t._5) - mz * mz) * f)
        val ls = e.take(3).map(math.max(_, 0.0))
        val s = ls.sum
        val ent = -ls.map(_ / s).map(l => if (l > 0) l * math.log(l) else 0.0).sum
        if (ent < best._1) best = (ent, k, math.sqrt(pre.last._1))
      }
      assert(gk == best._2, s"qid=$qid k $gk != ${best._2}")
      assert(math.abs(gr - best._3) < 1e-9, s"qid=$qid radius")
    }
    // entropy tie/containment sanity on a 3D blob: k within [kMin, kMax]
    val blob = graft.core.Synth.docs(spark, 200, seed = 21)
    val ob = OptimalNeighborhood(blob, kMin = 4, kMax = 8)
    val mm = ob.agg(min("optimal_knn"), max("optimal_knn")).head()
    assert(mm.getInt(0) >= 4 && mm.getInt(1) <= 8)
  }

  test("planefit: on-plane points score ~0, off-plane outlier scores high " +
      "(PlaneFitFilter.cpp:115-152)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val plane = (0 until 200).map(i =>
      (i.toLong, rnd.nextDouble() * 100, rnd.nextDouble() * 100, 0.0))
    val outlier = Seq((200L, 50.0, 50.0, 30.0)) // far above the sheet
    val df = (plane ++ outlier).toDF("order_key", "x", "y", "z")
    val out = PlaneFit(df, knn = 8)
    val onPlane = out.filter(col("order_key") < 200)
      .agg(avg("plane_fit")).head().getDouble(0)
    val off = out.filter(col("order_key") === 200)
      .head().getAs[Double]("plane_fit")
    assert(onPlane < 0.2, s"on-plane mean $onPlane")
    assert(off > 0.9, s"outlier $off (d >> d_bar of its planar neighbors)")
  }

  test("miniball: Welzl ball is minimal+enclosing; criterion separates " +
      "outlier (MiniballFilter.cpp:101-147)") {
    // unit cube corners -> circumscribed ball radius sqrt(3)/2
    val cube = (for (x <- 0 to 1; y <- 0 to 1; z <- 0 to 1)
      yield Array(x.toDouble, y.toDouble, z.toDouble)).toArray
    val (cx, cy, cz, r) = graft.operators.Seb3.ball(cube)
    assert(math.abs(cx - 0.5) < 1e-9 && math.abs(cy - 0.5) < 1e-9 &&
      math.abs(cz - 0.5) < 1e-9)
    assert(math.abs(r - math.sqrt(3.0) / 2) < 1e-9, s"radius $r")
    // collinear + duplicate robustness
    val line = Array(Array(0.0, 0.0, 0.0), Array(2.0, 0.0, 0.0),
      Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0))
    val lb = graft.operators.Seb3.ball(line)
    assert(math.abs(lb._4 - 1.0) < 1e-9 && math.abs(lb._1 - 1.0) < 1e-9)
    // dataframe operator: centered point scores 0-ish, far outlier ~1
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val blob = (0 until 100).map(i =>
      (i.toLong, rnd.nextDouble() * 10, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val far = Seq((100L, 500.0, 500.0, 500.0))
    val df = (blob ++ far).toDF("order_key", "x", "y", "z")
    val out = MiniballFilter(df, knn = 8)
    assert(out.count() == 101)
    val farScore = out.filter(col("order_key") === 100)
      .head().getAs[Double]("miniball")
    assert(farScore > 0.95, s"far point $farScore")
    val blobAvg = out.filter(col("order_key") < 100)
      .agg(avg("miniball")).head().getDouble(0)
    assert(blobAvg < 0.6, s"blob avg $blobAvg")
  }

  test("info nearest-to-query list (InfoFilter.cpp:58-64)") {
    val docs = graft.core.Synth.docs(spark, 500, seed = 23)
    val q = docs.select("x", "y").head()
    val near = graft.operators.Info.nearest(docs, q.getDouble(0), q.getDouble(1), count = 5)
    assert(near.count() == 5)
    val dists = near.select("distance").collect().map(_.getDouble(0))
    assert(dists.head == 0.0) // the query point itself is in the cloud
    assert(dists.sameElements(dists.sorted))
  }
}
