package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Eigen3, EigenFeatures}

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
}
