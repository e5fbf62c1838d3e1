package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LiTree

/** filters.litree (filters/LiTreeFilter.cpp:120-295) — planted-forest
  * behavior plus an exact differential against a sequential port of the
  * reference loop (same order convention: points classified in
  * order_key order; the reference's own Ui order is a vector-swap
  * artifact). */
class LiTreeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Sequential port of LiTreeFilter::filter with Ui kept in order_key
    * order: global-max seed, farthest-in-dummyRadius n0, nearest-set
    * classification with the localMax dt gate, min_points acceptance. */
  private def liTreeLocal(pts: Array[(Long, Double, Double, Double)],
      minPoints: Int, minHag: Double, dummyRadius: Double): Map[Long, Long] = {
    def d2(a: (Double, Double), b: (Double, Double)) =
      (a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2)
    val xy = pts.map(p => p._1 -> (p._2, p._3)).toMap
    val hag = pts.map(p => p._1 -> p._4).toMap
    val lmax = pts.map { p =>
      p._1 -> !pts.exists(q => d2(xy(p._1), xy(q._1)) <= 4.0 && q._4 > p._4)
    }.toMap
    var ui = pts.map(_._1).sorted
    val out = scala.collection.mutable.Map[Long, Long]()
    var treeId = 1L
    while (ui.length > 1) {
      val t0 = ui.minBy(k => (-hag(k), k))
      if (hag(t0) < minHag) return out.toMap
      val inD = ui.filter(k => d2(xy(k), xy(t0)) <= dummyRadius * dummyRadius)
      val n0 = inD.maxBy(k => (d2(xy(k), xy(t0)), -k))
      val pi = scala.collection.mutable.ArrayBuffer[Long](t0)
      val ni = scala.collection.mutable.ArrayBuffer[Long](n0)
      for (u <- ui) {
        if (d2(xy(u), xy(t0)) < 100.0) {
          if (!pi.contains(u) && !ni.contains(u)) {
            val dmin1 = math.sqrt(pi.map(p => d2(xy(u), xy(p))).min)
            val dmin2 = math.sqrt(ni.map(p => d2(xy(u), xy(p))).min)
            val dt = if (hag(u) > 15) 2.0 else 1.5
            val toPi = if (!lmax(u)) dmin1 <= dmin2
              else if (dmin1 > dt) false else dmin1 <= dmin2
            if (toPi) pi += u else ni += u
          }
        } else ni += u
      }
      if (pi.length >= minPoints) { pi.foreach(k => out(k) = treeId); treeId += 1 }
      ui = ui.filterNot(pi.contains)
    }
    out.toMap
  }

  /** Two gaussian-cone crowns well apart plus low vegetation: each crown
    * is one cluster (tallest = id 1), low veg and sparse noise stay 0. */
  test("planted forest: crowns segmented, low veg untouched") {
    val rnd = new scala.util.Random(7)
    def crown(cx: Double, cy: Double, hmax: Double, n: Int, keyBase: Long) =
      (0 until n).map { i =>
        val ang = rnd.nextDouble() * 2 * math.Pi
        val r = rnd.nextDouble() * 4
        (keyBase + i, cx + r * math.cos(ang), cy + r * math.sin(ang),
          math.max(0.5, hmax - 2 * r - rnd.nextDouble() * 0.3))
      }
    val a = crown(0, 0, 18, 40, 0L)      // taller tree
    val b = crown(200, 0, 12, 30, 1000L) // shorter tree, far away
    val veg = (0 until 20).map(i =>
      (2000L + i, 100.0 + i * 3, 50.0, 0.5 + rnd.nextDouble()))
    val df = (a ++ b ++ veg).toDF("order_key", "x", "y", "height_above_ground")
    val got = LiTree(df).select("order_key", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact vs the sequential reference port — on ISOLATED crowns the
    // dummy point n0 is the crown's own farthest return, and a chunk of
    // the crown near it legitimately drains to Ni (Li's algorithm at
    // dummyRadius >> crown spacing); the engine must reproduce that
    val want = liTreeLocal((a ++ b ++ veg).toArray, 10, 3.0, 100.0)
    for ((k, _, _, _) <- a ++ b ++ veg)
      assert(got(k) == want.getOrElse(k, 0L), s"key=$k")
    val aIds = a.map(p => got(p._1))
    val bIds = b.map(p => got(p._1))
    assert(aIds.toSet.subsetOf(Set(0L, 1L)) && aIds.count(_ == 1L) > a.size * 0.5,
      s"tree A ids: ${aIds.toSet}, |1|=${aIds.count(_ == 1L)}/${a.size}")
    assert(bIds.toSet.subsetOf(Set(0L, 2L)) && bIds.count(_ == 2L) > b.size * 0.5,
      s"tree B ids: ${bIds.toSet}, |2|=${bIds.count(_ == 2L)}/${b.size}")
    assert(got(a.maxBy(_._4)._1) == 1L && got(b.maxBy(_._4)._1) == 2L) // seeds
    assert(veg.forall(p => got(p._1) == 0L))
  }

  test("min_points rejects small clusters; min_height terminates") {
    val few = (0 until 5).map(i => (i.toLong, i * 0.5, 0.0, 10.0 - i * 0.1))
    val low = (0 until 30).map(i => (100L + i, 50 + (i % 6) * 0.8,
      (i / 6) * 0.8, 2.0))
    val df = (few ++ low).toDF("order_key", "x", "y", "height_above_ground")
    val got = LiTree(df, minPoints = 10, minHag = 3.0)
      .select("order_key", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L)) // 5-point tree rejected, low veg never seeds
  }

  /** Random mixed scenes: the distributed dominance rounds equal the
    * sequential reference port exactly — including interacting crowns
    * that resolve across multiple rounds. */
  test("distributed rounds == sequential port on random scenes") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val pts = scala.collection.mutable.ArrayBuffer[(Long, Double, Double, Double)]()
      var key = 0L
      for (t <- 0 until 6) { // crowns 40 apart: contexts overlap -> multi-round
        val cx = (t % 3) * 40.0 + rnd.nextDouble() * 5
        val cy = (t / 3) * 40.0 + rnd.nextDouble() * 5
        val hmax = 8 + rnd.nextDouble() * 12
        for (_ <- 0 until 25) {
          val ang = rnd.nextDouble() * 2 * math.Pi
          val r = rnd.nextDouble() * 3.5
          pts += ((key, cx + r * math.cos(ang), cy + r * math.sin(ang),
            math.max(0.4, hmax - 2.2 * r))); key += 1
        }
      }
      for (_ <- 0 until 40) { // scattered noise
        pts += ((key, rnd.nextDouble() * 90, rnd.nextDouble() * 50,
          rnd.nextDouble() * 4)); key += 1
      }
      val arr = pts.toArray
      val want = liTreeLocal(arr, 10, 3.0, 100.0)
      val df = arr.toSeq.toDF("order_key", "x", "y", "height_above_ground")
      val got = LiTree(df).select("order_key", "cluster_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for ((k, _, _, _) <- arr)
        assert(got(k) == want.getOrElse(k, 0L),
          s"seed=$seed key=$k got=${got(k)} want=${want.getOrElse(k, 0L)}")
    }
  }

  test("missing height_above_ground throws like the reference") {
    val df = Seq((1L, 0.0, 0.0)).toDF("order_key", "x", "y")
    val e = intercept[IllegalArgumentException](LiTree(df))
    assert(e.getMessage.contains("HeightAboveGround"))
  }
}
