package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Fixtures, Synth}
import graft.operators.{KnnJoin, NeighborClassifier, NNDistance}

class KnnSpec extends AnyFunSuite {
  import TestSpark._

  test("grid kNN == brute force on 800 synthetic docs (broadcast AND " +
      "distributed paths, full-struct differential)") {
    val docs = Synth.docs(spark, 800, seed = 7).cache()
    val pts = docs.select("order_key", "x", "y", "z", "classification").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    val k = 5
    def run(bl: Int) =
      KnnJoin.knn(docs.select("order_key", "x", "y", "z"), docs, k,
          broadcastLimit = bl)
        .collect().map { r =>
          r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(h => (h.getDouble(0), h.getLong(1), h.getDouble(2))).toVector
        }.toMap
    val gotB = run(KnnJoin.defaultBroadcastLimit) // 800 <= limit: fast path
    val gotD = run(0)                             // pinned distributed path
    assert(gotB == gotD, "broadcast fast path must be bit-identical to the cogroup path")
    // brute force (unique distances wanted: synthetic uniform doubles — ties measure-zero)
    pts.foreach { case (qid, qx, qy, qz, _) =>
      val exp = pts.map { case (cid, x, y, z, _) =>
        val d2 = (x - qx) * (x - qx) + (y - qy) * (y - qy) + (z - qz) * (z - qz)
        (d2, cid)
      }.sorted.take(k).map(_._2).toVector
      assert(gotB(qid).map(_._2) == exp, s"qid=$qid")
    }
  }

  test("broadcast path: pathological cellSize over a huge extent coarsens " +
      "h internally (injective packing) and stays exact") {
    import spark.implicits._
    // 1e9-unit extent with an explicit 0.001 cell size would be 1e12
    // cells/axis — far past the 2^20 packing budget; the index must
    // coarsen h (results are h-independent) instead of aliasing buckets
    val rnd = new scala.util.Random(3)
    val pts = (0 until 200).map(i => (i.toLong,
      rnd.nextDouble() * 1e9, rnd.nextDouble() * 1e9, rnd.nextDouble() * 1e3))
    val df = pts.toDF("order_key", "x", "y", "z")
      .withColumn("classification", lit(1))
    val got = KnnJoin.knn(df.select("order_key", "x", "y", "z"), df, 3,
        cellSize = 0.001)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toVector).toMap
    pts.foreach { case (qid, qx, qy, qz) =>
      val exp = pts.map { case (cid, x, y, z) =>
        ((x - qx) * (x - qx) + (y - qy) * (y - qy) + (z - qz) * (z - qz), cid)
      }.sorted.take(3).map(_._2).toVector
      assert(got(qid) == exp, s"qid=$qid")
    }
  }

  test("kNN halo: small cells force multi-ring resolution, still exact") {
    val docs = Synth.docs(spark, 300, seed = 11).cache()
    val pts = docs.select("order_key", "x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val k = 3
    // cell size far smaller than typical NN distance -> rings > 1 needed
    // (broadcastLimit = 0 pins the distributed multi-ring machinery)
    val got = KnnJoin.knn(docs.select("order_key", "x", "y", "z"), docs, k,
        cellSize = 20.0, broadcastLimit = 0)
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toVector
      }.toMap
    pts.foreach { case (qid, qx, qy, qz) =>
      val exp = pts.map { case (cid, x, y, z) =>
        ((x - qx) * (x - qx) + (y - qy) * (y - qy) + (z - qz) * (z - qz), cid)
      }.sorted.take(k).map(_._2).toVector
      assert(got(qid) == exp, s"qid=$qid")
    }
  }

  test("neighborclassifier k=1 is identity (NeighborClassifierFilterTest.cpp:101-103)") {
    val docs = Fixtures.autzen1065(spark)
    val out = NeighborClassifier(docs, k = 1)
    val before = docs.select("order_key", "classification").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val after = out.select("order_key", "classification").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(before == after)
  }

  test("neighborclassifier domain-restricted points outside domain never change (:109-112)") {
    val docs = Fixtures.autzen1065(spark)
    val out = NeighborClassifier(docs, k = 7, domain = Some("intensity[100:]"))
    val changed = out.as("a").join(docs.as("b"), Seq("order_key"))
      .filter(col("a.classification") =!= col("b.classification"))
      .select("a.intensity").collect()
    changed.foreach(r => assert(r.getInt(0) >= 100))
  }

  test("neighborclassifier vote semantics: strict majority, ties -> smallest class") {
    import spark.implicits._
    // 4 points at near-identical spots; classes 1,1,2,2 among k=4 -> count
    // 2 each, not > 2 -> no change. classes 1,1,1,2 -> 3 > 2 -> all become 1
    def mk(cls: Seq[Int]) = cls.zipWithIndex.map { case (c, i) =>
      (s"d$i", Seq.empty[graft.core.Span], i * 0.001, 0.0, 0.0, 0, c, 1, 1, 0.0, i.toLong)
    }.toDF("doc_id", "spans", "x", "y", "z", "intensity", "classification",
      "return_number", "number_of_returns", "gps_time", "order_key")
    val tie = NeighborClassifier(mk(Seq(1, 1, 2, 2)), k = 4)
      .select("classification").collect().map(_.getInt(0)).toSeq
    assert(tie == Seq(1, 1, 2, 2)) // no strict majority -> unchanged
    val maj = NeighborClassifier(mk(Seq(1, 1, 1, 2)), k = 4)
      .select("classification").collect().map(_.getInt(0)).toSet
    assert(maj == Set(1))
  }

  test("neighborclassifier candidate file k=1: class-6 count 12441 of 12525 " +
      "(NeighborClassifierFilterTest.cpp:219 golden)") {
    val src = Fixtures.sampleNc(spark)
    val cand = Fixtures.sampleCThin(spark)
    val out = NeighborClassifier(src, k = 1, candidates = Some(cand))
    val c6 = out.filter(col("classification") === 6).count()
    assert(out.count() == 14408)
    assert(c6 == 12441, s"class-6 count $c6 != 12441")
  }

  test("nndistance kth/avg produce positive distances") {
    val docs = Synth.docs(spark, 200, seed = 3)
    val kth = NNDistance(docs, k = 3, mode = "kth")
    assert(kth.filter(col("nn_distance") <= 0).count() == 0)
    val avg = NNDistance(docs, k = 3, mode = "avg")
    assert(avg.filter(col("nn_distance") <= 0).count() == 0)
  }

  test("queries OFFSET from the candidate cloud still get full exact kNN " +
      "(coverAll must be query-aware — hausdorff between disjoint clouds)") {
    import spark.implicits._
    // candidates in [0,10]^2, queries shifted far outside the candidate
    // bbox: with candidate-extent-only coverAll these got empty/truncated
    // results once ring*h passed the candidate extent
    val cand = (0 until 100).map(i =>
      (i.toLong, (i % 10).toDouble, (i / 10).toDouble, 0.0, i))
      .toDF("order_key", "x", "y", "z", "classification")
    val q = (0 until 5).map(i =>
      (1000L + i, 500.0 + i, 500.0, 0.0)).toDF("order_key", "x", "y", "z")
    for (bl <- Seq(0, KnnJoin.defaultBroadcastLimit)) { // both paths
      val out = KnnJoin.knn(q, cand, k = 3, valueCol = "classification",
          broadcastLimit = bl)
        .collect().map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toVector).toMap
      assert(out.size == 5)
      out.foreach { case (qid, hits) => assert(hits.length == 3, s"qid=$qid got $hits") }
      // nearest candidate to (500+i, 500) is the corner (9, 9) = order_key 99
      assert(out.values.forall(_.head == 99L))
    }
    // end-to-end: hausdorff between offset clouds is finite and exact
    val a = (0 until 50).map(i => (i.toLong, i.toDouble, 0.0, 0.0))
      .toDF("order_key", "x", "y", "z")
    val b = (0 until 50).map(i => (i.toLong, i.toDouble + 1000.0, 0.0, 0.0))
      .toDF("order_key", "x", "y", "z")
    val h = graft.pipeline.CloudMetrics.hausdorff(a, b)
    assert(math.abs(h - 1000.0) < 1e-9, s"hausdorff $h")
  }
}
