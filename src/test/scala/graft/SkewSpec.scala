package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Synth
import graft.operators.{Skew, Splitter}

class SkewSpec extends AnyFunSuite {
  import TestSpark._

  /** 90% of points in one tile — the dense-cell shape the north rule
    * calls out. */
  lazy val skewed = {
    val hot = Synth.docs(spark, 9000, seed = 31,
      bounds = (635000.0, 848000.0, 635100.0, 848100.0)) // one 1000m tile
    val cold = Synth.docs(spark, 1000, seed = 32,
      bounds = (600000.0, 800000.0, 700000.0, 900000.0))
      .withColumn("order_key", col("order_key") + 9000)
      .withColumn("doc_id", concat(lit("c"), col("doc_id")))
    hot.unionByName(cold)
  }

  test("hot-key detection finds the dense tile") {
    val tiled = Splitter(skewed, 1000.0, origin = Some((600000.0, 800000.0)))
    val hot = Skew.hotKeys(tiled, "tile_id").collect()
    assert(hot.nonEmpty)
    assert(hot.map(_.getLong(1)).max == 9000)
  }

  test("salted repartition bounds per-partition rows for the hot tile") {
    val tiled = Splitter(skewed, 1000.0, origin = Some((600000.0, 800000.0)))
    val salted = Skew.saltedRepartition(tiled, "tile_id", salt = 16)
    // per (tile, salt) group size is ~9000/16 for the hot tile
    val groups = salted.groupBy("tile_id", "__salt").count()
      .agg(max("count")).head().getLong(0)
    assert(groups < 2000, s"largest (tile, salt) group $groups should be ~9000/16")
    // no rows lost, salt deterministic
    assert(salted.count() == 10000)
    val again = Skew.saltedRepartition(tiled, "tile_id", salt = 16)
      .select("order_key", "__salt").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val first = salted.select("order_key", "__salt").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(first == again)
  }

  test("salted two-level count equals plain count per key") {
    val tiled = Splitter(skewed, 1000.0, origin = Some((600000.0, 800000.0)))
    val plain = tiled.groupBy("tile_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(tiled, "tile_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("kNN hot-cell salting: detection fires, per-task candidate groups " +
      "are bounded by the cap, results stay exact") {
    val pts = skewed.select("order_key", "x", "y", "z").cache()
    val h = 500.0 // dense blob spans 100m -> one 500m cell holds ~9000
    val cap = 1000
    val hot = graft.operators.KnnJoin.detectHotSupercells(pts, h, cap)
    assert(hot.nonEmpty, "dense supercell must be detected as hot")
    // salt factors bound each (cell, salt) cogroup group to ~cap: the
    // task-input bound AQE cannot provide for Dataset.cogroup
    hot.values.foreach(s => assert(s >= 9 && s <= 64, s"salt factor $s"))
    val maxGroup = hot.map { case (_, s) => math.ceil(9000.0 / s) }.max
    assert(maxGroup <= 2 * cap, s"salted group bound $maxGroup vs cap $cap")
    // exactness THROUGH the salted path (cap forces salting at this h)
    val knnSalted = graft.operators.KnnJoin.knn(pts, skewed, 3,
      cellSize = h, maxCellCandidates = cap, broadcastLimit = 0)
    val all = pts.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val gotS = knnSalted.filter(col("order_key") < 30).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toVector).toMap
    gotS.foreach { case (qid, ids) =>
      val (_, qx, qy, qz) = all.find(_._1 == qid).get
      val exp = all.map { case (cid, x, y, z) =>
        ((x - qx) * (x - qx) + (y - qy) * (y - qy) + (z - qz) * (z - qz), cid)
      }.sorted.take(3).map(_._2).toVector
      assert(ids == exp, s"salted qid=$qid")
    }
  }

  test("kNN on the skewed cloud stays correct (dense cell = bounded task)") {
    val pts = skewed.select("order_key", "x", "y", "z", "classification")
    val knn = graft.operators.KnnJoin.knn(
      pts.select("order_key", "x", "y", "z"), pts, 3, broadcastLimit = 0)
    assert(knn.count() == 10000)
    // spot-check 30 hot-cell points against brute force
    val all = pts.select("order_key", "x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val got = knn.filter(col("order_key") < 30).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toVector).toMap
    got.foreach { case (qid, ids) =>
      val (_, qx, qy, qz) = all.find(_._1 == qid).get
      val exp = all.map { case (cid, x, y, z) =>
        ((x - qx) * (x - qx) + (y - qy) * (y - qy) + (z - qz) * (z - qz), cid)
      }.sorted.take(3).map(_._2).toVector
      assert(ids == exp, s"qid=$qid")
    }
  }
}
