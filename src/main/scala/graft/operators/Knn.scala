package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.DimRange

/** One kNN hit: squared distance, candidate order_key, carried value.
  * Ordering (d2, cid) makes top-k deterministic at any parallelism. */
case class Hit(d2: Double, cid: Long, v: Double)

/** Driver-collected per-cell chain index over a SMALL candidate side
  * (broadcast fast path of [[KnnJoin.knn]]): answers the exact
  * (d2, cid)-ordered top-k per query by expanding Chebyshev cell shells
  * clamped to the candidate cell bbox — identical arithmetic and
  * tie-break to the distributed cogroup path, so results are
  * bit-identical. Built once on the driver, broadcast, queried from a
  * single mapPartitions pass over the (arbitrarily large) query side. */
private[operators] final class KnnLocalIndex(
    cx: Array[Double], cy: Array[Double], cz: Array[Double],
    cid: Array[Long], cv: Array[Double], h0: Double) extends Serializable {
  private val n = cx.length
  // h is an internal accelerator only (results are exact for ANY h):
  // coarsen until every axis spans <= ~4*cbrt(n) cells. Two reasons —
  // (a) the shell walk costs O(ring^2) per ring even over EMPTY cells,
  // so a caller-passed h far below the point spacing (fine cellSize on a
  // sparse extent) would walk millions of empty rings; the density cap
  // bounds the whole walk at ~(4*cbrt(n))^3 cell probes; (b) it keeps
  // every axis far under the 2^21 packing field, so the rebased packing
  // below is injective — an aliased bucket would double-count `seen`
  // and could fire finality early.
  private val h = {
    var loX = Double.MaxValue; var hiX = Double.MinValue
    var loY = Double.MaxValue; var hiY = Double.MinValue
    var loZ = Double.MaxValue; var hiZ = Double.MinValue
    var j = 0
    while (j < n) {
      if (cx(j) < loX) loX = cx(j); if (cx(j) > hiX) hiX = cx(j)
      if (cy(j) < loY) loY = cy(j); if (cy(j) > hiY) hiY = cy(j)
      if (cz(j) < loZ) loZ = cz(j); if (cz(j) > hiZ) hiZ = cz(j)
      j += 1
    }
    val span = math.max(hiX - loX, math.max(hiY - loY, hiZ - loZ))
    val cellCap = math.max(16.0, 4.0 * math.cbrt(n.toDouble))
    var hh = h0
    while (span / hh > cellCap) hh *= 2
    hh
  }
  private val head = new java.util.HashMap[java.lang.Long, Integer](n * 2)
  private val nxt = new Array[Int](n)
  private var minCx = Long.MaxValue; private var maxCx = Long.MinValue
  private var minCy = Long.MaxValue; private var maxCy = Long.MinValue
  private var minCz = Long.MaxValue; private var maxCz = Long.MinValue
  locally {
    var j = 0
    while (j < n) {
      val ccx = math.floor(cx(j) / h).toLong
      val ccy = math.floor(cy(j) / h).toLong
      val ccz = math.floor(cz(j) / h).toLong
      if (ccx < minCx) minCx = ccx; if (ccx > maxCx) maxCx = ccx
      if (ccy < minCy) minCy = ccy; if (ccy > maxCy) maxCy = ccy
      if (ccz < minCz) minCz = ccz; if (ccz > maxCz) maxCz = ccz
      j += 1
    }
    j = 0
    while (j < n) {
      val prev = head.put(pk(math.floor(cx(j) / h).toLong,
        math.floor(cy(j) / h).toLong, math.floor(cz(j) / h).toLong), j)
      nxt(j) = if (prev == null) -1 else prev.intValue()
      j += 1
    }
  }
  /** Injective within the occupied box: coords rebased to the per-axis
    * min cell, and h above guarantees each range < 2^20 < 2^21 (field
    * width). query() only visits cells clamped into this box. */
  @inline private def pk(a: Long, b: Long, c: Long): Long =
    ((a - minCx) << 42) | ((b - minCy) << 21) | (c - minCz)

  /** Exact top-k by (d2, cid) over all n candidates. A candidate within
    * distance ring*h of the query has cell coordinates within +-ring of
    * the query cell (|x-qx| <= ring*h => floor(x/h) <= floor(qx/h)+ring),
    * so once the kth distance is <= ring*h after examining shells
    * 0..ring the result is final — the same finality rule as the
    * distributed ring loop. Shells clamp to the candidate cell bbox and
    * the scan stops when every candidate has been seen. */
  def query(qx: Double, qy: Double, qz: Double, k: Int): Array[Hit] = {
    val qcx = math.floor(qx / h).toLong
    val qcy = math.floor(qy / h).toLong
    val qcz = math.floor(qz / h).toLong
    val bd = new Array[Double](k); val bc = new Array[Long](k)
    val bv = new Array[Double](k)
    var cnt = 0
    var seen = 0
    @inline def visit(ccx: Long, ccy: Long, ccz: Long): Unit = {
      val start = head.get(pk(ccx, ccy, ccz))
      var i = if (start == null) -1 else start.intValue()
      while (i != -1) {
        seen += 1
        val dx = cx(i) - qx; val dy = cy(i) - qy; val dz = cz(i) - qz
        val d2 = dx * dx + dy * dy + dz * dz
        val c = cid(i)
        if (cnt < k || d2 < bd(cnt - 1) ||
            (d2 == bd(cnt - 1) && c < bc(cnt - 1))) {
          var p = if (cnt < k) cnt else k - 1
          while (p > 0 && (bd(p - 1) > d2 ||
              (bd(p - 1) == d2 && bc(p - 1) > c))) {
            bd(p) = bd(p - 1); bc(p) = bc(p - 1); bv(p) = bv(p - 1)
            p -= 1
          }
          bd(p) = d2; bc(p) = c; bv(p) = cv(i)
          if (cnt < k) cnt += 1
        }
        i = nxt(i)
      }
    }
    // start at the Chebyshev cell distance from the query cell to the
    // candidate bbox — every earlier shell is provably empty
    val d0x = math.max(0L, math.max(minCx - qcx, qcx - maxCx))
    val d0y = math.max(0L, math.max(minCy - qcy, qcy - maxCy))
    val d0z = math.max(0L, math.max(minCz - qcz, qcz - maxCz))
    var ring = math.max(d0x, math.max(d0y, d0z))
    var done = false
    while (!done) {
      val x0 = math.max(qcx - ring, minCx); val x1 = math.min(qcx + ring, maxCx)
      val y0 = math.max(qcy - ring, minCy); val y1 = math.min(qcy + ring, maxCy)
      val z0 = math.max(qcz - ring, minCz); val z1 = math.min(qcz + ring, maxCz)
      if (x0 <= x1 && y0 <= y1 && z0 <= z1) {
        var ccx = x0
        while (ccx <= x1) {
          val fx = math.abs(ccx - qcx) == ring
          var ccy = y0
          while (ccy <= y1) {
            if (fx || math.abs(ccy - qcy) == ring) {
              var ccz = z0
              while (ccz <= z1) { visit(ccx, ccy, ccz); ccz += 1 }
            } else {
              val zm = qcz - ring; val zp = qcz + ring
              if (zm >= z0 && zm <= z1) visit(ccx, ccy, zm)
              if (zp >= z0 && zp <= z1 && zp != zm) visit(ccx, ccy, zp)
            }
            ccy += 1
          }
          ccx += 1
        }
      }
      if (seen >= n) done = true
      else if (cnt == k && math.sqrt(bd(k - 1)) <= ring * h) done = true
      else ring += 1
    }
    val out = new Array[Hit](cnt)
    var q2 = 0
    while (q2 < cnt) { out(q2) = Hit(bd(q2), bc(q2), bv(q2)); q2 += 1 }
    out
  }
}

/** Grid-partitioned kNN join — the engine's primitive behind PDAL's
  * KD3Index-based neighborhood filters (pdal/KDIndex.hpp:52-115, built
  * per-view; here per grid cell, distributed).
  *
  * Two-phase cell-neighborhood shuffle (SURVEY §2.7 north-star):
  * phase 1 cogroups queries with the candidates of SUPERCELL regions
  * (SxSxS cells + a one-cell halo shell — ~3.4x candidate duplication
  * instead of 27x per-cell haloing) and answers each query's exact
  * 3x3x3-cell cube from a task-local per-cell index; phase 2 re-joins
  * ONLY the points whose kth-distance ball escapes the examined cube
  * (sqrt(d2_k) <= R*h proves the local result final — the halo-exchange
  * correctness property of SURVEY §7.4.3) against the next Chebyshev
  * shell, iterating until resolved. The shuffled payload is only
  * (qid, x, y, z[, hits]) — spans and other wide columns never move.
  *
  * Skew: cell size targets ~4k candidates per cell from the extent row;
  * supercells whose task input exceeds `maxCellCandidates` are salted —
  * candidates hash-split, queries replicated, per-salt top-k merged —
  * because AQE's skew splitting does not apply to Dataset.cogroup.
  */
object KnnJoin {
  private val B = 1L << 20 // per-axis cell-coordinate bias
  /** Candidate count at or below which the join broadcasts a driver-built
    * index instead of running the cogroup machinery (~48 bytes/candidate
    * -> ~12 MB at the default). Env GRAFT_KNN_BROADCAST_LIMIT overrides;
    * pass broadcastLimit = 0 to pin the distributed path (tests). */
  private[graft] val defaultBroadcastLimit: Int =
    sys.env.get("GRAFT_KNN_BROADCAST_LIMIT").map(_.toInt).getOrElse(1 << 18)
  /** Cells per supercell edge: the first-binning cogroup keys on
    * supercells (4x4x4 cells) with a one-cell halo shell, so the
    * candidate duplication factor is (1 + 2/S)^3 ~= 3.4x instead of the
    * 27x of per-cell haloing — an 8x shuffle-volume cut on the join's
    * dominant stage. */
  private val S = 4

  private def cellCoord(v: Column, h: Double): Column =
    floor(v / h).cast("long")

  private def pack3(cx: Column, cy: Column, cz: Column): Column =
    shiftleft(cx + B, 42).bitwiseOR(shiftleft(cy + B, 21)).bitwiseOR(cz + B)

  /** JVM-side cell key identical to pack3 (used inside cogroup tasks). */
  @inline private def packS(cx: Long, cy: Long, cz: Long): Long =
    ((cx + B) << 42) | ((cy + B) << 21) | (cz + B)

  /** Supercell coordinate of a cell coordinate (bias-shifted so the
    * floor-division operates on non-negatives; exact in doubles). */
  private def superC(cc: Column, shift: Int): Column =
    floor((cc + lit(B) + lit(shift)).cast("double") / S).cast("long")

  private def superPack(sx: Column, sy: Column, sz: Column): Column =
    shiftleft(sx, 42).bitwiseOR(shiftleft(sy, 21)).bitwiseOR(sz)

  /** Chebyshev shell-R offsets (R=0 -> just (0,0,0)). */
  private def shellOffsets(r: Int): Seq[(Int, Int, Int)] =
    if (r == 0) Seq((0, 0, 0))
    else for {
      dx <- -r to r; dy <- -r to r; dz <- -r to r
      if math.max(math.abs(dx), math.max(math.abs(dy), math.abs(dz))) == r
    } yield (dx, dy, dz)

  /** Supercell (incl. one-cell halo shell) candidate row set at cell
    * size h — what one first-binning cogroup task receives. */
  /** Density-targeted cell size from an extent row — ONE implementation
    * shared by the broadcast and distributed paths: the two must stay
    * bit-identical for the broadcast==distributed differential guarantee
    * (KnnSpec), so the formula lives in exactly one place. `fallback` is
    * the caller's extent scale for degenerate estimates (broadcast: the
    * candidate bbox; distributed: the query-union bbox). */
  private def estimateCellSize(cellSize: Double, k: Int, n: Long,
      exRaw: Double, eyRaw: Double, ez: Double, fallback: Double): Double = {
    val h0raw =
      if (cellSize > 0) cellSize
      else {
        val target = math.max(64.0, k * 4.0)
        val ex = math.max(exRaw, 1e-9)
        val ey = math.max(eyRaw, 1e-9)
        if (ez <= 1e-12) math.sqrt(ex * ey * target / n)
        else math.cbrt(ex * ey * ez * target / n)
      }
    if (h0raw.isNaN || h0raw <= 1e-12) fallback / 16 else h0raw
  }

  private def superRows(cand: DataFrame, h: Double, valueCol: String): DataFrame = {
    val withCells = cand.select(col("x"), col("y"), col("z"),
      col("order_key").as("cid"), col(valueCol).cast("double").as("v"),
      cellCoord(col("x"), h).as("ccx"), cellCoord(col("y"), h).as("ccy"),
      cellCoord(col("z"), h).as("ccz"))
    withCells
      .withColumn("sx", explode(sequence(superC(col("ccx"), -1), superC(col("ccx"), 1))))
      .withColumn("sy", explode(sequence(superC(col("ccy"), -1), superC(col("ccy"), 1))))
      .withColumn("sz", explode(sequence(superC(col("ccz"), -1), superC(col("ccz"), 1))))
      .select(superPack(col("sx"), col("sy"), col("sz")).as("skey"),
        col("x"), col("y"), col("z"), col("cid"), col("v"))
  }

  /** Hot supercells at cell size h: supercell tasks (shell included)
    * holding more than `cap` candidates, with their salt factor (capped
    * at 64 groups) — the per-task input bound AQE cannot provide for
    * Dataset.cogroup. Two stages: a task region (supercell + 1-cell
    * shell, S+2 cells per axis) touches at most 3 base supercells per
    * axis (the aligned S-cell block plus one edge cell-row on each
    * side), i.e. 27 base supercells in 3D — so a task can exceed cap
    * only if one of those 27 exceeds cap/27. The cheap non-exploded
    * count at that threshold gates the exact (3.4x exploded) one, and
    * uniform data pays one slim map-side-combined aggregate and stops.
    * (cap/8 here was unsound: 27 contributors at just over cap/27 each
    * — all below cap/8 — could assemble a ~3x-over-cap task that
    * escaped detection entirely.) */
  private[graft] def detectHotSupercells(cand: DataFrame, h: Double,
      cap: Int): Map[Long, Int] = {
    val basePre = cand.select(superPack(
        superC(cellCoord(col("x"), h), 0), superC(cellCoord(col("y"), h), 0),
        superC(cellCoord(col("z"), h), 0)).as("skey"))
      .groupBy("skey").count().filter(col("count") > cap / 27)
      .limit(1).count()
    if (basePre == 0L) return Map.empty
    superRows(cand, h, "order_key").groupBy("skey").count()
      .filter(col("count") > cap).collect()
      .map(r => r.getLong(0) ->
        math.min(math.ceil(r.getLong(1).toDouble / cap), 64.0).toInt).toMap
  }

  /** k nearest candidates for every query row.
    *
    * @param queries  needs (order_key, x, y, z)
    * @param cand     needs (order_key, x, y, z) + `valueCol`
    * @param valueCol candidate column carried into the result (vote target)
    * @param maxCellCandidates skew bound: halo-cells holding more
    *        candidates than this are salted — candidates split into
    *        ceil(n/cap) hash groups, queries replicated across them,
    *        partial top-k merged — so no single cogroup task ever
    *        receives an unbounded dense cell (AQE skew splitting does
    *        not apply to Dataset.cogroup)
    * @return (order_key, knn: array<struct<d2,cid,v>>) sorted by (d2, cid),
    *         length min(k, |cand reachable|); empty array if none
    */
  def knn(queries: DataFrame, cand: DataFrame, k: Int,
      valueCol: String = "classification", cellSize: Double = 0.0,
      selfJoin: Boolean = false, maxCellCandidates: Int = 100000,
      broadcastLimit: Int = defaultBroadcastLimit): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val debug = sys.env.contains("GRAFT_KNN_DEBUG")
    val tStart = System.nanoTime()
    def dbg(msg: => String): Unit =
      if (debug) println(f"[knn +${(System.nanoTime() - tStart) / 1e9}%.1fs] $msg")

    // materialize both inputs ONCE: everything downstream (per-ring
    // candidate scans, escalated binnings) would otherwise re-execute
    // the caller's full upstream plan per job. persist + the extent
    // aggregate as the materializing action = ONE job that both fills
    // the cache and returns the bbox (no separate probe job); lineage
    // stays intact so an executor loss recomputes instead of failing.
    // For self-kNN the query side IS the candidate side.
    val candCols =
      if (valueCol == "order_key") Seq(col("x"), col("y"), col("z"), col("order_key"))
      else Seq(col("x"), col("y"), col("z"), col("order_key"), col(valueCol))
    val candM = cand.select(candCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val ext = candM.agg(count(lit(1)), min("x"), max("x"), min("y"), max("y"),
      min("z"), max("z")).head()
    dbg(s"candM materialized n=${ext.getLong(0)}")
    val hitType = "array<struct<d2:double,cid:bigint,v:double>>"
    if (ext.getLong(0) == 0L) { // no candidates at all
      candM.unpersist(false)
      return queries.select(col("order_key"),
        typedLit(Seq.empty[(Double, Long, Double)]).cast(hitType).as("knn"))
    }
    // NaN coordinates are malformed input and MUST fail loudly here: a
    // NaN poisons maxExtent, so the ring loop's coverAll exit can never
    // fire and the distributed path loops forever, while the broadcast
    // path would silently emit different results — Spark's max() returns
    // NaN whenever one is present, so checking the three maxes of the
    // one aggregate already paid costs nothing extra
    require(!ext.getDouble(2).isNaN && !ext.getDouble(4).isNaN &&
      !ext.getDouble(6).isNaN,
      "knn: candidate side contains NaN coordinates — filter or repair " +
        "them upstream (a NaN point can never match any distance predicate)")

    // ---- BROADCAST FAST PATH: a candidate side that fits one task's
    // memory is collected once, indexed on the driver, and broadcast —
    // the (arbitrarily large) query side answers exact top-k in a single
    // shuffle-free mapPartitions pass: no cogroup, no ring-loop driver
    // barriers. This is the broadcast-hash-join analog for kNN, and the
    // common case at scale: ground-raster inpaint (area/cell^2 cells),
    // ICP/colorization reference sets, per-tile goldens. Results are
    // bit-identical to the distributed path (same d2 arithmetic, same
    // (d2, cid) tie-break — pinned by KnnSpec's differential).
    if (broadcastLimit > 0 && ext.getLong(0) <= broadcastLimit) {
      val rows = candM.select(col("x"), col("y"), col("z"), col("order_key"),
        col(valueCol).cast("double").as("v")).collect()
      val n = rows.length
      val lcx = new Array[Double](n); val lcy = new Array[Double](n)
      val lcz = new Array[Double](n); val lcid = new Array[Long](n)
      val lcv = new Array[Double](n)
      var i = 0
      while (i < n) {
        val r = rows(i)
        lcx(i) = r.getDouble(0); lcy(i) = r.getDouble(1); lcz(i) = r.getDouble(2)
        lcid(i) = r.getLong(3); lcv(i) = r.getDouble(4)
        i += 1
      }
      val hB = estimateCellSize(cellSize, k, n,
        ext.getDouble(2) - ext.getDouble(1),
        ext.getDouble(4) - ext.getDouble(3),
        ext.getDouble(6) - ext.getDouble(5),
        math.max(1e-9, math.max(ext.getDouble(2) - ext.getDouble(1),
          math.max(ext.getDouble(4) - ext.getDouble(3),
            ext.getDouble(6) - ext.getDouble(5)))))
      val idx = spark.sparkContext.broadcast(
        new KnnLocalIndex(lcx, lcy, lcz, lcid, lcv, hB))
      dbg(s"broadcast fast path: n=$n h=$hB")
      // self-kNN: rebuild the (small) query side from the collected rows
      // so the output has no lineage into the cached candM
      val qDs =
        if (selfJoin) spark.createDataset(spark.sparkContext.parallelize(
          (0 until n).map(j => (lcid(j), lcx(j), lcy(j), lcz(j)))))
        else queries.select(col("order_key"), col("x"), col("y"), col("z"))
          .as[(Long, Double, Double, Double)]
      val out = qDs.mapPartitions { it =>
        val ix = idx.value
        it.map { case (qid, qx, qy, qz) =>
          // same loud-NaN contract as the distributed path's extent check
          if (qx.isNaN || qy.isNaN || qz.isNaN) throw new IllegalArgumentException(
            s"knn: query $qid has NaN coordinates — filter or repair upstream")
          (qid, ix.query(qx, qy, qz, k))
        }
      }.toDF("order_key", "knn")
      candM.unpersist(false)
      return out
    }

    val queriesM =
      if (selfJoin) candM.select("order_key", "x", "y", "z")
      else queries.select("order_key", "x", "y", "z")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def release(): Unit = { // repeated knn calls must not leak cached blocks
      candM.unpersist(false)
      if (!selfJoin) queriesM.unpersist(false)
    }
    // coverAll must be query-aware: the examined cube is centered at the
    // QUERY cell, so finality needs ring*h to cover the distance from any
    // query to the farthest candidate — bounded by the UNION bbox extent
    // (a query offset from the candidate cloud otherwise gets truncated
    // results once ring*h passes the candidate-only extent)
    val uext =
      if (selfJoin) ext
      else {
        val qe = queriesM.agg(count(lit(1)), min("x"), max("x"), min("y"), max("y"),
          min("z"), max("z")).head()
        require(qe.getLong(0) == 0L || (!qe.getDouble(2).isNaN &&
          !qe.getDouble(4).isNaN && !qe.getDouble(6).isNaN),
          "knn: query side contains NaN coordinates — filter or repair " +
            "them upstream (a NaN query can never resolve)")
        if (qe.getLong(0) == 0L) ext
        else org.apache.spark.sql.Row(ext.getLong(0),
          math.min(ext.getDouble(1), qe.getDouble(1)), math.max(ext.getDouble(2), qe.getDouble(2)),
          math.min(ext.getDouble(3), qe.getDouble(3)), math.max(ext.getDouble(4), qe.getDouble(4)),
          math.min(ext.getDouble(5), qe.getDouble(5)), math.max(ext.getDouble(6), qe.getDouble(6)))
      }
    val maxExtent = math.max(1e-9, math.max(uext.getDouble(2) - uext.getDouble(1),
      math.max(uext.getDouble(4) - uext.getDouble(3), uext.getDouble(6) - uext.getDouble(5))))

    // cell-size estimate straight from the already-collected extent row
    // (a separate estimator aggregate would be a second identical job)
    val h0 = estimateCellSize(cellSize, k, math.max(ext.getLong(0), 1L),
      ext.getDouble(2) - ext.getDouble(1),
      ext.getDouble(4) - ext.getDouble(3),
      ext.getDouble(6) - ext.getDouble(5), maxExtent)

    def candPrep(h: Double) = candM.select(
      pack3(cellCoord(col("x"), h), cellCoord(col("y"), h), cellCoord(col("z"), h)).as("cell"),
      col("x"), col("y"), col("z"), col("order_key").as("cid"),
      col(valueCol).cast("double").as("v"))
      .withColumn("__salt", lit(0))

    def bin(q: DataFrame, h: Double): DataFrame = q.select(col("qid"),
      col("qx"), col("qy"), col("qz"),
      cellCoord(col("qx"), h).as("ccx"), cellCoord(col("qy"), h).as("ccy"),
      cellCoord(col("qz"), h).as("ccz"))

    /** First-binning join: cogroup keyed on SUPERCELLS (SxSxS cells)
      * with candidates duplicated only into the one-cell halo shell of
      * adjacent supercells (~(1+2/S)^3 = 3.4x fan-out instead of the 27x
      * of per-cell haloing — an 8x shuffle-volume cut on the dominant
      * stage). Each task builds a local per-cell chain index and answers
      * every query's exact 27-cell cube, so per-query results are
      * IDENTICAL to the per-cell design. Hot supercells are salted on
      * the candidate side with queries replicated across salt groups. */
    def superPartials(q: DataFrame, h: Double, hotDf: Option[DataFrame]): DataFrame = {
      val q1 = q.select(col("qid"), col("qx"), col("qy"), col("qz"),
        superPack(superC(col("ccx"), 0), superC(col("ccy"), 0),
          superC(col("ccz"), 0)).as("skey"))
      val qS = (hotDf match {
        case Some(hd) => q1.join(hd, Seq("skey"), "left")
          .withColumn("__salt",
            explode(sequence(lit(0), coalesce(col("__s"), lit(1)) - 1)))
          .drop("__s")
        case None => q1.withColumn("__salt", lit(0))
      }).select("qid", "qx", "qy", "qz", "skey", "__salt")
        .as[(Long, Double, Double, Double, Long, Int)]
      val c1 = superRows(candM, h, valueCol)
      val cS = (hotDf match {
        case Some(hd) => c1.join(hd, Seq("skey"), "left")
          .withColumn("__salt", when(col("__s").isNotNull,
            pmod(xxhash64(col("cid")), col("__s").cast("long")).cast("int"))
            .otherwise(lit(0)))
          .drop("__s")
        case None => c1.withColumn("__salt", lit(0))
      }).select("skey", "x", "y", "z", "cid", "v", "__salt")
        .as[(Long, Double, Double, Double, Long, Double, Int)]
      val hL = h
      qS.groupByKey(t => (t._5, t._6)).cogroup(cS.groupByKey(t => (t._1, t._7))) {
        (_, qs, cs) =>
          val cBuf = cs.toArray
          if (cBuf.isEmpty) Iterator.empty
          else {
            val n = cBuf.length
            val cxA = new Array[Double](n); val cyA = new Array[Double](n)
            val czA = new Array[Double](n); val cidA = new Array[Long](n)
            val cvA = new Array[Double](n)
            // per-cell chains: head(cellKey) -> last idx, next(idx) -> prev
            val head = new java.util.HashMap[java.lang.Long, Integer](n * 2)
            val nxt = new Array[Int](n)
            var j = 0
            while (j < n) {
              val c = cBuf(j)
              cxA(j) = c._2; cyA(j) = c._3; czA(j) = c._4
              cidA(j) = c._5; cvA(j) = c._6
              val ck = packS(math.floor(c._2 / hL).toLong,
                math.floor(c._3 / hL).toLong, math.floor(c._4 / hL).toLong)
              val prev = head.put(ck, j)
              nxt(j) = if (prev == null) -1 else prev.intValue()
              j += 1
            }
            qs.map { case (qid, qx, qy, qz, _, _) =>
              val qcx = math.floor(qx / hL).toLong
              val qcy = math.floor(qy / hL).toLong
              val qcz = math.floor(qz / hL).toLong
              val bd = new Array[Double](k); val bc = new Array[Long](k)
              val bv = new Array[Double](k)
              var cnt = 0
              var dx = -1
              while (dx <= 1) {
                var dy = -1
                while (dy <= 1) {
                  var dz = -1
                  while (dz <= 1) {
                    val start = head.get(packS(qcx + dx, qcy + dy, qcz + dz))
                    var i = if (start == null) -1 else start.intValue()
                    while (i != -1) {
                      val ddx = cxA(i) - qx; val ddy = cyA(i) - qy
                      val ddz = czA(i) - qz
                      val d2 = ddx * ddx + ddy * ddy + ddz * ddz
                      val cid = cidA(i)
                      if (cnt < k || d2 < bd(cnt - 1) ||
                          (d2 == bd(cnt - 1) && cid < bc(cnt - 1))) {
                        var p = if (cnt < k) cnt else k - 1
                        while (p > 0 && (bd(p - 1) > d2 ||
                            (bd(p - 1) == d2 && bc(p - 1) > cid))) {
                          bd(p) = bd(p - 1); bc(p) = bc(p - 1); bv(p) = bv(p - 1)
                          p -= 1
                        }
                        bd(p) = d2; bc(p) = cid; bv(p) = cvA(i)
                        if (cnt < k) cnt += 1
                      }
                      i = nxt(i)
                    }
                    dz += 1
                  }
                  dy += 1
                }
                dx += 1
              }
              val out = new Array[Hit](cnt)
              var q2 = 0
              while (q2 < cnt) { out(q2) = Hit(bd(q2), bc(q2), bv(q2)); q2 += 1 }
              (qid, out)
            }
          }
      }.toDF("qid", "hits")
    }

    def ringPartials(q: DataFrame, shell: Seq[(Int, Int, Int)],
        candsDf: DataFrame, filterCells: Boolean): DataFrame = {
      val offs = array(shell.map { case (dx, dy, dz) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(dz).as("dz"))
      }: _*)
      val exploded = q.withColumn("__o", explode(offs))
        .select(col("qid"), col("qx"), col("qy"), col("qz"),
          pack3(col("ccx") + col("__o.dx"), col("ccy") + col("__o.dy"),
            col("ccz") + col("__o.dz")).as("cell"))
        .withColumn("__salt", lit(0))
        .select("qid", "qx", "qy", "qz", "cell", "__salt")
        .as[(Long, Double, Double, Double, Long, Int)]
      // late rings probe few cells: shrink the candidate shuffle to the
      // cells actually probed instead of re-shuffling the full corpus
      val cands0 = if (filterCells)
        candsDf.join(exploded.toDF().select("cell").distinct(), Seq("cell"), "left_semi")
      else candsDf
      val cands = cands0.select("cell", "x", "y", "z", "cid", "v", "__salt")
        .as[(Long, Double, Double, Double, Long, Double, Int)]
      exploded.groupByKey(t => (t._5, t._6)).cogroup(cands.groupByKey(t => (t._1, t._7))) {
        (_, qs, cs) =>
          // STREAM the candidates (one pass, never materialized): ring
          // cells have no salting, so a dense cell at a coarse escalated
          // h could hold millions of candidates — buffering them (the
          // old cs.toArray) was the one path around the maxCellCandidates
          // bound. Buffer the QUERIES instead (pending-set fragments,
          // O(queries*k) memory) and push each streamed candidate through
          // every query's insertion top-k. Candidate order per query is
          // the same stream order as before -> bit-identical results.
          val qBuf = qs.toArray
          if (qBuf.isEmpty || !cs.hasNext) Iterator.empty
          else {
            val m = qBuf.length
            val bd = new Array[Double](m * k); val bc = new Array[Long](m * k)
            val bv = new Array[Double](m * k)
            val cnt = new Array[Int](m)
            while (cs.hasNext) {
              val c = cs.next()
              val cx = c._2; val cy = c._3; val cz = c._4
              val cid = c._5; val cv = c._6
              var qi = 0
              while (qi < m) {
                val q0 = qBuf(qi)
                val dx = cx - q0._2; val dy = cy - q0._3; val dz = cz - q0._4
                val d2 = dx * dx + dy * dy + dz * dz
                val base = qi * k
                val c0 = cnt(qi)
                if (c0 < k || d2 < bd(base + c0 - 1) ||
                    (d2 == bd(base + c0 - 1) && cid < bc(base + c0 - 1))) {
                  var p = if (c0 < k) c0 else k - 1
                  while (p > 0 && (bd(base + p - 1) > d2 ||
                      (bd(base + p - 1) == d2 && bc(base + p - 1) > cid))) {
                    bd(base + p) = bd(base + p - 1); bc(base + p) = bc(base + p - 1)
                    bv(base + p) = bv(base + p - 1)
                    p -= 1
                  }
                  bd(base + p) = d2; bc(base + p) = cid; bv(base + p) = cv
                  if (c0 < k) cnt(qi) = c0 + 1
                }
                qi += 1
              }
            }
            qBuf.indices.iterator.map { qi =>
              val base = qi * k
              val out = new Array[Hit](cnt(qi))
              var q2 = 0
              while (q2 < cnt(qi)) {
                out(q2) = Hit(bd(base + q2), bc(base + q2), bv(base + q2)); q2 += 1
              }
              (qBuf(qi)._1, out)
            }
          }
      }.toDF("qid", "hits")
    }

    // across cell-size escalations the same candidate can be re-found, so
    // merge dedups exact-equal hit structs before slicing top-k
    def mergeTopK(partials: DataFrame): DataFrame =
      partials.groupBy("qid").agg(
        slice(array_distinct(array_sort(flatten(collect_list(col("hits"))))), 1, k)
          .as("knn"))

    val r1cube = shellOffsets(0) ++ shellOffsets(1)
    val ringsPerBinning = 3
    var resolvedParts = List.empty[DataFrame]
    var pending = queriesM.select(col("order_key").as("qid"), col("x").as("qx"),
      col("y").as("qy"), col("z").as("qz"))
    var carried: Option[DataFrame] = None // (qid, knn) partials from finer binnings
    var h = h0
    var done = false
    var firstBinning = true

    // each binning runs rings 1..3; unresolved points escalate to cells 8x
    // coarser (geometric — total work is log(maxExtent/h0) bounded, the
    // fix for badly-estimated cell sizes on degenerate inputs)
    while (!done) {
      val cands = candPrep(h)
      val q = bin(pending, h)
      // first binning: halo-explode the CANDIDATES, query one cell each —
      // per-query cube-1 top-k lands in a single cogroup, no merge
      // shuffle. Later binnings: explode the (small) pending query set
      // and shrink candidates to probed cells.
      var accumulated =
        if (firstBinning) {
          // n <= cap means no supercell can exceed the cap — detection free
          val hot =
            if (ext.getLong(0) <= maxCellCandidates) Map.empty[Long, Int]
            else detectHotSupercells(candM, h, maxCellCandidates)
          dbg(s"hot detection done: ${hot.size} hot supercells at h=$h")
          val hotDf =
            if (hot.isEmpty) None
            else Some(broadcast(
              spark.createDataFrame(hot.toSeq).toDF("skey", "__s")))
          val partials = superPartials(q, h, hotDf)
          // salted queries hold partials per salt group -> merge; the
          // skew-free fast path keeps the single-cogroup result as-is
          if (hotDf.isDefined) mergeTopK(partials)
          else partials.withColumnRenamed("hits", "knn")
        } else mergeTopK(carried match {
          case Some(c) => ringPartials(q, r1cube, cands, filterCells = true)
            .unionByName(c.select(col("qid"), col("knn").as("hits")))
          case None => ringPartials(q, r1cube, cands, filterCells = true)
        })
      firstBinning = false
      var ring = 1
      var escalate = false
      while (!done && !escalate) {
        val coverAll = ring * h >= maxExtent // examined cube covers every candidate
        val kth = try_element_at(col("knn"), lit(k))
        val isFinal = (size(col("knn")) === k &&
          sqrt(kth.getField("d2")) <= lit(ring * h)) || lit(coverAll)
        // one materialization per ring: LAZY localCheckpoint (cuts the
        // logical plan immediately — the ring loop otherwise compounds
        // plans exponentially) with the pending-count aggregate as the
        // materializing action — a single job checkpoints the ring AND
        // answers "is anything unresolved", replacing the old eager-
        // checkpoint job + isEmpty probe pair (two driver barriers per
        // ring -> one; the serial-floor item of BENCH/BASELINE.md)
        val joined = bin(pending, h).join(accumulated, Seq("qid"), "left")
          .withColumn("knn", coalesce(col("knn"),
            typedLit(Seq.empty[(Double, Long, Double)]).cast(hitType)))
          .withColumn("__final", isFinal)
          .transform(d => graft.core.Mat(d, eager = false))
        val pendingCount = joined.agg(
          count(when(!col("__final"), lit(1)))).head().getLong(0)
        dbg(s"ring=$ring h=$h pending=$pendingCount")
        resolvedParts = joined.filter(col("__final")).select(col("qid"), col("knn")) :: resolvedParts
        val nextPending = joined.filter(!col("__final"))
        pending = nextPending.select("qid", "qx", "qy", "qz")
        if (pendingCount == 0L) done = true
        else if (ring < ringsPerBinning) {
          // jump both remaining shells in one round: pending is already the
          // small boundary-escaping minority, one cogroup covers rings 2+3
          val jump = ringsPerBinning
          val shells = ((ring + 1) to jump).flatMap(shellOffsets)
          ring = jump
          val shellPart = ringPartials(bin(pending, h), shells, cands,
            filterCells = true)
          accumulated = mergeTopK(
            nextPending.select(col("qid"), col("knn").as("hits"))
              .unionByName(shellPart))
        } else {
          carried = Some(nextPending.select("qid", "knn"))
          h *= 8
          escalate = true
        }
      }
    }
    dbg("loop done")
    // every resolved part is a materialized (lazy-localCheckpoint, forced
    // by its ring's pending-count action) frame — the result no longer
    // reads the cached inputs, so their blocks can be dropped now
    release()
    resolvedParts.reduce(_.unionByName(_))
      .withColumnRenamed("qid", "order_key")
  }
}

/** filters.neighborclassifier analog
  * (filters/NeighborClassifierFilter.cpp:49): kNN majority vote on a
  * dimension; votes always use ORIGINAL values (deferred update map,
  * :111,200-201 — naturally satisfied here because the vote is computed
  * from the immutable input and applied with a join, never in place). */
object NeighborClassifier {
  def apply(df: DataFrame, k: Int, dim: String = "classification",
      domain: Option[String] = None, candidates: Option[DataFrame] = None,
      cellSize: Double = 0.0): DataFrame = {
    val inDomain: Column = domain match {
      case Some(d) => DimRange.predicate(DimRange.parseList(d))
      case None => lit(true)
    }
    val queries = df.filter(inDomain).select("order_key", "x", "y", "z")
    val cand = candidates.getOrElse(df)
    val self = candidates.isEmpty && domain.isEmpty
    val knn = KnnJoin.knn(queries, cand, k, valueCol = dim, cellSize = cellSize,
      selfJoin = self)
    // vote (doOneNoDomain :115-141): winner = max count, tie -> smallest
    // value (std::map asc + first-max max_element); change requires
    // count > n_neighbors/2 strictly. Computed as pure array expressions
    // over the <=k-element knn column — no extra shuffle.
    val vs = transform(col("knn"), h => h.getField("v"))
    val counted = transform(array_distinct(vs), v => struct(
      size(filter(vs, x => x === v)).as("cnt"), (-v).as("negv")))
    val best = array_max(counted)
    val winners = knn
      .withColumn("__cnt", best.getField("cnt"))
      .withColumn("__newcls", -best.getField("negv"))
      .filter(size(col("knn")) > 0 &&
        col("__cnt").cast("double") > size(col("knn")).cast("double") / 2.0)
      .select(col("order_key"), col("__newcls"))
    df.join(winners, Seq("order_key"), "left")
      .withColumn(dim,
        when(col("__newcls").isNotNull && inDomain,
          col("__newcls").cast(df.schema(dim).dataType)).otherwise(col(dim)))
      .drop("__newcls")
  }
}

/** filters.nndistance analog (filters/NNDistanceFilter.cpp:47): per-point
  * kNN distance statistic (kth | avg), neighbors excluding self. */
object NNDistance {
  def apply(df: DataFrame, k: Int, mode: String = "kth",
      outCol: String = "nn_distance", cellSize: Double = 0.0): DataFrame = {
    val knn = KnnJoin.knn(df.select("order_key", "x", "y", "z"), df, k + 1,
      valueCol = "order_key", cellSize = cellSize, selfJoin = true)
    val dists = knn.select(col("order_key"),
      slice(col("knn"), lit(2), greatest(size(col("knn")) - 1, lit(0))).as("nbrs"))
    val v = mode match {
      // greatest(..., 1): ordinal 0 makes (try_)element_at THROW
      // INVALID_INDEX_OF_ZERO, so a point with no neighbors (single-row
      // input) must probe index 1 and take try_element_at's null instead
      case "kth" => sqrt(try_element_at(col("nbrs"),
        greatest(size(col("nbrs")), lit(1))).getField("d2"))
      case "avg" => aggregate(col("nbrs"), lit(0.0),
        (acc, x) => acc + sqrt(x.getField("d2"))) / greatest(size(col("nbrs")), lit(1))
    }
    df.join(dists.withColumn(outCol, v).select("order_key", outCol),
      Seq("order_key"), "left")
  }
}
