package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expr.DimRange

/** One kNN hit: squared distance, candidate order_key, carried value.
  * Ordering (d2, cid) makes top-k deterministic at any parallelism. */
case class Hit(d2: Double, cid: Long, v: Double)

/** Grid-partitioned kNN join — the engine's primitive behind PDAL's
  * KD3Index-based neighborhood filters (pdal/KDIndex.hpp:52-115, built
  * per-view; here per grid cell, distributed).
  *
  * Two-phase cell-neighborhood shuffle (SURVEY §2.7 north-star):
  * phase 1 cogroups queries with candidates of the 3x3x3 cell
  * neighborhood and computes per-cell partial top-k; phase 2 re-joins ONLY
  * the points whose kth-distance ball escapes the examined cube
  * (sqrt(d2_k) <= R*h proves the local result final — the halo-exchange
  * correctness property of SURVEY §7.4.3) against the next Chebyshev
  * shell, iterating until resolved. The shuffled payload is only
  * (qid, x, y, z[, hits]) — spans and other wide columns never move.
  *
  * Skew: cell size targets ~`targetPerCell` candidates per cell from a
  * global count/bbox estimate; residual hot cells are one task each and
  * AQE splits the skewed shuffle partitions.
  */
object KnnJoin {
  private val B = 1L << 20 // per-axis cell-coordinate bias

  private def cellCoord(v: Column, h: Double): Column =
    floor(v / h).cast("long")

  private def pack3(cx: Column, cy: Column, cz: Column): Column =
    shiftleft(cx + B, 42).bitwiseOR(shiftleft(cy + B, 21)).bitwiseOR(cz + B)

  /** Chebyshev shell-R offsets (R=0 -> just (0,0,0)). */
  private def shellOffsets(r: Int): Seq[(Int, Int, Int)] =
    if (r == 0) Seq((0, 0, 0))
    else for {
      dx <- -r to r; dy <- -r to r; dz <- -r to r
      if math.max(math.abs(dx), math.max(math.abs(dy), math.abs(dz))) == r
    } yield (dx, dy, dz)

  /** Hot halo-cells at cell size h: cells whose 27-cell neighborhood
    * holds more than `cap` candidates, with their salt factor (capped at
    * 64 groups). Two stages so uniform data pays only one slim
    * map-side-combined aggregate: a destination cell can exceed cap only
    * if some base neighbor cell exceeds cap/27, so the exact (27x
    * exploded) count runs only when the cheap base count flags anything. */
  private[graft] def detectHotCells(cand: DataFrame, h: Double, cap: Int): Map[Long, Int] = {
    def cells = cand.select(cellCoord(col("x"), h).as("cx"),
      cellCoord(col("y"), h).as("cy"), cellCoord(col("z"), h).as("cz"))
    val basePre = cells.select(pack3(col("cx"), col("cy"), col("cz")).as("cell"))
      .groupBy("cell").count().filter(col("count") > cap / 27)
      .limit(1).count()
    if (basePre == 0L) return Map.empty
    val offs = array((shellOffsets(0) ++ shellOffsets(1)).map { case (dx, dy, dz) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(dz).as("dz"))
    }: _*)
    cells.withColumn("__o", explode(offs))
      .select(pack3(col("cx") + col("__o.dx"), col("cy") + col("__o.dy"),
        col("cz") + col("__o.dz")).as("cell"))
      .groupBy("cell").count().filter(col("count") > cap).collect()
      .map(r => r.getLong(0) ->
        math.min(math.ceil(r.getLong(1).toDouble / cap), 64.0).toInt).toMap
  }

  /** Estimate a cell edge targeting `target` candidates/cell. */
  def estimateCellSize(cand: DataFrame, target: Double = 64.0): Double = {
    val r = cand.agg(count(lit(1)), min("x"), max("x"), min("y"), max("y"),
      min("z"), max("z")).head()
    val n = math.max(r.getLong(0), 1L)
    val ex = math.max(r.getDouble(2) - r.getDouble(1), 1e-9)
    val ey = math.max(r.getDouble(4) - r.getDouble(3), 1e-9)
    val ez = r.getDouble(6) - r.getDouble(5)
    if (ez <= 1e-12) math.sqrt(ex * ey * target / n) // planar data -> 2D cells
    else math.cbrt(ex * ey * ez * target / n)
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
      selfJoin: Boolean = false, maxCellCandidates: Int = 100000): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    // materialize both inputs ONCE: everything downstream (extent agg,
    // per-ring candidate scans, escalated binnings) would otherwise
    // re-execute the caller's full upstream plan per job. For self-kNN
    // the query side IS the candidate side — one materialization.
    val candCols =
      if (valueCol == "order_key") Seq(col("x"), col("y"), col("z"), col("order_key"))
      else Seq(col("x"), col("y"), col("z"), col("order_key"), col(valueCol))
    val candM = graft.core.Mat(cand.select(candCols: _*))
    val queriesM =
      if (selfJoin) candM.select("order_key", "x", "y", "z")
      else graft.core.Mat(queries.select("order_key", "x", "y", "z"))

    val ext = candM.agg(count(lit(1)), min("x"), max("x"), min("y"), max("y"),
      min("z"), max("z")).head()
    val hitType = "array<struct<d2:double,cid:bigint,v:double>>"
    if (ext.getLong(0) == 0L) // no candidates at all
      return queries.select(col("order_key"),
        typedLit(Seq.empty[(Double, Long, Double)]).cast(hitType).as("knn"))
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
        if (qe.getLong(0) == 0L) ext
        else org.apache.spark.sql.Row(ext.getLong(0),
          math.min(ext.getDouble(1), qe.getDouble(1)), math.max(ext.getDouble(2), qe.getDouble(2)),
          math.min(ext.getDouble(3), qe.getDouble(3)), math.max(ext.getDouble(4), qe.getDouble(4)),
          math.min(ext.getDouble(5), qe.getDouble(5)), math.max(ext.getDouble(6), qe.getDouble(6)))
      }
    val maxExtent = math.max(1e-9, math.max(uext.getDouble(2) - uext.getDouble(1),
      math.max(uext.getDouble(4) - uext.getDouble(3), uext.getDouble(6) - uext.getDouble(5))))

    val h0raw = if (cellSize > 0) cellSize else estimateCellSize(candM, math.max(64.0, k * 4.0))
    val h0 = if (h0raw.isNaN || h0raw <= 1e-12) maxExtent / 16 else h0raw

    def candPrep(h: Double) = candM.select(
      pack3(cellCoord(col("x"), h), cellCoord(col("y"), h), cellCoord(col("z"), h)).as("cell"),
      col("x"), col("y"), col("z"), col("order_key").as("cid"),
      col(valueCol).cast("double").as("v"))
      .withColumn("__salt", lit(0))

    /** Candidates duplicated into their 27-cube neighbor cells (the halo
      * exchange on the CANDIDATE side): every ring-1 query then joins a
      * single cell and gets its final cube-1 top-k in ONE cogroup — no
      * per-query partial-merge shuffle at all. */
    def candHaloBase(h: Double) = {
      val offs = array((shellOffsets(0) ++ shellOffsets(1)).map { case (dx, dy, dz) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(dz).as("dz"))
      }: _*)
      candM.select(
          cellCoord(col("x"), h).as("cx"), cellCoord(col("y"), h).as("cy"),
          cellCoord(col("z"), h).as("cz"),
          col("x"), col("y"), col("z"), col("order_key").as("cid"),
          col(valueCol).cast("double").as("v"))
        .withColumn("__o", explode(offs))
        .select(pack3(col("cx") + col("__o.dx"), col("cy") + col("__o.dy"),
            col("cz") + col("__o.dz")).as("cell"),
          col("x"), col("y"), col("z"), col("cid"), col("v"))
    }

    /** Halo candidates with skew salt: rows of hot destination cells get
      * a deterministic hash salt in [0, S) so each cogroup group holds at
      * most ~cap candidates. */
    def candHalo(h: Double, hotDf: Option[DataFrame]) = hotDf match {
      case Some(hd) => candHaloBase(h).join(hd, Seq("cell"), "left")
        .withColumn("__salt", when(col("__s").isNotNull,
          pmod(xxhash64(col("cid")), col("__s").cast("long")).cast("int"))
          .otherwise(lit(0)))
        .drop("__s")
      case None => candHaloBase(h).withColumn("__salt", lit(0))
    }

    def detectHot(h: Double, cap: Int): Map[Long, Int] = detectHotCells(candM, h, cap)

    def bin(q: DataFrame, h: Double): DataFrame = q.select(col("qid"),
      col("qx"), col("qy"), col("qz"),
      cellCoord(col("qx"), h).as("ccx"), cellCoord(col("qy"), h).as("ccy"),
      cellCoord(col("qz"), h).as("ccz"))

    def ringPartials(q: DataFrame, shell: Seq[(Int, Int, Int)],
        candsDf: DataFrame, filterCells: Boolean,
        hotDf: Option[DataFrame] = None): DataFrame = {
      val offs = array(shell.map { case (dx, dy, dz) =>
        struct(lit(dx).as("dx"), lit(dy).as("dy"), lit(dz).as("dz"))
      }: _*)
      val exploded0 = q.withColumn("__o", explode(offs))
        .select(col("qid"), col("qx"), col("qy"), col("qz"),
          pack3(col("ccx") + col("__o.dx"), col("ccy") + col("__o.dy"),
            col("ccz") + col("__o.dz")).as("cell"))
      // queries probing a hot cell fan out to every salt group of that
      // cell (candidates were split); cold cells keep the single salt 0
      val exploded = (hotDf match {
        case Some(hd) => exploded0.join(hd, Seq("cell"), "left")
          .withColumn("__salt",
            explode(sequence(lit(0), coalesce(col("__s"), lit(1)) - 1)))
          .drop("__s")
        case None => exploded0.withColumn("__salt", lit(0))
      }).select("qid", "qx", "qy", "qz", "cell", "__salt")
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
          // unpack candidates into primitive arrays once per cell — the
          // inner loop below is allocation-free (hot path of the join)
          val cBuf = cs.toArray
          if (cBuf.isEmpty) Iterator.empty
          else {
            val n = cBuf.length
            val cxA = new Array[Double](n); val cyA = new Array[Double](n)
            val czA = new Array[Double](n); val cidA = new Array[Long](n)
            val cvA = new Array[Double](n)
            var j = 0
            while (j < n) {
              val c = cBuf(j)
              cxA(j) = c._2; cyA(j) = c._3; czA(j) = c._4
              cidA(j) = c._5; cvA(j) = c._6
              j += 1
            }
            qs.map { case (qid, qx, qy, qz, _, _) =>
              // fixed-size insertion-sorted top-k on primitive arrays
              val bd = new Array[Double](k); val bc = new Array[Long](k)
              val bv = new Array[Double](k)
              var cnt = 0
              var i = 0
              while (i < n) {
                val dx = cxA(i) - qx; val dy = cyA(i) - qy; val dz = czA(i) - qz
                val d2 = dx * dx + dy * dy + dz * dz
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
                i += 1
              }
              val out = new Array[Hit](cnt)
              var q2 = 0
              while (q2 < cnt) { out(q2) = Hit(bd(q2), bc(q2), bv(q2)); q2 += 1 }
              (qid, out)
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
          // n <= cap means no cell can exceed the cap — detection free
          val hot =
            if (ext.getLong(0) <= maxCellCandidates) Map.empty[Long, Int]
            else detectHot(h, maxCellCandidates)
          val hotDf =
            if (hot.isEmpty) None
            else Some(broadcast(
              spark.createDataFrame(hot.toSeq).toDF("cell", "__s")))
          val partials = ringPartials(q, shellOffsets(0), candHalo(h, hotDf),
            filterCells = false, hotDf = hotDf)
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
        // one materialization per ring: resolved AND pending filters read
        // the checkpointed rows; the cogroup behind `accumulated` runs once
        val joined = bin(pending, h).join(accumulated, Seq("qid"), "left")
          .withColumn("knn", coalesce(col("knn"),
            typedLit(Seq.empty[(Double, Long, Double)]).cast(hitType)))
          .withColumn("__final", isFinal)
          .localCheckpoint(true)
        resolvedParts = joined.filter(col("__final")).select(col("qid"), col("knn")) :: resolvedParts
        val nextPending = joined.filter(!col("__final"))
        pending = nextPending.select("qid", "qx", "qy", "qz")
        if (pending.isEmpty) done = true
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
      valueCol = "order_key", cellSize = cellSize)
    val dists = knn.select(col("order_key"),
      slice(col("knn"), lit(2), greatest(size(col("knn")) - 1, lit(0))).as("nbrs"))
    val v = mode match {
      case "kth" => sqrt(try_element_at(col("nbrs"), size(col("nbrs")))
        .getField("d2"))
      case "avg" => aggregate(col("nbrs"), lit(0.0),
        (acc, x) => acc + sqrt(x.getField("d2"))) / greatest(size(col("nbrs")), lit(1))
    }
    df.join(dists.withColumn(outCol, v).select("order_key", outCol),
      Seq("order_key"), "left")
  }
}
