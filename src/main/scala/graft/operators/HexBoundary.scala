package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.CellMath

/** Boundary polygon of the occupied hex set — the primary output of
  * filters.hexbin / kernels.density (filters/HexBinFilter.cpp:137-232,
  * boundary metadata :189).
  *
  * Shape: the distributed part is the hex-density groupBy (HexBin);
  * tracing runs driver-side over the OCCUPIED HEX SET, which is smaller
  * than the input by the mean hex population (the reference also builds
  * the boundary from the hex grid, not the points). Corner coordinates
  * are integer lattice points (units sqrt(3)/2*edge by edge/2), so the
  * shared edge of two neighboring hexes cancels exactly — no epsilon
  * comparisons.
  *
  * Rings are emitted with shells CCW and holes CW (signed area); holes
  * are nested into the shell containing them, giving an OGC-valid
  * MULTIPOLYGON. The reference's optional `smooth` pass is not applied
  * (documented out of scope — hexer's smoothing is cosmetic).
  */
object HexBoundary {

  case class Boundary(wkt: String, rings: Int, vertices: Int)

  /** @param hexes output of HexBin (needs hex_id, hex_edge columns)
    * @return WKT MULTIPOLYGON of the occupied area */
  def wkt(hexes: DataFrame): Boundary = {
    val rows = hexes.select("hex_id", "hex_edge").collect()
    if (rows.isEmpty) return Boundary("MULTIPOLYGON EMPTY", 0, 0)
    val edge = rows.head.getDouble(1)
    val cells = rows.map(r => (CellMath.unpackX(r.getLong(0)), CellMath.unpackY(r.getLong(0))))
    fromCells(cells, edge)
  }

  /** Boundary from axial (q, r) hex coords. */
  def fromCells(cells: Array[(Int, Int)], edge: Double): Boundary = {
    // integer corner lattice: center CX = 2q + r (u = sqrt3/2*edge),
    // CY = 3r (u = edge/2); pointy-top corners CCW from the top
    def corners(q: Int, r: Int): Array[(Int, Int)] = {
      val cx = 2 * q + r; val cy = 3 * r
      Array((cx, cy + 2), (cx - 1, cy + 1), (cx - 1, cy - 1),
        (cx, cy - 2), (cx + 1, cy - 1), (cx + 1, cy + 1))
    }
    // directed edges of all hexes; an interior edge appears once in each
    // direction — boundary edges are those whose reverse is absent
    val dir = new scala.collection.mutable.HashSet[((Int, Int), (Int, Int))]
    cells.foreach { case (q, r) =>
      val cs = corners(q, r)
      for (i <- cs.indices) dir.add((cs(i), cs((i + 1) % 6)))
    }
    val boundary = dir.filter { case (a, b) => !dir.contains((b, a)) }
    // chain into rings: each boundary vertex has exactly one outgoing
    // boundary edge within its ring (hex grids: a vertex can touch at
    // most... pinch vertices CAN have two outgoing edges when two hexes
    // meet only at a corner — resolve by preferring the edge that turns
    // most sharply left, keeping rings simple)
    val out = new scala.collection.mutable.HashMap[(Int, Int), List[(Int, Int)]]
      .withDefaultValue(Nil)
    boundary.foreach { case (a, b) => out(a) = b :: out(a) }
    val used = new scala.collection.mutable.HashSet[((Int, Int), (Int, Int))]
    val rings = new scala.collection.mutable.ArrayBuffer[Vector[(Int, Int)]]
    boundary.foreach { case start @ (a0, b0) =>
      if (!used.contains(start)) {
        var ring = Vector(a0)
        var prev = a0
        var cur = b0
        used.add(start)
        while (cur != a0) {
          ring :+= cur
          val nexts = out(cur).filter(n => !used.contains((cur, n)))
          require(nexts.nonEmpty, s"open boundary chain at $cur")
          // pinch vertex: pick the sharpest left turn relative to the
          // incoming direction so each ring stays simple
          val (dx, dy) = (cur._1 - prev._1, cur._2 - prev._2)
          val next = nexts.maxBy { n =>
            val (ex, ey) = (n._1 - cur._1, n._2 - cur._2)
            math.atan2((dx * ey - dy * ex).toDouble, (dx * ex + dy * ey).toDouble)
          }
          used.add((cur, next))
          prev = cur
          cur = next
        }
        rings += ring
      }
    }
    // signed area in lattice units: CCW (>0) = shell, CW = hole
    def area2(ring: Vector[(Int, Int)]): Long =
      ring.indices.map { i =>
        val (x1, y1) = ring(i); val (x2, y2) = ring((i + 1) % ring.size)
        x1.toLong * y2 - x2.toLong * y1
      }.sum
    def toXY(p: (Int, Int)): (Double, Double) =
      (p._1 * math.sqrt(3.0) / 2.0 * edge, p._2 * 0.5 * edge)
    def inside(pt: (Int, Int), ring: Vector[(Int, Int)]): Boolean = {
      var c = false
      var j = ring.size - 1
      for (i <- ring.indices) {
        val (xi, yi) = ring(i); val (xj, yj) = ring(j)
        if ((yi > pt._2) != (yj > pt._2) &&
            pt._1.toDouble < (xj - xi).toDouble * (pt._2 - yi) / (yj - yi) + xi)
          c = !c
        j = i
      }
      c
    }
    val (shells, holes) = rings.partition(area2(_) > 0)
    // nest each hole into the SMALLEST enclosing shell: with nested
    // shell-hole-shell-hole structure (an island inside a hole), an
    // inner hole is geometrically inside every outer shell too —
    // attaching to all of them would duplicate the ring and punch the
    // hole through the island that fills it. Shells of a boundary set
    // never cross, so containment order == area order.
    val attached = holes.flatMap { h =>
      val enclosing = shells.filter(s => inside(h.head, s))
      if (enclosing.isEmpty) None else Some((enclosing.minBy(area2), h))
    }
    val grouped = shells.map { s =>
      (s, attached.collect { case (sh, h) if sh eq s => h })
    }
    def ringWkt(r: Vector[(Int, Int)]): String = {
      val pts = (r :+ r.head).map(toXY)
        .map { case (x, y) => s"$x $y" }.mkString(", ")
      s"($pts)"
    }
    val polys = grouped.map { case (s, hs) =>
      "(" + (ringWkt(s) +: hs.map(ringWkt)).mkString(", ") + ")"
    }
    Boundary(s"MULTIPOLYGON (${polys.mkString(", ")})",
      rings.size, rings.map(_.size).sum)
  }

  case class DensityReport(boundaryWkt: String, rings: Int, vertices: Int,
      occupiedHexes: Long, area: Double, density: Double)

  /** Boundary + the density metadata the reference emits alongside it
    * (hexbin `density` output + boundary). */
  def densityReport(df: DataFrame, edge: Double = 0.0): DensityReport = {
    val hexes = HexBin(df, edge).cache()
    val first = hexes.select("hex_edge").take(1)
    if (first.isEmpty) { // empty input: no hexes, empty boundary
      hexes.unpersist()
      return DensityReport("MULTIPOLYGON EMPTY", 0, 0, 0L, 0.0, 0.0)
    }
    val e = first(0).getDouble(0)
    val nHex = hexes.count()
    val nPts = hexes.agg(sum("density")).head().getLong(0)
    val area = nHex * 3.0 * math.sqrt(3.0) / 2.0 * e * e
    val b = wkt(hexes)
    hexes.unpersist()
    DensityReport(b.wkt, b.rings, b.vertices, nHex, area,
      nPts / math.max(area, 1e-300))
  }
}
