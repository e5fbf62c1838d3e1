package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal planar geometry for the spatial core: WKT polygons, even-odd
  * point-in-polygon, and a GridPnp-style uniform-grid accelerator.
  *
  * Semantics mirror the reference's crop/overlay machinery
  * (filters/private/pnp/GridPnp.hpp:33-81): a uniform grid over the polygon
  * bbox, per-cell crossing-edge lists, a per-cell reference point of known
  * parity, and an O(cell edges) per-point test. The structure is immutable
  * and Serializable so it broadcasts to executors and is referenced from a
  * codegen'd Catalyst expression (GridPnpContains).
  */
final case class Ring(xs: Array[Double], ys: Array[Double]) {
  def size: Int = xs.length
}

final case class PolyGeom(rings: Array[Ring]) {
  val (minX, minY, maxX, maxY) = {
    var mnx = Double.MaxValue; var mny = Double.MaxValue
    var mxx = Double.MinValue; var mxy = Double.MinValue
    for (r <- rings; i <- 0 until r.size) {
      val x = r.xs(i); val y = r.ys(i)
      if (x < mnx) mnx = x; if (x > mxx) mxx = x
      if (y < mny) mny = y; if (y > mxy) mxy = y
    }
    (mnx, mny, mxx, mxy)
  }
}

object Wkt {
  /** Parse POLYGON / MULTIPOLYGON (2D or 2.5D — Z ignored). Ring grammar
    * only; no GEOS. Returns all polygons; even-odd across every ring gives
    * GEOS-compatible results for valid inputs (holes included). */
  def parse(wkt: String): Array[PolyGeom] = {
    val s = wkt.trim
    val upper = s.toUpperCase
    def parseRing(body: String): Ring = {
      val pts = body.split(',').map(_.trim).filter(_.nonEmpty)
      val xs = new Array[Double](pts.length)
      val ys = new Array[Double](pts.length)
      var i = 0
      while (i < pts.length) {
        val nums = pts(i).split("\\s+")
        xs(i) = nums(0).toDouble; ys(i) = nums(1).toDouble
        i += 1
      }
      Ring(xs, ys)
    }
    // split top-level groups delimited by balanced parens
    def groups(body: String): Seq[String] = {
      val out = ArrayBuffer[String]()
      var depth = 0; var start = -1
      for (i <- body.indices) body(i) match {
        case '(' => depth += 1; if (depth == 1) start = i + 1
        case ')' => depth -= 1; if (depth == 0) out += body.substring(start, i)
        case _ =>
      }
      out.toSeq
    }
    if (upper.startsWith("MULTIPOLYGON")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      groups(body).map(pg => PolyGeom(groups("(" + pg + ")").headOption match {
        case _ => groups(pg).map(parseRing).toArray match {
          case rs if rs.nonEmpty => rs
          case _ => Array(parseRing(pg))
        }
      })).toArray
    } else if (upper.startsWith("POLYGON")) {
      val body = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')'))
      Array(PolyGeom(groups(body).map(parseRing).toArray))
    } else throw new IllegalArgumentException(s"unsupported WKT: ${s.take(40)}")
  }

  /** Even-odd raycast over every ring of every polygon (the reference's
    * PnP parity rule; validated against the 47-point crop golden). */
  def containsRaw(polys: Array[PolyGeom], x: Double, y: Double): Boolean = {
    var inside = false
    var p = 0
    while (p < polys.length) {
      val poly = polys(p)
      if (x >= poly.minX && x <= poly.maxX && y >= poly.minY && y <= poly.maxY) {
        var r = 0
        while (r < poly.rings.length) {
          val ring = poly.rings(r)
          val n = ring.size
          var i = 0; var j = n - 1
          while (i < n) {
            val xi = ring.xs(i); val yi = ring.ys(i)
            val xj = ring.xs(j); val yj = ring.ys(j)
            if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
              inside = !inside
            j = i; i += 1
          }
          r += 1
        }
      }
      p += 1
    }
    inside
  }
}

/** Edge of a polygon ring, flattened for the grid. */
final private[functions] case class Edge(x1: Double, y1: Double, x2: Double, y2: Double)

/** GridPnp-in-spirit accelerator (filters/private/pnp/GridPnp.hpp): the
  * bbox is divided into ~sqrt(E) x sqrt(E) cells; each cell stores the
  * edges that cross it plus the parity of the cell's center reference
  * point (computed eagerly at build, vs the reference's lazy ray-walk).
  * A point test crosses only the edges in its cell: parity(point) =
  * parity(center) XOR segment-crossings(center -> point).
  */
final class PnpGrid(val polys: Array[PolyGeom], cellsHint: Int = 0) extends Serializable {
  val minX: Double = polys.map(_.minX).min
  val minY: Double = polys.map(_.minY).min
  val maxX: Double = polys.map(_.maxX).max
  val maxY: Double = polys.map(_.maxY).max

  private val allEdges: Array[Edge] = {
    val out = ArrayBuffer[Edge]()
    for (p <- polys; r <- p.rings) {
      val n = r.size
      var i = 0; var j = n - 1
      while (i < n) {
        out += Edge(r.xs(j), r.ys(j), r.xs(i), r.ys(i))
        j = i; i += 1
      }
    }
    out.toArray
  }

  val nx: Int = if (cellsHint > 0) cellsHint
    else math.max(4, math.min(256, math.ceil(math.sqrt(allEdges.length.toDouble)).toInt))
  val ny: Int = nx
  private val dx = math.max((maxX - minX) / nx, 1e-12)
  private val dy = math.max((maxY - minY) / ny, 1e-12)

  // per-cell edge index lists + center parity
  private val cellEdges: Array[Array[Edge]] = {
    val buf = Array.fill(nx * ny)(ArrayBuffer[Edge]())
    for (e <- allEdges) {
      val cx0 = clampX(((math.min(e.x1, e.x2) - minX) / dx).toInt)
      val cx1 = clampX(((math.max(e.x1, e.x2) - minX) / dx).toInt)
      val cy0 = clampY(((math.min(e.y1, e.y2) - minY) / dy).toInt)
      val cy1 = clampY(((math.max(e.y1, e.y2) - minY) / dy).toInt)
      // conservative bbox cover of the edge — cells never miss an edge
      var cx = cx0
      while (cx <= cx1) {
        var cy = cy0
        while (cy <= cy1) { buf(cy * nx + cx) += e; cy += 1 }
        cx += 1
      }
    }
    buf.map(_.toArray)
  }
  private val centerInside: Array[Boolean] = {
    val out = new Array[Boolean](nx * ny)
    var c = 0
    while (c < out.length) {
      val cx = c % nx; val cy = c / nx
      out(c) = Wkt.containsRaw(polys, minX + (cx + 0.5) * dx, minY + (cy + 0.5) * dy)
      c += 1
    }
    out
  }

  @inline private def clampX(i: Int): Int = if (i < 0) 0 else if (i >= nx) nx - 1 else i
  @inline private def clampY(i: Int): Int = if (i < 0) 0 else if (i >= ny) ny - 1 else i

  @inline private def orient(px: Double, py: Double, qx: Double, qy: Double,
      rx: Double, ry: Double): Double =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)

  /** 2 = proper crossing, 0 = none, -1 = degenerate (touch/collinear —
    * caller must fall back to the exact raycast). */
  @inline private def crossKind(ax: Double, ay: Double, bx: Double, by: Double, e: Edge): Int = {
    val d1 = orient(ax, ay, bx, by, e.x1, e.y1)
    val d2 = orient(ax, ay, bx, by, e.x2, e.y2)
    val d3 = orient(e.x1, e.y1, e.x2, e.y2, ax, ay)
    val d4 = orient(e.x1, e.y1, e.x2, e.y2, bx, by)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) 2
    else if (d1 == 0 || d2 == 0 || d3 == 0 || d4 == 0) -1
    else 0
  }

  def contains(x: Double, y: Double): Boolean = {
    if (x < minX || x > maxX || y < minY || y > maxY) return false
    val cx = clampX(((x - minX) / dx).toInt)
    val cy = clampY(((y - minY) / dy).toInt)
    val c = cy * nx + cx
    val edges = cellEdges(c)
    if (edges.isEmpty) return centerInside(c)
    val ax = minX + (cx + 0.5) * dx
    val ay = minY + (cy + 0.5) * dy
    var parity = centerInside(c)
    var i = 0
    while (i < edges.length) {
      crossKind(ax, ay, x, y, edges(i)) match {
        case 2 => parity = !parity
        case -1 => return Wkt.containsRaw(polys, x, y) // degenerate touch
        case _ =>
      }
      i += 1
    }
    parity
  }

  /** Planar distance to the polygon boundary; 0 when inside (GEOS
    * `distance` semantics for filters.geomdistance). */
  def distance(x: Double, y: Double): Double = {
    if (contains(x, y)) return 0.0
    var best = Double.MaxValue
    var i = 0
    while (i < allEdges.length) {
      val e = allEdges(i)
      val vx = e.x2 - e.x1; val vy = e.y2 - e.y1
      val len2 = vx * vx + vy * vy
      val t = if (len2 <= 0) 0.0
        else math.max(0.0, math.min(1.0, ((x - e.x1) * vx + (y - e.y1) * vy) / len2))
      val dx = x - (e.x1 + t * vx); val dy = y - (e.y1 + t * vy)
      val d2 = dx * dx + dy * dy
      if (d2 < best) best = d2
      i += 1
    }
    math.sqrt(best)
  }

  /** Grid cells (cx, cy) whose box intersects the polygon bbox — for the
    * cell-partitioned join path (covering-cell IN-list, SURVEY §4). */
  def coveringCells(cellLen: Double, ox: Double, oy: Double): Seq[(Int, Int)] = {
    // MUST bin with the same trunc-then-decrement convention the write
    // path uses (CellMath.cellCoord): math.floor differs at exact
    // negative multiples of cellLen (floor(-1.0) = -1 vs cellCoord -2),
    // and a covering set computed with floor would prune the partition
    // such boundary points were written to — silent row loss.
    val x0 = CellMath.cellCoord(minX, ox, cellLen)
    val x1 = CellMath.cellCoord(maxX, ox, cellLen)
    val y0 = CellMath.cellCoord(minY, oy, cellLen)
    val y1 = CellMath.cellCoord(maxY, oy, cellLen)
    for (cx <- x0 to x1; cy <- y0 to y1) yield (cx, cy)
  }
}
