package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** filters.projpipeline analog (filters/ProjPipelineFilter.cpp:70-77,
  * 105-122): apply a PROJ coordinate-operation pipeline string to
  * (x, y, z) point-wise, with `reverse_transfo` evaluating the inverse
  * path and `out_srs` tagging the result CRS.
  *
  * The reference delegates to libproj; there is no PROJ database in
  * scope (documented since round 1), so the engine compiles a documented
  * SUBSET of the PROJ pipeline language to pure codegen'd column math:
  *
  *   +proj=pipeline +step ... framing (or a single bare step)
  *   steps: axisswap (signed +order permutations), unitconvert
  *          (angular deg/rad/grad, linear m/km/dm/cm/mm/ft/us-ft/yd/in),
  *          affine (xoff/yoff/zoff, s11..s33), utm (+zone, +south),
  *          webmerc, cart|geocent (WGS84 geodetic<->ECEF, Bowring
  *          inverse), helmert (3/7-param, position_vector or
  *          coordinate_frame convention — compiled to an affine step),
  *          noop|longlat|latlong (identity)
  *   per-step modifiers: +inv, +omit_fwd, +omit_inv
  *
  * Projection steps follow the PROJ convention: angular input/output is
  * RADIANS (compose with unitconvert for degrees). Unsupported steps AND
  * unknown step parameters fail loudly, listing what is supported;
  * boolean modifiers follow PROJ's pj_param semantics (bare presence or
  * an explicit true/false value). Every step is simultaneous-update
  * column arithmetic (withColumns evaluates against the incoming row),
  * so the whole pipeline stays inside whole-stage codegen — no UDF, no
  * shuffle. */
object ProjPipeline {

  /** WGS84 constants — the shared ellipsoid object (Transform.scala). */
  private val A = Wgs84.A
  private val E2 = Wgs84.E2
  private val B = Wgs84.B
  private val EP2 = Wgs84.EP2

  private type V3 = (Column, Column, Column)

  private[operators] sealed trait Op {
    def fwd(v: V3): V3
    def inv(v: V3): V3
  }

  /** Signed 1-based axis permutation (PROJ axisswap +order=2,-1,3). */
  private final case class AxisSwap(order: Seq[Int]) extends Op {
    require(order.map(math.abs).sorted == Seq(1, 2, 3),
      s"axisswap +order must be a signed permutation of 1,2,3: $order")
    def fwd(v: V3): V3 = {
      val in = Array(v._1, v._2, v._3)
      def pick(o: Int) = { val c = in(math.abs(o) - 1); if (o < 0) -c else c }
      (pick(order(0)), pick(order(1)), pick(order(2)))
    }
    def inv(v: V3): V3 = {
      val in = Array(v._1, v._2, v._3)
      val out = new Array[Column](3)
      for (i <- 0 until 3) {
        val o = order(i); val j = math.abs(o) - 1
        out(j) = if (o < 0) -in(i) else in(i)
      }
      (out(0), out(1), out(2))
    }
  }

  /** Multiplicative unit conversion; inverse multiplies by the
    * reciprocal (PROJ applies the same factor pair). */
  private final case class UnitConvert(xy: Double, z: Double) extends Op {
    private def m(c: Column, f: Double) = if (f == 1.0) c else c * lit(f)
    def fwd(v: V3): V3 = (m(v._1, xy), m(v._2, xy), m(v._3, z))
    def inv(v: V3): V3 = (m(v._1, 1 / xy), m(v._2, 1 / xy), m(v._3, 1 / z))
  }

  /** x' = M x + t. Zero coefficients are dropped from the built
    * expression (identity rows compile to the input column unchanged —
    * NaN propagation from dims with zero weight is the only semantic
    * difference, as with any sparse matrix apply). */
  private final case class Affine(m: Seq[Double], t: Seq[Double]) extends Op {
    require(m.length == 9 && t.length == 3)
    private def row(r: Int, v: V3): Column = {
      val cols = Seq(v._1, v._2, v._3)
      val terms = (0 until 3).flatMap { c =>
        val k = m(r * 3 + c)
        if (k == 0.0) None
        else if (k == 1.0) Some(cols(c))
        else Some(lit(k) * cols(c))
      }
      val lin = terms.reduceOption(_ + _)
      (lin, t(r)) match {
        case (None, off) => lit(off)
        case (Some(l), 0.0) => l
        case (Some(l), off) => l + lit(off)
      }
    }
    def fwd(v: V3): V3 = (row(0, v), row(1, v), row(2, v))
    def inv(v: V3): V3 = Affine.invert(m, t).fwd(v)
  }
  private object Affine {
    /** Exact 3x3 inverse via adjugate (driver-side doubles). */
    def invert(m: Seq[Double], t: Seq[Double]): Affine = {
      val Seq(a, b, c, d, e, f, g, h, i) = m
      val det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
      require(math.abs(det) > 1e-300, "affine matrix is singular — no inverse path")
      val inv = Seq(
        (e * i - f * h) / det, (c * h - b * i) / det, (b * f - c * e) / det,
        (f * g - d * i) / det, (a * i - c * g) / det, (c * d - a * f) / det,
        (d * h - e * g) / det, (b * g - a * h) / det, (a * e - b * d) / det)
      val ti = (0 until 3).map(r =>
        -(inv(r * 3) * t(0) + inv(r * 3 + 1) * t(1) + inv(r * 3 + 2) * t(2)))
      Affine(inv, ti)
    }
  }

  /** Transverse Mercator (UTM zone) — radians in, meters out. Reuses the
    * engine's Kruger-series DataFrame formulation via a degree bridge
    * (filters/ReprojectionFilter.cpp pairs; operators/Transform.scala). */
  private final case class Utm(zone: Int, south: Boolean) extends Op {
    require(zone >= 1 && zone <= 60, s"utm +zone out of range: $zone")
    def fwd(v: V3): V3 = throw new IllegalStateException("df-level op")
    def inv(v: V3): V3 = throw new IllegalStateException("df-level op")
  }

  /** Spherical web-mercator (EPSG:3857 math) — radians in, meters out. */
  private case object WebMerc extends Op {
    def fwd(v: V3): V3 =
      (lit(A) * v._1, lit(A) * log(tan(lit(math.Pi / 4) + v._2 / 2)), v._3)
    def inv(v: V3): V3 =
      (v._1 / A, lit(2.0) * atan(exp(v._2 / A)) - lit(math.Pi / 2), v._3)
  }

  /** Geodetic (lon,lat radians + ellipsoidal height) <-> ECEF meters.
    * Inverse is Bowring's closed form (~1e-9 rad; poles excluded —
    * p -> 0 degeneracy documented). */
  private case object Cart extends Op {
    def fwd(v: V3): V3 = {
      val (lam, phi, h) = v
      val n = lit(A) / sqrt(lit(1.0) - lit(E2) * pow(sin(phi), 2))
      ((n + h) * cos(phi) * cos(lam),
       (n + h) * cos(phi) * sin(lam),
       (n * lit(1 - E2) + h) * sin(phi))
    }
    def inv(v: V3): V3 = {
      val (x, y, z) = v
      val p = sqrt(x * x + y * y)
      val theta = atan2(z * A, p * B)
      val phi = atan2(z + lit(EP2 * B) * pow(sin(theta), 3),
                      p - lit(E2 * A) * pow(cos(theta), 3))
      val n = lit(A) / sqrt(lit(1.0) - lit(E2) * pow(sin(phi), 2))
      (atan2(y, x), phi, p / cos(phi) - n)
    }
  }

  private case object Noop extends Op {
    def fwd(v: V3): V3 = v
    def inv(v: V3): V3 = v
  }

  /** One parsed step: base op + PROJ modifiers. */
  private[operators] final case class Step(op: Op, inv: Boolean,
      omitFwd: Boolean, omitInv: Boolean) {
    def forward(df: DataFrame): DataFrame =
      if (omitFwd) df else applyOp(df, op, inverse = inv)
    def inverse(df: DataFrame): DataFrame =
      if (omitInv) df else applyOp(df, op, inverse = !inv)
  }

  private def applyOp(df: DataFrame, op: Op, inverse: Boolean): DataFrame =
    op match {
      // UTM reuses the proven DataFrame-level series verbatim through a
      // radians<->degrees bridge (PROJ steps speak radians)
      case Utm(zone, south) if !inverse =>
        val deg = df.withColumns(Map(
          "x" -> degrees(col("x")), "y" -> degrees(col("y"))))
        Reprojection.wgs84ToUtm(deg, zone, south)
      case Utm(zone, south) =>
        val geo = Reprojection.utmToWgs84(df, zone, south)
        geo.withColumns(Map(
          "x" -> radians(col("x")), "y" -> radians(col("y"))))
      case _ =>
        val v = (col("x"), col("y"), col("z"))
        val (nx, ny, nz) = if (inverse) op.inv(v) else op.fwd(v)
        df.withColumns(Map("x" -> nx, "y" -> ny, "z" -> nz))
    }

  // ---- unit tables (PROJ proj_units / angular units) ----
  private val angularToRad = Map(
    "rad" -> 1.0, "deg" -> math.Pi / 180, "grad" -> math.Pi / 200)
  private val linearToM = Map(
    "m" -> 1.0, "km" -> 1000.0, "dm" -> 0.1, "cm" -> 0.01, "mm" -> 0.001,
    "ft" -> 0.3048, "us-ft" -> 1200.0 / 3937.0, "yd" -> 0.9144,
    "in" -> 0.0254)

  private def unitFactor(uin: String, uout: String, what: String): Double =
    (angularToRad.get(uin), angularToRad.get(uout),
     linearToM.get(uin), linearToM.get(uout)) match {
      case (Some(a), Some(b), _, _) => a / b
      case (_, _, Some(a), Some(b)) => a / b
      case _ => throw new IllegalArgumentException(
        s"unitconvert $what: unsupported or mixed-kind units '$uin'->'$uout' " +
        s"(angular: ${angularToRad.keys.mkString(",")}; linear: ${linearToM.keys.mkString(",")})")
    }

  private val ArcsecToRad = math.Pi / (180.0 * 3600.0)

  /** Keys that are booleans in PROJ (pj_param 'b'): present without a
    * value means true; an explicit value is parsed, not dropped. */
  private val BoolKeys = Set("inv", "omit_fwd", "omit_inv", "south")

  /** Per-op parameter whitelist — anything else in a step fails loudly
    * (the file's contract: no silent parameter drops). */
  private val OpParams: Map[String, Set[String]] = {
    val geo = Set("ellps", "datum")
    Map(
      "axisswap" -> Set("order"),
      "unitconvert" -> Set("xy_in", "xy_out", "z_in", "z_out"),
      "affine" -> Set("s11", "s12", "s13", "s21", "s22", "s23", "s31",
        "s32", "s33", "xoff", "yoff", "zoff"),
      "utm" -> (Set("zone", "south") ++ geo),
      "webmerc" -> geo,
      "cart" -> geo, "geocent" -> geo,
      "helmert" -> Set("x", "y", "z", "rx", "ry", "rz", "s", "convention"),
      "noop" -> Set.empty, "longlat" -> geo, "latlong" -> geo,
      "latlon" -> geo)
  }

  private def buildStep(kv: Map[String, String], flags: Set[String]): Step = {
    val projName = kv.getOrElse("proj",
      throw new IllegalArgumentException(s"step without +proj=: $kv"))
    for (allowed <- OpParams.get(projName)) {
      val known = allowed ++ Set("proj", "inv", "omit_fwd", "omit_inv")
      val unknown = (kv.keySet ++ flags) -- known
      require(unknown.isEmpty,
        s"+proj=$projName: unknown parameter(s) ${unknown.toSeq.sorted
          .map("+" + _).mkString(", ")} (supported: ${known.toSeq.sorted
          .map("+" + _).mkString(", ")})")
      // the engine's ellipsoid is WGS84-only (no PROJ database)
      for (e <- kv.get("ellps"))
        require(e == "WGS84", s"+ellps=$e unsupported — WGS84 only (no PROJ db)")
      for (d <- kv.get("datum"))
        require(d == "WGS84", s"+datum=$d unsupported — WGS84 only (no PROJ db)")
    }
    buildStepOp(kv, flags, projName)
  }

  private def buildStepOp(kv: Map[String, String], flags: Set[String],
      projName: String): Step = {
    def d(k: String, dflt: Double) = kv.get(k).map(_.toDouble).getOrElse(dflt)
    val op = projName match {
      case "axisswap" =>
        AxisSwap(kv.getOrElse("order", "1,2,3").split(',').map(_.trim.toInt).toSeq
          .padTo(3, 0).zipWithIndex.map { case (o, i) => if (o == 0) i + 1 else o })
      case "unitconvert" =>
        val xy = (kv.get("xy_in"), kv.get("xy_out")) match {
          case (Some(a), Some(b)) => unitFactor(a, b, "xy")
          case (None, None) => 1.0
          case _ => throw new IllegalArgumentException(
            "unitconvert needs both xy_in and xy_out (or neither)")
        }
        val z = (kv.get("z_in"), kv.get("z_out")) match {
          case (Some(a), Some(b)) => unitFactor(a, b, "z")
          case (None, None) => 1.0
          case _ => throw new IllegalArgumentException(
            "unitconvert needs both z_in and z_out (or neither)")
        }
        UnitConvert(xy, z)
      case "affine" =>
        Affine(
          Seq(d("s11", 1), d("s12", 0), d("s13", 0),
              d("s21", 0), d("s22", 1), d("s23", 0),
              d("s31", 0), d("s32", 0), d("s33", 1)),
          Seq(d("xoff", 0), d("yoff", 0), d("zoff", 0)))
      case "utm" =>
        Utm(kv.getOrElse("zone",
          throw new IllegalArgumentException("utm needs +zone=")).toInt,
          flags.contains("south"))
      case "webmerc" => WebMerc
      case "cart" | "geocent" => Cart
      case "helmert" =>
        // 3- or 7-parameter similarity on ECEF; compiled to Affine.
        // position_vector (default here, matching common EPSG usage):
        // R = I + [0 -rz ry; rz 0 -rx; -ry rx 0]; coordinate_frame is
        // the transpose (PROJ +convention=).
        val (tx, ty, tz) = (d("x", 0), d("y", 0), d("z", 0))
        val (rx, ry, rz) = (d("rx", 0) * ArcsecToRad,
          d("ry", 0) * ArcsecToRad, d("rz", 0) * ArcsecToRad)
        val s = 1.0 + d("s", 0) * 1e-6
        val cf = kv.get("convention") match {
          case Some("coordinate_frame") => true
          case Some("position_vector") | None => false
          case Some(other) => throw new IllegalArgumentException(
            s"helmert +convention=$other not supported " +
            "(position_vector | coordinate_frame)")
        }
        val sgn = if (cf) -1.0 else 1.0
        Affine(Seq(
          s, -sgn * rz * s, sgn * ry * s,
          sgn * rz * s, s, -sgn * rx * s,
          -sgn * ry * s, sgn * rx * s, s),
          Seq(tx, ty, tz))
      case "noop" | "longlat" | "latlong" | "latlon" => Noop
      case other => throw new IllegalArgumentException(
        s"+proj=$other is outside the supported PROJ-pipeline subset " +
        "(axisswap, unitconvert, affine, utm, webmerc, cart|geocent, " +
        "helmert, noop|longlat) — the reference links libproj; " +
        "datum-grid / database-backed operations are out of scope")
    }
    Step(op, flags.contains("inv"),
      flags.contains("omit_fwd"), flags.contains("omit_inv"))
  }

  /** Parse a coord_op string into steps. Accepts +proj=pipeline framing
    * or a single bare step; a +inv on the pipeline itself reverses the
    * whole operation (PROJ semantics). Returns (steps, globalReverse). */
  private[operators] def parse(coordOp: String): (Seq[Step], Boolean) = {
    val toks = coordOp.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def kvOf(t: String): (String, String) = {
      val s = t.stripPrefix("+")
      val i = s.indexOf('=')
      if (i < 0) (s, "") else (s.substring(0, i), s.substring(i + 1))
    }
    val groups: Seq[Seq[(String, String)]] = {
      val parsed = toks.map(kvOf)
      val stepIdx = parsed.zipWithIndex.collect { case (("step", _), i) => i }
      if (stepIdx.isEmpty) Seq(parsed)
      else {
        val head = parsed.take(stepIdx.head) // pipeline header
        val bounds = stepIdx :+ parsed.length
        head +: bounds.sliding(2).map { case Seq(a, b) =>
          parsed.slice(a + 1, b) }.toSeq
      }
    }
    val (header, stepGroups) =
      if (groups.length == 1) (Seq.empty[(String, String)], groups)
      else (groups.head, groups.tail)
    require(header.isEmpty || header.exists(_ == ("proj", "pipeline")),
      s"multi-step coord_op must start with +proj=pipeline: $coordOp")
    // same boolean grammar as step-level flags: bare presence is true,
    // malformed values fail loudly (no silent +inv=banana -> false)
    val globalReverse = header.exists {
      case ("inv", v) => v.isEmpty || (v.toLowerCase match {
        case "t" | "true" | "1" | "yes" | "on" => true
        case "f" | "false" | "0" | "no" | "off" => false
        case other => throw new IllegalArgumentException(
          s"+inv=$other is not a boolean (use +inv or +inv=true/false)")
      })
      case _ => false
    }
    val steps = stepGroups.map { g =>
      // PROJ boolean semantics (pj_param 'b'): bare presence is true, an
      // explicit value is parsed — '+south=1' must not silently read as
      // "no south" (a 10,000 km northing error)
      val flags = g.flatMap {
        case (k, "") => Some(k)
        case (k, v) if BoolKeys(k) => v.toLowerCase match {
          case "t" | "true" | "1" | "yes" | "on" => Some(k)
          case "f" | "false" | "0" | "no" | "off" => None
          case other => throw new IllegalArgumentException(
            s"+$k=$other is not a boolean (use +$k or +$k=true/false)")
        }
        case _ => None
      }.toSet
      buildStep(g.filter(_._2.nonEmpty).toMap, flags)
    }
    (steps.filterNot(_.op match {
      case Noop => true; case _ => false
    }) match {
      case s if s.isEmpty => Seq(Step(Noop, inv = false,
        omitFwd = false, omitInv = false))
      case s => s
    }, globalReverse)
  }

  def apply(df: DataFrame, coordOp: String, reverse: Boolean = false,
      outSrs: Option[String] = None): DataFrame = {
    require(Seq("x", "y", "z").forall(df.columns.contains),
      "projpipeline needs x/y/z columns")
    val (steps, globalRev) = parse(coordOp)
    val rev = reverse ^ globalRev
    val out =
      if (rev) steps.reverse.foldLeft(df)((d, s) => s.inverse(d))
      else steps.foldLeft(df)((d, s) => s.forward(d))
    outSrs.map(Srs.tag(out, _)).getOrElse(out)
  }
}
