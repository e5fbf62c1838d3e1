package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ProjPipeline, Reprojection, Srs}

/** filters.projpipeline (ProjPipelineFilter.cpp:70-77,105-122): the
  * engine compiles a documented PROJ-pipeline subset to column math. */
class ProjPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def xyz(rows: (Double, Double, Double)*): DataFrame =
    rows.zipWithIndex
      .map { case ((x, y, z), i) => (i.toLong, x, y, z) }
      .toDF("order_key", "x", "y", "z")

  private def first(df: DataFrame): (Double, Double, Double) = {
    val r = df.orderBy("order_key").select("x", "y", "z").head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("axisswap with negation: forward semantics + inverse roundtrip exact") {
    val in = xyz((1.0, 2.0, 3.0))
    val op = "+proj=pipeline +step +proj=axisswap +order=2,-1,3"
    val (x, y, z) = first(ProjPipeline(in, op))
    assert((x, y, z) == (2.0, -1.0, 3.0))
    // reverse path is the exact inverse permutation
    val back = first(ProjPipeline(ProjPipeline(in, op), op, reverse = true))
    assert(back == (1.0, 2.0, 3.0))
  }

  test("unitconvert: deg->rad + m->km factors, inverse path") {
    val in = xyz((180.0, 90.0, 2000.0))
    val out = ProjPipeline(in,
      "+proj=pipeline +step +proj=unitconvert +xy_in=deg +xy_out=rad +z_in=m +z_out=km")
    val (x, y, z) = first(out)
    assert(math.abs(x - math.Pi) < 1e-15 && math.abs(y - math.Pi / 2) < 1e-15)
    assert(z == 2.0)
    val back = first(ProjPipeline(out,
      "+proj=pipeline +step +proj=unitconvert +xy_in=deg +xy_out=rad +z_in=m +z_out=km",
      reverse = true))
    assert(math.abs(back._1 - 180.0) < 1e-12 && back._3 == 2000.0)
    // mixed-kind units fail loudly
    intercept[IllegalArgumentException] {
      ProjPipeline(in, "+proj=unitconvert +xy_in=deg +xy_out=m")
    }
  }

  test("affine: forward matches the matrix, inverse is the exact driver-side inverse") {
    val in = xyz((3.0, 4.0, 5.0), (-1.0, 0.5, 2.0))
    val op = "+proj=affine +s11=2 +s12=1 +s22=3 +s33=0.5 +xoff=10 +yoff=-5 +zoff=1"
    val out = ProjPipeline(in, op)
    val (x, y, z) = first(out)
    assert(x == 2.0 * 3.0 + 1.0 * 4.0 + 10.0)
    assert(y == 3.0 * 4.0 - 5.0)
    assert(z == 0.5 * 5.0 + 1.0)
    val back = ProjPipeline(out, op, reverse = true)
      .orderBy("order_key").select("x", "y", "z").collect()
    val exp = Seq((3.0, 4.0, 5.0), (-1.0, 0.5, 2.0))
    back.zip(exp).foreach { case (r, (ex, ey, ez)) =>
      assert(math.abs(r.getDouble(0) - ex) < 1e-12)
      assert(math.abs(r.getDouble(1) - ey) < 1e-12)
      assert(math.abs(r.getDouble(2) - ez) < 1e-12)
    }
    intercept[IllegalArgumentException] { // singular matrix has no inverse path
      ProjPipeline(out, "+proj=affine +s11=0 +s22=0", reverse = true).collect()
    }
  }

  test("utm step (radians in) == the engine's degree-based Kruger series; " +
      "reverse_transfo roundtrips") {
    val geoDeg = xyz((-122.42, 37.77, 10.0), (-121.0, 36.5, 0.0))
    val geoRad = geoDeg.withColumn("x", radians(col("x")))
      .withColumn("y", radians(col("y")))
    val op = "+proj=pipeline +step +proj=utm +zone=10"
    val viaPipeline = ProjPipeline(geoRad, op)
    val viaDirect = Reprojection.wgs84ToUtm(geoDeg, zone = 10)
    val a = viaPipeline.orderBy("order_key").select("x", "y").collect()
    val b = viaDirect.orderBy("order_key").select("x", "y").collect()
    a.zip(b).foreach { case (p, q) =>
      assert(math.abs(p.getDouble(0) - q.getDouble(0)) < 1e-6)
      assert(math.abs(p.getDouble(1) - q.getDouble(1)) < 1e-6)
    }
    val back = first(ProjPipeline(viaPipeline, op, reverse = true))
    // series roundtrip accuracy matches the documented <1cm contract
    assert(math.abs(back._1 - math.toRadians(-122.42)) < 2e-9)
    assert(math.abs(back._2 - math.toRadians(37.77)) < 2e-9)
  }

  test("webmerc step (radians) matches EPSG:3857 math; roundtrip") {
    val geoRad = xyz((math.toRadians(-73.98), math.toRadians(40.75), 0.0))
    val out = ProjPipeline(geoRad, "+proj=webmerc")
    val (x, y, _) = first(out)
    val direct = Reprojection.wgs84ToWebMercator(
      xyz((-73.98, 40.75, 0.0)))
    val d = direct.select("x", "y").head()
    assert(math.abs(x - d.getDouble(0)) < 1e-9)
    assert(math.abs(y - d.getDouble(1)) < 1e-9)
    val back = first(ProjPipeline(out, "+proj=webmerc +inv"))
    assert(math.abs(back._1 - math.toRadians(-73.98)) < 1e-12)
    assert(math.abs(back._2 - math.toRadians(40.75)) < 1e-12)
  }

  test("cart: geodetic->ECEF forward against known values, Bowring inverse roundtrip") {
    // equator/prime meridian at h=0: ECEF = (a, 0, 0)
    val eq = first(ProjPipeline(xyz((0.0, 0.0, 0.0)), "+proj=cart"))
    assert(math.abs(eq._1 - 6378137.0) < 1e-6 && math.abs(eq._2) < 1e-6 &&
      math.abs(eq._3) < 1e-6)
    val geo = xyz((math.toRadians(11.0), math.toRadians(48.0), 521.0),
      (math.toRadians(-122.0), math.toRadians(-37.0), 12.5))
    val rt = ProjPipeline(ProjPipeline(geo, "+proj=cart"), "+proj=cart",
      reverse = true).orderBy("order_key").select("x", "y", "z").collect()
    val exp = Seq((math.toRadians(11.0), math.toRadians(48.0), 521.0),
      (math.toRadians(-122.0), math.toRadians(-37.0), 12.5))
    rt.zip(exp).foreach { case (r, (lx, ly, lh)) =>
      assert(math.abs(r.getDouble(0) - lx) < 1e-11)
      assert(math.abs(r.getDouble(1) - ly) < 1e-9) // Bowring closed form
      assert(math.abs(r.getDouble(2) - lh) < 1e-3)
    }
  }

  test("helmert 7-param datum shift pipeline (unitconvert+cart+helmert+cart inv): " +
      "translation-only shifts ECEF exactly; full-param roundtrip") {
    // translation-only: ECEF coordinates shift by exactly (tx, ty, tz)
    val geo = xyz((math.toRadians(10.0), math.toRadians(50.0), 100.0))
    val ecef = first(ProjPipeline(geo, "+proj=cart"))
    val shifted = first(ProjPipeline(geo,
      "+proj=pipeline +step +proj=cart +step +proj=helmert +x=100 +y=-200 +z=300"))
    assert(shifted._1 == ecef._1 + 100.0)
    assert(shifted._2 == ecef._2 - 200.0)
    assert(shifted._3 == ecef._3 + 300.0)
    // the classic full pipeline: deg -> rad -> ECEF -> helmert -> geodetic -> deg
    val op = "+proj=pipeline " +
      "+step +proj=unitconvert +xy_in=deg +xy_out=rad " +
      "+step +proj=cart " +
      "+step +proj=helmert +x=598.1 +y=73.7 +z=418.2 +rx=0.202 +ry=0.045 +rz=-2.455 +s=6.7 " +
      "+step +proj=cart +inv " +
      "+step +proj=unitconvert +xy_in=rad +xy_out=deg"
    val in = xyz((11.0, 48.0, 500.0))
    val fwd = ProjPipeline(in, op)
    val (fx, fy, _) = first(fwd)
    assert(math.abs(fx - 11.0) > 1e-5 && math.abs(fy - 48.0) > 1e-5) // it moved
    val back = first(ProjPipeline(fwd, op, reverse = true))
    assert(math.abs(back._1 - 11.0) < 1e-8)
    assert(math.abs(back._2 - 48.0) < 1e-8)
    assert(math.abs(back._3 - 500.0) < 1e-3)
    // coordinate_frame convention flips rotation signs: same params under
    // both conventions agree iff rotations are zero
    val pv = first(ProjPipeline(geo,
      "+proj=pipeline +step +proj=cart +step +proj=helmert +rx=1 +convention=position_vector"))
    val cfr = first(ProjPipeline(geo,
      "+proj=pipeline +step +proj=cart +step +proj=helmert +rx=1 +convention=coordinate_frame"))
    assert(math.abs(pv._2 - cfr._2) > 1.0) // rotations really differ
  }

  test("step modifiers: +inv inside forward path, omit_fwd/omit_inv") {
    val in = xyz((100.0, 0.0, 0.0))
    // +inv on a unitconvert runs its inverse in the forward direction
    val out = first(ProjPipeline(in,
      "+proj=pipeline +step +proj=unitconvert +xy_in=m +xy_out=km +inv"))
    assert(out._1 == 100000.0)
    // omit_fwd skips the step forward but applies it on the reverse path
    val op = "+proj=pipeline +step +proj=affine +xoff=7 +omit_fwd"
    assert(first(ProjPipeline(in, op))._1 == 100.0)
    assert(first(ProjPipeline(in, op, reverse = true))._1 == 93.0)
    val op2 = "+proj=pipeline +step +proj=affine +xoff=7 +omit_inv"
    assert(first(ProjPipeline(in, op2))._1 == 107.0)
    assert(first(ProjPipeline(in, op2, reverse = true))._1 == 100.0)
  }

  test("unsupported step fails loudly; out_srs tags the CRS; noop passthrough") {
    val in = xyz((1.0, 2.0, 3.0))
    val e = intercept[IllegalArgumentException] {
      ProjPipeline(in, "+proj=pipeline +step +proj=tmerc +lat_0=0")
    }
    assert(e.getMessage.contains("subset"))
    val tagged = ProjPipeline(in, "+proj=noop", outSrs = Some("EPSG:9999"))
    assert(Srs.of(tagged).contains("EPSG:9999"))
    assert(first(tagged) == (1.0, 2.0, 3.0))
  }

  test("pipeline dialect: filters.projpipeline and filters.reprojection stages") {
    spark.range(1).selectExpr("0L AS order_key",
      "CAST(-122.42 AS DOUBLE) AS x", "CAST(37.77 AS DOUBLE) AS y",
      "CAST(0.0 AS DOUBLE) AS z").createOrReplaceTempView("pp_in")
    val out = graft.pipeline.PipelineBuilder.run(spark, """{"pipeline":[
      {"type":"readers.view","view":"pp_in"},
      {"type":"filters.projpipeline",
       "coord_op":"+proj=pipeline +step +proj=unitconvert +xy_in=deg +xy_out=rad +step +proj=utm +zone=10",
       "out_srs":"EPSG:32610"}
    ]}""")
    val direct = Reprojection.wgs84ToUtm(
      xyz((-122.42, 37.77, 0.0)), zone = 10).select("x", "y").head()
    val r = out.select("x", "y").head()
    assert(math.abs(r.getDouble(0) - direct.getDouble(0)) < 1e-6)
    assert(math.abs(r.getDouble(1) - direct.getDouble(1)) < 1e-6)
    assert(Srs.of(out).contains("EPSG:32610"))
    // filters.reprojection picks in_srs from the CRS tag when absent
    val repro = graft.pipeline.PipelineBuilder.run(spark, """{"pipeline":[
      {"type":"readers.view","view":"pp_in","override_srs":"EPSG:4326"},
      {"type":"filters.reprojection","out_srs":"EPSG:3857"}
    ]}""")
    val wm = Reprojection.wgs84ToWebMercator(xyz((-122.42, 37.77, 0.0)))
      .select("x", "y").head()
    val rr = repro.select("x", "y").head()
    assert(rr.getDouble(0) == wm.getDouble(0) && rr.getDouble(1) == wm.getDouble(1))
    assert(Srs.of(repro).contains("EPSG:3857"))
  }

  test("boolean modifiers: valued forms honored (pj_param 'b'), not dropped") {
    val geo = xyz((0.3, -0.6, 10.0)) // radians, southern hemisphere
    // +south=1 must equal bare +south — dropping it silently would shift
    // every northing by 10,000 km
    val bare = first(ProjPipeline(geo, "+proj=utm +zone=33 +south"))
    val valued = first(ProjPipeline(geo, "+proj=utm +zone=33 +south=1"))
    assert(bare == valued)
    val northed = first(ProjPipeline(geo, "+proj=utm +zone=33 +south=false"))
    assert(math.abs(bare._2 - (northed._2 + 1e7)) < 1e-6)
    // +inv=true on a step == +inv
    val aff = "+proj=pipeline +step +proj=affine +s11=2"
    val invBare = first(ProjPipeline(geo, aff.replace("+s11=2", "+s11=2 +inv")))
    val invValued = first(ProjPipeline(geo, aff.replace("+s11=2", "+s11=2 +inv=true")))
    assert(invBare == invValued && invBare._1 == 0.15)
    // non-boolean value for a boolean key fails loudly
    val e = intercept[IllegalArgumentException] {
      ProjPipeline(geo, "+proj=utm +zone=33 +south=banana")
    }
    assert(e.getMessage.contains("south"))
  }

  test("unknown step parameters fail loudly (no silent drops)") {
    val in = xyz((1.0, 2.0, 3.0))
    // misspelled helmert translation (+dx instead of +x) must not be ignored
    val e1 = intercept[IllegalArgumentException] {
      ProjPipeline(in, "+proj=helmert +dx=100")
    }
    assert(e1.getMessage.contains("+dx") && e1.getMessage.contains("helmert"))
    // non-WGS84 ellipsoid is out of the engine's scope — loud, not wrong
    val e2 = intercept[IllegalArgumentException] {
      ProjPipeline(in, "+proj=cart +ellps=GRS80")
    }
    assert(e2.getMessage.contains("GRS80"))
    // +ellps=WGS84 (the engine's ellipsoid) is accepted
    val ok = first(ProjPipeline(in, "+proj=noop +inv"))
    assert(ok == (1.0, 2.0, 3.0))
    assert(first(ProjPipeline(xyz((0.3, -0.6, 10.0)),
      "+proj=utm +zone=33 +ellps=WGS84")) ==
      first(ProjPipeline(xyz((0.3, -0.6, 10.0)), "+proj=utm +zone=33")))
  }

  test("missing required stage option names the stage (pipeline dialect)") {
    spark.range(1).selectExpr("0L AS order_key",
      "CAST(1.0 AS DOUBLE) AS x", "CAST(2.0 AS DOUBLE) AS y",
      "CAST(0.0 AS DOUBLE) AS z").createOrReplaceTempView("pp_req")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineBuilder.run(spark, """{"pipeline":[
        {"type":"readers.view","view":"pp_req"},
        {"type":"filters.projpipeline","out_srs":"EPSG:32610"}
      ]}""")
    }
    assert(e.getMessage.contains("filters.projpipeline") &&
      e.getMessage.contains("out_srs"))
  }
}
