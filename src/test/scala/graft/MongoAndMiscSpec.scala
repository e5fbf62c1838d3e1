package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Fixtures
import graft.expr.MongoFilter
import graft.operators.{RelaxationDartThrowing, Reprojection, Sample}

class MongoAndMiscSpec extends AnyFunSuite {
  import TestSpark._
  lazy val docs = Fixtures.autzen1065(spark).cache()

  test("mongo predicate: implicit eq, ops, $in, logical, $mod (MongoExpressionFilter)") {
    val eq = MongoFilter(docs, """{"classification": 1}""")
    assert(eq.count() == docs.filter(col("classification") === 1).count())
    val range = MongoFilter(docs, """{"intensity": {"$gte": 100, "$lt": 200}}""")
    assert(range.count() ==
      docs.filter(col("intensity") >= 100 && col("intensity") < 200).count())
    val in = MongoFilter(docs, """{"classification": {"$in": [1, 2]}}""")
    assert(in.count() == docs.filter(col("classification").isin(1, 2)).count())
    val logical = MongoFilter(docs,
      """{"$or": [{"intensity": {"$gt": 200}}, {"classification": {"$ne": 1}}]}""")
    assert(logical.count() ==
      docs.filter(col("intensity") > 200 || col("classification") =!= 1).count())
    val mod = MongoFilter(docs, """{"intensity": {"$mod": [2, 0]}}""")
    assert(mod.count() == docs.filter(pmod(col("intensity"), lit(2)) === 0).count())
    val nor = MongoFilter(docs, """{"$nor": [{"classification": 1}]}""")
    assert(nor.count() == docs.filter(col("classification") =!= 1).count())
  }

  test("relaxation dart throwing reaches target count by shrinking radius") {
    val small = docs.limit(300).cache()
    val base = Sample(small, 400.0).count()
    val out = RelaxationDartThrowing(small, targetCount = base + 5,
      startRadius = 400.0, decay = 0.7)
    assert(out.count() >= base + 5)
  }

  test("UTM forward/inverse roundtrip < 1cm") {
    import spark.implicits._
    val lonlat = Seq((-123.1, 44.05, 0.0, 0L), (-122.5, 43.2, 0.0, 1L))
      .toDF("x", "y", "z", "order_key")
    val rt = Reprojection.utmToWgs84(
      Reprojection.wgs84ToUtm(lonlat, zone = 10), zone = 10)
    rt.orderBy("order_key").collect().zip(lonlat.orderBy("order_key").collect())
      .foreach { case (b, o) =>
        assert(math.abs(b.getDouble(0) - o.getDouble(0)) < 1e-7)
        assert(math.abs(b.getDouble(1) - o.getDouble(1)) < 1e-7)
      }
  }
}
