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

  test("mongo edge semantics: {} matches all, empty \\$and/\\$or, \\$mod " +
      "keeps the dividend's sign for negatives") {
    import spark.implicits._
    val df = Seq((-7L, 1), (7L, 2), (2L, 3)).toDF("d", "id")
    assert(MongoFilter(df, "{}").count() == 3)
    assert(MongoFilter(df, """{"$and": []}""").count() == 3)
    assert(MongoFilter(df, """{"$or": []}""").count() == 0)
    // -7 % 3 = -1 (truncated, Mongo/C++), NOT pmod's +2
    val neg = MongoFilter(df, """{"d": {"$mod": [3, -1]}}""")
      .select("id").collect().map(_.getInt(0)).toSet
    assert(neg == Set(1))
    val pos = MongoFilter(df, """{"d": {"$mod": [3, 2]}}""")
      .select("id").collect().map(_.getInt(0)).toSet
    assert(pos == Set(3)) // -7 must NOT spuriously match remainder 2
  }

  test("range parse rejects trailing garbage (DimRange.cpp:169)") {
    intercept[IllegalArgumentException] {
      graft.expr.DimRange.parse("Z[1:2]Y[3:4]")
    }
    // negated range keeps NaN rows (reference flips the NaN fail too)
    import spark.implicits._
    val df = Seq(Double.NaN, 5.0, 50.0).map(Tuple1(_)).toDF("Z")
    val kept = graft.expr.RangeFilter(df, "Z!(0:10)").collect().map(_.getDouble(0))
    assert(kept.count(_.isNaN) == 1 && kept.count(_ == 50.0) == 1 &&
      kept.length == 2)
  }

  test("where merge re-keys keeps-then-skips (StageRunner.cpp append): " +
      "order-rekeying stage under where has no order_key collisions") {
    val out = graft.pipeline.PipelineBuilder.run(spark,
      """{"pipeline":[
         {"type":"readers.faux","mode":"ramp","count":100,
          "bounds":"([0,100],[0,100],[0,100])"},
         {"type":"filters.sort","dimension":"z","order":"DESC",
          "where":"z <= 50"}
        ]}""")
    assert(out.count() == 100)
    assert(out.select("order_key").distinct().count() == 100) // no collisions
    // stage output (sorted subset) occupies the first keys, skips follow
    val maxSortedKey = out.filter(col("z") <= 50)
      .agg(max("order_key")).head().getLong(0)
    val minSkipKey = out.filter(col("z") > 50)
      .agg(min("order_key")).head().getLong(0)
    assert(maxSortedKey < minSkipKey)
  }

  test("morton reverse is the bit-reversed code (MortonOrderFilter.cpp:103)") {
    // scatter property: reversing the code ordering separates the two
    // spatially-adjacent cells across the order instead of keeping them
    // adjacent (a descending sort would keep them adjacent)
    import graft.functions.CellMath
    val a = CellMath.interleave(5, 5)
    val b = CellMath.interleave(5, 6)
    val c = CellMath.interleave(1000, 1000)
    def rev(x: Long) = java.lang.Long.reverse(x)
    // adjacent cells a,b differ in low interleaved bits -> their reversed
    // codes differ in HIGH bits, landing far apart; sanity: ordering by
    // rev() is not the forward or backward Z-order
    val fwd = Seq(a, b, c).sorted
    val byRev = Seq(a, b, c).sortBy(rev)
    assert(byRev != fwd && byRev != fwd.reverse)
  }
}
