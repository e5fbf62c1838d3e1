package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** SparkSessionExtensions registration: exposes the engine's codegen'd
  * expressions to SQL. Enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * SQL surface:
  *   grid_cell_id(x, y, ox, oy, len)         -> packed (cx, cy) long
  *   morton_cell_id(x, y, ox, oy, len)       -> Z-order long
  *   hier_cell_id(x, y, ox, oy, len0, level) -> H3/S2-style hierarchical id
  *   hex_cell_id(x, y, edge)                 -> axial hex id
  *   mix64(v)                                -> splitmix64
  *   simhash64(text)                         -> 64-bit SimHash fingerprint
  *   minhash_sig(text, numHashes, shingle)   -> minhash signature array
  *   st_contains_wkt('POLYGON(...)', x, y)   -> GridPnp containment
  *   st_distance_wkt('POLYGON(...)', x, y)   -> distance (0 inside)
  */
object GraftExtensions {
  /** Register the same functions on an already-built session (tests,
    * notebooks). */
  def registerTemp(spark: org.apache.spark.sql.SparkSession): Unit = {
    val ext = new GraftExtensions
    ext.builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def d(e: Expression): Double = e match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v, _) => v.toString.toDouble
    case other => throw new IllegalArgumentException(
      s"expected literal number, got $other")
  }
  private def str(e: Expression): String = e match {
    case Literal(s, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"expected literal string, got $other")
  }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "grid_cell_id" -> (es =>
      CellIdExpr(es(0), es(1), d(es(2)), d(es(3)), d(es(4)), morton = false)),
    "morton_cell_id" -> (es =>
      CellIdExpr(es(0), es(1), d(es(2)), d(es(3)), d(es(4)), morton = true)),
    "hier_cell_id" -> (es =>
      HierCellIdExpr(es(0), es(1), d(es(2)), d(es(3)), d(es(4)), d(es(5)).toInt)),
    "hex_cell_id" -> (es => HexIdExpr(es(0), es(1), d(es(2)))),
    "mix64" -> (es => Mix64Expr(es.head)),
    "simhash64" -> (es => SimHash64Expr(es.head)),
    "minhash_sig" -> (es =>
      MinHashSigExpr(es(0), d(es(1)).toInt, d(es(2)).toInt)),
    "st_contains_wkt" -> (es =>
      GridPnpContains(es(1), es(2), new PnpGrid(Wkt.parse(str(es(0)))))),
    "st_distance_wkt" -> (es =>
      GeomDistExpr(es(1), es(2), new PnpGrid(Wkt.parse(str(es(0)))))))

  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), b))
    }
  }
}
