package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** filters.mongo analog (filters/MongoExpressionFilter.cpp:46; operators
  * in filters/private/mongoexpression/Comparison.cpp:47, Expression.cpp:91):
  * MongoDB-style JSON predicate -> Catalyst Column.
  *
  * Supported, matching the reference set: implicit $eq ({dim: value}),
  * $eq $gt $gte $lt $lte $ne $in $nin $mod, logical $and $or $nor $not;
  * multiple fields in one object AND together (Mongo semantics).
  */
object MongoExpr {

  def compile(json: String): Column =
    compileObject(JsonMethods.parse(json).asInstanceOf[JObject])

  private def lit0(v: JValue): Column = v match {
    case JInt(i) => lit(i.toLong)
    case JLong(l) => lit(l)
    case JDouble(d) => lit(d)
    case JDecimal(d) => lit(d.toDouble)
    case JString(s) => lit(s)
    case JBool(b) => lit(b)
    case other => throw new IllegalArgumentException(s"bad literal: $other")
  }

  private def compileObject(obj: JObject): Column =
    obj.obj.map {
      // empty conjunction/disjunction identities: {} and {"$and": []}
      // match everything, {"$or": []} nothing (Mongo match-all semantics
      // for the empty document)
      case ("$and", JArray(xs)) =>
        xs.map(x => compileObject(x.asInstanceOf[JObject]))
          .reduceOption(_ && _).getOrElse(lit(true))
      case ("$or", JArray(xs)) =>
        xs.map(x => compileObject(x.asInstanceOf[JObject]))
          .reduceOption(_ || _).getOrElse(lit(false))
      case ("$nor", JArray(xs)) =>
        !xs.map(x => compileObject(x.asInstanceOf[JObject]))
          .reduceOption(_ || _).getOrElse(lit(false))
      case ("$not", x: JObject) => !compileObject(x)
      case (dim, JObject(ops)) if ops.nonEmpty && ops.head._1.startsWith("$") =>
        ops.map { case (op, v) => fieldOp(dim, op, v) }.reduce(_ && _)
      case (dim, value) => col(dim) === lit0(value) // implicit $eq
    }.reduceOption(_ && _).getOrElse(lit(true))

  private def fieldOp(dim: String, op: String, v: JValue): Column = op match {
    case "$eq" => col(dim) === lit0(v)
    case "$ne" => col(dim) =!= lit0(v)
    case "$gt" => col(dim) > lit0(v)
    case "$gte" => col(dim) >= lit0(v)
    case "$lt" => col(dim) < lit0(v)
    case "$lte" => col(dim) <= lit0(v)
    case "$in" => col(dim).isInCollection(
      v.asInstanceOf[JArray].arr.map(jvRaw))
    case "$nin" => !col(dim).isInCollection(
      v.asInstanceOf[JArray].arr.map(jvRaw))
    case "$mod" =>
      val Seq(d, r) = v.asInstanceOf[JArray].arr.map(jvRaw).map(_.toString.toDouble)
      // Mongo/C++ truncated modulo (sign of the dividend) — pmod's
      // always-non-negative result matches the wrong remainders for
      // negative field values
      (col(dim).cast("double") % lit(d)) === lit(r)
    case "$not" => !fieldOps(dim, v.asInstanceOf[JObject])
    case other => throw new IllegalArgumentException(s"unsupported op $other")
  }

  private def fieldOps(dim: String, obj: JObject): Column =
    obj.obj.map { case (op, v) => fieldOp(dim, op, v) }.reduce(_ && _)

  private def jvRaw(v: JValue): Any = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDouble(d) => d
    case JString(s) => s
    case JBool(b) => b
    case other => throw new IllegalArgumentException(s"bad value $other")
  }
}

/** filters.mongo stage. */
object MongoFilter {
  def apply(df: org.apache.spark.sql.DataFrame, json: String): org.apache.spark.sql.DataFrame =
    df.filter(MongoExpr.compile(json))
}
