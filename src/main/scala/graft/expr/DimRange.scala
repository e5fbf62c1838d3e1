package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PDAL range grammar `Dim![lb:ub)` → Catalyst predicate.
  *
  * Grammar per filters/private/DimRange.cpp:43-121 (subParse): brackets
  * inclusive, parens exclusive, `!` negates, missing bound = ±infinity.
  * List semantics per DimRange.cpp:143 (pointPasses): OR within the same
  * dimension, AND across dimensions (list sorted by dimension).
  * Value semantics per :125 (valuePasses): NaN folds into `fail` BEFORE
  * negation (so a negated range keeps NaN rows, exactly as the
  * reference's `if (m_negate) fail = !fail` does).
  */
final case class DimRange(
    name: String,
    lower: Double,
    upper: Double,
    inclusiveLower: Boolean,
    inclusiveUpper: Boolean,
    negate: Boolean) {

  def toColumn: Column = {
    val v = col(name).cast("double")
    var fail: Column = isnan(v)
    if (lower != Double.MinValue)
      fail = fail || (if (inclusiveLower) v < lower else v <= lower)
    if (upper != Double.MaxValue)
      fail = fail || (if (inclusiveUpper) v > upper else v >= upper)
    if (negate) fail else !fail
  }
}

object DimRange {
  /** Parse one range spec, e.g. `Classification[2:2]`, `Z!(,5)`,
    * `Red!(200:)`. */
  def parse(r0: String): DimRange = {
    val r = r0.trim
    var pos = 0
    def err(m: String) = throw new IllegalArgumentException(s"range '$r0': $m")
    // dimension name: [A-Za-z_][A-Za-z0-9_]*
    val nameEnd = {
      var i = pos
      while (i < r.length && (r(i).isLetterOrDigit || r(i) == '_')) i += 1
      i
    }
    if (nameEnd == pos) err("no dimension name")
    val name = r.substring(pos, nameEnd); pos = nameEnd
    var negate = false
    if (pos < r.length && r(pos) == '!') { negate = true; pos += 1 }
    if (pos >= r.length) err("missing '(' or '['")
    val ilb = r(pos) match {
      case '[' => true
      case '(' => false
      case _ => err("missing '(' or '['")
    }
    pos += 1
    def parseNum(): Option[Double] = {
      while (pos < r.length && r(pos).isWhitespace) pos += 1
      val start = pos
      if (pos < r.length && (r(pos) == '-' || r(pos) == '+')) pos += 1
      while (pos < r.length && (r(pos).isDigit || r(pos) == '.' || r(pos) == 'e' ||
        r(pos) == 'E' || ((r(pos) == '-' || r(pos) == '+') && pos > start &&
          (r(pos - 1) == 'e' || r(pos - 1) == 'E')))) pos += 1
      if (pos == start || (pos == start + 1 && !r(start).isDigit)) { pos = start; None }
      else Some(r.substring(start, pos).toDouble)
    }
    val lb = parseNum().getOrElse(Double.MinValue)
    while (pos < r.length && r(pos).isWhitespace) pos += 1
    if (pos >= r.length || r(pos) != ':') err("missing ':' separator")
    pos += 1
    val ub = parseNum().getOrElse(Double.MaxValue)
    while (pos < r.length && r(pos).isWhitespace) pos += 1
    if (pos >= r.length) err("missing ')' or ']'")
    val iub = r(pos) match {
      case ']' => true
      case ')' => false
      case _ => err("missing ')' or ']'")
    }
    pos += 1
    while (pos < r.length && r(pos).isWhitespace) pos += 1
    if (pos != r.length) // reference: DimRange.cpp:169 throws here too —
      err("invalid characters following valid range") // silent drop loses constraints
    DimRange(name, lb, ub, ilb, iub, negate)
  }

  /** Parse a comma-separated list of ranges. */
  def parseList(s: String): Seq[DimRange] = {
    // split on commas that are not inside brackets — the grammar has no
    // commas inside a single range, so a plain split is safe
    s.split(',').map(_.trim).filter(_.nonEmpty).map(parse).toSeq
  }

  /** OR within same dimension, AND across (DimRange.cpp:143 pointPasses;
    * list order-normalized by dimension name as RangeFilter::prepared does). */
  def predicate(ranges: Seq[DimRange]): Column =
    ranges.groupBy(_.name).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.map(_.toColumn).reduce(_ || _)
    }.reduce(_ && _)
}

/** filters.range analog (filters/RangeFilter.cpp:53). */
object RangeFilter {
  def apply(df: org.apache.spark.sql.DataFrame, limits: String): org.apache.spark.sql.DataFrame =
    df.filter(DimRange.predicate(DimRange.parseList(limits)))
}
