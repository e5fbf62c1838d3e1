package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PDAL's embedded expression language → Catalyst `Column` compiler.
  *
  * Token set per filters/private/expr/Token.hpp:11-38
  * (`+ - / * ( ) ! || && > < == != <= >= =`, numbers, identifiers);
  * precedence per ConditionalParser.cpp / MathParser.cpp: || < && < ! <
  * comparison < +- < * / < unary. Unlike the reference (interpreted per
  * point, Expression.hpp:67-70), the output is a Catalyst tree — codegen'd
  * and eligible for scan pushdown for free.
  *
  * Used by filters.expression (ExpressionFilter.cpp:105), per-stage
  * `where` (Stage.hpp:86-91) and filters.assign conditions.
  */
object ExprLang {

  sealed private trait Tok
  private case class TNum(v: Double) extends Tok
  private case class TId(s: String) extends Tok
  private case class TOp(s: String) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val st = i
        while (i < s.length && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
        out += TNum(s.substring(st, i).toDouble)
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += TId(s.substring(st, i))
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (Set("||", "&&", ">=", "<=", "==", "!=").contains(two)) { out += TOp(two); i += 2 }
        else if ("+-*/()!><=".contains(c)) { out += TOp(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"bad char '$c' in expression: $s")
      }
    }
    out.toList
  }

  def compile(s: String): Column = {
    var toks = tokenize(s)
    def peek: Option[Tok] = toks.headOption
    def eat(): Tok = { val t = toks.head; toks = toks.tail; t }
    def expectOp(o: String): Unit = eat() match {
      case TOp(`o`) =>
      case t => throw new IllegalArgumentException(s"expected '$o', got $t in: $s")
    }

    def orExpr(): Column = {
      var l = andExpr()
      while (peek.contains(TOp("||"))) { eat(); l = l || andExpr() }
      l
    }
    def andExpr(): Column = {
      var l = notExpr()
      while (peek.contains(TOp("&&"))) { eat(); l = l && notExpr() }
      l
    }
    def notExpr(): Column = peek match {
      case Some(TOp("!")) => eat(); !notExpr()
      case _ => cmpExpr()
    }
    def cmpExpr(): Column = {
      var l = addExpr()
      var done = false
      while (!done) peek match {
        case Some(TOp(op @ (">" | "<" | ">=" | "<=" | "==" | "!=" | "="))) =>
          eat()
          val r = addExpr()
          l = op match {
            case ">" => l > r
            case "<" => l < r
            case ">=" => l >= r
            case "<=" => l <= r
            case "==" | "=" => l === r
            case "!=" => l =!= r
          }
        case _ => done = true
      }
      l
    }
    def addExpr(): Column = {
      var l = mulExpr()
      var done = false
      while (!done) peek match {
        case Some(TOp("+")) => eat(); l = l + mulExpr()
        case Some(TOp("-")) => eat(); l = l - mulExpr()
        case _ => done = true
      }
      l
    }
    def mulExpr(): Column = {
      var l = unary()
      var done = false
      while (!done) peek match {
        case Some(TOp("*")) => eat(); l = l * unary()
        case Some(TOp("/")) => eat(); l = l / unary()
        case _ => done = true
      }
      l
    }
    def unary(): Column = peek match {
      case Some(TOp("-")) => eat(); negate(unary())
      case _ => primary()
    }
    def primary(): Column = eat() match {
      case TNum(v) => lit(v)
      case TId(n) => col(n).cast("double")
      case TOp("(") => val e = orExpr(); expectOp(")"); e
      case t => throw new IllegalArgumentException(s"unexpected $t in: $s")
    }

    val res = orExpr()
    if (toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens $toks in: $s")
    res
  }
}

/** filters.expression analog (filters/ExpressionFilter.cpp:54). */
object ExpressionFilter {
  def apply(df: org.apache.spark.sql.DataFrame, expression: String): org.apache.spark.sql.DataFrame =
    df.filter(ExprLang.compile(expression))
}

/** Per-stage `where`/`where_merge` (pdal/Stage.cpp:61-76 splitView):
  * the stage applies only to rows passing `where`; skipped rows bypass it
  * and are merged back (`where_merge=true`/auto) or dropped (false).
  *
  * Merge order matches the reference (StageRunner.cpp:63-80): the
  * skipped view is APPENDED after the stage output, so the merged frame
  * is re-keyed keeps-then-skips. Without the re-key, stages that
  * renumber order_key (sort/randomize/mortonorder) would collide with
  * the bypass rows' original keys. */
object Where {
  def apply(df: org.apache.spark.sql.DataFrame, where: String,
      stage: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      merge: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cond = ExprLang.compile(where)
    val kept = stage(df.filter(cond))
    if (!merge) kept
    else {
      val skips = df.filter(!cond || cond.isNull)
      if (!kept.columns.contains("order_key"))
        kept.unionByName(skips, allowMissingColumns = true)
      else {
        val tagged = kept.withColumn("__wpart", lit(0))
          .unionByName(skips.withColumn("__wpart", lit(1)),
            allowMissingColumns = true)
        graft.operators.Order.globalRankBy(tagged,
            Seq(col("__wpart").asc, col("order_key").asc), "__wkey")
          .drop("order_key", "__wpart")
          .withColumnRenamed("__wkey", "order_key")
      }
    }
  }
}
