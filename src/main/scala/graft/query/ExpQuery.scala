package graft.query

import graft.operators.SeriesFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * `/api/query/exp` infix expression queries (reference:
 * src/query/pojo/Expression.java:38-55 model,
 * src/query/expression/ExpressionIterator.java evaluation,
 * src/tsd/QueryExecutor.java:224 executor). Variables name metric
 * sub-query results; the infix script (`a + b / 2`) is evaluated as
 * Catalyst Column arithmetic after the variables are aligned on a
 * UNION or INTERSECTION time join (SURVEY §2.3).
 *
 * Precedence-climbing parser for `+ - * / %`, comparisons, unary
 * minus, parens, numeric literals, identifiers. No JEXL: the AST maps
 * 1:1 onto Column operators, so the whole expression stays inside
 * codegen. JEXL quirks the reference's tests pin are reproduced:
 * division by zero yields 0 (TestExpressionIterator
 * .aDivideByZeroWithTwoSeries:284 — "Jexl apparently happily allows
 * this, just emits a zero"), `a < b` evaluates to 1/0 (Booleans
 * render as 1/0, ExpressionIterator.java:351-353), and `a > b` is
 * REJECTED as having no variables — JEXL 2's variable collector
 * returns nothing for the greater-than node, so the reference ctor
 * throws "didn't appear to have any variables"
 * (TestExpressionIterator.aGreaterThanb:1086 expects
 * IllegalArgumentException where aLessThanb:1123 iterates).
 */
object ExpQuery {

  sealed trait Ast
  case class Num(v: Double) extends Ast
  case class Var(name: String) extends Ast
  case class Bin(op: Char, l: Ast, r: Ast) extends Ast
  case class Neg(e: Ast) extends Ast

  def parse(s: String): Ast = new Parser(s).parseExpr(0)

  private class Parser(s: String) {
    var pos = 0
    private def peek: Char = if (pos < s.length) s(pos) else '\u0000'
    private def skipWs(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1
    private def prec(c: Char): Int = c match {
      case '<' | '>' => 0
      case '+' | '-' => 1
      case '*' | '/' | '%' => 2
      case _ => -1
    }
    def parseExpr(minPrec: Int): Ast = {
      var lhs = parseAtom()
      skipWs()
      while (prec(peek) >= minPrec) {
        val op = peek; pos += 1
        val rhs = parseExpr(prec(op) + 1)
        lhs = Bin(op, lhs, rhs)
        skipWs()
      }
      lhs
    }
    private def parseAtom(): Ast = {
      skipWs()
      peek match {
        case '(' =>
          pos += 1
          val e = parseExpr(0)
          skipWs(); require(peek == ')', s"expected ) at $pos in $s"); pos += 1
          e
        case '-' => pos += 1; Neg(parseAtom())
        case c if c.isDigit =>
          val start = pos
          while (pos < s.length && (s(pos).isDigit || s(pos) == '.')) pos += 1
          Num(s.substring(start, pos).toDouble)
        case c if c.isLetter || c == '_' =>
          val start = pos
          while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
          Var(s.substring(start, pos))
        case other => throw new IllegalArgumentException(s"unexpected '$other' at $pos in $s")
      }
    }
  }

  /** Free variables of an expression, in first-appearance order.
    * A greater-than subtree contributes NONE — reproducing JEXL 2's
    * broken variable collector for `>`, which is what makes the
    * reference reject `a > b` with "didn't appear to have any
    * variables" while `a < b` runs. */
  def variables(a: Ast): Seq[String] = a match {
    case Num(_) => Seq.empty
    case Var(n) => Seq(n)
    case Neg(e) => variables(e)
    case Bin('>', _, _) => Seq.empty
    case Bin(_, l, r) => (variables(l) ++ variables(r)).distinct
  }

  private def toColumn(a: Ast, bind: String => Column): Column = a match {
    case Num(v) => lit(v)
    case Var(n) => bind(n)
    case Neg(e) => -toColumn(e, bind)
    case Bin('+', l, r) => toColumn(l, bind) + toColumn(r, bind)
    case Bin('-', l, r) => toColumn(l, bind) - toColumn(r, bind)
    case Bin('*', l, r) => toColumn(l, bind) * toColumn(r, bind)
    case Bin('/', l, r) =>
      // JEXL zero-divisor quirk: x / 0 emits 0, never Inf/NaN
      val (lc, rc) = (toColumn(l, bind), toColumn(r, bind))
      when(rc === 0.0, lit(0.0)).otherwise(lc / rc)
    case Bin('%', l, r) => toColumn(l, bind) % toColumn(r, bind)
    case Bin(op @ ('<' | '>'), l, r) =>
      // Booleans render 1/0 (ExpressionIterator.java:351-353); NaN
      // comparisons are Java-false on both sides (Spark alone would
      // order NaN greatest)
      val (lc, rc) = (toColumn(l, bind), toColumn(r, bind))
      when(isnan(lc) || isnan(rc), lit(0.0))
        .otherwise(when(if (op == '<') lc < rc else lc > rc, lit(1.0))
          .otherwise(lit(0.0)))
    case Bin(op, _, _) => throw new IllegalArgumentException(s"op $op")
  }

  /** The parsed expression as one Catalyst Column with `bind`
    * resolving each variable — the arithmetic runs wholly inside
    * codegen over whatever join laid the variables out. */
  def bindColumns(expr: String, bind: String => Column): Column =
    toColumn(parse(expr), bind)

  /**
   * Evaluate an infix expression over named sub-query results. The
   * variable DataFrames (columns: joinKeys..., ts, value) are aligned
   * with a UNION (full outer + fill) or INTERSECTION (inner) join,
   * then the arithmetic runs row-wise.
   */
  def eval(expr: String, vars: Map[String, DataFrame],
           joinKeys: Seq[String] = Seq.empty,
           intersect: Boolean = true, fill: Double = 0.0): DataFrame =
    evalWithFills(expr, vars, joinKeys, intersect, Map.empty, fill)

  /** As eval, but with per-variable fill values (the reference's
    * NumericFillPolicy is declared per expression variable,
    * src/query/expression/NumericFillPolicy.java; NaN/zero/scalar are
    * all just doubles here). Variables absent from `fills` use
    * `defaultFill`. */
  def evalWithFills(expr: String, vars: Map[String, DataFrame],
                    joinKeys: Seq[String] = Seq.empty,
                    intersect: Boolean = true,
                    fills: Map[String, Double] = Map.empty,
                    defaultFill: Double = 0.0): DataFrame = {
    val ast = parse(expr)
    val names = variables(ast)
    require(names.nonEmpty, "expression references no variables")
    val keys = joinKeys :+ "ts"
    val prepared = names.map(n =>
      vars(n).select(keys.map(col) :+ col("value").as(s"__$n"): _*))
    val how = if (intersect) "inner" else "full_outer"
    val joined = prepared.reduce((a, b) => a.join(b, keys, how))
    val bound = (n: String) =>
      if (intersect) col(s"__$n")
      else coalesce(col(s"__$n"), lit(fills.getOrElse(n, defaultFill)))
    joined.withColumn("value", toColumn(ast, bound))
      .select(keys.map(col) :+ col("value"): _*)
  }
}
