package graft.query

import graft.model.TimeUtils
import graft.operators.SeriesFunctions
import org.apache.spark.sql.DataFrame

/**
 * Graphite-style expression (`gexp`) endpoint: nested function grammar
 * `f(g(m),,param)` with `,,` as the argument delimiter (reference:
 * src/query/expression/Expressions.java:43-163 parser,
 * src/parser.jj:48-58 grammar,
 * src/query/expression/ExpressionFactory.java:32-59 registry).
 *
 * Each AST node evaluates to a DataFrame transform over sub-query
 * results, so a nested expression becomes one composed Catalyst plan.
 */
object Gexp {

  /** Plugin point: custom expression functions by name (the
    * reference's ExpressionFactory.addFunction,
    * src/query/expression/ExpressionFactory.java:71-79). A function
    * receives the evaluated child DataFrames and the scalar params. */
  private val custom = scala.collection.concurrent.TrieMap
    .empty[String, (Seq[DataFrame], Seq[String]) => DataFrame]

  /** Register a custom gexp function. */
  def register(name: String,
               fn: (Seq[DataFrame], Seq[String]) => DataFrame): Unit =
    custom.put(name, fn)

  sealed trait Node
  /** A leaf `agg:metric{...}` sub-query spec. */
  case class MetricNode(spec: String) extends Node
  case class FuncNode(name: String, args: Seq[Node], params: Seq[String]) extends Node

  /** Parse a gexp string into an AST. */
  def parse(s: String): Node = {
    // reference Expressions.parse:46-51 error contract: the
    // null/empty message fires ONLY for null or "" (no trim there);
    // whitespace-only input falls through to the Invalid Expression
    // path (it has no parens, so the reference's paren check throws)
    require(s != null && s.nonEmpty, "Expression may not be null or empty")
    if (s.trim.isEmpty)
      throw new IllegalArgumentException("Invalid Expression: " + s)
    val t = s.trim
    val open = t.indexOf('(')
    if (open < 0 || !t.take(open).forall(c => c.isLetterOrDigit || c == '_'))
      return MetricNode(t)
    val name = t.take(open)
    require(t.endsWith(")"), s"unbalanced parens in $t")
    val inner = t.substring(open + 1, t.length - 1)
    // split on `,,` at depth 0
    val args = scala.collection.mutable.Buffer[String]()
    var depth = 0; var start = 0; var i = 0
    while (i < inner.length) {
      inner(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 && i + 1 < inner.length && inner(i + 1) == ',' =>
          args += inner.substring(start, i); start = i + 2; i += 1
        case _ =>
      }
      i += 1
    }
    args += inner.substring(start)
    val parsed = args.map(_.trim)
    // leading args that parse as expressions are child nodes; trailing
    // scalar params (numbers, names, durations) stay strings
    val (exprs, params) = parsed.partition(a =>
      a.contains(':') || a.contains('(') || a.contains('{'))
    FuncNode(name, exprs.map(parse).toSeq, params.toSeq)
  }

  /**
   * Evaluate an AST. `runMetric` resolves a leaf sub-query spec to its
   * result DataFrame (columns: metric, series key columns, ts, value).
   */
  def eval(node: Node, runMetric: String => DataFrame,
           joinKeys: Seq[String] = Seq.empty): DataFrame = node match {
    case MetricNode(spec) => runMetric(spec)
    case FuncNode(name, args, params) =>
      def a0 = eval(args.head, runMetric, joinKeys)
      def all = args.map(eval(_, runMetric, joinKeys))
      def combArgs(dfs: Seq[DataFrame]): Seq[DataFrame] = {
        if (dfs.size < 2 || dfs.size > 26)
          throw new IllegalArgumentException(
            s"Must have 2 to 26 series, got ${dfs.size} instead")
        dfs
      }
      name match {
        case "absolute" => SeriesFunctions.absolute(a0)
        case "scale" => SeriesFunctions.scale(a0, params.head.toDouble)
        // the alias template may itself contain commas — the reference
        // re-joins every param (Alias.java:49 COMMA_JOINER)
        case "alias" => SeriesFunctions.alias(a0, params.mkString(","))
        case "movingAverage" =>
          val p = params.head
          if (p.forall(_.isDigit)) SeriesFunctions.movingAverageByCount(a0, p.toInt)
          else SeriesFunctions.movingAverageByTime(a0,
            TimeUtils.parseDuration(p.stripPrefix("'").stripSuffix("'")))
        case "highestCurrent" => SeriesFunctions.highestCurrent(a0, params.head.toInt)
        case "highestMax" => SeriesFunctions.highestMax(a0, params.head.toInt)
        case "shift" | "timeShift" => SeriesFunctions.timeShift(a0,
          TimeUtils.parseDuration(params.head.stripPrefix("'").stripSuffix("'")))
        case "firstDiff" => SeriesFunctions.firstDiff(a0)
        // the four combiners take 2..26 result sets (one letter per
        // variable in the generated infix) — reference SumSeries/
        // DiffSeries/MultiplySeries/DivideSeries.evaluate:47-51, same
        // message in all four. ALL four are UNION joins over the
        // TimeSyncedIterator default ZERO fill (each builds an infix
        // over SetOperator.UNION, SumSeries.java:61-62 and siblings) —
        // so an unpaired series under multiply emits 0 (value × the
        // 0-fill), never a neutral-1 pass-through, and divide inherits
        // the JEXL zero-divisor quirk (x / 0 → 0, never Inf/NaN;
        // TestDivideSeries.divideMultipleSeriesEach's third series)
        case "sum" | "sumSeries" =>
          SeriesFunctions.combineUnion(combArgs(all), joinKeys, _ + _,
            fill = 0.0)
        case "difference" | "diffSeries" =>
          SeriesFunctions.combineUnion(combArgs(all), joinKeys, _ - _,
            fill = 0.0)
        case "multiply" | "multiplySeries" =>
          SeriesFunctions.combineUnion(combArgs(all), joinKeys, _ * _,
            fill = 0.0)
        case "divide" | "divideSeries" =>
          SeriesFunctions.combineUnion(combArgs(all), joinKeys,
            (a, b) => org.apache.spark.sql.functions.when(b === 0.0,
              org.apache.spark.sql.functions.lit(0.0)).otherwise(a / b),
            fill = 0.0)
        case other => custom.get(other) match {
          case Some(fn) => fn(all, params)
          case None =>
            throw new IllegalArgumentException(s"unknown gexp function $other")
        }
      }
  }
}
