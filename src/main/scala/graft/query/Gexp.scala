package graft.query

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

  // ---- per-function param validation, the reference's exact evaluate
  // contracts (each expression class rolls its own — messages and
  // quirks verbatim) ---------------------------------------------------

  /** Scale.evaluate:39-55: factor must match `^[-0-9\.]+$`; the
    * reject message prints the DEFAULT 0.0 rather than the input (the
    * reference formats `scale_factor`, still zero at that point —
    * Scale.java:53-54, kept verbatim). */
  private def parseScaleFactor(params: Seq[String]): Double = {
    if (params.isEmpty) throw new IllegalArgumentException(
      "Missing scaling factor")
    val factor = params.head
    if (factor != null && factor.matches("^[-0-9\\.]+$"))
      try factor.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          "Invalid parameter, must be an integer or floating point")
      }
    else throw new IllegalArgumentException(
      "Unparseable scale factor value: 0.0")
  }

  /** HighestCurrent/HighestMax.evaluate:48-72 (identical in both, the
    * params-missing message is their moving-average copy-paste). */
  private def parseTopN(params: Seq[String]): Int = {
    if (params.isEmpty) throw new IllegalArgumentException(
      "Need aggregation window for moving average")
    val param = params.head
    if (param == null || param.isEmpty) throw new IllegalArgumentException(
      "Missing top n value (number of series to return)")
    val topn =
      if (param.matches("^[0-9]+$")) param.toInt
      else throw new IllegalArgumentException(
        "Unparseable top n value: " + param)
    if (topn < 1) throw new IllegalArgumentException(
      s"Top n value must be greater than zero: $topn")
    topn
  }

  /** MovingAverage.evaluate:47-76 + parseParam:135-175: a bare count
    * or a quoted Graphite-style window `'10min'` with ITS unit table
    * (day|d, hr|hour|h, min|m, sec|s). Left = point count, Right =
    * window millis. */
  private def parseMovingWindow(params: Seq[String]): Either[Int, Long] = {
    if (params.isEmpty) throw new IllegalArgumentException(
      "Missing moving average window size")
    val raw = params.head
    if (raw == null || raw.isEmpty) throw new IllegalArgumentException(
      "Missing moving average window size")
    val param = raw.trim
    val cond: Either[Int, Long] =
      if (param.matches("^[0-9]+$")) Left(param.toInt)
      else if (param.startsWith("'") && param.endsWith("'"))
        Right(parseMovingParam(param))
      else throw new IllegalArgumentException(
        "Unparseable window size: " + param)
    if (cond.fold(_ <= 0, _ <= 0L)) throw new IllegalArgumentException(
      "Moving average window must be an integer greater than zero")
    cond
  }

  /** MovingAverage.parseParam:135-175 verbatim: index 0 (the opening
    * quote) skipped, digits, unit up to the closing quote. */
  private[graft] def parseMovingParam(param: String): Long = {
    if (param == null || param.isEmpty) throw new IllegalArgumentException(
      "Window parameter may not be null or empty")
    var idx = 0
    var c = 1
    while (c < param.length && param.charAt(c).isDigit) { idx += 1; c += 1 }
    if (idx < 1) throw new IllegalArgumentException(
      "Invalid moving window parameter: " + param)
    try {
      val time = param.substring(1, idx + 1).toInt
      val unit = param.substring(idx + 1, param.length - 1)
      unit match {
        case "day" | "d" => time * 86400000L
        case "hr" | "hour" | "h" => time * 3600000L
        case "min" | "m" => time * 60000L
        case "sec" | "s" => time * 1000L
        case _ => throw new IllegalArgumentException(
          s"Unknown time unit=$unit in window=$param")
      }
    } catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        "Unable to parse moving window parameter: " + param)
    }
  }

  /** TimeShift.parseParam:77-108 verbatim: index 0 (sign or quote)
    * skipped, digits, unit = the trimmed remainder with ITS unit table
    * (sec, min, hr, day|days, week|weeks — no short forms). */
  private[graft] def parseShiftParam(param: String): Long = {
    var tuIndex = 0
    var c = 1
    while (c < param.length && param.charAt(c).isDigit) { tuIndex += 1; c += 1 }
    if (tuIndex == 0) throw new RuntimeException("Invalid Parameter: " + param)
    val time = param.substring(1, tuIndex + 1).toInt
    val unit = param.substring(tuIndex + 1).trim
    unit match {
      case "sec" => time * 1000L
      case "min" => time * 60000L
      case "hr" => time * 3600000L
      case "day" | "days" => time * 86400000L
      case "week" | "weeks" => time * 7L * 86400000L
      case _ => throw new RuntimeException("unknown time unit=" + unit)
    }
  }

  /** TimeShift.evaluate:39-62: the param must be quoted; the shift is
    * strictly positive and moves timestamps FORWARD. One deliberate
    * divergence, documented: the reference hands parseParam the
    * still-closing-quoted string, so the unit always carries a
    * trailing `'` and EVERY quoted input is rejected ("unknown time
    * unit=min'" — TimeShift.java:93 substring(tuIndex+1) vs its own
    * test calling parseParam("+1week") unquoted); here the closing
    * quote is stripped first, making the documented grammar (`eg
    * '10min'`, its own error text) actually accepted. */
  private def parseShiftEval(params: Seq[String]): Long = {
    if (params.isEmpty) throw new IllegalArgumentException(
      "Need amount of timeshift to perform timeshift")
    val raw = params.head
    if (raw == null || raw.isEmpty) throw new IllegalArgumentException(
      s"Invalid timeshift='$raw'")
    val param = raw.trim
    val timeshift =
      if (param.startsWith("'") && param.endsWith("'"))
        parseShiftParam(param.dropRight(1))
      else throw new RuntimeException("Invalid timeshift parameter: eg '10min'")
    if (timeshift <= 0) throw new RuntimeException("timeshift <= 0")
    timeshift
  }

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
        case "scale" => SeriesFunctions.scale(a0, parseScaleFactor(params))
        // the alias template may itself contain commas — the reference
        // re-joins every param (Alias.java:49 COMMA_JOINER)
        case "alias" => SeriesFunctions.alias(a0, params.mkString(","))
        case "movingAverage" =>
          parseMovingWindow(params) match {
            case Left(count) => SeriesFunctions.movingAverageByCount(a0, count)
            case Right(ms) => SeriesFunctions.movingAverageByTime(a0, ms)
          }
        case "highestCurrent" =>
          SeriesFunctions.highestCurrent(a0, parseTopN(params))
        case "highestMax" =>
          SeriesFunctions.highestMax(a0, parseTopN(params))
        case "shift" | "timeShift" =>
          SeriesFunctions.timeShift(a0, parseShiftEval(params))
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
