package graft.query

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.TimeUtils
import scala.jdk.CollectionConverters._

/**
 * POST `/api/query/exp` JSON body parsing — the reference's V2
 * expression-query POJO model (reference: src/query/pojo/Query.java:33,
 * Timespan.java:32-49, Metric.java:30-50, Filter.java:30-40,
 * Expression.java:38-55, Join.java:28-34, Output.java:27-33,
 * Downsampler.java:33-41, src/query/expression/NumericFillPolicy.java)
 * and the POJO→TSQuery compilation performed by the executor
 * (src/tsd/QueryExecutor.java:120-224).
 *
 * The model is data-only: `parse` validates exactly the constraints of
 * the reference's `Query.validate()` (required timespan + metrics,
 * unique alphanumeric ids, resolvable filter references, resolvable
 * expression variables) and `toTsQuery`/`subQueries` reproduces the
 * executor's compilation — per-metric sub-queries sharing the
 * timespan's downsampler/rate, with per-metric aggregator overrides.
 * Evaluation lives in [[graft.Engine.runExpJson]], which feeds the
 * sub-query results through [[ExpQuery.evalWithFills]].
 *
 * Accepted shape:
 * {{{
 * { "time": { "start": "1h-ago", "end": 1356998400, "timezone": "UTC",
 *             "aggregator": "sum", "rate": false,
 *             "downsampler": {"interval":"1h","aggregator":"sum",
 *                             "fillPolicy":{"policy":"zero"}} },
 *   "filters": [ {"id":"f1","explicitTags":false,
 *                 "tags":[{"type":"literal_or","tagk":"host",
 *                          "filter":"web01|web02","groupBy":true}]} ],
 *   "metrics": [ {"id":"a","metric":"sys.cpu.user","filter":"f1",
 *                 "aggregator":"max",
 *                 "fillPolicy":{"policy":"scalar","value":5}} ],
 *   "expressions": [ {"id":"e","expr":"a + b * 2",
 *                     "join":{"operator":"union"},
 *                     "fillPolicy":{"policy":"zero"}} ],
 *   "outputs": [ {"id":"e","alias":"combined"} ] }
 * }}}
 */
object ExpJsonQuery {

  /** NumericFillPolicy: how a variable's missing values substitute in
    * expression arithmetic. nan/null both surface as NaN doubles here —
    * the engine has no "absent" scalar inside arithmetic, matching the
    * reference's expression iterators which substitute the double form. */
  case class NumericFill(policy: String, value: Double = 0.0) {
    def fill: Double = policy match {
      case "zero"           => 0.0
      case "scalar"         => value
      case "nan" | "null"   => Double.NaN
      case "none"           => Double.NaN
      case other => throw new IllegalArgumentException(
        s"unknown fill policy: $other")
    }
  }

  case class FilterSet(id: String, tags: Seq[TagFilter],
                       explicitTags: Boolean)

  /** `timeOffsetMs`: the metric's time-over-time shift (reference
    * Metric.time_offset, Metric.java:43 — validated by the POJO as a
    * relative date like "1w-ago" but left TODO in the reference
    * executor, QueryExecutor.java:83 "time over time queries"; we wire
    * it: the metric scans [start−offset, end−offset] and its
    * timestamps shift forward by the offset so `a / aLastWeek` joins
    * on today's clock). */
  case class MetricDef(id: String, metric: String, filter: Option[String],
                       aggregator: Option[String],
                       fillPolicy: Option[NumericFill],
                       timeOffsetMs: Option[Long] = None)

  /** Join component: set operator plus the two serialization-tag flags
    * (use_query_tags / include_agg_tags, reference Join.java:28-34).
    * The flags shape which tags the reference REPORTS on joined rows;
    * the join itself always matches on the series' common tags, which
    * is what the engine does — so they are parsed and carried, not
    * consulted. */
  case class JoinDef(operator: String, useQueryTags: Boolean = false,
                     includeAggTags: Boolean = true)

  case class ExprDef(id: String, expr: String, join: JoinDef,
                     fillPolicy: Option[NumericFill])

  case class OutputDef(id: String, alias: Option[String])

  case class ExpRequest(startMs: Long, endMs: Long, timezone: String,
                        aggregator: String, rate: Boolean,
                        downsample: Option[DownsampleSpec],
                        filters: Seq[FilterSet], metrics: Seq[MetricDef],
                        expressions: Seq[ExprDef], outputs: Seq[OutputDef]) {

    /** The executor's POJO→TSSubQuery compilation
      * (src/tsd/QueryExecutor.java:148-190): the timespan's
      * downsampler and rate flag apply to every metric; the metric's
      * aggregator overrides the timespan's; the metric's filter id
      * resolves to that filter set's tag filters + explicitTags. */
    def subQuery(m: MetricDef): SubQuery = {
      val fs = m.filter.flatMap(id => filters.find(_.id == id))
      SubQuery(
        aggregator = m.aggregator.getOrElse(aggregator),
        metric = m.metric,
        filters = fs.map(_.tags).getOrElse(Seq.empty),
        downsample = downsample,
        rate = if (rate) Some(RateOptions()) else None,
        explicitTags = fs.exists(_.explicitTags))
    }

    def tsQuery: TsQuery =
      TsQuery(startMs, endMs, metrics.map(subQuery), timezone = timezone)

    /** Per-metric fill values for [[ExpQuery.evalWithFills]]. */
    def metricFills: Map[String, Double] =
      metrics.flatMap(m => m.fillPolicy.map(m.id -> _.fill)).toMap
  }

  private val mapper = new ObjectMapper()

  def parse(body: String,
            now: Long = System.currentTimeMillis()): ExpRequest = {
    val root = mapper.readTree(body)
    val time = root.get("time")
    req(time != null && !time.isNull, "missing time")
    // Timespan.validate (Timespan.java:124-146) — texts verbatim,
    // including the case split ("missing or empty start" lowercase,
    // "Missing or empty aggregator" capital)
    req(time.hasNonNull("start") && time.get("start").asText().nonEmpty,
      "missing or empty start")
    req(time.hasNonNull("aggregator") &&
      time.get("aggregator").asText().nonEmpty,
      "Missing or empty aggregator")
    req(graft.operators.Aggregators.isKnown(
      time.get("aggregator").asText().toLowerCase), "Invalid aggregator")
    val startMs = parseTime(time.get("start"), now)
    val endMs =
      if (time.hasNonNull("end") && time.get("end").asText().nonEmpty)
        parseTime(time.get("end"), now) else now
    req(endMs > startMs, s"end time $endMs must be after start $startMs")
    val downsample = Option(time.get("downsampler"))
      .filterNot(x => x == null || x.isNull).map { d =>
        // Downsampler.validate (Downsampler.java:58-73)
        req(d.hasNonNull("interval") && d.get("interval").asText().nonEmpty,
          "Missing or empty interval")
        req(d.hasNonNull("aggregator") &&
          d.get("aggregator").asText().nonEmpty,
          "Missing or empty aggregator")
        req(graft.operators.Aggregators.isKnown(
          d.get("aggregator").asText().toLowerCase), "Invalid aggregator")
        // the reference executor compiles interval + "-" + aggregator
        // (QueryExecutor.java:158-161); the POJO also validates an
        // optional fillPolicy, which our downsample honors directly
        val fp = Option(d.get("fillPolicy"))
          .filterNot(x => x == null || x.isNull)
          .map(f => parseFill(f).policy)
        DownsampleSpec.parse(
          d.get("interval").asText() + "-" + d.get("aggregator").asText() +
            fp.map("-" + _).getOrElse(""))
      }

    val filters = arr(root, "filters").map { f =>
      req(f.hasNonNull("id"), "Missing or empty id")
      val id = f.get("id").asText()
      validateId(id)
      val tags = arr(f, "tags").map { t =>
        QueryParser.parseFilterValue(t.get("tagk").asText(),
          s"${t.get("type").asText()}(${t.path("filter").asText("")})",
          t.path("groupBy").asBoolean(false))
      }
      FilterSet(id, tags, f.path("explicitTags").asBoolean(false))
    }
    requireUnique(filters.map(_.id), "filter")

    val metrics = arr(root, "metrics").map { m =>
      // Metric.validate (Metric.java:102-121)
      req(m.hasNonNull("metric") && m.get("metric").asText().nonEmpty,
        "missing or empty metric")
      req(m.hasNonNull("id") && m.get("id").asText().nonEmpty,
        "missing or empty id")
      val id = m.get("id").asText()
      validateId(id)
      val agg = Option(m.get("aggregator"))
        .filterNot(x => x == null || x.isNull)
        .map(_.asText()).filter(_.nonEmpty)
      agg.foreach(a => req(graft.operators.Aggregators.isKnown(a.toLowerCase),
        "Invalid aggregator"))
      MetricDef(id, m.get("metric").asText(),
        Option(m.get("filter")).filterNot(x => x == null || x.isNull)
          .map(_.asText()).filter(_.nonEmpty),
        agg,
        Option(m.get("fillPolicy")).filterNot(x => x == null || x.isNull)
          .map(parseFill),
        Option(m.get("timeOffset")).filterNot(x => x == null || x.isNull)
          .map(_.asText()).filter(_.nonEmpty)
          .map(s => TimeUtils.parseDuration(s.stripSuffix("-ago"))))
    }
    req(metrics.nonEmpty, "missing or empty metrics")
    requireUnique(metrics.map(_.id), "metric")
    val filterIds = filters.map(_.id).toSet
    metrics.foreach(m => m.filter.foreach(fid =>
      req(filterIds.contains(fid),
        s"unrecognized filter id $fid in metric ${m.id}")))

    val expressions = arr(root, "expressions").map { e =>
      // Expression.validate (Expression.java:97-105)
      req(e.hasNonNull("id") && e.get("id").asText().nonEmpty,
        "missing or empty id")
      req(e.hasNonNull("expr") && e.get("expr").asText().nonEmpty,
        "missing or empty expr")
      val id = e.get("id").asText()
      validateId(id)
      val join = Option(e.get("join")).filterNot(x => x == null || x.isNull)
        .map { j =>
          // Join.validate (Join.java:75-78): a join object without an
          // operator is an error, never a silent union
          req(j.hasNonNull("operator") &&
            j.get("operator").asText().nonEmpty, "Missing join operator")
          val op = j.get("operator").asText().toLowerCase
          req(op == "union" || op == "intersection",
            s"unsupported join operator: $op")
          JoinDef(op, j.path("useQueryTags").asBoolean(false),
            j.path("includeAggTags").asBoolean(true))
        }.getOrElse(JoinDef("union"))
      ExprDef(id, e.get("expr").asText(), join,
        Option(e.get("fillPolicy")).filterNot(x => x == null || x.isNull)
          .map(parseFill))
    }
    // ids are one namespace: an expression may not shadow a metric
    // (Query.validate, reference Query.java:134-141). A variable may
    // resolve to a metric or ANY expression — the reference compiles a
    // dependency DAG, so forward references between expressions are
    // legal (TestQueryExecutor
    // .nestedExpressionsTwoLevelsDefaultOutputOrdering declares e
    // last); self references and cycles are the executor's errors
    // (Engine.runExpJson), and a variable naming NOTHING is
    // ExpressionIterator's "Missing results for variable" at compile.
    requireUnique(metrics.map(_.id) ++ expressions.map(_.id),
      "variable or expression")
    val known = metrics.map(_.id).toSet ++ expressions.map(_.id)
    // Query.validate's input check (Query.java:165-170): every
    // variable an expression reads must name a metric or an expression
    // (forward references included — variable_ids holds ALL ids by
    // this point). The executor's own compile-time "Missing results
    // for variable" only fires for ids this gate can't see.
    expressions.foreach { e =>
      ExpQuery.variables(ExpQuery.parse(e.expr)).foreach(v =>
        req(known.contains(v),
          s"Expression [${e.expr}] was missing input $v"))
    }

    val outputs = arr(root, "outputs").map { o =>
      req(o.hasNonNull("id"), "missing or empty id")
      val id = o.get("id").asText()
      validateId(id)
      req(known.contains(id), s"unknown output id $id")
      OutputDef(id,
        Option(o.get("alias")).filterNot(x => x == null || x.isNull)
          .map(_.asText()).filter(_.nonEmpty))
    }

    // a metrics-only body (no expressions, no outputs) is LEGAL: the
    // executor defaults the outputs to the metrics
    // (QueryExecutor.serialize:499-517; TestQuery.justMetrics)

    ExpRequest(startMs, endMs, time.path("timezone").asText("UTC"),
      time.get("aggregator").asText(),
      time.path("rate").asBoolean(false),
      downsample, filters, metrics, expressions, outputs)
  }

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).filterNot(x => x == null || x.isNull)
      .toSeq.flatMap(_.elements().asScala.toSeq)

  /** NumericFillPolicy.validate (reference
    * src/query/expression/NumericFillPolicy.java:140-175): a missing
    * policy is INFERRED from the value (0 → zero, NaN → nan, anything
    * else → scalar), and a present policy must gel with the value —
    * none/nan/null accept only 0-or-NaN and normalize to NaN, zero
    * accepts only 0, scalar accepts anything (including 0 and NaN).
    * Error messages are the reference's, character for character. */
  private def parseFill(n: JsonNode): NumericFill = {
    val policy = Option(n.get("policy")).filterNot(x => x == null || x.isNull)
      .map(_.asText().toLowerCase).filter(_.nonEmpty)
    val value = n.path("value").asDouble(0.0)
    policy match {
      case None =>
        if (value.isNaN) NumericFill("nan", Double.NaN)
        else if (value == 0) NumericFill("zero", 0.0)
        else NumericFill("scalar", value)
      case Some(p @ ("none" | "nan")) =>
        if (value != 0 && !value.isNaN) throw new IllegalArgumentException(
          "The value for NONE and NAN must be NaN")
        NumericFill(p, Double.NaN)
      case Some("zero") =>
        if (value != 0) throw new IllegalArgumentException(
          "The value for ZERO must be 0")
        NumericFill("zero", 0.0)
      case Some("null") =>
        if (value != 0 && !value.isNaN) throw new IllegalArgumentException(
          "The value for NULL must be 0")
        NumericFill("null", Double.NaN)
      case Some("scalar") => NumericFill("scalar", value)
      case Some(other) => throw new IllegalArgumentException(
        s"unsupported fill policy: $other")
    }
  }

  private def parseTime(n: JsonNode, now: Long): Long =
    if (n.isNumber) {
      val v = n.asLong()
      if (v > 4294967295L) v else v * 1000L
    } else TimeUtils.parseDateTime(n.asText(), now)

  /** Reference Query.validateId (Query.java:203-221): letters and
    * digits only, and a single-character id may not be a digit (it
    * would be ambiguous with a numeric literal in the expression). */
  /** The reference's validations throw bare IllegalArgumentExceptions
    * with VERBATIM messages (Query/Metric/Filter/Expression.validate);
    * Scala's require() would prefix "requirement failed: ". */
  private def req(cond: Boolean, msg: => Any): Unit =
    if (!cond) throw new IllegalArgumentException(String.valueOf(msg))

  def validateId(id: String): Unit = {
    req(id != null && id.nonEmpty, "The ID cannot be null or empty")
    id.foreach(c => req(c.isLetterOrDigit,
      s"""Invalid id ("$id"): illegal character: $c"""))
    if (id.length == 1)
      req(!id.charAt(0).isDigit, "The ID cannot be an integer")
  }

  private def requireUnique(ids: Seq[String], what: String): Unit = {
    val dup = ids.diff(ids.distinct).distinct
    // Query.validate's three duplicate messages, case included: metric
    // and filter are lowercase "duplicated <x> id:", the combined
    // variable namespace is "Duplicated variable or expression id:"
    // (Query.java:117-141)
    val prefix =
      if (what == "variable or expression") s"Duplicated $what id: "
      else s"duplicated $what id: "
    req(dup.isEmpty, prefix + dup.mkString(", "))
  }
}
