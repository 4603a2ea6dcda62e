package graft.query

import graft.model.TimeUtils

/**
 * Query model — case-class mirror of the reference's
 * TSQuery/TSSubQuery/TagVFilter/RateOptions/DownsamplingSpecification
 * (reference: src/core/TSQuery.java:47-109, src/core/TSSubQuery.java:50-104,
 * src/query/filter/TagVFilter.java, src/core/RateOptions.java:27-57,
 * src/core/DownsamplingSpecification.java:116-191).
 */

/** Tag-value filter types (reference src/query/filter/TagV*Filter.java).
  * Construction enforces the reference ctor contracts: every filter
  * needs a tagk (TagVFilter.java:149,200), literal_or rejects a
  * pipe-only filter (TagVLiteralOrFilter.java:70), wildcard demands an
  * asterisk (TagVWildcardFilter.java:74), and regexp compiles eagerly
  * so a bad pattern fails at parse time like Pattern.compile in the
  * reference ctor (TagVRegexFilter.java:46). */
sealed trait TagFilter {
  def tagk: String; def groupBy: Boolean
  require(tagk != null && tagk.nonEmpty, "Filter must have a tagk")
}
case class LiteralOr(tagk: String, values: Seq[String], caseInsensitive: Boolean = false,
                     groupBy: Boolean = false) extends TagFilter {
  require(values.exists(_.nonEmpty),
    "Filter must contain more than just a pipe")
}
case class NotLiteralOr(tagk: String, values: Seq[String], caseInsensitive: Boolean = false,
                        groupBy: Boolean = false) extends TagFilter {
  require(values.exists(_.nonEmpty),
    "Filter must contain more than just a pipe")
}
case class Wildcard(tagk: String, pattern: String, caseInsensitive: Boolean = false,
                    groupBy: Boolean = false) extends TagFilter {
  require(pattern != null && pattern.nonEmpty, "Filter cannot be null or empty")
  require(pattern.contains("*"), "Filter must contain an asterisk")
}
case class RegexpFilter(tagk: String, regex: String, groupBy: Boolean = false) extends TagFilter {
  require(regex != null && regex.nonEmpty, "Filter cannot be null or empty")
  java.util.regex.Pattern.compile(regex) // throws PatternSyntaxException
}
case class NotKey(tagk: String) extends TagFilter { val groupBy = false }
/** Group-by-all-values marker (the legacy `{tag=*}` sugar,
  * reference src/core/Tags.java parseWithMetricAndFilters). */
case class GroupByAll(tagk: String) extends TagFilter { val groupBy = true }
/** Plugin filter: arbitrary predicate over the tags map column
  * (reference TagVFilter plugin loading,
  * src/query/filter/TagVFilter.java:45-68). */
case class PluginFilter(tagk: String,
                        predicate: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                        groupBy: Boolean = false) extends TagFilter

/** Rate options (reference src/core/RateOptions.java:27-57). */
case class RateOptions(
    counter: Boolean = false,
    counterMax: Long = Long.MaxValue,
    resetValue: Long = 0,
    dropResets: Boolean = false)

/** Fill policy for empty downsample intervals
  * (reference src/core/FillPolicy.java:22-28). */
sealed trait FillPolicy
object FillPolicy {
  case object None extends FillPolicy    // skip interval
  case object Zero extends FillPolicy
  case object NaN extends FillPolicy
  case object Null extends FillPolicy
  case class Scalar(v: Double) extends FillPolicy
}

/** Downsampling spec `interval-agg[-fill]`, `0all`, calendar `1dc`
  * (reference src/core/DownsamplingSpecification.java:116-191). */
case class DownsampleSpec(
    intervalMs: Long,          // 0 => run_all (one bucket over the range)
    aggregator: String,
    fill: FillPolicy = FillPolicy.None,
    calendar: Boolean = false,
    calendarUnit: String = "", // d/w/n/y when calendar-aligned
    spec: String = "") {       // original request text, echoed by show_query
  /** The spec as the reference echoes it back (TSSubQuery.getDownsample
    * returns the request's own string, fill suffix and all); normalized
    * form only when the spec was built programmatically. */
  def echo: String =
    if (spec.nonEmpty) spec
    else if (intervalMs == 0) s"0all-$aggregator"
    else s"${intervalMs}ms-$aggregator"
}

object DownsampleSpec {
  /** Parse `1h-sum`, `30m-avg-zero`, `0all-sum`, `1dc-max`. */
  def parse(s: String): DownsampleSpec = parseImpl(s).copy(spec = s)

  private def parseImpl(s: String): DownsampleSpec = {
    val parts = s.split("-", 3)
    require(parts.length >= 2, s"invalid downsample spec: $s")
    val ivStr = parts(0)
    val agg = parts(1)
    // reference parity (DownsamplingSpecification ctor): the function
    // must resolve at parse time, and 'none' is not a downsampler
    require(agg != "none" && agg != "raw",
      s"cannot downsample with the 'none' aggregator: $s")
    require(graft.operators.Aggregators.isKnown(agg),
      s"no such downsampling function: $agg in $s")
    val fill = if (parts.length == 3) parts(2).toLowerCase match {
      case "none" => FillPolicy.None
      case "zero" => FillPolicy.Zero
      case "nan"  => FillPolicy.NaN
      case "null" => FillPolicy.Null
      case x      =>
        try FillPolicy.Scalar(x.toDouble)
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"unrecognized fill policy: $x in $s")
        }
    } else FillPolicy.None
    if (ivStr == "0all" || ivStr == "all") DownsampleSpec(0L, agg, fill)
    else if (ivStr.endsWith("c")) {
      val core = ivStr.dropRight(1)
      val (digits, unit) = core.span(_.isDigit)
      val iv = TimeUtils.parseDuration(core)
      require(iv > 0, s"interval must be greater than zero: $s")
      DownsampleSpec(iv, agg, fill, calendar = true, calendarUnit = unit)
    } else {
      val iv = TimeUtils.parseDuration(ivStr)
      // reference parity: '0m-avg' is an error, not run-all — only the
      // explicit '0all'/'all' token selects the whole-range bucket
      require(iv > 0, s"interval must be greater than zero: $s")
      DownsampleSpec(iv, agg, fill)
    }
  }
}

/** One sub-query: aggregator + metric + filters (+ rate, downsample). */
case class SubQuery(
    aggregator: String,
    metric: String,
    filters: Seq[TagFilter] = Seq.empty,
    downsample: Option[DownsampleSpec] = None,
    rate: Option[RateOptions] = None,
    explicitTags: Boolean = false,
    percentiles: Seq[Double] = Seq.empty,
    // explicit-series addressing (reference TSSubQuery.tsuids,
    // src/core/TSSubQuery.java:50-104): series ids replace the
    // metric+filter resolution entirely. Our TSUID analog is the
    // 64-bit series hash (Points.seriesId) rendered as hex.
    tsuids: Seq[String] = Seq.empty)

/** Top-level query (time range + sub-queries). `timezone` drives
  * calendar-aligned downsampling (reference TSQuery.timezone,
  * src/core/TSQuery.java — dashboards set it for `c`-suffix specs). */
case class TsQuery(
    startMs: Long,
    endMs: Long,
    queries: Seq[SubQuery],
    msResolution: Boolean = true,
    timezone: String = "UTC")

object QueryParser {
  /**
   * Parse the `m=` URI sub-query grammar
   * `agg:[interval-agg[-fill]:][rate[{...}]:]metric[{group-filters}[{filters}]]`
   * (reference src/tsd/QueryRpc.java:630-683 parseMTypeSubQuery).
   */
  def parseSubQuery(m: String): SubQuery = {
    // split stages on ':' at brace depth 0 — rate{...} and filter
    // bodies may contain anything
    val segs = splitTop(m, ':')
    require(segs.nonEmpty, s"empty m= spec")
    val agg = segs.head
    var rate: Option[RateOptions] = None
    var ds: Option[DownsampleSpec] = None
    var pcts: Seq[Double] = Seq.empty
    var explicit = false
    segs.tail.dropRight(1).foreach { seg =>
      if (seg.startsWith("rate")) rate = Some(parseRate(seg))
      else if (seg == "explicit_tags") explicit = true
        // stage form of explicit tag matching (reference QueryRpc
        // parseMTypeSubQuery, src/tsd/QueryRpc.java:652-655; order
        // against rate/downsample is free: `sum:explicit_tags:rate:
        // 1m-sum:m` and `sum:explicit_tags:1m-sum:rate:m` both parse)
      else if (seg.startsWith("percentiles[") && seg.endsWith("]"))
        // histogram-percentile stage (reference QueryRpc
        // parseMTypeSubQuery percentiles grammar)
        pcts = seg.stripPrefix("percentiles[").stripSuffix("]")
          .split(",").toSeq.filter(_.trim.nonEmpty).map(_.trim.toDouble)
      else if (seg.nonEmpty) ds = Some(DownsampleSpec.parse(seg))
    }
    val metricSeg = segs.last
    val firstBrace = metricSeg.indexOf('{')
    val metricName = if (firstBrace < 0) metricSeg else metricSeg.take(firstBrace)
    // reference parity: '{host=x}' with no metric is a parse error
    // (Tags.parseWithMetric throws on a null metric)
    require(metricName.nonEmpty, s"missing metric in m= spec: $m")
    val filters =
      if (firstBrace < 0) Seq.empty
      else parseLegacyFilters(metricSeg.substring(firstBrace))
    SubQuery(agg, metricName, filters, ds, rate, explicitTags = explicit,
      percentiles = pcts)
  }

  /** Split on `sep` at `{}` depth 0. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var depth = 0; var start = 0
    s.indices.foreach { i =>
      s(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1
        case c if c == sep && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += s.substring(start)
    out.toSeq
  }

  /** The V1 output flags the GET form carries next to the query
    * proper (reference QueryRpc.parseQuery boolean params). */
  case class UriFlags(padding: Boolean = false,
      noAnnotations: Boolean = false, globalAnnotations: Boolean = false,
      showTsuids: Boolean = false, showQuery: Boolean = false,
      showStats: Boolean = false, showSummary: Boolean = false)

  /**
   * GET /api/query query-string form (reference QueryRpc.parseQuery,
   * src/tsd/QueryRpc.java:517-605): required `start`, optional `end`,
   * repeated `m=` and `tsuid=` sub-queries, `ms` resolution and the
   * V1 presentation flags. The reference reads no timezone from the
   * GET form (tz is a /q graphing param), so calendar specs align in
   * UTC exactly as they do there. `now` injected for determinism.
   */
  def parseUri(qs: String,
               now: Long = System.currentTimeMillis()): (TsQuery, UriFlags) = {
    val params: Map[String, Seq[String]] = qs.stripPrefix("?")
      .split("&").toSeq.filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else kv.take(i) ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.groupMap(_._1)(_._2)
    def flag(k: String) = params.contains(k)
    val start = params.get("start").flatMap(_.headOption)
      .filter(_.nonEmpty).getOrElse(throw new IllegalArgumentException(
        "Missing parameter <start>"))
    val startMs = graft.model.TimeUtils.parseDateTime(start, now)
    val endMs = params.get("end").flatMap(_.headOption).filter(_.nonEmpty)
      .map(graft.model.TimeUtils.parseDateTime(_, now)).getOrElse(now)
    require(endMs >= startMs,
      s"End time [$endMs] must be greater than or equal to the " +
        s"start time [$startMs]")
    // duplicate sub queries are filtered, first occurrence order kept
    // (reference QueryRpc.parseQuery:613-616 LinkedHashSet;
    // TestQueryRpc.executeURIDuplicates)
    val subs = (params.getOrElse("tsuid", Seq.empty).map(parseTsuidSubQuery) ++
      params.getOrElse("m", Seq.empty).map(parseSubQuery)).distinct
    if (subs.isEmpty)
      throw new IllegalArgumentException("Missing sub queries")
    (TsQuery(startMs, endMs, subs, msResolution = flag("ms")),
      UriFlags(flag("padding"), flag("no_annotations"),
        flag("global_annotations"), flag("show_tsuids"), flag("show_query"),
        flag("show_stats"), flag("show_summary")))
  }

  /**
   * GET `/api/query/gexp` — the URI form plus `exp=` Graphite-style
   * expressions (reference QueryRpc.handleQuery with expressions,
   * src/tsd/QueryRpc.java:107-108, 585-610): each `exp=` parses into
   * its tree (an improper expression tosses up), its METRIC LEAVES
   * join the TSQuery's sub queries so the data fetch covers them, and
   * a request with neither `m=` nor a leaf-bearing `exp=` is the
   * same "Missing sub queries" error. Returns the query (leaf subs
   * included, duplicates collapsed like m=), the V1 flags, and the
   * parsed ASTs for [[Gexp.eval]].
   */
  def parseUriGexp(qs: String, now: Long = System.currentTimeMillis())
      : (TsQuery, UriFlags, Seq[Gexp.Node]) = {
    val params: Map[String, Seq[String]] = qs.stripPrefix("?")
      .split("&").toSeq.filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else kv.take(i) ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.groupMap(_._1)(_._2)
    val exps = params.getOrElse("exp", Seq.empty).map(Gexp.parse)
    def leaves(n: Gexp.Node): Seq[String] = n match {
      case Gexp.MetricNode(spec) => Seq(spec)
      case Gexp.FuncNode(_, args, _) => args.flatMap(leaves)
    }
    val leafSubs = exps.flatMap(leaves).map(parseSubQuery)
    // reuse the m= parser for everything but exp=, then splice the
    // expression leaves in (QueryRpc parseMTypeSubQuery per leaf)
    val base = qs.stripPrefix("?").split("&").filter(_.nonEmpty)
      .filter(p => p.takeWhile(_ != '=') != "exp").mkString("&")
    val (q0, flags) =
      if (params.contains("m") || params.contains("tsuid")) parseUri(base, now)
      else {
        // no m/tsuid: parse start/end ourselves, subs come from leaves
        val start = params.get("start").flatMap(_.headOption)
          .filter(_.nonEmpty).getOrElse(throw new IllegalArgumentException(
            "Missing parameter <start>"))
        val startMs = graft.model.TimeUtils.parseDateTime(start, now)
        val endMs = params.get("end").flatMap(_.headOption)
          .filter(_.nonEmpty)
          .map(graft.model.TimeUtils.parseDateTime(_, now)).getOrElse(now)
        (TsQuery(startMs, endMs, Seq.empty,
            msResolution = params.contains("ms")),
          UriFlags())
      }
    val subs = (q0.queries ++ leafSubs).distinct
    if (subs.isEmpty)
      throw new IllegalArgumentException("Missing sub queries")
    (q0.copy(queries = subs), flags, exps)
  }

  /** `tsuid=` sub-query grammar `agg:[interval-agg:][rate:]tsuid[,s]`
    * (reference QueryRpc.parseTsuidTypeSubQuery: 2-5 colon parts;
    * middle stages dispatch on rate-prefix / leading digit /
    * percentiles, unlike the m= grammar's positional form). */
  def parseTsuidSubQuery(q: String): SubQuery = {
    require(q.nonEmpty, "The tsuid query string was empty")
    val parts = splitTop(q, ':')
    require(parts.length >= 2 && parts.length <= 5,
      s"Invalid parameter m=$q (" +
        (if (parts.length < 2) "not enough" else "too many") +
        " :-separated parts)")
    var ds: Option[DownsampleSpec] = None
    var rate: Option[RateOptions] = None
    var pcts: Seq[Double] = Seq.empty
    parts.tail.dropRight(1).foreach { p =>
      if (p.toLowerCase.startsWith("rate")) rate = Some(parseRate(p))
      else if (p.nonEmpty && p.head.isDigit) ds = Some(DownsampleSpec.parse(p))
      else if (p.toLowerCase.startsWith("percentiles[") && p.endsWith("]"))
        pcts = p.stripPrefix("percentiles[").stripSuffix("]")
          .split(",").toSeq.filter(_.trim.nonEmpty).map(_.trim.toDouble)
      else throw new IllegalArgumentException(
        s"Unrecognized tsuid sub-query stage: $p")
    }
    SubQuery(parts.head, metric = "", downsample = ds, rate = rate,
      percentiles = pcts, tsuids = parts.last.split(",").toSeq)
  }

  /** `rate` or `rate{counter[,max[,reset]]}` / `rate{dropcounter}`
    * (reference src/tsd/QueryRpc.java:745-783). */
  def parseRate(s: String): RateOptions = {
    if (s == "rate") RateOptions()
    else {
      val inner = s.stripPrefix("rate").stripPrefix("{").stripSuffix("}")
      val parts = inner.split(",", -1)
      val counter = parts(0) == "counter" || parts(0) == "dropcounter"
      val drop = parts(0) == "dropcounter"
      val max = if (parts.length > 1 && parts(1).nonEmpty) parts(1).toLong else Long.MaxValue
      val reset = if (parts.length > 2 && parts(2).nonEmpty) parts(2).toLong else 0L
      RateOptions(counter, max, reset, drop)
    }
  }

  /**
   * Legacy `{tag=value}` sugar → filters (reference src/core/Tags.java
   * parseWithMetricAndFilters + TagVFilter.tagsToFilters):
   * `*` → group-by-all, `a|b` → literal_or with group-by,
   * plain value → literal_or group-by, `wildcard(*pat*)` etc. for the
   * second (non-grouping) brace group.
   */
  def parseLegacyFilters(braces: String): Seq[TagFilter] = {
    // braces may be `{g}` or `{g}{f}`; anything else — an unclosed
    // brace, text between groups — is a hard parse error, matching the
    // reference (Tags.parseWithMetricAndFilters throws on unbalanced
    // braces instead of silently dropping the filter)
    require(braces.count(_ == '{') == braces.count(_ == '}') &&
        braces.endsWith("}"),
      s"unclosed filter brace in: $braces")
    val groups = raw"\{([^}]*)\}".r.findAllMatchIn(braces).map(_.group(1)).toSeq
    require(groups.map(g => s"{$g}").mkString == braces,
      s"malformed filter braces: $braces")
    // reference strictness (Tags.parseWithMetric vectors, test/core/
    // TestTags.java:80-208): empty pairs from forward/trailing commas,
    // empty tag names or values, and a second '=' inside a value (the
    // missing-comma case 'host=web01 dc=lga') are all hard errors —
    // split(",", -1) keeps the empty fields so they can be rejected
    def parseOne(body: String, grouping: Boolean): Seq[TagFilter] =
      if (body.trim.isEmpty) Seq.empty
      else body.split(",", -1).toSeq.map { pair =>
        pair.split("=", 2) match {
          case Array(k, v) =>
            val (kt, vt) = (k.trim, v.trim)
            require(kt.nonEmpty, s"empty tag name in filter pair: $pair")
            require(vt.nonEmpty, s"empty tag value in filter pair: $pair")
            require(!vt.contains('=') || vt.matches(raw"\w+\(.*\)"),
              s"invalid tag value (stray '='): $pair")
            parseFilterValue(kt, vt, grouping)
          case _ => throw new IllegalArgumentException(
            s"filter pair missing '=': $pair")
        }
      }
    groups.zipWithIndex.flatMap { case (g, i) => parseOne(g, i == 0) }
  }

  /** Plugin point: custom filter types by name — the reference's
    * TagVFilter plugin loading (src/query/filter/TagVFilter.java:45-68).
    * A factory receives (tagk, argument, groupBy). */
  private val customFilters = scala.collection.concurrent.TrieMap
    .empty[String, (String, String, Boolean) => TagFilter]

  private val customFilterMeta = scala.collection.concurrent.TrieMap
    .empty[String, (String, String)]

  /** Register a custom filter type usable in both grammars; the
    * description/examples surface through `/api/config/filters` like
    * the reference's per-plugin static description()/examples(). */
  def registerFilter(name: String,
                     fn: (String, String, Boolean) => TagFilter,
                     description: String = "",
                     examples: String = ""): Unit = {
    customFilters.put(name.toLowerCase, fn)
    customFilterMeta.put(name.toLowerCase, (description, examples))
  }

  /** GET /api/config/filters payload: filter name → (description,
    * examples) for the eight built-ins (strings transcribed verbatim
    * from the reference's filter classes:
    * src/query/filter/TagVLiteralOrFilter.java:148-163 etc.) plus any
    * registered plugin filters — the mirror of
    * TagVFilter.loadedFilters (src/query/filter/TagVFilter.java:359). */
  def loadedFilters(): Seq[(String, String, String)] = {
    val builtins = Seq(
      ("literal_or",
        "Accepts one or more exact values and matches if the series contains " +
          "any of them. Multiple values can be included and must be separated " +
          "by the | (pipe) character. The filter is case sensitive and will not " +
          "allow characters that TSDB does not allow at write time.",
        "host=literal_or(web01),  host=literal_or(web01|web02|web03)  " +
          "{\"type\":\"literal_or\",\"tagk\":\"host\"," +
          "\"filter\":\"web01|web02|web03\",\"groupBy\":false}"),
      ("iliteral_or",
        "Accepts one or more exact values and matches if the series contains " +
          "any of them. Multiple values can be included and must be separated " +
          "by the | (pipe) character. The filter is case insensitive and will not " +
          "allow characters that TSDB does not allow at write time.",
        "host=iliteral_or(web01),  host=iliteral_or(web01|web02|web03)  " +
          "{\"type\":\"iliteral_or\",\"tagk\":\"host\"," +
          "\"filter\":\"web01|web02|web03\",\"groupBy\":false}"),
      ("not_literal_or",
        "Accepts one or more exact values and matches if the series does NOT " +
          "contain any of them. Multiple values can be included and must be " +
          "separated by the | (pipe) character. The filter is case sensitive " +
          "and will not allow characters that TSDB does not allow at write time.",
        "host=not_literal_or(web01),  host=not_literal_or(web01|web02|web03)  " +
          "{\"type\":\"not_literal_or\",\"tagk\":\"host\"," +
          "\"filter\":\"web01|web02|web03\",\"groupBy\":false}"),
      ("not_iliteral_or",
        "Accepts one or more exact values and matches if the series does NOT " +
          "contain any of them. Multiple values can be included and must be " +
          "separated by the | (pipe) character. The filter is case insensitive " +
          "and will not allow characters that TSDB does not allow at write time.",
        "host=not_iliteral_or(web01),  host=not_iliteral_or(web01|web02|web03)  " +
          "{\"type\":\"not_iliteral_or\",\"tagk\":\"host\"," +
          "\"filter\":\"web01|web02|web03\",\"groupBy\":false}"),
      ("wildcard",
        "Performs pre, post and in-fix glob matching of values. The globs " +
          "are case sensitive and multiple wildcards can be used. The wildcard " +
          "character is the * (asterisk). At least one wildcard must be " +
          "present in the filter value. A wildcard by itself can be used as " +
          "well to match on any value for the tag key.",
        "host=wildcard(web*),  host=wildcard(web*.tsdb.net)  " +
          "{\"type\":\"wildcard\",\"tagk\":\"host\"," +
          "\"filter\":\"web*.tsdb.net\",\"groupBy\":false}"),
      ("iwildcard",
        "Performs pre, post and in-fix glob matching of values. The globs " +
          "are case insensitive and multiple wildcards can be used. The wildcard " +
          "character is the * (asterisk). Case insensitivity is achieved by " +
          "dropping all values to lower case. At least one wildcard must be " +
          "present in the filter value. A wildcard by itself can be used as " +
          "well to match on any value for the tag key.",
        "host=iwildcard(web*),  host=iwildcard(web*.tsdb.net)  " +
          "{\"type\":\"iwildcard\",\"tagk\":\"host\"," +
          "\"filter\":\"web*.tsdb.net\",\"groupBy\":false}"),
      ("regexp",
        "Provides full, POSIX compliant regular expression using the " +
          "built in Java Pattern class. Note that an expression containing " +
          "curly braces {} will not parse properly in URLs. If the pattern " +
          "is not a valid regular expression then an exception will be raised.",
        "host=regexp(.*)  {\"type\":\"regexp\",\"tagk\":\"host\"," +
          "\"filter\":\".*\",\"groupBy\":false}"),
      ("not_key",
        "Skips any time series with the given tag key, regardless of the " +
          "value. This can be useful for situations where a metric has " +
          "inconsistent tag sets. NOTE: The filter value must be null or an " +
          "empty string.",
        "host=not_key()  {\"type\":\"not_key\",\"tagk\":\"host\"," +
          "\"filter\":\"\",\"groupBy\":false}"))
    val customs = customFilterMeta.toSeq.map { case (n, (d, e)) => (n, d, e) }
    (builtins ++ customs).sortBy(_._1)
  }

  /** A single filter value in either sugar or `type(value)` form —
    * the mirror of TagVFilter.getFilter (src/query/filter/
    * TagVFilter.java:196-221): a value containing `(` MUST be a
    * well-formed `type(arg)` ending in `)` (stripParentheses throws
    * otherwise), anything else containing `*` takes the
    * case-insensitive wildcard shortcut, and the rest is a literal. */
  def parseFilterValue(k: String, v: String, groupBy: Boolean): TagFilter = {
    require(v != null && v.nonEmpty, "Filter cannot be null or empty")
    val fnRe = raw"([^(]*)\((.*)\)".r
    if (v.contains("(") && !v.endsWith(")"))
      throw new IllegalArgumentException(s"Filter must end with a ')': $v")
    v match {
      case "*" => if (groupBy) GroupByAll(k) else Wildcard(k, "*", groupBy = false)
      case fnRe(fn, arg) => fn.toLowerCase match {
        case "literal_or"      => LiteralOr(k, arg.split("\\|").toSeq, groupBy = groupBy)
        case "iliteral_or"     => LiteralOr(k, arg.split("\\|").toSeq, caseInsensitive = true, groupBy = groupBy)
        case "not_literal_or"  => NotLiteralOr(k, arg.split("\\|").toSeq, groupBy = groupBy)
        case "not_iliteral_or" => NotLiteralOr(k, arg.split("\\|").toSeq, caseInsensitive = true, groupBy = groupBy)
        case "wildcard"        => Wildcard(k, arg, groupBy = groupBy)
        case "iwildcard"       => Wildcard(k, arg, caseInsensitive = true, groupBy = groupBy)
        case "regexp"          => RegexpFilter(k, arg, groupBy = groupBy)
        case "not_key"         => NotKey(k)
        case other => customFilters.get(other) match {
          case Some(mk) => mk(k, arg, groupBy)
          case None => throw new IllegalArgumentException(s"unknown filter type $other")
        }
      }
      case s if s.contains("|") => LiteralOr(k, s.split("\\|").toSeq, groupBy = groupBy)
      // the implicit-star shortcut is case-INSENSITIVE in the
      // reference (TagVFilter.getFilter, src/query/filter/
      // TagVFilter.java:196-221: `new TagVWildcardFilter(tagk,
      // filter, true)`), unlike the explicit wildcard(...) form
      case s if s.contains("*") =>
        Wildcard(k, s, caseInsensitive = true, groupBy = groupBy)
      case s => LiteralOr(k, Seq(s), groupBy = groupBy)
    }
  }
}
