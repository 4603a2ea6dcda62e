package graft

import graft.model.TimeUtils
import graft.query._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-function specs: duration/date parsing and the m=/filter/rate/
  * downsample grammars (reference semantics per SURVEY §2.11, §3.1). */
class ParserSpec extends AnyFunSuite {

  test("duration units incl. n=30d and y=365d") {
    assert(TimeUtils.parseDuration("100ms") == 100L)
    assert(TimeUtils.parseDuration("5s") == 5000L)
    assert(TimeUtils.parseDuration("2m") == 120000L)
    assert(TimeUtils.parseDuration("3h") == 3 * 3600000L)
    assert(TimeUtils.parseDuration("1d") == 86400000L)
    assert(TimeUtils.parseDuration("2w") == 14 * 86400000L)
    assert(TimeUtils.parseDuration("1n") == 30L * 86400000L)
    assert(TimeUtils.parseDuration("1y") == 365L * 86400000L)
  }

  test("date parsing: relative, epoch s/ms, absolute") {
    val now = 1700000000000L
    assert(TimeUtils.parseDateTime("5m-ago", now) == now - 300000L)
    assert(TimeUtils.parseDateTime("now", now) == now)
    assert(TimeUtils.parseDateTime("1700000000", now) == 1700000000000L)
    assert(TimeUtils.parseDateTime("1700000000123", now) == 1700000000123L)
    // dotted epochs CONCATENATE digits (reference semantics: the dot
    // is removed, no zero-padding) — "…0.5" is 11 digits of millis
    assert(TimeUtils.parseDateTime("1700000000.5", now) == 17000000005L)
    assert(TimeUtils.parseDateTime("2024/01/05", now) == 1704412800000L)
    assert(TimeUtils.parseDateTime("2024/01/05-01:30:00", now) == 1704418200000L)
  }

  test("reference TestDateTime golden vectors parse identically") {
    // ported 1:1 from reference test/utils/TestDateTime.java:75-290
    // (parseDateTimeString block); `now` injected for determinism
    val now = 1357300800000L
    def p(s: String) = TimeUtils.parseDateTime(s, now)
    // relative
    assert(now - p("60s-ago") == 60000L)
    assert(now - p("1m-ago") == 60000L)
    assert(now - p("2h-ago") == 7200000L)
    assert(now - p("3d-ago") == 3L * 86400000L)
    assert(now - p("1w-ago") == 7L * 86400000L)
    assert(now - p("1n-ago") == 30L * 86400000L)
    assert(now - p("1y-ago") == 365L * 86400000L)
    // unix seconds / millis by string length
    assert(p("1355961600") == 1355961600000L)
    assert(p("0") == 0L)
    // 11 digits: "can happen if someone leaves off a zero" — MILLIS
    assert(p("13559616000") == 13559616000L)
    assert(p("1355961603418") == 1355961603418L)
    // explicit ms suffix
    assert(p("123123ms") == 123123L)
    assert(p("1234567890123ms") == 1234567890123L)
    // dotted: digits concatenate, never pad
    assert(p("1355961603.418") == 1355961603418L)
    assert(p("1355961603.41") == 135596160341L)
    assert(p("1355961603.4") == 13559616034L)
    // dotted shape violations throw (9 digits before dot; 4 after)
    intercept[IllegalArgumentException](p("135596160.418"))
    intercept[IllegalArgumentException](p("1355961603.4180"))
    // absolute formats (reference default GMT == our pinned UTC)
    assert(p("2012/12/20") == 1355961600000L)
    assert(p("2012/12/20 12:42") == 1356007320000L)
    assert(p("2012/12/20-12:42") == 1356007320000L)
    assert(p("2012/12/20 12:42:42") == 1356007362000L)
    assert(p("2012/12/20-12:42:42") == 1356007362000L)
    // duration goldens (parseDuration block, incl. case-insensitivity)
    assert(TimeUtils.parseDuration("60ms") == 60L)
    assert(TimeUtils.parseDuration("60s") == 60000L)
    assert(TimeUtils.parseDuration("60S") == 60000L)
    assert(TimeUtils.parseDuration("60m") == 3600000L)
    // reference dispatches the unit on the LAST character only, so
    // the lenient "1min" = 1 month (30 d) quirk is load-bearing
    assert(TimeUtils.parseDuration("1min") == 30L * 86400000L)
    // zero/negative counts, missing unit, unknown suffix, overflow
    intercept[IllegalArgumentException](TimeUtils.parseDuration("0m"))
    intercept[IllegalArgumentException](TimeUtils.parseDuration("5"))
    intercept[IllegalArgumentException](TimeUtils.parseDuration("5j"))
    intercept[IllegalArgumentException](
      TimeUtils.parseDuration("9999999999999999y"))
  }

  test("downsample spec: fixed, fill, all, calendar") {
    val d1 = DownsampleSpec.parse("1h-sum")
    assert(d1.intervalMs == 3600000L && d1.aggregator == "sum" && d1.fill == FillPolicy.None)
    val d2 = DownsampleSpec.parse("30m-avg-zero")
    assert(d2.intervalMs == 1800000L && d2.fill == FillPolicy.Zero)
    val d3 = DownsampleSpec.parse("0all-max")
    assert(d3.intervalMs == 0L && d3.aggregator == "max")
    val d4 = DownsampleSpec.parse("1dc-min")
    assert(d4.calendar && d4.calendarUnit == "d" && d4.intervalMs == 86400000L)
    val d5 = DownsampleSpec.parse("5m-avg-nan")
    assert(d5.fill == FillPolicy.NaN)
    val d6 = DownsampleSpec.parse("1h-sum-42.5")
    assert(d6.fill == FillPolicy.Scalar(42.5))
  }

  test("reference TestDownsamplingSpecification golden vectors") {
    // ported from reference test/core/TestDownsamplingSpecification.java
    // :46-140 (string-ctor block)
    val ok = DownsampleSpec.parse("15m-avg-nan")
    assert(ok.intervalMs == 900000L && ok.aggregator == "avg" &&
      ok.fill == FillPolicy.NaN)
    // every invalid spec the reference rejects at parse time
    for (bad <- Seq(
        "blah-avg-nan",   // no interval
        "1m-hurp-nan",    // unknown function
        "10m-avg-max",    // unknown fill policy
        "1m-none-nan",    // 'none' is not a downsampler
        "0m-avg-nan",     // zero interval (only '0all' is whole-range)
        "-60m-avg-nan",   // negative interval
        "1j-avg-nan",     // unknown units
        "1-avg-nan",      // missing units
        "1m"))            // missing function
      intercept[Exception] {
        DownsampleSpec.parse(bad)
      }
  }

  test("reference TestTags parseWithMetric golden vectors") {
    // ported from reference test/core/TestTags.java:80-208, applied to
    // the m= metric segment (our Tags.parseWithMetric analog)
    def p(m: String) = QueryParser.parseSubQuery(s"sum:$m")
    val one = p("sys.cpu.user{host=web01}")
    assert(one.metric == "sys.cpu.user" &&
      one.filters == Seq(LiteralOr("host", Seq("web01"), groupBy = true)))
    val two = p("sys.cpu.user{host=web01,dc=lga}")
    assert(two.filters == Seq(
      LiteralOr("host", Seq("web01"), groupBy = true),
      LiteralOr("dc", Seq("lga"), groupBy = true)))
    assert(p("sys.cpu.user").filters.isEmpty)
    assert(p("sys.cpu.user{}").filters.isEmpty &&
      p("sys.cpu.user{}").metric == "sys.cpu.user")
    // every shape the reference rejects
    for (bad <- Seq(
        "{host=web01}",                    // null metric
        "sys.cpu.user{host=}",             // null tagv
        "sys.cpu.user{=web01}",            // null tagk
        "sys.cpu.user{host=web01,dc=}",    // null tagv, 2nd pair
        "sys.cpu.user{host=web01,=lga}",   // null tagk, 2nd pair
        "sys.cpu.user{host=web01,dc=,=root}",
        "sys.cpu.user{host=web01,=lga,owner=}",
        "sys.cpu.user{host=web01",         // missing closing curly
        "sys.cpu.user{hostweb01}",         // missing equals
        "sys.cpu.user{host=web01 dc=lga}", // missing comma (stray '=')
        "sys.cpu.user{host=web01,}",       // trailing comma
        "sys.cpu.user{,host=web01}"))      // forward comma
      intercept[Exception] { p(bad) }
  }

  test("m= sub-query grammar: agg:interval:rate:metric{filters}") {
    val q = QueryParser.parseSubQuery(
      "avg:5m-avg:rate{counter,1000,10}:proc.net.bytes{iface=eth0}")
    assert(q.aggregator == "avg")
    assert(q.downsample.get.intervalMs == 300000L)
    assert(q.rate.get.counter && q.rate.get.counterMax == 1000L
      && q.rate.get.resetValue == 10L)
    assert(q.metric == "proc.net.bytes")
    assert(q.filters == Seq(LiteralOr("iface", Seq("eth0"), groupBy = true)))
  }

  test("legacy filter sugar: *, a|b, wildcard, second brace group") {
    val q = QueryParser.parseSubQuery(
      "sum:sys.cpu.user{host=*,dc=lga|phx}{rack=regexp(r[0-9]+)}")
    assert(q.filters.contains(GroupByAll("host")))
    assert(q.filters.contains(LiteralOr("dc", Seq("lga", "phx"), groupBy = true)))
    assert(q.filters.contains(RegexpFilter("rack", "r[0-9]+", groupBy = false)))
  }

  test("filter function forms") {
    assert(QueryParser.parseFilterValue("h", "iliteral_or(Web01|WEB02)", true) ==
      LiteralOr("h", Seq("Web01", "WEB02"), caseInsensitive = true, groupBy = true))
    assert(QueryParser.parseFilterValue("h", "not_literal_or(a)", false) ==
      NotLiteralOr("h", Seq("a")))
    assert(QueryParser.parseFilterValue("h", "iwildcard(web*)", false) ==
      Wildcard("h", "web*", caseInsensitive = true))
    assert(QueryParser.parseFilterValue("h", "not_key(x)", false) == NotKey("h"))
  }

  test("rate grammar: plain, counter, dropcounter") {
    assert(QueryParser.parseRate("rate") == RateOptions())
    assert(QueryParser.parseRate("rate{counter}") ==
      RateOptions(counter = true))
    assert(QueryParser.parseRate("rate{dropcounter,100}") ==
      RateOptions(counter = true, counterMax = 100L, dropResets = true))
  }

  test("gexp nested grammar with ,, delimiter") {
    val ast = Gexp.parse("scale(sum:sys.cpu.user{host=*},,0.1)")
    ast match {
      case Gexp.FuncNode("scale", Seq(Gexp.MetricNode(m)), Seq(p)) =>
        assert(m == "sum:sys.cpu.user{host=*}" && p == "0.1")
      case other => fail(s"unexpected $other")
    }
    val nested = Gexp.parse("highestMax(absolute(sum:a{h=*}),,2)")
    nested match {
      case Gexp.FuncNode("highestMax",
        Seq(Gexp.FuncNode("absolute", Seq(Gexp.MetricNode(_)), _)), Seq("2")) =>
      case other => fail(s"unexpected $other")
    }
    // reference TestExpressions golden vectors
    // parseWithWhitespace: leading blanks tolerated
    assert(Gexp.parse("   scale(sum:sys.cpu)") ==
      Gexp.parse("scale(sum:sys.cpu)"))
    // parseMultiParameter: two sub-queries, no scalar params
    Gexp.parse("foo(sum:proc.sys.cpu,, sum:proc.meminfo.memfree)") match {
      case Gexp.FuncNode("foo",
        Seq(Gexp.MetricNode("sum:proc.sys.cpu"),
          Gexp.MetricNode("sum:proc.meminfo.memfree")), Seq()) =>
      case other => fail(s"unexpected $other")
    }
    // parseNestedExpr: metric + nested call
    Gexp.parse("foo(sum:proc.sys.cpu,, foo(sum:proc.a.b))") match {
      case Gexp.FuncNode("foo", kids, Seq()) =>
        assert(kids.toSet == Set(Gexp.MetricNode("sum:proc.sys.cpu"),
          Gexp.FuncNode("foo", Seq(Gexp.MetricNode("sum:proc.a.b")), Seq())))
      case other => fail(s"unexpected $other")
    }
    // parseExprWithParam: scalar params stay strings, in order
    Gexp.parse("foo(sum:proc.sys.cpu,, 100,, 3.1415)") match {
      case Gexp.FuncNode("foo", Seq(Gexp.MetricNode("sum:proc.sys.cpu")),
        Seq("100", "3.1415")) =>
      case other => fail(s"unexpected $other")
    }
    // parseNullExpression / parseEmptyExpression: reference error text.
    // Null/empty gates WITHOUT trimming (Expressions.java:46); a
    // whitespace-only string is non-empty there and falls through to
    // the paren check's "Invalid Expression: " error instead.
    assert(intercept[IllegalArgumentException](Gexp.parse(null))
      .getMessage.contains("Expression may not be null or empty"))
    assert(intercept[IllegalArgumentException](Gexp.parse(""))
      .getMessage.contains("Expression may not be null or empty"))
    assert(intercept[IllegalArgumentException](Gexp.parse("  "))
      .getMessage.contains("Invalid Expression:   "))
  }

  test("m= percentiles[] stage and plugin filter registration") {
    val s = QueryParser.parseSubQuery(
      "sum:1h-avg:percentiles[99,95.5]:sys.lat{host=*}")
    assert(s.percentiles == Seq(99.0, 95.5))
    assert(s.downsample.map(_.intervalMs).contains(3600000L))
    // custom filter types resolve through the registry
    QueryParser.registerFilter("ends_with",
      (k, arg, gb) => RegexpFilter(k, ".*" + java.util.regex.Pattern.quote(arg),
        groupBy = gb))
    QueryParser.parseFilterValue("host", "ends_with(01)", groupBy = false) match {
      case RegexpFilter("host", re, false) => assert(re.endsWith("\\Q01\\E"))
      case other => fail(s"unexpected $other")
    }
    intercept[IllegalArgumentException] {
      QueryParser.parseFilterValue("host", "no_such_type(x)", groupBy = false)
    }
  }

  test("parseUri filters duplicate sub queries, first occurrence order " +
       "(TestQueryRpc.executeURIDuplicates)") {
    val now = 1700000000000L
    val (q, _) = QueryParser.parseUri(
      "start=1h-ago&m=sum:sys.cpu.user&m=sum:sys.cpu.user" +
        "&m=sum:sys.cpu.user&m=max:sys.cpu.user", now)
    assert(q.queries.size == 2)
    assert(q.queries.map(_.aggregator) == Seq("sum", "max"))
  }

  test("parseUriGexp: exp= leaves become sub queries, m= coexists, " +
       "no-queries error (QueryRpc.handleQuery expressions branch)") {
    val now = 1700000000000L
    // leaves of a nested expression splice into the TSQuery
    val (q1, _, exps1) = QueryParser.parseUriGexp(
      "?start=1h-ago&exp=scale(sum:sys.cpu{host=*},,2)", now)
    assert(exps1.size == 1 && q1.queries.size == 1 &&
      q1.queries.head.metric == "sys.cpu")
    // combiner expressions contribute EVERY leaf; duplicates collapse
    val (q2, _, _) = QueryParser.parseUriGexp(
      "?start=1h-ago&exp=sumSeries(sum:a,,sum:b)" +
        "&exp=scale(sum:a,,3)", now)
    assert(q2.queries.map(_.metric) == Seq("a", "b"))
    // m= rides alongside exp= (handleQuery parses both)
    val (q3, _, exps3) = QueryParser.parseUriGexp(
      "?start=1h-ago&m=max:other&exp=absolute(sum:a)", now)
    assert(q3.queries.map(_.metric) == Seq("other", "a") &&
      exps3.size == 1)
    // neither m= nor exp= → the reference's error
    assert(intercept[IllegalArgumentException](
        QueryParser.parseUriGexp("?start=1h-ago", now))
      .getMessage.contains("Missing sub queries"))
    // an improper expression tosses up from the parser
    intercept[IllegalArgumentException](
      QueryParser.parseUriGexp("?start=1h-ago&exp=", now))
  }

  test("reference TestQueryRpc golden m= vectors parse identically") {
    // ported 1:1 from reference test/tsd/TestQueryRpc.java:102-366
    // (parseQueryMType* family): each vector is the m= component of the
    // test's URI with the reference's own assertions on the parse.
    def p(m: String) = QueryParser.parseSubQuery(m)

    // parseQueryMType
    val t1 = p("sum:sys.cpu.0")
    assert(t1.aggregator == "sum" && t1.metric == "sys.cpu.0")
    // parseQueryMTypeWRate
    assert(p("sum:rate:sys.cpu.0").rate.isDefined)
    // parseQueryMTypeWDS — downsample echoes the request text
    assert(p("sum:1h-avg:sys.cpu.0").downsample.get.echo == "1h-avg")
    // parseQueryMTypeWDSAndFill — fill suffix survives the echo. The
    // reference vector uses "1h-avg-lerp", but "lerp" is NOT a legal
    // FillPolicy even there (FillPolicy.java:22-27; TSSubQuery merely
    // stores the raw string and validateAndSetQuery would reject it) —
    // our parser fuses parse+validate, so the legal-fill form echoes
    // and the lerp form raises here instead of at validate time.
    val fill = p("sum:1h-avg-nan:sys.cpu.0").downsample.get
    assert(fill.echo == "1h-avg-nan" && fill.aggregator == "avg")
    intercept[Exception] { p("sum:1h-avg-lerp:sys.cpu.0") }
    // parseQueryMTypeWRateAndDS
    val rds = p("sum:1h-avg:rate:sys.cpu.0")
    assert(rds.rate.isDefined && rds.downsample.get.echo == "1h-avg")
    // parseQueryMTypeWTag — sugar becomes a grouping literal_or
    assert(p("sum:sys.cpu.0{host=web01}").filters ==
      Seq(LiteralOr("host", Seq("web01"), groupBy = true)))
    // parseQueryMTypeWGroupByRegex
    assert(p("sum:sys.cpu.0{host=regexp(something(foo|bar))}").filters
      .head.isInstanceOf[RegexpFilter])
    // parseQueryMTypeWGroupByWildcard{Explicit,Implicit}
    assert(p("sum:sys.cpu.0{host=wildcard(*quirm)}").filters ==
      Seq(Wildcard("host", "*quirm", groupBy = true)))
    // implicit-star shortcut is case-insensitive (TagVFilter.getFilter)
    assert(p("sum:sys.cpu.0{host=*quirm}").filters ==
      Seq(Wildcard("host", "*quirm", caseInsensitive = true, groupBy = true)))
    // parseQueryMTypeWWildcardFilter{Explicit,Implicit} — second brace
    // group is non-grouping
    assert(p("sum:sys.cpu.0{}{host=wildcard(*quirm)}").filters ==
      Seq(Wildcard("host", "*quirm", groupBy = false)))
    assert(p("sum:sys.cpu.0{}{host=*quirm}").filters ==
      Seq(Wildcard("host", "*quirm", caseInsensitive = true, groupBy = false)))
    // parseQueryMTypeWGroupByAndWildcardFilterExplicit — both groups
    val both = p("sum:sys.cpu.0{colo=lga}{host=wildcard(*quirm)}").filters
    assert(both.contains(LiteralOr("colo", Seq("lga"), groupBy = true)) &&
      both.contains(Wildcard("host", "*quirm", groupBy = false)))
    // ...SameTagK — one tagk may carry a filter in each group
    val same = p("sum:sys.cpu.0{host=quirm|tsort}{host=wildcard(*quirm)}")
    assert(same.filters.size == 2)
    // parseQueryMTypeWEmptyFilterBrackets
    assert(p("sum:sys.cpu.0{}{}").filters.isEmpty)
    // parseQueryMTypeWExplicit / +Rate / +RateAndDS / +DSAndRate —
    // explicit_tags composes with rate and downsample in either order
    val e1 = p("sum:explicit_tags:sys.cpu.0{host=web01}")
    assert(e1.explicitTags && e1.filters.nonEmpty)
    val e2 = p("sum:explicit_tags:rate:sys.cpu.0{host=web01}")
    assert(e2.explicitTags && e2.rate.isDefined)
    val e3 = p("sum:explicit_tags:rate:1m-sum:sys.cpu.0{host=web01}")
    assert(e3.explicitTags && e3.rate.isDefined &&
      e3.downsample.get.echo == "1m-sum")
    val e4 = p("sum:explicit_tags:1m-sum:rate:sys.cpu.0{host=web01}")
    assert(e4.explicitTags && e4.rate.isDefined &&
      e4.downsample.get.echo == "1m-sum")
    // parseQueryMTypePercentiles (TestQueryRpc.java:707-724)
    assert(p("sum:percentiles[0.98]:msg.end2end.latency").percentiles ==
      Seq(0.98))

    // error vectors — the reference throws IllegalArgumentException
    // parseQueryMTypeWGroupByFilterMissingClose
    intercept[IllegalArgumentException] {
      p("sum:sys.cpu.0{host=wildcard(*tsort)}{host=wildcard(*quirm)")
    }
    // parseQueryMTypeWGroupByFilterMissingEquals
    intercept[IllegalArgumentException] {
      p("sum:sys.cpu.0{host=wildcard(*tsort)}{hostwildcard(*quirm)}")
    }
    // parseQueryMTypeWGroupByNoSuchFilter
    intercept[IllegalArgumentException] {
      p("sum:sys.cpu.0{host=nosuchfilter(*tsort)}")
    }
    // parseQueryMTypeWBadFill (TestQueryRpc.java:592-596)
    intercept[Exception] { p("sum:10m-avg-badbadbad:sys.cpu.user") }
  }

  test("JSON /api/query body parsing (parseQueryV1 semantics)") {
    val now = 1700000000000L
    val q = JsonQuery.parse(
      """{"start":"1h-ago","msResolution":true,
         "queries":[
           {"aggregator":"sum","metric":"sys.cpu.user","rate":true,
            "rateOptions":{"counter":true,"counterMax":100,"resetValue":1},
            "downsample":"5m-avg","tags":{"host":"*"},
            "filters":[{"type":"literal_or","tagk":"dc",
                        "filter":"east|west","groupBy":false}],
            "explicitTags":true},
           {"aggregator":"avg","metric":"sys.lat","percentiles":[99.0,95.0]}
         ]}""", now)
    assert(q.startMs == now - 3600000L && q.endMs == now)
    assert(q.queries.size == 2)
    val s0 = q.queries(0)
    assert(s0.aggregator == "sum" && s0.metric == "sys.cpu.user")
    assert(s0.rate.contains(RateOptions(counter = true, counterMax = 100,
      resetValue = 1, dropResets = false)))
    assert(s0.downsample.map(_.intervalMs).contains(300000L))
    assert(s0.explicitTags)
    assert(s0.filters.collect { case GroupByAll(k) => k } == Seq("host"))
    assert(s0.filters.collect {
      case LiteralOr("dc", vs, false, false) => vs } == Seq(Seq("east", "west")))
    val s1 = q.queries(1)
    assert(s1.percentiles == Seq(99.0, 95.0) && s1.rate.isEmpty)
    // epoch numbers: seconds vs millis auto-detect
    val q2 = JsonQuery.parse(
      """{"start":1700000000,"end":1700000100000,
         "queries":[{"aggregator":"sum","metric":"m"}]}""", now)
    assert(q2.startMs == 1700000000000L && q2.endMs == 1700000100000L)
    // missing start / empty queries are errors
    intercept[IllegalArgumentException] {
      JsonQuery.parse("""{"queries":[{"aggregator":"sum","metric":"m"}]}""")
    }
    intercept[IllegalArgumentException] {
      JsonQuery.parse("""{"start":1,"queries":[]}""")
    }
  }

  test("reference TestTSQuery/TestTSSubQuery validation golden vectors") {
    // ported from reference test/core/TestTSQuery.java:104-160 and
    // test/core/TestTSSubQuery.java:82-124,119-124,228-233
    val now = 1357300800000L
    def bad(body: String) =
      intercept[IllegalArgumentException](JsonQuery.parse(body, now))
    def sub(fields: String) =
      s"""{"start":1356998400,"end":1356998460,"queries":[{$fields}]}"""

    // validateInvalidStart
    assert(bad("""{"start":"Not a timestamp at all",
      "queries":[{"aggregator":"sum","metric":"m"}]}""") != null)
    // validateNullEnd / validateEmptyEnd: end defaults to now
    assert(JsonQuery.parse(
      """{"start":1356998400,"queries":[{"aggregator":"sum","metric":"m"}]}""",
      now).endMs == now)
    // validateEmptyAgg / validateNullAgg → "Missing the aggregation function"
    assert(bad(sub(""""aggregator":"","metric":"m""""))
      .getMessage.contains("Missing the aggregation function"))
    assert(bad(sub(""""metric":"m""""))
      .getMessage.contains("Missing the aggregation function"))
    // validateBadAgg → "No such aggregation function"
    assert(bad(sub(""""aggregator":"Notanagg","metric":"m""""))
      .getMessage.contains("No such aggregation function"))
    // validateNoMetricOrTsuids / NoMetricOrEmptyTsuids
    assert(bad(sub(""""aggregator":"sum""""))
      .getMessage.contains("Missing the metric or tsuids"))
    assert(bad(sub(""""aggregator":"sum","metric":"","tsuids":[]"""))
      .getMessage.contains("Missing the metric or tsuids"))
    // validateBadDS and validateWithDownsampleNone (1m-none is an error:
    // "cannot use the NONE aggregator for downsampling")
    assert(bad(sub(
      """"aggregator":"sum","metric":"m","downsample":"bad"""")) != null)
    assert(bad(sub(
      """"aggregator":"sum","metric":"m","downsample":"1m-none"""")) != null)
    // validate(): the happy path sets times and parses the downsampler
    val ok = JsonQuery.parse(
      """{"start":1356998400,"end":1356998460,"queries":[
        {"aggregator":"sum","metric":"sys.cpu.0",
         "downsample":"5m-avg",
         "tags":{"host":"*","dc":"lga"}}]}""", now)
    assert(ok.startMs == 1356998400000L && ok.endMs == 1356998460000L)
    val s = ok.queries.head
    assert(s.metric == "sys.cpu.0" && s.aggregator == "sum")
    assert(s.downsample.map(_.intervalMs).contains(300000L) &&
      s.downsample.map(_.aggregator).contains("avg"))
    assert(s.filters.collect { case GroupByAll(k) => k } == Seq("host"))
    assert(s.filters.collect {
      case LiteralOr("dc", vs, false, _) => vs } == Seq(Seq("lga")))
    // end == start is allowed (reference: "greater than OR EQUAL")
    assert(JsonQuery.parse(
      """{"start":1356998400,"end":1356998400,
         "queries":[{"aggregator":"sum","metric":"m"}]}""", now)
      .endMs == 1356998400000L)
    // validateWithTimezone: useCalendar flips a present downsampler to
    // calendar alignment in the query timezone
    val cal = JsonQuery.parse(
      """{"start":1356998400,"end":1356998460,
         "timezone":"Pacific/Funafuti","useCalendar":true,
         "queries":[{"aggregator":"sum","metric":"sys.cpu.0",
                     "downsample":"5m-avg"}]}""", now)
    assert(cal.timezone == "Pacific/Funafuti")
    val cd = cal.queries.head.downsample.get
    assert(cd.calendar && cd.calendarUnit == "m" && cd.intervalMs == 300000L)
    // validateVerifyNoDSOverrideWithCalendar: no downsampler → untouched
    val noDs = JsonQuery.parse(
      """{"start":1356998400,"end":1356998460,
         "timezone":"Pacific/Funafuti","useCalendar":true,
         "queries":[{"aggregator":"sum","metric":"sys.cpu.0"}]}""", now)
    assert(noDs.queries.head.downsample.isEmpty)
    // unknown timezone driving a downsampler is a request error
    assert(bad(
      """{"start":1356998400,"end":1356998460,
         "timezone":"Not/AZone","useCalendar":true,
         "queries":[{"aggregator":"sum","metric":"m",
                     "downsample":"1h-avg"}]}""")
      .getMessage.contains("timezone specification"))
    // ...and WITHOUT useCalendar too (reference validateAndSetQuery
    // checks the tz whenever a downsampler is present)
    assert(bad(
      """{"start":1356998400,"end":1356998460,
         "timezone":"Not/AZone",
         "queries":[{"aggregator":"sum","metric":"m",
                     "downsample":"1h-avg"}]}""")
      .getMessage.contains("timezone specification"))
    // three-letter java.util.TimeZone ids like EST are accepted (the
    // reference's DateTime.timezones map covers all available ids)
    assert(JsonQuery.parse(
      """{"start":1356998400,"end":1356998460,
         "timezone":"EST",
         "queries":[{"aggregator":"sum","metric":"m",
                     "downsample":"1h-avg"}]}""", now).timezone == "EST")
    // useCalendar on an ALREADY-calendar spec is a no-op: the parsed
    // unit survives ('1hc' must stay 'h', not become the garbage 'hc')
    val pre = JsonQuery.parse(
      """{"start":1356998400,"end":1356998460,"useCalendar":true,
         "queries":[{"aggregator":"sum","metric":"m",
                     "downsample":"1hc-avg"}]}""", now)
      .queries.head.downsample.get
    assert(pre.calendar && pre.calendarUnit == "h")
    // ms intervals keep their real unit instead of collapsing to DAY
    val msu = JsonQuery.parse(
      """{"start":1356998400,"end":1356998460,"useCalendar":true,
         "queries":[{"aggregator":"sum","metric":"m",
                     "downsample":"500ms-avg"}]}""", now)
      .queries.head.downsample.get
    assert(msu.calendar && msu.calendarUnit == "ms" && msu.intervalMs == 500L)
    // the reference's lenient '1min' = 1 month quirk flows through
    val minu = JsonQuery.parse(
      """{"start":1356998400,"end":1356998460,"useCalendar":true,
         "queries":[{"aggregator":"sum","metric":"m",
                     "downsample":"1min-sum"}]}""", now)
      .queries.head.downsample.get
    assert(minu.calendar && minu.calendarUnit == "min" &&
      minu.intervalMs == 30L * 86400000L)
  }

  test("GET /api/query query-string form parses queries and flags") {
    import graft.query.QueryParser
    val now = 1700000000000L
    def bad(f: => Any) = intercept[IllegalArgumentException](f)
    val (q, flags) = QueryParser.parseUri(
      "?start=1h-ago&m=sum:1m-avg:sys.cpu%7Bhost=web01%7D" +
        "&m=max:other&ms&show_tsuids&global_annotations", now)
    assert(q.startMs == now - 3600000L && q.endMs == now)
    assert(q.msResolution && flags.showTsuids && flags.globalAnnotations)
    assert(!flags.showQuery && !flags.padding)
    assert(q.queries.map(_.aggregator) == Seq("sum", "max"))
    assert(q.queries.head.downsample.get.intervalMs == 60000L)
    assert(q.queries.head.metric == "sys.cpu")
    // tsuid= sub-queries: agg:[interval-agg:][rate:]tsuid[,s]
    val (q2, _) = QueryParser.parseUri(
      "start=1356998400&tsuid=sum:1h-avg:rate:00A1,00B2", now)
    val sub = q2.queries.head
    assert(sub.metric.isEmpty && sub.tsuids == Seq("00A1", "00B2"))
    assert(sub.rate.isDefined &&
      sub.downsample.get.intervalMs == 3600000L)
    // reference errors: missing start, no sub-queries, bad part counts
    assert(bad(QueryParser.parseUri("m=sum:x", now))
      .getMessage.contains("Missing parameter <start>"))
    assert(bad(QueryParser.parseUri("start=1h-ago", now))
      .getMessage.contains("Missing sub queries"))
    assert(bad(QueryParser.parseUri("start=1h-ago&tsuid=sum", now))
      .getMessage.contains("not enough"))
    assert(bad(QueryParser.parseUri(
      "start=1h-ago&tsuid=sum:a:b:c:d:00A1", now))
      .getMessage.contains("too many"))
  }

  test("/api/query/exp POJO body: parse, compile, validate") {
    val now = 1700000000000L
    val q = ExpJsonQuery.parse(
      """{"time":{"start":"1h-ago","aggregator":"sum","rate":false,
           "downsampler":{"interval":"5m","aggregator":"avg",
                          "fillPolicy":{"policy":"zero"}}},
         "filters":[{"id":"f1","explicitTags":true,
           "tags":[{"type":"wildcard","tagk":"host","filter":"web*",
                    "groupBy":true}]}],
         "metrics":[
           {"id":"a","metric":"sys.cpu.user","filter":"f1",
            "fillPolicy":{"policy":"nan"}},
           {"id":"b","metric":"sys.cpu.sys","aggregator":"max",
            "fillPolicy":{"policy":"scalar","value":7}}],
         "expressions":[
           {"id":"e","expr":"a + b","join":{"operator":"intersection"}},
           {"id":"e2","expr":"e * 2"}],
         "outputs":[{"id":"e2","alias":"doubled"}]}""", now)
    assert(q.startMs == now - 3600000L && q.endMs == now)
    val subA = q.subQuery(q.metrics(0))
    // timespan downsampler + aggregator flow into every sub-query
    assert(subA.aggregator == "sum" && subA.metric == "sys.cpu.user")
    assert(subA.downsample.map(_.intervalMs).contains(300000L))
    assert(subA.downsample.map(_.fill).contains(FillPolicy.Zero))
    assert(subA.explicitTags && subA.filters.nonEmpty)
    // per-metric aggregator override; no filter ref → no filters
    val subB = q.subQuery(q.metrics(1))
    assert(subB.aggregator == "max" && subB.filters.isEmpty)
    assert(q.metricFills("b") == 7.0 && q.metricFills("a").isNaN)
    // join defaults to UNION when absent (Query.validate)
    assert(q.expressions(1).join.operator == "union")
    assert(q.outputs == Seq(ExpJsonQuery.OutputDef("e2", Some("doubled"))))

    def bad(body: String) =
      intercept[IllegalArgumentException](ExpJsonQuery.parse(body, now))
    val base = """"time":{"start":1,"aggregator":"sum"}"""
    // duplicate metric id
    assert(bad(s"""{$base,"metrics":[
        {"id":"a","metric":"m"},{"id":"a","metric":"n"}]}""")
      .getMessage.contains("duplicated"))
    // expression id shadowing a metric id — the combined variable
    // namespace uses the reference's capital-D text (Query.java:138)
    assert(bad(s"""{$base,"metrics":[{"id":"a","metric":"m"}],
        "expressions":[{"id":"a","expr":"a + 1"}]}""")
      .getMessage.contains("Duplicated variable or expression id"))
    // forward references between expressions are LEGAL (the executor
    // compiles a dependency DAG — round 10, TestQueryExecutor
    // .nestedExpressionsTwoLevelsDefaultOutputOrdering); an
    // unresolvable variable is the executor's error, not the parser's
    val fwd = ExpJsonQuery.parse(s"""{$base,"metrics":[
        {"id":"a","metric":"m"}],
        "expressions":[{"id":"e","expr":"e2 + 1"},
                       {"id":"e2","expr":"a + 1"}]}""", now)
    assert(fwd.expressions.map(_.id) == Seq("e", "e2"))
    // unrecognized filter reference
    assert(bad(s"""{$base,"metrics":[
        {"id":"a","metric":"m","filter":"nope"}]}""")
      .getMessage.contains("unrecognized filter"))
    // illegal id characters / integer id
    assert(bad(s"""{$base,"metrics":[{"id":"a-b","metric":"m"}]}""")
      .getMessage.contains("illegal character"))
    assert(bad(s"""{$base,"metrics":[{"id":"7","metric":"m"}]}""")
      .getMessage.contains("integer"))
    // metrics are required
    assert(bad(s"""{$base}""").getMessage.contains("metrics"))
    // unsupported set operator
    assert(bad(s"""{$base,"metrics":[{"id":"a","metric":"m"}],
        "expressions":[{"id":"e","expr":"a + 1",
          "join":{"operator":"cross"}}]}""")
      .getMessage.contains("unsupported join operator"))
  }

  test("rollup config file: interval validation and the id dictionary " +
       "(reference TestRollupInterval/TestRollupConfig)") {
    import graft.operators.Rollups
    import graft.operators.Rollups.{RollupIntervalDef => I}
    def bad(f: => Any): String =
      intercept[IllegalArgumentException](f).getMessage
    // ctor vectors: spans h/d/n(month=32d)/y(366d), interval counts
    assert(I("1s", "t", "t", "1h").intervalsPerSpan == 3600)
    assert(I("10m", "t", "t", "1d").intervalsPerSpan == 144)
    assert(I("1h", "t", "t", "1n").intervalsPerSpan == 768)
    assert(I("1d", "t", "t", "1y").intervalsPerSpan == 366)
    // 'h' multipliers allowed when even (ctor7SecondHourTwoHoursDelay)
    assert(I("7s", "t", "t", "2h", delaySla = "2h").delayMs == 7200000L)
    // validation errors, reference messages verbatim incl. the typo
    assert(bad(I("1s", "", "t", "1h")) ==
      "The rollup table cannot be null or empty")
    assert(bad(I("1s", "t", "", "1h")) ==
      "The pre-aggregate rollup table cannot be null or empty")
    assert(bad(I("1s", "t", "t", "1ms")) == "Milliseconds are not supported")
    assert(bad(I("1s", "t", "t", "1q")).startsWith("Unrecogznied span"))
    assert(bad(I("1m", "t", "t", "2d")) ==
      "Multipliers are only usable with the 'h' unit")
    assert(bad(I("1m", "t", "t", "3h")) ==
      "The multiplier must be 1 or an even value")
    assert(bad(I("2h", "t", "t", "1h")).contains("is too large for the span"))
    assert(bad(I("1s", "t", "t", "1y")).startsWith("Too many intervals"))
    assert(bad(I("30m", "t", "t", "1h")).startsWith("Not enough intervals"))
    assert(bad(I("1s", "t", "t", "1h", delaySla = "500ms")) ==
      "Milliseconds are not supported as the maximum delay")

    // TestRollupQuery: the delay-SLA blackout (RollupQuery
    // .getLastRollupTimestampSeconds/isInBlackoutPeriod:196-210) — a
    // 1h interval with delaySla 2d has its freshness horizon exactly
    // now − 2d; a point 1h ago is in the blackout (raw-served), one
    // 3d ago is rollup-served. Our split uses horizonMs = now − delayMs
    // with ts > horizon = blackout, the identical predicate.
    locally {
      val MOCK = 1420147200000L
      val withDelay = I("1h", "fake-rollup-table", "fake-preagg-table",
        "1d", delaySla = "2d")
      val horizon = MOCK - withDelay.delayMs
      assert(horizon / 1000 == MOCK / 1000 - 2 * 86400)
      assert(MOCK - 3600000L > horizon)              // 1h ago: blackout
      assert(!(MOCK - 3L * 86400000L > horizon))     // 3d ago: rollup
    }

    // config-level rules
    val tenmin = I("10m", "tsdb-10m", "tsdb-agg-10m", "1d")
    val oneh = I("1h", "tsdb-1h", "tsdb-agg-1h", "1n", delaySla = "2h")
    val raw = I("1m", "tsdb", "tsdb", "1h", defaultInterval = true)
    val cfg = Rollups.RollupConfigDef(Seq(raw, tenmin, oneh),
      Map("sum" -> 0, "max" -> 1))
    assert(cfg.forInterval("10m") eq tenmin)
    assert(cfg.forTable("tsdb-agg-1h") eq oneh)
    assert(intercept[NoSuchElementException](cfg.forInterval("5m"))
      .getMessage.contains("No rollup interval"))
    assert(bad(Rollups.RollupConfigDef(Seq.empty, Map("sum" -> 0))) ==
      "Rollup config given but no intervals were found.")
    assert(bad(Rollups.RollupConfigDef(Seq(raw), Map.empty)) ==
      "Rollup config given but no aggegation ID mappings found.")
    assert(bad(Rollups.RollupConfigDef(Seq(tenmin, tenmin.copy()),
      Map("sum" -> 0))).startsWith("Only one interval of each type"))
    assert(bad(Rollups.RollupConfigDef(
      Seq(raw, tenmin.copy(defaultInterval = true)), Map("sum" -> 0)))
      .startsWith("Multiple default intervals"))
    assert(bad(Rollups.RollupConfigDef(Seq(raw), Map("sum" -> 128)))
      .startsWith("ID for aggregator must be between 0 and 127"))
    assert(bad(Rollups.RollupConfigDef(Seq(raw),
      Map("sum" -> 0, "max" -> 0)))
      .contains("Multiple mappings for the ID '0'"))
    assert(bad(Rollups.RollupConfigDef(Seq(raw), Map("bogus" -> 0))) ==
      "No such aggregator found for bogus")

    // serdes: the tsd.rollups.config JSON document round-trips
    val parsed = Rollups.parseConfig("""{
      "intervals": [
        {"interval":"1m","table":"tsdb","preAggregationTable":"tsdb",
         "rowSpan":"1h","defaultInterval":true},
        {"interval":"10m","table":"tsdb-10m",
         "preAggregationTable":"tsdb-agg-10m","rowSpan":"1d"},
        {"interval":"1h","table":"tsdb-1h",
         "preAggregationTable":"tsdb-agg-1h","rowSpan":"1n",
         "delaySla":"2h"}],
      "aggregationIds": {"sum":0,"max":1}}""")
    assert(parsed.intervals.size == 3)
    assert(parsed.aggregationIds == Map("sum" -> 0, "max" -> 1))
    assert(parsed.forInterval("1h").delayMs == 7200000L)

    // bridge to the engine registry: non-default intervals become
    // RollupTables; delaySla sets the freshness horizon
    val now = 1700000000000L
    // resolve is the deployment's table loader; identity of the frame
    // is irrelevant to the registry contract under test
    val tabs = Rollups.registryTables(parsed, _ => null, now)
    assert(tabs.map(_.intervalMs) == Seq(600000L, 3600000L))
    assert(tabs(0).horizonMs == Long.MaxValue)
    assert(tabs(1).horizonMs == now - 7200000L)
  }

  test("NumericFillPolicy.validate vectors (reference " +
       "TestNumericFillPolicy.java)") {
    // fillPolicy parse through the POJO body: missing policy is
    // INFERRED from the value, a present policy must gel with it
    // (NumericFillPolicy.validate,
    // /root/reference/src/query/expression/NumericFillPolicy.java:140-175)
    val now = 1700000000000L
    def fillOf(fp: String): Double =
      ExpJsonQuery.parse(s"""{"time":{"start":1,"aggregator":"sum"},
        "metrics":[{"id":"a","metric":"m","fillPolicy":$fp}],
        "expressions":[{"id":"e","expr":"a + 1"}]}""", now)
        .metricFills("a")
    // inference from value alone
    assert(fillOf("""{"value":42}""") == 42.0)        // → SCALAR
    assert(fillOf("""{"value":42.5}""") == 42.5)
    assert(fillOf("""{"value":-42.5}""") == -42.5)
    assert(fillOf("""{"value":0}""") == 0.0)          // → ZERO
    assert(fillOf("""{"value":"NaN"}""").isNaN)       // → NOT_A_NUMBER
    assert(fillOf("""{}""") == 0.0)                   // builder default
    // policy normalizes the value
    assert(fillOf("""{"policy":"nan"}""").isNaN)
    assert(fillOf("""{"policy":"nan","value":"NaN"}""").isNaN)
    assert(fillOf("""{"policy":"none"}""").isNaN)
    assert(fillOf("""{"policy":"null","value":0}""").isNaN)
    assert(fillOf("""{"policy":"zero","value":0}""") == 0.0)
    assert(fillOf("""{"policy":"scalar"}""") == 0.0)  // scalar CAN be 0
    assert(fillOf("""{"policy":"scalar","value":"NaN"}""").isNaN)
    assert(fillOf("""{"policy":"scalar","value":42}""") == 42.0)
    // inappropriate combos throw with the reference's messages
    def badFill(fp: String): String =
      intercept[IllegalArgumentException](fillOf(fp)).getMessage
    assert(badFill("""{"policy":"zero","value":42}""")
      .contains("The value for ZERO must be 0"))
    assert(badFill("""{"policy":"none","value":42}""")
      .contains("The value for NONE and NAN must be NaN"))
    assert(badFill("""{"policy":"nan","value":42}""")
      .contains("The value for NONE and NAN must be NaN"))
    assert(badFill("""{"policy":"null","value":42}""")
      .contains("The value for NULL must be 0"))
    assert(badFill("""{"policy":"bogus"}""")
      .contains("unsupported fill policy"))
  }

  test("reference TestHttpJsonSerializer golden vectors (suggest/rename serdes)") {
    // ported 1:1 from reference test/tsd/TestHttpJsonSerializer.java:
    // parseSuggestV1 (:133-164), parseUidRenameV1 (:167-196),
    // formatSuggestV1[+JSONP] (:198-220), formatUidRenameV1 (:229-252)
    def bad(f: => Any) = intercept[IllegalArgumentException](f)

    // parseSuggestV1: valid body → string map with type preserved
    val sug = Serdes.parseSuggest("""{"type":"metrics","q":""}""")
    assert(sug("type") == "metrics" && sug("q") == "")
    // numeric scalars coerce to strings (Jackson HashMap<String,String>)
    assert(Serdes.parseSuggest(
      """{"type":"metrics","q":"sys","max":25}""")("max") == "25")
    // parseSuggestV1NoContent / EmptyContent → missing-content error
    assert(bad(Serdes.parseSuggest(null))
      .getMessage.contains("Missing message content"))
    assert(bad(Serdes.parseSuggest(""))
      .getMessage.contains("Missing message content"))
    // parseSuggestV1NotJSON → parse error
    assert(bad(Serdes.parseSuggest("This is unparsable"))
      .getMessage.contains("Unable to parse the given JSON"))
    // nested object/array values fail the HashMap<String,String>
    // binding in the reference — same error, never a silent ""
    assert(bad(Serdes.parseSuggest("""{"type":{"x":1}}"""))
      .getMessage.contains("Unable to parse the given JSON"))
    assert(bad(Serdes.parseSuggest("""{"type":["metrics"]}"""))
      .getMessage.contains("Unable to parse the given JSON"))

    // parseUidRenameV1 family — same contract
    val ren = Serdes.parseUidRename(
      """{"metric":"sys.cpu.1","name":"sys.cpu.2"}""")
    assert(ren("metric") == "sys.cpu.1" && ren("name") == "sys.cpu.2")
    assert(bad(Serdes.parseUidRename(null))
      .getMessage.contains("Missing message content"))
    assert(bad(Serdes.parseUidRename(""))
      .getMessage.contains("Missing message content"))
    assert(bad(Serdes.parseUidRename("NOT JSON"))
      .getMessage.contains("Unable to parse the given JSON"))

    // formatSuggestV1: bare JSON array; JSONP wraps as func(...)
    assert(Serdes.formatSuggest(Seq("sys.cpu.0.system"))
      == "[\"sys.cpu.0.system\"]")
    assert(Serdes.formatSuggest(Seq("sys.cpu.0.system"), Some("func"))
      == "func([\"sys.cpu.0.system\"])")
    assert(Serdes.formatSuggest(Nil) == "[]")

    // formatUidRenameV1Success / Failed
    assert(Serdes.formatUidRename(None) == "{\"result\":\"true\"}")
    val failed = Serdes.formatUidRename(Some("known"))
    assert(failed.contains("\"error\":\"known\"")
      && failed.contains("\"result\":\"false\""))
  }

  test("config/filters lists the eight built-ins plus registered plugin metas") {
    val base = QueryParser.loadedFilters()
    assert(base.map(_._1).toSet.intersect(Set("literal_or", "iliteral_or",
      "not_literal_or", "not_iliteral_or", "wildcard", "iwildcard",
      "regexp", "not_key")).size == 8)
    // every built-in carries non-empty description AND examples
    base.filter(f => Set("literal_or", "regexp", "not_key").contains(f._1))
      .foreach { case (_, d, e) => assert(d.nonEmpty && e.nonEmpty) }
    QueryParser.registerFilter("spec_meta_filter",
      (k, v, g) => LiteralOr(k, Seq(v), groupBy = g),
      description = "test filter", examples = "host=spec_meta_filter(x)")
    val withPlugin = QueryParser.loadedFilters()
      .find(_._1 == "spec_meta_filter")
    assert(withPlugin.contains(("spec_meta_filter", "test filter",
      "host=spec_meta_filter(x)")))
  }

  test("StartupPlugin: config rewrite before init, reference error contract") {
    import graft.meta.StartupPlugins
    StartupPlugins.reset()
    val cfg = Map("tsd.startup.enable" -> "true",
      "tsd.startup.plugin" -> "my.Startup", "tsd.mode" -> "rw")
    // missing plugin aborts startup with the reference's text
    // (TSDMain.loadStartupPlugins:263-265)
    assert(intercept[IllegalArgumentException](
        StartupPlugins.applyStartup(cfg)).getMessage
      == "Unable to locate startup plugin: my.Startup")
    // disabled → untouched passthrough, no plugin lookup at all
    assert(StartupPlugins.applyStartup(cfg - "tsd.startup.enable") ==
      cfg - "tsd.startup.enable")
    // registered: initialize rewrites the config the engine will see
    var ready = 0
    StartupPlugins.register("my.Startup", StartupPlugins.Plugin(
      initialize = c => c + ("tsd.mode" -> "ro"),
      setReady = () => ready += 1))
    val rewritten = StartupPlugins.applyStartup(cfg)
    assert(rewritten("tsd.mode") == "ro")
    assert(graft.meta.RpcModes.parse(rewritten("tsd.mode"))
      == graft.meta.RpcModes.ReadOnly)
    // setReady fires only once serving (TSDMain:225-227)
    assert(ready == 0)
    StartupPlugins.setReady(rewritten)
    assert(ready == 1)
    // initialize failures wrap as the reference's RuntimeException
    StartupPlugins.register("my.Startup", StartupPlugins.Plugin(
      initialize = _ => throw new IllegalArgumentException("bad key")))
    assert(intercept[RuntimeException](StartupPlugins.applyStartup(cfg))
      .getMessage == "Failed to initialize startup plugin")
    StartupPlugins.reset()
  }

  test("HttpRpcPlugin: path validation, canonicalization, mode-agnostic mount") {
    import graft.meta.{HttpRpcPlugins, RpcModes}
    HttpRpcPlugins.reset()
    def bad(p: String): String =
      intercept[IllegalArgumentException](HttpRpcPlugins.validatePath(p))
        .getMessage
    // validateHttpRpcPluginPath:398-416 precondition set
    assert(bad("").contains("Path is null or empty"))
    assert(bad("/plugin/mine").contains("system's plugin base path"))
    assert(bad("plugin/mine").contains("system's plugin base path"))
    assert(bad("/").contains("equal to root"))
    assert(bad("/mine?x=1").contains("query parameters"))
    // canonicalizePluginPath:424-436 + the class-doc mount examples
    assert(HttpRpcPlugins.mount("/myAwesomePlugin", (s, _) => null)
      == "myAwesomePlugin")
    assert(HttpRpcPlugins.mount("/myOtherPlugin/operation/", (s, _) => null)
      == "myOtherPlugin/operation")
    // isHttpRpcPluginPath:230-244
    assert(HttpRpcPlugins.isPluginPath("/plugin/myAwesomePlugin"))
    assert(HttpRpcPlugins.isPluginPath("plugin/myAwesomePlugin/"))
    assert(HttpRpcPlugins.isPluginPath("/plugin/x?y=1"))
    assert(!HttpRpcPlugins.isPluginPath("/plugin"))
    assert(!HttpRpcPlugins.isPluginPath("/api/query"))
    assert(!HttpRpcPlugins.isPluginPath(""))
    // mounted rows join the routing table in EVERY mode, like the
    // reference's registration (q92's transcription surface extends)
    for (m <- Seq(RpcModes.ReadOnly, RpcModes.WriteOnly, RpcModes.ReadWrite)) {
      val cmds = RpcModes.commands(m).toSet
      assert(cmds.contains("http" -> "plugin/myAwesomePlugin"), m.name)
      assert(cmds.contains("http" -> "plugin/myOtherPlugin/operation"), m.name)
    }
    HttpRpcPlugins.reset()
    assert(!RpcModes.commands(RpcModes.ReadWrite)
      .exists(_._2.startsWith("plugin/")))
  }

  test("tsd.mode parse: ro/wo case-insensitive, anything else is rw") {
    import graft.meta.RpcModes
    assert(RpcModes.parse("ro") == RpcModes.ReadOnly)
    assert(RpcModes.parse("RO") == RpcModes.ReadOnly)
    assert(RpcModes.parse("wo") == RpcModes.WriteOnly)
    assert(RpcModes.parse("rw") == RpcModes.ReadWrite)
    // the reference does NOT error on unknown/empty mode strings
    assert(RpcModes.parse("bogus") == RpcModes.ReadWrite)
    assert(RpcModes.parse("") == RpcModes.ReadWrite)
    assert(RpcModes.parse(null) == RpcModes.ReadWrite)
  }

  test("RPC command table honors the api/ui/diediedie switches") {
    import graft.meta.RpcModes
    val rw = RpcModes.commands(RpcModes.ReadWrite).toSet
    assert(rw.contains("telnet" -> "put") && rw.contains("http" -> "api/query"))
    // ro drops the write sinks but keeps the read surface + uid
    val ro = RpcModes.commands(RpcModes.ReadOnly).toSet
    assert(!ro.contains("telnet" -> "put") && !ro.contains("http" -> "api/put"))
    assert(ro.contains("http" -> "api/query") && ro.contains("http" -> "api/uid"))
    // wo drops the query surface and the UI pages entirely
    val wo = RpcModes.commands(RpcModes.WriteOnly).toSet
    assert(!wo.contains("http" -> "api/query") && !wo.contains("http" -> "q"))
    assert(wo.contains("telnet" -> "put") && wo.contains("http" -> "api/tree"))
    // switches: no api → no api/* rows; no ui → no legacy http rows;
    // no_diediedie=true removes the shutdown command everywhere
    val noApi = RpcModes.commands(RpcModes.ReadWrite, enableApi = false)
    assert(!noApi.exists(_._2.startsWith("api/")))
    val noUi = RpcModes.commands(RpcModes.ReadWrite, enableUi = false).toSet
    assert(!noUi.contains("http" -> "q") && !noUi.contains("http" -> "logs")
      && noUi.contains("http" -> "api/query"))
    val noDie = RpcModes.commands(RpcModes.ReadWrite, noDieDieDie = true)
    assert(!noDie.exists(_._2 == "diediedie"))
  }

  test("/api/uid endpoint gates match the reference's mode × verb matrix") {
    import graft.meta.RpcModes
    def err(f: => Unit): String =
      intercept[IllegalArgumentException](f).getMessage
    // assign/rename: write verbs
    RpcModes.requireUidAllowed("assign", "POST", RpcModes.ReadWrite)
    RpcModes.requireUidAllowed("rename", "POST", RpcModes.WriteOnly)
    assert(err(RpcModes.requireUidAllowed("assign", "GET", RpcModes.ReadOnly))
      == "This operation is not allowed in ro mode.")
    // assign/rename only accept GET/POST (RpcUtil.allowedMethods via
    // UniqueIdRpc:102/:530); DELETE in a write mode 405s, but the mode
    // gate still fires first in ro mode
    assert(err(RpcModes.requireUidAllowed("assign", "DELETE", RpcModes.ReadWrite))
      == "The HTTP method [DELETE] is not permitted for this endpoint")
    assert(err(RpcModes.requireUidAllowed("rename", "PUT", RpcModes.WriteOnly))
      == "The HTTP method [PUT] is not permitted for this endpoint")
    assert(err(RpcModes.requireUidAllowed("assign", "DELETE", RpcModes.ReadOnly))
      == "This operation is not allowed in ro mode.")
    RpcModes.requireUidAllowed("assign", "GET", RpcModes.ReadWrite)
    // uidmeta/tsmeta: GET needs read, POST/PUT/DELETE need write
    RpcModes.requireUidAllowed("uidmeta", "GET", RpcModes.ReadOnly)
    RpcModes.requireUidAllowed("tsmeta", "DELETE", RpcModes.WriteOnly)
    assert(err(RpcModes.requireUidAllowed("uidmeta", "GET", RpcModes.WriteOnly))
      == "This operation is not allowed in wo mode.")
    assert(err(RpcModes.requireUidAllowed("tsmeta", "PUT", RpcModes.ReadOnly))
      == "This operation is not allowed in ro mode.")
    assert(err(RpcModes.requireUidAllowed("uidmeta", "HEAD", RpcModes.ReadWrite))
      .contains("not permitted"))
    assert(err(RpcModes.requireUidAllowed("other", "GET", RpcModes.ReadWrite))
      .contains("have not been implemented"))
  }

  // ---- /api/query/exp POJO validation vectors (reference
  // test/query/pojo/TestQuery/TestMetric/TestFilter/TestExpression/
  // TestTimeSpan/TestJoin/TestDownsampler/TestOutput) ----------------

  test("exp POJO validation: Query/Timespan/Metric/Filter/Expression/" +
       "Join/Downsampler vectors with verbatim error texts") {
    import graft.query.ExpJsonQuery
    val NOW = 1431600000000L
    def err(body: String): String =
      intercept[IllegalArgumentException](
        ExpJsonQuery.parse(body, NOW)).getMessage
    def body(time: String =
               """{"start":"3h-ago","end":"1h-ago","aggregator":"avg"}""",
             filters: String = """[{"id":"f1","tags":[{"tagk":"host",
               "filter":"*","type":"iwildcard","groupBy":false}]}]""",
             metrics: String = """[{"metric":"YAMAS.cpu.idle","id":"m1",
               "filter":"f1","aggregator":"sum"}]""",
             exprs: String = """[{"id":"e1","expr":"m1 * 1024"}]""",
             outs: String = """[{"id":"m1","alias":"CPU Idle EAST DC"}]""")
        : String =
      s"""{"time":$time,"filters":$filters,"metrics":$metrics,
          "expressions":$exprs,"outputs":$outs}"""
    // deserialize: the TestQuery fixture body parses clean
    val q = ExpJsonQuery.parse(body(), NOW)
    assert(q.metrics.map(_.id) == Seq("m1") &&
      q.expressions.map(_.id) == Seq("e1") &&
      q.outputs.map(_.id) == Seq("m1"))
    // justMetrics: metrics-only is legal (outputs default to metrics
    // in the executor, QueryExecutor.serialize:499-517)
    ExpJsonQuery.parse(body(exprs = "[]", outs = "[]"), NOW)
    // validationErrorWhenTimeIsNull / invalidTime
    assert(err(body(time = "null")) == "missing time")
    assert(err(body(time = "{}")) == "missing or empty start")
    // TestTimeSpan: start null/empty, aggregator missing/empty, both
    // with the reference's case split; end empty is LEGAL (defaults)
    assert(err(body(time = """{"start":"","aggregator":"avg"}"""))
      == "missing or empty start")
    assert(err(body(time = """{"start":"3h-ago"}"""))
      == "Missing or empty aggregator")
    assert(err(body(time = """{"start":"3h-ago","aggregator":""}"""))
      == "Missing or empty aggregator")
    assert(err(body(time = """{"start":"3h-ago","aggregator":"nosuch"}"""))
      == "Invalid aggregator")
    ExpJsonQuery.parse(body(
      time = """{"start":"3h-ago","end":"","aggregator":"AVG"}"""), NOW)
    // metricsIsNull / metricsIsEmpty / invalidMetric / Invalid aggregator
    assert(err(body(metrics = "null")) == "missing or empty metrics")
    assert(err(body(metrics = "[]")) == "missing or empty metrics")
    assert(err(body(metrics = "[{}]")) == "missing or empty metric")
    assert(err(body(metrics = """[{"metric":"x"}]"""))
      == "missing or empty id")
    assert(err(body(metrics = """[{"metric":"x","id":"m1",
      "aggregator":"nosuch"}]""")) == "Invalid aggregator")
    // invalidFilter / duplicatedFilterId / noSuchFilterIdInMetric
    assert(err(body(filters = "[{}]")) == "Missing or empty id")
    assert(err(body(filters = """[{"id":"f1"},{"id":"f1"}]"""))
      == "duplicated filter id: f1")
    assert(err(body(metrics = """[{"metric":"x","id":"m2",
      "filter":"f2"}]""", exprs = "[]", outs = "[]"))
      == "unrecognized filter id f2 in metric m2")
    // duplicatedMetricId / duplicatedExpressionId (capital D on the
    // combined variable namespace, Query.java:138)
    assert(err(body(metrics = """[{"metric":"x","id":"m1"},
      {"metric":"y","id":"m1"}]""")) == "duplicated metric id: m1")
    assert(err(body(exprs = """[{"id":"e1","expr":"m1"},
      {"id":"e1","expr":"m1 + 1"}]"""))
      == "Duplicated variable or expression id: e1")
    assert(err(body(exprs = """[{"id":"m1","expr":"m1 + 1"}]"""))
      == "Duplicated variable or expression id: m1")
    // invalidExpression: missing id / missing expr
    assert(err(body(exprs = "[{}]")) == "missing or empty id")
    assert(err(body(exprs = """[{"id":"e1"}]""")) == "missing or empty expr")
    // Query.validate's input gate (Query.java:165-170)
    assert(err(body(exprs = """[{"id":"e1","expr":"m1 + zz"}]"""))
      == "Expression [m1 + zz] was missing input zz")
    // TestJoin: a join object without an operator is an error
    assert(err(body(exprs = """[{"id":"e1","expr":"m1 * 2",
      "join":{}}]""")) == "Missing join operator")
    // TestDownsampler: interval/aggregator required, names verbatim
    def ts(ds: String) =
      s"""{"start":"3h-ago","aggregator":"avg","downsampler":$ds}"""
    assert(err(body(time = ts("""{"aggregator":"avg"}""")))
      == "Missing or empty interval")
    assert(err(body(time = ts("""{"interval":"15m"}""")))
      == "Missing or empty aggregator")
    assert(err(body(time = ts("""{"interval":"15m",
      "aggregator":"nosuch"}"""))) == "Invalid aggregator")
    intercept[Exception](ExpJsonQuery.parse(
      body(time = ts("""{"interval":"xxx","aggregator":"avg"}""")), NOW))
    // TestOutput: output id required; validateId vectors (Query
    // .validateId:204-220)
    assert(err(body(outs = "[{}]")) == "missing or empty id")
    assert(err(body(outs = """[{"id":"m-1"}]"""))
      == """Invalid id ("m-1"): illegal character: -""")
    assert(err(body(metrics = """[{"metric":"x","id":"7"}]""",
      exprs = "[]", outs = "[]")) == "The ID cannot be an integer")
  }
}
