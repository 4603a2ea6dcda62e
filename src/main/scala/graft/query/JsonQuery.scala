package graft.query

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.TimeUtils
import scala.jdk.CollectionConverters._

/**
 * POST `/api/query` JSON body parsing — the reference's
 * `HttpJsonSerializer.parseQueryV1` → `TSQuery.validateAndSetQuery`
 * pipeline (reference: src/tsd/HttpJsonSerializer.java:265,
 * src/core/TSQuery.java:47-109, src/core/TSSubQuery.java:50-104).
 * This is the form every dashboard integration uses; the `m=` URI
 * grammar in QueryParser covers the GET form.
 *
 * Accepted shape:
 * {{{
 * { "start": 1356998400 | "1h-ago" | "2024/01/05",
 *   "end":   ...optional, default now...,
 *   "msResolution": true,
 *   "queries": [
 *     { "aggregator": "sum", "metric": "sys.cpu.user",
 *       "rate": true,
 *       "rateOptions": {"counter":true,"counterMax":100,
 *                       "resetValue":1,"dropResets":false},
 *       "downsample": "5m-avg",
 *       "tags": {"host":"*"},                       // legacy sugar
 *       "filters": [{"type":"wildcard","tagk":"host",
 *                    "filter":"web*","groupBy":true}],
 *       "explicitTags": false,
 *       "percentiles": [99.0, 95.0] } ] }
 * }}}
 *
 * Jackson is used straight off the Spark classpath (Spark itself
 * depends on jackson-databind), so no extra dependency is introduced.
 */
object JsonQuery {

  private val mapper = new ObjectMapper()

  /** Parse a full /api/query body. `now` is injected for determinism
    * (reference DateTime.parseDateTimeString "n/now/ago" handling). */
  def parse(body: String, now: Long = System.currentTimeMillis()): TsQuery = {
    val root = mapper.readTree(body)
    require(root.hasNonNull("start"), "missing required field 'start'")
    require(root.hasNonNull("queries") && root.get("queries").size() > 0,
      "missing required field 'queries'")
    val start = parseTime(root.get("start"), now)
    val end =
      if (root.hasNonNull("end")) parseTime(root.get("end"), now) else now
    // reference TSQuery.validateAndSetQuery: end must be >= start
    // (equal is allowed — an instant query)
    require(end >= start,
      s"End time [$end] must be greater than or equal to the start time [$start]")
    val subs0 = root.get("queries").elements().asScala.map(parseSub).toSeq
    // reference TSQuery.validateAndSetQuery: a non-empty timezone must
    // resolve whenever any sub-query carries a downsampler, with or
    // without use_calendar (the reference's DateTime.timezones map is
    // keyed by java.util.TimeZone ids, so three-letter ids like 'EST'
    // are accepted — TimeZone.getTimeZone-compatible resolution, not
    // the stricter ZoneId.of)
    val tzName = root.path("timezone").asText("")
    if (tzName.nonEmpty && subs0.exists(_.downsample.isDefined) &&
        java.util.TimeZone.getTimeZone(tzName).getID != tzName)
      throw new IllegalArgumentException(
        "The timezone specification could not be found")
    // query-level useCalendar (reference TSQuery.validateAndSetQuery
    // :203-207): flips every PRESENT downsampler to calendar alignment
    // in the query timezone — equivalent to the spec's `c` suffix, with
    // the interval count and unit taken from the spec's own interval
    // token (Downsample.calendarBucket does the reference's
    // count-aware previousInterval snapping). A spec that is ALREADY
    // calendar-suffixed keeps its parsed unit — setUseCalendar(true)
    // on an already-calendar spec is a no-op in the reference. Subs
    // without a downsampler are untouched.
    val subs =
      if (!root.path("useCalendar").asBoolean(false)) subs0
      else subs0.map { s =>
        s.downsample match {
          case None => s
          case Some(d) if d.calendar => s
          case Some(d) =>
            // the unit token off the interval part of the ORIGINAL
            // spec ('500ms-avg' → 'ms', '1min-sum' → 'min' with the
            // reference's month quirk; both are normalized by
            // Downsample's parseDuration-compatible unit dispatch)
            val unit = d.spec.split("-")(0).dropWhile(_.isDigit) match {
              case "" => "m"
              case u  => u
            }
            s.copy(downsample =
              Some(d.copy(calendar = true, calendarUnit = unit)))
        }
      }
    TsQuery(start, end, subs,
      // reference default is FALSE (TSQuery.ms_resolution is a bare
      // Java boolean): dps keys serialize in SECONDS unless the
      // request opts into ms — a wire-format contract clients parse
      msResolution = root.path("msResolution").asBoolean(false),
      timezone = root.path("timezone").asText("UTC"))
  }

  /** start/end: epoch number (s vs ms by magnitude, reference
    * src/core/Const.java:89-92) or any TimeUtils date string. */
  private def parseTime(n: JsonNode, now: Long): Long =
    if (n.isNumber) {
      val v = n.asLong()
      if (v > 4294967295L) v else v * 1000L
    } else TimeUtils.parseDateTime(n.asText(), now)

  private def parseSub(n: JsonNode): SubQuery = {
    // reference TSSubQuery.validateAndSetQuery (:212-228): empty and
    // unknown aggregators are request errors, and at least one of a
    // non-empty metric or tsuids must address the series
    val agg = n.path("aggregator").asText("")
    require(agg.nonEmpty, "Missing the aggregation function")
    require(graft.operators.Aggregators.isKnown(agg),
      s"No such aggregation function: $agg")
    val tsuids = Option(n.get("tsuids")).filterNot(x => x == null || x.isNull)
      .toSeq.flatMap(_.elements().asScala.map(_.asText()).toSeq)
    require(n.path("metric").asText("").nonEmpty || tsuids.nonEmpty,
      "Missing the metric or tsuids, provide at least one")
    val downsample = Option(n.get("downsample")).filter(_.isTextual)
      .map(d => DownsampleSpec.parse(d.asText()))
    val rate =
      if (n.path("rate").asBoolean(false)) {
        val ro = Option(n.get("rateOptions")).filterNot(x => x == null || x.isNull)
        Some(RateOptions(
          counter = ro.exists(_.path("counter").asBoolean(false)),
          counterMax = ro.filter(_.hasNonNull("counterMax"))
            .map(_.get("counterMax").asLong()).getOrElse(Long.MaxValue),
          resetValue = ro.map(_.path("resetValue").asLong(0L)).getOrElse(0L),
          dropResets = ro.exists(_.path("dropResets").asBoolean(false))))
      } else None
    // "tags" is the legacy sugar map — same translation as the m= form
    // (reference TagVFilter.tagsToFilters): values group by default
    val tagFilters = Option(n.get("tags")).filterNot(x => x == null || x.isNull)
      .toSeq.flatMap { t =>
        t.fields().asScala.map(e =>
          QueryParser.parseFilterValue(e.getKey, e.getValue.asText(),
            groupBy = true)).toSeq
      }
    val filters = Option(n.get("filters")).filterNot(x => x == null || x.isNull)
      .toSeq.flatMap { fs =>
        fs.elements().asScala.map { f =>
          val typ = f.get("type").asText()
          val tagk = f.get("tagk").asText()
          val value = f.path("filter").asText("")
          val gb = f.path("groupBy").asBoolean(false)
          QueryParser.parseFilterValue(tagk, s"$typ($value)", gb)
        }.toSeq
      }
    val percentiles = Option(n.get("percentiles"))
      .filterNot(x => x == null || x.isNull).toSeq
      .flatMap(_.elements().asScala.map(_.asDouble()).toSeq)
    SubQuery(
      aggregator = agg,
      metric = n.path("metric").asText(""),
      filters = tagFilters ++ filters,
      downsample = downsample,
      rate = rate,
      explicitTags = n.path("explicitTags").asBoolean(false),
      percentiles = percentiles,
      tsuids = tsuids)
  }
}
