package graft

import graft.model.Points
import graft.operators._
import graft.query._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Query engine facade — the reference's query lifecycle (§3.1 of
 * SURVEY.md; reference src/core/TsdbQuery.java:490-1114) as one
 * declarative DataFrame plan:
 *
 *   time-range scan → tag filters → [downsample] → [rate] →
 *   interpolation-aware group aggregation → output shaping
 *
 * in exactly the reference's stage order (per-series downsample and
 * rate run *before* cross-series aggregation —
 * src/core/AggregationIterator.java:253-280).
 *
 * Scan pre-padding (reference TsdbQuery.getScanStartTimeSeconds
 * :1575-1615): the physical scan widens the requested range by one
 * downsample interval so edge buckets and rate/lerp neighbors are
 * complete, then clips output buckets to the query range.
 */
object Engine {

  /** Lookback for rate/lerp neighbors when no downsample interval
    * bounds it — the reference widens the scan by one row span
    * (MAX_TIMESPAN = 1h, src/core/TsdbQuery.java:1575-1615). */
  val RATE_LERP_PAD_MS = 3600000L

  /** Run one sub-query against a canonical points DataFrame. */
  def run(points: DataFrame, query: TsQuery, sub: SubQuery): DataFrame = {
    // pre-pad the scan so edge buckets AND the first rate delta / lerp
    // neighbor exist (reference getScanStartTimeSeconds pads for rate
    // too, not just downsample)
    val needsNeighbors = sub.rate.isDefined ||
      Interpolate.policyOf(sub.aggregator) == Interpolate.Lerp
    val padMs = math.max(
      sub.downsample.map(d => math.max(d.intervalMs, 1L)).getOrElse(0L),
      if (needsNeighbors) RATE_LERP_PAD_MS else 0L)
    val scanned = points.filter(
      col("metric") === sub.metric &&
        col("ts") >= (query.startMs - padMs) && col("ts") <= (query.endMs + padMs))
    val filtered = TagFilters(scanned, sub.filters, sub.explicitTags)
    val withSeries = Points.withSeriesId(filtered)

    val downsampled = sub.downsample match {
      case Some(spec) =>
        Downsample(withSeries, spec, Some((query.startMs, query.endMs)))
      case None => withSeries
    }
    val rated = sub.rate match {
      case Some(opts) => Rate(downsampled, opts)
      case None => downsampled
    }
    val groupKeys = TagFilters.groupByKeys(sub.filters)
    val agged = Interpolate.aggregate(rated, sub.aggregator, groupKeys,
      isRate = sub.rate.isDefined)
    // clip padded scan back to the query range (reference
    // AggregationIterator bounds, src/core/AggregationIterator.java:218-280)
    agged.filter(col("ts") >= query.startMs && col("ts") <= query.endMs)
  }

  /** Parse-and-run an `m=`-style sub-query string. */
  def runM(points: DataFrame, query: TsQuery, m: String): DataFrame =
    run(points, query, QueryParser.parseSubQuery(m))

  /**
   * Output shaping to the reference's serialization shape
   * (HttpJsonSerializer.formatQueryV1): one row per group with
   * `metric`, grouping `tags`, `aggregateTags` (tag keys present in
   * the group's series but not grouped on), and the `dps` time→value
   * map.
   */
  def shapeOutput(result: DataFrame, groupTagKeys: Seq[String]): DataFrame = {
    val tagCols = groupTagKeys.map(k => col(s"tag_$k"))
    result
      .groupBy(col("metric") +: tagCols: _*)
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("ts"), col("value"))))).as("dps"))
  }
}
