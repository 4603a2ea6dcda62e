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

  /**
   * A registered pre-aggregated table (schema of Rollups.materialize /
   * sources.Ingest.rollupStream) plus the freshness horizon up to which
   * it is complete — the reference's rollup table registry + blackout
   * SLA (src/rollup/RollupInterval.java:32-94,
   * src/core/SplitRollupQuery.java:29).
   */
  case class RollupTable(intervalMs: Long, df: DataFrame,
                         horizonMs: Long = Long.MaxValue)

  /**
   * Run one sub-query against a canonical points DataFrame.
   *
   * When `rollups` are registered and the downsample spec can be served
   * from one (interval multiple, supported aggregator — reference
   * TsdbQuery.tableToBeScanned src/core/TsdbQuery.java:1553-1571), the
   * coarsest qualifying rollup is scanned instead of raw points — THE
   * 100 TB lever: a 1d query over years reads ~1/3600 of the raw bytes
   * from the 1h rollup. Buckets past the rollup's horizon are computed
   * from fresh raw points and stitched in (SplitRollupQuery semantics).
   */
  def run(points: DataFrame, query: TsQuery, sub: SubQuery,
          rollups: Seq[RollupTable] = Seq.empty): DataFrame = {
    // pre-pad the scan so edge buckets AND the first rate delta / lerp
    // neighbor exist (reference getScanStartTimeSeconds pads for rate
    // too, not just downsample)
    val needsNeighbors = sub.rate.isDefined ||
      Interpolate.policyOf(sub.aggregator) == Interpolate.Lerp
    val padMs = math.max(
      sub.downsample.map(d => math.max(d.intervalMs, 1L)).getOrElse(0L),
      if (needsNeighbors) RATE_LERP_PAD_MS else 0L)
    // shared scan shape for raw points AND rollup rows: metric + padded
    // time range (pushdown-friendly) then tag filters
    def scanned(df: DataFrame): DataFrame = TagFilters(
      df.filter(col("metric") === sub.metric &&
        col("ts") >= (query.startMs - padMs) && col("ts") <= (query.endMs + padMs)),
      sub.filters, sub.explicitTags)
    lazy val withSeries = Points.withSeriesId(scanned(points))

    val downsampled = sub.downsample match {
      case Some(spec) =>
        val route = rollups
          .filter(r => Rollups.canServe(spec, r.intervalMs))
          .sortBy(-_.intervalMs).headOption
        route match {
          case Some(r) =>
            // align the split to a downsample bucket boundary so no
            // bucket is half-rollup half-raw
            val hz = if (r.horizonMs == Long.MaxValue) Long.MaxValue
              else r.horizonMs - r.horizonMs % math.max(spec.intervalMs, 1L)
            val fromRollup = Rollups.downsampleFromRollup(
              scanned(r.df).filter(col("ts") < hz), spec)
            if (hz == Long.MaxValue) fromRollup
            else fromRollup.unionByName(
              Downsample(withSeries.filter(col("ts") >= hz), spec,
                Some((query.startMs, query.endMs))))
          case None =>
            Downsample(withSeries, spec, Some((query.startMs, query.endMs)))
        }
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
