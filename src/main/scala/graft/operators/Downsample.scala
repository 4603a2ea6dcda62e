package graft.operators

import graft.query.{DownsampleSpec, FillPolicy}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Downsampling — time-bucket aggregation per series
 * (reference: src/core/Downsampler.java:291-452,
 * src/core/DownsamplingSpecification.java:116-191,
 * src/core/FillingDownsampler.java:33,256-271).
 *
 * Bucket assignment is `ts - (ts % interval)` for fixed intervals,
 * calendar-aligned `date_trunc` in a timezone for the `c` suffix, and a
 * single `[start, end)` bucket stamped `start` for `0all`
 * (src/core/Downsampler.java:132-134,248-254,358-370).
 *
 * Scale notes: the bucket column is a pure projection (no shuffle); the
 * groupBy shuffles once on (series, bucket) with map-side partial
 * aggregation. Fill grids are generated per series with `sequence` +
 * explode — bucket count is bounded by range/interval, independent of
 * input row count — then joined back; the join key (series_id, bucket)
 * matches the aggregation partitioning so AQE coalesces it.
 */
object Downsample {

  /** Bucket-start column (epoch millis) for a spec. */
  def bucket(ts: Column, spec: DownsampleSpec, queryStartMs: Long = 0L,
             tz: String = "UTC"): Column = {
    if (spec.intervalMs == 0L) lit(queryStartMs) // run_all
    else if (spec.calendar) calendarBucket(ts, spec, tz)
    else (ts - (ts % spec.intervalMs))
  }

  /** Normalize a calendar-unit token to (canonical unit, unit millis).
    * Same dispatch as TimeUtils.parseDuration (reference DateTime
    * .parseDuration / unitsToCalendarType): `ms` is special-cased, then
    * the LAST character decides — preserving the reference's lenient
    * "min" = month quirk. Unknown units are an error, never a silent
    * DAY fallback. */
  private def calUnit(u: String): (Char, Long) = {
    val lc = u.toLowerCase
    require(lc.nonEmpty, "empty calendar unit")
    if (lc == "ms" ||
        (lc.length >= 2 && lc.endsWith("s") && lc.charAt(lc.length - 2) == 'm'))
      ('x', 1L) // 'x' = milliseconds
    else lc.last match {
      case 's' => ('s', 1000L)
      case 'm' => ('m', 60000L)
      case 'h' => ('h', 3600000L)
      case 'd' => ('d', 86400000L)
      case 'w' => ('w', 7L * 86400000L)
      case 'n' => ('n', 30L * 86400000L)
      case 'y' => ('y', 365L * 86400000L)
      case c => throw new IllegalArgumentException(
        s"unsupported calendar downsample unit: $u")
    }
  }

  /**
   * Count-aware calendar snapping, mirroring the reference's
   * DateTime.previousInterval (src/utils/DateTime.java:450-611) exactly:
   * pick a calendar base boundary at or below the point — the parent
   * unit's truncation when the count divides the parent (e.g. 5m within
   * the hour), a coarser boundary otherwise (23s → top of hour, 90m →
   * top of day, 5h → top of month, multi-day → top of year) — then step
   * `count` units forward from the base and floor. Time units (ms/s/m/h)
   * step in exact elapsed millis (Calendar.add on a time field); date
   * units step in calendar days/months (local-midnight preserving).
   * Week intervals floor to the week start with the count ignored, as
   * the reference hardcodes (`interval_override = 7`, DateTime.java:576).
   * Month/year bases reset at each year start (the shared
   * MONTH/YEAR case truncates to Jan 1), so e.g. 5n boundaries are
   * Jan/Jun/Nov of every year.
   */
  private def calendarBucket(ts: Column, spec: DownsampleSpec,
                             tz: String): Column = {
    val (u, unitMs) = calUnit(spec.calendarUnit)
    val i = (spec.intervalMs / unitMs).toInt
    val local = from_utc_timestamp(timestamp_millis(ts), tz)
    def toUtcMs(t: Column) = unix_millis(to_utc_timestamp(t, tz))
    // elapsed-ms stepping from a local calendar boundary
    def stepMs(baseUnit: String, stepSize: Long) = {
      val base = toUtcMs(date_trunc(baseUnit, local))
      base + floor((ts - base) / stepSize).cast("long") * stepSize
    }
    u match {
      case 'x' => if (1000 % i == 0) stepMs("SECOND", i.toLong)
                  else stepMs("MINUTE", i.toLong)
      case 's' => if (60 % i == 0) stepMs("MINUTE", i * 1000L)
                  else stepMs("HOUR", i * 1000L)
      case 'm' => if (60 % i == 0) stepMs("HOUR", i * 60000L)
                  else stepMs("DAY", i * 60000L)
      case 'h' => if (24 % i == 0) stepMs("DAY", i * 3600000L)
                  else stepMs("MONTH", i * 3600000L)
      case 'd' =>
        if (i == 1) toUtcMs(date_trunc("DAY", local))
        else {
          // calendar-day stepping from Jan 1: local midnights i days apart
          val yearStart = date_trunc("YEAR", local).cast("date")
          val off = floor(datediff(local.cast("date"), yearStart) / i)
            .cast("int") * i
          toUtcMs(date_add(yearStart, off).cast("timestamp"))
        }
      case 'w' => toUtcMs(date_trunc("WEEK", local))
      case 'n' =>
        if (i == 1) toUtcMs(date_trunc("MONTH", local))
        else {
          val yearStart = date_trunc("YEAR", local)
          val off = floor((month(local) - 1) / i).cast("int") * i
          toUtcMs(add_months(yearStart, off).cast("timestamp"))
        }
      case 'y' => toUtcMs(date_trunc("YEAR", local))
    }
  }

  /**
   * Downsample a canonical points DataFrame. Expects columns
   * (metric, ts, value, tags); keeps (metric, tags, series_id, ts, value)
   * with ts = bucket start.
   *
   * @param queryRange when set with a filling policy, the fill grid
   *   spans aligned buckets of [start, end) (reference
   *   FillingDownsampler initializes timestamp from query start).
   */
  def apply(df: DataFrame, spec: DownsampleSpec,
            queryRange: Option[(Long, Long)] = None,
            tz: String = "UTC"): DataFrame = {
    val withSeries0 =
      if (df.columns.contains("series_id")) df
      else graft.model.Points.withSeriesId(df)
    // run_all's single bucket is [query_start, query_end) — reference
    // Downsampler.java:248-254 — so out-of-range points from the scan
    // pad must be excluded HERE: the bucket is stamped query_start,
    // which survives the engine's post-aggregation range clip. (Fixed
    // bucket intervals need no point clip: their padded edge buckets
    // carry out-of-range stamps and the range clip drops them, while
    // the bucket containing query_start legitimately includes
    // pre-start points — that is what the scan pad is FOR.) End is
    // exclusive, proven by the reference's runLongSingleTSDownsample-
    // AllSubSet golden (sum 15 over [..500, ..600)).
    val withSeries = (spec.intervalMs, queryRange) match {
      case (0L, Some((s, e))) =>
        withSeries0.filter(col("ts") >= s && col("ts") < e)
      case _ => withSeries0
    }
    val qStart = queryRange.map(_._1).getOrElse(0L)
    val b = bucket(col("ts"), spec, qStart, tz)
    // metric and a canonical JSON encoding of tags ride along as GROUP
    // KEYS instead of first() aggregates: a map-typed aggregation
    // buffer forces SortAggregate (sorting every point per partition);
    // string keys keep the whole downsample in HashAggregate. The JSON
    // round-trip is per-ROW work that codegens, not a per-partition
    // sort.
    val tagEntries = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    val agged = withSeries
      .withColumn("bucket", b)
      .withColumn("__tags_json", to_json(array_sort(map_entries(col("tags")))))
      .groupBy(col("series_id"), col("bucket"), col("metric"),
        col("__tags_json"))
      // downsampling always runs the DOUBLE path and its output is
      // never integral — reference Downsampler.next
      // (src/core/Downsampler.java:220 `runDouble` unconditionally)
      // and Downsampler.isInteger():257 returning false ("Downsampled
      // values are doubles"). The long path (truncating avg/dev,
      // integer lerp) lives ONLY in the cross-series aggregation
      // layer (Interpolate.aggregate / AggregationIterator); round 8
      // and earlier had the duality at this layer instead — fixed in
      // round 9 after diffing the reference code paths.
      .agg(Aggregators.expr(spec.aggregator, col("value"), col("ts"))
        .as("value"))
      .withColumn("tags",
        map_from_entries(from_json(col("__tags_json"), tagEntries)))
      .drop("__tags_json")
      .withColumnRenamed("bucket", "ts")

    spec.fill match {
      case FillPolicy.None => agged.select("metric", "tags", "series_id", "ts", "value")
      case fillPolicy =>
        require(spec.intervalMs > 0, "fill requires a fixed interval")
        val fillValue: Column = fillPolicy match {
          case FillPolicy.Zero => lit(0.0)
          case FillPolicy.NaN => lit(Double.NaN)
          case FillPolicy.Null => lit(null).cast("double")
          case FillPolicy.Scalar(v) => lit(v)
          case FillPolicy.None => lit(null) // unreachable
        }
        // per-series grid: aligned buckets covering the query range (or
        // the series' own observed span when no range given)
        val (lo, hi) = queryRange match {
          case Some((s, e)) =>
            val alo = s - (s % spec.intervalMs)
            (lit(alo), lit(e - 1 - ((e - 1) % spec.intervalMs)))
          case None => (min(col("ts")), max(col("ts")))
        }
        val grid = agged.groupBy(col("series_id"))
          .agg(first(col("metric")).as("metric"), first(col("tags")).as("tags"),
            sequence(lo.cast("long"), hi.cast("long"), lit(spec.intervalMs)).as("grid"))
          .select(col("series_id"), col("metric"), col("tags"),
            explode(col("grid")).as("ts"))
        grid.join(agged.select("series_id", "ts", "value"),
            Seq("series_id", "ts"), "left")
          .select(col("metric"), col("tags"), col("series_id"), col("ts"),
            coalesce(col("value"), fillValue).as("value"))
    }
  }
}
