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
    else if (spec.calendar) {
      val unit = spec.calendarUnit match {
        case "d" => "DAY"
        case "w" => "WEEK"
        case "n" => "MONTH"
        case "y" => "YEAR"
        case "h" => "HOUR"
        case "m" => "MINUTE"
        case "s" => "SECOND"
        case _   => "DAY"
      }
      val local = from_utc_timestamp(timestamp_millis(ts), tz)
      unix_millis(to_utc_timestamp(date_trunc(unit, local), tz))
    } else (ts - (ts % spec.intervalMs))
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
    val withSeries =
      if (df.columns.contains("series_id")) df
      else graft.model.Points.withSeriesId(df)
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
      .agg((if (withSeries.columns.contains("value_l") &&
            withSeries.columns.contains("is_int"))
          // long/double duality (reference runLong, SURVEY hard-part
          // #2): all-integral intervals get truncating avg/dev; the
          // dual falls through to the plain registry for every other
          // aggregator and for any non-integral interval
          Aggregators.dualExpr(spec.aggregator, col("value"),
            col("value_l"), col("is_int"), col("ts"))
        else Aggregators.expr(spec.aggregator, col("value"), col("ts")))
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
