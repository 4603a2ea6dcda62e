package graft.operators

import graft.query.DownsampleSpec
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/**
 * Rollup (pre-aggregated) tables and query-side routing (reference:
 * src/rollup/RollupInterval.java:32-94, RollupUtils.java:120-160
 * storage; query routing TsdbQuery.tableToBeScanned
 * src/core/TsdbQuery.java:1553-1571 and the ROLLUP_USAGE fallback
 * ladder :197-232; rollup-aware avg = Σsum/Σcount
 * src/core/Downsampler.java:163-210).
 *
 * Spark-native: a rollup is a materialized DataFrame/table of
 * (metric, tags, series_id, ts=interval start, sum, count, min, max)
 * maintained by batch or Structured Streaming aggregation
 * (sources.Ingest.rollupStream). A query whose downsample interval is
 * a multiple of the rollup interval re-aggregates the rollup instead
 * of raw points — the core 100 TB lever: a 1d query over years reads
 * the 1h rollup (~1/3600 of the raw bytes).
 */
object Rollups {

  /** Materialize a rollup table from raw points at a fixed interval.
    * metric/tags ride as group keys (tags via canonical JSON) so the
    * aggregation stays hash-based — a map-typed first() buffer would
    * force SortAggregate over every raw point. */
  def materialize(points: DataFrame, intervalMs: Long): DataFrame = {
    val withSeries =
      if (points.columns.contains("series_id")) points
      else graft.model.Points.withSeriesId(points)
    val tagEntries = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    withSeries
      .withColumn("ts", col("ts") - col("ts") % intervalMs)
      .withColumn("__tags_json", to_json(array_sort(map_entries(col("tags")))))
      .groupBy(col("series_id"), col("ts"), col("metric"), col("__tags_json"))
      .agg(sum(col("value")).as("sum"), count(col("value")).as("count"),
        min(col("value")).as("min"), max(col("value")).as("max"))
      .withColumn("tags",
        map_from_entries(from_json(col("__tags_json"), tagEntries)))
      .drop("__tags_json")
  }

  /** Can `spec` be served from a rollup of `rollupMs`? (reference
    * routing rule: interval multiple + supported aggregator; fill
    * policies need the raw-path grid generator) */
  def canServe(spec: DownsampleSpec, rollupMs: Long): Boolean =
    spec.intervalMs > 0 && spec.intervalMs % rollupMs == 0 && !spec.calendar &&
      spec.fill == graft.query.FillPolicy.None &&
      Set("sum", "avg", "count", "min", "max", "zimsum", "mimmin", "mimmax")
        .contains(spec.aggregator)

  /**
   * Downsample FROM a rollup table to a coarser interval. avg is
   * Σsum/Σcount (not avg-of-avgs); min/max re-aggregate; sum/count
   * re-sum.
   */
  def downsampleFromRollup(rollup0: DataFrame, spec: DownsampleSpec): DataFrame = {
    val rollup1 =
      if (rollup0.columns.contains("series_id")) rollup0
      else graft.model.Points.withSeriesId(rollup0)
    // each aggregator reads ITS stored rollup series, and a row where
    // that series is absent (null column) does not exist for the query
    // — the reference's per-aggregation-id storage makes this implicit
    // (a never-written "max" series returns 0 dps even when sums
    // exist: run10mMaxLongSingleTSNotFound), and avg requires the
    // sum/count PAIR at a timestamp (unpaired rows are dropped, never
    // half-averaged: run10mAvgLongSingleTSMissingACount/ASum goldens,
    // src/core/Downsampler.java:163-210)
    val rollup = rollup1.filter(spec.aggregator match {
      case "avg" => col("sum").isNotNull && col("count").isNotNull
      case "sum" | "zimsum" => col("sum").isNotNull
      case "count" => col("count").isNotNull
      case "min" | "mimmin" => col("min").isNotNull
      case "max" | "mimmax" => col("max").isNotNull
      case _ => lit(true)
    })
    val b = col("ts") - col("ts") % spec.intervalMs
    val g = rollup.withColumn("bucket", b)
      .groupBy(col("series_id"), col("bucket"))
    val agged = spec.aggregator match {
      case "avg" => g.agg(first(col("metric")).as("metric"),
        first(col("tags")).as("tags"),
        (sum(col("sum")) / sum(col("count"))).as("value"))
      case "sum" | "zimsum" => g.agg(first(col("metric")).as("metric"),
        first(col("tags")).as("tags"), sum(col("sum")).as("value"))
      case "count" => g.agg(first(col("metric")).as("metric"),
        first(col("tags")).as("tags"), sum(col("count")).cast("double").as("value"))
      case "min" | "mimmin" => g.agg(first(col("metric")).as("metric"),
        first(col("tags")).as("tags"), min(col("min")).as("value"))
      case "max" | "mimmax" => g.agg(first(col("metric")).as("metric"),
        first(col("tags")).as("tags"), max(col("max")).as("value"))
      case other => throw new IllegalArgumentException(
        s"aggregator $other cannot be served from a rollup")
    }
    agged.withColumnRenamed("bucket", "ts")
      .select("metric", "tags", "series_id", "ts", "value")
  }

  /**
   * Stitch a rollup table with fresh raw points past the rollup
   * horizon (replaces the reference's SplitRollupQuery blackout-SLA
   * splitting, src/core/SplitRollupQuery.java): rows up to `horizonMs`
   * come from the rollup, later ones from raw.
   */
  def stitch(rollup: DataFrame, rawPoints: DataFrame, spec: DownsampleSpec,
             horizonMs: Long): DataFrame = {
    // align the split to an output bucket boundary so no bucket is
    // computed half from the rollup and half from raw
    val hz = if (spec.intervalMs > 0) horizonMs - horizonMs % spec.intervalMs
             else horizonMs
    val old = downsampleFromRollup(rollup.filter(col("ts") < hz), spec)
    val fresh = Downsample(rawPoints.filter(col("ts") >= hz), spec)
    old.unionByName(fresh)
  }
}
