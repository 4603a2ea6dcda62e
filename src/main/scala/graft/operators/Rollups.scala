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

  // ---- tsd.rollups.config (the 2.4 rollup config file) ----------------

  /** One configured rollup interval (reference RollupInterval,
    * src/rollup/RollupInterval.java:95-265). Validation reproduces
    * validateAndCompile message for message: table names non-empty,
    * the row span unit one of h/d/n/y with multipliers only on 'h'
    * (and even), the interval strictly inside the span, and the
    * span/interval ratio within [12, 7774] (the reference's 14-bit
    * column-qualifier budget — kept as the config contract even
    * though Parquet needs no such packing). */
  case class RollupIntervalDef(interval: String, table: String,
                               preAggregationTable: String, rowSpan: String,
                               defaultInterval: Boolean = false,
                               delaySla: String = "") {
    if (table == null || table.isEmpty) throw new IllegalArgumentException(
      "The rollup table cannot be null or empty")
    if (preAggregationTable == null || preAggregationTable.isEmpty)
      throw new IllegalArgumentException(
        "The pre-aggregate rollup table cannot be null or empty")
    private val spanDigits = rowSpan.takeWhile(_.isDigit)
    private val spanUnits = rowSpan.drop(spanDigits.length)
    if (spanUnits.length > 1) throw new IllegalArgumentException(
      "Milliseconds are not supported")
    val units: Char = if (spanUnits.isEmpty) ' ' else spanUnits.head
    val unitMultiplier: Int = if (spanDigits.isEmpty) 1 else spanDigits.toInt
    if (units != 'h' && unitMultiplier > 1) throw new IllegalArgumentException(
      "Multipliers are only usable with the 'h' unit")
    else if (units == 'h' && unitMultiplier > 1 && unitMultiplier % 2 != 0)
      throw new IllegalArgumentException(
        "The multiplier must be 1 or an even value")
    val delayMs: Long =
      if (delaySla == null || delaySla.isEmpty) 0L
      else {
        val d = graft.model.TimeUtils.parseDuration(delaySla)
        if (d < 1000L) throw new IllegalArgumentException(
          "Milliseconds are not supported as the maximum delay")
        d
      }
    val intervalMs: Long = graft.model.TimeUtils.parseDuration(interval)
    private val intervalSecs = intervalMs / 1000L
    private val spanSecs: Long = (units match {
      case 'h' => 3600L
      case 'd' => 86400L
      case 'n' => 86400L * 32
      case 'y' => 86400L * 366
      case u => throw new IllegalArgumentException(
        s"Unrecogznied span '$u'")
    }) * unitMultiplier
    if (intervalSecs >= spanSecs) throw new IllegalArgumentException(
      s"Interval [$intervalSecs] is too large for the span [$units]")
    val intervalsPerSpan: Long = spanSecs / intervalSecs
    if (intervalsPerSpan > 7774) throw new IllegalArgumentException(
      s"Too many intervals [$intervalsPerSpan] in the span. Must be " +
        "smaller than [7774] to fit in 14 bits")
    if (intervalsPerSpan < 12) throw new IllegalArgumentException(
      s"Not enough intervals [$intervalsPerSpan] for the span. " +
        "Must be at least [12]")
  }

  /** The parsed config (reference RollupConfig,
    * src/rollup/RollupConfig.java:60-143): unique intervals, at most
    * one default, and the aggregator-id dictionary (0-127, unique,
    * known aggregators — the on-disk numbering rollup rows carry). */
  case class RollupConfigDef(intervals: Seq[RollupIntervalDef],
                             aggregationIds: Map[String, Int]) {
    if (intervals.isEmpty) throw new IllegalArgumentException(
      "Rollup config given but no intervals were found.")
    if (aggregationIds.isEmpty) throw new IllegalArgumentException(
      // the reference's typo, kept verbatim (RollupConfig.java:89)
      "Rollup config given but no aggegation ID mappings found.")
    locally {
      val seen = scala.collection.mutable.Set[String]()
      var defaults = 0
      intervals.foreach { i =>
        if (!seen.add(i.interval)) throw new IllegalArgumentException(
          "Only one interval of each type can be configured: " + i)
        if (i.defaultInterval) { defaults += 1
          if (defaults > 1) throw new IllegalArgumentException(
            "Multiple default intervals configured. Only one is " +
              "allowed: " + i) }
      }
      val ids = scala.collection.mutable.Set[Int]()
      aggregationIds.foreach { case (name, id) =>
        if (id < 0 || id > 127) throw new IllegalArgumentException(
          s"ID for aggregator must be between 0 and 127: $name=$id")
        if (!ids.add(id)) throw new IllegalArgumentException(
          s"Multiple mappings for the ID '$id' are not allowed.")
        if (!Aggregators.isKnown(name.toLowerCase))
          throw new IllegalArgumentException(
            "No such aggregator found for " + name.toLowerCase)
      }
    }
    private val byInterval = intervals.map(i => i.interval -> i).toMap
    private val byTable = intervals.flatMap(i =>
      Seq(i.table -> i, i.preAggregationTable -> i)).toMap
    /** getRollupInterval: lookup by forward interval string. */
    def forInterval(interval: String): RollupIntervalDef =
      byInterval.getOrElse(interval, throw new NoSuchElementException(
        "No rollup interval found for: " + interval))
    /** getRollupIntervalForTable: reverse lookup by either table. */
    def forTable(table: String): RollupIntervalDef =
      byTable.getOrElse(table, throw new NoSuchElementException(
        "No rollup interval found for table: " + table))
  }

  /** Parse the `tsd.rollups.config` JSON document (reference
    * RollupConfig serdes shape: `{"intervals":[{interval, table,
    * preAggregationTable, rowSpan, defaultInterval?, delaySla?},...],
    * "aggregationIds":{name: id,...}}`). */
  def parseConfig(json: String): RollupConfigDef = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    val intervals = Option(root.get("intervals")).map(_.elements()
      .asScala.toSeq).getOrElse(Seq.empty).map { n =>
      RollupIntervalDef(
        interval = n.path("interval").asText(""),
        table = n.path("table").asText(""),
        preAggregationTable = n.path("preAggregationTable").asText(""),
        rowSpan = n.path("rowSpan").asText(""),
        defaultInterval = n.path("defaultInterval").asBoolean(false),
        delaySla = n.path("delaySla").asText(""))
    }
    val aggIds = Option(root.get("aggregationIds")).map(a =>
      a.fields().asScala.map(e =>
        e.getKey -> e.getValue.asInt()).toMap).getOrElse(Map.empty)
    RollupConfigDef(intervals, aggIds)
  }

  /** Bridge a parsed config to the engine's registry: each non-default
    * interval becomes a [[graft.Engine.RollupTable]] whose frame the
    * deployment resolves by table name, and whose freshness horizon is
    * `now - delaySla` (the blackout the reference's SplitRollupQuery
    * splits on — no SLA means complete to now). The default interval
    * is the RAW table in the reference's config and registers nothing. */
  def registryTables(cfg: RollupConfigDef, resolve: String => DataFrame,
                     nowMs: Long): Seq[graft.Engine.RollupTable] =
    cfg.intervals.filterNot(_.defaultInterval).map { i =>
      graft.Engine.RollupTable(i.intervalMs, resolve(i.table),
        horizonMs = if (i.delayMs == 0L) Long.MaxValue else nowMs - i.delayMs)
    }
}
