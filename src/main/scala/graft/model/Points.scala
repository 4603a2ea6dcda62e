package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Canonical data-point model.
 *
 * The reference models one logical append-only table of points
 * `(metric, timestamp, value, tags)` (reference:
 * src/core/IncomingDataPoint.java:41). Values are either 64-bit signed
 * integers or floats, flagged per point (src/core/TSDB.java:1203-1299);
 * timestamps are epoch seconds or milliseconds
 * (src/core/Const.java:89-92).
 *
 * Spark-native design: a DataFrame with the schema below. The
 * long-vs-double duality is kept via `value_l` + `is_int` so integer
 * aggregation paths (truncating avg/dev, reference
 * src/core/Aggregators.java runLong vs runDouble) stay observable.
 * There is no UID dictionary — Parquet dictionary-encodes strings for
 * free — and no salting: Spark partitioning replaces salt buckets
 * (reference src/core/RowKey.java:141-167).
 */
object Points {

  /** Canonical schema for a points DataFrame. */
  val schema: StructType = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("ts", LongType, nullable = false), // epoch millis
    StructField("value", DoubleType, nullable = false),
    StructField("value_l", LongType, nullable = true),
    StructField("is_int", BooleanType, nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false)
  ))

  /** Stable surrogate for the reference's TSUID: hash of (metric, sorted
    * tags). Used as the per-series shuffle/window key. Tag entries are
    * sorted by key before hashing so `{host=a,dc=x}` and `{dc=x,host=a}`
    * collide to one series, matching the reference's tagk-sorted row key
    * (src/core/RowKey.java:83-105) — map_entries alone preserves
    * construction order and would silently split one logical series. */
  def seriesId(metric: Column, tags: Column): Column =
    xxhash64(metric, to_json(array_sort(map_entries(tags))))

  /** Add a `series_id` column derived from metric + tags. */
  def withSeriesId(df: DataFrame): DataFrame =
    df.withColumn("series_id", seriesId(col("metric"), col("tags")))

  /**
   * Persist a points table BUCKETED by series_id and sorted by
   * (series_id, ts) — the co-located layout for a corpus that is
   * queried repeatedly. Every per-series stage of the query pipeline
   * (downsample groupBy, rate/interpolation windows) clusters on
   * series_id, so a scan that already reports
   * HashPartitioning(series_id) satisfies their required distribution
   * and the planner inserts NO Exchange: at 100 TB this converts each
   * query's per-series shuffle into a local pass, paid once at write
   * time instead of once per query. The in-bucket sort additionally
   * covers the window ordering. Requires a catalog table (bucket
   * metadata lives in the catalog, not in parquet footers).
   */
  def writeBucketed(points: DataFrame, table: String, buckets: Int): Unit =
    withSeriesId(points.drop("series_id"))
      .write.mode("overwrite")
      .bucketBy(buckets, "series_id").sortBy("series_id", "ts")
      .format("parquet").saveAsTable(table)

  /**
   * Persist a points table PARTITIONED by UTC date derived from ts —
   * the complementary layout to [[writeBucketed]]: where bucketing
   * removes the per-series shuffle, date partitioning makes the TIME
   * dimension a directory structure, so a narrow time-range query
   * never lists (let alone opens) files outside its dates, and
   * retention is a directory drop instead of a rewrite. This is the
   * reference's salt+timestamp rowkey scan range
   * (src/core/TsdbQuery.java:1446-1546) expressed as Hive-style
   * partitioning. At 100 TB with years of history, a one-day query
   * prunes to ~1/1000 of the directory tree before any I/O.
   */
  def writeDatePartitioned(points: DataFrame, path: String): Unit =
    points.drop("date")
      // Derive the UTC day arithmetically (epoch days from epoch
      // millis), NOT via date_format, which renders in the session
      // timezone: under a non-UTC session the write-side dates would
      // shift while scanDatePartitioned prunes in hard UTC — silently
      // excluding rows near day boundaries.
      .withColumn("date",
        date_add(lit("1970-01-01").cast(DateType),
          floor(col("ts").cast("double") / 86400000d).cast("int"))
          .cast(StringType))
      .write.mode("overwrite").partitionBy("date").parquet(path)

  /**
   * Scan a date-partitioned points table for a time range. The range
   * is applied BOTH as a date predicate (partition pruning — resolved
   * against directory names at plan time) and as the exact ts clip
   * (row-group pruning + residual filter within the boundary dates).
   */
  def scanDatePartitioned(spark: SparkSession, path: String,
                          startMs: Long, endMs: Long): DataFrame = {
    def day(ms: Long) = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
      .format(java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC))
    spark.read.parquet(path)
      .filter(col("date") >= day(startMs) && col("date") <= day(endMs))
      .filter(col("ts") >= startMs && col("ts") <= endMs)
      .drop("date")
  }

  /**
   * Map the driver's `events` table onto the canonical point schema
   * (FIXTURES.md §3): event_type → metric, event time → ts (millis),
   * value → value, low-cardinality attributes → tags.
   *
   * The time filter is applied *before* anything else so Parquet
   * row-group pruning sees it (the analogue of the reference's rowkey
   * scan-range pruning, src/core/TsdbQuery.java:1446-1546).
   */
  // NOTE (optimization r16): a scale-adaptive small-input fan-out
  // (repartition when inputFiles < defaultParallelism, like
  // PipelineQueries.docs) was tried here and REVERTED: multi-partition
  // map-side partial aggregation merges float partials in shuffle-fetch
  // order, which made cancellation-sensitive aggregators (q15 dev)
  // drift by 1 ulp across the r4 rounding boundary vs the DuckDB
  // oracle (4/150 rows). The TSDB query family's float sums rely on
  // the deterministic single-partial accumulation a single-file scan
  // gives; the pipeline docs() family is safe because its float folds
  // are explicitly sorted (array_sort + aggregate()).
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    // events.ts has shipped as both parquet TIMESTAMP(NANOS) (readable
    // in Spark 4 only as a raw long behind nanosAsLong; millis =
    // integer-div by 1e6 — fp division would lose precision on int64
    // nanos > 2^53) and TIMESTAMP(MICROS). Support both by branching on
    // the inferred type. inferTimestampNTZ=false so a micros column
    // reads as TimestampType, whose internal value IS epoch-micros —
    // unix_millis() is then a pure floor-div with no session-tz shift,
    // and IntegralDivRangeRewrite pushes range predicates over it down
    // to the scan as timestamp filters.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val tsMillis = ev.schema("ts").dataType match {
      case LongType => expr("CAST(ts AS BIGINT) div 1000000")
      // Spark-written copies (ScaleGen output) carry TIMESTAMP_NTZ in
      // the footer metadata, which overrides inferTimestampNTZ; the
      // NTZ→LTZ cast is offset-free under the pinned-UTC sessions and
      // the rewrite rule strips it back off the pushdown predicate
      case TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
      case _ => unix_millis(col("ts"))
    }
    ev.select(
      col("event_type").as("metric"),
      tsMillis.as("ts"),
      col("value").as("value"),
      lit(null).cast(LongType).as("value_l"),
      lit(false).as("is_int"),
      map(
        lit("user"), col("user_id").cast(StringType),
        lit("k"), get_json_object(col("props"), "$.k")
      ).as("tags")
    )
  }

  /** The events table in its interaction-log shape (event_id, ts
    * millis, user_id, event_type, value) for the trajectory operators
    * — same dual NANOS/MICROS ts handling as [[fromEvents]], without
    * the metric/tags projection. */
  def rawEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val tsMillis = ev.schema("ts").dataType match {
      case LongType => expr("CAST(ts AS BIGINT) div 1000000")
      case TimestampNTZType => unix_millis(col("ts").cast(TimestampType))
      case _ => unix_millis(col("ts"))
    }
    ev.select(col("event_id"), tsMillis.as("ts"), col("user_id"),
      col("event_type"), col("value"))
  }
}
