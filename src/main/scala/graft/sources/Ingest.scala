package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Ingest parsing — the reference's telnet `put` line protocol and
 * `/api/put` JSON bodies as pure DataFrame transforms (reference:
 * src/tsd/PutDataPointRpc.java:129-266 telnet, :272-430 JSON;
 * validation rules src/core/Tags.java validateString,
 * src/core/TSDB.java:1203-1299 value parsing).
 *
 * Both parsers are pure column expressions, so they compose equally
 * with `spark.read.text` (bulk import, reference
 * src/tools/TextImporter.java:40) and `spark.readStream` (live
 * ingest) — the batch/streaming split costs nothing.
 */

/**
 * Normalize plugin point (reference src/normalize/NormalizePlugin.java:
 * `normalizeTags(Map<String,String>)` — a point-rewrite hook applied
 * to every incoming point's tag map). Spark-native shape: the
 * registered hook is a `Column => Column` rewrite of the parsed `tags`
 * map column, applied inside parsePutLines/parsePutJson after parsing
 * and BEFORE validation (so a normalizer may repair tags), fusing into
 * the parse projection under whole-stage codegen — zero extra passes,
 * unlike a per-row callback. Default is identity.
 */
object NormalizePlugins {
  @volatile private var rewrite: Column => Column = identity
  def register(f: Column => Column): Unit = { rewrite = f }
  def reset(): Unit = { rewrite = identity }
  private[sources] def apply(tags: Column): Column = rewrite(tags)
}

/**
 * Write-time data-point filter plugin (reference
 * src/core/WriteableDataPointFilterPlugin.java — `allowDataPoint(
 * metric, timestamp, value, tags, flags)` gates every store when
 * `filterDataPoints()` is true; `TSDB.storeIntoDB`'s WriteCB drops a
 * rejected point SILENTLY — the put RPC still reports success — and
 * counts it in the `uid.filter.rejected` stat, TSDB.java:1453-1461,
 * :1376-1381, :978).
 *
 * Spark-native shape: the registered allow-predicate is a `Column`
 * expression over the parsed point columns, applied as a plain
 * `filter` in the store path ([[Ingest.applyWriteFilter]]) — it fuses
 * into the parse projection under whole-stage codegen instead of
 * paying a per-row callback, and a predicate on `metric` alone pushes
 * down to the scan when the source is columnar. The rejected count is
 * a relational side-output ([[Ingest.writeFilterRejected]]) rather
 * than a mutable process counter: at 1000 executors a driver-side
 * AtomicLong cannot see executor-side drops anyway, so the count is
 * computed where the data is and fed to `Introspect.incr` by the
 * ingest driver loop per batch.
 */
object WriteFilterPlugins {
  @volatile private var pred
    : Option[(Column, Column, Column, Column) => Column] = None
  /** Register the allow-predicate over (metric, ts, value, tags);
    * registering turns the gate on (= filterDataPoints() true). */
  def register(f: (Column, Column, Column, Column) => Column): Unit =
    pred = Some(f)
  def reset(): Unit = pred = None
  def enabled: Boolean = pred.isDefined
  private[sources] def allow(metric: Column, ts: Column, value: Column,
                             tags: Column): Column =
    pred.map(f => f(metric, ts, value, tags)).getOrElse(lit(true))
}

object Ingest {

  /** Charset rule for metric/tagk/tagv (reference Tags.validateString,
    * src/core/Tags.java:549-565: alphanumerics plus `-_./` and unicode
    * letters). */
  val NAME_RE = "^[a-zA-Z0-9\\-_./\\p{L}]+$"

  /** Extra characters admitted by the charset rule — the
    * `tsd.core.tag.allow_specialchars` config knob (reference
    * Tags.isAllowSpecialChars; empty by default). */
  @volatile var allowSpecialChars: String = ""

  /** The effective charset regex including any configured specials. */
  private[sources] def nameRe: String =
    if (allowSpecialChars.isEmpty) NAME_RE
    else "^[a-zA-Z0-9\\-_./\\p{L}" +
      allowSpecialChars.flatMap(c => "\\" + c) + "]+$"

  /** Tag-count cap per point (reference Const.MAX_NUM_TAGS,
    * src/core/Const.java:28 — a performance guard on series width). */
  val MAX_NUM_TAGS = 8

  /**
   * Parse telnet-style lines `put <metric> <ts> <value> <tagk=tagv> ...`
   * from a one-column DataFrame (`value` string) into the canonical
   * point schema. Invalid rows land in a `_error` column instead of
   * being dropped (callers decide whether to route them to a dead
   * letter sink — the analogue of the reference's
   * StorageExceptionHandler plugin).
   */
  /** Relational let-binding (same trick as TextAnalysis.bindOnce): the
    * lambda sees `v` as a bound variable, so however many times the
    * BODY references it, `v` evaluates once per evaluation of the
    * whole expression. */
  private def bindOnce(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  def parsePutLines(lines: DataFrame): DataFrame = {
    // The whole parse is ONE struct-valued expression, let-bound at
    // every expensive intermediate (parts / tagkv / tags / ts_num) and
    // emitted through a GENERATOR (explode of a 1-element array).
    // Why the generator: downstream queries filter on `_error` and
    // project several of these columns; Catalyst pushes such filters
    // below the parse projections and SUBSTITUTES the aliased
    // expressions into the predicate — .explain showed the full
    // render+split tree inlined 15+ times into a single Filter
    // condition (once per `parts` reference, including inside
    // interpreted exists/transform lambdas where codegen subexpression
    // elimination cannot reach). A Generate node is a barrier neither
    // CollapseProject nor predicate pushdown rewrites through on the
    // generated column, so the parse runs EXACTLY once per line no
    // matter what the consumer does — at ingest scale this is the
    // difference between one and ~15 split+regex passes per byte.
    //
    // Parse semantics (all reference-contract, unchanged):
    // - single-SPACE split, exactly the reference's telnet word
    //   splitter (WordSplitter.decode → Tags.splitString(line, ' ')):
    //   doubled spaces produce empty tokens that fail the charset/tag
    //   checks, as they do in the reference
    // - try_element_at / try_cast, not element_at / cast: under ANSI
    //   mode (Spark 4 default) out-of-bounds or bad casts THROW, so a
    //   truncated line like "put m" would abort the whole batch
    //   instead of flowing to _error
    // - a dot in the timestamp is STRIPPED before the long parse — the
    //   reference's exact quirk (PutDataPointRpc.importDataPoint:
    //   756-760), which makes "1356998400.500" the ms form and
    //   "1356998400.5" a (weird but contractual) 13569984005; seconds
    //   vs millis auto-detect by magnitude (Const.java:89-92)
    // - get(), not getItem(): a tag token without '=' must yield a
    //   null value (→ _error), not an ANSI array-index error
    // - strict tag-token shape (Tags.parse, src/core/Tags.java:128-144
    //   throws on anything but exactly one '=' with non-empty sides):
    //   'a=b=c' and 'a=' / '=b' route to _error
    val rec = bindOnce(split(trim(col("value")), " ")) { p =>
      bindOnce(transform(
          slice(p, lit(5), greatest(size(p) - 4, lit(0))),
          t => split(t, "="))) { tagkv =>
        bindOnce(NormalizePlugins(map_from_entries(transform(tagkv, t =>
            struct(get(t, lit(0)), get(t, lit(1))))))) { tags =>
          bindOnce(replace(try_element_at(p, lit(3)), lit("."), lit(""))
              .try_cast("bigint")) { tsNum =>
            val metric = try_element_at(p, lit(2))
            val vStr = try_element_at(p, lit(4))
            val isInt = vStr.rlike("^-?\\d+$")
            val value = vStr.try_cast("double")
            val err =
              when(try_element_at(p, lit(1)) =!= "put",
                lit("not a put command"))
                .when(size(p) < 5, lit("too few fields"))
                .when(value.isNull, lit("bad value"))
                // <= 0 rejected at the RPC (importDataPoint:761); the
                // ms form is capped at 13 digits
                // (TSDB.checkTimestampAndTags)
                .when(tsNum.isNull || tsNum <= 0 ||
                  tsNum > 9999999999999L, lit("bad timestamp"))
                // reference IncomingDataPoints.checkMetricAndTags:115
                // — at most Const.MAX_NUM_TAGS (8) tags per point (the
                // ≥1 rule is subsumed by the field-count check above)
                .when(size(tags) > MAX_NUM_TAGS, lit("too many tags"))
                .when(!metric.rlike(nameRe), lit("bad metric charset"))
                .when(exists(tagkv, t =>
                    size(t) =!= 2 || get(t, lit(0)) === "" ||
                      get(t, lit(1)) === "") ||
                  exists(map_values(tags), _.isNull), lit("bad tag"))
            struct(
              metric.as("metric"),
              when(tsNum > 4294967295L, tsNum).otherwise(tsNum * 1000)
                .as("ts"),
              value.as("value"),
              when(isInt, vStr.try_cast("bigint")).as("value_l"),
              isInt.as("is_int"),
              tags.as("tags"),
              err.as("_error"))
          }
        }
      }
    }
    lines.select(explode(array(rec)).as("__p"))
      .select(col("__p.metric").as("metric"), col("__p.ts").as("ts"),
        col("__p.value").as("value"), col("__p.value_l").as("value_l"),
        col("__p.is_int").as("is_int"), col("__p.tags").as("tags"),
        col("__p._error").as("_error"))
  }

  /** JSON body schema of /api/put (single object or array of
    * IncomingDataPoint — reference src/core/IncomingDataPoint.java:41). */
  val putJsonSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("metric", StringType),
    StructField("timestamp", LongType),
    StructField("value", StringType),
    StructField("tags", MapType(StringType, StringType)))))

  /** Parse /api/put JSON bodies (one per row, object or array), with
    * the same `_error` channel as the line parser — the reference's
    * JSON path runs the identical IncomingDataPoint validation
    * (PutDataPointRpc.java:272-430 → checkMetricAndTags), reporting
    * per-point failures through ?summary/?details. */
  def parsePutJson(bodies: DataFrame): DataFrame = {
    val arr = when(trim(col("value")).startsWith("["), col("value"))
      .otherwise(concat(lit("["), col("value"), lit("]")))
    bodies
      .withColumn("dp", explode(from_json(arr, putJsonSchema)))
      .select(
        col("dp.metric").as("metric"),
        when(col("dp.timestamp") > 4294967295L, col("dp.timestamp"))
          .otherwise(col("dp.timestamp") * 1000).as("ts"),
        expr("try_cast(dp.value AS DOUBLE)").as("value"),
        when(col("dp.value").rlike("^-?\\d+$"),
          expr("try_cast(dp.value AS BIGINT)")).as("value_l"),
        col("dp.value").rlike("^-?\\d+$").as("is_int"),
        NormalizePlugins(col("dp.tags")).as("tags"))
      .withColumn("_error",
        when(col("metric").isNull || col("metric") === "",
          lit("missing metric"))
          .when(col("ts").isNull || col("ts") <= 0, lit("bad timestamp"))
          .when(col("value").isNull, lit("bad value"))
          .when(col("tags").isNull || size(col("tags")) === 0,
            lit("need at least one tag"))
          .when(size(col("tags")) > MAX_NUM_TAGS, lit("too many tags"))
          .when(!col("metric").rlike(nameRe), lit("bad metric charset"))
          .when(exists(map_keys(col("tags")), k => !k.rlike(nameRe)) ||
            exists(map_values(col("tags")), v => !v.rlike(nameRe)),
            lit("bad tag")))
  }

  /** JSON body schema of /api/rollup (reference
    * src/tsd/RollupDataPointRpc.java: pre-aggregated points carry the
    * source interval and aggregator). */
  val rollupJsonSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("metric", StringType),
    StructField("timestamp", LongType),
    StructField("value", StringType),
    StructField("interval", StringType),
    StructField("aggregator", StringType),
    StructField("tags", MapType(StringType, StringType)))))

  /** Parse /api/rollup JSON bodies: externally pre-aggregated points →
    * (metric, ts, tags, interval_ms, aggregator, value), appendable to
    * a rollup table consumed by Engine rollup routing. */
  def parseRollupJson(bodies: DataFrame): DataFrame = {
    val arr = when(trim(col("value")).startsWith("["), col("value"))
      .otherwise(concat(lit("["), col("value"), lit("]")))
    bodies
      .withColumn("rp", explode(from_json(arr, rollupJsonSchema)))
      .select(
        col("rp.metric").as("metric"),
        when(col("rp.timestamp") > 4294967295L, col("rp.timestamp"))
          .otherwise(col("rp.timestamp") * 1000).as("ts"),
        col("rp.tags").as("tags"),
        col("rp.interval").as("interval"),
        lower(col("rp.aggregator")).as("aggregator"),
        expr("try_cast(rp.value AS DOUBLE)").as("value"))
  }

  /**
   * Parse telnet-style rollup lines
   * `rollup <interval-agg[:spatialagg]> <metric> <ts> <value> <tagk=tagv>...`
   * (reference RollupDataPointRpc.importDataPoint:85-160: a dash in
   * the first part splits interval-temporalAgg, a colon appends the
   * spatial aggregator, a bare token is a spatial-only "groupby"
   * rollup). Same validation channel as [[parsePutLines]], same
   * output shape as [[parseRollupJson]] plus `spatial_agg`.
   */
  def parseRollupLines(lines: DataFrame): DataFrame = {
    // Same one-evaluation generator shape as [[parsePutLines]] (see
    // the rationale there): the whole parse is a single let-bound
    // struct expression behind an explode barrier.
    val rec = bindOnce(split(trim(col("value")), " ")) { p =>
      bindOnce(transform(
          slice(p, lit(6), greatest(size(p) - 5, lit(0))),
          t => split(t, "="))) { tagkv =>
        bindOnce(NormalizePlugins(map_from_entries(transform(tagkv, t =>
            struct(get(t, lit(0)), get(t, lit(1))))))) { tags =>
          bindOnce(replace(try_element_at(p, lit(4)), lit("."), lit(""))
              .try_cast("bigint")) { tsNum =>
            bindOnce(split(try_element_at(p, lit(2)), ":")) { iaParts =>
              val ivPart = try_element_at(iaParts, lit(1))
              val spPart = try_element_at(iaParts, lit(2))
              val dash = instr(ivPart, "-")
              val metric = try_element_at(p, lit(3))
              val vStr = try_element_at(p, lit(5))
              val value = vStr.try_cast("double")
              val interval = when(dash > 0, substring_index(ivPart, "-", 1))
              val aggregator =
                when(dash > 0, lower(substring_index(ivPart, "-", -1)))
              val spatialAgg =
                lower(coalesce(spPart, when(dash === 0, ivPart)))
              val err =
                when(try_element_at(p, lit(1)) =!= "rollup",
                  lit("not a rollup command"))
                  .when(size(p) < 6, lit("too few fields"))
                  .when(aggregator.isNull && spatialAgg.isNull,
                    lit("missing interval or aggregator"))
                  .when(value.isNull, lit("bad value"))
                  .when(tsNum.isNull || tsNum <= 0 ||
                    tsNum > 9999999999999L, lit("bad timestamp"))
                  .when(size(tags) > MAX_NUM_TAGS, lit("too many tags"))
                  .when(!metric.rlike(nameRe), lit("bad metric charset"))
                  .when(exists(tagkv, t =>
                      size(t) =!= 2 || get(t, lit(0)) === "" ||
                        get(t, lit(1)) === "") ||
                    exists(map_values(tags), _.isNull), lit("bad tag"))
              struct(
                metric.as("metric"),
                when(tsNum > 4294967295L, tsNum).otherwise(tsNum * 1000)
                  .as("ts"),
                tags.as("tags"),
                interval.as("interval"),
                aggregator.as("aggregator"),
                spatialAgg.as("spatial_agg"),
                value.as("value"),
                err.as("_error"))
            }
          }
        }
      }
    }
    lines.select(explode(array(rec)).as("__p"))
      .select(col("__p.metric").as("metric"), col("__p.ts").as("ts"),
        col("__p.tags").as("tags"), col("__p.interval").as("interval"),
        col("__p.aggregator").as("aggregator"),
        col("__p.spatial_agg").as("spatial_agg"),
        col("__p.value").as("value"), col("__p._error").as("_error"))
  }

  /**
   * Parse telnet-style histogram lines
   * `histogram <metric> <ts> [codec-id] <base64-blob> <tagk=tagv>...`
   * (reference HistogramDataPointRpc.importDataPoint:100-145: the
   * third word is the integer codec id when it parses as one,
   * otherwise the blob itself — faithfully ambiguous for an all-digit
   * base64 string, as in the reference). Emits the raw blob +
   * codec_id for `Histograms.decodeBlobs` to run through the codec
   * registry; `codec_id` is null when the line omitted it (the
   * reference falls back to its configured default codec).
   */
  def parseHistogramLines(lines: DataFrame): DataFrame = {
    // Same one-evaluation generator shape as [[parsePutLines]] (see
    // the rationale there).
    val rec = bindOnce(split(trim(col("value")), " ")) { p =>
      bindOnce(try_element_at(p, lit(4)).rlike("^-?\\d+$")) { hasId =>
        bindOnce(transform(
            when(hasId, slice(p, lit(6), greatest(size(p) - 5, lit(0))))
              .otherwise(slice(p, lit(5), greatest(size(p) - 4, lit(0)))),
            t => split(t, "="))) { tagkv =>
          bindOnce(NormalizePlugins(map_from_entries(transform(tagkv, t =>
              struct(get(t, lit(0)), get(t, lit(1))))))) { tags =>
            bindOnce(replace(try_element_at(p, lit(3)), lit("."), lit(""))
                .try_cast("bigint")) { tsNum =>
              bindOnce(when(hasId, try_element_at(p, lit(5)))
                  .otherwise(try_element_at(p, lit(4)))) { blobB64 =>
                val metric = try_element_at(p, lit(2))
                // unbase64 THROWS on malformed input — gate on the
                // strict base64 shape so junk flows to _error instead
                // of aborting
                val blob = when(blobB64.rlike("^[A-Za-z0-9+/]+={0,2}$") &&
                  length(blobB64) % 4 === 0, unbase64(blobB64))
                val err =
                  when(try_element_at(p, lit(1)) =!= "histogram",
                    lit("not a histogram command"))
                    .when(size(p) < 5, lit("too few fields"))
                    .when(blobB64.isNull || blob.isNull,
                      lit("bad histogram blob"))
                    .when(tsNum.isNull || tsNum <= 0 ||
                      tsNum > 9999999999999L, lit("bad timestamp"))
                    .when(size(tags) > MAX_NUM_TAGS, lit("too many tags"))
                    .when(!metric.rlike(nameRe), lit("bad metric charset"))
                    .when(exists(tagkv, t =>
                        size(t) =!= 2 || get(t, lit(0)) === "" ||
                          get(t, lit(1)) === "") ||
                      exists(map_values(tags), _.isNull), lit("bad tag"))
                struct(
                  metric.as("metric"),
                  when(tsNum > 4294967295L, tsNum).otherwise(tsNum * 1000)
                    .as("ts"),
                  tags.as("tags"),
                  when(hasId, try_element_at(p, lit(4)).cast("int"))
                    .as("codec_id"),
                  blob.as("blob"),
                  err.as("_error"))
              }
            }
          }
        }
      }
    }
    lines.select(explode(array(rec)).as("__p"))
      .select(col("__p.metric").as("metric"), col("__p.ts").as("ts"),
        col("__p.tags").as("tags"), col("__p.codec_id").as("codec_id"),
        col("__p.blob").as("blob"), col("__p._error").as("_error"))
  }

  /** JSON body schema of /api/histogram (reference
    * src/tsd/HistogramDataPointRpc.java; SimpleHistogram pojo with a
    * bucket map keyed "lo,hi"). */
  val histogramJsonSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("metric", StringType),
    StructField("timestamp", LongType),
    StructField("buckets", MapType(StringType, LongType)),
    StructField("tags", MapType(StringType, StringType)))))

  /** Parse /api/histogram JSON bodies into relational histogram rows
    * (metric, ts, tags, bucket_lo, bucket_hi, count) — the engine's
    * histogram model (SURVEY §1.5), mergeable by plain groupBy+sum. */
  def parseHistogramJson(bodies: DataFrame): DataFrame = {
    val arr = when(trim(col("value")).startsWith("["), col("value"))
      .otherwise(concat(lit("["), col("value"), lit("]")))
    bodies
      .withColumn("hp", explode(from_json(arr, histogramJsonSchema)))
      .select(
        col("hp.metric").as("metric"),
        when(col("hp.timestamp") > 4294967295L, col("hp.timestamp"))
          .otherwise(col("hp.timestamp") * 1000).as("ts"),
        col("hp.tags").as("tags"),
        explode(col("hp.buckets")).as(Seq("bucket", "count")))
      .select(col("metric"), col("ts"), col("tags"),
        split(col("bucket"), ",").getItem(0).cast("double").as("bucket_lo"),
        split(col("bucket"), ",").getItem(1).cast("double").as("bucket_hi"),
        col("count"))
  }

  /**
   * Store-side gate of the [[WriteFilterPlugins]] predicate: keeps
   * allowed points, drops rejected ones with NO `_error` (the
   * reference's put summary still reports them as success —
   * PutDataPointRpc sees a completed deferred). Identity when no
   * filter is registered, so the unfiltered path pays nothing.
   */
  def applyWriteFilter(parsed: DataFrame): DataFrame =
    if (!WriteFilterPlugins.enabled) parsed
    else parsed.filter(WriteFilterPlugins.allow(
      col("metric"), col("ts"), col("value"), col("tags")))

  /** The registered write filter's verdict as a column (true = allow;
    * literal true when no filter is registered) — lets a caller fold
    * the stored/rejected split into ONE pass with conditional
    * aggregates instead of two complementary filters of the same
    * parse subtree. */
  def writeFilterAllows(metric: Column, ts: Column, value: Column,
                        tags: Column): Column =
    if (!WriteFilterPlugins.enabled) lit(true)
    else WriteFilterPlugins.allow(metric, ts, value, tags)

  /** The rejected complement — the relational `uid.filter.rejected`
    * counter (reference TSDB.java:978). Valid rows the filter refused;
    * rows that already failed parsing are NOT counted (the reference
    * throws on those before the filter runs). */
  def writeFilterRejected(parsed: DataFrame): DataFrame = {
    val base = if (parsed.columns.contains("_error"))
      parsed.filter(col("_error").isNull) else parsed
    base.filter(!WriteFilterPlugins.allow(
      col("metric"), col("ts"), col("value"), col("tags")))
  }

  /**
   * Structured Streaming ingest: file/socket/kafka line source →
   * parsed points → parquet sink partitioned by date, with
   * watermarking + per-(series, ts) dedup — the streaming replacement
   * for the reference's compaction-time last-write-wins dedup
   * (src/core/CompactionQueue.java:267-500).
   */
  /**
   * Session clone for streaming queries with a bounded stateful/shuffle
   * partition count. A stateful streaming operator materializes one
   * state-store instance per shuffle partition and commits one delta
   * file per instance per micro-batch, so a stream inherits the BATCH
   * session's shuffle width (|cores| locally, thousands on a cluster)
   * as pure per-trigger fixed cost. Streaming state partitioning
   * should track stateful-key cardinality and ingest throughput, not
   * batch shuffle width — parameterized via
   * `spark.graft.stream.shufflePartitions` (default 4; a production
   * ingest sized for millions of live series raises it — the state
   * partition count is pinned by the checkpoint at first start, which
   * is exactly why it deserves its own knob). Results are partition-
   * count-invariant: keyed state operators see the same per-key row
   * multiset either way. Measured (Scratch --stream, q63 pipeline,
   * local[32], sf0.1, warm): 32 partitions 5.8 s → 4 partitions 2.9 s.
   */
  def streamSession(s: SparkSession): SparkSession = {
    val n = try s.conf.get("spark.graft.stream.shufflePartitions")
      catch { case _: Exception => "4" }
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", n)
    ss
  }

  def streamToParquet(spark: SparkSession, lines: DataFrame, outPath: String,
                      checkpoint: String, lateness: String = "10 minutes") = {
    val pts = applyWriteFilter(parsePutLines(lines)
        .filter(col("_error").isNull).drop("_error"))
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      // dedup on the canonical series hash: map-type columns are not
      // valid dropDuplicates keys, and the hash matches the query-side
      // series identity (sorted tag entries)
      .withColumn("series_id",
        graft.model.Points.seriesId(col("metric"), col("tags")))
      .dropDuplicates("series_id", "ts")
      .withColumn("date", to_date(col("event_time")))
    pts.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("date")
  }

  /**
   * Small-file compaction for the streaming sink's output — the batch
   * analog of the reference's storage compaction
   * (src/core/CompactionQueue.java:340+): each micro-batch writes a
   * file per partition, so a long-running stream accumulates thousands
   * of small files per date and scan planning degrades. Rewrites each
   * date partition into ~`targetFileBytes`-sized files (one shuffle,
   * partitioned by date so rewritten dates replace atomically via
   * dynamic partition overwrite).
   */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    // Spark refuses to overwrite a path it is reading, so compaction
    // writes to a sibling temp dir and swaps via filesystem rename
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val parts = math.max(1, (totalBytes / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "_compacting")
    fs.delete(tmp, true)
    spark.read.parquet(path)
      .repartition(parts, col("date"))
      .write.partitionBy("date").parquet(tmp.toString)
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
  }

  /**
   * `/api/put?summary` / `?details` response (reference
   * PutDataPointRpc.java:272-430): success/failed counts over a parsed
   * batch, plus the per-row error messages for the details form.
   */
  def putSummary(parsed: DataFrame): DataFrame =
    parsed.agg(
      sum(when(col("_error").isNull, 1L).otherwise(0L)).as("success"),
      sum(when(col("_error").isNotNull, 1L).otherwise(0L)).as("failed"))

  /** The `details` error list: one row per rejected point. */
  def putDetails(parsed: DataFrame): DataFrame =
    parsed.filter(col("_error").isNotNull)
      .select(col("_error").as("error"), col("metric"), col("ts"))

  /**
   * Real-time publisher hook — the reference's RTPublisher plugin
   * (src/tsd/RTPublisher.java, publishDataPoint per ingested point):
   * a second consumer of the ingest stream via foreachBatch, so the
   * same micro-batch feeds the durable sink and any push target
   * (Kafka producer, alert evaluator, ...) without re-reading the
   * source.
   */
  def withPublisher(parsed: DataFrame, publish: (DataFrame, Long) => Unit) =
    parsed.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
      publish(batch.toDF(), id)
    }

  /**
   * Rollup materialization as a tumbling-window streaming aggregation
   * (replaces the reference's offline rollup jobs + SplitRollupQuery
   * stitching, src/rollup/RollupUtils.java:120-160): emits
   * (metric, tags, window_start, sum, count, min, max) per interval so
   * query-time avg = sum/count matches the reference's rollup-aware
   * downsampling (src/core/Downsampler.java:163-210).
   */
  def rollupStream(points: DataFrame, interval: String = "1 hour",
                   lateness: String = "10 minutes"): DataFrame =
    points
      // group on the series hash — a map column is not an orderable
      // grouping key — and carry metric/tags through as first()s; the
      // output schema matches Rollups.materialize, so the stream sink
      // is directly registrable as an Engine.RollupTable
      .withColumn("series_id",
        graft.model.Points.seriesId(col("metric"), col("tags")))
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(col("series_id"), window(col("event_time"), interval).as("w"))
      .agg(first(col("metric")).as("metric"), first(col("tags")).as("tags"),
        sum(col("value")).as("sum"), count(col("value")).as("count"),
        min(col("value")).as("min"), max(col("value")).as("max"))
      .select(col("metric"), col("tags"), col("series_id"),
        unix_millis(col("w.start")).as("ts"),
        col("sum"), col("count"), col("min"), col("max"))

  /** One arriving point for [[rateStream]] (typed for the encoder). */
  case class RatePoint(seriesId: Long, metric: String, ts: Long,
                       value: Double)
  /** Per-series rate state: the last seen (ts, value) — 24 bytes. */
  case class RateState(ts: Long, value: Double)
  /** One emitted rate point. */
  case class RateOut(seriesId: Long, metric: String, ts: Long, rate: Double)

  /**
   * Streaming per-series RATE — the streaming form of §2.7
   * (reference src/core/RateSpan.java:103-180 semantics: seconds-based
   * dv/dt, counter rollover via counterMax, resetValue spike-to-zero,
   * dropResets): each series keeps ONE (ts, value) pair of state via
   * `flatMapGroupsWithState`, so state is bounded by series
   * cardinality, never by stream length — the custom-state Structured
   * Streaming path for operators the windowed-agg machinery can't
   * express (rate needs the *previous point*, not a window aggregate).
   *
   * Each micro-batch's points are processed in event-time order per
   * series; a point at-or-before the carried state timestamp (a
   * cross-batch straggler) is dropped like the batch path drops
   * zero-interval pairs — feed an event-time-ordered source (or accept
   * that stragglers produce no rate) for batch-identical output.
   */
  def rateStream(points: DataFrame,
                 opts: graft.query.RateOptions = graft.query.RateOptions())
      : org.apache.spark.sql.Dataset[RateOut] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withColumn("series_id",
        graft.model.Points.seriesId(col("metric"), col("tags")))
      .select(col("series_id").as("seriesId"), col("metric"), col("ts"),
        col("value"))
      .as[RatePoint]
      .groupByKey(_.seriesId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, it: Iterator[RatePoint], state: GroupState[RateState]) => {
          val out = Seq.newBuilder[RateOut]
          var prev = state.getOption
          it.toSeq.sortBy(_.ts).foreach { p =>
            prev match {
              case Some(pr) if p.ts > pr.ts =>
                val dt = (p.ts - pr.ts) / 1000.0
                val delta = p.value - pr.value
                if (!(opts.dropResets && delta < 0)) {
                  val r =
                    if (opts.counter && delta < 0)
                      (opts.counterMax.toDouble - pr.value + p.value) / dt
                    else delta / dt
                  val clipped =
                    if (opts.counter && opts.resetValue > 0 &&
                      r > opts.resetValue) 0.0
                    else r
                  out += RateOut(p.seriesId, p.metric, p.ts, clipped)
                }
                prev = Some(RateState(p.ts, p.value))
              case Some(_) => // straggler at/behind state: no rate point
              case None => prev = Some(RateState(p.ts, p.value))
            }
          }
          prev.foreach(state.update)
          out.result().iterator
        })
  }

  /**
   * Sliding-window streaming aggregation — the streaming form of
   * `movingAverage(time)` (SURVEY §2.12: tumbling covers rollups,
   * sliding comes free from the same windowed-aggregation machinery).
   * Each point lands in `interval`/`slide` overlapping windows; state
   * is bounded by the watermark exactly like [[rollupStream]].
   */
  def slidingAvgStream(points: DataFrame, interval: String = "10 minutes",
                       slide: String = "5 minutes",
                       lateness: String = "10 minutes"): DataFrame =
    points
      .withColumn("series_id",
        graft.model.Points.seriesId(col("metric"), col("tags")))
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", lateness)
      .groupBy(col("series_id"),
        window(col("event_time"), interval, slide).as("w"))
      .agg(first(col("metric")).as("metric"), first(col("tags")).as("tags"),
        avg(col("value")).as("avg"), count(col("value")).as("count"))
      .select(col("metric"), col("tags"), col("series_id"),
        unix_millis(col("w.start")).as("ts"), col("avg"), col("count"))
}
