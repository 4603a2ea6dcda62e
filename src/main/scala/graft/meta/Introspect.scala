package graft.meta

import graft.operators.Aggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Introspection endpoints — /api/aggregators, /api/config,
 * /api/version, /api/stats (reference: src/tsd/RpcManager.java:280-331,
 * src/tsd/HttpJsonSerializer.java formatAggregatorsV1 etc.). Each is a
 * small DataFrame so the serialization layer stays uniform with query
 * results.
 */
object Introspect {

  /** GET /api/aggregators — the registered aggregator names. */
  def aggregators(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Aggregators.all.toDF("aggregator")
  }

  /** GET /api/version. */
  def version(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("graft", "2.0", spark.version))
      .toDF("name", "version", "spark_version")
  }

  /** GET /api/config — the engine-relevant Spark session confs. */
  def config(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq.toDF("key", "value")
  }

  /** GET /api/serializers — the serializer plugin listing (reference
    * src/tsd/RpcManager.java serializers endpoint; the JSON serializer's
    * shortName and content types, HttpJsonSerializer.java:127,
    * HttpSerializer.java:95-98). One built-in here: the V1 JSON shaping
    * in Engine.serializeV1/serializeExpJson. */
  def serializers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("json", "graft.Engine.serializeV1",
      "application/json", "application/json; charset=UTF-8"))
      .toDF("serializer", "class", "request_content_type",
        "response_content_type")
  }

  /** GET|DELETE /api/dropcaches (reference src/tsd/DropCachesRpc.java:
    * 55-84): drops the engine result cache, operator-owned persisted
    * intermediates, and the Spark table cache; responds with the
    * reference's status map. */
  def dropCaches(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.Engine.clearResultCache()
    graft.util.Caching.releaseOwned()
    spark.catalog.clearCache()
    incr("http.dropcaches")
    Seq(("200", "Caches dropped")).toDF("status", "message")
  }

  // ---- /api/status (reference src/tsd/RpcManager.java:651-704,
  // Status RPC): a lifecycle string driven by table availability —
  // "startup" until the first full check, then ok | partial | error;
  // "shutting-down" is terminal. The reference probes its HBase
  // tables; the Spark equivalent probes that each registered table
  // path/DataFrame is readable.
  @volatile private var lifecycle = "startup"

  /** RpcManager.shutdown(): the status pins to shutting-down. */
  def shutdown(): Unit = { lifecycle = "shutting-down" }

  /** Test/restart hook. */
  def resetStatus(): Unit = { lifecycle = "startup" }

  /**
   * GET|telnet `status`. `tables` are probes (usually cheap
   * `spark.read.parquet(path)` frames); a probe is available when its
   * schema resolves and a 1-row read succeeds. All → ok, some →
   * partial, none → error — except during startup, where total
   * unavailability stays "startup" (the reference's
   * AvailabilityToStatusCB grace).
   */
  def status(spark: SparkSession, tables: Seq[() => DataFrame]): DataFrame = {
    import spark.implicits._
    if (lifecycle != "shutting-down" && tables.nonEmpty) {
      val up = tables.count { t =>
        try { t().limit(1).count(); true } catch { case _: Exception => false }
      }
      if (up == tables.length) lifecycle = "ok"
      else if (up > 0) lifecycle = "partial"
      else if (lifecycle != "startup") lifecycle = "error"
    }
    Seq(lifecycle).toDF("status")
  }

  /** GET /api/stats over a points table: per-metric row counts and time
    * bounds (the reference reports TSD counters; a Spark engine's
    * equivalent operational stats are per-table). */
  def stats(points: DataFrame): DataFrame =
    points.groupBy(col("metric"))
      .agg(count(lit(1)).as("points"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("max_ts"))
      .withColumnRenamed("max_ts", "last_ts")

  /**
   * /api/uid name registry: deterministic name⇄id assignment per kind
   * (metric / tagk / tagv). The reference allocates 3-byte UIDs by
   * atomic-increment CAS on first sight (src/uid/UniqueId.java:509-561,
   * src/tsd/UniqueIdRpc.java:48-124) — order-of-arrival ids held in the
   * `tsdb-uid` table. A Spark engine has no single ingest-order
   * authority, so ids are the dense rank of the name within its kind:
   * stable, reproducible, rebuildable from the data alone.
   *
   * Scale: dense numbering needs a total order per kind, but a
   * `Window.partitionBy(kind)` would sort ALL tag values in one task.
   * Instead: range-partitioned distributed sort on (kind, name) +
   * `zipWithIndex` (per-partition offsets, one lightweight count job),
   * then per-kind rebasing via a broadcast min — no single-task stage
   * at any cardinality.
   */
  def uidRegistry(points: DataFrame): DataFrame = {
    val spark = points.sparkSession
    // ONE scan for all three kinds (guide §2.4): the old 3-branch
    // union re-scanned the points table per kind; one explode of the
    // concatenated (kind, name) struct array emits the same rows
    val names = points.select(explode(concat(
        array(struct(lit("metric").as("kind"), col("metric").as("name"))),
        transform(map_keys(col("tags")),
          k => struct(lit("tagk").as("kind"), k.as("name"))),
        transform(map_values(col("tags")),
          v => struct(lit("tagv").as("kind"), v.as("name"))))).as("kn"))
      .select(col("kn.kind").as("kind"), col("kn.name").as("name"))
      .filter(col("name").isNotNull)
      .distinct()
    val sorted = names.repartitionByRange(col("kind"), col("name"))
      .sortWithinPartitions("kind", "name")
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.getString(0), r.getString(1), i)
    }
    val idx = spark.createDataFrame(indexed,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("gidx",
          org.apache.spark.sql.types.LongType))))
    val base = idx.groupBy("kind").agg(min(col("gidx")).as("base"))
    // localCheckpoint: registry consumers (assign/rename/delete point
    // checks, fsck/sync joins, stored-table derivations) read the
    // registry several times, and zipWithIndex has ALREADY run its
    // offsets job eagerly — without the checkpoint every read re-runs
    // the distinct→range-shuffle→sort→index lineage as its own multi-
    // stage job (q79's profile: the registry subtree re-derived ~6
    // times). Truncating to the materialized blocks makes each read a
    // LogicalRDD scan and keeps downstream Catalyst plans small. The
    // registry is the distinct name set — wire-scale next to the data.
    val out = idx.join(broadcast(base), "kind")
      .select(col("kind"), col("name"), (col("gidx") - col("base") + 1).as("uid"))
      .localCheckpoint(true)
    // generation-bounded ownership: dropcaches / session teardown must
    // release the checkpoint blocks (Caching.ownMaterialized doc)
    graft.util.Caching.ownMaterialized("introspect.uidRegistry", out)
    out
  }

  /**
   * The `/api/suggest` endpoint (reference SuggestRpc,
   * src/tsd/SuggestRpc.java:40-95 + UniqueId.suggest,
   * src/uid/UniqueId.java:971-1010): `type` ∈ metrics | tagk | tagv,
   * prefix match on the name, name-sorted (the reference's UID-table
   * scan order), `max` defaulting to 25 (MAX_SUGGESTIONS,
   * UniqueId.java:89). GET reads the query string; POST reads the
   * flat JSON map ([[graft.query.Serdes.parseSuggest]]) — the V1 API
   * requires `type` in both with distinct error texts. Returns the
   * ordered suggestion frame; [[graft.query.Serdes.formatSuggest]]
   * renders the wire array.
   */
  def suggestRpc(points: DataFrame, params: Map[String, String] = Map.empty,
                 method: String = "GET",
                 body: Option[String] = None,
                 meta: Option[DataFrame] = None): DataFrame = {
    method.toUpperCase match {
      case "GET" | "POST" =>
      case other => throw new IllegalArgumentException(
        s"The HTTP method [$other] is not permitted for this endpoint")
    }
    val (typ, q, maxS) = body match {
      case Some(b) =>
        val m = graft.query.Serdes.parseSuggest(b)
        val t = m.getOrElse("type", "")
        if (t == null || t.isEmpty) throw new IllegalArgumentException(
          "Missing 'type' parameter")
        (t, Option(m.getOrElse("q", "")).getOrElse(""), m.get("max"))
      case None =>
        val t = params.getOrElse("type", throw new IllegalArgumentException(
          "Missing parameter <code>type</code>"))
        (t, params.getOrElse("q", ""), params.get("max"))
    }
    val max = maxS.filter(_ != null).filter(_.nonEmpty).map { s =>
      try s.toInt catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          "Unable to parse 'max' as a number")
      }
    }.filter(_ > 0).getOrElse(25)
    // a tag name exists only if it was WRITTEN: a null-valued map entry
    // is an absent tag, exactly as the lookup grammar treats it. With a
    // maintained seriesMeta the name universe is read from O(series)
    // meta rows, never the raw points (the reference suggests from the
    // UID table, an O(names) scan — UniqueId.suggest)
    val src = meta.getOrElse(points)
    val names = typ match {
      case "metrics" => src.select(col("metric").as("suggestion"))
      case "tagk" =>
        src.select(explode(col("tags")).as(Seq("suggestion", "v")))
          .filter(col("v").isNotNull).select("suggestion")
      case "tagv" =>
        src.select(explode(map_values(col("tags"))).as("suggestion"))
      case other => throw new IllegalArgumentException(
        // the reference's exact text — no space after the colon
        "Invalid 'type' parameter:" + other)
    }
    names.filter(col("suggestion").isNotNull &&
        col("suggestion").startsWith(q))
      .distinct().orderBy("suggestion").limit(max)
  }

  /** Distinct-series table (metric + tags), the base for suggest /
    * lookup / tsuid-style queries (reference src/meta/TSMeta.java).
    * This is the batch recompute; [[mergeSeriesMeta]] maintains a
    * STORED copy incrementally so the discovery endpoints (lookup,
    * suggest) read O(series) meta instead of aggregating raw history
    * per call — the reference's tsdb-meta table, which
    * TimeSeriesLookup scans (src/search/TimeSeriesLookup.java:180-210)
    * and MetaSync rebuilds offline. */
  def seriesMeta(points: DataFrame): DataFrame =
    points.groupBy(col("metric"), col("tags"))
      .agg(min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"),
        count(lit(1)).as("points"))

  /** Incremental maintenance for a stored [[seriesMeta]]: fold a
    * micro-batch of points in (foreachBatch body, the companion of
    * [[mergeLastWrite]]). first_seen/last_seen/points merge
    * associatively, so any batch split replays to the batch recompute
    * regardless of arrival order; state is O(series). */
  def mergeSeriesMeta(stored: DataFrame, batch: DataFrame): DataFrame =
    combineSeriesMeta(stored, seriesMeta(batch))

  /** Associative merge of two [[seriesMeta]] TABLES (both already
    * aggregated) — the kernel [[mergeSeriesMeta]] and the bucketed
    * [[MetaStore]] fold share. */
  def combineSeriesMeta(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("metric"), col("tags"))
      .agg(min(col("first_seen")).as("first_seen"),
        max(col("last_seen")).as("last_seen"),
        sum(col("points")).as("points"))

  /** /api/search/lookup — series discovery by metric and exact tag
    * values. Registered search plugins get first chance to serve the
    * query from an external index (reference SearchPlugin.executeQuery
    * / resolveTSQuery, src/search/SearchPlugin.java:152-164); None
    * falls through to the relational scan over [[seriesMeta]]. Empty
    * metric = any metric, matching the reference's lookup API. */
  def lookup(points: DataFrame, metric: String = "",
             tags: Map[String, String] = Map.empty,
             meta: Option[DataFrame] = None): DataFrame =
    SearchPlugins.lookup(metric, tags).getOrElse {
      val mf = if (metric.isEmpty) lit(true) else col("metric") === metric
      val tf = tags.map { case (k, v) => col("tags").getItem(k) === v }
        .reduceOption(_ && _).getOrElse(lit(true))
      meta.getOrElse(seriesMeta(points)).filter(mf && tf)
    }

  /**
   * The FULL lookup grammar over tag pairs where either side may be
   * absent (reference TimeSeriesLookup, src/search/TimeSeriesLookup
   * .java:49-80): `(k, v)` matches the exact pair, `(k, "")` matches
   * any series CARRYING tag key k, `("", v)` matches any series with
   * v as SOME tag's value. Combination rules, verbatim from the
   * reference doc: distinct tagks AND; a bare tagk OVERRIDES pairs on
   * the same key ("host=web01 host=" returns all series with host);
   * bare tagvs OR among themselves and AND against the rest
   * ("host=web01 =lga" = the pair AND any tag valued lga). Empty
   * metric = any metric. Output = [[seriesMeta]] rows.
   */
  def lookupPairs(points: DataFrame, metric: String = "",
                  pairs: Seq[(String, String)] = Seq.empty,
                  meta: Option[DataFrame] = None): DataFrame = {
    val bareKs = pairs.collect { case (k, "") if k.nonEmpty => k }.toSet
    val kvPairs = pairs.filter { case (k, v) =>
      k.nonEmpty && v.nonEmpty && !bareKs.contains(k) }
    val bareVs = pairs.collect { case ("", v) if v.nonEmpty => v }
    val mf = if (metric.isEmpty) lit(true) else col("metric") === metric
    val kf = bareKs.map(k => col("tags").getItem(k).isNotNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    val pf = kvPairs.map { case (k, v) => col("tags").getItem(k) === v }
      .reduceOption(_ && _).getOrElse(lit(true))
    val vf = bareVs.map(v => array_contains(map_values(col("tags")), v))
      .reduceOption(_ || _).getOrElse(lit(true))
    meta.getOrElse(seriesMeta(points)).filter(mf && kf && pf && vf)
  }

  /** One `/api/query/last` sub query: TSUIDs take precedence over
    * metric+tags (reference QueryRpc.handleLastDataPointQuery:459-484 —
    * "TSUID queries take precedence so if there are any TSUIDs listed,
    * process the TSUIDs and ignore the metric/tags"). */
  case class LastPointSpec(metric: String = "",
                           tags: Map[String, String] = Map.empty,
                           tsuids: Seq[String] = Seq.empty)

  /**
   * LAST-WRITE meta table — one row per series: (tsuid, timestamp,
   * value, metric, tags) of its newest point. The reference's
   * equivalent is the `ts_counter` qualifier in the meta table
   * (TSUIDQuery.getLastWriteTimes, src/meta/TSUIDQuery.java:239-316 —
   * an O(series) meta read, NOT a data scan), which `/api/query/last`
   * with backScan=0 serves from when meta tracking is enabled
   * (getLastPoint:185-190). Deliberate divergence, documented: keyed
   * on the DATA timestamp (max ts), not the HBase cell write time the
   * reference stores — "the timestamp will be the time stored by
   * HBase, not the actual timestamp of the data point"
   * (TSUIDQuery.java:245-247) is storage-arrival-order-dependent;
   * max(data ts) is deterministic under replay and is what the
   * endpoint's output reports anyway.
   *
   * This is the batch recompute (one shuffle on the series hash,
   * O(series) output). [[mergeLastWrite]] maintains it incrementally
   * from the streaming sink; [[queryLast]] reads it for the backScan=0
   * path so a dashboard poll never aggregates raw history.
   */
  def lastWriteMeta(points: DataFrame): DataFrame =
    graft.model.Points.withSeriesId(points)
      .withColumn("tsuid", hex(col("series_id")))
      .groupBy(col("tsuid"))
      .agg(max(col("ts")).as("timestamp"),
        max_by(when(col("is_int"), col("value_l").cast("string"))
          .otherwise(col("value").cast("string")), col("ts")).as("value"),
        max_by(col("metric"), col("ts")).as("metric"),
        max_by(col("tags"), col("ts")).as("tags"))

  /**
   * Incremental maintenance for [[lastWriteMeta]]: max-merge a
   * micro-batch of POINTS into the stored meta table — the
   * `foreachBatch` body for the streaming ingest sink (the reference
   * updates ts_counter per write when tsuid tracking is on,
   * TSDB.java incrementing TSMeta counters). Each merge shuffles only
   * the batch's series reduction plus the O(series) stored table —
   * state never grows with stream length. MetaSync reconciles offline
   * (a batch [[lastWriteMeta]] recompute IS the reconciliation).
   */
  def mergeLastWrite(stored: DataFrame, batch: DataFrame): DataFrame =
    combineLastWrite(stored, lastWriteMeta(batch))

  /** Associative max-merge of two [[lastWriteMeta]] TABLES — shared by
    * [[mergeLastWrite]] and the bucketed [[MetaStore]] fold. */
  def combineLastWrite(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("tsuid"))
      .agg(max(col("timestamp")).as("timestamp"),
        max_by(col("value"), col("timestamp")).as("value"),
        max_by(col("metric"), col("timestamp")).as("metric"),
        max_by(col("tags"), col("timestamp")).as("tags"))

  /**
   * `/api/query/last` — the most recent point per addressed series
   * (reference QueryRpc.handleLastDataPointQuery, src/tsd/QueryRpc
   * .java:342-505 + TSUIDQuery.getLastPoint, src/meta/TSUIDQuery
   * .java:146-218).
   *
   * `backScan == 0` is the META path: series matching the metric plus
   * any given tag pairs (no tags → every series of the metric,
   * TestQueryRpcLastDataPoint.qsMetricMetaScan) report their last
   * point regardless of age — the meta table remembers the last write.
   * `backScan = N > 0` is the hour-row scan: the tag set must address
   * the series exactly ("Tags cannot be null or empty when getting a
   * TSUID", TSUIDQuery.tsuidFromMetric:481; a partial set builds a
   * TSUID that stores nothing, so it matches nothing), and only points
   * within the N hour rows ending at `now`'s hour row are visible
   * (getLastPoint iterates back from Internal.baseTime(now)). TSUID
   * addressing bypasses name resolution entirely; series with no point
   * in range are omitted (FetchCB drops nulls).
   *
   * Output: one row per found series — `tsuid` (this engine's series
   * address: the 64-bit series-hash hex, the q48 contract), `timestamp`
   * (ms), `value` as a STRING (the reference emits IncomingDataPoint
   * .value — longs render without a decimal point), plus `metric` and
   * `tags` when `resolve` (absent otherwise, NON_NULL serialization).
   *
   * `lastMeta`: a maintained [[lastWriteMeta]] table. When provided,
   * the backScan=0 path is served from it — an O(series) pruned read,
   * the reference's meta-vs-scan split (getLastPoint reads ts_counter
   * when meta tracking is enabled, TSUIDQuery.java:185-190) — with the
   * raw aggregation kept as the no-meta fallback, exactly the
   * reference's behavior with tracking disabled. backScan>0 always
   * scans raw data (the reference's hour-row iteration reads the data
   * table regardless of meta).
   *
   * `now` anchors the backScan hour-row cutoff and defaults to call
   * time; a serving tier MUST pin it once per HTTP request (the
   * reference captures DateTime.currentTimeMillis() once per
   * getLastPoint call) so retries/replans of the same request see the
   * same hour window — lazy DataFrames would otherwise re-read the
   * clock at each action.
   */
  def queryLast(points: DataFrame, specs: Seq[LastPointSpec],
                backScan: Int = 0, resolve: Boolean = false,
                now: Long = System.currentTimeMillis(),
                lastMeta: Option[DataFrame] = None,
                metaEnabled: Boolean = true): DataFrame = {
    if (backScan < 0) throw new IllegalArgumentException(
      "Backscan must be zero or a positive number")
    // `metaEnabled` mirrors tsd.core.meta.enable_tsuid_tracking|
    // incrementing (TSUIDQuery.getLastPoint:171-190): with meta
    // DISABLED there is no last-write record, so backScan=0 degrades
    // to scanning ONLY now's hour row (LastPointCB iterates at most
    // back_scan times past the base row — TestTSUIDQuery
    // .getLastPointMetricZeroBackscanOutOfRange) and metric addressing
    // always demands the full tag set (tsuidFromMetric:477-483, even
    // at backScan=0 — getLastPointMetricEmptyTags).
    val scanPath = backScan > 0 || !metaEnabled
    val metaPath = !scanPath && lastMeta.isDefined
    // addressing is identical over raw points and the meta table: both
    // carry (tsuid, metric, tags)
    def address(src: DataFrame): DataFrame = specs.map { sp =>
      if (sp.tsuids.nonEmpty)
        src.filter(col("tsuid").isin(sp.tsuids.map(_.toUpperCase): _*))
      else {
        if (sp.metric.isEmpty) throw new IllegalArgumentException(
          "The metric cannot be empty")
        if (scanPath && sp.tags.isEmpty)
          throw new IllegalArgumentException(
            "Tags cannot be null or empty when getting a TSUID")
        val pairs = sp.tags.map { case (k, v) =>
          col("tags").getItem(k) === v }
          .reduceOption(_ && _).getOrElse(lit(true))
        // meta path: tag-subset match; backscan path: the exact series
        val tf =
          if (scanPath) pairs && size(col("tags")) === sp.tags.size
          else pairs
        src.filter(col("metric") === sp.metric && tf)
      }
    }.reduce(_ unionByName _)
    val last =
      if (metaPath)
        // one row per series already — overlapping sub queries dedup on
        // the series address; no aggregation over points anywhere
        address(lastMeta.get.select(
            "tsuid", "timestamp", "value", "metric", "tags"))
          .dropDuplicates("tsuid")
      else {
        val ws = graft.model.Points.withSeriesId(points)
          .withColumn("tsuid", hex(col("series_id")))
        val base = now / 3600000L * 3600000L
        // the scan path sees the hour rows [base − backScan h, base]
        // ONLY: LastPointCB iterates DOWNWARD from base, so a point in
        // a FUTURE hour row is invisible to it (a point later within
        // the base row itself is visible — a row read returns the
        // whole row)
        val range =
          if (!scanPath) lit(true)
          else col("ts") >= (base - backScan * 3600000L) &&
            col("ts") < base + 3600000L
        address(ws).filter(range)
          .groupBy(col("tsuid"))
          .agg(max(col("ts")).as("timestamp"),
            max_by(when(col("is_int"), col("value_l").cast("string"))
              .otherwise(col("value").cast("string")), col("ts")).as("value"),
            max_by(col("metric"), col("ts")).as("metric"),
            max_by(col("tags"), col("ts")).as("tags"))
      }
    if (resolve)
      last.select("tsuid", "timestamp", "value", "metric", "tags")
    else last.select("tsuid", "timestamp", "value")
  }

  /** formatLastPointQueryV1 (reference HttpJsonSerializer): the JSON
    * array document over [[queryLast]]'s rows — `[]` when nothing
    * matched, metric/tags present only on resolved queries. */
  def lastPointJson(df: DataFrame): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    val resolved = df.columns.contains("metric")
    df.collect().foreach { r =>
      val o = arr.addObject()
      o.put("timestamp", r.getAs[Long]("timestamp"))
      o.put("value", r.getAs[String]("value"))
      o.put("tsuid", r.getAs[String]("tsuid"))
      if (resolved) {
        o.put("metric", r.getAs[String]("metric"))
        val t = o.putObject("tags")
        r.getAs[Map[String, String]]("tags").toSeq.sortBy(_._1)
          .foreach { case (k, v) => t.put(k, v) }
      }
    }
    mapper.writeValueAsString(arr)
  }

  // ---- runtime counters (the reference's StatsCollector namespace,
  // src/stats/StatsCollector.java — `tsd.rpc.received`-style counts
  // incremented by the engine and ingest paths) ------------------------

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()

  /** Increment a named runtime counter (driver-side, thread-safe). */
  def incr(name: String, by: Long = 1L): Unit =
    counters.computeIfAbsent(name,
      _ => new java.util.concurrent.atomic.LongAdder).add(by)

  /** GET /api/stats, counter half: current runtime counter values. */
  def statsCounters(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    counters.asScala.toSeq.map { case (k, v) => (k, v.sum) }
      .sorted.toDF("metric", "value")
  }

  private val latencies = new java.util.concurrent.ConcurrentHashMap[
    String, LatencyHistogram]()

  /** Track a latency sample under `name` — the reference's
    * `httplatency.add(processing_time)` (HttpQuery.java:701), with the
    * same default histogram shape (max 16 s, 2 ms linear buckets up to
    * 100 ms: `new Histogram(16000, (short) 2, 100)`). */
  def recordLatency(name: String, ms: Int): Unit =
    latencies.computeIfAbsent(name,
      _ => new LatencyHistogram(16000, 2, 100)).add(ms)

  /** GET /api/stats, latency half: each tracked histogram reported as
    * the reference's four percentile rows (StatsCollector
    * .record(name, histo): `<name>_50pct/_75pct/_90pct/_95pct`). */
  def statsLatency(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    latencies.asScala.toSeq.flatMap { case (name, h) =>
      Seq(50, 75, 90, 95).map(p =>
        (s"${name}_${p}pct", h.percentile(p).toLong))
    }.sorted.toDF("metric", "value")
  }

  /** Test hook: reset all runtime counters. */
  def resetStats(): Unit = { counters.clear(); latencies.clear() }
}
