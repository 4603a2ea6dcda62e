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
    val names = points.select(lit("metric").as("kind"), col("metric").as("name"))
      .unionByName(points.select(lit("tagk").as("kind"),
        explode(map_keys(col("tags"))).as("name")))
      .unionByName(points.select(lit("tagv").as("kind"),
        explode(map_values(col("tags"))).as("name")))
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
    idx.join(broadcast(base), "kind")
      .select(col("kind"), col("name"), (col("gidx") - col("base") + 1).as("uid"))
  }

  /** Distinct-series table (metric + tags), the base for suggest /
    * lookup / tsuid-style queries (reference src/meta/TSMeta.java). */
  def seriesMeta(points: DataFrame): DataFrame =
    points.groupBy(col("metric"), col("tags"))
      .agg(min(col("ts")).as("first_seen"), max(col("ts")).as("last_seen"),
        count(lit(1)).as("points"))

  /** /api/search/lookup — series discovery by metric and exact tag
    * values. Registered search plugins get first chance to serve the
    * query from an external index (reference SearchPlugin.executeQuery
    * / resolveTSQuery, src/search/SearchPlugin.java:152-164); None
    * falls through to the relational scan over [[seriesMeta]]. Empty
    * metric = any metric, matching the reference's lookup API. */
  def lookup(points: DataFrame, metric: String = "",
             tags: Map[String, String] = Map.empty): DataFrame =
    SearchPlugins.lookup(metric, tags).getOrElse {
      val mf = if (metric.isEmpty) lit(true) else col("metric") === metric
      val tf = tags.map { case (k, v) => col("tags").getItem(k) === v }
        .reduceOption(_ && _).getOrElse(lit(true))
      seriesMeta(points).filter(mf && tf)
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

  /** Test hook: reset all runtime counters. */
  def resetStats(): Unit = counters.clear()
}
