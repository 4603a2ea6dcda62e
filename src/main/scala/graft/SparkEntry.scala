package graft

import graft.model.Points
import graft.operators._
import graft.query._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` where the
 * semantics are SQL-expressible.
 *
 * Conventions shared by Spark queries and oracles so result hashes
 * match: timestamps are epoch-millis BIGINT named `ts`; tags are flat
 * string columns `tag_user`/`tag_k`; float results are rounded to 4
 * decimals on both sides; every query ends with a deterministic ORDER BY.
 */
object SparkEntry {

  // ---- shared helpers -------------------------------------------------

  private val DAY = 86400000L
  private val HOUR = 3600000L
  private val T_0105 = 1704412800000L // 2024-01-05T00:00:00Z
  private val T_0120 = 1705708800000L // 2024-01-20T00:00:00Z

  private[graft] def pts(s: SparkSession, dir: String): DataFrame =
    Points.fromEvents(s, dir)

  /** Flatten the tags map to tag_user / tag_k output columns. */
  private def flat(df: DataFrame): DataFrame = {
    val cols = Seq(
      col("metric"),
      col("tags").getItem("user").as("tag_user"),
      col("tags").getItem("k").as("tag_k")) ++
      df.columns.filter(c => c != "metric" && c != "tags" && c != "series_id")
        .map(col)
    df.select(cols: _*)
  }

  /** Round half-away-from-zero on the raw binary double — bit-identical
    * to DuckDB's (sign(x) * floor(abs(x) * 10000 + 0.5) / 10000) (Spark's own `round` re-parses the shortest
    * decimal representation via BigDecimal, which disagrees with the
    * oracle on values like 38.37874999… → "38.37875" → 38.3788). */
  private def r4(c: Column): Column =
    signum(c) * floor(abs(c) * 10000d + 0.5d) / 10000d

  /** DuckDB view of `events` as canonical points (mirror of
    * Points.fromEvents). */
  private val O =
    "WITH points AS (SELECT event_type AS metric, epoch_ms(ts) AS ts, value, " +
    "CAST(user_id AS VARCHAR) AS tag_user, " +
    "json_extract_string(props, '$.k') AS tag_k FROM events)"

  // ---- driver contract ------------------------------------------------

  /** Flagship query on sf=0.001: the full scan→filter→downsample→
    * lerp-group-aggregate pipeline (SURVEY §2.5). */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_groupby_lerp_sum")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    tsdbQueries ++ PipelineQueries.queries

  def oracleSql: Map[String, String] =
    tsdbOracles ++ PipelineQueries.oracles

  private def tsdbQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.1 scan + §2.2 literal_or filter + time-range clip
    "q01_scan_filter" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "click" &&
        col("ts") >= T_0105 && col("ts") < T_0120)
      flat(TagFilters(df, Seq(LiteralOr("user", Seq("1", "2", "3")))))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.2 regexp filter
    "q02_filter_regex" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "view")
      flat(TagFilters(df, Seq(RegexpFilter("k", "^[1-3][0-9]$"))))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.2 not_literal_or + wildcard
    "q03_filter_not_literal" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "error")
      flat(TagFilters(df, Seq(
          NotLiteralOr("user", Seq("1", "2", "3", "4", "5")),
          Wildcard("k", "*"))))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.6 downsample: per-series 1d-sum
    "q04_downsample_sum" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "purchase")
      flat(Downsample(df, DownsampleSpec.parse("1d-sum")))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user", "tag_k")
    }),

    // §2.6 downsample with zero-fill over each series' observed span
    "q05_downsample_avg_fill" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "signup")
      flat(Downsample(df, DownsampleSpec.parse("1d-avg-zero")))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user", "tag_k")
    }),

    // §2.5 cross-series aggregation, ZIM policy (zimsum of 1h sums)
    "q06_groupby_zimsum" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir), DownsampleSpec.parse("1h-sum"))
      Interpolate.aggregate(ds, "zimsum")
        .select(col("metric"), col("ts"), r4(col("value")).as("value"))
        .orderBy("metric", "ts")
    }),

    // §2.5 MAX/MIN sentinel policies (mimmax fills -inf = missing
    // series ignored): cross-series max of per-series hourly maxima
    "q53_mimmax_group" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir), DownsampleSpec.parse("1h-max"))
      Interpolate.aggregate(ds, "mimmax")
        .select(col("metric"), col("ts"), r4(col("value")).as("value"))
        .orderBy("metric", "ts")
    }),

    // §2.5 THE core op: cross-series LERP aggregation of 1h-avg series
    "q07_groupby_lerp_sum" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir).filter(col("metric") === "click"),
        DownsampleSpec.parse("1h-avg"))
      Interpolate.aggregate(ds, "sum")
        .select(col("metric"), col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §2.7 rate over per-series daily sums
    "q08_rate" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir).filter(col("metric") === "purchase"),
        DownsampleSpec.parse("1d-sum"))
      flat(Rate(ds))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.7 counter rate with rollover math
    "q09_rate_counter" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir).filter(col("metric") === "view"),
        DownsampleSpec.parse("1d-sum"))
      flat(Rate(ds, RateOptions(counter = true, counterMax = 10000L)))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.7 dropResets
    "q10_rate_dropresets" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir).filter(col("metric") === "view"),
        DownsampleSpec.parse("1d-sum"))
      flat(Rate(ds, RateOptions(counter = true, dropResets = true)))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.8 highestMax top-k series
    "q11_topk_highestmax" -> ((s, dir) => {
      val ds = flat(Downsample(pts(s, dir).filter(col("metric") === "view"),
        DownsampleSpec.parse("1d-sum")))
      SeriesFunctions.highestMax(ds, 3)
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.8 movingAverage by count
    "q12_moving_avg" -> ((s, dir) => {
      val ds = flat(Downsample(pts(s, dir).filter(col("metric") === "error"),
        DownsampleSpec.parse("1d-avg")))
      SeriesFunctions.movingAverageByCount(ds, 3)
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.8 firstDiff
    "q13_first_diff" -> ((s, dir) => {
      val ds = flat(Downsample(pts(s, dir).filter(col("metric") === "signup"),
        DownsampleSpec.parse("1d-sum")))
      SeriesFunctions.firstDiff(ds)
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.8 timeShift + scale + absolute composition
    "q14_shift_scale_abs" -> ((s, dir) => {
      val df = flat(pts(s, dir).filter(col("metric") === "error"))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"), col("value"))
      SeriesFunctions.absolute(
          SeriesFunctions.scale(SeriesFunctions.timeShift(df, HOUR), -2.5))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.4 the whole aggregator registry over (metric, day) groups
    "q15_aggregators" -> ((s, dir) => {
      val df = pts(s, dir).withColumn("b", col("ts") - col("ts") % DAY)
      df.groupBy(col("metric"), col("b").as("ts"))
        .agg(
          r4(Aggregators.expr("sum", col("value"), col("ts"))).as("sum_v"),
          r4(Aggregators.expr("avg", col("value"), col("ts"))).as("avg_v"),
          r4(Aggregators.expr("min", col("value"), col("ts"))).as("min_v"),
          r4(Aggregators.expr("max", col("value"), col("ts"))).as("max_v"),
          Aggregators.expr("count", col("value"), col("ts")).as("cnt_v"),
          r4(Aggregators.expr("dev", col("value"), col("ts"))).as("dev_v"),
          r4(Aggregators.expr("squareSum", col("value"), col("ts"))).as("sq_v"),
          r4(Aggregators.expr("first", col("value"), col("ts"))).as("first_v"),
          r4(Aggregators.expr("last", col("value"), col("ts"))).as("last_v"),
          r4(Aggregators.expr("diff", col("value"), col("ts"))).as("diff_v"),
          r4(Aggregators.expr("median", col("value"), col("ts"))).as("med_v"),
          r4(Aggregators.expr("p90", col("value"), col("ts"))).as("p90r6_v"),
          r4(Aggregators.expr("ep90r7", col("value"), col("ts"))).as("p90r7_v"))
        .orderBy("metric", "ts")
    }),

    // §2.4 product aggregator (mult) over small groups
    "q16_product" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "purchase")
        .withColumn("b", col("ts") - col("ts") % DAY)
      df.groupBy(col("tags").getItem("user").as("tag_user"), col("b").as("ts"))
        .agg(r4(Aggregators.expr("mult", col("value") / 100.0, col("ts"))).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.14 /api/query/last — last point per series
    "q17_last_point" -> ((s, dir) => {
      flat(pts(s, dir))
        .groupBy("metric", "tag_user", "tag_k")
        .agg(max(col("ts")).as("ts"), r4(max_by(col("value"), col("ts"))).as("value"))
        .orderBy("metric", "tag_user", "tag_k")
    }),

    // §2.14 /api/search/lookup FULL grammar (reference
    // TimeSeriesLookup.java:49-80): a bare tagk ("k=", series carrying
    // the key) AND'd with a bare tagv ("=3", the value anywhere) —
    // beyond q19's exact-pair form
    "q101_lookup_grammar" -> ((s, dir) => {
      graft.meta.Introspect.lookupPairs(pts(s, dir),
          pairs = Seq(("k", ""), ("", "3")))
        .select(col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"),
          col("points"))
        .orderBy("metric", "tag_user", "tag_k")
    }),

    // §2.14 /api/query/last through the REAL endpoint semantics
    // (reference QueryRpc.handleLastDataPointQuery + TSUIDQuery
    // .getLastPoint): two sub queries — an addressed series set
    // (click{user=1}, tag-subset meta match) and a whole-metric meta
    // scan (view) — resolved names, last write per series regardless
    // of age (the meta path)
    "q100_query_last_rpc" -> ((s, dir) => {
      import graft.meta.Introspect
      val out = Introspect.queryLast(pts(s, dir), Seq(
          Introspect.LastPointSpec("click", Map("user" -> "1")),
          Introspect.LastPointSpec("view")),
        backScan = 0, resolve = true)
      out.select(col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"),
          col("timestamp").as("ts"),
          r4(col("value").cast("double")).as("value"))
        .orderBy("metric", "tag_user", "tag_k")
    }),

    // §2.14 /api/query/last backScan=0 through the STORED last-write
    // meta table (reference TSUIDQuery.getLastWriteTimes ts_counter
    // read, the meta-vs-scan split of getLastPoint:185-190): same sub
    // queries and answer as q100, but the query path reads only the
    // O(series) meta table — no raw-history aggregation per poll
    "q103_last_meta_path" -> ((s, dir) => {
      import graft.meta.Introspect
      val p = pts(s, dir)
      val meta = Introspect.lastWriteMeta(p)
      val out = Introspect.queryLast(p, Seq(
          Introspect.LastPointSpec("click", Map("user" -> "1")),
          Introspect.LastPointSpec("view")),
        backScan = 0, resolve = true, lastMeta = Some(meta))
      out.select(col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"),
          col("timestamp").as("ts"),
          r4(col("value").cast("double")).as("value"))
        .orderBy("metric", "tag_user", "tag_k")
    }),

    // §2.14 /api/suggest — metric prefix autocomplete
    "q18_suggest" -> ((s, dir) => {
      pts(s, dir).select(col("metric")).where(col("metric").startsWith("c"))
        .distinct().orderBy("metric").limit(25)
    }),

    // §2.14 /api/suggest through the REAL endpoint contract (reference
    // SuggestRpc.execute + UniqueId.suggest): all three types routed
    // with prefix + max, name-sorted, 25-default — one frame per type
    // union'd under a kind column
    "q105_suggest_rpc" -> ((s, dir) => {
      import graft.meta.Introspect
      val p = pts(s, dir)
      def one(kind: String, params: Map[String, String]) =
        Introspect.suggestRpc(p, params)
          .select(lit(kind).as("kind"), col("suggestion"))
      one("metrics", Map("type" -> "metrics", "q" -> "c"))
        .unionByName(one("tagk", Map("type" -> "tagk")))
        .unionByName(one("tagv", Map("type" -> "tagv", "q" -> "1",
          "max" -> "5")))
        .orderBy("kind", "suggestion")
    }),

    // §2.14 /api/search/lookup — series discovery by tag filter,
    // through the plugin-aware resolver (external index first,
    // relational seriesMeta scan as the fallback exercised here)
    "q19_lookup" -> ((s, dir) => {
      graft.meta.Introspect.lookup(pts(s, dir), tags = Map("user" -> "3"))
        .select(col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"))
        .distinct()
        .orderBy("metric", "tag_k")
    }),

    // §2.3/§2.8 UNION join: sumSeries(click, view) on hourly sums
    "q20_union_sum_series" -> ((s, dir) => {
      def hourly(m: String) = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === m),
          DownsampleSpec.parse("1h-sum")), "zimsum")
        .select(col("ts"), col("value"))
      SeriesFunctions.combineUnion(
          Seq(hourly("click"), hourly("view")), Seq.empty, _ + _, fill = 0.0)
        .select(col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §1.2/§2.9 histogram points + percentile extraction
    "q22_histogram_p90" -> ((s, dir) => {
      val df = pts(s, dir).withColumn("b", col("ts") - col("ts") % DAY)
      val hist = Histograms.fromPoints(df, Seq("metric", "b"), "value", 10.0)
      Histograms.percentile(hist, Seq("metric", "b"), 0.9)
        .select(col("metric"), col("b").as("ts"), r4(col("value")).as("value"))
        .orderBy("metric", "ts")
    }),

    // §2.14 annotations attached to query results by time-interval join
    "q23_annotations" -> ((s, dir) => {
      val sums = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === "click"),
          DownsampleSpec.parse("1d-sum")), "zimsum")
        .select(col("ts"), col("value"))
      val ann = pts(s, dir)
        .filter(col("metric") === "error" && col("value") > 95)
        .select((col("ts") - HOUR).as("start_ts"), (col("ts") + HOUR).as("end_ts"),
          lit("high-error").as("description"))
      graft.meta.Annotations.attach(sums, ann, Seq.empty)
        .groupBy(col("ts"))
        .agg(r4(first(col("value"))).as("value"),
          count(col("description")).as("n_ann"))
        .orderBy("ts")
    }),

    // §2.14 annotation POST merge through the oracle (reference
    // Annotation.syncToStorage overwrite=false → syncNote): an edit
    // setting only `description` keeps each stored row's `notes` and
    // end_ts; untouched identities pass through
    "q106_annotation_merge" -> ((s, dir) => {
      val stored = pts(s, dir).groupBy(col("metric"))
        .agg(min(col("ts")).as("start_ts"))
        .withColumn("end_ts", col("start_ts") + HOUR)
        .withColumn("description", concat(lit("d-"), col("metric")))
        .withColumn("notes", lit("orig"))
      val edits = stored.filter(col("metric").startsWith("c"))
        .select(col("metric"), col("start_ts"),
          lit(null).cast("long").as("end_ts"),
          concat(lit("new-"), col("metric")).as("description"),
          lit(null).cast("string").as("notes"))
      graft.meta.Annotations.upsertMerge(stored, edits, Seq("metric"))
        .select("metric", "start_ts", "end_ts", "description", "notes")
        .orderBy("metric")
    }),

    // §2.12 rollup table: 1d avg served from the 1h rollup (sum/count)
    "q24_rollup_avg" -> ((s, dir) => {
      val rollup = Rollups.materialize(pts(s, dir), HOUR)
      flat(Rollups.downsampleFromRollup(rollup, DownsampleSpec.parse("1d-avg")))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("metric", "tag_user", "tag_k", "ts")
    }),

    // §2.8/§3.3 /api/query/exp infix arithmetic over joined variables
    "q25_exp_infix" -> ((s, dir) => {
      def hourly(m: String) = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === m),
          DownsampleSpec.parse("1h-sum")), "zimsum")
        .select(col("ts"), col("value"))
      ExpQuery.eval("a + b / 2 - (a - b) * 0.5",
          Map("a" -> hourly("click"), "b" -> hourly("view")))
        .select(col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §2.5/§2.3 THE canonical OpenTSDB shape: m=sum:click{user=*} —
    // lerp-sum grouped by a tag subset (reference GroupByAndAggregateCB,
    // src/core/TsdbQuery.java:981-1114)
    "q26_groupby_tag" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir).filter(col("metric") === "click"),
        DownsampleSpec.parse("1h-avg"))
      Interpolate.aggregate(ds, "sum", Seq("user"))
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.3 UNION join with per-series TAG matching (reference
    // UnionIterator aligns result sets by tag set, not just ts):
    // per-user hourly click+view, full-outer on (tag_user, ts), 0-fill
    "q54_union_by_tag" -> ((s, dir) => {
      def hourly(m: String) = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === m),
          DownsampleSpec.parse("1h-sum")), "zimsum", Seq("user"))
      SeriesFunctions.combineUnion(
          Seq(hourly("click"), hourly("view")), Seq("tag_user"),
          _ + _, fill = 0.0)
        .select(col("tag_user"), col("ts"), r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.3 INTERSECTION join with per-series TAG matching: only
    // (user, hour) grid points present in BOTH metrics survive
    "q55_intersect_by_tag" -> ((s, dir) => {
      def hourly(m: String) = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === m),
          DownsampleSpec.parse("1h-sum")), "zimsum", Seq("user"))
      SeriesFunctions.combineIntersection(
          Seq(hourly("click"), hourly("view")), Seq("tag_user"), _ / _)
        .select(col("tag_user"), col("ts"), r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §3.3 the /api/query/exp JSON wire format END-TO-END: POJO body
    // (time/filters/metrics/expressions/outputs, reference
    // src/query/pojo/Query.java:33, compiled per
    // src/tsd/QueryExecutor.java:120-224) → per-metric engine runs →
    // infix expression over a UNION tag join with per-variable fill
    // policies (zero + scalar) → output alias naming the metric
    "q56_exp_json" -> ((s, dir) => {
      val body = s"""{
        "time": {"start": $T_0105, "end": $T_0120, "aggregator": "zimsum",
                 "downsampler": {"interval": "1h", "aggregator": "sum"}},
        "filters": [{"id": "f1", "tags": [
          {"type": "literal_or", "tagk": "user", "filter": "1|2|3",
           "groupBy": true}]}],
        "metrics": [
          {"id": "a", "metric": "click", "filter": "f1",
           "fillPolicy": {"policy": "zero"}},
          {"id": "b", "metric": "view", "filter": "f1",
           "fillPolicy": {"policy": "scalar", "value": 5}}],
        "expressions": [{"id": "e", "expr": "a + b * 2 - 1",
          "join": {"operator": "union"}}],
        "outputs": [{"id": "e", "alias": "combined"}]}"""
      Engine.runExpJson(pts(s, dir), body).head._2
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.12/§4 rollup ROUTING through the engine: a 1d-avg query served
    // from the 1h rollup table up to its freshness horizon, stitched
    // with fresh raw points past it (reference tableToBeScanned +
    // SplitRollupQuery, src/core/TsdbQuery.java:1553-1571)
    "q27_rollup_routed" -> ((s, dir) => {
      val p = pts(s, dir)
      val rollup = Rollups.materialize(p, HOUR)
      val query = TsQuery(T_0105, T_0120 + 7 * DAY, Seq.empty)
      val sub = SubQuery("zimsum", "view",
        Seq(LiteralOr("user", Seq("1", "2", "3", "4", "5"))),
        Some(DownsampleSpec.parse("1d-avg")))
      // the registry is driven by the tsd.rollups.config DOCUMENT
      // (parseConfig → registryTables), not hand-built: the 1h
      // interval's delaySla of 1d against a now of T_0120+1d yields
      // the same freshness horizon (T_0120) the direct registry used —
      // so this row oracle-backs the config parse end-to-end
      val cfg = Rollups.parseConfig(
        """{"intervals":[
            {"interval":"1s","table":"tsdb","preAggregationTable":"tsdb",
             "rowSpan":"1h","defaultInterval":true},
            {"interval":"1h","table":"tsdb-rollup-1h",
             "preAggregationTable":"tsdb-rollup-1h-pre","rowSpan":"1d",
             "delaySla":"1d"}],
           "aggregationIds":{"sum":0,"count":1,"min":2,"max":3}}""")
      val registry = Rollups.registryTables(cfg,
        { case "tsdb-rollup-1h" => rollup }, nowMs = T_0120 + DAY)
      Engine.run(p, query, sub, registry)
        .select(col("metric"), col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §3.1 the m= URI grammar through the full engine: parse → scan →
    // filter → downsample → group-aggregate → clip
    "q28_engine_uri" -> ((s, dir) => {
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      Engine.runM(pts(s, dir), q, "zimsum:1h-sum:click{user=*}")
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.2 wildcard with a real glob PATTERN (not the bare `*`):
    // `{user=1*2}` through the m= URI legacy sugar → Wildcard filter
    // → anchored regex on the scan
    "q52_wildcard_glob" -> ((s, dir) => {
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      Engine.runM(pts(s, dir), q, "zimsum:1h-sum:click{user=1*2}")
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §3.1 the JSON POST /api/query form end-to-end: body parse →
    // filter array (wildcard groupBy + literal_or) → downsample →
    // engine pad/clip (reference HttpJsonSerializer.parseQueryV1)
    "q47_engine_json" -> ((s, dir) => {
      val body =
        """{"start": 1704412800, "end": 1705708800,
           "queries": [{"aggregator": "zimsum", "metric": "click",
             "downsample": "1h-sum",
             "filters": [
               {"type":"wildcard","tagk":"user","filter":"*","groupBy":true},
               {"type":"literal_or","tagk":"k",
                "filter":"10|11|12|13|14|15","groupBy":false}]}]}"""
      Engine.runJson(pts(s, dir), body).head
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §3.1 explicit-series addressing: resolve TSUIDs (hex series
    // hashes) via lookup, then query by tsuids with no metric filter
    // (reference TSSubQuery.tsuids, src/core/TSSubQuery.java:50-104)
    "q48_tsuid_query" -> ((s, dir) => {
      val p = pts(s, dir)
      val ids = graft.model.Points.withSeriesId(p)
        .filter(col("metric") === "click" && col("tags").getItem("user") === "1")
        .select(hex(col("series_id"))).distinct()
        .collect().map(_.getString(0)).toSeq
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      val sub = SubQuery(aggregator = "zimsum", metric = "",
        downsample = Some(DownsampleSpec.parse("1d-sum")), tsuids = ids)
      Engine.run(p, q, sub)
        .select(col("metric"), col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §2.2 case-insensitive filters: iliteral_or + iwildcard
    "q29_filters_ci" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "signup")
      flat(TagFilters(df, Seq(
          LiteralOr("user", Seq("1", "2", "3"), caseInsensitive = true),
          Wildcard("k", "1*", caseInsensitive = true))))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.8 movingAverage by TIME window (rangeBetween frame)
    "q30_moving_avg_time" -> ((s, dir) => {
      val ds = flat(Downsample(pts(s, dir).filter(col("metric") === "purchase"),
        DownsampleSpec.parse("1d-sum")))
      SeriesFunctions.movingAverageByTime(ds, 3 * DAY)
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.8 highestCurrent top-k by most-recent value
    "q31_highest_current" -> ((s, dir) => {
      val ds = flat(Downsample(pts(s, dir).filter(col("metric") === "signup"),
        DownsampleSpec.parse("1d-sum")))
      SeriesFunctions.highestCurrent(ds, 3)
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.5 PREV interpolation policy (pfsum) across the metric's series
    "q32_pfsum_group" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir).filter(col("metric") === "click"),
        DownsampleSpec.parse("1h-sum"))
      Interpolate.aggregate(ds, "pfsum")
        .select(col("metric"), col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §2.2 explicit_tags: series' tag set must equal the filter keys
    // exactly (k dropped for even users → only those survive)
    "q33_explicit_tags" -> ((s, dir) => {
      val base = pts(s, dir).filter(col("metric") === "error")
        .withColumn("tags",
          when(col("tags").getItem("user").cast("int") % 2 === 0,
            map(lit("user"), col("tags").getItem("user")))
          .otherwise(col("tags")))
      flat(TagFilters(base, Seq(GroupByAll("user")), explicitTags = true))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.2 not_key: series must NOT contain the tag key at all
    "q34_not_key" -> ((s, dir) => {
      val base = pts(s, dir).filter(col("metric") === "error")
        .withColumn("tags",
          when(col("tags").getItem("user").cast("int") % 2 === 0,
            map(lit("user"), col("tags").getItem("user")))
          .otherwise(col("tags")))
      flat(TagFilters(base, Seq(NotKey("k"))))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.6 run_all: one bucket spanning the query range, stamped start
    "q35_run_all" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "purchase" &&
        col("ts") >= T_0105 && col("ts") < T_0120)
      flat(Downsample(df, DownsampleSpec.parse("0all-sum"),
          Some((T_0105, T_0120))))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "tag_k")
    }),

    // §2.6 calendar-aligned weekly downsample (tz-aware date_trunc)
    "q36_calendar_week" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "signup")
      flat(Downsample(df, DownsampleSpec.parse("1wc-sum")))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user", "tag_k")
    }),

    // §2.6 calendar month ('n' unit) in a DST-observing timezone:
    // buckets start at local midnight on the 1st, re-expressed in UTC
    "q51_calendar_month" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "purchase")
      flat(Downsample(df, DownsampleSpec.parse("1nc-sum"),
          tz = "America/New_York"))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user", "tag_k")
    }),

    // §2.4 R-3 estimation-type percentile (nearest-even, no interp)
    "q37_ep90r3" -> ((s, dir) => {
      val df = pts(s, dir).withColumn("b", col("ts") - col("ts") % DAY)
      df.groupBy(col("metric"), col("b").as("ts"))
        .agg(r4(Aggregators.expr("ep90r3", col("value"), col("ts"))).as("p90r3_v"),
          Aggregators.expr("count", col("value"), col("ts")).as("cnt_v"))
        .orderBy("metric", "ts")
    }),

    // §2.14 fsck data-quality report (reference src/tools/Fsck.java)
    "q38_fsck" -> ((s, dir) => {
      graft.meta.Fsck.report(pts(s, dir), T_0120).orderBy("check")
    }),

    // §2.8 diffSeries (UNION, 0-fill) + multiplySeries (INTERSECTION)
    "q39_gexp_diff_mult" -> ((s, dir) => {
      def hourly(m: String) = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === m),
          DownsampleSpec.parse("1h-sum")), "zimsum")
        .select(col("ts"), col("value"))
      val a = hourly("click"); val b = hourly("view")
      val d = SeriesFunctions.combineUnion(Seq(a, b), Seq.empty, _ - _,
        fill = 0.0).withColumnRenamed("value", "diff_v")
      val m2 = SeriesFunctions.combineIntersection(Seq(a, b), Seq.empty, _ * _)
        .withColumnRenamed("value", "mult_v")
      d.join(m2, Seq("ts"), "left")
        .select(col("ts"), r4(col("diff_v")).as("diff_v"),
          r4(col("mult_v")).as("mult_v"))
        .orderBy("ts")
    }),

    // §2.14 tree API: rule-driven hierarchy (metric → user tag) with
    // per-node leaf counts, built from STORED rules (reference
    // TreeRule CRUD src/tsd/TreeRpc.java + TreeBuilder.java:62)
    "q40_tree" -> ((s, dir) => {
      import graft.meta.Trees
      val rules = Seq(
        Trees.Rule(1, 0, 0, "METRIC"),
        Trees.Rule(1, 1, 0, "TAGK", field = "user"))
        .foldLeft(Trees.emptyRules(s))(Trees.upsertRule)
      Trees.buildFromRules(pts(s, dir), rules, treeId = 1)
        .orderBy("depth", "path")
    }),

    // §2.8/§3.1 nested gexp through the engine: parse → per-metric
    // sub-query → scale → top-k, one composed Catalyst plan
    "q41_gexp_pipeline" -> ((s, dir) => {
      val p = pts(s, dir)
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      val ast = Gexp.parse(
        "alias(highestMax(scale(zimsum:1h-sum:view{user=*},,2),,3),,topviews)")
      Gexp.eval(ast, spec => Engine.runM(p, q, spec))
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.8 GET /api/query/gexp URI form end-to-end (reference
    // QueryRpc.handleQuery expressions branch:585-610): the exp=
    // param parses, its metric leaves become the TSQuery's sub
    // queries, and each AST evaluates over the fetched data - same
    // answer as q41's direct AST eval
    "q107_gexp_uri" -> ((s, dir) => {
      val p = pts(s, dir)
      val (q, _, exps) = QueryParser.parseUriGexp(
        s"?start=${T_0105 / 1000}&end=${T_0120 / 1000}" +
          "&exp=alias(highestMax(scale(zimsum:1h-sum:view{user=*},,2),,3),,topviews)")
      Gexp.eval(exps.head, spec => Engine.runM(p, q, spec))
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.14 /api/stats/query — the daemon's completed-query stats ring
    // (reference StatsRpc.printQueryStats:326-340 serving
    // QueryStats.getRunningAndCompleteStats, QueryStats.java:398-430):
    // a serving tier registers each query, completion moves it into
    // the size-capped ring keyed by (remote, query, code) with
    // re-executions bumping `executed`, and the endpoint's V1 document
    // explodes relationally. emittedDPs is sourced from the data so
    // the oracle derives the same count.
    "q108_stats_query" -> ((s, dir) => {
      import graft.query.QueryStatsLog
      QueryStatsLog.reset()
      var n = 0L
      val nano = () => { n += 500000000L; n }
      val ms = () => 1388534400000L
      def serve(remote: String, q: String, code: Int, reason: String,
                emitted: Long): Unit = {
        val st = new QueryStatsLog.QueryStats(remote, q,
          nanoClock = nano, msClock = ms)
        st.addStat("emittedDPs", emitted)
        st.markSerialized(code, reason, null)
      }
      val dps = pts(s, dir).filter(col("metric") === "click").count()
      serve("192.168.1.1:4242", "m=sum:click", 200, "OK", dps)
      serve("192.168.1.1:4242", "m=sum:click", 200, "OK", dps)
      serve("10.1.1.2:4242", "m=sum:view", 408, "Request Timeout", 0L)
      val doc = QueryStatsLog.getRunningAndCompleteStats(0L)
      QueryStatsLog.reset()
      import s.implicits._
      s.read.json(Seq(doc).toDS)
        .select(explode(col("completed")).as("c"))
        .select(col("c.remote").as("remote"), col("c.query").as("query"),
          col("c.httpResponse.code").as("code"),
          col("c.executed").as("executed"),
          col("c.stats.emittedDPs").cast("long").as("emitted_dps"))
        .orderBy("remote", "query")
    }),

    // §2.14 /api/stats/query fed by ACTUALLY-SERVED queries: the V1
    // POST path (Engine.runJson under trackServes) registers one
    // QueryStats per body BEFORE parsing (QueryRpc.handleQuery:127),
    // per-sub-query emittedDPs ride the caller's own actions as
    // observe metrics (no pre-count, no second execution), the last
    // frame's completion rolls sub-query stats into the overall slots
    // and the re-served body bumps the ring's executed counter — the
    // oracle derives both sub-queries' emitted row counts from data
    "q110_tracked_serving" -> ((s, dir) => {
      import graft.query.QueryStatsLog
      QueryStatsLog.reset()
      Engine.clearPendingServes()
      val body =
        s"""{"start":$T_0105,"end":$T_0120,"queries":[
           |{"aggregator":"sum","metric":"click","downsample":"1h-sum"},
           |{"aggregator":"max","metric":"view","downsample":"1h-max"}]}"""
          .stripMargin
      Engine.trackServes = true
      try {
        for (_ <- 1 to 2)
          Engine.runJson(pts(s, dir), body, remote = "10.7.7.7:4242")
            .foreach(_.count())
        require(Engine.awaitTrackedServes(), "tracked serves not recorded")
      } finally Engine.trackServes = false
      val doc = QueryStatsLog.getRunningAndCompleteStats(0L)
      QueryStatsLog.reset()
      import s.implicits._
      s.read.json(Seq(doc).toDS)
        .select(explode(col("completed")).as("c"))
        .select(col("c.remote").as("remote"),
          col("c.httpResponse.code").cast("long").as("code"),
          col("c.executed").cast("long").as("executed"),
          col("c.stats.queryIdx_00.emittedDPs").cast("long")
            .as("dps_click"),
          col("c.stats.queryIdx_01.emittedDPs").cast("long")
            .as("dps_view"),
          col("c.stats.emittedDPs").cast("long").as("dps_total"))
    }),

    // §2.10 duration/date parsing oracle-backed (reference
    // src/utils/DateTime.java:57-240, golden vectors from
    // test/utils/TestDateTime.java): the SAME TimeUtils functions every
    // engine start/end/downsample-interval spec routes through, run as
    // a typed Dataset map over a battery covering every unit, both
    // reference quirks ("1min" = 1 month via last-char dispatch;
    // dotted epoch CONCATENATES its digits), the explicit `ms` suffix,
    // string-length epoch disambiguation, relative `-ago` against an
    // injected now, and all three absolute formats — compared against
    // literal expected epochs in the oracle
    "q111_time_parse" -> ((s, dir) => {
      import s.implicits._
      val now = 1700000000000L
      val durs = Seq("5m", "100ms", "4000ms", "30s", "2h", "3d", "2w",
        "1n", "2y", "1min")
      val dates = Seq("now", "5m-ago", "1y-ago", "2018/01/01",
        "2018/01/01-12:30", "2018/01/01 12:30:15", "1356998400",
        "1356998400123", "1356998400.5", "789ms")
      val d = durs.toDS().map(x =>
        (x, "duration", graft.model.TimeUtils.parseDuration(x)))
      val t = dates.toDS().map(x =>
        (x, "date", graft.model.TimeUtils.parseDateTime(x, now)))
      d.union(t).toDF("input", "kind", "value_ms")
        .orderBy("kind", "input")
    }),

    // §2.14 /api/tree/branch hex-addressed browsing (reference
    // TreeRpc.handleBranch:213-253 over Branch.fetchBranch:426-553):
    // the tree builds once into the branch/leaf store, then two
    // branch GETs — the 'click' node (child branches, one per user)
    // and the 'click/7' node (leaves with Leaf's displayName/tsuid/
    // metric fields) — addressed by the reference's row-key hex
    // (2-byte tree id + per-element String.hashCode). The lookups are
    // pushed-down (tree_id, depth, hash-chain) scans, never collects.
    "q109_tree_branch" -> ((s, dir) => {
      import graft.meta.{TreeDefs, Trees}
      val rules = Seq(
        Trees.Rule(1, 0, 0, "METRIC"),
        Trees.Rule(1, 1, 0, "TAGK", field = "user"),
        Trees.Rule(1, 2, 0, "TAGK", field = "k"))
        .foldLeft(Trees.emptyRules(s))(Trees.upsertRule)
      val (branches, leaves) =
        Trees.buildBranchStore(pts(s, dir), rules, treeId = 1)
      val b1 = TreeDefs.browseRows(branches, leaves,
        TreeDefs.branchIdHex(1, Seq("click")))
      val b2 = TreeDefs.browseRows(branches, leaves,
        TreeDefs.branchIdHex(1, Seq("click", "7")))
      b1.unionByName(b2).orderBy("branch", "kind", "display_name")
    }),

    // §2.8 alias TAG TEMPLATING through a gexp pipeline: `@user`
    // advances the group tag into the metric name (reference
    // PostAggregatedDataPoints.metricNameAsync:75-97 — Graphite-style
    // flat naming), composed under scale()
    "q57_alias_template" -> ((s, dir) => {
      val p = pts(s, dir)
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      val ast = Gexp.parse(
        "alias(scale(zimsum:1h-sum:click{user=*},,2),,user.@user.clicks)")
      Gexp.eval(ast, spec => Engine.runM(p, q, spec))
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §3.3 TIME-OVER-TIME through the exp endpoint: metric b is the
    // same series shifted 1 day into the past (Metric.time_offset,
    // reference pojo/Metric.java:43 — declared there, left TODO in
    // QueryExecutor; wired here), so the expression computes
    // day-over-day deltas per user on today's clock
    "q59_exp_time_offset" -> ((s, dir) => {
      val start = T_0105 + DAY
      val body = s"""{
        "time": {"start": $start, "end": $T_0120, "aggregator": "zimsum",
                 "downsampler": {"interval": "1h", "aggregator": "sum"}},
        "filters": [{"id": "f1", "tags": [
          {"type": "literal_or", "tagk": "user", "filter": "1|2|3",
           "groupBy": true}]}],
        "metrics": [
          {"id": "a", "metric": "click", "filter": "f1",
           "fillPolicy": {"policy": "zero"}},
          {"id": "b", "metric": "click", "filter": "f1",
           "timeOffset": "1d-ago", "fillPolicy": {"policy": "zero"}}],
        "expressions": [{"id": "dod", "expr": "a - b",
          "join": {"operator": "union"}}]}"""
      Engine.runExpJson(pts(s, dir), body).head._2
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.1 the telnet `put` WIRE format oracle-backed end-to-end:
    // render every event as a put line (the reference's primary ingest
    // wire, src/tsd/PutDataPointRpc.java), parse it back through
    // Ingest.parsePutLines, and compare the recovered points against
    // the table they came from. A malformed line is unioned in and
    // must flow to _error, not into the output.
    "q58_put_parse" -> ((s, dir) => {
      val ev = pts(s, dir).filter(col("tags").getItem("k").isNotNull)
      val lines = ev.select(concat(
        lit("put "), col("metric"), lit(" "), col("ts").cast("string"),
        lit(" "), col("value").cast("string"),
        lit(" user="), col("tags").getItem("user"),
        lit(" k="), col("tags").getItem("k")).as("value"))
        .unionByName(s.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row("not a put line")),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.StringType)))))
      flat(graft.sources.Ingest.parsePutLines(lines)
          .filter(col("_error").isNull))
        .groupBy("metric", "tag_user", "tag_k")
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"),
          min(col("ts")).as("first_ts"))
        .orderBy("metric", "tag_user", "tag_k")
    }),

    // §2.2 case-insensitivity proven on genuinely mixed-case values:
    // tag k rewritten to 'K<k>', filters match via lowercase only
    "q42_filters_ci_real" -> ((s, dir) => {
      val base = pts(s, dir).filter(col("metric") === "click")
        .withColumn("tags", map(
          lit("user"), col("tags").getItem("user"),
          lit("k"), concat(lit("K"), col("tags").getItem("k"))))
      flat(TagFilters(base, Seq(
          LiteralOr("k", Seq("k1", "k2", "k3", "k10", "k11"),
            caseInsensitive = true),
          Wildcard("k", "k1*", caseInsensitive = true),
          NotLiteralOr("k", Seq("K10"), caseInsensitive = true))))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.9/§3.1 percentiles[] through the engine: histogram build per
    // (group, downsample bucket), one row set per requested percentile
    "q43_engine_percentiles" -> ((s, dir) => {
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      val sub = SubQuery("sum", "purchase", Seq.empty,
        Some(DownsampleSpec.parse("1d-sum")), percentiles = Seq(50.0, 90.0))
      Engine.runPercentiles(pts(s, dir), q, sub, binWidth = 10.0)
        .select(col("metric"), col("ts"), r4(col("value")).as("value"),
          col("ptile"))
        .orderBy("ptile", "ts")
    }),

    // §3.3 exp query with UNION join + fill policy (NumericFillPolicy):
    // hours where only one metric has data fill the other with 0
    "q44_exp_union_fill" -> ((s, dir) => {
      def hourly(m: String) = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === m),
          DownsampleSpec.parse("1h-sum")), "zimsum")
        .select(col("ts"), col("value"))
      ExpQuery.eval("a - b",
          Map("a" -> hourly("click"), "b" -> hourly("purchase")),
          intersect = false, fill = 0.0)
        .select(col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §2.7/§3.1 rate THROUGH the engine: scan pre-padding gives the
    // first in-range bucket its rate neighbor (reference
    // getScanStartTimeSeconds pads for rate)
    "q45_engine_rate" -> ((s, dir) => {
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      Engine.runM(pts(s, dir), q, "zimsum:1d-sum:rate:purchase{user=*}")
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.14 /api/aggregators introspection: the registered aggregator
    // names as a wire-ordered listing (reference RpcManager.java:280-331)
    "q46_aggregators" -> ((s, dir) =>
      graft.meta.Introspect.aggregators(s).orderBy("aggregator")),

    // §2.4 long/double duality at the CROSS-SERIES layer (round 9:
    // moved here from the downsample, matching the reference —
    // Downsampler.java:220/:257 always runs runDouble, while
    // AggregationIterator's long path integer-lerps
    // (nextLongValue:705) and truncates the aggregate
    // (Aggregators.Avg.runLong:371-379, TestTsdbQueryAggregators
    // runAvg/runAvgOffset). All-integral series, misaligned stamps:
    // missing slots integer-lerp and every avg truncates toward zero.
    // Grouped by `user` so each group's slot grid spans ONE user's
    // k-series — metric-wide grouping would make the slot table
    // |series| x |union grid| (measured 11 s at sf0.1; the exact
    // scale-killer shape SCALING.md warns about), while the per-user
    // grouping keeps it linear in points and is the realistic query.
    "q50_int_avg" -> ((s, dir) => {
      val base = pts(s, dir).filter(col("metric") === "click")
        .groupBy(col("tags"), col("ts"))
        .agg(max(expr("CAST(floor(value * 10) AS BIGINT)")).as("value_l"))
        .select(lit("click").as("metric"), col("ts"),
          col("value_l").cast("double").as("value"), col("value_l"),
          lit(true).as("is_int"), col("tags"))
      Interpolate.aggregate(base, "avg", Seq("user"))
        .select(col("metric"), col("tag_user"), col("ts"),
          col("value").cast("long").as("value"))
        .orderBy("ts", "tag_user")
    }),

    // §2.14 /api/uid registry: deterministic name⇄uid per kind
    // (metric/tagk/tagv) via distributed dense numbering
    "q49_uid_registry" -> ((s, dir) =>
      graft.meta.Introspect.uidRegistry(
          pts(s, dir).filter(col("metric").isin("click", "signup")))
        .orderBy("kind", "uid")),

    // §2.14 UID mutations end-to-end: registry → POST /api/uid/assign
    // (one fresh name gets max+1; an existing name is rejected into the
    // report, not the registry) → POST /api/uid/rename (name moves,
    // uid stays) — the full lifecycle the reference's UniqueIdRpc
    // drives, previously unit-only
    // §2.4 `none` aggregator raw bypass (reference Aggregators.NONE:
    // exactly one series passes through untouched, >1 is an error —
    // the error direction stays unit-tested). The single series is
    // picked deterministically: the most-populated (user, k) click
    // series, ties by the lexicographically-lowest pair, resolved via
    // a 1-row lookup (wire-sized collect, like the q48 tsuid harness),
    // then run through the full Engine path with explicit literal_or
    // filters.
    "q75_agg_none" -> ((s, dir) => {
      val p = pts(s, dir).filter(col("metric") === "click" &&
        col("tags").getItem("user").isNotNull &&
        col("tags").getItem("k").isNotNull)
      val sel = p.select(col("tags").getItem("user").as("u"),
          col("tags").getItem("k").as("kk"))
        .groupBy("u", "kk").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("u"), col("kk")).limit(1).head()
      val q = TsQuery(0L, 4102444800000L, Seq.empty)
      val sub = SubQuery("none", "click", Seq(
        LiteralOr("user", Seq(sel.getString(0))),
        LiteralOr("k", Seq(sel.getString(1)))), explicitTags = true)
      Engine.run(p, q, sub)
        .select(col("ts"), r4(col("value")).as("value"))
        .orderBy("ts", "value")
    }),

    // §2.14 UID whitelist filter plugin through the real assign path
    // (reference UniqueIdWhitelistFilter + UniqueId.java:786-794): with
    // a ^zz metric whitelist active, one new name assigns, one blocks
    // with the FailedToAssignUniqueIdException message, and an existing
    // name reports its UID untouched by the filter
    "q102_uid_whitelist" -> ((s, dir) => {
      val reg = graft.meta.Introspect.uidRegistry(
        pts(s, dir).filter(col("metric").isin("click", "signup")))
      graft.meta.Uids.uidFilter = Some(graft.meta.Uids.whitelistFilter(Map(
        "tsd.uidfilter.whitelist.metric_patterns" -> "^zz.*")))
      try {
        val (_, report) = graft.meta.Uids.assign(reg,
          Map("metric" -> Seq("zz.new", "web.hits", "click")))
        report.orderBy("kind", "name")
      } finally graft.meta.Uids.uidFilter = None
    }),

    "q74_uid_mutations" -> ((s, dir) => {
      val reg = graft.meta.Introspect.uidRegistry(
        pts(s, dir).filter(col("metric").isin("click", "signup")))
      val (reg2, _) = graft.meta.Uids.assign(reg,
        Map("metric" -> Seq("zz.new", "click")))
      graft.meta.Uids.rename(reg2, "metric", "signup", "signup2")
        .orderBy("kind", "uid")
    }),

    // §2.14 MetaSync over UIDMeta (reference src/tools/MetaSync.java:
    // 40-50): stored metric rows carry a future `created` (→ fixed to
    // the data's earliest ts), tag uids have no stored meta (→
    // created), and a ghost row backs no data (→ orphan, MetaPurge's
    // target). uid delete exercises the registry-mutation contract on
    // the way in (assign zz.tmp → delete it, net no-op with the error
    // direction unit-tested).
    "q79_meta_sync_uid" -> ((s, dir) => {
      import graft.meta.{Introspect, Uids}
      import s.implicits._
      val p = pts(s, dir).filter(col("metric").isin("click", "signup"))
      val reg0 = Introspect.uidRegistry(p)
      val (regTmp, _) = Uids.assign(reg0, Map("metric" -> Seq("zz.tmp")))
      val reg = Uids.delete(regTmp, "metric", "zz.tmp")
      val stored = reg.filter(col("kind") === "metric")
        .withColumn("created", lit(9999999999999L))
        .unionByName(Seq(("metric", "ghost", 999L, 123L))
          .toDF("kind", "name", "uid", "created"))
      Uids.syncUidMeta(p, reg, stored)
        .orderBy("kind", "name")
    }),

    // §2.14 MetaSync over TSMeta with the canonical readable tsuid:
    // user-1 series stored with a future created (→ fixed), the rest
    // missing (→ created), one ghost tsuid (→ orphan)
    "q80_meta_sync_ts" -> ((s, dir) => {
      import graft.meta.{Trees, Uids}
      import s.implicits._
      val p = pts(s, dir).filter(col("metric") === "purchase")
      val tsuidCol = Trees.canonicalTsuid
      val stored = p.filter(col("tags").getItem("user") === "1")
        .select(tsuidCol.as("tsuid")).distinct()
        .withColumn("created", lit(9999999999999L))
        .unionByName(Seq(("purchase|k=-,user=ghost", 123L))
          .toDF("tsuid", "created"))
      Uids.syncTsMeta(p, stored, tsuidCol)
        .orderBy("tsuid")
    }),

    // §2.14 tree collision side-channel (/api/tree/collisions,
    // reference Tree.addCollision via Branch.addLeaf): a 2-level tree
    // (metric → user) makes every multi-k series of a (metric, user)
    // pair collide on its leaf path; winner = min tsuid (deterministic
    // surrogate for the reference's sync-arrival order)
    "q76_tree_collisions" -> ((s, dir) => {
      import graft.meta.Trees
      val rules = Seq(
        Trees.Rule(1, 0, 0, "METRIC"),
        Trees.Rule(1, 1, 0, "TAGK", field = "user"))
        .foldLeft(Trees.emptyRules(s))(Trees.upsertRule)
      Trees.buildReport(pts(s, dir), rules, treeId = 1).collisions
        .orderBy("tsuid")
    }),

    // §2.14 tree not-matched side-channel (/api/tree/notmatched,
    // reference Tree.addNotMatched; message format
    // TreeBuilder.java:647-650): a 3rd level on tag `k` strands every
    // k-less series with the failed rule's [tree:level:order:TYPE] tag
    "q77_tree_notmatched" -> ((s, dir) => {
      import graft.meta.Trees
      val rules = Seq(
        Trees.Rule(1, 0, 0, "METRIC"),
        Trees.Rule(1, 1, 0, "TAGK", field = "user"),
        Trees.Rule(1, 2, 0, "TAGK", field = "k"))
        .foldLeft(Trees.emptyRules(s))(Trees.upsertRule)
      // the synthetic events always carry both tags; strand every
      // user_id%3==0 series at level 2 by dropping its `k` tag
      val stranded = pts(s, dir).withColumn("tags",
        map(lit("user"), col("tags").getItem("user"),
          lit("k"), when(col("tags").getItem("user").cast("int") % 3 === 0,
            lit(null: String)).otherwise(col("tags").getItem("k"))))
      Trees.buildReport(stranded, rules, treeId = 1).notMatched
        .orderBy("tsuid")
    }),

    // §2.14 /api/tree/test rule trace (reference TreeRpc handleTest /
    // TreeBuilder testing mode): per (series, rule) extracted value,
    // tried (level fallback: order-0 on a missing tag forces the
    // order-1 fallback to run) and matched
    "q78_tree_test" -> ((s, dir) => {
      import graft.meta.Trees
      val rules = Seq(
        Trees.Rule(1, 0, 0, "METRIC"),
        Trees.Rule(1, 1, 0, "TAGK", field = "dc"),
        Trees.Rule(1, 1, 1, "TAGK", field = "user"))
        .foldLeft(Trees.emptyRules(s))(Trees.upsertRule)
      Trees.testRun(pts(s, dir).filter(col("metric") === "click"),
          rules, treeId = 1)
        .orderBy("tsuid", "level", "order")
    }),

    // §2.7+§2.12 streaming per-series rate oracle-backed end-to-end
    // (previously unit-only): unique click points flow through a file
    // stream → flatMapGroupsWithState rate (one (ts, value) state pair
    // per series) → parquet sink; the emitted rates must equal the
    // lag-window batch formulation exactly
    "q82_stream_rate" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = pts(s, dir).filter(col("metric") === "click" &&
          col("tags").getItem("k").isNotNull)
        .groupBy(col("ts"), col("tags").getItem("user").as("u"),
          col("tags").getItem("k").as("k"))
        .agg(max(col("value")).as("value"))
        .select(lit("click").as("metric"), col("ts"), col("value"),
          map(lit("user"), col("u"), lit("k"), col("k")).as("tags"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_q82_")
      val src = tmp.resolve("src").toString
      val out = tmp.resolve("out").toString
      val cp = tmp.resolve("cp").toString
      // one file → one micro-batch → no cross-batch stragglers
      base.coalesce(1).write.parquet(src)
      val ss = graft.sources.Ingest.streamSession(s)
      val stream = ss.readStream.schema(base.schema).parquet(src)
      val q = graft.sources.Ingest.rateStream(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val ser = graft.model.Points.withSeriesId(base)
        .select(col("series_id").as("seriesId"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k")).distinct()
      s.read.parquet(out).join(ser, Seq("seriesId"))
        .select(col("tag_user"), col("tag_k"), col("ts"),
          r4(col("rate")).as("rate"))
        .orderBy("tag_user", "tag_k", "ts")
    }),

    // §2.2/§3.1 the GET /api/query form end-to-end: one query STRING
    // (date-string times, URL-encoded m= with grouping filter, ms +
    // show flags) through QueryParser.parseUri → Engine.run — the
    // same pipeline q28 drives from a pre-built TsQuery
    "q84_uri_get" -> ((s, dir) => {
      val (q, flags) = QueryParser.parseUri(
        "start=2024/01/05-00:00:00&end=2024/01/20-00:00:00&ms" +
          "&m=zimsum:1h-sum:click%7Buser=*%7D&show_query&no_annotations")
      require(q.startMs == T_0105 && q.endMs == T_0120 && q.msResolution)
      require(flags.showQuery && flags.noAnnotations && !flags.showTsuids)
      Engine.run(pts(s, dir), q, q.queries.head)
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.13 budget guards oracle-backed (previously unit-only): the
    // reference's query kill switches (tsd.query.limits.data_points /
    // .bytes, src/core/QueryLimitOverride.java). The same scan runs
    // under a 1-byte / 10-point budget (rejected — plan-time for
    // bytes, execution-time for points) and under a generous budget
    // (passes untouched). Four bounded counts on the driver — the
    // guard verdicts are inherently driver-observable.
    "q85_budget_guards" -> ((s, dir) => {
      import s.implicits._
      val df = pts(s, dir).filter(col("metric") === "click" &&
        col("ts") >= T_0105 && col("ts") < T_0120)
      def run(check: String)(body: => Long): (String, Boolean, Long) =
        try { (check, false, body) }
        catch { case scala.util.control.NonFatal(_) => (check, true, 0L) }
      Seq(
        run("bytes_over")   { Engine.withMaxScanBytes(df, 1L).count() },
        run("bytes_under")  { Engine.withMaxScanBytes(df, Long.MaxValue).count() },
        run("points_over")  { Engine.withMaxDataPoints(df, 10L).count() },
        run("points_under") { Engine.withMaxDataPoints(df, 100000000L).count() })
        .toDF("check", "rejected", "n").orderBy("check")
    }),

    // §2.4 custom aggregator plugin point oracle-backed (previously
    // unit-only): register a "range" (max-min) aggregator (reference
    // Aggregators registry extension, src/core/Aggregators.java:58-120)
    // and run it through the REAL parse path — DownsampleSpec.parse
    // validates the name against the registry exactly like the
    // reference's Aggregators.get, then the engine evaluates it
    // per series-bucket before the zimsum group aggregation.
    "q86_custom_agg" -> ((s, dir) => {
      Aggregators.register("range", (v, _) =>
        coalesce(max(when(!isnan(v), v)) - min(when(!isnan(v), v)),
          lit(Double.NaN)))
      val body =
        """{"start": 1704412800, "end": 1705708800,
           "queries": [{"aggregator": "zimsum", "metric": "click",
             "downsample": "1h-range",
             "filters": [
               {"type":"wildcard","tagk":"user","filter":"*","groupBy":true},
               {"type":"literal_or","tagk":"k",
                "filter":"10|11|12","groupBy":false}]}]}"""
      Engine.runJson(pts(s, dir), body).head
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.2 plugin filter point oracle-backed (previously unit-only):
    // register a custom filter type (reference TagVFilter plugin
    // loading, src/query/filter/TagVFilter.java:45-68) and use it from
    // the URI grammar like any built-in — the PluginFilter predicate
    // is an arbitrary Column expression over the tags map.
    "q87_filter_plugin" -> ((s, dir) => {
      QueryParser.registerFilter("ends_with", (tagk, arg, gb) =>
        PluginFilter(tagk, tags => tags.getItem(tagk).endsWith(arg),
          groupBy = gb))
      val (q, _) = QueryParser.parseUri(
        "start=2024/01/05-00:00:00&end=2024/01/20-00:00:00" +
          "&m=zimsum:1h-sum:view%7Buser=*%7D%7Bk=ends_with(5)%7D")
      Engine.run(pts(s, dir), q, q.queries.head)
        .select(col("metric"), col("tag_user"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("tag_user", "ts")
    }),

    // §2.2 strict metric resolution (reference TsdbQuery.setTimeSeries
    // → NoSuchUniqueName → 400): with the flag on, a query naming a
    // never-written metric errors instead of returning empty, while a
    // known metric runs untouched; flag off restores the relational
    // empty-result default
    "q89_strict_metric" -> ((s, dir) => {
      import s.implicits._
      val q = TsQuery(T_0105, T_0120, Seq.empty)
      def run(check: String, strict: Boolean, metric: String)
        : (String, Boolean, Long) = {
        Engine.strictMetrics = strict
        try { (check, false,
          Engine.run(pts(s, dir), q, SubQuery("sum", metric, Seq.empty,
            Some(DownsampleSpec.parse("1d-sum")))).count()) }
        catch { case _: NoSuchElementException => (check, true, 0L) }
        finally Engine.strictMetrics = false
      }
      Seq(
        run("strict_known", strict = true, "click"),
        run("strict_unknown", strict = true, "no.such.metric"),
        run("lenient_unknown", strict = false, "no.such.metric"))
        .toDF("check", "rejected", "n").orderBy("check")
    }),

    // §2.1 write-time data-point filter plugin (reference
    // WriteableDataPointFilterPlugin, TSDB.storeIntoDB:1453-1461):
    // points with tag k=10 on metric 'click' are refused at store
    // time and dropped SILENTLY — parse reports no error, the stored
    // set just excludes them — with the rejected count surfaced as
    // the relational `uid.filter.rejected` stat
    "q88_write_filter" -> ((s, dir) => {
      graft.sources.WriteFilterPlugins.register((m, _, v, tags) =>
        !(m === "click" && tags.getItem("k") === "10") && !v.isNull)
      try {
        val ev = pts(s, dir).filter(col("tags").getItem("k").isNotNull)
        val lines = ev.select(concat(
          lit("put "), col("metric"), lit(" "), col("ts").cast("string"),
          lit(" "), col("value").cast("string"),
          lit(" user="), col("tags").getItem("user"),
          lit(" k="), col("tags").getItem("k")).as("value"))
        // ONE pass computes both the stored aggregate and the rejected
        // count: the old applyWriteFilter / writeFilterRejected split
        // aggregated two complementary filters of the same parse
        // subtree, and because the filters differ Spark cannot reuse
        // the exchange — .explain showed TWO full scan→render→parse
        // branches (2x the ingest-parse bytes at scale). Here the
        // filter verdict is a flag, conditional aggregates split the
        // rows, and the global rejected total rides a global window
        // over the |metrics|-row aggregate (the r16 shape re-aggregated
        // that subtree into a broadcast crossJoin, and the two reads'
        // pruning divergence defeated ReuseExchange — the plan kept a
        // second full scan→parse branch). The window reads perMetric
        // once, so the whole query is ONE scan. Output identical:
        // the total sums every metric's __rej (including stored-row-
        // less ones) before the n > 0 filter, exactly like the old
        // pre-filter re-aggregation.
        val parsed = graft.sources.Ingest.parsePutLines(lines)
          .filter(col("_error").isNull)
        val flagged = parsed.withColumn("__ok",
          graft.sources.Ingest.writeFilterAllows(
            col("metric"), col("ts"), col("value"), col("tags")))
        val perMetric = flagged.groupBy("metric")
          .agg(sum(when(col("__ok"), 1L)).as("n"),
            r4(sum(when(col("__ok"), col("value")))).as("sum_v"),
            sum(when(!col("__ok"), 1L).otherwise(0L)).as("__rej"))
        perMetric
          .withColumn("rejected_total", sum(col("__rej")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .filter(col("n") > 0).drop("__rej")
          .orderBy("metric")
      } finally graft.sources.WriteFilterPlugins.reset()
    }),

    // §2.1 RT publisher oracle-backed (previously unit-only): the
    // reference's RTPublisher plugin point (publishDataPoint per
    // ingested point) as a foreachBatch second consumer — the same
    // micro-batch feeds the durable sink AND the push target. Here the
    // "push target" is a parquet dir; its contents must reproduce the
    // ingested stream exactly
    "q83_rt_publish" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = pts(s, dir).filter(col("metric") === "view" &&
          col("tags").getItem("k").isNotNull)
        .select(col("metric"), col("ts"), col("value"),
          lit(null).cast("long").as("value_l"), lit(false).as("is_int"),
          col("tags"))
      val lines = graft.sources.Export.toPutLines(base)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q83_")
      val src = tmp.resolve("src").toString
      val out = tmp.resolve("out").toString
      val cp = tmp.resolve("cp").toString
      lines.coalesce(1).write.text(src)
      val ss = graft.sources.Ingest.streamSession(s)
      val parsed = graft.sources.Ingest.parsePutLines(
        ss.readStream.text(src)).filter(col("_error").isNull)
      val q = graft.sources.Ingest.withPublisher(parsed,
          (batch, _) => batch.drop("_error", "value_l", "is_int")
            .withColumn("tag_user", col("tags").getItem("user"))
            .drop("tags")
            .write.mode("append").parquet(out))
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(out)
        .groupBy("metric", "tag_user")
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric", "tag_user")
    }),

    // §2.6 COUNT-AWARE calendar snapping (reference DateTime
    // .previousInterval): 90-minute buckets step from LOCAL midnight
    // in a DST-observing timezone — neither fixed epoch-modulo
    // bucketing nor unit truncation produces these boundaries
    "q81_calendar_90m" -> ((s, dir) => {
      val df = pts(s, dir).filter(col("metric") === "view")
      flat(Downsample(df, DownsampleSpec.parse("90mc-avg"),
          tz = "America/Denver"))
        .select(col("metric"), col("tag_user"), col("tag_k"), col("ts"),
          r4(col("value")).as("value"))
        .orderBy("ts", "tag_user", "tag_k")
    }),

    // §2.3/§2.8 INTERSECTION join: divideSeries(click, view)
    "q21_intersect_divide" -> ((s, dir) => {
      def hourly(m: String) = Interpolate.aggregate(
        Downsample(pts(s, dir).filter(col("metric") === m),
          DownsampleSpec.parse("1h-sum")), "zimsum")
        .select(col("ts"), col("value"))
      SeriesFunctions.combineIntersection(
          Seq(hourly("click"), hourly("view")), Seq.empty, _ / _)
        .select(col("ts"), r4(col("value")).as("value"))
        .orderBy("ts")
    }),

    // §2.1 /api/put JSON bodies oracle-backed end-to-end: render each
    // (metric, user) group of events as an IncomingDataPoint ARRAY body
    // (reference src/core/IncomingDataPoint.java:41, array form of
    // PutDataPointRpc.java:272-430), parse back through
    // Ingest.parsePutJson, and aggregate the recovered points
    "q60_put_json" -> ((s, dir) => {
      val ev = pts(s, dir).filter(col("metric").isin("click", "view"))
      val bodies = ev
        .groupBy(col("metric").as("m"), col("tags").getItem("user").as("u"))
        .agg(to_json(collect_list(struct(
          col("metric"),
          col("ts").as("timestamp"),
          col("value").cast("string").as("value"),
          col("tags")))).as("value"))
        .select("value")
      graft.sources.Ingest.parsePutJson(bodies)
        .groupBy(col("metric"), col("tags").getItem("user").as("tag_user"))
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric", "tag_user")
    }),

    // §2.1 DumpSeries `--import` round-trip oracle-backed (reference
    // src/tools/DumpSeries.java:42): points with a synthetic integer
    // subpopulation (even ts → long form) → Export.toPutLines →
    // Ingest.parsePutLines; the recovered stream must reproduce counts,
    // double sums, long sums and the is_int split exactly — proving the
    // wire format preserves the reference's long/double value duality
    "q61_export_roundtrip" -> ((s, dir) => {
      val base = pts(s, dir).filter(col("metric") === "purchase" &&
        col("tags").getItem("k").isNotNull)
      val mixed = base
        .withColumn("is_int", pmod(col("ts"), lit(2)) === 0)
        .withColumn("value_l",
          when(col("is_int"), expr("CAST(floor(value) AS BIGINT)")))
        .withColumn("value",
          when(col("is_int"), floor(col("value"))).otherwise(col("value")))
      flat(graft.sources.Ingest.parsePutLines(
            graft.sources.Export.toPutLines(mixed))
          .filter(col("_error").isNull))
        .groupBy("metric", "tag_user")
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_int"), 1L).otherwise(0L)).as("n_int"),
          sum(col("value_l")).as("sum_l"),
          r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric", "tag_user")
    }),

    // §2.4 mimmin cross-series aggregation (min-if-missing: absent
    // series never pull the group minimum, reference
    // src/core/Aggregators.java Min interpolation ceiling)
    "q62_mimmin_group" -> ((s, dir) => {
      val ds = Downsample(pts(s, dir), DownsampleSpec.parse("1h-min"))
      Interpolate.aggregate(ds, "mimmin")
        .select(col("metric"), col("ts"), r4(col("value")).as("value"))
        .orderBy("metric", "ts")
    }),

    // §2.12 streaming ingest END-TO-END under oracle: put lines (every
    // line injected TWICE) flow through the real readStream → parse →
    // watermark dedup → date-partitioned parquet path with
    // Trigger.AvailableNow, and the landed table must aggregate exactly
    // like the batch the lines came from — the streaming analogue of the
    // reference's compaction-time last-write-wins dedup
    // (src/core/CompactionQueue.java:267-500)
    "q63_stream_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      // collapse to one value per (series, ts) first: streaming dedup
      // keeps an arbitrary survivor among same-key rows, so the input
      // must be unique for the oracle comparison to be deterministic
      val base = pts(s, dir).filter(col("metric") === "signup" &&
          col("tags").getItem("k").isNotNull &&
          col("ts") >= T_0105 && col("ts") < T_0120)
        .groupBy(col("metric"), col("ts"),
          col("tags").getItem("user").as("u"), col("tags").getItem("k").as("k"))
        .agg(max(col("value")).as("value"))
        .select(col("metric"), col("ts"), col("value"),
          lit(null).cast("long").as("value_l"), lit(false).as("is_int"),
          map(lit("user"), col("u"), lit("k"), col("k")).as("tags"))
      val lines = graft.sources.Export.toPutLines(base)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q63_")
      val src = tmp.resolve("src").toString
      val out = tmp.resolve("out").toString
      val cp = tmp.resolve("cp").toString
      // one output file → one micro-batch → the watermark can never
      // discard in-flight rows as late, whatever the file read order
      lines.unionByName(lines).coalesce(1).write.text(src)
      // bounded state-partition clone (Ingest.streamSession doc): the
      // dedup's 32 state stores were per-trigger fixed cost
      val ss = graft.sources.Ingest.streamSession(s)
      val stream = ss.readStream.text(src)
      val q = graft.sources.Ingest
        .streamToParquet(ss, stream, out, cp, lateness = "36500 days")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(out).groupBy("metric")
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric")
    }),

    // §2.12/§2.13 streaming rollup materialization under oracle:
    // put lines → parse → tumbling 1h windowed aggregation
    // (Ingest.rollupStream, the streaming replacement for the
    // reference's offline rollup jobs src/rollup/RollupUtils.java) via
    // Trigger.AvailableNow + complete-mode memory sink; the emitted
    // per-series rollups re-aggregate to exactly the batch answer
    "q64_stream_rollup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = pts(s, dir).filter(col("metric") === "error" &&
        col("ts") >= T_0105 && col("ts") < T_0120)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q64_")
      val src = tmp.resolve("src").toString
      graft.sources.Export.toPutLines(base).coalesce(1).write.text(src)
      val ss = graft.sources.Ingest.streamSession(s)
      val stream = ss.readStream.text(src)
      val ptsStream = graft.sources.Ingest.parsePutLines(stream)
        .filter(col("_error").isNull).drop("_error")
      val sink = s"q64_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = graft.sources.Ingest.rollupStream(ptsStream, "1 hour")
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink).groupBy("metric", "ts")
        .agg(sum(col("count")).as("n"), r4(sum(col("sum"))).as("sum_v"),
          r4(min(col("min"))).as("min_v"), r4(max(col("max"))).as("max_v"))
        .orderBy("metric", "ts")
    }),

    // §2.1 /api/put?summary response (reference
    // PutDataPointRpc.java:272-430): success/failed counts over a batch
    // with three malformed lines injected alongside the real export
    "q65_put_summary" -> ((s, dir) => {
      val lines = graft.sources.Export.toPutLines(
        pts(s, dir).filter(col("metric") === "view"))
      val badSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType)))
      val bad = s.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row("put"),
        org.apache.spark.sql.Row("nonsense line"),
        org.apache.spark.sql.Row("put m notatime 1 a=b")), badSchema)
      graft.sources.Ingest.putSummary(
        graft.sources.Ingest.parsePutLines(lines.unionByName(bad)))
    }),

    // §2.14 /api/stats over the points table: per-metric point counts
    // and time bounds (the Spark engine's operational-stats analogue of
    // the reference's TSD counters, RpcManager.java:280-331)
    "q66_stats" -> ((s, dir) =>
      graft.meta.Introspect.stats(pts(s, dir)).orderBy("metric")),

    // §2.14 TSMeta-style distinct-series table (reference
    // src/meta/TSMeta.java): one row per series with first/last seen
    // and point count — the base for suggest/lookup/tsuid resolution
    "q67_series_meta" -> ((s, dir) => {
      val m = graft.meta.Introspect.seriesMeta(pts(s, dir))
      m.select(col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"),
          col("first_seen"), col("last_seen"), col("points"))
        .orderBy("metric", "tag_user", "tag_k")
    }),

    // §2.12 sliding-window streaming aggregation under oracle: the
    // streaming movingAverage(time) form (10m windows sliding by 5m —
    // every point lands in exactly two windows); complete-mode memory
    // sink via Trigger.AvailableNow, one output row per (series, window)
    "q68_sliding_stream" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = pts(s, dir).filter(col("metric") === "purchase" &&
        col("ts") >= T_0105 && col("ts") < T_0105 + 7 * DAY)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q68_")
      val src = tmp.resolve("src").toString
      graft.sources.Export.toPutLines(base).coalesce(1).write.text(src)
      val ss = graft.sources.Ingest.streamSession(s)
      val ptsStream = graft.sources.Ingest.parsePutLines(ss.readStream.text(src))
        .filter(col("_error").isNull).drop("_error")
      val sink = s"q68_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = graft.sources.Ingest
        .slidingAvgStream(ptsStream, "10 minutes", "5 minutes")
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      ss.table(sink).select(col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"),
          col("ts"), r4(col("avg")).as("avg_v"), col("count").as("n"))
        .orderBy("metric", "tag_user", "tag_k", "ts")
    }),

    // §2.1 /api/rollup JSON sink oracle-backed: hourly pre-aggregates
    // rendered as RollupDataPointRpc bodies (interval + aggregator ride
    // along), parsed back and re-aggregated — proving externally
    // computed rollups land loss-free in the engine's rollup model
    // §2.1 telnet `histogram` line sink (reference
    // HistogramDataPointRpc.importDataPoint `histogram metric ts
    // [codec-id] base64-blob tags`): hourly purchase histograms
    // encoded as SimpleHistogram wire blobs, round-tripped through
    // the line parser and the codec registry back to bucket rows
    "q91_histogram_lines" -> ((s, dir) => {
      import s.implicits._
      val binW = 10.0
      val hb = pts(s, dir).filter(col("metric") === "purchase")
        .groupBy(col("metric"), (col("ts") - col("ts") % HOUR).as("ts"),
          (floor(col("value") / binW) * binW).as("lo"))
        .agg(count(lit(1)).as("c"))
      val grouped = hb.groupBy("metric", "ts")
        .agg(collect_list(struct(col("lo"), (col("lo") + binW).as("hi"),
          col("c"))).as("bs"))
      val lines = grouped.map { r =>
        val bs = r.getSeq[org.apache.spark.sql.Row](2)
          .map(b => graft.operators.Histograms.Bucket(
            b.getDouble(0), b.getDouble(1), b.getLong(2)))
          .sortBy(_.lo)
        val b64 = java.util.Base64.getEncoder.encodeToString(
          graft.operators.Histograms.simpleHistogramEncode(bs))
        s"histogram ${r.getString(0)} ${r.getLong(1)} 0 $b64 src=wire"
      }.toDF("value")
      val parsed = graft.sources.Ingest.parseHistogramLines(lines)
        .filter(col("_error").isNull)
      graft.operators.Histograms
        .decodeBlobs(parsed, Seq("metric"), "codec_id", "blob")
        .groupBy(col("metric"), col("bucket_lo"), col("bucket_hi"))
        .agg(sum(col("count")).as("n"))
        .orderBy("metric", "bucket_lo")
    }),

    // GET /api/config/filters (reference RpcManager.ShowConfig filters
    // endpoint → TagVFilter.loadedFilters): the eight built-in filter
    // metas, strings transcribed verbatim from the reference's filter
    // classes. Restricted to the built-ins so a plugin registered by
    // another contract query (q87) cannot leak into the compare; the
    // plugin surface is unit-tested.
    "q95_config_filters" -> ((s, _) => {
      import s.implicits._
      val builtins = Set("literal_or", "iliteral_or", "not_literal_or",
        "not_iliteral_or", "wildcard", "iwildcard", "regexp", "not_key")
      graft.query.QueryParser.loadedFilters()
        .filter(f => builtins.contains(f._1))
        .toDF("filter", "description", "examples")
        .orderBy("filter")
    }),

    // §2.13 STORED-histogram percentile queries end-to-end (round 9):
    // purchase points → per-(user, hour) SimpleHistogram blobs via the
    // codec write side (Histograms.encodeBlobs) → scan + decode +
    // per-SERIES percentile extraction → cross-series zimsum — the
    // reference runHistogram order of operations
    // (TestTsdbQueryHistogramQueries.runSingleTsMsTwoAggSum: the
    // percentile is extracted per series dp, THEN aggregated)
    "q96_hist_pct" -> ((s, dir) => {
      val binW = 10.0
      val hb = pts(s, dir).filter(col("metric") === "purchase")
        .select(col("metric"), (col("ts") - col("ts") % HOUR).as("ts"),
          col("tags").getItem("user").as("u"), col("value"))
      val bucketed = Histograms.fromPoints(hb, Seq("metric", "ts", "u"),
        "value", binW)
      val blobs = Histograms.encodeBlobs(bucketed, Seq("metric", "ts", "u"))
        .select(col("metric"), col("ts"),
          map(lit("user"), col("u")).as("tags"),
          col("codec_id"), col("blob"))
      val q = TsQuery(0L, 4102444800000L, Seq.empty)
      val sub = SubQuery("zimsum", "purchase",
        percentiles = Seq(50.0, 90.0))
      Engine.runPercentilesFromHistograms(blobs, q, sub)
        .select(col("metric"), col("ts"), r4(col("value")).as("value"),
          col("ptile"))
        .orderBy("ptile", "ts")
    }),

    // §2.13 the normalize plugin point through the REAL put parse →
    // query path (reference NormalizePlugin.normalizeTags,
    // src/normalize/NormalizePlugin.java:19 — every incoming point's
    // tag map passes through the registered rewrite before storage):
    // a normalizer prefixes user values with "u", and the recovered
    // aggregates group on the rewritten tag
    "q97_normalize_put" -> ((s, dir) => {
      val ev = pts(s, dir).filter(col("metric") === "signup" &&
        col("tags").getItem("k").isNotNull)
      val lines = ev.select(concat(
        lit("put "), col("metric"), lit(" "), col("ts").cast("string"),
        lit(" "), col("value").cast("string"),
        lit(" user="), col("tags").getItem("user"),
        lit(" k="), col("tags").getItem("k")).as("value"))
      graft.sources.NormalizePlugins.register(tags =>
        map_from_entries(transform(map_entries(tags), e => struct(
          e.getField("key").as("key"),
          when(e.getField("key") === "user",
            concat(lit("u"), e.getField("value")))
            .otherwise(e.getField("value")).as("value")))))
      // the rewrite fuses into the parse plan at CONSTRUCTION time, so
      // the global hook resets before other queries build their plans
      val parsed = graft.sources.Ingest.parsePutLines(lines)
      graft.sources.NormalizePlugins.reset()
      flat(parsed.filter(col("_error").isNull))
        .groupBy(col("metric"), col("tag_user"))
        .agg(count(lit(1)).as("n"),
          r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric", "tag_user")
    }),

    // §2.14 /api/search/lookup with a registered SearchPlugin: the
    // external-index path serves one lookup (reference
    // SearchPlugin.executeQuery / resolveTSQuery,
    // src/search/SearchPlugin.java:152-164), the other returns None
    // and falls back to the engine scan — both through the SAME
    // Introspect.lookup entry point
    "q98_search_lookup_plugin" -> ((s, dir) => {
      val p = pts(s, dir)
      val plugin = new graft.meta.SearchPlugin {
        override def executeLookup(metric: String,
                                   tags: Map[String, String]) =
          if (metric == "view")
            // a plugin answers from its own index — simulated here as
            // a precomputed series listing over the same corpus
            Some(p.filter(col("metric") === "view")
              .groupBy(col("metric"), col("tags"))
              .agg(min(col("ts")).as("first_seen"),
                max(col("ts")).as("last_seen"),
                count(lit(1)).as("points"))
              .withColumn("source", lit("plugin")))
          else None
      }
      graft.meta.SearchPlugins.register(plugin)
      val served = graft.meta.Introspect.lookup(p, metric = "view")
      val fallback = graft.meta.Introspect.lookup(p, metric = "signup")
        .withColumn("source", lit("engine"))
      graft.meta.SearchPlugins.deregister(plugin)
      served.unionByName(fallback)
        .select(col("source"), col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"),
          col("points"))
        .orderBy("source", "metric", "tag_user", "tag_k")
    }),

    // §2.14 /api/search/<type> sub-endpoint ROUTING (reference
    // SearchRpc.execute, src/tsd/SearchRpc.java:57-96): a routed type
    // (tsmeta) dispatches through the full endpoint parse to the
    // registered search plugin — which answers from its own index,
    // simulated as a precomputed series listing filtered by the parsed
    // query/limit — while `lookup` routes to the engine's meta scan
    // via the m= pair grammar. Both through searchRpc, never called
    // directly.
    "q104_search_routed" -> ((s, dir) => {
      import graft.meta.SearchPlugins
      val p = pts(s, dir)
      val plugin = new graft.meta.SearchPlugin {
        override def executeSearch(st: String, q: String, limit: Int,
                                   startIndex: Int) =
          if (st == "tsmeta")
            Some(p.filter(col("metric") === q)
              .groupBy(col("metric"), col("tags"))
              .agg(count(lit(1)).as("points"))
              .withColumn("source", lit("plugin")))
          else None
      }
      SearchPlugins.register(plugin)
      val routed = SearchPlugins.searchRpc(p, "tsmeta",
        Map("query" -> "view", "limit" -> "1000"))
      val looked = SearchPlugins.searchRpc(p, "lookup",
          Map("m" -> "signup{user=,k=}"))
        .withColumn("source", lit("engine")).drop("first_seen", "last_seen")
      SearchPlugins.deregister(plugin)
      routed.unionByName(looked)
        .select(col("source"), col("metric"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"),
          col("points"))
        .orderBy("source", "metric", "tag_user", "tag_k")
    }),

    // §2.13 StartupPlugin through the real engine path: the registered
    // plugin's initialize() rewrites the parsed config BEFORE anything
    // serves (reference TSDMain.loadStartupPlugins,
    // src/tools/TSDMain.java:242-279), adding '%' to
    // tsd.core.tag.allow_specialchars — so put lines whose metric
    // carries '%' parse clean while '!' still lands in _error. The
    // oracle transcribes the post-rewrite accept/reject split; without
    // the plugin every m%pct row would be rejected and the hashes
    // would diverge.
    "q99_startup_plugin" -> ((s, dir) => {
      val ev = pts(s, dir).filter(col("metric") === "click" &&
        col("tags").getItem("k").isNotNull)
      def mk(metric: String) = ev.select(concat(
        lit(s"put $metric "), col("ts").cast("string"),
        lit(" "), col("value").cast("string"),
        lit(" k="), col("tags").getItem("k")).as("value"))
      val lines = mk("m%pct").unionByName(mk("m!bang"))
      graft.meta.StartupPlugins.register("charset_rewriter",
        graft.meta.StartupPlugins.Plugin(cfg =>
          cfg + ("tsd.core.tag.allow_specialchars" -> "%")))
      val cfg = graft.meta.StartupPlugins.applyStartup(Map(
        "tsd.startup.enable" -> "true",
        "tsd.startup.plugin" -> "charset_rewriter"))
      graft.sources.Ingest.allowSpecialChars =
        cfg.getOrElse("tsd.core.tag.allow_specialchars", "")
      // the charset regex bakes into the plan at CONSTRUCTION time, so
      // the knob resets before other queries build their plans
      val parsed = graft.sources.Ingest.parsePutLines(lines)
      graft.sources.Ingest.allowSpecialChars = ""
      parsed
        .groupBy(col("metric"), col("_error").isNull.as("ok"))
        .agg(count(lit(1)).as("n"), r4(min(col("value"))).as("min_v"),
          r4(max(col("value"))).as("max_v"))
        .orderBy("metric", "ok")
    }),

    // §2.14 `tsd uid fsck` over deliberately-corrupted dual mapping
    // tables derived from the q49 registry: a shared-uid collision, a
    // mismatched reverse name, dropped reverse rows (uid % 7 == 3),
    // and an orphan reverse — every fault class the reference's
    // UidManager.fsck detects, reported relationally
    "q93_uid_fsck" -> ((s, dir) => {
      import s.implicits._
      val reg = graft.meta.Introspect.uidRegistry(
        pts(s, dir).filter(col("metric").isin("click", "signup")))
      val forward = reg.select("kind", "name", "uid")
        .unionByName(Seq(("tagv", "fsck_dup_a", 900001L),
          ("tagv", "fsck_dup_b", 900001L)).toDF("kind", "name", "uid"))
      val reverse = reg.select(col("kind"), col("uid"),
          when(col("kind") === "tagk" && col("uid") === 1L, lit("wrongname"))
            .otherwise(col("name")).as("name"))
        .filter(col("uid") % 7 =!= 3)
        .unionByName(Seq(("metric", 900100L, "ghost"))
          .toDF("kind", "uid", "name"))
      graft.meta.Uids.fsckUid(forward, reverse)
        .orderBy("kind", "fault", "uid", "name")
    }),

    // §2.14 `tsd uid grep [kind] <regex>` — distributed regex search
    // over the registry names, ignore-case variant on the tagv kind
    "q94_uid_grep" -> ((s, dir) => {
      val reg = graft.meta.Introspect.uidRegistry(pts(s, dir))
      graft.meta.Uids.grep(reg, "^[A-Z]?[0-9]*[13579]$",
          kind = Some("tagv"), ignoreCase = true)
        .orderBy("kind", "uid")
    }),

    // operation-mode surface (reference RpcManager.initializeBuiltinRpcs
    // + TSDB.java:271 mode parse): the full (mode, transport, command)
    // routing table at default switches; the oracle is an independent
    // transcription of the Java registration blocks, so drift in either
    // direction shows as a row diff
    "q92_rpc_modes" -> ((s, _) => {
      // a user HttpRpcPlugin mounts under /plugin in EVERY mode
      // (reference RpcManager.initializeHttpRpcPlugins:383-395 ignores
      // tsd.mode) — the mounted row must appear in the routing table
      // exactly like a built-in
      graft.meta.HttpRpcPlugins.mount("/myplugin/subpath/",
        (sp, _) => sp.emptyDataFrame)
      graft.meta.RpcModes.surface(s)
    }),

    // §2.1 telnet `rollup` line sink (reference RollupDataPointRpc
    // .importDataPoint telnet form `rollup 1h-sum:sum metric ts value
    // tags`): hourly sums rendered as wire lines, parsed back, and
    // re-aggregated — interval/temporal/spatial agg split checked on
    // the round-trip
    "q90_rollup_lines" -> ((s, dir) => {
      val hour = pts(s, dir).filter(col("metric") === "view")
        .groupBy(col("metric"), (col("ts") - col("ts") % HOUR).as("ts"),
          col("tags").getItem("user").as("u"))
        .agg(sum(col("value")).as("v"))
      val lines = hour.select(concat(
        lit("rollup 1h-sum:sum "), col("metric"), lit(" "),
        col("ts").cast("string"), lit(" "), col("v").cast("string"),
        lit(" user="), col("u")).as("value"))
      graft.sources.Ingest.parseRollupLines(lines)
        .filter(col("_error").isNull)
        .groupBy(col("metric"), col("interval"), col("aggregator"),
          col("spatial_agg"))
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric")
    }),

    "q69_rollup_json" -> ((s, dir) => {
      val hour = pts(s, dir).filter(col("metric") === "click")
        .groupBy(col("metric"), (col("ts") - col("ts") % HOUR).as("ts"),
          col("tags").getItem("user").as("u"))
        .agg(sum(col("value")).as("v"))
      val bodies = hour.select(to_json(struct(
          col("metric"), col("ts").as("timestamp"),
          col("v").cast("string").as("value"),
          lit("1h").as("interval"), lit("SUM").as("aggregator"),
          map(lit("user"), col("u")).as("tags"))).as("value"))
      graft.sources.Ingest.parseRollupJson(bodies)
        .groupBy(col("metric"), col("interval"), col("aggregator"))
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric")
    }),

    // §2.1 /api/histogram JSON sink oracle-backed: fixed-width value
    // histograms per hour rendered as SimpleHistogram bodies (bucket
    // map keyed "lo,hi"), parsed back to relational bucket rows and
    // merged by plain groupBy+sum — the mergeability the histogram
    // query path (q22/q43) depends on
    "q70_histogram_json" -> ((s, dir) => {
      val binW = 10.0
      val hb = pts(s, dir).filter(col("metric") === "purchase")
        .groupBy(col("metric"), (col("ts") - col("ts") % HOUR).as("ts"),
          (floor(col("value") / binW) * binW).as("lo"))
        .agg(count(lit(1)).as("c"))
      val bodies = hb.groupBy(col("metric"), col("ts"))
        .agg(map_from_entries(collect_list(struct(
          concat(col("lo").cast("string"), lit(","),
            (col("lo") + binW).cast("string")).as("k"),
          col("c").as("v")))).as("buckets"))
        .select(to_json(struct(col("metric"), col("ts").as("timestamp"),
          col("buckets"), map(lit("host"), lit("a")).as("tags"))).as("value"))
      graft.sources.Ingest.parseHistogramJson(bodies)
        .groupBy(col("metric"), col("bucket_lo"), col("bucket_hi"))
        .agg(sum(col("count")).as("n"))
        .orderBy("metric", "bucket_lo")
    }),

    // §2.13 small-file compaction oracle-backed end-to-end (reference
    // src/core/CompactionQueue.java:340+): the streaming sink's
    // pathology — many tiny files per date partition — written
    // deliberately (16-way round-robin before the partitioned write),
    // compacted down to one file per date, and the recovered table must
    // hash-match aggregates computed straight from the source. The
    // `compacted` flag folds the file-count contract into the oracle
    // compare: it is only true when compaction actually reduced the
    // file count to <= one per date.
    "q71_compact" -> ((s, dir) => {
      val base = pts(s, dir).filter(col("metric") === "view" &&
          col("tags").getItem("k").isNotNull)
        .select(col("metric"), col("ts"), col("value"),
          col("tags").getItem("user").as("tag_user"),
          col("tags").getItem("k").as("tag_k"))
      val tmp = java.nio.file.Files.createTempDirectory("q71compact")
        .toString + "/pts"
      graft.model.Points.writeDatePartitioned(base.repartition(16), tmp)
      def fileCount = s.read.parquet(tmp).inputFiles.length
      val before = fileCount
      val nDates = s.read.parquet(tmp).select("date").distinct.count()
      graft.sources.Ingest.compact(s, tmp,
        targetFileBytes = Long.MaxValue / 4)
      val after = fileCount
      s.read.parquet(tmp)
        .groupBy("metric", "tag_user")
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .withColumn("compacted", lit(after < before && after <= nDates))
        .orderBy("metric", "tag_user")
    }),

    // §2 DELETE /api/query (reference TSQuery.delete / QueryRpc
    // delete path): the matched series' points inside the query range
    // vanish, everything else survives byte-identically — proven by
    // aggregating the survivor table per series group
    "q72_query_delete" -> ((s, dir) => {
      val q = TsQuery(T_0105, T_0120 - 1, Seq.empty)
      val sub = SubQuery("sum", "click",
        Seq(LiteralOr("user", Seq("1", "2", "3"))))
      flat(Engine.deletePoints(pts(s, dir), q, sub))
        .groupBy("metric", "tag_user")
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy("metric", "tag_user")
    }),

    // §2 fsck --fix: a deterministically-dirtied copy of the corpus
    // (injected duplicates, NaNs, future stamps, bad-charset metrics
    // — all derived from the click/user=1 slice) runs through
    // Fsck.repair; every injected pathology must vanish, with the
    // duplicate resolved to the larger injected value
    "q73_fsck_repair" -> ((s, dir) => {
      val base = pts(s, dir)
      val slice = base.filter(col("metric") === "click" &&
        col("tags").getItem("user") === "1")
      val dirty = base
        .unionByName(slice.withColumn("value", col("value") + 1.0))
        .unionByName(slice.withColumn("value", lit(Double.NaN)))
        .unionByName(slice.withColumn("ts",
          col("ts") + lit(315360000000L)))
        .unionByName(slice.withColumn("metric",
          concat(col("metric"), lit(" %"))))
      flat(graft.meta.Fsck.repair(dirty, nowMs = 1767225600000L))
        .groupBy("metric", "tag_user")
        .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_v"))
        .orderBy("metric", "tag_user")
    })
  )

  private def tsdbOracles: Map[String, String] = Map(

    "q01_scan_filter" ->
      s"""$O SELECT metric, tag_user, tag_k, ts, (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'click' AND ts >= $T_0105 AND ts < $T_0120
           AND tag_user IN ('1','2','3')
         ORDER BY ts, tag_user""",

    "q02_filter_regex" ->
      s"""$O SELECT metric, tag_user, tag_k, ts, (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'view' AND regexp_matches(tag_k, '^[1-3][0-9]$$')
         ORDER BY ts, tag_user""",

    "q03_filter_not_literal" ->
      s"""$O SELECT metric, tag_user, tag_k, ts, (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'error'
           AND (tag_user IS NULL OR tag_user NOT IN ('1','2','3','4','5'))
           AND tag_k IS NOT NULL
         ORDER BY ts, tag_user""",

    "q04_downsample_sum" ->
      s"""$O SELECT metric, tag_user, tag_k, ts - ts % $DAY AS ts,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS value
         FROM points WHERE metric = 'purchase'
         GROUP BY metric, tag_user, tag_k, ts - ts % $DAY
         ORDER BY ts, tag_user, tag_k""",

    "q50_int_avg" ->
      s"""$O, p AS (
           SELECT tag_user AS u, ts,
             coalesce(tag_user,'') || '|' || coalesce(tag_k,'') AS sid,
             max(CAST(floor(value * 10) AS BIGINT)) AS vl
           FROM points WHERE metric = 'click' GROUP BY 1, 2, 3),
         grid AS (SELECT DISTINCT u, ts FROM p),
         sids AS (SELECT DISTINCT u, sid FROM p),
         slots AS (SELECT s.u, s.sid, g.ts FROM sids s
           JOIN grid g ON s.u = g.u),
         j AS (SELECT sl.u, sl.sid, sl.ts, p.vl FROM slots sl
           LEFT JOIN p ON sl.sid = p.sid AND sl.ts = p.ts),
         w AS (SELECT u, sid, ts, vl,
           last_value((CASE WHEN vl IS NOT NULL THEN ts END) IGNORE NULLS)
             OVER win_p AS pts_,
           last_value(vl IGNORE NULLS) OVER win_p AS pvl,
           first_value((CASE WHEN vl IS NOT NULL THEN ts END) IGNORE NULLS)
             OVER win_n AS nts_,
           first_value(vl IGNORE NULLS) OVER win_n AS nvl
           FROM j
           WINDOW win_p AS (PARTITION BY sid ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           win_n AS (PARTITION BY sid ORDER BY ts
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         c AS (SELECT u, ts,
           CASE WHEN vl IS NOT NULL THEN vl
                WHEN pvl IS NOT NULL AND nvl IS NOT NULL THEN
                  pvl + CAST(trunc(
                    CAST((ts - pts_) * (nvl - pvl) AS DOUBLE)
                      / (nts_ - pts_)) AS BIGINT)
           END AS lv FROM w)
         SELECT 'click' AS metric, u AS tag_user, ts,
           CAST(trunc(CAST(sum(lv) AS DOUBLE) / count(lv)) AS BIGINT) AS value
         FROM c WHERE lv IS NOT NULL GROUP BY u, ts
         ORDER BY ts, tag_user""",

    "q05_downsample_avg_fill" ->
      s"""$O, agg AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS b,
             avg(value) AS v
           FROM points WHERE metric = 'signup'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY),
         bounds AS (
           SELECT metric, tag_user, tag_k, min(b) AS lo, max(b) AS hi
           FROM agg GROUP BY metric, tag_user, tag_k),
         grid AS (
           SELECT metric, tag_user, tag_k,
             unnest(generate_series(lo, hi, $DAY)) AS b
           FROM bounds)
         SELECT g.metric, g.tag_user, g.tag_k, g.b AS ts,
           (sign(coalesce(a.v, 0.0)) * floor(abs(coalesce(a.v, 0.0)) * 10000 + 0.5) / 10000) AS value
         FROM grid g LEFT JOIN agg a
           ON g.metric = a.metric AND g.tag_user = a.tag_user
             AND g.tag_k = a.tag_k AND g.b = a.b
         ORDER BY g.b, g.tag_user, g.tag_k""",

    "q06_groupby_zimsum" ->
      s"""$O SELECT metric, ts - ts % $HOUR AS ts, (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS value
         FROM points GROUP BY metric, ts - ts % $HOUR
         ORDER BY metric, ts""",

    "q53_mimmax_group" ->
      s"""$O SELECT metric, ts - ts % $HOUR AS ts, (sign(max(value)) * floor(abs(max(value)) * 10000 + 0.5) / 10000) AS value
         FROM points GROUP BY metric, ts - ts % $HOUR
         ORDER BY metric, ts""",

    "q54_union_by_tag" ->
      s"""$O, a AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points WHERE metric = 'click' GROUP BY 1, 2),
         c AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points WHERE metric = 'view' GROUP BY 1, 2),
         j AS (
           SELECT coalesce(a.tag_user, c.tag_user) AS tag_user,
             coalesce(a.b, c.b) AS b,
             coalesce(a.v, 0) + coalesce(c.v, 0) AS v
           FROM a FULL OUTER JOIN c
             ON a.tag_user = c.tag_user AND a.b = c.b)
         SELECT tag_user, b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM j ORDER BY tag_user, ts""",

    "q55_intersect_by_tag" ->
      s"""$O, a AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points WHERE metric = 'click' GROUP BY 1, 2),
         c AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points WHERE metric = 'view' GROUP BY 1, 2)
         SELECT a.tag_user, a.b AS ts, (sign(a.v / c.v) * floor(abs(a.v / c.v) * 10000 + 0.5) / 10000) AS value
         FROM a JOIN c ON a.tag_user = c.tag_user AND a.b = c.b
         ORDER BY a.tag_user, ts""",

    // the reference's UNION join iterates every surviving series at
    // EVERY grid timestamp (UnionIterator lock-step), so the result is
    // the series × grid slot table with per-variable fills — a missing
    // timestamp in a present series fills the variable's fillPolicy
    // (zero for a, scalar 5 for b); a series absent from a variable
    // entirely fills the union's fill_dp ZERO
    "q56_exp_json" ->
      s"""$O, a AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user IN ('1', '2', '3')
           GROUP BY 1, 2),
         c AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'view' AND tag_user IN ('1', '2', '3')
           GROUP BY 1, 2),
         ac AS (SELECT * FROM a WHERE b >= $T_0105 AND b <= $T_0120),
         cc AS (SELECT * FROM c WHERE b >= $T_0105 AND b <= $T_0120),
         grid AS (SELECT DISTINCT b FROM
           (SELECT b FROM ac UNION ALL SELECT b FROM cc)),
         series AS (SELECT DISTINCT tag_user FROM
           (SELECT tag_user FROM ac UNION ALL SELECT tag_user FROM cc)),
         j AS (
           SELECT s.tag_user, g.b,
             CASE WHEN s.tag_user IN (SELECT tag_user FROM ac)
               THEN coalesce(ac.v, 0.0) ELSE 0.0 END
             + CASE WHEN s.tag_user IN (SELECT tag_user FROM cc)
               THEN coalesce(cc.v, 5.0) ELSE 0.0 END * 2 - 1 AS v
           FROM series s CROSS JOIN grid g
           LEFT JOIN ac ON ac.tag_user = s.tag_user AND ac.b = g.b
           LEFT JOIN cc ON cc.tag_user = s.tag_user AND cc.b = g.b)
         SELECT 'combined' AS metric, tag_user, b AS ts,
           (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM j ORDER BY tag_user, ts""",

    "q07_groupby_lerp_sum" ->
      s"""$O, p AS (
           SELECT tag_user, tag_k, ts - ts % $HOUR AS b, avg(value) AS v
           FROM points WHERE metric = 'click'
           GROUP BY tag_user, tag_k, ts - ts % $HOUR),
         grid AS (SELECT DISTINCT b FROM p),
         series AS (SELECT DISTINCT tag_user, tag_k FROM p),
         slots AS (SELECT s.tag_user, s.tag_k, g.b FROM series s CROSS JOIN grid g),
         j AS (
           SELECT sl.tag_user, sl.tag_k, sl.b, p.v
           FROM slots sl LEFT JOIN p
             ON sl.tag_user = p.tag_user AND sl.tag_k = p.tag_k AND sl.b = p.b),
         w AS (
           SELECT b, v,
             last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER wp AS pb,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER wn AS nb,
             first_value(v IGNORE NULLS) OVER wn AS nv
           FROM j
           WINDOW wp AS (PARTITION BY tag_user, tag_k ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wn AS (PARTITION BY tag_user, tag_k ORDER BY b
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         iv AS (
           SELECT b, CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (b - pb) * (nv - pv) / (nb - pb) END AS ival
           FROM w)
         SELECT 'click' AS metric, b AS ts, (sign(sum(ival)) * floor(abs(sum(ival)) * 10000 + 0.5) / 10000) AS value
         FROM iv GROUP BY b ORDER BY ts""",

    "q08_rate" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS b,
             sum(value) AS v
           FROM points WHERE metric = 'purchase'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY),
         r AS (
           SELECT metric, tag_user, tag_k, b AS ts,
             (v - lag(v) OVER w) / ((b - lag(b) OVER w) / 1000.0) AS rate
           FROM d WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY b))
         SELECT metric, tag_user, tag_k, ts, (sign(rate) * floor(abs(rate) * 10000 + 0.5) / 10000) AS value
         FROM r WHERE rate IS NOT NULL
         ORDER BY tag_user, tag_k, ts""",

    "q09_rate_counter" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS b,
             sum(value) AS v
           FROM points WHERE metric = 'view'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY),
         r AS (
           SELECT metric, tag_user, tag_k, b AS ts, v,
             lag(v) OVER w AS pv, (b - lag(b) OVER w) / 1000.0 AS dt
           FROM d WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY b))
         SELECT metric, tag_user, tag_k, ts,
           (sign(CASE WHEN v - pv < 0 THEN (10000 - pv + v) / dt
             ELSE (v - pv) / dt END) * floor(abs(CASE WHEN v - pv < 0 THEN (10000 - pv + v) / dt
             ELSE (v - pv) / dt END) * 10000 + 0.5) / 10000) AS value
         FROM r WHERE pv IS NOT NULL
         ORDER BY tag_user, tag_k, ts""",

    "q10_rate_dropresets" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS b,
             sum(value) AS v
           FROM points WHERE metric = 'view'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY),
         r AS (
           SELECT metric, tag_user, tag_k, b AS ts, v,
             lag(v) OVER w AS pv, (b - lag(b) OVER w) / 1000.0 AS dt
           FROM d WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY b))
         SELECT metric, tag_user, tag_k, ts,
           (sign((v - pv) / dt) * floor(abs((v - pv) / dt) * 10000 + 0.5) / 10000) AS value
         FROM r WHERE pv IS NOT NULL AND v - pv >= 0
         ORDER BY tag_user, tag_k, ts""",

    "q11_topk_highestmax" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS ts,
             sum(value) AS value
           FROM points WHERE metric = 'view'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY),
         scored AS (
           SELECT metric, tag_user, tag_k, max(value) AS score
           FROM d GROUP BY metric, tag_user, tag_k),
         ranked AS (
           SELECT metric, tag_user, tag_k,
             row_number() OVER (ORDER BY score DESC, metric, tag_user, tag_k) AS rk
           FROM scored)
         SELECT d.metric, d.tag_user, d.tag_k, d.ts, (sign(d.value) * floor(abs(d.value) * 10000 + 0.5) / 10000) AS value
         FROM d JOIN ranked r
           ON d.metric = r.metric AND d.tag_user = r.tag_user
             AND d.tag_k = r.tag_k
         WHERE r.rk <= 3
         ORDER BY d.tag_user, d.tag_k, d.ts""",

    "q12_moving_avg" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS ts,
             avg(value) AS value
           FROM points WHERE metric = 'error'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY)
         SELECT metric, tag_user, tag_k, ts,
           (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM (SELECT metric, tag_user, tag_k, ts,
           CASE WHEN count(value) OVER w = 3
             THEN avg(value) OVER w ELSE 0.0 END AS v
           FROM d WINDOW w AS (PARTITION BY metric, tag_user, tag_k
             ORDER BY ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
         ORDER BY tag_user, tag_k, ts""",

    "q13_first_diff" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS ts,
             sum(value) AS value
           FROM points WHERE metric = 'signup'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY),
         r AS (
           SELECT metric, tag_user, tag_k, ts,
             coalesce(value - lag(value) OVER (PARTITION BY metric, tag_user,
               tag_k ORDER BY ts), 0.0) AS value
           FROM d)
         SELECT metric, tag_user, tag_k, ts, (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM r ORDER BY tag_user, tag_k, ts""",

    "q14_shift_scale_abs" ->
      s"""$O SELECT metric, tag_user, tag_k, ts + $HOUR AS ts,
           (sign(abs(value * -2.5)) * floor(abs(abs(value * -2.5)) * 10000 + 0.5) / 10000) AS value
         FROM points WHERE metric = 'error'
         ORDER BY ts, tag_user""",

    "q15_aggregators" ->
      s"""$O, g AS (
           SELECT metric, ts - ts % $DAY AS ts,
             (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v,
             (sign(avg(value)) * floor(abs(avg(value)) * 10000 + 0.5) / 10000) AS avg_v,
             (sign(min(value)) * floor(abs(min(value)) * 10000 + 0.5) / 10000) AS min_v,
             (sign(max(value)) * floor(abs(max(value)) * 10000 + 0.5) / 10000) AS max_v,
             count(value) AS cnt_v,
             (sign(stddev_pop(value)) * floor(abs(stddev_pop(value)) * 10000 + 0.5) / 10000) AS dev_v,
             (sign(sum(value * value)) * floor(abs(sum(value * value)) * 10000 + 0.5) / 10000) AS sq_v,
             (sign(arg_min(value, ts)) * floor(abs(arg_min(value, ts)) * 10000 + 0.5) / 10000) AS first_v,
             (sign(arg_max(value, ts)) * floor(abs(arg_max(value, ts)) * 10000 + 0.5) / 10000) AS last_v,
             (sign(arg_max(value, ts) - arg_min(value, ts)) * floor(abs(arg_max(value, ts) - arg_min(value, ts)) * 10000 + 0.5) / 10000) AS diff_v,
             list_sort(list(value)) AS arr,
             (sign(CAST(quantile_cont(value, 0.9) AS DOUBLE)) * floor(abs(CAST(quantile_cont(value, 0.9) AS DOUBLE)) * 10000 + 0.5) / 10000) AS p90r7_v,
             count(*) AS n
           FROM points GROUP BY metric, ts - ts % $DAY)
         SELECT metric, ts, sum_v, avg_v, min_v, max_v, cnt_v, dev_v, sq_v,
           first_v, last_v, diff_v,
           (sign(arr[CAST(floor(n / 2) AS INT) + 1]) * floor(abs(arr[CAST(floor(n / 2) AS INT) + 1]) * 10000 + 0.5) / 10000) AS med_v,
           (sign(CASE WHEN (n + 1) * 0.9 <= 1 THEN arr[1]
             WHEN (n + 1) * 0.9 >= n THEN arr[n]
             ELSE arr[CAST(floor((n + 1) * 0.9) AS INT)]
               + ((n + 1) * 0.9 - floor((n + 1) * 0.9))
               * (arr[CAST(floor((n + 1) * 0.9) AS INT) + 1]
                  - arr[CAST(floor((n + 1) * 0.9) AS INT)]) END) * floor(abs(CASE WHEN (n + 1) * 0.9 <= 1 THEN arr[1]
             WHEN (n + 1) * 0.9 >= n THEN arr[n]
             ELSE arr[CAST(floor((n + 1) * 0.9) AS INT)]
               + ((n + 1) * 0.9 - floor((n + 1) * 0.9))
               * (arr[CAST(floor((n + 1) * 0.9) AS INT) + 1]
                  - arr[CAST(floor((n + 1) * 0.9) AS INT)]) END) * 10000 + 0.5) / 10000) AS p90r6_v,
           p90r7_v
         FROM g ORDER BY metric, ts""",

    "q16_product" ->
      s"""$O SELECT tag_user, ts - ts % $DAY AS ts,
           (sign(product(value / 100.0)) * floor(abs(product(value / 100.0)) * 10000 + 0.5) / 10000) AS value
         FROM points WHERE metric = 'purchase'
         GROUP BY tag_user, ts - ts % $DAY
         ORDER BY tag_user, ts""",

    "q17_last_point" ->
      s"""$O SELECT metric, tag_user, tag_k, max(ts) AS ts,
           (sign(arg_max(value, ts)) * floor(abs(arg_max(value, ts)) * 10000 + 0.5) / 10000) AS value
         FROM points GROUP BY metric, tag_user, tag_k
         ORDER BY metric, tag_user, tag_k""",

    "q101_lookup_grammar" ->
      s"""$O SELECT metric, tag_user, tag_k, CAST(count(*) AS BIGINT) AS points
         FROM points
         WHERE tag_k IS NOT NULL AND (tag_user = '3' OR tag_k = '3')
         GROUP BY metric, tag_user, tag_k
         ORDER BY metric, tag_user, tag_k""",

    "q100_query_last_rpc" ->
      s"""$O, matched AS (
           SELECT * FROM points
           WHERE (metric = 'click' AND tag_user = '1') OR metric = 'view')
         SELECT metric, tag_user, tag_k, max(ts) AS ts,
           (sign(arg_max(value, ts)) * floor(abs(arg_max(value, ts)) * 10000 + 0.5) / 10000) AS value
         FROM matched GROUP BY metric, tag_user, tag_k
         ORDER BY metric, tag_user, tag_k""",

    "q103_last_meta_path" ->
      s"""$O, matched AS (
           SELECT * FROM points
           WHERE (metric = 'click' AND tag_user = '1') OR metric = 'view')
         SELECT metric, tag_user, tag_k, max(ts) AS ts,
           (sign(arg_max(value, ts)) * floor(abs(arg_max(value, ts)) * 10000 + 0.5) / 10000) AS value
         FROM matched GROUP BY metric, tag_user, tag_k
         ORDER BY metric, tag_user, tag_k""",

    "q18_suggest" ->
      s"""$O SELECT DISTINCT metric FROM points WHERE metric LIKE 'c%'
         ORDER BY metric LIMIT 25""",

    "q105_suggest_rpc" ->
      s"""$O, tv AS (
           SELECT DISTINCT tag_user AS v FROM points
             WHERE tag_user IS NOT NULL
           UNION SELECT DISTINCT tag_k FROM points WHERE tag_k IS NOT NULL)
         SELECT kind, suggestion FROM (
           SELECT 'metrics' AS kind, metric AS suggestion FROM (
             SELECT DISTINCT metric FROM points WHERE metric LIKE 'c%'
             ORDER BY metric LIMIT 25)
           UNION ALL SELECT 'tagk', 'user'
           UNION ALL SELECT 'tagk', 'k'
             WHERE EXISTS(SELECT 1 FROM points WHERE tag_k IS NOT NULL)
           UNION ALL SELECT 'tagv', v FROM (
             SELECT v FROM tv WHERE v LIKE '1%' ORDER BY v LIMIT 5))
         ORDER BY kind, suggestion""",

    "q19_lookup" ->
      s"""$O SELECT DISTINCT metric, tag_user, tag_k FROM points
         WHERE tag_user = '3' ORDER BY metric, tag_k""",

    "q20_union_sum_series" ->
      s"""$O, c AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'click' GROUP BY ts - ts % $HOUR),
         v AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'view' GROUP BY ts - ts % $HOUR)
         SELECT coalesce(c.ts, v.ts) AS ts,
           (sign(coalesce(c.v, 0.0) + coalesce(v.v, 0.0)) * floor(abs(coalesce(c.v, 0.0) + coalesce(v.v, 0.0)) * 10000 + 0.5) / 10000) AS value
         FROM c FULL OUTER JOIN v ON c.ts = v.ts
         ORDER BY ts""",

    "q21_intersect_divide" ->
      s"""$O, c AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'click' GROUP BY ts - ts % $HOUR),
         v AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'view' GROUP BY ts - ts % $HOUR)
         SELECT c.ts AS ts, (sign(c.v / v.v) * floor(abs(c.v / v.v) * 10000 + 0.5) / 10000) AS value
         FROM c JOIN v ON c.ts = v.ts
         ORDER BY ts""",

    "q22_histogram_p90" ->
      s"""$O, h AS (
           SELECT metric, ts - ts % $DAY AS b,
             floor(value / 10.0) * 10.0 AS lo,
             (floor(value / 10.0) + 1) * 10.0 AS hi,
             count(*) AS cnt
           FROM points GROUP BY metric, ts - ts % $DAY,
             floor(value / 10.0)),
         c AS (
           SELECT metric, b, lo, hi, cnt,
             CAST(sum(cnt) OVER (PARTITION BY metric, b ORDER BY lo) AS DOUBLE) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY metric, b) AS DOUBLE) AS total
           FROM h)
         SELECT metric, b AS ts,
           (sign(lo + (hi - lo) * (total * 0.9 - (cum - cnt)) / cnt) * floor(abs(lo + (hi - lo) * (total * 0.9 - (cum - cnt)) / cnt) * 10000 + 0.5) / 10000) AS value
         FROM c
         WHERE cum >= total * 0.9 AND (cum - cnt) < total * 0.9
         ORDER BY metric, ts""",

    "q23_annotations" ->
      s"""$O, sums AS (
           SELECT ts - ts % $DAY AS ts, sum(value) AS value FROM points
           WHERE metric = 'click' GROUP BY ts - ts % $DAY),
         ann AS (
           SELECT ts - $HOUR AS start_ts, ts + $HOUR AS end_ts FROM points
           WHERE metric = 'error' AND value > 95)
         SELECT s.ts, (sign(any_value(s.value)) * floor(abs(any_value(s.value)) * 10000 + 0.5) / 10000) AS value,
           count(a.start_ts) AS n_ann
         FROM sums s LEFT JOIN ann a
           ON s.ts >= a.start_ts AND s.ts <= a.end_ts
         GROUP BY s.ts ORDER BY s.ts""",

    "q106_annotation_merge" ->
      s"""$O, stored AS (
           SELECT metric, min(ts) AS start_ts,
             min(ts) + 3600000 AS end_ts,
             'd-' || metric AS description, 'orig' AS notes
           FROM points GROUP BY metric)
         SELECT metric, start_ts, end_ts,
           CASE WHEN metric LIKE 'c%' THEN 'new-' || metric
                ELSE description END AS description,
           notes
         FROM stored ORDER BY metric""",

    "q24_rollup_avg" ->
      s"""$O, hourly AS (
           SELECT metric, tag_user, tag_k, ts - ts % $HOUR AS hb,
             sum(value) AS s, count(value) AS c
           FROM points GROUP BY metric, tag_user, tag_k, ts - ts % $HOUR)
         SELECT metric, tag_user, tag_k, hb - hb % $DAY AS ts,
           (sign(sum(s) / sum(c)) * floor(abs(sum(s) / sum(c)) * 10000 + 0.5) / 10000) AS value
         FROM hourly GROUP BY metric, tag_user, tag_k, hb - hb % $DAY
         ORDER BY metric, tag_user, tag_k, ts""",

    "q25_exp_infix" ->
      s"""$O, c AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'click' GROUP BY ts - ts % $HOUR),
         v AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'view' GROUP BY ts - ts % $HOUR)
         SELECT c.ts AS ts,
           (sign(c.v + v.v / 2 - (c.v - v.v) * 0.5) * floor(abs(c.v + v.v / 2 - (c.v - v.v) * 0.5) * 10000 + 0.5) / 10000) AS value
         FROM c JOIN v ON c.ts = v.ts
         ORDER BY ts""",

    "q27_rollup_routed" -> {
      val start = T_0105; val end = T_0120 + 7 * DAY; val pad = DAY
      s"""$O, hourly AS (
           SELECT tag_user, tag_k, ts - ts % $HOUR AS hb,
             sum(value) AS s, count(value) AS c
           FROM points
           WHERE metric = 'view' AND tag_user IN ('1','2','3','4','5')
           GROUP BY tag_user, tag_k, ts - ts % $HOUR),
         old AS (
           SELECT tag_user, tag_k, hb - hb % $DAY AS db, sum(s) / sum(c) AS v
           FROM hourly
           WHERE hb >= ${start - pad} AND hb <= ${end + pad} AND hb < $T_0120
           GROUP BY tag_user, tag_k, hb - hb % $DAY),
         fresh AS (
           SELECT tag_user, tag_k, ts - ts % $DAY AS db, avg(value) AS v
           FROM points
           WHERE metric = 'view' AND tag_user IN ('1','2','3','4','5')
             AND ts >= ${start - pad} AND ts <= ${end + pad} AND ts >= $T_0120
           GROUP BY tag_user, tag_k, ts - ts % $DAY),
         uni AS (SELECT * FROM old UNION ALL SELECT * FROM fresh)
         SELECT 'view' AS metric, db AS ts, (sign(sum(v)) * floor(abs(sum(v)) * 10000 + 0.5) / 10000) AS value
         FROM uni WHERE db >= $start AND db <= $end
         GROUP BY db ORDER BY ts"""
    },

    "q26_groupby_tag" ->
      s"""$O, p AS (
           SELECT tag_user, tag_k, ts - ts % $HOUR AS b, avg(value) AS v
           FROM points WHERE metric = 'click'
           GROUP BY tag_user, tag_k, ts - ts % $HOUR),
         grid AS (SELECT DISTINCT tag_user, b FROM p),
         series AS (SELECT DISTINCT tag_user, tag_k FROM p),
         slots AS (
           SELECT s.tag_user, s.tag_k, g.b
           FROM series s JOIN grid g ON s.tag_user = g.tag_user),
         j AS (
           SELECT sl.tag_user, sl.tag_k, sl.b, p.v
           FROM slots sl LEFT JOIN p
             ON sl.tag_user = p.tag_user AND sl.tag_k = p.tag_k AND sl.b = p.b),
         w AS (
           SELECT tag_user, b, v,
             last_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER wp AS pb,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             first_value(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
               OVER wn AS nb,
             first_value(v IGNORE NULLS) OVER wn AS nv
           FROM j
           WINDOW wp AS (PARTITION BY tag_user, tag_k ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wn AS (PARTITION BY tag_user, tag_k ORDER BY b
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         iv AS (
           SELECT tag_user, b, CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (b - pb) * (nv - pv) / (nb - pb) END AS ival
           FROM w)
         SELECT 'click' AS metric, tag_user, b AS ts,
           (sign(sum(ival)) * floor(abs(sum(ival)) * 10000 + 0.5) / 10000) AS value
         FROM iv GROUP BY tag_user, b ORDER BY tag_user, ts""",

    "q28_engine_uri" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user IS NOT NULL
           GROUP BY tag_user, ts - ts % $HOUR)
         SELECT 'click' AS metric, tag_user, b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d WHERE b >= $T_0105 AND b <= $T_0120
         ORDER BY tag_user, ts""",

    "q52_wildcard_glob" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user LIKE '1%2'
           GROUP BY tag_user, ts - ts % $HOUR)
         SELECT 'click' AS metric, tag_user, b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d WHERE b >= $T_0105 AND b <= $T_0120
         ORDER BY tag_user, ts""",

    "q48_tsuid_query" ->
      s"""$O, d AS (
           SELECT tag_k, ts - ts % $DAY AS b, sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user = '1'
           GROUP BY tag_k, ts - ts % $DAY)
         SELECT 'click' AS metric, b AS ts, (sign(sum(v)) * floor(abs(sum(v)) * 10000 + 0.5) / 10000) AS value
         FROM d WHERE b >= $T_0105 AND b <= $T_0120
         GROUP BY b ORDER BY ts""",

    "q47_engine_json" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user IS NOT NULL
             AND tag_k IN ('10','11','12','13','14','15')
           GROUP BY tag_user, ts - ts % $HOUR)
         SELECT 'click' AS metric, tag_user, b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d WHERE b >= $T_0105 AND b <= $T_0120
         ORDER BY tag_user, ts""",

    "q29_filters_ci" ->
      s"""$O SELECT metric, tag_user, tag_k, ts, (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'signup' AND lower(tag_user) IN ('1','2','3')
           AND regexp_matches(lower(tag_k), '^1.*$$')
         ORDER BY ts, tag_user""",

    "q30_moving_avg_time" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS ts,
             sum(value) AS value
           FROM points WHERE metric = 'purchase'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY)
         SELECT metric, tag_user, tag_k, ts,
           (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM (SELECT metric, tag_user, tag_k, ts,
           CASE WHEN min(ts) OVER (PARTITION BY metric, tag_user, tag_k
               ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               <= ts - ${3 * DAY}
             THEN avg(value) OVER (PARTITION BY metric, tag_user, tag_k
               ORDER BY ts RANGE BETWEEN ${3 * DAY - 1} PRECEDING
                 AND CURRENT ROW)
             ELSE 0.0 END AS v
           FROM d)
         ORDER BY tag_user, tag_k, ts""",

    "q31_highest_current" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k, ts - ts % $DAY AS ts,
             sum(value) AS value
           FROM points WHERE metric = 'signup'
           GROUP BY metric, tag_user, tag_k, ts - ts % $DAY),
         scored AS (
           SELECT metric, tag_user, tag_k, arg_max(value, ts) AS score
           FROM d GROUP BY metric, tag_user, tag_k),
         ranked AS (
           SELECT metric, tag_user, tag_k,
             row_number() OVER (ORDER BY score DESC, metric, tag_user, tag_k) AS rk
           FROM scored)
         SELECT d.metric, d.tag_user, d.tag_k, d.ts, (sign(d.value) * floor(abs(d.value) * 10000 + 0.5) / 10000) AS value
         FROM d JOIN ranked r
           ON d.metric = r.metric AND d.tag_user = r.tag_user
             AND d.tag_k = r.tag_k
         WHERE r.rk <= 3
         ORDER BY d.tag_user, d.tag_k, d.ts""",

    "q32_pfsum_group" ->
      s"""$O, p AS (
           SELECT tag_user, tag_k, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points WHERE metric = 'click'
           GROUP BY tag_user, tag_k, ts - ts % $HOUR),
         grid AS (SELECT DISTINCT b FROM p),
         series AS (SELECT DISTINCT tag_user, tag_k FROM p),
         slots AS (SELECT s.tag_user, s.tag_k, g.b FROM series s CROSS JOIN grid g),
         j AS (
           SELECT sl.tag_user, sl.tag_k, sl.b, p.v
           FROM slots sl LEFT JOIN p
             ON sl.tag_user = p.tag_user AND sl.tag_k = p.tag_k AND sl.b = p.b),
         w AS (
           SELECT b, v, last_value(v IGNORE NULLS) OVER
             (PARTITION BY tag_user, tag_k ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             first_value(v IGNORE NULLS) OVER
             (PARTITION BY tag_user, tag_k ORDER BY b
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
           FROM j),
         -- the previous-value carry STOPS at the series' last point
         -- (iterator expiry, AggregationIterator.next:518-525)
         iv AS (SELECT b, CASE WHEN v IS NOT NULL THEN v
           WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv END AS ival
           FROM w)
         SELECT 'click' AS metric, b AS ts, (sign(sum(ival)) * floor(abs(sum(ival)) * 10000 + 0.5) / 10000) AS value
         FROM iv GROUP BY b ORDER BY ts""",

    "q33_explicit_tags" ->
      s"""$O SELECT metric, tag_user, CAST(NULL AS VARCHAR) AS tag_k, ts,
           (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'error' AND CAST(tag_user AS INT) % 2 = 0
         ORDER BY ts, tag_user""",

    "q34_not_key" ->
      s"""$O SELECT metric, tag_user, CAST(NULL AS VARCHAR) AS tag_k, ts,
           (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'error' AND CAST(tag_user AS INT) % 2 = 0
         ORDER BY ts, tag_user""",

    "q35_run_all" ->
      s"""$O SELECT metric, tag_user, tag_k, $T_0105 AS ts,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'purchase' AND ts >= $T_0105 AND ts < $T_0120
         GROUP BY metric, tag_user, tag_k
         ORDER BY tag_user, tag_k""",

    "q36_calendar_week" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k,
             epoch_ms(date_trunc('week', make_timestamp(ts * 1000))) AS b,
             sum(value) AS v
           FROM points WHERE metric = 'signup'
           GROUP BY metric, tag_user, tag_k,
             epoch_ms(date_trunc('week', make_timestamp(ts * 1000))))
         SELECT metric, tag_user, tag_k, b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d ORDER BY ts, tag_user, tag_k""",

    "q51_calendar_month" ->
      s"""$O, d AS (
           SELECT metric, tag_user, tag_k,
             epoch_ms(timezone('America/New_York', date_trunc('month',
               timezone('America/New_York',
                 timezone('UTC', make_timestamp(ts * 1000)))))) AS b,
             sum(value) AS v
           FROM points WHERE metric = 'purchase'
           GROUP BY 1, 2, 3, 4)
         SELECT metric, tag_user, tag_k, b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d ORDER BY ts, tag_user, tag_k""",

    // identical semantics to q28 — the GET string must change nothing
    "q84_uri_get" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user IS NOT NULL
           GROUP BY tag_user, ts - ts % $HOUR)
         SELECT 'click' AS metric, tag_user, b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d WHERE b >= $T_0105 AND b <= $T_0120
         ORDER BY tag_user, ts""",

    "q85_budget_guards" ->
      s"""$O, c AS (
           SELECT count(*) AS n FROM points
           WHERE metric = 'click' AND ts >= $T_0105 AND ts < $T_0120)
         SELECT * FROM (
           SELECT 'bytes_over' AS "check", TRUE AS rejected,
             CAST(0 AS BIGINT) AS n
           UNION ALL SELECT 'bytes_under', FALSE, n FROM c
           UNION ALL SELECT 'points_over', TRUE, CAST(0 AS BIGINT)
           UNION ALL SELECT 'points_under', FALSE, n FROM c)
         ORDER BY "check"""",

    "q86_custom_agg" ->
      s"""$O, d AS (
           SELECT tag_user, tag_k, ts - ts % $HOUR AS b,
             max(value) - min(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user IS NOT NULL
             AND tag_k IN ('10','11','12')
           GROUP BY tag_user, tag_k, ts - ts % $HOUR),
         g AS (SELECT tag_user, b, sum(v) AS v FROM d GROUP BY tag_user, b)
         SELECT 'click' AS metric, tag_user, b AS ts,
           (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM g WHERE b >= $T_0105 AND b <= $T_0120
         ORDER BY tag_user, ts""",

    "q87_filter_plugin" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'view' AND tag_user IS NOT NULL
             AND tag_k LIKE '%5'
           GROUP BY tag_user, ts - ts % $HOUR)
         SELECT 'view' AS metric, tag_user, b AS ts,
           (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d WHERE b >= $T_0105 AND b <= $T_0120
         ORDER BY tag_user, ts""",

    "q89_strict_metric" ->
      s"""$O, c AS (
           SELECT count(DISTINCT ts - ts % $DAY) AS n FROM points
           WHERE metric = 'click' AND ts - ts % $DAY >= $T_0105
             AND ts - ts % $DAY <= $T_0120)
         SELECT * FROM (
           SELECT 'lenient_unknown' AS "check", FALSE AS rejected,
             CAST(0 AS BIGINT) AS n
           UNION ALL SELECT 'strict_known', FALSE, n FROM c
           UNION ALL SELECT 'strict_unknown', TRUE, CAST(0 AS BIGINT))
         ORDER BY "check"""",

    "q88_write_filter" ->
      s"""$O, stored AS (
           SELECT metric, value FROM points
           WHERE tag_k IS NOT NULL
             AND NOT (metric = 'click' AND tag_k = '10')),
         rej AS (
           SELECT count(*) AS rejected_total FROM points
           WHERE tag_k IS NOT NULL AND metric = 'click' AND tag_k = '10')
         SELECT metric, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v,
           rejected_total
         FROM stored, rej
         GROUP BY metric, rejected_total ORDER BY metric""",

    "q83_rt_publish" ->
      s"""$O SELECT metric, tag_user, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v
         FROM points WHERE metric = 'view' AND tag_k IS NOT NULL
         GROUP BY metric, tag_user ORDER BY metric, tag_user""",

    "q82_stream_rate" ->
      s"""$O, uniq AS (
           SELECT ts, tag_user, tag_k, max(value) AS value
           FROM points WHERE metric = 'click' AND tag_k IS NOT NULL
           GROUP BY ts, tag_user, tag_k),
         r AS (
           SELECT tag_user, tag_k, ts, value,
             lag(ts) OVER w AS pts, lag(value) OVER w AS pv
           FROM uniq WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY ts))
         SELECT tag_user, tag_k, ts,
           (sign((value - pv) / ((ts - pts) / 1000.0))
             * floor(abs((value - pv) / ((ts - pts) / 1000.0)) * 10000 + 0.5)
             / 10000) AS rate
         FROM r WHERE pts IS NOT NULL
         ORDER BY tag_user, tag_k, ts""",

    "q81_calendar_90m" ->
      s"""$O, b AS (
           SELECT metric, tag_user, tag_k, ts, value,
             epoch_ms(timezone('America/Denver', date_trunc('day',
               timezone('America/Denver',
                 timezone('UTC', make_timestamp(ts * 1000)))))) AS mid
           FROM points WHERE metric = 'view'),
         d AS (
           SELECT metric, tag_user, tag_k,
             mid + ((ts - mid) // 5400000) * 5400000 AS bts,
             avg(value) AS v
           FROM b GROUP BY 1, 2, 3, 4)
         SELECT metric, tag_user, tag_k, bts AS ts,
           (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d ORDER BY ts, tag_user, tag_k""",

    "q37_ep90r3" ->
      s"""$O, g AS (
           SELECT metric, ts - ts % $DAY AS ts,
             list_sort(list(value)) AS arr, count(*) AS n
           FROM points GROUP BY metric, ts - ts % $DAY),
         h AS (
           SELECT metric, ts, arr, n, n * 0.9 - 0.5 AS hh FROM g),
         idx AS (
           SELECT metric, ts, arr, n,
             CASE WHEN hh - floor(hh) = 0.5 THEN
               CASE WHEN CAST(floor(hh) AS BIGINT) % 2 = 0
                 THEN floor(hh) ELSE floor(hh) + 1 END
             ELSE round(hh, 0) END AS i0
           FROM h)
         SELECT metric, ts,
           (sign(arr[CAST(least(greatest(i0, 1), n) AS INT)]) * floor(abs(arr[CAST(least(greatest(i0, 1), n) AS INT)]) * 10000 + 0.5) / 10000) AS p90r3_v,
           n AS cnt_v
         FROM idx ORDER BY metric, ts""",

    "q38_fsck" ->
      s"""$O SELECT * FROM (
           SELECT 'bad_metric_charset' AS "check",
             count(CASE WHEN NOT regexp_matches(metric,
               '^[a-zA-Z0-9\\-_./\\p{L}]+$$') THEN 1 END)::BIGINT AS n
           FROM points
           UNION ALL
           SELECT 'duplicate_points',
             CAST(coalesce(sum(c - 1), 0) AS BIGINT)
           FROM (SELECT count(*) AS c FROM points
                 GROUP BY metric, tag_user, tag_k, ts HAVING count(*) > 1)
           UNION ALL
           SELECT 'future_timestamps',
             count(CASE WHEN ts > $T_0120 THEN 1 END)::BIGINT FROM points
           UNION ALL
           SELECT 'non_finite_values',
             count(CASE WHEN isnan(value) OR isinf(value) THEN 1 END)::BIGINT
           FROM points
           UNION ALL
           SELECT 'null_values',
             count(CASE WHEN value IS NULL THEN 1 END)::BIGINT FROM points)
         ORDER BY "check"""",

    "q39_gexp_diff_mult" ->
      s"""$O, c AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'click' GROUP BY ts - ts % $HOUR),
         v AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'view' GROUP BY ts - ts % $HOUR),
         d AS (
           SELECT coalesce(c.ts, v.ts) AS ts,
             coalesce(c.v, 0.0) - coalesce(v.v, 0.0) AS diff_v
           FROM c FULL OUTER JOIN v ON c.ts = v.ts),
         m AS (
           SELECT c.ts AS ts, c.v * v.v AS mult_v
           FROM c JOIN v ON c.ts = v.ts)
         SELECT d.ts AS ts, (sign(d.diff_v) * floor(abs(d.diff_v) * 10000 + 0.5) / 10000) AS diff_v,
           (sign(m.mult_v) * floor(abs(m.mult_v) * 10000 + 0.5) / 10000) AS mult_v
         FROM d LEFT JOIN m ON d.ts = m.ts
         ORDER BY d.ts""",

    "q59_exp_time_offset" -> {
      val start = T_0105 + DAY
      s"""$O, hourly AS (
           SELECT tag_user, ts - ts % $HOUR AS b, sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user IN ('1', '2', '3')
           GROUP BY 1, 2),
         cur AS (
           SELECT tag_user, b, v FROM hourly
           WHERE b >= $start AND b <= $T_0120),
         prev AS (
           SELECT tag_user, b + $DAY AS b, v FROM hourly
           WHERE b >= ${start - DAY} AND b <= ${T_0120 - DAY}),
         grid AS (SELECT DISTINCT b FROM
           (SELECT b FROM cur UNION ALL SELECT b FROM prev)),
         series AS (SELECT DISTINCT tag_user FROM
           (SELECT tag_user FROM cur UNION ALL SELECT tag_user FROM prev)),
         j AS (
           SELECT s.tag_user, g.b,
             coalesce(cur.v, 0.0) - coalesce(prev.v, 0.0) AS v
           FROM series s CROSS JOIN grid g
           LEFT JOIN cur ON cur.tag_user = s.tag_user AND cur.b = g.b
           LEFT JOIN prev ON prev.tag_user = s.tag_user AND prev.b = g.b)
         SELECT 'dod' AS metric, tag_user, b AS ts,
           (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM j ORDER BY tag_user, ts"""
    },

    "q58_put_parse" ->
      s"""$O
         SELECT metric, tag_user, tag_k, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v, min(ts) AS first_ts
         FROM points WHERE tag_k IS NOT NULL
         GROUP BY metric, tag_user, tag_k
         ORDER BY metric, tag_user, tag_k""",

    "q57_alias_template" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, 2 * sum(value) AS v
           FROM points
           WHERE metric = 'click' AND tag_user IS NOT NULL
           GROUP BY tag_user, ts - ts % $HOUR)
         SELECT 'user.' || tag_user || '.clicks' AS metric, tag_user,
           b AS ts, (sign(v) * floor(abs(v) * 10000 + 0.5) / 10000) AS value
         FROM d WHERE b >= $T_0105 AND b <= $T_0120
         ORDER BY tag_user, ts""",

    "q41_gexp_pipeline" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, 2 * sum(value) AS v
           FROM points
           WHERE metric = 'view' AND tag_user IS NOT NULL
           GROUP BY tag_user, ts - ts % $HOUR),
         clipped AS (
           SELECT tag_user, b, v FROM d
           WHERE b >= $T_0105 AND b <= $T_0120),
         scored AS (
           SELECT tag_user, max(v) AS score FROM clipped GROUP BY tag_user),
         ranked AS (
           SELECT tag_user,
             row_number() OVER (ORDER BY score DESC, tag_user) AS rk
           FROM scored)
         SELECT 'topviews' AS metric, c.tag_user, c.b AS ts,
           (sign(c.v) * floor(abs(c.v) * 10000 + 0.5) / 10000) AS value
         FROM clipped c JOIN ranked r ON c.tag_user = r.tag_user
         WHERE r.rk <= 3
         ORDER BY c.tag_user, ts""",

    "q108_stats_query" ->
      s"""$O, n AS (
           SELECT CAST(count(*) AS BIGINT) AS dps FROM points
           WHERE metric = 'click')
         SELECT remote, query, code, executed, emitted_dps FROM (
           SELECT '10.1.1.2:4242' AS remote, 'm=sum:view' AS query,
             CAST(408 AS BIGINT) AS code, CAST(1 AS BIGINT) AS executed,
             CAST(0 AS BIGINT) AS emitted_dps
           UNION ALL
           SELECT '192.168.1.1:4242', 'm=sum:click',
             CAST(200 AS BIGINT), CAST(2 AS BIGINT), dps FROM n)
         ORDER BY remote, query""",

    "q110_tracked_serving" ->
      // emitted rows per sub-query = 1h buckets surviving the clip:
      // scan is padded one interval past the end and the clip keeps
      // bucket ts <= end, so the end-boundary bucket (fed by points in
      // [end, end+1h)) is emitted — hence `< end + 3600000`
      s"""$O, c AS (
           SELECT CAST(count(DISTINCT ts // 3600000) AS BIGINT) AS dps
           FROM points
           WHERE metric = 'click' AND ts >= $T_0105
             AND ts < $T_0120 + 3600000),
         v AS (
           SELECT CAST(count(DISTINCT ts // 3600000) AS BIGINT) AS dps
           FROM points
           WHERE metric = 'view' AND ts >= $T_0105
             AND ts < $T_0120 + 3600000)
         SELECT '10.7.7.7:4242' AS remote, CAST(200 AS BIGINT) AS code,
           CAST(2 AS BIGINT) AS executed, c.dps AS dps_click,
           v.dps AS dps_view, c.dps + v.dps AS dps_total
         FROM c, v""",

    "q111_time_parse" ->
      // literal expected epochs (now injected as 1700000000000):
      // the quirk rows are "1min" (last-char dispatch → 1 month =
      // 2592000000 ms) and "1356998400.5" (digits concatenate to
      // 13569984005, NOT padded to .500)
      """SELECT input, kind, CAST(value_ms AS BIGINT) AS value_ms
         FROM (VALUES
           ('5m', 'duration', 300000),
           ('100ms', 'duration', 100),
           ('4000ms', 'duration', 4000),
           ('30s', 'duration', 30000),
           ('2h', 'duration', 7200000),
           ('3d', 'duration', 259200000),
           ('2w', 'duration', 1209600000),
           ('1n', 'duration', 2592000000),
           ('2y', 'duration', 63072000000),
           ('1min', 'duration', 2592000000),
           ('now', 'date', 1700000000000),
           ('5m-ago', 'date', 1699999700000),
           ('1y-ago', 'date', 1668464000000),
           ('2018/01/01', 'date', 1514764800000),
           ('2018/01/01-12:30', 'date', 1514809800000),
           ('2018/01/01 12:30:15', 'date', 1514809815000),
           ('1356998400', 'date', 1356998400000),
           ('1356998400123', 'date', 1356998400123),
           ('1356998400.5', 'date', 13569984005),
           ('789ms', 'date', 789)
         ) t(input, kind, value_ms)
         ORDER BY kind, input""",

    "q109_tree_branch" ->
      s"""$O, series AS (
           SELECT DISTINCT metric, tag_user, tag_k,
             metric || '|k=' || coalesce(tag_k, '-')
               || ',user=' || coalesce(tag_user, '-') AS tsuid
           FROM points WHERE metric = 'click'),
         kids AS (
           SELECT 'click' AS branch, 'branch' AS kind,
             tag_user AS display_name, 'click/' || tag_user AS path,
             CAST(NULL AS VARCHAR) AS tsuid, CAST(NULL AS VARCHAR) AS metric
           FROM series WHERE tag_user IS NOT NULL GROUP BY tag_user),
         leafs AS (
           SELECT 'click/7' AS branch, 'leaf' AS kind,
             tag_k AS display_name, 'click/7/' || tag_k AS path,
             min(tsuid) AS tsuid, 'click' AS metric
           FROM series WHERE tag_user = '7' AND tag_k IS NOT NULL
           GROUP BY tag_k)
         SELECT * FROM (SELECT * FROM kids UNION ALL SELECT * FROM leafs)
         ORDER BY branch, kind, display_name""",

    "q107_gexp_uri" ->
      s"""$O, d AS (
           SELECT tag_user, ts - ts % $HOUR AS b, 2 * sum(value) AS v
           FROM points
           WHERE metric = 'view' AND tag_user IS NOT NULL
           GROUP BY tag_user, ts - ts % $HOUR),
         clipped AS (
           SELECT tag_user, b, v FROM d
           WHERE b >= $T_0105 AND b <= $T_0120),
         scored AS (
           SELECT tag_user, max(v) AS score FROM clipped GROUP BY tag_user),
         ranked AS (
           SELECT tag_user,
             row_number() OVER (ORDER BY score DESC, tag_user) AS rk
           FROM scored)
         SELECT 'topviews' AS metric, c.tag_user, c.b AS ts,
           (sign(c.v) * floor(abs(c.v) * 10000 + 0.5) / 10000) AS value
         FROM clipped c JOIN ranked r ON c.tag_user = r.tag_user
         WHERE r.rk <= 3
         ORDER BY c.tag_user, ts""",

    "q42_filters_ci_real" ->
      s"""$O SELECT metric, tag_user, concat('K', tag_k) AS tag_k, ts,
           (sign(value) * floor(abs(value) * 10000 + 0.5) / 10000) AS value
         FROM points
         WHERE metric = 'click'
           AND lower(concat('K', tag_k)) IN ('k1','k2','k3','k10','k11')
           AND regexp_matches(lower(concat('K', tag_k)), '^k1.*$$')
           AND lower(concat('K', tag_k)) NOT IN ('k10')
         ORDER BY ts, tag_user""",

    "q43_engine_percentiles" ->
      s"""$O, h AS (
           SELECT metric, ts - ts % $DAY AS b,
             floor(value / 10.0) * 10.0 AS lo,
             (floor(value / 10.0) + 1) * 10.0 AS hi,
             count(*) AS cnt
           FROM points
           WHERE metric = 'purchase' AND ts >= $T_0105 AND ts <= $T_0120
           GROUP BY metric, ts - ts % $DAY, floor(value / 10.0)),
         c AS (
           SELECT metric, b, lo, hi, cnt,
             CAST(sum(cnt) OVER (PARTITION BY metric, b ORDER BY lo) AS DOUBLE) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY metric, b) AS DOUBLE) AS total
           FROM h)
         SELECT metric, b AS ts,
           (sign(lo + (hi - lo) * (total * (pt / 100) - (cum - cnt)) / cnt) * floor(abs(lo + (hi - lo) * (total * (pt / 100) - (cum - cnt)) / cnt) * 10000 + 0.5) / 10000)
             AS value,
           CAST(pt AS DOUBLE) AS ptile
         FROM c CROSS JOIN (VALUES (CAST(50.0 AS DOUBLE)),
           (CAST(90.0 AS DOUBLE))) pp(pt)
         WHERE cum >= total * (pt / 100) AND (cum - cnt) < total * (pt / 100)
         ORDER BY ptile, ts""",

    "q44_exp_union_fill" ->
      s"""$O, c AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'click' GROUP BY ts - ts % $HOUR),
         p AS (
           SELECT ts - ts % $HOUR AS ts, sum(value) AS v FROM points
           WHERE metric = 'purchase' GROUP BY ts - ts % $HOUR)
         SELECT coalesce(c.ts, p.ts) AS ts,
           (sign(coalesce(c.v, 0.0) - coalesce(p.v, 0.0)) * floor(abs(coalesce(c.v, 0.0) - coalesce(p.v, 0.0)) * 10000 + 0.5) / 10000) AS value
         FROM c FULL OUTER JOIN p ON c.ts = p.ts
         ORDER BY ts""",

    "q45_engine_rate" -> {
      val start = T_0105; val end = T_0120; val pad = DAY
      s"""$O, d AS (
           SELECT tag_user, tag_k, ts - ts % $DAY AS b, sum(value) AS v
           FROM points
           WHERE metric = 'purchase' AND tag_user IS NOT NULL
             AND ts >= ${start - pad} AND ts <= ${end + pad}
           GROUP BY tag_user, tag_k, ts - ts % $DAY),
         r AS (
           SELECT tag_user, b,
             (v - lag(v) OVER w) / ((b - lag(b) OVER w) / 1000.0) AS rate
           FROM d WINDOW w AS (PARTITION BY tag_user, tag_k ORDER BY b)),
         c AS (
           SELECT tag_user, b, rate FROM r
           WHERE rate IS NOT NULL AND b >= $start AND b <= $end)
         SELECT 'purchase' AS metric, tag_user, b AS ts,
           (sign(sum(rate)) * floor(abs(sum(rate)) * 10000 + 0.5) / 10000) AS value
         FROM c GROUP BY tag_user, b ORDER BY tag_user, ts"""
    },

    "q46_aggregators" ->
      s"""SELECT * FROM (VALUES ${graft.operators.Aggregators.all.sorted
           .map(a => s"('$a')").mkString(", ")}) t(aggregator)
         ORDER BY aggregator""",

    "q49_uid_registry" ->
      s"""$O, f AS (SELECT * FROM points WHERE metric IN ('click','signup')),
         names AS (
           SELECT DISTINCT 'metric' AS kind, metric AS name FROM f
           UNION
           SELECT DISTINCT 'tagk', k FROM f
             CROSS JOIN (VALUES ('user'), ('k')) t(k)
           UNION
           SELECT DISTINCT 'tagv', tag_user FROM f
             WHERE tag_user IS NOT NULL
           UNION
           SELECT DISTINCT 'tagv', tag_k FROM f WHERE tag_k IS NOT NULL)
         SELECT kind, name,
           dense_rank() OVER (PARTITION BY kind ORDER BY name) AS uid
         FROM names ORDER BY kind, uid""",

    // raw pass-through of the most-populated (user, k) click series
    // (ties lexicographic) — no aggregation applied
    "q75_agg_none" ->
      s"""$O, c AS (SELECT * FROM points WHERE metric = 'click'
           AND tag_user IS NOT NULL AND tag_k IS NOT NULL),
         sel AS (SELECT tag_user, tag_k FROM c
           GROUP BY tag_user, tag_k
           ORDER BY count(*) DESC, tag_user, tag_k LIMIT 1)
         SELECT c.ts, (sign(c.value) * floor(abs(c.value) * 10000 + 0.5) / 10000) AS value
         FROM c JOIN sel ON c.tag_user = sel.tag_user
           AND c.tag_k = sel.tag_k
         ORDER BY ts, value""",

    // q49's registry + assign (existing 'click' rejected, fresh
    // 'zz.new' = per-kind max + 1) + rename signup→signup2 (uid kept)
    "q102_uid_whitelist" ->
      s"""$O, f AS (
           SELECT DISTINCT metric AS name FROM points
           WHERE metric IN ('click','signup')),
         reg AS (
           SELECT name,
             CAST(dense_rank() OVER (ORDER BY name) AS BIGINT) AS uid
           FROM f),
         mx AS (SELECT max(uid) AS m FROM reg)
         SELECT * FROM (
           SELECT 'metric' AS kind, name, uid,
             'Name already exists with UID: ' || uid AS error
           FROM reg WHERE name = 'click'
           UNION ALL
           SELECT 'metric', 'web.hits', CAST(NULL AS BIGINT),
             'Failed to assign ID for kind=''metric'' name=''web.hits'' after 0 attempts due to: Blocked by UID filter.'
           UNION ALL
           SELECT 'metric', 'zz.new', m + 1, CAST(NULL AS VARCHAR) FROM mx)
         ORDER BY kind, name""",

    "q74_uid_mutations" ->
      s"""$O, f AS (SELECT * FROM points WHERE metric IN ('click','signup')),
         names AS (
           SELECT DISTINCT 'metric' AS kind, metric AS name FROM f
           UNION
           SELECT DISTINCT 'tagk', k FROM f
             CROSS JOIN (VALUES ('user'), ('k')) t(k)
           UNION
           SELECT DISTINCT 'tagv', tag_user FROM f
             WHERE tag_user IS NOT NULL
           UNION
           SELECT DISTINCT 'tagv', tag_k FROM f WHERE tag_k IS NOT NULL),
         reg AS (
           SELECT kind, name,
             dense_rank() OVER (PARTITION BY kind ORDER BY name) AS uid
           FROM names),
         added AS (
           SELECT 'metric' AS kind, 'zz.new' AS name,
             (SELECT max(uid) FROM reg WHERE kind = 'metric') + 1 AS uid),
         merged AS (SELECT * FROM reg UNION ALL SELECT * FROM added)
         SELECT kind,
           CASE WHEN kind = 'metric' AND name = 'signup'
             THEN 'signup2' ELSE name END AS name,
           uid
         FROM merged ORDER BY kind, uid""",

    "q79_meta_sync_uid" ->
      s"""$O, f AS (SELECT * FROM points WHERE metric IN ('click','signup')),
         names AS (
           SELECT 'metric' AS kind, metric AS name, min(ts) AS earliest
           FROM f GROUP BY metric
           UNION ALL
           SELECT 'tagk', k, min(ts) FROM f
             CROSS JOIN (VALUES ('user'), ('k')) t(k) GROUP BY k
           UNION ALL
           SELECT 'tagv', v, min(ts) FROM (
             SELECT tag_user AS v, ts FROM f WHERE tag_user IS NOT NULL
             UNION ALL
             SELECT tag_k, ts FROM f WHERE tag_k IS NOT NULL) GROUP BY v),
         reg AS (
           SELECT kind, name,
             dense_rank() OVER (PARTITION BY kind ORDER BY name) AS uid
           FROM (SELECT DISTINCT kind, name FROM names)),
         d AS (SELECT n.kind, n.name, n.earliest, r.uid
               FROM names n LEFT JOIN reg r USING (kind, name)),
         stored AS (
           SELECT kind, name, uid, 9999999999999 AS created
           FROM reg WHERE kind = 'metric'
           UNION ALL SELECT 'metric', 'ghost', 999, 123),
         j AS (SELECT coalesce(d.kind, s.kind) AS kind,
                 coalesce(d.name, s.name) AS name,
                 coalesce(d.uid, s.uid) AS uid,
                 d.earliest, s.created AS stored_created
               FROM d FULL OUTER JOIN stored s
                 ON d.kind = s.kind AND d.uid = s.uid)
         SELECT kind, name, uid,
           CASE WHEN stored_created IS NULL THEN earliest
                WHEN earliest IS NOT NULL AND stored_created > earliest
                  THEN earliest
                ELSE stored_created END AS created,
           CASE WHEN earliest IS NULL THEN 'orphan'
                WHEN stored_created IS NULL THEN 'created'
                WHEN stored_created > earliest THEN 'fixed_created'
                ELSE 'ok' END AS status
         FROM j ORDER BY kind, name""",

    "q80_meta_sync_ts" ->
      s"""$O, f AS (SELECT * FROM points WHERE metric = 'purchase'),
         d AS (
           SELECT metric || '|k=' || coalesce(tag_k, '-')
               || ',user=' || coalesce(tag_user, '-') AS tsuid,
             min(ts) AS earliest
           FROM f GROUP BY 1),
         stored AS (
           SELECT DISTINCT metric || '|k=' || coalesce(tag_k, '-')
               || ',user=' || coalesce(tag_user, '-') AS tsuid,
             9999999999999 AS created
           FROM f WHERE tag_user = '1'
           UNION ALL SELECT 'purchase|k=-,user=ghost', 123),
         j AS (SELECT coalesce(d.tsuid, s.tsuid) AS tsuid,
                 d.earliest, s.created AS stored_created
               FROM d FULL OUTER JOIN stored s ON d.tsuid = s.tsuid)
         SELECT tsuid,
           CASE WHEN stored_created IS NULL THEN earliest
                WHEN earliest IS NOT NULL AND stored_created > earliest
                  THEN earliest
                ELSE stored_created END AS created,
           CASE WHEN earliest IS NULL THEN 'orphan'
                WHEN stored_created IS NULL THEN 'created'
                WHEN stored_created > earliest THEN 'fixed_created'
                ELSE 'ok' END AS status
         FROM j ORDER BY tsuid""",

    // canonical tsuid = metric|k=<k>,user=<u> (sorted tag keys, null→'-')
    "q76_tree_collisions" ->
      s"""$O, series AS (
           SELECT DISTINCT metric, tag_user, tag_k,
             metric || '|k=' || coalesce(tag_k, '-')
               || ',user=' || coalesce(tag_user, '-') AS tsuid
           FROM points),
         leafed AS (
           SELECT tsuid, metric || '/' || tag_user AS path
           FROM series WHERE tag_user IS NOT NULL),
         w AS (SELECT path, min(tsuid) AS existing_tsuid
               FROM leafed GROUP BY path)
         SELECT l.tsuid, w.existing_tsuid, l.path
         FROM leafed l JOIN w USING (path)
         WHERE l.tsuid <> w.existing_tsuid
         ORDER BY tsuid""",

    "q77_tree_notmatched" ->
      s"""$O, stranded AS (
           SELECT metric, tag_user,
             CASE WHEN CAST(tag_user AS INT) % 3 = 0 THEN NULL
                  ELSE tag_k END AS tag_k
           FROM points),
         series AS (
           SELECT DISTINCT metric, tag_user, tag_k,
             metric || '|k=' || coalesce(tag_k, '-')
               || ',user=' || coalesce(tag_user, '-') AS tsuid
           FROM stranded)
         SELECT tsuid, concat_ws(' ',
             CASE WHEN tag_user IS NULL THEN '[1:1:0:TAGK]' END,
             CASE WHEN tag_k IS NULL THEN '[1:2:0:TAGK]' END) AS message
         FROM series WHERE tag_user IS NULL OR tag_k IS NULL
         ORDER BY tsuid""",

    "q78_tree_test" ->
      s"""$O, series AS (
           SELECT DISTINCT metric, tag_user, tag_k,
             metric || '|k=' || coalesce(tag_k, '-')
               || ',user=' || coalesce(tag_user, '-') AS tsuid
           FROM points WHERE metric = 'click')
         SELECT * FROM (
           SELECT tsuid, CAST(0 AS INT) AS level, CAST(0 AS INT) AS "order",
             '[1:0:0:METRIC]' AS rule, metric AS value,
             true AS tried, true AS matched
           FROM series
           UNION ALL
           SELECT tsuid, 1, 0, '[1:1:0:TAGK]', CAST(NULL AS VARCHAR),
             true, false
           FROM series
           UNION ALL
           SELECT tsuid, 1, 1, '[1:1:1:TAGK]', tag_user,
             true, tag_user IS NOT NULL
           FROM series)
         ORDER BY tsuid, level, "order" """,

    "q40_tree" ->
      s"""$O SELECT * FROM (
           SELECT 1 AS depth, metric AS path, metric AS name, '' AS parent,
             count(DISTINCT (tag_user, tag_k)) AS leaves
           FROM points GROUP BY metric
           UNION ALL
           SELECT 2, metric || '/' || tag_user, tag_user, metric,
             count(DISTINCT (tag_user, tag_k))
           FROM points WHERE tag_user IS NOT NULL
           GROUP BY metric, tag_user)
         ORDER BY depth, path""",

    "q60_put_json" ->
      s"""$O SELECT metric, tag_user, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v
         FROM points WHERE metric IN ('click', 'view')
         GROUP BY metric, tag_user ORDER BY metric, tag_user""",

    "q61_export_roundtrip" ->
      s"""$O, mixed AS (
           SELECT metric, tag_user,
             CASE WHEN ts % 2 = 0 THEN floor(value) ELSE value END AS value,
             CASE WHEN ts % 2 = 0 THEN CAST(floor(value) AS BIGINT) END AS value_l,
             ts % 2 = 0 AS is_int
           FROM points WHERE metric = 'purchase' AND tag_k IS NOT NULL)
         SELECT metric, tag_user, count(*) AS n,
           CAST(sum(CASE WHEN is_int THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
           CAST(sum(value_l) AS BIGINT) AS sum_l,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v
         FROM mixed GROUP BY metric, tag_user ORDER BY metric, tag_user""",

    "q62_mimmin_group" ->
      s"""$O SELECT metric, ts - ts % $HOUR AS ts, (sign(min(value)) * floor(abs(min(value)) * 10000 + 0.5) / 10000) AS value
         FROM points GROUP BY metric, ts - ts % $HOUR
         ORDER BY metric, ts""",

    "q63_stream_ingest" ->
      s"""$O, uniq AS (
           SELECT metric, ts, tag_user, tag_k, max(value) AS value
           FROM points WHERE metric = 'signup' AND tag_k IS NOT NULL
             AND ts >= $T_0105 AND ts < $T_0120
           GROUP BY metric, ts, tag_user, tag_k)
         SELECT metric, count(*) AS n, (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v
         FROM uniq GROUP BY metric ORDER BY metric""",

    "q64_stream_rollup" ->
      s"""$O SELECT metric, ts - ts % $HOUR AS ts, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v, (sign(min(value)) * floor(abs(min(value)) * 10000 + 0.5) / 10000) AS min_v,
           (sign(max(value)) * floor(abs(max(value)) * 10000 + 0.5) / 10000) AS max_v
         FROM points
         WHERE metric = 'error' AND ts >= $T_0105 AND ts < $T_0120
         GROUP BY metric, ts - ts % $HOUR ORDER BY metric, ts""",

    "q65_put_summary" ->
      s"""$O SELECT count(*) AS success, CAST(3 AS BIGINT) AS failed
         FROM points WHERE metric = 'view'""",

    "q66_stats" ->
      s"""$O SELECT metric, count(*) AS points, min(ts) AS first_ts,
           max(ts) AS last_ts
         FROM points GROUP BY metric ORDER BY metric""",

    "q67_series_meta" ->
      s"""$O SELECT metric, tag_user, tag_k, min(ts) AS first_seen,
           max(ts) AS last_seen, count(*) AS points
         FROM points GROUP BY metric, tag_user, tag_k
         ORDER BY metric, tag_user, tag_k""",

    "q68_sliding_stream" ->
      s"""$O, sl AS (
           SELECT metric, tag_user, tag_k, value,
             ts - ts % 300000 - o.off AS w
           FROM points CROSS JOIN (VALUES (0), (300000)) o(off)
           WHERE metric = 'purchase'
             AND ts >= $T_0105 AND ts < ${T_0105 + 7 * DAY})
         SELECT metric, tag_user, tag_k, w AS ts,
           (sign(avg(value)) * floor(abs(avg(value)) * 10000 + 0.5) / 10000) AS avg_v, count(*) AS n
         FROM sl GROUP BY metric, tag_user, tag_k, w
         ORDER BY metric, tag_user, tag_k, ts""",

    "q91_histogram_lines" ->
      s"""$O SELECT metric, floor(value / 10) * 10 AS bucket_lo,
           floor(value / 10) * 10 + 10 AS bucket_hi, count(*) AS n
         FROM points WHERE metric = 'purchase'
         GROUP BY metric, floor(value / 10) * 10
         ORDER BY metric, bucket_lo""",

    "q95_config_filters" ->
      """SELECT * FROM (VALUES
         ('literal_or',
          'Accepts one or more exact values and matches if the series contains any of them. Multiple values can be included and must be separated by the | (pipe) character. The filter is case sensitive and will not allow characters that TSDB does not allow at write time.',
          'host=literal_or(web01),  host=literal_or(web01|web02|web03)  {"type":"literal_or","tagk":"host","filter":"web01|web02|web03","groupBy":false}'),
         ('iliteral_or',
          'Accepts one or more exact values and matches if the series contains any of them. Multiple values can be included and must be separated by the | (pipe) character. The filter is case insensitive and will not allow characters that TSDB does not allow at write time.',
          'host=iliteral_or(web01),  host=iliteral_or(web01|web02|web03)  {"type":"iliteral_or","tagk":"host","filter":"web01|web02|web03","groupBy":false}'),
         ('not_literal_or',
          'Accepts one or more exact values and matches if the series does NOT contain any of them. Multiple values can be included and must be separated by the | (pipe) character. The filter is case sensitive and will not allow characters that TSDB does not allow at write time.',
          'host=not_literal_or(web01),  host=not_literal_or(web01|web02|web03)  {"type":"not_literal_or","tagk":"host","filter":"web01|web02|web03","groupBy":false}'),
         ('not_iliteral_or',
          'Accepts one or more exact values and matches if the series does NOT contain any of them. Multiple values can be included and must be separated by the | (pipe) character. The filter is case insensitive and will not allow characters that TSDB does not allow at write time.',
          'host=not_iliteral_or(web01),  host=not_iliteral_or(web01|web02|web03)  {"type":"not_iliteral_or","tagk":"host","filter":"web01|web02|web03","groupBy":false}'),
         ('wildcard',
          'Performs pre, post and in-fix glob matching of values. The globs are case sensitive and multiple wildcards can be used. The wildcard character is the * (asterisk). At least one wildcard must be present in the filter value. A wildcard by itself can be used as well to match on any value for the tag key.',
          'host=wildcard(web*),  host=wildcard(web*.tsdb.net)  {"type":"wildcard","tagk":"host","filter":"web*.tsdb.net","groupBy":false}'),
         ('iwildcard',
          'Performs pre, post and in-fix glob matching of values. The globs are case insensitive and multiple wildcards can be used. The wildcard character is the * (asterisk). Case insensitivity is achieved by dropping all values to lower case. At least one wildcard must be present in the filter value. A wildcard by itself can be used as well to match on any value for the tag key.',
          'host=iwildcard(web*),  host=iwildcard(web*.tsdb.net)  {"type":"iwildcard","tagk":"host","filter":"web*.tsdb.net","groupBy":false}'),
         ('regexp',
          'Provides full, POSIX compliant regular expression using the built in Java Pattern class. Note that an expression containing curly braces {} will not parse properly in URLs. If the pattern is not a valid regular expression then an exception will be raised.',
          'host=regexp(.*)  {"type":"regexp","tagk":"host","filter":".*","groupBy":false}'),
         ('not_key',
          'Skips any time series with the given tag key, regardless of the value. This can be useful for situations where a metric has inconsistent tag sets. NOTE: The filter value must be null or an empty string.',
          'host=not_key()  {"type":"not_key","tagk":"host","filter":"","groupBy":false}')
         ) t(filter, description, examples)
         ORDER BY filter""",

    "q96_hist_pct" ->
      s"""$O, hb AS (
           SELECT tag_user AS u, ts - ts % $HOUR AS ts,
             floor(value / 10) * 10 AS lo, count(*) AS c
           FROM points WHERE metric = 'purchase' GROUP BY 1, 2, 3),
         w AS (
           SELECT u, ts, lo, c,
             sum(c) OVER (PARTITION BY u, ts ORDER BY lo) AS cum,
             sum(c) OVER (PARTITION BY u, ts) AS total
           FROM hb),
         px AS (
           SELECT 0.5 AS p, u, ts,
             lo + 10 * (0.5 * total - (cum - c)) / c AS v
           FROM w WHERE cum >= 0.5 * total AND (cum - c) < 0.5 * total
           UNION ALL
           SELECT 0.9, u, ts,
             lo + 10 * (0.9 * total - (cum - c)) / c
           FROM w WHERE cum >= 0.9 * total AND (cum - c) < 0.9 * total)
         SELECT 'purchase' AS metric, ts,
           (sign(sum(v)) * floor(abs(sum(v)) * 10000 + 0.5) / 10000)
             AS value,
           p * 100 AS ptile
         FROM px GROUP BY ts, p ORDER BY ptile, ts""",

    "q97_normalize_put" ->
      s"""$O SELECT metric, 'u' || tag_user AS tag_user,
           CAST(count(*) AS BIGINT) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v
         FROM points WHERE metric = 'signup' AND tag_k IS NOT NULL
         GROUP BY metric, tag_user
         ORDER BY metric, tag_user""",

    "q98_search_lookup_plugin" ->
      s"""$O, m AS (
           SELECT metric, tag_user, tag_k,
             CAST(count(*) AS BIGINT) AS points
           FROM points GROUP BY metric, tag_user, tag_k)
         SELECT 'plugin' AS source, metric, tag_user, tag_k, points
         FROM m WHERE metric = 'view'
         UNION ALL
         SELECT 'engine', metric, tag_user, tag_k, points
         FROM m WHERE metric = 'signup'
         ORDER BY source, metric, tag_user, tag_k""",

    "q104_search_routed" ->
      s"""$O, m AS (
           SELECT metric, tag_user, tag_k,
             CAST(count(*) AS BIGINT) AS points
           FROM points GROUP BY metric, tag_user, tag_k),
         -- lookup with no limit= caps at SearchQuery's ctor default 25
         -- in the deterministic (metric, key-sorted tags) order: tags
         -- sort k before user, so (tag_k, tag_user) string order
         looked AS (
           SELECT metric, tag_user, tag_k, points
           FROM m WHERE metric = 'signup'
             AND tag_user IS NOT NULL AND tag_k IS NOT NULL
           ORDER BY metric, tag_k, tag_user LIMIT 25)
         SELECT 'plugin' AS source, metric, tag_user, tag_k, points
         FROM m WHERE metric = 'view'
         UNION ALL
         SELECT 'engine', metric, tag_user, tag_k, points FROM looked
         ORDER BY source, metric, tag_user, tag_k""",

    "q99_startup_plugin" ->
      s"""$O, src AS (
           SELECT value FROM points
           WHERE metric = 'click' AND tag_k IS NOT NULL),
         agg AS (
           SELECT count(*) AS n,
             (sign(min(value)) * floor(abs(min(value)) * 10000 + 0.5) / 10000) AS min_v,
             (sign(max(value)) * floor(abs(max(value)) * 10000 + 0.5) / 10000) AS max_v
           FROM src)
         SELECT 'm!bang' AS metric, FALSE AS ok, n, min_v, max_v FROM agg
         UNION ALL
         SELECT 'm%pct', TRUE, n, min_v, max_v FROM agg
         ORDER BY metric, ok""",

    "q93_uid_fsck" ->
      s"""$O, f0 AS (SELECT * FROM points WHERE metric IN ('click','signup')),
         names AS (
           SELECT DISTINCT 'metric' AS kind, metric AS name FROM f0
           UNION
           SELECT DISTINCT 'tagk', k FROM f0
             CROSS JOIN (VALUES ('user'), ('k')) t(k)
           UNION
           SELECT DISTINCT 'tagv', tag_user FROM f0 WHERE tag_user IS NOT NULL
           UNION
           SELECT DISTINCT 'tagv', tag_k FROM f0 WHERE tag_k IS NOT NULL),
         reg AS (SELECT kind, name,
           CAST(dense_rank() OVER (PARTITION BY kind ORDER BY name) AS BIGINT) AS uid
           FROM names),
         f AS (SELECT DISTINCT * FROM (
           SELECT kind, name, uid FROM reg
           UNION ALL SELECT 'tagv', 'fsck_dup_a', 900001
           UNION ALL SELECT 'tagv', 'fsck_dup_b', 900001)),
         r AS (SELECT DISTINCT * FROM (
           SELECT kind, uid,
             CASE WHEN kind = 'tagk' AND uid = 1 THEN 'wrongname'
               ELSE name END AS name
           FROM reg WHERE uid % 7 <> 3
           UNION ALL SELECT 'metric', 900100, 'ghost')),
         dupF AS (SELECT kind, 'duplicate_forward' AS fault,
             name, min(uid) AS uid
           FROM f GROUP BY kind, name HAVING count(DISTINCT uid) > 1),
         dupR AS (SELECT kind, 'duplicate_reverse' AS fault,
             min(name) AS name, uid
           FROM r GROUP BY kind, uid HAVING count(DISTINCT name) > 1),
         coll AS (SELECT kind, 'uid_collision' AS fault,
             'fsck.' || string_agg(name, '.' ORDER BY name) AS name, uid
           FROM f GROUP BY kind, uid HAVING count(DISTINCT name) > 1),
         missR AS (SELECT f.kind, 'missing_reverse' AS fault, f.name, f.uid
           FROM f WHERE NOT EXISTS (SELECT 1 FROM r
             WHERE r.kind = f.kind AND r.uid = f.uid)),
         misR AS (SELECT f.kind, 'mismatched_reverse' AS fault, f.name, f.uid
           FROM f JOIN r ON r.kind = f.kind AND r.uid = f.uid
           WHERE f.name <> r.name),
         missF AS (SELECT r.kind, 'missing_forward' AS fault, r.name, r.uid
           FROM r WHERE NOT EXISTS (SELECT 1 FROM f
             WHERE f.kind = r.kind AND f.name = r.name)),
         misF AS (SELECT r.kind, 'mismatched_forward' AS fault, r.name, r.uid
           FROM r JOIN f ON f.kind = r.kind AND f.name = r.name
           WHERE r.uid <> f.uid)
         SELECT kind, fault, name, uid FROM (
           SELECT * FROM dupF UNION ALL SELECT * FROM dupR
           UNION ALL SELECT * FROM coll UNION ALL SELECT * FROM missR
           UNION ALL SELECT * FROM misR UNION ALL SELECT * FROM missF
           UNION ALL SELECT * FROM misF)
         ORDER BY kind, fault, uid, name""",

    "q94_uid_grep" ->
      s"""$O, names AS (
           SELECT DISTINCT 'metric' AS kind, metric AS name FROM points
           UNION
           SELECT DISTINCT 'tagk', k FROM points
             CROSS JOIN (VALUES ('user'), ('k')) t(k)
           UNION
           SELECT DISTINCT 'tagv', tag_user FROM points WHERE tag_user IS NOT NULL
           UNION
           SELECT DISTINCT 'tagv', tag_k FROM points WHERE tag_k IS NOT NULL),
         reg AS (SELECT kind, name,
           CAST(dense_rank() OVER (PARTITION BY kind ORDER BY name) AS BIGINT) AS uid
           FROM names)
         SELECT kind, name, uid FROM reg
         WHERE kind = 'tagv'
           AND regexp_matches(name, '(?i)^[A-Z]?[0-9]*[13579]$$')
         ORDER BY kind, uid""",

    "q92_rpc_modes" ->
      """WITH modes(mode, rd, wr) AS (VALUES
           ('ro', true, false), ('rw', true, true), ('wo', false, true)),
         common(transport, command) AS (VALUES
           ('telnet','stats'),('telnet','dropcaches'),('telnet','version'),
           ('telnet','status'),('telnet','exit'),('telnet','help'),
           ('telnet','diediedie'),
           ('http','aggregators'),('http','logs'),('http','stats'),
           ('http','version'),('http','diediedie'),
           ('http','api/aggregators'),('http','api/config'),
           ('http','api/dropcaches'),('http','api/stats'),
           ('http','api/version'),('http','api/status'),('http','api/uid'),
           ('http','plugin/myplugin/subpath')),
         rdonly(transport, command) AS (VALUES
           ('http',''),('http','s'),('http','favicon.ico'),
           ('http','suggest'),('http','q'),
           ('http','api/query'),('http','api/search'),('http','api/suggest')),
         wronly(transport, command) AS (VALUES
           ('telnet','put'),('telnet','rollup'),('telnet','histogram'),
           ('http','api/annotation'),('http','api/annotations'),
           ('http','api/put'),('http','api/rollup'),('http','api/histogram'),
           ('http','api/tree'))
         SELECT mode, transport, command FROM modes CROSS JOIN common
         UNION ALL SELECT mode, transport, command FROM modes JOIN rdonly ON rd
         UNION ALL SELECT mode, transport, command FROM modes JOIN wronly ON wr
         ORDER BY mode, transport, command""",

    "q90_rollup_lines" ->
      s"""$O, h AS (
           SELECT metric, ts - ts % $HOUR AS ts, tag_user, sum(value) AS v
           FROM points WHERE metric = 'view' GROUP BY 1, 2, 3)
         SELECT metric, '1h' AS interval, 'sum' AS aggregator,
           'sum' AS spatial_agg, count(*) AS n,
           (sign(sum(v)) * floor(abs(sum(v)) * 10000 + 0.5) / 10000) AS sum_v
         FROM h GROUP BY metric ORDER BY metric""",

    "q69_rollup_json" ->
      s"""$O, h AS (
           SELECT metric, ts - ts % $HOUR AS ts, tag_user, sum(value) AS v
           FROM points WHERE metric = 'click' GROUP BY 1, 2, 3)
         SELECT metric, '1h' AS interval, 'sum' AS aggregator,
           count(*) AS n, (sign(sum(v)) * floor(abs(sum(v)) * 10000 + 0.5) / 10000) AS sum_v
         FROM h GROUP BY metric ORDER BY metric""",

    "q70_histogram_json" ->
      s"""$O SELECT metric, floor(value / 10) * 10 AS bucket_lo,
           floor(value / 10) * 10 + 10 AS bucket_hi, count(*) AS n
         FROM points WHERE metric = 'purchase'
         GROUP BY metric, floor(value / 10) * 10
         ORDER BY metric, bucket_lo""",

    "q71_compact" ->
      s"""$O SELECT metric, tag_user, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v,
           min(ts) AS first_ts, max(ts) AS last_ts,
           TRUE AS compacted
         FROM points WHERE metric = 'view' AND tag_k IS NOT NULL
         GROUP BY metric, tag_user ORDER BY metric, tag_user""",

    // NULL-safe: a series without the filtered tag is NOT matched
    // (it survives), so the tag predicate coalesces to FALSE
    "q72_query_delete" ->
      s"""$O SELECT metric, tag_user, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v,
           min(ts) AS first_ts, max(ts) AS last_ts
         FROM points
         WHERE NOT (metric = 'click'
           AND coalesce(tag_user IN ('1','2','3'), FALSE)
           AND ts >= $T_0105 AND ts <= ${T_0120 - 1})
         GROUP BY metric, tag_user ORDER BY metric, tag_user""",

    "q73_fsck_repair" ->
      s"""$O, slice AS (
           SELECT * FROM points WHERE metric = 'click' AND tag_user = '1'),
         dirty AS (
           SELECT * FROM points
           UNION ALL SELECT metric, ts, value + 1.0, tag_user, tag_k
             FROM slice
           UNION ALL SELECT metric, ts, 'NaN'::DOUBLE, tag_user, tag_k
             FROM slice
           UNION ALL SELECT metric, ts + 315360000000, value, tag_user,
             tag_k FROM slice
           UNION ALL SELECT metric || ' %', ts, value, tag_user, tag_k
             FROM slice),
         clean AS (
           SELECT * FROM dirty
           WHERE value IS NOT NULL AND NOT isnan(value)
             AND NOT isinf(value) AND ts <= 1767225600000
             AND regexp_matches(metric, '^[a-zA-Z0-9\\-_./\\p{L}]+$$')),
         resolved AS (
           SELECT metric, tag_user, tag_k, ts, max(value) AS value
           FROM clean GROUP BY metric, tag_user, tag_k, ts)
         SELECT metric, tag_user, count(*) AS n,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v
         FROM resolved GROUP BY metric, tag_user
         ORDER BY metric, tag_user"""
  )
}
