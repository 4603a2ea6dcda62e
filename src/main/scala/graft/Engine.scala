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
   * Strict metric resolution — the reference rejects a query naming a
   * metric that was never written (TsdbQuery.setTimeSeries UID lookup
   * → NoSuchUniqueName → HTTP 400), while tag VALUES resolve leniently
   * (unknown literals just match nothing). Default OFF as a deliberate
   * scale choice: the relational engine's empty result is free, where
   * the existence probe costs one (partition-pruned, LIMIT 1) scan job
   * per sub-query — a serving layer wanting the reference's 400 per
   * typo'd metric flips this on.
   */
  @volatile var strictMetrics: Boolean = false

  private def requireMetric(points: DataFrame, metric: String): Unit =
    if (strictMetrics &&
        points.filter(col("metric") === metric).limit(1).isEmpty)
      throw new NoSuchElementException(s"No such name for 'metrics': '$metric'")

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
   *
   * @param rowClip reproduce the reference's storage-row output clip:
   *   SpanGroup bounds results by the SCAN times, which align down/up
   *   to the 1h storage row (Const.MAX_TIMESPAN) when not downsampling
   *   (TsdbQuery.getScanStartTimeSeconds/getScanEndTimeSeconds +
   *   SpanGroup ctor doc; pinned by the TestTsdbQueryQueries
   *   runEndTime golden, which expects trailing points past the query
   *   end to the hour boundary). Default OFF: exact `[start, end]` —
   *   the row-granular spill is an HBase layout artifact, not query
   *   semantics, and the oracle contract clips exactly.
   */
  def run(points: DataFrame, query: TsQuery, sub: SubQuery,
          rollups: Seq[RollupTable] = Seq.empty,
          emitTypeFlag: Boolean = false,
          rowClip: Boolean = false): DataFrame = {
    graft.meta.Introspect.incr("query.sub_queries")
    if (sub.tsuids.isEmpty) requireMetric(points, sub.metric)
    // pre-pad the scan so edge buckets AND the first rate delta / lerp
    // neighbor exist (reference getScanStartTimeSeconds pads for rate
    // too, not just downsample)
    val needsNeighbors = sub.rate.isDefined ||
      Interpolate.policyOf(sub.aggregator) == Interpolate.Lerp
    val padMs = math.max(
      sub.downsample.map(d => math.max(d.intervalMs, 1L)).getOrElse(0L),
      if (needsNeighbors) RATE_LERP_PAD_MS else 0L)
    // rowClip (no downsample): results bound by the enclosing 1h
    // storage rows like the reference scan times — see the `run` doc
    val (clipLo, clipHi) =
      if (rowClip && sub.downsample.isEmpty) {
        // the HBase stop row is EXCLUSIVE, so the next-hour boundary
        // itself is NOT returned (runEndTime: 119 dps, the dp exactly
        // at the boundary absent) — hence the -1
        val loSec = (query.startMs / 1000L) / 3600L * 3600L
        val endSec = query.endMs / 1000L
        (loSec * 1000L, (endSec + (3600L - endSec % 3600L)) * 1000L - 1L)
      } else (query.startMs, query.endMs)
    // shared scan shape for raw points AND rollup rows: metric + padded
    // time range (pushdown-friendly) then tag filters. Explicit-series
    // addressing (reference TSSubQuery.tsuids) replaces the
    // metric+filter resolution with a series-id membership test —
    // tsuid = hex of the 64-bit series hash (Points.seriesId).
    val timeF = col("ts") >= (clipLo - padMs) &&
      col("ts") <= (clipHi + padMs)
    def scanned(df: DataFrame): DataFrame =
      if (sub.tsuids.nonEmpty)
        Points.withSeriesId(df.filter(timeF))
          .filter(hex(col("series_id"))
            .isin(sub.tsuids.map(_.toUpperCase): _*))
      else TagFilters(df.filter(col("metric") === sub.metric && timeF),
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
                Some((query.startMs, query.endMs)), query.timezone))
          case None =>
            Downsample(withSeries, spec,
              Some((query.startMs, query.endMs)), query.timezone)
        }
      case None => withSeries
    }
    val rated = sub.rate match {
      case Some(opts) => Rate(downsampled, opts)
      case None => downsampled
    }
    val groupKeys = TagFilters.groupByKeys(sub.filters)
    val agged = Interpolate.aggregate(rated, sub.aggregator, groupKeys,
      isRate = sub.rate.isDefined, emitTypeFlag = emitTypeFlag)
    // clip padded scan back to the query range (reference
    // AggregationIterator bounds, src/core/AggregationIterator.java:218-280);
    // under rowClip (no downsample) the bounds widen to the enclosing
    // 1h storage rows like the reference scan times — the end always
    // advances to the NEXT hour even when aligned
    // (getScanEndTimeSeconds: "even if it's already aligned")
    agged.filter(col("ts") >= clipLo && col("ts") <= clipHi)
  }

  /** Parse-and-run an `m=`-style sub-query string. */
  def runM(points: DataFrame, query: TsQuery, m: String): DataFrame =
    run(points, query, QueryParser.parseSubQuery(m))

  // ---- normalized-query result cache ---------------------------------
  //
  // The reference caches rendered query results keyed by a hash of the
  // normalized query, with a max-age derived from whether the query
  // touches "now" (GraphHandler.serveCachedIfPossible / computeMaxAge,
  // src/tsd/GraphHandler.java:445-520): a fully-past range is stable
  // and caches long; a range ending at the wall clock goes stale as new
  // points arrive. Spark analog: cache the persisted RESULT DataFrame
  // keyed by (semantic hash of the points plan, normalized query) so a
  // dashboard poll re-serves the materialized result instead of
  // re-scanning — on a 100 TB table that is the difference between a
  // storage-layer hit and zero I/O.

  /** Max distinct normalized queries kept in the result cache. A
    * long-lived service answering many DISTINCT queries must not
    * accumulate persisted DataFrames without bound, so the cache is an
    * access-ordered LRU: on overflow the least-recently-served entry is
    * unpersisted and dropped (counted as `query.cache_evictions`). */
  @volatile var resultCacheMaxEntries: Int = 128

  private val resultCache =
    new java.util.LinkedHashMap[(Int, String), (Long, DataFrame)](16, 0.75f,
      /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String), (Long, DataFrame)]): Boolean =
        if (size > resultCacheMaxEntries) {
          scala.util.Try(e.getValue._2.unpersist(false))
          graft.meta.Introspect.incr("query.cache_evictions")
          true
        } else false
    }

  /** Max-age for queries whose range is comfortably in the past. */
  val CACHE_PAST_MS = 86400000L
  /** Max-age for queries whose range touches the wall clock. */
  val CACHE_FRESH_MS = 60000L

  /** `run` through the result cache. Expiry follows the reference's
    * computeMaxAge split: end-in-the-past → CACHE_PAST_MS, end near
    * `now` → CACHE_FRESH_MS. Cached results are persisted (spill, not
    * recompute); replacing an expired entry unpersists the old one. */
  def runCached(points: DataFrame, query: TsQuery, sub: SubQuery,
                rollups: Seq[RollupTable] = Seq.empty,
                now: Long = System.currentTimeMillis()): DataFrame = {
    val key = (points.queryExecution.analyzed.semanticHash(),
      s"$query|$sub|${rollups.map(r => (r.intervalMs, r.horizonMs))}")
    resultCache.synchronized(Option(resultCache.get(key))) match {
      case Some((expires, df)) if now < expires =>
        graft.meta.Introspect.incr("query.cache_hits")
        df
      case stale =>
        stale.foreach(s => scala.util.Try(s._2.unpersist()))
        graft.meta.Introspect.incr("query.cache_misses")
        val df = run(points, query, sub, rollups)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val maxAge =
          if (query.endMs < now - 3600000L) CACHE_PAST_MS else CACHE_FRESH_MS
        resultCache.synchronized {
          val prev = resultCache.put(key, (now + maxAge, df))
          // A concurrent miss on the same key may have raced us here;
          // release whichever persisted result we just displaced.
          if (prev != null && (prev._2 ne df) &&
              !stale.exists(_._2 eq prev._2))
            scala.util.Try(prev._2.unpersist(false))
        }
        df
    }
  }

  /** Drop every cached result (test hook / storage reclaim). */
  def clearResultCache(): Unit = resultCache.synchronized {
    resultCache.values.forEach(v => scala.util.Try(v._2.unpersist()))
    resultCache.clear()
  }

  /** Parse-and-run a POST /api/query JSON body: one result DataFrame
    * per sub-query, routed through percentile extraction when the
    * sub-query sets `percentiles` (reference TSSubQuery.percentiles,
    * src/core/TSSubQuery.java:94-95).
    *
    * When [[trackServes]] is on, this is the reference's
    * QueryRpc.handleQuery flow: a QueryStats registers BEFORE parsing
    * (QueryRpc.java:127-137), parse errors record the 400 mapping, and
    * each sub-query frame carries observe-based emittedDPs tracking
    * that completes the stats entry when the caller consumes the last
    * frame — one execution, no pre-count. */
  def runJson(points: DataFrame, body: String,
              now: Long = System.currentTimeMillis(),
              rollups: Seq[RollupTable] = Seq.empty,
              remote: String = "0.0.0.0:0",
              headers: Map[String, String] = Map.empty): Seq[DataFrame] = {
    def build(): Seq[DataFrame] = {
      val q = JsonQuery.parse(body, now)
      q.queries.map { sub =>
        if (sub.percentiles.nonEmpty) runPercentiles(points, q, sub)
        else run(points, q, sub, rollups)
      }
    }
    if (!trackServes) build()
    else {
      val st = new graft.query.QueryStatsLog.QueryStats(
        remote, body, headers)
      try attachTracking(st, build())
      catch {
        case e: IllegalArgumentException =>
          st.markSerialized(400, "Bad Request", e)
          st.markSendFailed()
          recordServeLatency(st)
          throw e
        case e: Throwable =>
          st.markSerialized(500, "Internal Server Error", e)
          st.markSendFailed()
          recordServeLatency(st)
          throw e
      }
    }
  }

  /**
   * Parse-and-run a POST `/api/query/exp` JSON body end-to-end — the
   * reference's V2 expression endpoint (src/tsd/QueryExecutor.java:85):
   * the POJO body compiles to per-metric sub-queries (shared timespan
   * downsampler/rate, per-metric aggregator overrides), each runs
   * through the normal engine pipeline, and the expressions evaluate
   * over the named results via [[graft.query.ExpQuery.evalWithFills]]
   * (UNION → full-outer + per-variable fills, INTERSECTION → inner).
   * Nested expressions see earlier expression results as variables.
   *
   * Join keys are the tag columns common to an expression's variables —
   * the grouped tags both sides actually carry, which is the tag set
   * the reference's iterators match series on.
   *
   * Returns the requested outputs in order as (name, result) pairs:
   * the `outputs` list when present (alias naming the emitted metric),
   * else every expression in declaration order (QueryExecutor's
   * documented default).
   */
  def runExpJson(points: DataFrame, body: String,
                 now: Long = System.currentTimeMillis(),
                 rollups: Seq[RollupTable] = Seq.empty)
      : Seq[(String, DataFrame)] = {
    val run = runExpJsonMeta(points, body, now, rollups)
    // DataFrame-returning callers can't signal when they're done with
    // the run's cached frames, so ownership moves to the bounded ring:
    // the existing LRU discipline (runCached's) applied to exp runs.
    expCacheRing.synchronized {
      expCacheRing.put(expRunSeq.incrementAndGet(), run.handle)
    }
    run.outputs.map(o => o.id -> o.df)
  }

  /** One emitted `/api/query/exp` output: the result frame carries the
    * oracle-facing projection (tag_K/ts/value/metric) AND the
    * serializer-facing per-series meta columns `__skey` (flattened
    * series identity — V2 dps columns are keyed on it, one column per
    * joined series even when the projected tags collide), `__mtags`
    * (the series' commonTags map) and `__aggtags` (aggregated tag
    * keys). `isMetric` routes the V2 serializer to the
    * SerializeSubIterator dpsMeta shape. */
  private[graft] case class ExpOutput(id: String, alias: Option[String],
                                      df: DataFrame, isMetric: Boolean)

  /** Ownership handle over one exp run's cached frames: the persisted
    * metric variables and the locally-checkpointed nested-expression
    * frames. `release()` is idempotent; after it fires the run's
    * RETURNED frames must not be recomputed (a checkpoint's blocks are
    * its only lineage). */
  final class ExpCacheHandle private[graft] (persisted: Seq[DataFrame],
                                             checkpointed: Seq[DataFrame]) {
    private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    def release(): Unit = if (released.compareAndSet(false, true)) {
      persisted.foreach(df => scala.util.Try(df.unpersist(false)))
      // Dataset.unpersist is a no-op for checkpoint frames (they are
      // RDD-persisted, not CacheManager-registered) — drop the blocks
      // at the RDD the LogicalRDD wraps
      checkpointed.foreach { df =>
        df.queryExecution.analyzed match {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            scala.util.Try(l.rdd.unpersist(false))
          case _ => ()
        }
      }
    }
  }

  private[graft] case class ExpRun(outputs: Seq[ExpOutput],
                                   handle: ExpCacheHandle)

  /** Bound on live exp runs for DataFrame-returning callers
    * ([[runExpJson]]). [[serializeExpV2]] owns its materialization and
    * releases eagerly; raw callers are bounded by this access-ordered
    * ring — eviction releases the evicted run's persists AND
    * checkpoints, so a frame held across `expCacheMaxEntries`
    * subsequent distinct exp queries is invalidated (the same
    * ownership contract as runCached's eviction). */
  @volatile var expCacheMaxEntries: Int = 32
  private val expCacheRing =
    new java.util.LinkedHashMap[Long, ExpCacheHandle](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, ExpCacheHandle]): Boolean =
        if (size > expCacheMaxEntries) {
          e.getValue.release()
          graft.meta.Introspect.incr("query.exp_cache_evictions")
          true
        } else false
    }
  private val expRunSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Drop every live exp run's cached frames (test hook). */
  def clearExpCache(): Unit = expCacheRing.synchronized {
    expCacheRing.values.forEach(_.release())
    expCacheRing.clear()
  }

  /** Data-point budget for each exp output — the [[withMaxDataPoints]]
    * guard applied to the series × grid result BEFORE any driver-side
    * collect (the V2 serializer's collect is the reference's
    * DataPoints-in-RAM contract; the guard keeps an oversized exp
    * query from reaching it, reference tsd.query.limits). */
  @volatile var expMaxDataPoints: Long = Long.MaxValue

  private[graft] def runExpJsonMeta(points: DataFrame, body: String,
                                    now: Long = System.currentTimeMillis(),
                                    rollups: Seq[RollupTable] = Seq.empty)
      : ExpRun = {
    import graft.operators.ExpressionJoin
    val q = ExpJsonQuery.parse(body, now)
    val tsq = q.tsQuery
    val fills = q.metricFills
    // ONE combined storage scan feeding every variable (guide §2.4/§6):
    // every variable's pipeline starts from the same points table with
    // a (metric, padded time window, tag) filter, and each
    // differently-pruned subtree used to re-derive its own parquet
    // scan — 32 Scan nodes on q56's plan, an O(#variables) scan
    // asymptote. The persisted base is the union of every variable's
    // padded scan window over the union of the variables' metrics;
    // each pipeline re-applies its exact metric + window + tag filters
    // on top (a strict subset), so results are unchanged while storage
    // is read once. The pad is conservative (max downsample interval,
    // plus the rate/lerp neighbor pad unconditionally) — wider never
    // changes results, the per-variable filter narrows exactly.
    // strictMetrics keeps the old direct path: its 400-on-unknown
    // existence probe is defined over the WHOLE table, not the window.
    val combinedBase: Option[DataFrame] =
      if (strictMetrics) None
      else {
        val windows = q.metrics.map { m =>
          val sub = q.subQuery(m)
          val pad = math.max(
            sub.downsample.map(d => math.max(d.intervalMs, 1L)).getOrElse(0L),
            RATE_LERP_PAD_MS)
          val off = m.timeOffsetMs.getOrElse(0L)
          (tsq.startMs - off - pad, tsq.endMs - off + pad)
        }
        val names = q.metrics.map(_.metric).distinct
        Some(points.filter(col("metric").isin(names: _*) &&
            col("ts") >= windows.map(_._1).min &&
            col("ts") <= windows.map(_._2).max)
          .persist())
      }
    val basePts = combinedBase.getOrElse(points)
    // per-variable result sets carrying the SpanGroup identity the
    // series matching consumes; tsFill is the per-metric fill policy
    // (reference TimeSyncedIterator default ZERO,
    // TimeSyncedIterator.java:74, overridden by Metric.fillPolicy —
    // the same value ExpressionIterator substitutes for NaN at eval,
    // ExpressionIterator.java:336)
    var vars: Map[String, ExpressionJoin.VarSet] = q.metrics.map { m =>
      val sub = q.subQuery(m)
      // time-over-time: the offset metric scans a window shifted into
      // the past and its buckets shift forward onto today's clock, so
      // the expression join aligns current against historical values
      val r = m.timeOffsetMs match {
        case Some(off) =>
          runForExpression(basePts, tsq.copy(startMs = tsq.startMs - off,
              endMs = tsq.endMs - off), sub, rollups)
            .withColumn("ts", col("ts") + off)
        case None => runForExpression(basePts, tsq, sub, rollups)
      }
      // cache each variable: the expression join reads a variable
      // from several differently-pruned subtrees, so exchange reuse
      // never fires — without the cache the whole scan→aggregate
      // pipeline re-ran per read (measured 110 exchanges / 0 reused
      // on q56, 2.6× slower). persist (columnar, prunable) beats a
      // checkpoint here: InMemoryTableScan still prunes columns per
      // subtree where a LogicalRDD scans full rows (measured 2×).
      // This is the reference's own memory model: QueryExecutor
      // materializes every sub-query's DataPoints[] in RAM before
      // expressions run; what is held is the POST-aggregation series
      // data (series × buckets), not raw points.
      m.id -> ExpressionJoin.VarSet(m.id, r.persist(),
        queryTagKs = sub.filters.map(_.tagk).toSet,
        tsFill = fills.getOrElse(m.id, 0.0))
    }.toMap
    // the group keys each variable was grouped on — the output tag
    // columns of an expression are the keys its variables share
    var groupKeys: Map[String, Set[String]] = q.metrics.map { m =>
      m.id -> TagFilters.groupByKeys(q.subQuery(m).filters).toSet
    }.toMap
    // DAG-order the expressions (reference QueryExecutor.java:292-360
    // builds a DirectedAcyclicGraph and compiles dependencies first):
    // forward references between expressions are legal; a self
    // reference or a cycle is the reference's 400, message for message
    val exprIds = q.expressions.map(_.id).toSet
    val deps: Map[String, Seq[String]] = q.expressions.map { e =>
      val names = ExpQuery.variables(ExpQuery.parse(e.expr))
      if (names.contains(e.id))
        throw new IllegalArgumentException(
          "Self referencing expression found: " + e.id)
      e.id -> names.filter(exprIds.contains)
    }.toMap
    val ordered = {
      val done = scala.collection.mutable.LinkedHashSet[String]()
      val visiting = scala.collection.mutable.Set[String]()
      def visit(id: String): Unit = {
        if (!done.contains(id)) {
          if (!visiting.add(id))
            throw new IllegalArgumentException(
              "Circular reference found: " + id)
          deps(id).foreach(visit)
          visiting.remove(id)
          done += id
        }
      }
      q.expressions.foreach(e => visit(e.id))
      done.toSeq.map(id => q.expressions.find(_.id == id).get)
    }
    val referenced: Set[String] = deps.values.flatten.toSet
    var outputs: Map[String, DataFrame] = Map.empty
    ordered.foreach { e =>
      val names = ExpQuery.variables(ExpQuery.parse(e.expr))
      require(names.nonEmpty,
        s"expression '${e.id}' references no metric or expression ids " +
          s"(constant expressions are not supported): ${e.expr}")
      // reference ExpressionIterator.compile:257
      val sets = names.map(n => vars.getOrElse(n,
        throw new IllegalArgumentException(
          "Missing results for variable " + n)))
      // the reference's series matching (QueryExecutor.java:200-213):
      // UNION or INTERSECTION on the flattened identity, honoring the
      // join's useQueryTags / includeAggTags flags
      val joined =
        if (e.join.operator == "intersection")
          ExpressionJoin.intersection(e.id, sets,
            e.join.useQueryTags, e.join.includeAggTags)
        else ExpressionJoin.union(e.id, sets,
          e.join.useQueryTags, e.join.includeAggTags)
      val value = ExpQuery.bindColumns(e.expr, n => col(s"__v_$n"))
      val keys = names.map(groupKeys(_)).reduce(_ intersect _)
      val result = joined.withColumn("value", value)
      outputs += e.id -> result
        .select(keys.toSeq.sorted.map(k =>
          col("tags").getItem(k).as(s"tag_$k")) ++
          Seq(col("ts"), col("value"),
            col("__skey"), col("__mtags"), col("__aggtags")): _*)
      groupKeys += e.id -> keys
      // an expression OTHER expressions reference becomes a variable:
      // identity = the joined series' MERGED meta — variable one's
      // tags (or the empty fill_dp tags when it misses the series) and
      // the union of agg tag keys, the exact EDP meta the reference
      // feeds back through ExpressionIterator.compile
      // (ExpressionIterator.java:280-297 + ExpressionDataPoint.add).
      // CHECKPOINTED, not persisted: a checkpoint truncates
      // lineage, so nesting depth cannot grow the downstream plan —
      // without it each level re-embeds the whole upstream join plan
      // (exponential growth; e4 = e2 + e3 over e OOMed plan
      // stringification). Built ONLY for referenced expressions:
      // localCheckpoint forces physical planning of the whole join at
      // build time (~1 s of driver CPU on q56's plan), a dead cost
      // for a leaf expression.
      if (referenced.contains(e.id))
        vars += e.id -> ExpressionJoin.VarSet(e.id,
          result.select(col("__mtags").as("tags"),
            col("__aggtags").as("agg_tags"),
            col("ts"), col("value")).localCheckpoint(false),
          queryTagKs = sets.flatMap(_.queryTagKs).toSet,
          tsFill = e.fillPolicy.map(_.fill).getOrElse(0.0))
    }
    // no outputs -> default to the expressions if any, else the
    // METRICS (reference QueryExecutor.serialize:499-517 — a
    // metrics-only body is legal, TestQuery.justMetrics, and emits
    // each metric's own per-series result set)
    val emit =
      if (q.outputs.nonEmpty) q.outputs
      else if (q.expressions.nonEmpty)
        q.expressions.map(e => ExpJsonQuery.OutputDef(e.id, None))
      else q.metrics.map(m => ExpJsonQuery.OutputDef(m.id, None))
    val metricIds = q.metrics.map(_.id).toSet
    val outs = emit.map { o =>
      // an output may name a METRIC id, not just an expression: the
      // reference emits the metric's own per-series result set
      // (TestQueryExecutor.oneExpressionOutputAndBAlso)
      val isMetric = !outputs.contains(o.id) && metricIds.contains(o.id)
      val df = outputs.getOrElse(o.id, {
        val v = vars.getOrElse(o.id, throw new IllegalArgumentException(
          s"Unknown output id: ${o.id}"))
        v.df.select(groupKeys(o.id).toSeq.sorted.map(k =>
          col("tags").getItem(k).as(s"tag_$k")) ++
          Seq(col("ts"), col("value"),
            ExpressionJoin.seriesKey(col("tags")).as("__skey"),
            col("tags").as("__mtags"),
            coalesce(col("agg_tags"), array().cast("array<string>"))
              .as("__aggtags")): _*)
      })
      val guarded =
        if (expMaxDataPoints == Long.MaxValue) df
        else withMaxDataPoints(df, expMaxDataPoints)
      ExpOutput(o.id, o.alias,
        guarded.withColumn("metric", lit(o.alias.getOrElse(o.id))), isMetric)
    }
    val checkpointed = q.expressions.flatMap(e =>
      if (referenced.contains(e.id)) vars.get(e.id).map(_.df) else None)
    ExpRun(outs, new ExpCacheHandle(
      combinedBase.toSeq ++ q.metrics.flatMap(m => vars.get(m.id).map(_.df)),
      checkpointed))
  }

  /**
   * The `/api/query/exp` response DOCUMENT — the reference's V2 shape
   * (QueryExecutor.serialize, src/tsd/QueryExecutor.java:480-946):
   * `{"outputs":[{id, alias?, dps:[[ts, v_series...]], dpsMeta:
   * {firstTimestamp, lastTimestamp, setCount, series}, meta:[{index:0,
   * metrics:["timestamp"]}, {index:i+1, metrics:[sorted names],
   * commonTags, aggregatedTags}...]}], "query": <echo>}`.
   *
   * Per-series shape follows the reference exactly: the dps columns
   * are keyed on the flattened series identity (`__skey`) — one column
   * per joined series even when the projected tag columns collide —
   * ordered by key like the reference's sorted ByteMap; `commonTags`
   * is each series' merged EDP tag map (variable one's tags, or empty
   * when variable one missed the series — the fill_dp copy quirk) and
   * `aggregatedTags` the merged aggregated tag keys
   * (QueryExecutor.java:848-880 collects them, :926-930 writes them).
   *
   * dpsMeta quirks reproduced per output kind: an EXPRESSION output's
   * lastTimestamp stays 0 until a SECOND row is written (first/last
   * split, :698-704) while a METRIC output writes lastTimestamp on
   * EVERY row including the first (SerializeSubIterator, :786-800);
   * an empty output has dpsMeta zeros and NO meta array (:725-732);
   * the metrics list is the sorted metric names feeding the output
   * (transitively for nested expressions; MetricsCB sorts, :866-869).
   *
   * Driver-side assembly by design: the response document is the
   * serving tier's unit of work, and the collected rows are the
   * already-aggregated expression results (series × grid), the same
   * data the reference holds in RAM to serialize — bounded by the
   * [[expMaxDataPoints]] guard before the collect. This method owns
   * the run's materialization, so it releases the exp cache handle on
   * exit (the persist-lifecycle bound).
   */
  def serializeExpV2(points: DataFrame, body: String,
                     now: Long = System.currentTimeMillis(),
                     rollups: Seq[RollupTable] = Seq.empty): String = {
    val q = ExpJsonQuery.parse(body, now)
    val run = runExpJsonMeta(points, body, now, rollups)
    try {
      val metricName = q.metrics.map(m => m.id -> m.metric).toMap
      val exprVars = q.expressions.map(e =>
        e.id -> ExpQuery.variables(ExpQuery.parse(e.expr))).toMap
      def metricsOf(id: String, seen: Set[String]): Seq[String] =
        if (seen(id)) Seq.empty
        else metricName.get(id).map(Seq(_)).getOrElse(
          exprVars.getOrElse(id, Seq.empty)
            .flatMap(v => metricsOf(v, seen + id)))
      val fills = q.metricFills
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      val outs = root.putArray("outputs")
      run.outputs.foreach { case ExpOutput(id, alias, df, isMetric) =>
        val rows = df.collect()
        // one dps column per JOINED series (__skey), ordered by the
        // flattened key — the reference's sorted ByteMap order
        val seriesKeys = rows.map(_.getAs[String]("__skey")).distinct.sorted
        val idx = seriesKeys.zipWithIndex.toMap
        val grid = rows.map(_.getAs[Long]("ts")).distinct.sorted
        val cells = rows.map(r =>
          (r.getAs[Long]("ts"), idx(r.getAs[String]("__skey")))
            -> r.getAs[Double]("value")).toMap
        // per-series meta off any row of the series
        val metaOf = rows.map(r => r.getAs[String]("__skey") ->
          (r.getAs[Map[String, String]]("__mtags"),
            r.getAs[scala.collection.Seq[String]]("__aggtags"))).toMap
        val o = outs.addObject()
        o.put("id", id)
        alias.foreach(o.put("alias", _))
        val dpsArr = o.putArray("dps")
        var first = Long.MinValue
        var last = 0L
        var count = 0L
        val gapFill = fills.getOrElse(id, 0.0)
        grid.foreach { t =>
          val row = dpsArr.addArray()
          row.add(t)
          // expression outputs: first/last split (lastTimestamp stays 0
          // for a one-row result); metric outputs: last on EVERY row
          if (first == Long.MinValue) first = t else last = t
          if (isMetric) last = t
          count += 1
          seriesKeys.indices.foreach(i =>
            row.add(cells.getOrElse((t, i), gapFill)))
        }
        val dpsMeta = o.putObject("dpsMeta")
        dpsMeta.put("firstTimestamp", if (first == Long.MinValue) 0L else first)
        dpsMeta.put("lastTimestamp", last)
        dpsMeta.put("setCount", count)
        dpsMeta.put("series", seriesKeys.size)
        if (seriesKeys.nonEmpty) {
          val meta = o.putArray("meta")
          val t0 = meta.addObject()
          t0.put("index", 0)
          t0.putArray("metrics").add("timestamp")
          val ms = metricsOf(id, Set.empty).distinct.sorted
          seriesKeys.zipWithIndex.foreach { case (sk, i) =>
            val mo = meta.addObject()
            mo.put("index", i + 1)
            val ma = mo.putArray("metrics")
            ms.foreach(ma.add)
            val (mtags, aggtags) = metaOf(sk)
            val ct = mo.putObject("commonTags")
            mtags.toSeq.sortBy(_._1).foreach { case (k, v) => ct.put(k, v) }
            val at = mo.putArray("aggregatedTags")
            aggtags.foreach(at.add)
          }
        }
      }
      root.set[com.fasterxml.jackson.databind.JsonNode]("query",
        mapper.readTree(body))
      mapper.writeValueAsString(root)
    } finally run.handle.release()
  }

  /**
   * Whole-request serialization for the exp endpoint: run the POJO
   * body and emit one V1 JSON document per (output, tag group) — the
   * response shape of the reference's QueryExecutor serialization
   * (src/tsd/QueryExecutor.java:300-430: per-output metric name from
   * the alias, the joined tags, and the dps map).
   */
  def serializeExpJson(points: DataFrame, body: String,
                       now: Long = System.currentTimeMillis(),
                       rollups: Seq[RollupTable] = Seq.empty): DataFrame =
    runExpJson(points, body, now, rollups).map { case (_, df) =>
      val tagCols = df.columns.filter(_.startsWith("tag_")).toSeq
      df.groupBy(col("metric") +: tagCols.map(col): _*)
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("ts"), col("value"))))).as("dps"))
        .select(to_json(struct(
          col("metric"),
          map(tagCols.flatMap(k =>
            Seq(lit(k.stripPrefix("tag_")), col(k))): _*).as("tags"),
          col("dps"))).as("json"))
    }.reduce(_ unionByName _)

  /**
   * Whole-request serialization: parse a POST /api/query body, run
   * every sub-query (plain or percentiles[]), and emit one DataFrame of
   * V1 JSON documents — the complete reference response for the
   * request. Percentile groups serialize with the percentile suffixed
   * to the metric name (the reference emits them as separate result
   * groups) and empty aggregateTags.
   */
  def serializeJson(points: DataFrame, body: String,
                    now: Long = System.currentTimeMillis(),
                    rollups: Seq[RollupTable] = Seq.empty): DataFrame = {
    val q = JsonQuery.parse(body, now)
    q.queries.map { sub =>
      if (sub.percentiles.isEmpty) serializeV1(points, q, sub, rollups)
      else {
        val groupKeys = TagFilters.groupByKeys(sub.filters)
        val tagCols = groupKeys.map(k => col(s"tag_$k"))
        val outTs =
          if (q.msResolution) col("ts") else (col("ts") / 1000L).cast("long")
        runPercentiles(points, q, sub)
          .withColumn("metric",
            concat(col("metric"), lit("_p"), col("ptile").cast("string")))
          .groupBy(col("metric") +: tagCols: _*)
          .agg(map_from_entries(array_sort(collect_list(
            struct(outTs.as("ts"), col("value"))))).as("dps"))
          .select(to_json(struct(
            col("metric"),
            map(groupKeys.flatMap(k => Seq(lit(k), col(s"tag_$k"))): _*)
              .as("tags"),
            array().cast("array<string>").as("aggregateTags"),
            col("dps"))).as("json"))
      }
    }.reduce(_ unionByName _)
  }

  /**
   * Histogram-percentile query path (reference
   * test/core/TestTsdbQueryHistogramQueries.java; `percentiles[]` on a
   * sub-query): points bucketed per (group tags, downsample interval)
   * into fixed-width histograms, one output row set per requested
   * percentile with a `ptile` column. Percentiles are 0-100 as in the
   * reference API. `binWidth` configures the histogram codec (the
   * reference delegates codec choice to HistogramCodecManager; our
   * relational histogram model needs only a bin width).
   */
  def runPercentiles(points: DataFrame, query: TsQuery, sub: SubQuery,
                     binWidth: Double = 10.0): DataFrame = {
    require(sub.percentiles.nonEmpty, "no percentiles requested")
    val scanned = TagFilters(
      points.filter(col("metric") === sub.metric &&
        col("ts") >= query.startMs && col("ts") <= query.endMs),
      sub.filters, sub.explicitTags)
    val groupKeys = TagFilters.groupByKeys(sub.filters)
    val bucketMs = sub.downsample.map(_.intervalMs).filter(_ > 0)
      .getOrElse(3600000L)
    val tagCols = groupKeys.map(k => col("tags").getItem(k).as(s"tag_$k"))
    val base = scanned.select(
      (col("metric") +: tagCols) ++
        Seq((col("ts") - col("ts") % bucketMs).as("ts"), col("value")): _*)
    val gcols = ("metric" +: groupKeys.map(k => s"tag_$k")) :+ "ts"
    val hist = Histograms.fromPoints(base, gcols, "value", binWidth)
    // ONE pass for every requested percentile (Histograms.percentiles
    // doc) — the old per-p unionByName re-ran the scan+histogram per
    // percentile. __p (the exact fraction literal) maps back to the
    // API's 0-100 ptile by bit-equality, never by *100 arithmetic
    // (0.9 * 100 != 90.0 in binary).
    val ptileOf = sub.percentiles.foldLeft(lit(null).cast("double")) {
      (acc, p) => when(col("__p") === lit(p / 100.0), lit(p)).otherwise(acc)
    }
    Histograms.percentiles(hist, gcols, sub.percentiles.map(_ / 100.0))
      .withColumn("ptile", ptileOf).drop("__p")
  }

  /**
   * Percentile queries over STORED histograms — the reference's
   * histogram data points (src/core/HistogramDataPoint.java:56-67:
   * opaque codec-encoded blobs scanned like points and merged across
   * series and time). The blob table (metric, ts, tags, codec_id,
   * blob) goes through the same scan shape as raw points, buckets by
   * the downsample interval, decodes via the codec registry
   * ([[graft.operators.Histograms.registerCodec]]), merges bucket
   * counts relationally, and extracts each requested percentile.
   */
  def runPercentilesFromHistograms(hists: DataFrame, query: TsQuery,
                                   sub: SubQuery): DataFrame = {
    require(sub.percentiles.nonEmpty, "no percentiles requested")
    val groupKeys = TagFilters.groupByKeys(sub.filters)
    val gcols = (("metric" +: groupKeys.map(k => s"tag_$k")) :+
      "series_id") :+ "ts"
    // reference order of operations (runHistogram; proven by the
    // TestTsdbQueryHistogramQueries.runSingleTsMsTwoAggSum golden,
    // where two series' p98s SUM to 301*0.98): histogram dps merge
    // only WITHIN a series' downsample bucket (no downsample → each
    // dp stands alone at its own timestamp), the percentile is
    // extracted PER SERIES dp, and the extracted values then ride the
    // ordinary cross-series aggregation pipeline (lerp and friends)
    // under the sub-query's aggregator. Round 9: previously this path
    // merged histograms ACROSS series first and extracted one
    // percentile of the combined distribution — statistically nicer,
    // but not what the reference computes.
    val hist = histogramBuckets(hists, query, sub)
    if (sub.percentiles.size == 1 || sub.aggregator == "none" ||
        sub.aggregator == "raw" ||
        sub.percentiles.distinct.size != sub.percentiles.size) {
      // single percentile (nothing to share); the 'none'/'raw' bypasses
      // (their one-series assertion must see each ptile separately —
      // the rehashed series_id below would read as P series and abort);
      // or duplicate percentile requests (the shared __ptile tag would
      // merge the duplicates into one doubled aggregation — the old
      // unionByName emitted two independent, each-correct row sets)
      return sub.percentiles.map { p =>
        val perSeries = Histograms.percentile(hist, gcols, p / 100.0)
          .select(Seq(col("metric"), col("series_id"), col("ts"),
            col("value")) :+
            map(groupKeys.flatMap(k =>
              Seq(lit(k), col(s"tag_$k"))): _*).as("tags"): _*)
        Interpolate.aggregate(perSeries, sub.aggregator, groupKeys)
          .withColumn("ptile", lit(p))
      }.reduce(_ unionByName _)
    }
    // Multi-percentile single pass: extraction probes the cumulative
    // distribution once for every requested fraction
    // (Histograms.percentiles), and the percentile rides the
    // cross-series aggregation as a synthetic grouping tag — each
    // (group, __ptile) aggregation sees exactly the rows the per-p
    // branch saw, so values are unchanged while the scan+decode+merge
    // upstream runs ONCE instead of once per percentile (the old
    // unionByName form showed P full histogram subtrees in the plan).
    // series_id is re-hashed with the ptile so per-series interpolation
    // windows cannot collide across percentile groups.
    val ptileOf = sub.percentiles.foldLeft(lit(null).cast("double")) {
      (acc, p) => when(col("__p") === lit(p / 100.0), lit(p)).otherwise(acc)
    }
    val perSeries = Histograms
      .percentiles(hist, gcols, sub.percentiles.map(_ / 100.0))
      .withColumn("__ptile", ptileOf)
      .select(Seq(col("metric"),
        xxhash64(col("series_id"), col("__ptile")).as("series_id"),
        col("ts"), col("value")) :+
        map(groupKeys.flatMap(k => Seq(lit(k), col(s"tag_$k"))) ++
          Seq(lit("__ptile"), col("__ptile").cast("string")): _*)
          .as("tags"): _*)
    Interpolate.aggregate(perSeries, sub.aggregator,
        groupKeys :+ "__ptile")
      .withColumn("ptile", col("tag___ptile").cast("double"))
      .drop("tag___ptile")
  }

  /**
   * Scan + bucket + decode + merge for stored histograms — the
   * reference's HistogramDownsampler semantics
   * (src/core/HistogramDownsampler.java, pinned by
   * test/core/TestHistogramDownsampler.java): bucket counts SUM-merge
   * per series downsample bucket; calendar specs align through the
   * shared calendar bucketer (1hc in a +4:30 zone buckets on the half
   * hour — testDownsampler_calendarHour); run_all (`0all`) clips to
   * [start, end) and emits ONE merged histogram stamped at the query
   * start (testDownsampler_allFilterOnQuery: the dp at the end bound
   * is excluded and the output timestamp is the start bound).
   * Output: (metric, tag_*, series_id, ts, bucket_lo, bucket_hi,
   * count).
   */
  def histogramBuckets(hists: DataFrame, query: TsQuery,
                       sub: SubQuery): DataFrame = {
    val runAll = sub.downsample.exists(_.intervalMs == 0L)
    val hiBound =
      if (runAll) col("ts") < query.endMs else col("ts") <= query.endMs
    val scanned = TagFilters(
      hists.filter(col("metric") === sub.metric &&
        col("ts") >= query.startMs && hiBound),
      sub.filters, sub.explicitTags)
    val groupKeys = TagFilters.groupByKeys(sub.filters)
    val withSeries = graft.model.Points.withSeriesId(scanned)
    val bucketTs = sub.downsample match {
      case Some(spec) =>
        Downsample.bucket(col("ts"), spec, query.startMs, query.timezone)
      case None => col("ts")
    }
    val tagCols = groupKeys.map(k => col("tags").getItem(k).as(s"tag_$k"))
    val base = withSeries.select(
      (col("metric") +: tagCols) ++ Seq(col("series_id"),
        bucketTs.as("ts"), col("codec_id"), col("blob")): _*)
    val gcols = (("metric" +: groupKeys.map(k => s"tag_$k")) :+
      "series_id") :+ "ts"
    Histograms.decodeBlobs(base, gcols)
  }

  /**
   * Data-point budget guard (reference `tsd.query.limits.*`,
   * src/core/TsdbQuery.java:188-191, enforcement in
   * SaltScanner.processRow; per-client overrides
   * src/query/QueryLimitOverride.java:52): the query fails at execution
   * time when the result exceeds `max` rows. Lazy — a broadcast
   * single-row count plus assert_true in the plan — at the cost of one
   * extra pass over the (already aggregated, small) result.
   */
  /**
   * Scan-byte budget guard (reference `tsd.query.limits.bytes`,
   * src/core/TsdbQuery.java:188-191): rejects a query whose estimated
   * input size exceeds `maxBytes` BEFORE any job runs, using Catalyst's
   * optimized-plan statistics (parquet footer sizes after partition
   * pruning and column pruning). The reference aborts mid-scan after
   * the budget is spent; estimating from plan statistics is the
   * planner-native equivalent — overscan is rejected for free instead
   * of detected at cost.
   */
  def withMaxScanBytes(df: DataFrame, maxBytes: Long): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > maxBytes)
      throw new IllegalStateException(
        s"query would scan ~$est bytes, over the budget of $maxBytes")
    df
  }

  def withMaxDataPoints(df: DataFrame, max: Long): DataFrame = {
    val n = df.agg(count(lit(1)).as("__n"))
    df.crossJoin(broadcast(n))
      .where(assert_true(col("__n") <= max,
        concat(lit("query result exceeds the data-point budget of "),
          lit(max))).isNull)
      .drop("__n")
  }

  /**
   * DELETE /api/query — remove the points a query matches (reference
   * TSQuery.delete flag; QueryRpc delete path): returns the surviving
   * points table. Matching = the sub-query's series (metric + tag
   * filters) within the query time range. Expressed as a single left
   * join on the series hash, never a row-wise anti-join on the map
   * column (maps are not join keys). The matched set is NOT hinted
   * broadcast: it is `metric + filters`, so a wildcard delete on a
   * high-cardinality metric can match millions of series — forcing a
   * broadcast there is a driver-memory scale-killer. AQE picks
   * broadcast-vs-shuffle from the runtime stats of the distinct set
   * (small targeted deletes still broadcast; adversarial wildcards
   * degrade gracefully to a shuffled join).
   */
  def deletePoints(points: DataFrame, query: TsQuery, sub: SubQuery): DataFrame = {
    val ws = Points.withSeriesId(points)
    val matchedSeries = Points.withSeriesId(TagFilters(
        points.filter(col("metric") === sub.metric),
        sub.filters, sub.explicitTags))
      .select("series_id").distinct()
      .withColumn("__matched", lit(true))
    val inRange = col("ts") >= query.startMs && col("ts") <= query.endMs
    ws.join(matchedSeries, Seq("series_id"), "left")
      .filter(col("__matched").isNull || !inRange)
      .drop("__matched", "series_id")
  }

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

  /**
   * Per-group result identity, the reference's SpanGroup.computeTags
   * (src/core/SpanGroup.java:348-388): `tags` = tag keys carrying
   * exactly ONE distinct value across the group's member series (a key
   * missing from some members but single-valued where present stays —
   * only a second VALUE discards it), `aggregateTags` = keys seen with
   * two or more values. Input is the filtered point scan; groups are
   * (metric, grouped tag columns). One aggregation over the DISTINCT
   * member series — a dimension-sized shuffle, joined back per group
   * by the caller. Groups whose series carry no tags at all produce no
   * row (callers left-join and coalesce to empty).
   */
  def groupTagMeta(scanned: DataFrame, groupKeys: Seq[String]): DataFrame = {
    val gcols = col("metric") +: groupKeys.map(k => col(s"tag_$k"))
    // entries-array form: set ops (distinct) reject MAP columns
    val series = scanned
      .select(col("metric") +: groupKeys.map(k =>
        col("tags").getItem(k).as(s"tag_$k")) :+
        array_sort(map_entries(col("tags"))).as("__tags"): _*)
      .distinct()
    val kv = series
      .select(gcols :+ explode(col("__tags")).as("__e"): _*)
      .select(gcols :+ col("__e.key").as("__k") :+
        col("__e.value").as("__v"): _*)
    kv.groupBy(gcols :+ col("__k"): _*)
      .agg(countDistinct(col("__v")).as("__n"), max(col("__v")).as("__v1"))
      .groupBy(gcols: _*)
      .agg(
        map_from_entries(array_sort(collect_list(
          when(col("__n") === 1, struct(col("__k"), col("__v1"))))))
          .as("tags"),
        array_sort(collect_list(when(col("__n") > 1, col("__k"))))
          .as("aggregateTags"))
  }

  /**
   * Run a sub-query and attach the SpanGroup result identity per
   * series — the shape the expression layer's series matching consumes
   * ([[graft.operators.ExpressionJoin.VarSet]]): columns `tags`
   * (map), `agg_tags` (array), `ts`, `value`.
   */
  def runForExpression(points: DataFrame, query: TsQuery, sub: SubQuery,
                       rollups: Seq[RollupTable] = Seq.empty): DataFrame = {
    val groupKeys = TagFilters.groupByKeys(sub.filters)
    val res = run(points, query, sub, rollups)
    val scanned = TagFilters(
      points.filter(col("metric") === sub.metric &&
        col("ts") >= query.startMs && col("ts") <= query.endMs),
      sub.filters, sub.explicitTags)
    val meta = groupTagMeta(scanned, groupKeys)
      .withColumnRenamed("tags", "__gtags")
    val keys = "metric" +: groupKeys.map(k => s"tag_$k")
    res.join(meta, keys, "left")
      .select(
        coalesce(col("__gtags"), map().cast("map<string,string>")).as("tags"),
        coalesce(col("aggregateTags"), array().cast("array<string>"))
          .as("agg_tags"),
        col("ts"), col("value"))
  }

  /**
   * Full V1 response serialization — one JSON document per group, the
   * reference's `[{metric, tags, aggregateTags, dps:{ts:val}}]` wire
   * shape (HttpJsonSerializer.formatQueryAsyncV1,
   * src/tsd/HttpJsonSerializer.java). `aggregateTags` = tag keys that
   * occur in the group's matched series but are not grouped on — one
   * extra aggregation over the scanned series, joined back per group.
   * When the query is not ms-resolution, dps keys are epoch seconds
   * (TSQuery.msResolution, src/core/TSQuery.java).
   */
  /** The sub-query as a literal struct column — the `query` ride-along
    * of show_query (reference TSQuery.showQuery: the parsed TSSubQuery
    * is echoed into each result document). */
  private def subQueryStruct(sub: SubQuery): Column = {
    def fType(f: TagFilter): String = f match {
      case l: LiteralOr => if (l.caseInsensitive) "iliteral_or" else "literal_or"
      case l: NotLiteralOr =>
        if (l.caseInsensitive) "not_iliteral_or" else "not_literal_or"
      case w: Wildcard => if (w.caseInsensitive) "iwildcard" else "wildcard"
      case _: RegexpFilter => "regexp"
      case _: NotKey => "not_key"
      case _: GroupByAll => "wildcard"
      case _: PluginFilter => "plugin"
    }
    def fExpr(f: TagFilter): String = f match {
      case l: LiteralOr => l.values.mkString("|")
      case l: NotLiteralOr => l.values.mkString("|")
      case w: Wildcard => w.pattern
      case r: RegexpFilter => r.regex
      case _: GroupByAll => "*"
      case _ => ""
    }
    val filters =
      if (sub.filters.isEmpty) array().cast(
        "array<struct<type:string,tagk:string,filter:string,groupBy:boolean>>")
      else array(sub.filters.map(f => struct(
        lit(fType(f)).as("type"), lit(f.tagk).as("tagk"),
        lit(fExpr(f)).as("filter"), lit(f.groupBy).as("groupBy"))): _*)
    struct(
      lit(sub.aggregator).as("aggregator"),
      lit(sub.metric).as("metric"),
      lit(sub.rate.isDefined).as("rate"),
      lit(sub.downsample.map(_.echo).orNull).as("downsample"),
      lit(sub.explicitTags).as("explicitTags"),
      filters.as("filters"))
  }

  def serializeV1(points: DataFrame, query: TsQuery, sub: SubQuery,
                  rollups: Seq[RollupTable] = Seq.empty,
                  globalAnnotations: Option[DataFrame] = None,
                  showTsuids: Boolean = false,
                  showQuery: Boolean = false,
                  showStats: Boolean = false,
                  showSummary: Boolean = false,
                  seriesAnnotations: Option[DataFrame] = None,
                  exactIntDps: Boolean = false,
                  asArrays: Boolean = false): DataFrame = {
    val groupKeys = TagFilters.groupByKeys(sub.filters)
    val result = run(points, query, sub, rollups,
      emitTypeFlag = exactIntDps)
    val outTs =
      if (query.msResolution) col("ts")
      else (col("ts") / 1000L).cast("long")
    val tagCols = groupKeys.map(k => col(s"tag_$k"))
    // the exact wire mode rides the per-dp integral flag through the
    // dps array (dropped again for the plain map column)
    val dpStruct =
      if (exactIntDps) struct(outTs.as("ts"), col("value"),
        coalesce(col("out_int"), lit(false)).as("oi"))
      else struct(outTs.as("ts"), col("value"))
    val dps = result
      .groupBy(col("metric") +: tagCols: _*)
      .agg(array_sort(collect_list(dpStruct)).as("dps_arr"))
      .withColumn("dps", map_from_entries(
        if (exactIntDps) transform(col("dps_arr"),
          e => struct(e.getField("ts"), e.getField("value")))
        else col("dps_arr")))
    // result-identity tags per group, from the matched series
    // (SpanGroup.computeTags semantics — see groupTagMeta)
    val scanned = TagFilters(
      points.filter(col("metric") === sub.metric &&
        col("ts") >= query.startMs && col("ts") <= query.endMs),
      sub.filters, sub.explicitTags)
    val aggTags = groupTagMeta(scanned, groupKeys)
      .withColumnRenamed("tags", "__gtags")
    val keys = "metric" +: groupKeys.map(k => s"tag_$k")
    // showTSUIDs (reference TSQuery.showTSUIDs): the member series of
    // each group as hex series hashes — the ids q48-style tsuids
    // queries accept back, closing the lookup→query round trip
    val withTsuids =
      if (!showTsuids) dps.join(aggTags, keys, "left")
      else dps.join(aggTags, keys, "left").join(
        Points.withSeriesId(scanned)
          .select((col("metric") +: groupKeys.map(k =>
            col("tags").getItem(k).as(s"tag_$k"))) :+
            hex(col("series_id")).as("__tsuid"): _*)
          .groupBy(col("metric") +: tagCols: _*)
          .agg(array_sort(collect_set(col("__tsuid"))).as("tsuids")),
        keys, "left")
    // show_stats (reference HttpJsonSerializer: per-query stats object;
    // the deterministic members here — timings belong to the runtime
    // counters, Introspect.statsCounters)
    val withStats =
      if (!showStats) withTsuids
      else withTsuids.join(
        Points.withSeriesId(scanned)
          .select((col("metric") +: groupKeys.map(k =>
            col("tags").getItem(k).as(s"tag_$k"))) :+ col("series_id"): _*)
          .groupBy(col("metric") +: tagCols: _*)
          .agg(countDistinct(col("series_id")).as("__series")),
        keys, "left")
        // emittedDPs is per QUERY, not per group (reference QueryStats
        // stats map — TestHttpJsonSerializer asserts the sub-query
        // total): one broadcast single-row aggregate, never an
        // unpartitioned window
        .crossJoin(broadcast(
          dps.agg(sum(size(col("dps"))).as("__edps"))))
    // per-series annotations (reference HttpJsonSerializer: each result
    // document carries the `annotations` of its MEMBER series whose
    // start time falls in the query range, sorted) — keyed by the
    // series hash, the same id the annotation CRUD and tsuid queries use
    val withAnns = seriesAnnotations match {
      case None => withStats
      case Some(ann) =>
        val perGroup = Points.withSeriesId(scanned)
          .select((col("metric") +: groupKeys.map(k =>
            col("tags").getItem(k).as(s"tag_$k"))) :+ col("series_id"): _*)
          .distinct()
          .join(ann.filter(col("start_ts").between(query.startMs, query.endMs))
              .select(col("series").as("__as"), col("start_ts"),
                col("end_ts"), col("description")),
            col("series_id") === col("__as"))
          .groupBy(col("metric") +: tagCols: _*)
          .agg(array_sort(collect_list(struct(col("start_ts"),
            col("end_ts"), col("description")))).as("annotations"))
        withStats.join(perGroup, keys, "left")
    }
    val base = withAnns
    val metricF = col("metric")
    // the result document's `tags` are the SpanGroup-computed identity
    // (every single-valued key, not just the grouped keys): a group
    // with one member series reports the series' FULL tag set — the
    // reference's well-known single-series aggregation behavior
    // (SpanGroup.computeTags, src/core/SpanGroup.java:348-388)
    val tagsF = coalesce(col("__gtags"),
      map().cast("map<string,string>")).as("tags")
    val aggTagsF = coalesce(col("aggregateTags"),
      array().cast("array<string>")).as("aggregateTags")
    val tsuidsF =
      if (showTsuids) Seq(col("tsuids")) else Seq.empty
    val queryF =
      if (showQuery) Seq(subQueryStruct(sub).as("query")) else Seq.empty
    val statsF =
      if (showStats) Seq(struct(
        size(col("dps")).as("aggregatedSize"),
        col("__edps").as("emittedDPs"),
        col("__series").as("series")).as("stats")) else Seq.empty
    val annsF =
      if (seriesAnnotations.isDefined) Seq(coalesce(col("annotations"),
        array().cast("array<struct<start_ts:bigint,end_ts:bigint," +
          "description:string>>")).as("annotations")) else Seq.empty
    val fields = Seq(metricF, tagsF, aggTagsF, col("dps")) ++
      tsuidsF ++ queryF ++ statsF ++ annsF
    // exactIntDps = the reference's wire-number rendering
    // (HttpJsonSerializer WriteToBuffer, src/tsd/HttpJsonSerializer
    // .java:743-816 field order, :849-872 per-dp numbers): an
    // integer-valued dp renders BARE (`"…700":1`), a float keeps its
    // decimal, and fields follow the serializer's write order
    // (metric, tags, aggregateTags, query?, tsuids?, annotations?,
    // globalAnnotations?, dps, stats?). "Integer-valued" follows the
    // reference's dp.isInteger() branch exactly: the aggregation
    // pipeline threads the long-path flag out as `out_int`
    // (Interpolate.aggregate emitTypeFlag), so a long-path dp renders
    // bare while a FLOAT-path dp that happens to land on an integer
    // keeps its `.0`, byte-for-byte like the reference serializer
    // (round 9 — closes the SURVEY §2.2 sliver). Off (default): every
    // dps value renders as a JSON double — the engine's stable oracle
    // contract since round 1.
    // asArrays = the `arrays=true` wire mode (HttpJsonSerializer
    // .formatQueryAsyncV1:647,820-846): dps render as [[ts, value]...]
    // pairs instead of the {"ts": value} object, same order and the
    // same per-dp number rendering rules
    def renderExactInt(headFields: Seq[Column], tail: Seq[Column]): Column = {
      val dpJson = (e: Column) => {
        val v = e.getField("value")
        val vs = coalesce(
          if (exactIntDps)
            when(e.getField("oi") && !isnan(v),
              v.cast("long").cast("string")).otherwise(v.cast("string"))
          else v.cast("string"),
          lit("null"))
        if (asArrays)
          concat(lit("["), e.getField("ts").cast("string"), lit(","), vs,
            lit("]"))
        else
          concat(lit("\""), e.getField("ts").cast("string"), lit("\":"), vs)
      }
      val dpsJson = concat(lit(if (asArrays) "[" else "{"),
        array_join(transform(col("dps_arr"), dpJson), ","),
        lit(if (asArrays) "]" else "}"))
      val headJson = to_json(struct(headFields: _*))
      val tailJson =
        if (tail.isEmpty) lit("{}") else to_json(struct(tail: _*))
      concat(
        regexp_replace(headJson, "\\}$", ""),
        lit(",\"dps\":"), dpsJson,
        when(tailJson === "{}", lit("}"))
          .otherwise(concat(lit(","), regexp_replace(tailJson, "^\\{", ""))))
    }
    val docs = globalAnnotations match {
      case None =>
        if (exactIntDps || asArrays) base.select(renderExactInt(
          Seq(metricF, tagsF, aggTagsF) ++ queryF ++ tsuidsF ++ annsF,
          statsF).as("json"))
        else base.select(to_json(struct(fields: _*)).as("json"))
      case Some(ann) =>
        // globalAnnotations=true (reference QueryRpc.java:124-320):
        // annotations with no series key inside the query range ride on
        // every result document as one broadcast single-row aggregate
        val ga = graft.meta.Annotations
          .globals(ann, ann.columns.filterNot(
            Seq("start_ts", "end_ts", "description").contains).toSeq,
            query.startMs, query.endMs)
          .agg(array_sort(collect_list(struct(
            col("start_ts"), col("end_ts"), col("description"))))
            .as("globalAnnotations"))
        val joined = base.crossJoin(broadcast(ga))
        if (exactIntDps || asArrays) joined.select(renderExactInt(
          Seq(metricF, tagsF, aggTagsF) ++ queryF ++ tsuidsF ++ annsF :+
            col("globalAnnotations"),
          statsF).as("json"))
        else joined
          .select(to_json(struct(fields :+ col("globalAnnotations"): _*))
            .as("json"))
    }
    // show_summary (reference FinalCB: {"statsSummary": …} appended as
    // an EXTRA array element after the result documents)
    if (!showSummary) docs
    else docs.unionByName(base
      .agg(count(lit(1)).as("groups"),
        sum(size(col("dps"))).as("emittedDPs"))
      .select(to_json(struct(struct(col("groups"), col("emittedDPs"))
        .as("statsSummary"))).as("json")))
  }

  /**
   * Serving-tier tracking wrapper — the flow QueryRpc.handleQuery has
   * around every served query (reference src/tsd/QueryRpc.java:127-137
   * registers `new QueryStats(remote, query, headers)` before parsing;
   * the serializer callbacks markSerialized/markSent on the way out and
   * the error path records the failure code). The result is consumed
   * ONCE, by the caller: tracking rides the caller's own action as a
   * `CollectMetrics` (Dataset.observe) row count — the reference's
   * emittedDPs is incremented during serialization and pays nothing
   * extra, and so does this (no pre-`count()`, no second execution).
   * The query stays in the RUNNING set until the caller's first action
   * completes; a [[ServeListener]] then records emittedDPs from the
   * observed metric and moves the entry into the completed ring
   * ([[graft.query.QueryStatsLog]]) that serves `/api/stats/query`.
   * Build-time IllegalArgumentException is the reference's 400 mapping
   * and anything else its 500, both re-thrown after recording;
   * execution-time failures record 500 through the listener.
   */
  def serveTracked(remote: String, queryText: String,
                   headers: Map[String, String] = Map.empty)
                  (body: => DataFrame): DataFrame = {
    val st = new graft.query.QueryStatsLog.QueryStats(
      remote, queryText, headers)
    try attachTracking(st, Seq(body)).head
    catch {
      case e: IllegalArgumentException =>
        st.markSerialized(400, "Bad Request", e)
        st.markSendFailed()
        recordServeLatency(st)
        throw e
      case e: Throwable =>
        st.markSerialized(500, "Internal Server Error", e)
        st.markSendFailed()
        recordServeLatency(st)
        throw e
    }
  }

  /** When true, [[runJson]] (the V1 POST /api/query serving entry)
    * registers a [[graft.query.QueryStatsLog.QueryStats]] per body and
    * tracks each sub-query's emittedDPs through the observe path —
    * `/api/stats/query` then reflects actually-served queries. Off by
    * default: library callers running plans outside a serving tier
    * should not populate a daemon stats ring. */
  @volatile var trackServes: Boolean = false

  private val serveSeq = new java.util.concurrent.atomic.AtomicLong()

  /** The reference's `http.latency` self-metric (HttpQuery.done():
    * `httplatency.add(processing_time)`, src/tsd/HttpQuery.java:701):
    * every tracked serve — success or failure — records its total
    * wall time into the `/api/stats` latency histogram at completion.
    * Clamped non-negative; values past the histogram's 16 s max land
    * in its overflow bucket, as the reference's does. */
  private def recordServeLatency(
      st: graft.query.QueryStatsLog.QueryStats): Unit = {
    val ms = st.getQueryCompletedTimestamp - st.getQueryStartTimestamp
    graft.meta.Introspect.recordLatency("http.latency",
      math.max(ms, 0L).min(Int.MaxValue).toInt)
  }

  /** One tracked serve over `n` result frames (one HTTP query = one
    * QueryStats covering all its sub-queries). Completion fires when
    * the LAST frame's first action lands; any frame failing first
    * records the error code and wins (reference: serialization aborts
    * on the first sub-query error). */
  private final class TrackedServe(
      val st: graft.query.QueryStatsLog.QueryStats, n: Int) {
    private val remaining = new java.util.concurrent.atomic.AtomicInteger(n)
    private val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def succeed(idx: Int, emitted: Long): Unit = {
      if (n == 1) st.addStat("emittedDPs", emitted)
      else st.addStat(idx, "emittedDPs", emitted)
      if (remaining.decrementAndGet() == 0 && !failed.get()) {
        st.markSerialized(200, "OK", null)
        st.markSent()
        recordServeLatency(st)
      }
    }
    def fail(e: Throwable): Unit = if (failed.compareAndSet(false, true)) {
      val (code, reason) = e match {
        case _: IllegalArgumentException => (400, "Bad Request")
        case _ => (500, "Internal Server Error")
      }
      st.markSerialized(code, reason, e)
      st.markSendFailed()
      recordServeLatency(st)
    }
  }

  private val pendingServes =
    new java.util.concurrent.ConcurrentHashMap[String, (TrackedServe, Int, Long)]()
  // Keyed on the session OBJECT (weak, identity — SparkSession does not
  // override equals), not its identity hash: hash collisions between live
  // sessions, or a GC'd session's hash being reused, must not skip
  // registering the listener on a new session. Double registration after a
  // GC'd entry is the safe failure mode (pendingServes.remove is
  // idempotent, so a twice-fired listener is a no-op the second time).
  private val serveListenerSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
          java.lang.Boolean]()))

  /** Age (ms) after which a tracked serve whose result frame was never
    * consumed is reaped as a failed send — a long-lived daemon must not
    * grow [[pendingServes]] (and the stats ring's running set) without
    * bound when a caller abandons a frame. Reaping runs on each new
    * tracked serve; a legitimately-running query older than the TTL is
    * safe only if it completes before reap, so keep this comfortably
    * above the slowest expected serve. */
  @volatile var serveTtlMs: Long = 600000L

  /** Reap pending serves older than [[serveTtlMs]]: each is recorded as
    * a failed send (the frame will never be consumed) and evicted.
    * Returns the number reaped. Also callable directly by tests. */
  def reapExpiredServes(): Int = {
    val cutoff = System.nanoTime() - serveTtlMs * 1000000L
    var n = 0
    val it = pendingServes.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue._3 < cutoff &&
          pendingServes.remove(e.getKey, e.getValue)) {
        e.getValue._1.fail(new RuntimeException(
          "tracked serve expired: result frame never consumed"))
        n += 1
      }
    }
    n
  }

  /** Completes tracked serves when the caller's action lands: reads
    * the observed `graft_serve_*` row count on success, or maps the
    * failing plan's pending serves to a 500 on failure. Registered
    * once per SparkSession; fires on the (async) execution-listener
    * bus, so a serve completes shortly AFTER the caller's action
    * returns — [[awaitTrackedServes]] is the test barrier. */
  /** Listener invocations currently BETWEEN removing a pending entry
    * and finishing its stats recording — [[awaitTrackedServes]] must
    * not report done inside that window (the remove-then-record gap
    * is otherwise a race against readers of the stats ring). */
  private val servesInFlight =
    new java.util.concurrent.atomic.AtomicInteger()

  /** Names of graft_serve_ CollectMetrics nodes sitting BELOW a
    * row-limiting operator in `plan` — a partial action
    * (`limit(n).collect()`, `show()`, `isEmpty`) pushes only a prefix of
    * the result through the observe node, so its count is an UNDER-count
    * and must not complete the serve (the reference serializer always
    * materializes the full response before marking it sent). */
  private def limitedServeNames(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Set[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val out = scala.collection.mutable.Set[String]()
    def walk(p: LogicalPlan, limited: Boolean): Unit = {
      val lim = limited || (p match {
        case _: GlobalLimit | _: LocalLimit | _: Sample | _: Tail => true
        case _ => false
      })
      p match {
        case c: CollectMetrics
            if lim && c.name.startsWith("graft_serve_") => out += c.name
        case _ =>
      }
      p.children.foreach(walk(_, lim))
      p.subqueries.foreach(walk(_, lim))
    }
    walk(plan, limited = false)
    out.toSet
  }

  private object ServeListener
      extends org.apache.spark.sql.util.QueryExecutionListener {
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit = {
      // the plan walk is O(plan size) and this listener fires for EVERY
      // action on a registered session — only pay it when a tracked
      // metric was actually observed
      if (!qe.observedMetrics.keys.exists(_.startsWith("graft_serve_")))
        return
      val partial = limitedServeNames(qe.analyzed)
      qe.observedMetrics.foreach { case (name, row) =>
        // a metric observed under a limit is a prefix count: leave the
        // serve pending (a later full materialization still completes
        // it; an abandoned frame is reaped by reapExpiredServes)
        if (name.startsWith("graft_serve_") && !partial.contains(name)) {
          servesInFlight.incrementAndGet()
          try Option(pendingServes.remove(name)).foreach { case (ts, idx, _) =>
            ts.succeed(idx, row.getLong(0))
          } finally servesInFlight.decrementAndGet()
        }
      }
    }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        ex: Exception): Unit =
      qe.analyzed.collect {
        case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
            if c.name.startsWith("graft_serve_") => c.name
      }.foreach { name =>
        servesInFlight.incrementAndGet()
        try Option(pendingServes.remove(name)).foreach(_._1.fail(ex))
        finally servesInFlight.decrementAndGet()
      }
  }

  /** Attach observe-based tracking to each result frame: a uniquely
    * named `CollectMetrics(count)` rides the caller's own action, so
    * one tracked serve executes ONE job over the result.
    *
    * CONTRACT: each returned frame must be FULLY materialized exactly
    * once (`collect()`, `count()`, a full write — anything that pulls
    * every row). A row-limited action (`show()`, `limit(n).collect()`,
    * `isEmpty`) is detected and ignored (prefix counts must not
    * complete the serve); a frame never fully consumed is reaped after
    * [[serveTtlMs]] as a failed send. */
  private def attachTracking(st: graft.query.QueryStatsLog.QueryStats,
                             dfs: Seq[DataFrame]): Seq[DataFrame] = {
    reapExpiredServes()
    val ts = new TrackedServe(st, dfs.size)
    dfs.zipWithIndex.map { case (df, i) =>
      val sess = df.sparkSession
      if (serveListenerSessions.add(sess))
        sess.listenerManager.register(ServeListener)
      val name = s"graft_serve_${serveSeq.incrementAndGet()}"
      pendingServes.put(name, (ts, i, System.nanoTime()))
      df.observe(name, count(lit(1)).as("emittedDPs"))
    }
  }

  /** Test/diagnostic barrier: true when every tracked serve whose
    * action has run has been recorded (the execution-listener bus is
    * async). Serves whose frames were never consumed stay pending —
    * they are still "running" queries by contract. */
  def awaitTrackedServes(timeoutMs: Long = 30000L): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while ((!pendingServes.isEmpty || servesInFlight.get() > 0) &&
        System.nanoTime() < deadline)
      Thread.sleep(5)
    pendingServes.isEmpty && servesInFlight.get() == 0
  }

  /** Diagnostic: tracked serves whose completion has not yet landed
    * (frames unconsumed, partially consumed, or listener in flight). */
  def pendingServeCount: Int = pendingServes.size

  /** Test hook: abandon tracked serves whose frames will never be
    * consumed, so a later [[awaitTrackedServes]] doesn't time out on
    * another test's leftovers. */
  def clearPendingServes(): Unit = pendingServes.clear()
}
