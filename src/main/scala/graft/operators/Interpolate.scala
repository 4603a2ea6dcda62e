package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interpolation-aware cross-series aggregation — the reference's
 * AggregationIterator pipeline (reference:
 * src/core/AggregationIterator.java:218-280 bounds, 700-797 lerp;
 * src/core/SpanGroup.java:525-529).
 *
 * Semantics: within a group (metric + grouping-tag values), the output
 * timestamp grid is the union of all member series' timestamps. At each
 * grid timestamp, a series contributes its exact value if present,
 * otherwise a value per the aggregator's interpolation policy
 * (src/core/Aggregators.java:38-44):
 *  - LERP: y0 + (x-x0)(y1-y0)/(x1-x0) between surrounding points; no
 *    contribution outside the series' own [first, last] range
 *  - ZIM: 0 when missing (zimsum)
 *  - PREV: previous value carried forward (pfsum; also all rates —
 *    rates are never lerped, src/core/AggregationIterator.java:744-753)
 *  - MAX/MIN sentinels (mimmin/mimmax): equivalent to "ignore missing",
 *    expressed here as null (Spark's min/max skip nulls)
 *
 * Spark design (SURVEY §2.5 option (a)): build the (group, ts) grid ×
 * member-series slot table, left-join actual points, compute
 * prev/next (ts, value) per series with ignore-null window frames, lerp
 * as a column expression, then a standard groupBy(group, ts) — all
 * declarative, whole-stage-codegen-able, one shuffle for the windows
 * (by series) and one for the final agg (by group, ts).
 */
object Interpolate {

  sealed trait Policy
  case object Lerp extends Policy
  case object Zim extends Policy
  case object Prev extends Policy
  case object Ignore extends Policy

  /** Interpolation policy of a reference aggregator name
    * (reference src/core/Aggregators.java:175-203). */
  def policyOf(agg: String): Policy = agg match {
    case "zimsum" => Zim
    case "pfsum" => Prev
    case "mimmin" | "mimmax" => Ignore
    case _ => Lerp
  }

  /**
   * True when the analyzed plan proves `is_int` is the literal `false`
   * on every row: the attribute traces (same exprId through
   * filters/projections) to an `Alias(Literal(false))`. Conservative —
   * any Union/Intersect/Except in the plan disables the proof (set-op
   * outputs reuse the first child's exprIds, so a match there would
   * not cover the other branches), and a re-aliased or computed
   * `is_int` simply fails to match. False negatives only cost the
   * dead dual expressions; false positives are impossible by
   * construction.
   */
  private def staticallyUntyped(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Union}
    import org.apache.spark.sql.types.BooleanType
    val plan = df.queryExecution.analyzed
    val hasSetOp = plan.collectFirst {
      case u: Union => u
      case s: org.apache.spark.sql.catalyst.plans.logical.Intersect => s
      case s: org.apache.spark.sql.catalyst.plans.logical.Except => s
    }.nonEmpty
    !hasSetOp && plan.output.find(_.name == "is_int").exists { attr =>
      plan.collectFirst {
        case p: Project if p.projectList.exists {
            case a: Alias if a.exprId == attr.exprId =>
              a.child match {
                case Literal(false, BooleanType) => true
                case _ => false
              }
            case _ => false
          } => true
      }.getOrElse(false)
    }
  }

  /**
   * Aggregate series within groups, aligning timestamps by policy.
   *
   * @param df canonical points (metric, ts, value, tags[, series_id])
   * @param agg reference aggregator name
   * @param groupTagKeys tag keys to group by (empty = group all series
   *   of a metric together)
   * @param isRate rates reuse the previous value instead of lerping
   * @param emitTypeFlag also emit `out_int`: whether the output dp is
   *   integral in the reference's sense (AggregationIterator
   *   .isInteger, :612-625 — GROUP-wide: one float series demotes
   *   every dp of the group; see demoteTypeFlagGroupWide). The V1
   *   serializer's exact wire mode renders bare integers from it;
   *   downsampled/rate/untyped inputs yield false, matching
   *   Downsampler.isInteger():257 and RateSpan's double-only output.
   * @return (metric, [tag value columns], ts, value[, out_int])
   */
  def aggregate(df: DataFrame, agg: String, groupTagKeys: Seq[String] = Seq.empty,
                isRate: Boolean = false,
                emitTypeFlag: Boolean = false): DataFrame = {
    val withSeries =
      if (df.columns.contains("series_id")) df
      else graft.model.Points.withSeriesId(df)

    // long/double duality rides into the SLOT PATH when the input is
    // typed: rates are never integral (AggregationIterator.isInteger
    // :613-616 returns false for rate), downsampled inputs arrive
    // untyped by construction (Downsampler.isInteger:257 — "Downsampled
    // values are doubles"), and a plan whose `is_int` is PROVABLY the
    // literal false (e.g. Points.fromEvents' float-only projection)
    // skips the dual machinery entirely — the long branch could never
    // fire, and carrying it costs ~10% on the slot path (wider window
    // structs + dead lerp expressions)
    val hasDual = withSeries.columns.contains("value_l") &&
      withSeries.columns.contains("is_int") && !isRate &&
      !staticallyUntyped(withSeries)
    val dualCols =
      if (hasDual) Seq(col("value_l"), col("is_int")) else Seq.empty

    val tagCols = groupTagKeys.map(k => col("tags").getItem(k).as(s"tag_$k"))
    val groupCols = (col("metric") +: groupTagKeys.map(k => col(s"tag_$k")))
    val pts = withSeries.select(
      (col("metric") +: tagCols) ++
        Seq(col("series_id"), col("ts"), col("value")) ++ dualCols: _*)

    // the reference's per-dp integral flag for the present-points-only
    // paths: a contribution is long iff its point was written long
    val presentFlag =
      if (hasDual) coalesce(col("is_int") && col("value_l").isNotNull,
        lit(false))
      else lit(false)

    if (agg == "none" || agg == "raw") {
      // bypass: no grouping, no interpolation; >1 series is an error
      // (reference src/core/TsdbQuery.java:1006-1028). The guard stays
      // lazy: a broadcast single-row count + assert_true in the plan.
      val n1 = pts.agg(countDistinct(col("series_id")).as("__n"))
      val outCols: Seq[Column] = (groupCols :+ col("ts")) :+ col("value")
      val withFlag: Seq[Column] =
        if (emitTypeFlag) outCols :+ presentFlag.as("out_int") else outCols
      return pts.crossJoin(broadcast(n1))
        .where(assert_true(col("__n") <= 1,
          lit("aggregator 'none' requires exactly one series")).isNull)
        .select(withFlag: _*)
    }

    // rates are never lerped — the previous RATE is reused — but that
    // rule replaces only the LERP policy; zimsum stays zero-filled and
    // mimmin/mimmax stay ignore-missing even for rate queries
    // (reference src/core/AggregationIterator.java:744-753: the rate
    // branch substitutes the lerp step, not the fill policies)
    val policy0 = policyOf(agg) match {
      case Lerp if isRate => Prev
      case p => p
    }
    if (policy0 == Zim || policy0 == Ignore) {
      // Short-circuit: the grid×members slot join is a mathematical
      // no-op for these policies — filling 0 cannot change a sum and
      // nulls are skipped by min/max/count — so aggregate the present
      // points directly. The grid (distinct group ts) is exactly the
      // set of (group, ts) with ≥1 present point, which is what the
      // direct groupBy emits. Saves two distincts + two joins; at scale
      // the slot table is |series|×|union-of-ts| per group — a genuine
      // scale-killer for metric-wide grouping. Measured (SCALING.md
      // round-10 jitter probe): fully-jittered stamps materialize slot
      // rows at ~30M/s on local[32] — linear and unbounded in
      // series×points — while downsampling first collapses the grid to
      // the bucket count (sub-second, flat across 10× points), which is
      // why Engine.run downsamples BEFORE this join, like the
      // reference's per-span Downsampler ahead of AggregationIterator.
      // (the reference's ZIM/sentinel substitutions are typed to the
      // group's current mode, so the integral flag is decided by the
      // PRESENT contributions alone — exactly what bool_and sees here)
      val aggs = Aggregators.expr(agg, col("value"), col("ts")).as("value") +:
        (if (emitTypeFlag)
          Seq(coalesce(bool_and(presentFlag), lit(false)).as("out_int"))
        else Seq.empty)
      return demoteTypeFlagGroupWide(pts
        .groupBy(groupCols :+ col("ts"): _*)
        .agg(aggs.head, aggs.tail: _*), groupCols, emitTypeFlag)
    }

    // The slot-join path reads `pts` three times (grid, members, left
    // join). Without a persist each branch re-runs the upstream scan +
    // downsample from scratch — .explain shows three parquet scans, and
    // AQE exchange reuse does NOT kick in because column pruning gives
    // each branch a different ReadSchema. The persist is size-aware
    // (Caching.maybePersist): at 100 TB it avoids re-shuffling the full
    // point set three times (MEMORY_AND_DISK spills rather than
    // recomputes), while small inputs skip the materialization barrier
    // and just recompute. Lifecycle: blocks are LRU-evicted from
    // memory; a long-lived query service should reclaim disk blocks
    // between requests with spark.catalog.clearCache() (same applies
    // to the persisted postings in graft.pipeline.Dedup).
    val cached = graft.util.Caching.maybePersist(pts)

    // union-of-timestamps grid per group × member series. Each branch
    // re-aliases its columns (toDF assigns fresh expression ids): the
    // three-way self-join otherwise carries identical attribute ids on
    // every side, which the analyzer can fail to disambiguate for some
    // upstream plan shapes (first()-aggregated rollup outputs trigger
    // "conflicting references in Join"). Pure projections — Catalyst
    // collapses them, plans are unchanged where they already resolved.
    def freshIds(df: org.apache.spark.sql.DataFrame) =
      df.toDF(df.columns.toIndexedSeq: _*)
    val grid = freshIds(cached.select(groupCols :+ col("ts"): _*)).distinct()
    val members = freshIds(cached.select(groupCols :+ col("series_id"): _*))
      .distinct()
    val slots = grid.join(members,
      ("metric" +: groupTagKeys.map(k => s"tag_$k")).toSeq)
    val joined = slots.join(
      freshIds(cached.select(Seq(col("series_id"), col("ts"),
        col("value")) ++ dualCols: _*)),
      Seq("series_id", "ts"), "left")

    val policy = policy0
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts"))
    val present = col("value").isNotNull
    val pv = struct(Seq(col("ts"), col("value")) ++ dualCols: _*)
    lazy val prevP = last(when(present, pv), ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    lazy val nextP = first(when(present, pv), ignoreNulls = true)
      .over(w.rowsBetween(1, Window.unboundedFollowing))

    // A series contributes only within its own [first, last] range for
    // EVERY fill: lerp needs both neighbors by definition, and the
    // previous-value carry STOPS at the series' last point — the
    // reference iterator zeroes a span's current slot once its next
    // slot is exhausted (AggregationIterator.next:518-525 expiry;
    // TestAggregationIterator.pfsum: no carry of 48 at BASE+30s after
    // that span's last point at BASE+20s). NB the reference's expiry
    // scan starts at the previous `current` index, so a lower-indexed
    // exhausted span can leak ONE extra carry depending on span order —
    // an order-dependent artifact we deliberately do not reproduce
    // (this engine is deterministic: the carry always stops).
    val interp: Column = policy match {
      case Lerp =>
        val x0 = prevP.getField("ts"); val y0 = prevP.getField("value")
        val x1 = nextP.getField("ts"); val y1 = nextP.getField("value")
        when(present, col("value"))
          .when(prevP.isNotNull && nextP.isNotNull,
            y0 + (col("ts") - x0).cast("double") * (y1 - y0) / (x1 - x0).cast("double"))
          .otherwise(lit(null).cast("double"))
      case Zim =>
        when(present, col("value")).otherwise(lit(0.0))
      case Prev =>
        when(present, col("value"))
          .when(prevP.isNotNull && nextP.isNotNull, prevP.getField("value"))
          .otherwise(lit(null).cast("double"))
      case Ignore =>
        col("value")
    }

    val withD = joined.withColumn("ivalue", interp)
    if (!hasDual) {
      val aggs = Aggregators.expr(agg, col("ivalue"), col("ts")).as("value") +:
        (if (emitTypeFlag) Seq(lit(false).as("out_int")) else Seq.empty)
      withD
        .groupBy(groupCols :+ col("ts"): _*)
        .agg(aggs.head, aggs.tail: _*)
    } else {
      // Long path (reference runLong via AggregationIterator): when
      // every CONTRIBUTION at a timestamp is integral, the aggregator
      // runs over longs — lerp itself is INTEGER lerp with truncating
      // division (nextLongValue:705 `y0 + (x-x0)*(y1-y0)/(x1-x0)` in
      // long arithmetic) and the aggregate result truncates to a long
      // (Aggregators.dualExpr). One float contribution demotes that
      // timestamp to the double path (isInteger:612-625; the
      // reference also scans LOADED-but-non-contributing slot values,
      // a span-order artifact we simplify to contributions only —
      // identical for uniformly-typed groups). try_* arithmetic
      // degrades overflowing integer lerps to the double path instead
      // of an ANSI error (same approach as Rate's long deltas).
      val e = withD
        .withColumn("__pts", prevP.getField("ts"))
        .withColumn("__pvl", prevP.getField("value_l"))
        .withColumn("__pint",
          coalesce(prevP.getField("is_int"), lit(false)) &&
            prevP.getField("value_l").isNotNull)
        .withColumn("__nts", nextP.getField("ts"))
        .withColumn("__nvl", nextP.getField("value_l"))
        .withColumn("__nint",
          coalesce(nextP.getField("is_int"), lit(false)) &&
            nextP.getField("value_l").isNotNull)
      val presentInt = col("is_int") && col("value_l").isNotNull
      val bothNeighbors = col("__pts").isNotNull && col("__nts").isNotNull
      val lerpL = expr("try_add(__pvl, try_multiply(ts - __pts, " +
        "try_subtract(__nvl, __pvl)) div (__nts - __pts))")
      val (lvalue, iflag) = policy match {
        case Lerp =>
          (when(present, col("value_l"))
             .when(bothNeighbors, lerpL)
             .otherwise(lit(null).cast("long")),
           when(present, presentInt)
             .when(bothNeighbors,
               col("__pint") && col("__nint") && lerpL.isNotNull)
             .otherwise(lit(null).cast("boolean")))
        case Prev =>
          (when(present, col("value_l"))
             .when(bothNeighbors, col("__pvl"))
             .otherwise(lit(null).cast("long")),
           when(present, presentInt)
             .when(bothNeighbors, col("__pint"))
             .otherwise(lit(null).cast("boolean")))
        case _ => // Zim/Ignore short-circuited above
          (lit(null).cast("long"), lit(null).cast("boolean"))
      }
      val aggs = Aggregators.dualExpr(agg, col("ivalue"), col("__lv"),
          col("__iflag"), col("ts")).as("value") +:
        (if (emitTypeFlag)
          Seq(coalesce(bool_and(col("__iflag")), lit(false)).as("out_int"))
        else Seq.empty)
      demoteTypeFlagGroupWide(e.withColumn("__lv", lvalue)
        .withColumn("__iflag", iflag)
        .groupBy(groupCols :+ col("ts"): _*)
        .agg(aggs.head, aggs.tail: _*), groupCols, emitTypeFlag)
    }
  }

  /**
   * The reference's type flag is GROUP-wide, not per-timestamp: the
   * serializer's `isInteger` (AggregationIterator.java:612-625) scans
   * the loaded values of EVERY span in the group — contributing or
   * not — so one float series demotes the whole group at every output
   * dp. The per-timestamp bool_and above sees only contributions;
   * AND-ing it with its own group-wide minimum closes the gap (a
   * mixed-type group has some timestamp where the float series
   * contributes, so min-over-group is false exactly when any series
   * is float-typed). Window partitions on the group key over the
   * already-aggregated (group, ts) rows — no extra join or scan.
   */
  private def demoteTypeFlagGroupWide(df: DataFrame, groupCols: Seq[Column],
                                      emit: Boolean): DataFrame =
    if (!emit) df
    else df.withColumn("out_int",
      min(col("out_int")).over(Window.partitionBy(groupCols: _*)))
}
