package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cross-variable series matching for the expression layer — the
 * reference's UnionIterator / IntersectionIterator semantics
 * (reference src/query/expression/UnionIterator.java:171-244,
 * IntersectionIterator.java:270-359, flattenTags at
 * UnionIterator.java:259-309 / IntersectionIterator.java:397-444).
 *
 * Each expression variable is one query result set whose series carry
 * the POST-AGGREGATION identity the reference computes in
 * SpanGroup.computeTags (src/core/SpanGroup.java:348-388): `tags` =
 * keys with exactly one distinct value across the group's member
 * series, `agg_tags` = keys seen with two or more values. Series are
 * matched ACROSS variables on a flattened key built from that
 * identity:
 *
 *   - default (useQueryTags=false): every (k,v) pair of the result
 *     tags, ordered;
 *   - useQueryTags=true: only pairs whose key appears in the
 *     sub-query's filter tag keys (TSSubQuery.getFilterTagKs:374);
 *   - includeAggTags=true: the aggregated-out tag KEYS are appended,
 *     so a variable that aggregated away an extra dimension will not
 *     match one that didn't (reference Join.java:28-34);
 *   - a series with EMPTY result tags flattens to the empty key
 *     regardless of the flags — the reference early-returns
 *     HBaseClient.EMPTY_ARRAY before consulting agg tags
 *     (UnionIterator.java:262-264).
 *
 * INTERSECTION keeps only keys present in every variable and throws
 * (reference IllegalDataException, IntersectionIterator.java:353-356)
 * when at least one variable had series but nothing intersects. UNION
 * keeps every key; a variable missing a series entirely emits the
 * union-level `missingSeriesFill` (reference fill_dp, default ZERO,
 * UnionIterator.java:100) at every grid timestamp, while a PRESENT
 * series missing a timestamp emits that variable's own fill policy
 * (the per-sub NumericFillPolicy, NaN in the reference tests).
 *
 * Time alignment is the reference's lock-step grid: the union of
 * timestamps across the SURVIVING series of all variables (kicked
 * series' extra timestamps never widen the grid — they are nulled
 * before iteration, IntersectionIterator.java:316). Every surviving
 * series emits at every grid timestamp.
 *
 * Scale shape: series identities are dimension tables (|series| rows,
 * broadcast); the slot grid is |series| × |grid-ts| — the same
 * boundedness contract as the interpolation slot join, and like it
 * the mitigation for unaligned raw stamps is downsampling before the
 * expression (measured: `Scratch --exp-jitter` sustains ~60 M slot
 * rows/s/32-cores on the fully-jittered worst case, linear in
 * series × grid; per-variable 1m downsampling first is flat
 * sub-second across 10× points — SCALING.md round-11 row). The
 * per-variable joins shuffle on
 * (series key, ts); the two driver-side actions (max series count,
 * intersection emptiness) run on pruned dimension tables only —
 * they are the reference's eager ctor validation.
 */
object ExpressionJoin {

  /** One expression variable's result set. `df` columns: `tags`
    * (map&lt;string,string&gt; — SpanGroup result tags), `agg_tags`
    * (array&lt;string&gt;), `ts` (long, ms), `value` (double).
    * `queryTagKs`: the sub-query's filter tag keys. `tsFill`: fill
    * for grid timestamps a present series lacks. */
  case class VarSet(name: String, df: DataFrame,
                    queryTagKs: Set[String] = Set.empty,
                    tsFill: Double = Double.NaN)

  /** Opt-in ceiling on the broadcast series-key table (0 = off,
    * reference-compatible: the reference materializes every joined
    * series in TSD heap with no limit either). The slot assembly
    * broadcasts the flattened key dim to every executor and builds a
    * |keys| × |grid| slot table; the keys themselves are cheap
    * (~40 B/series flattened — 1M series ≈ 40 MB broadcast) but the
    * slot table is the real cost driver, measured LINEAR at
    * ~50-60 M slot rows/s/32-cores out to 10k series × 10k grid
    * slots (`Scratch --exp-width`, SCALING.md). A serving tier sets
    * this to fail fast with a clear 400 instead of an executor OOM
    * deep in the join; enforcement costs one bounded `limit(n+1)`
    * count on the pruned key dim (union only — intersection's eager
    * validation already counts its keys for free). */
  @volatile var broadcastKeyCeiling: Long = 0L

  private def enforceCeiling(nKeys: => Long): Unit = {
    val cap = broadcastKeyCeiling
    if (cap > 0 && nKeys > cap)
      throw new IllegalArgumentException(
        s"Expression join exceeds the configured ceiling of $cap " +
          "series keys; narrow the filters or aggregate away a " +
          "dimension before the expression")
  }

  /** Flattened series-identity key (flattenTags). Per-segment markers
    * ("" k "" v for pairs, "" k for agg keys) keep
    * pairs and agg keys unambiguous where the reference relies on
    * fixed UID widths; crucially, a key whose sections are ALL empty
    * (query-tag filtering matched nothing, no agg keys appended)
    * collapses to the same empty string as the empty-tags early
    * return — the reference produces a zero-length array for both
    * (UnionIterator.java:262/289), and the oneAggedOneTagged vectors
    * depend on them matching. */
  private def flatKey(v: VarSet, useQueryTags: Boolean,
                      includeAggTags: Boolean): Column = {
    val pairsAll = map_entries(col("tags"))
    val pairs =
      if (!useQueryTags) pairsAll
      else if (v.queryTagKs.isEmpty)
        array().cast("array<struct<key:string,value:string>>")
      else filter(pairsAll,
        e => e.getField("key").isin(v.queryTagKs.toSeq.map(lit(_)): _*))
    val pairSegs = array_join(transform(array_sort(pairs),
      e => concat(lit("\u0001"), e.getField("key"), lit("\u0000"),
        e.getField("value"))), "")
    val aggSegs =
      if (!includeAggTags) lit("")
      else array_join(transform(
        array_sort(coalesce(col("agg_tags"), array().cast("array<string>"))),
        k => concat(lit("\u0002"), k)), "")
    when(size(pairsAll) === 0, lit(""))
      .otherwise(concat(pairSegs, aggSegs))
  }

  /** Flattened FULL-tags series key for a raw (un-joined) result set —
    * the per-series identity a metric-id output serializes under
    * (reference SerializeSubIterator keys series by their own
    * DataPoints, QueryExecutor.java:744-838). Same segment encoding as
    * [[flatKey]] with both flags off, so keys sort consistently. */
  def seriesKey(tags: Column): Column =
    array_join(transform(array_sort(map_entries(tags)),
      e => concat(lit("\u0001"), e.getField("key"), lit("\u0000"),
        e.getField("value"))), "")

  /** INTERSECTION join. Output: one row per (surviving series key,
    * grid ts) with `tags` (first variable's result tags for the key),
    * `ts`, and one `__v_<name>` column per variable (tsFill where the
    * series lacks the timestamp).
    * @throws IllegalArgumentException when some variable had series
    *         but the intersection is empty (reference
    *         IllegalDataException). */
  def intersection(id: String, sets: Seq[VarSet], useQueryTags: Boolean,
                   includeAggTags: Boolean): DataFrame = {
    require(sets.nonEmpty)
    val keyed = sets.map(v =>
      v -> v.df.withColumn("__skey", flatKey(v, useQueryTags, includeAggTags)))
    // eager ctor validation (the reference throws at construction) in
    // ONE job: tag each variable's series dim, count per key how many
    // variables hold it — total==0 means no series anywhere (empty
    // result), no key held by all means an empty intersection (error)
    val n = keyed.size
    val tagged = keyed.zipWithIndex.map { case ((_, d), i) =>
      d.select(col("__skey")).distinct().withColumn("__set", lit(i))
    }.reduce(_ unionByName _)
    val perKey = tagged.groupBy(col("__skey"))
      .agg(countDistinct(col("__set")).as("__n"))
    val stats = perKey.agg(count(lit(1)).as("total"),
      count(when(col("__n") === n, 1)).as("hits")).head()
    if (stats.getAs[Long]("total") == 0L) return emptyResult(keyed)
    if (stats.getAs[Long]("hits") == 0L)
      throw new IllegalArgumentException(s"No intersections found: $id")
    enforceCeiling(stats.getAs[Long]("hits")) // already counted — free
    assemble(keyed, perKey.filter(col("__n") === n).select("__skey"),
      missingSeriesFill = None)
  }

  /** UNION join. Output as [[intersection]], over the union of series
    * keys; variables missing a series emit `missingSeriesFill` at
    * every grid timestamp (reference UnionIterator fill_dp, default
    * ZERO). */
  def union(id: String, sets: Seq[VarSet], useQueryTags: Boolean,
            includeAggTags: Boolean,
            missingSeriesFill: Double = 0.0): DataFrame = {
    require(sets.nonEmpty)
    val keyed = sets.map(v =>
      v -> v.df.withColumn("__skey", flatKey(v, useQueryTags, includeAggTags)))
    val all = keyed.map(_._2.select("__skey").distinct())
      .reduce(_ unionByName _).distinct()
    // no eager action by default: the union never throws, and empty
    // key/grid dims flow through assemble to an empty (correctly-
    // shaped) result. With a ceiling set, ONE bounded count on the
    // pruned key dim buys the fail-fast.
    if (broadcastKeyCeiling > 0)
      enforceCeiling(all.limit(
        math.min(broadcastKeyCeiling + 1, Int.MaxValue).toInt).count())
    assemble(keyed, all, missingSeriesFill = Some(missingSeriesFill))
  }

  /** Shared slot-grid assembly: keys × (union of surviving series'
    * timestamps), then ONE aggregation + one left join per variable.
    * The per-series meta (winner tags, presence, agg tags) is derived
    * from a single window over the assembled slots instead of extra
    * per-variable aggregations — the per-variable pipeline appears in
    * the plan exactly twice (grid + values), and the two subtrees
    * share one exchange under reuse.
    *
    * Collisions — two series of ONE variable flattening to the same
    * key (e.g. useQueryTags filtering away their distinguishing
    * tags) — keep exactly ONE series wholesale, never a pointwise mix:
    * the reference's ByteMap put overwrites, keeping the last series
    * inserted (UnionIterator.computeUnion, UnionIterator.java:185-193).
    * Storage order is not reproducible here, so the winner is the
    * series with the max (tag entries, agg-tag keys) identity —
    * deterministic where the reference is storage-order-dependent
    * (same accepted-divergence class as the PREV-carry determinism).
    * A colliding key's timestamps where only a kicked series had data
    * get the variable's tsFill, exactly as if the winner had been the
    * only series. Series whose FULL identity is identical (equal tags
    * AND agg tags — possible only for nested expression outputs whose
    * meta collapsed to the empty fill_dp) cannot be told apart
    * wholesale (the frame carries no series id); their slots merge
    * pointwise-max — deterministic where the reference keeps
    * whichever EDP landed last in its ByteMap.
    *
    * Output columns: `__skey`, `tags` (projection contract: the first
    * variable HOLDING the series — tag values are identical across
    * variables for pair-matched keys), `__mtags` (reference meta
    * contract: the FIRST variable's tags, or an EMPTY map when that
    * variable misses the series — ExpressionIterator copies meta from
    * variable one's EDP, which is the shared empty fill_dp when
    * absent; ExpressionIterator.java:280-297 with the
    * `TODO - tags intersection` in ExpressionDataPoint.add), `__aggtags`
    * (union of the PRESENT variables' aggregated tag keys, name-sorted —
    * ExpressionDataPoint.add merges aggregated_tags), `ts`, and one
    * `__v_<name>` per variable. */
  private def assemble(keyed: Seq[(VarSet, DataFrame)], keys: DataFrame,
                       missingSeriesFill: Option[Double]): DataFrame = {
    val keyTab = broadcast(keys.select("__skey"))
    val pvs = keyed.map { case (v, d) =>
      v -> d.join(keyTab, Seq("__skey"), "left_semi")
        .groupBy(col("__skey"), col("ts"))
        // identity-FIRST struct ordering: the per-ts max picks the
        // max-(tags, agg-tags) series' row, and only among exact
        // identity ties the max value — so the winner window below
        // sees a consistent (e, a) identity and the kicked series
        // never leaks values pointwise
        .agg(max(struct(
          map_entries(col("tags")).as("e"),
          coalesce(col("agg_tags"), array().cast("array<string>")).as("a"),
          col("value").as("v")))
          .as(s"__m_${v.name}"))
    }
    // grid from SURVIVING series only (kicked series never widen it)
    val grid = pvs.map(_._2.select("ts")).reduce(_ unionByName _).distinct()
    val slots = grid.crossJoin(keyTab)
    val joined = pvs.foldLeft(slots) { case (acc, (_, pv)) =>
      acc.join(pv, Seq("__skey", "ts"), "left")
    }
    // one per-series window serves every variable: its max (entries,
    // agg tags) struct is the WINNER series' identity AND the presence
    // witness (null ⟺ the variable holds no row for the series)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__skey"))
    val winners = keyed.map { case (v, _) =>
      val m = col(s"__m_${v.name}")
      // the when() keeps absent slots NULL (struct(null,null) is not
      // null, and max only skips true nulls) — win is null ⟺ the
      // variable holds no row at all for the series
      max(when(m.isNotNull,
        struct(m.getField("e").as("e"), m.getField("a").as("a")))).over(w)
    }
    val valueCols = keyed.zip(winners).map { case ((v, _), win) =>
      val m = col(s"__m_${v.name}")
      // a row only counts when it belongs to the winner series (full
      // (tags, agg-tags) identity); the kicked series' slots fall
      // back to tsFill
      val own = when(struct(m.getField("e").as("e"),
        m.getField("a").as("a")) === win, m.getField("v"))
      val within = coalesce(own, lit(v.tsFill))
      (missingSeriesFill match {
        case Some(f) => when(win.isNull, lit(f)).otherwise(within)
        case None => within
      }).as(s"__v_${v.name}")
    }
    val emptyEntries = array().cast("array<struct<key:string,value:string>>")
    // projection tags: the first variable holding the series
    val tagsCol = map_from_entries(coalesce(
      winners.map(_.getField("e")) :+ emptyEntries: _*)).as("tags")
    // reference meta tags: variable ONE's tags or empty (fill_dp copy)
    val mtagsCol = map_from_entries(
      coalesce(winners.head.getField("e"), emptyEntries)).as("__mtags")
    val aggtagsCol = array_sort(array_distinct(concat(
      winners.map(win => coalesce(win.getField("a"),
        array().cast("array<string>"))): _*))).as("__aggtags")
    joined.select(col("__skey") +: tagsCol +: mtagsCol +: aggtagsCol +:
      col("ts") +: valueCols: _*)
  }

  private def emptyResult(keyed: Seq[(VarSet, DataFrame)]): DataFrame = {
    val spark = keyed.head._2.sparkSession
    import org.apache.spark.sql.types._
    val fields = Seq(StructField("__skey", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("__mtags", MapType(StringType, StringType)),
      StructField("__aggtags", ArrayType(StringType)),
      StructField("ts", LongType)) ++
      keyed.map { case (v, _) => StructField(s"__v_${v.name}", DoubleType) }
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields))
  }
}
