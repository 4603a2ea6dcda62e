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
 * expression (SCALING.md). The per-variable joins shuffle on
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
    val seriesTabs = keyed.map(_._2.select("__skey").distinct())
    // eager ctor validation on dimension tables (|series| rows each)
    if (seriesTabs.map(_.count()).max < 1L) return emptyResult(keyed)
    val common = seriesTabs.reduce((a, b) => a.join(b, Seq("__skey"), "inner"))
    if (common.isEmpty)
      throw new IllegalArgumentException(s"No intersections found: $id")
    assemble(keyed, common, missingSeriesFill = None)
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
    if (all.isEmpty) return emptyResult(keyed)
    assemble(keyed, all, missingSeriesFill = Some(missingSeriesFill))
  }

  /** Shared slot-grid assembly: keys × (union of surviving series'
    * timestamps), then one left join per variable. */
  private def assemble(keyed: Seq[(VarSet, DataFrame)], keys: DataFrame,
                       missingSeriesFill: Option[Double]): DataFrame = {
    val keyTab = broadcast(keys.select("__skey"))
    // grid from SURVIVING series only (kicked series never widen it)
    val grid = keyed.map { case (_, d) =>
      d.join(keyTab, Seq("__skey"), "left_semi").select("ts")
    }.reduce(_ unionByName _).distinct()
    val slots = grid.crossJoin(keyTab)
    val joined = keyed.foldLeft(slots) { case (acc, (v, d)) =>
      val vals = d.groupBy(col("__skey"), col("ts"))
        .agg(max(col("value")).as(s"__raw_${v.name}"))
      val meta = d.groupBy(col("__skey"))
        .agg(max(map_entries(col("tags"))).as(s"__ents_${v.name}"))
        .withColumn(s"__has_${v.name}", lit(true))
      acc.join(vals, Seq("__skey", "ts"), "left")
        .join(broadcast(meta), Seq("__skey"), "left")
    }
    val valueCols = keyed.map { case (v, _) =>
      val within = coalesce(col(s"__raw_${v.name}"), lit(v.tsFill))
      (missingSeriesFill match {
        case Some(f) =>
          when(col(s"__has_${v.name}").isNull, lit(f)).otherwise(within)
        case None => within
      }).as(s"__v_${v.name}")
    }
    // representative result tags: the first variable holding the series
    val tagsCol = map_from_entries(coalesce(
      keyed.map { case (v, _) => col(s"__ents_${v.name}") } :+
        array().cast("array<struct<key:string,value:string>>"): _*))
      .as("tags")
    joined.select(col("__skey") +: tagsCol +: col("ts") +: valueCols: _*)
  }

  private def emptyResult(keyed: Seq[(VarSet, DataFrame)]): DataFrame = {
    val spark = keyed.head._2.sparkSession
    import org.apache.spark.sql.types._
    val fields = Seq(StructField("__skey", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("ts", LongType)) ++
      keyed.map { case (v, _) => StructField(s"__v_${v.name}", DoubleType) }
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields))
  }
}
