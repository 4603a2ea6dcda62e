package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Expression-layer series functions — the gexp function registry
 * (reference: src/query/expression/ExpressionFactory.java:32-59).
 *
 * Each operates on a "result set" DataFrame: the output of a sub-query
 * with columns (metric, tags|tag_* group cols, series_id?, ts, value).
 * All are declarative column/window transforms; the set-combining
 * functions (sumSeries etc.) are ts-equi-joins per SURVEY §2.3.
 */
object SeriesFunctions {

  private def seriesKey(df: DataFrame): Seq[String] =
    df.columns.filter(c => c == "metric" || c.startsWith("tag_") || c == "tags" || c == "series_id").toSeq

  /** absolute(m) — abs per point (reference Absolute.java). */
  def absolute(df: DataFrame): DataFrame =
    df.withColumn("value", abs(col("value")))

  /** scale(m, f) — multiply by a factor (reference Scale.java). */
  def scale(df: DataFrame, factor: Double): DataFrame =
    df.withColumn("value", col("value") * lit(factor))

  /** alias(name) — rename the output metric (reference Alias.java).
    * The template may reference tags as `@tagk` to advance tag values
    * into the metric name, e.g. for Graphite-style flat naming
    * (reference PostAggregatedDataPoints.metricNameAsync:75-97
    * replaces each `@key` with that series' tag value). A `@key` whose
    * tag is null on a row is left verbatim, mirroring the reference
    * (it only substitutes tags the series actually carries). Values
    * pass through unchanged — the reference's Alias.evaluate abs()es
    * them (Alias.java:68-74, copied from Absolute), an artifact its
    * own tests never exercise with negative data and at odds with the
    * documented "returns an alias" contract. */
  def alias(df: DataFrame, name: String): DataFrame = {
    val tagCols = df.columns.filter(_.startsWith("tag_"))
    val metricCol =
      if (!name.contains('@') || tagCols.isEmpty) lit(name)
      // longest key first so @hostname resolves before @host
      else tagCols.sortBy(c => -c.length).foldLeft(lit(name)) { (acc, c) =>
        val key = "@" + c.stripPrefix("tag_")
        replace(acc, lit(key), coalesce(col(c).cast("string"), lit(key)))
      }
    df.withColumn("metric", metricCol)
  }

  /** shift/timeShift(m, interval) — move series in time. NB the
    * reference's double path (TimeShift.java:136) multiplies the VALUE
    * by the shift — an evident upstream bug (its long path at :133 and
    * the class doc both only adjust timestamps); we implement the
    * documented contract, values unchanged, for both types.
    * (reference TimeShift.java). */
  def timeShift(df: DataFrame, shiftMs: Long): DataFrame =
    df.withColumn("ts", col("ts") + lit(shiftMs))

  /** firstDiff(m) — successive difference per series
    * (reference FirstDifference.java:81; the first point of each
    * series is KEPT and emits 0.0 — the reference pairs it with
    * itself via `diff.add(0.0)` — unlike `rate`, which drops the
    * null-lag row). */
  def firstDiff(df: DataFrame): DataFrame = {
    // the reference emits the FIRST point of each series as 0.0 and
    // keeps its timestamp (FirstDifference.firstDiff `diff.add(0.0)`,
    // src/query/expression/FirstDifference.java:81) — it does not
    // drop the row
    val w = Window.partitionBy(seriesKey(df).map(col): _*).orderBy(col("ts"))
    df.withColumn("value",
      coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0)))
  }

  /** movingAverage(m, window) — trailing average by point count
    * (reference MovingAverage.MovingAverageAggregator.runLong/Double,
    * src/query/expression/MovingAverage.java:191-290): the window
    * includes the current point, and until n points have accumulated
    * the output is 0 — NOT a partial average (TestMovingAverage
    * evaluateWindow2dps expects 0, 1.5, 2.5, ... over 1..5). */
  def movingAverageByCount(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(seriesKey(df).map(col): _*).orderBy(col("ts"))
      .rowsBetween(-(n - 1), 0)
    df.withColumn("value",
      when(count(col("value")).over(w) === n, avg(col("value")).over(w))
        .otherwise(lit(0.0)))
  }

  /** movingAverage(m, 'Xm') — trailing average by time window
    * (MovingAverage.java:227-268): points strictly inside the trailing
    * window (gap < windowMs) average; the output is 0 until the
    * series' history extends at least windowMs behind the current
    * point (the condition_met / window_started contract — the first
    * point of every series is always 0). rangeBetween keeps it a
    * single sorted pass. */
  def movingAverageByTime(df: DataFrame, windowMs: Long): DataFrame = {
    val keys = seriesKey(df).map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("ts"))
      .rangeBetween(-(windowMs - 1), 0)
    val histStart = Window.partitionBy(keys: _*).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("value",
      when(min(col("ts")).over(histStart) <= col("ts") - windowMs,
        avg(col("value")).over(w)).otherwise(lit(0.0)))
  }

  /** highestCurrent(m, n) — top-n series by most-recent value
    * (reference HighestCurrent.java:283). */
  def highestCurrent(df: DataFrame, n: Int): DataFrame =
    topK(df, n, max_by(col("value"), col("ts")))

  /** highestMax(m, n) — top-n series by max value
    * (reference HighestMax.java:293). */
  def highestMax(df: DataFrame, n: Int): DataFrame =
    topK(df, n, max(col("value")))

  /** Rank series by a per-series aggregate, keep top n. orderBy+limit
    * plans TakeOrderedAndProject — per-partition top-n then a single
    * merge of n×partitions rows, never a global sort on one task (the
    * unpartitioned-window anti-pattern with millions of series). The
    * winner set is n rows, so the semi-join back is a broadcast. */
  private def topK(df: DataFrame, n: Int, score: Column): DataFrame = {
    val keys = seriesKey(df)
    // the input plan appears twice (scoring pass + the semi-join's
    // probe side). Deliberately NOT persisted: Catalyst prunes the
    // scoring side down to keys+score before its shuffle, so that
    // branch re-scans only a narrow column slice with pushdown — far
    // cheaper than forcing a full-width materialization barrier on the
    // probe side's critical path (persisting here measured +2.3 s on
    // the bench's q11, and at cluster scale serializes the DAG while
    // caching columns the scoring pass never reads).
    val src = df
    val winners = src.groupBy(keys.map(col): _*).agg(score.as("__score"))
      .orderBy(col("__score").desc +: keys.map(c => col(c).asc): _*)
      .limit(n)
      .select(keys.map(col): _*)
    src.join(broadcast(winners), keys, "left_semi")
  }

  /**
   * UNION-join combine of N result sets on (join tags, ts)
   * (reference UnionIterator.java:455, SumSeries/DiffSeries/
   * MultiplySeries/DivideSeries.java). Missing sides fill per
   * `fill` (NaN default, reference NumericFillPolicy).
   *
   * Sets are aligned on the tag columns they share plus ts; `op` folds
   * the N value columns left-to-right (difference = first minus rest,
   * divide = first over rest — reference DiffSeries/DivideSeries.java).
   */
  def combineUnion(dfs: Seq[DataFrame], joinKeys: Seq[String],
                   op: (Column, Column) => Column,
                   fill: Double = Double.NaN): DataFrame =
    combine(dfs, joinKeys, op, "full_outer", Some(fill))

  /** INTERSECTION-join combine — only grid points present in all sets
    * (reference IntersectionIterator.java:521). */
  def combineIntersection(dfs: Seq[DataFrame], joinKeys: Seq[String],
                          op: (Column, Column) => Column): DataFrame =
    combine(dfs, joinKeys, op, "inner", None)

  private def combine(dfs: Seq[DataFrame], joinKeys: Seq[String],
                      op: (Column, Column) => Column, how: String,
                      fill: Option[Double]): DataFrame = {
    require(dfs.nonEmpty)
    val keys = joinKeys :+ "ts"
    val prepared = dfs.zipWithIndex.map { case (d, i) =>
      d.select(keys.map(col) :+ col("value").as(s"__v$i"): _*)
    }
    val joined = prepared.reduce((a, b) => a.join(b, keys, how))
    val vals = dfs.indices.map { i =>
      fill match {
        case Some(f) => coalesce(col(s"__v$i"), lit(f))
        case None => col(s"__v$i")
      }
    }
    joined.withColumn("value", vals.reduce(op))
      .select(keys.map(col) :+ col("value"): _*)
  }
}
