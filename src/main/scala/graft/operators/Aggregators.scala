package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/**
 * Aggregator registry — all functions of the reference registry
 * (reference: src/core/Aggregators.java:175-203) as Catalyst column
 * expressions over a value column, usable both for cross-series
 * aggregation and for downsample bucket functions.
 *
 * Design notes for scale: everything here is a declarative aggregate
 * expression → Catalyst plans partial (map-side) + final aggregation
 * automatically, so a 100 TB groupBy combines locally before the
 * shuffle. The exact-percentile family materializes a sorted array per
 * group — bounded by points-per-(series, bucket), not by total data.
 */
object Aggregators {

  /** Product aggregate (reference `mult`, src/core/Aggregators.java:463-487).
    * Spark has no built-in product; typed Aggregator keeps exact sign/zero
    * semantics (vs the exp-sum-log trick which breaks on <=0). */
  class ProductAgg extends Aggregator[Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: Double): Double = b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
  lazy val productUdaf = udaf(new ProductAgg, Encoders.scalaDouble)

  /**
   * Exact order-statistic percentile with a selectable estimation type,
   * as pure column expressions over sort_array(collect_list(v)):
   *  - R-6 (commons-math3 default, the reference's `p50..p999`,
   *    src/core/Aggregators.java:657-708): h = (n+1)p
   *  - R-7 (`ep..r7`, src/core/Aggregators.java:137-173): h = (n-1)p + 1
   *  - R-3 (`ep..r3`): nearest-even rounding of np - 1/2, no interpolation
   */
  def percentile(v: Column, p: Double, estimation: String = "r6"): Column = {
    val sorted = sort_array(collect_list(v))
    val n = size(sorted).cast("double")
    def at(idx: Column): Column = // 1-based, clamped
      element_at(sorted, greatest(lit(1), least(idx, n)).cast("int"))
    estimation match {
      case "r6" => // h = (n+1)p ; linear interp between floor(h), floor(h)+1
        val h = (n + 1) * lit(p)
        val fl = floor(h)
        val frac = h - fl
        when(n === 0, lit(Double.NaN))
          .when(h <= 1, at(lit(1)))
          .when(h >= n, at(n))
          .otherwise(at(fl) + frac * (at(fl + 1) - at(fl)))
      case "r7" => // h = (n-1)p + 1
        val h = (n - 1) * lit(p) + 1
        val fl = floor(h)
        val frac = h - fl
        when(n === 0, lit(Double.NaN))
          .when(h >= n, at(n))
          .otherwise(at(fl) + frac * (at(fl + 1) - at(fl)))
      case "r3" => // index = round_half_even(np - 0.5), no interpolation
        val h = n * lit(p) - 0.5
        val idx = when(h - floor(h) === 0.5,
            when((floor(h) % 2) === 0, floor(h)).otherwise(floor(h) + 1))
          .otherwise(round(h, 0))
        when(n === 0, lit(Double.NaN)).otherwise(at(greatest(idx, lit(1.0))))
      case other => throw new IllegalArgumentException(s"estimation $other")
    }
  }

  /** Upper median: sorted(values)[n/2], 0-based (reference `median`,
    * src/core/Aggregators.java:397-431). */
  def medianUpper(v: Column): Column = {
    val sorted = sort_array(collect_list(v))
    val n = size(sorted)
    when(n === 0, lit(Double.NaN))
      .otherwise(element_at(sorted, (n.cast("double") / 2).cast("int") + 1))
  }

  /** Plugin point: custom aggregators registered by name (the
    * reference allows extending the Aggregators map,
    * src/core/Aggregators.java registry + SURVEY §2.13). */
  private val custom =
    scala.collection.concurrent.TrieMap.empty[String, (Column, Column) => Column]

  /** Register a custom aggregate `(value, ts) => aggregate Column`. */
  def register(name: String, fn: (Column, Column) => Column): Unit =
    custom.put(name, fn)

  /** Is `name` a known aggregator (built-in or registered)? Parse-time
    * validation hook (the reference resolves names at parse and throws
    * there — DownsamplingSpecification ctor, TSSubQuery.setAggregator). */
  def isKnown(name: String): Boolean =
    all.contains(name) || name == "raw" || custom.contains(name)

  /** NaN-skipping input: the reference's double paths skip NaN points
    * (src/core/Aggregators.java doubles branches; AggregationIterator
    * feeds only non-NaN). Spark instead propagates NaN through sum/avg
    * and sorts it ABOVE every value in max — so NaN inputs are mapped
    * to null (which every Spark aggregate skips). */
  private def nn(v: Column): Column = when(!isnan(v), v)

  /**
   * Aggregate expression by reference name over value column `v` with
   * time column `ts` (needed by first/last/diff).
   * Interpolation policy differences (sum vs zimsum etc.) are handled
   * by the alignment stage (Interpolate), not here.
   * NaN semantics: value aggregates skip NaN inputs; a group with no
   * non-NaN input yields NaN (count yields 0) — reference behavior.
   */
  def expr(name: String, v: Column, ts: Column): Column = name match {
    case "sum" | "zimsum" | "pfsum" | "mimsum" =>
      coalesce(sum(nn(v)), lit(Double.NaN))
    case "min" | "mimmin" => coalesce(min(nn(v)), lit(Double.NaN))
    case "max" | "mimmax" => coalesce(max(nn(v)), lit(Double.NaN))
    case "avg" => coalesce(avg(nn(v)), lit(Double.NaN))
    case "count" => count(nn(v))
    case "median" => medianUpper(nn(v))
    case "mult" => productUdaf(v)
    // POPULATION stddev, not sample: the reference's Welford loop
    // (src/core/Aggregators.java:498-522) starts n at 2 and increments
    // past the last element, so its final sqrt(M2/(n-1)) divides by
    // the COUNT — its own goldens prove it (dev({1,2}) == 0.5 exactly,
    // test/core/TestAggregators.java testStdDevFewDataInputs).
    // Single value → 0 falls out of stddev_pop naturally.
    case "dev" => coalesce(stddev_pop(nn(v)), lit(Double.NaN))
    case "diff" => max_by(v, ts) - min_by(v, ts) // last - first by time
    case "first" => min_by(v, ts)
    case "last" => max_by(v, ts)
    case "squareSum" | "squaresum" =>
      coalesce(sum(nn(v) * nn(v)), lit(Double.NaN))
    case p if p.startsWith("ep") && (p.endsWith("r3") || p.endsWith("r7")) =>
      val est = p.takeRight(2)
      val digits = p.drop(2).dropRight(2)
      percentile(nn(v), pctFromDigits(digits), est)
    case p if p.startsWith("p") && p.drop(1).forall(_.isDigit) =>
      percentile(nn(v), pctFromDigits(p.drop(1)), "r6")
    case "none" | "raw" => first_value(v) // bypass; caller enforces 1 series
    case other => custom.get(other) match {
      case Some(fn) => fn(v, ts)
      case None => throw new IllegalArgumentException(s"unknown aggregator: $other")
    }
  }

  /** `50`→0.50, `999`→0.999 (reference constants
    * src/core/Aggregators.java:124-135). */
  private def pctFromDigits(d: String): Double =
    d.toDouble / math.pow(10, d.length)

  /**
   * Long/double dual aggregate (SURVEY hard-part #2): the reference's
   * `runLong` path. When every contribution in the group is integral
   * (`is_int`), the aggregator runs over the LONG values and its
   * result is a long — `Aggregator.Longs` hands longs in and every
   * `runLong` returns a long (src/core/Aggregators.java: avg :371-379
   * truncating division, dev :498-571 truncated, PercentileAgg
   * `(long) percentile.evaluate()`, median/min/max/sum exact) — so
   * the long path computes over `vl` and truncates the result toward
   * zero (Java long semantics; exact for |x| < 2^53). Any non-integral
   * contribution demotes the whole group to the double path over `v`,
   * mirroring `AggregationIterator.isInteger`
   * (src/core/AggregationIterator.java:612-625).
   *
   * `v` and `vl` may differ beyond representation: in the cross-series
   * slot path the long side carries INTEGER-lerped contributions
   * (truncating lerp division, AggregationIterator.nextLongValue:705)
   * while the double side carries exact lerps.
   */
  def dualExpr(name: String, v: Column, vl: Column, isInt: Column,
               ts: Column): Column = {
    val longPath = name match {
      case "avg" =>
        // long/long division truncating toward zero like Java (cast-
        // to-long truncation; exact for |sum| < 2^53 which covers the
        // reference's realistic counter magnitudes)
        (sum(vl) / count(vl)).cast("long").cast("double")
      case other =>
        expr(other, vl.cast("double"), ts).cast("long").cast("double")
    }
    when(bool_and(isInt), longPath).otherwise(expr(name, v, ts))
  }

  /** Names whose double path skips NaN (all of them, in the reference —
    * aggregation iterators only feed non-NaN); exposed for tests. */
  val all: Seq[String] = Seq("sum", "min", "max", "avg", "count", "median",
    "mult", "dev", "diff", "first", "last", "squareSum", "zimsum", "pfsum",
    "mimmin", "mimmax", "p50", "p75", "p90", "p95", "p99", "p999",
    "ep50r3", "ep75r3", "ep90r3", "ep95r3", "ep99r3", "ep999r3",
    "ep50r7", "ep75r7", "ep90r7", "ep95r7", "ep99r7", "ep999r7", "none")
}
