package graft.operators

import graft.query.RateOptions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rate of change per series (reference: src/core/RateSpan.java:103-180,
 * options src/core/RateOptions.java:27-57).
 *
 * rate = (v1 - v0) / ((t1 - t0) in seconds). Counter semantics: when
 * the delta is negative, assume rollover: `counterMax - v0 + v1`; if
 * the resulting rate exceeds `resetValue` (when set), emit 0. With
 * `dropResets`, negative deltas are dropped entirely
 * (src/core/RateSpan.java:149-172).
 *
 * The reference's legacy quirk of pairing the first point against a
 * synthetic (t=0, v=0) point (src/core/RateSpan.java:109-114) is kept
 * behind `firstAgainstZero` (default off — the modern behavior drops
 * the first point, which has no predecessor).
 *
 * Scale notes: one window per series (shuffle on series_id, sort on
 * ts) — Spark's rangeBetween/lag windows are single-pass and spill-safe.
 */
object Rate {

  def apply(df: DataFrame, opts: RateOptions = RateOptions(),
            firstAgainstZero: Boolean = false): DataFrame = {
    val withSeries =
      if (df.columns.contains("series_id")) df
      else graft.model.Points.withSeriesId(df)
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts"))
    val prevV0 = lag(col("value"), 1).over(w)
    val prevT0 = lag(col("ts"), 1).over(w)
    val prevV = if (firstAgainstZero) coalesce(prevV0, lit(0.0)) else prevV0
    val prevT = if (firstAgainstZero) coalesce(prevT0, lit(0L)) else prevT0
    // guard zero/absent dt (ANSI mode raises on division by zero);
    // duplicate timestamps produce no rate point, matching the
    // reference's skip of zero-interval pairs
    val dtSec = when((col("ts") - prevT) =!= 0,
      (col("ts") - prevT).cast("double") / 1000.0)

    // Long-domain deltas when both points are integral (reference
    // RateSpan.calculateDelta, src/core/RateSpan.java:180-198 —
    // proven by testCalculateDelta_bigLongValues: counters near
    // Long.MaxValue differ by less than one double ulp, so the
    // double subtraction would yield rate 0 instead of 0.8). try_*
    // arithmetic degrades the pathological cross-sign overflow case
    // to the double path instead of an ANSI error.
    val hasLong = withSeries.columns.contains("value_l") &&
      withSeries.columns.contains("is_int")
    val deltaD = col("value") - prevV
    val (useLong, bothLong, deltaL, prevL) = if (hasLong) {
      val pL0 = lag(col("value_l"), 1).over(w)
      val pI0 = lag(col("is_int"), 1).over(w)
      val pL = if (firstAgainstZero) coalesce(pL0, lit(0L)) else pL0
      val pI = if (firstAgainstZero) coalesce(pI0, lit(true)) else pI0
      val dL = try_subtract(col("value_l"), pL)
      val both = col("is_int") && coalesce(pI, lit(false)) &&
        col("value_l").isNotNull && pL.isNotNull
      (both && dL.isNotNull, both, dL, pL)
    } else (lit(false), lit(false), lit(null).cast("long"),
      lit(null).cast("long"))
    val delta = when(useLong, deltaL.cast("double")).otherwise(deltaD)

    val rate =
      if (!opts.counter) delta / dtSec
      else {
        // rollover only fires when cur < prev, where
        // (max - prev) + cur <= max cannot overflow; the long form
        // stays exact for counters the double domain cannot represent
        // (reference runRateCounterDefault golden: MAX-55, MAX-25, 5 →
        // both rates exactly 1.0, where the double form would cancel
        // the +5 at 2^63 magnitudes). Gated on BOTH-long rather than
        // the raw delta being long-computable: same-sign counter
        // deltas never overflow, but a cross-sign pair (negative value
        // after a writer glitch) would null the delta while the
        // rollover form stays exact — keep the exact path available.
        val rolledD = lit(opts.counterMax).cast("double") - prevV + col("value")
        val rolled = (if (hasLong) {
          val rolledL = try_add(try_subtract(lit(opts.counterMax), prevL),
            col("value_l")).cast("double")
          when(bothLong, coalesce(rolledL, rolledD)).otherwise(rolledD)
        } else rolledD) / dtSec
        val r = when(delta < 0, rolled).otherwise(delta / dtSec)
        if (opts.resetValue > 0) when(r > opts.resetValue, lit(0.0)).otherwise(r) else r
      }

    val out = withSeries
      .withColumn("__delta", delta)
      .withColumn("rate_v", rate)
    val dropped =
      if (opts.dropResets) out.filter(col("__delta") >= 0 || col("__delta").isNull)
      else out
    val cleaned = dropped
      .filter(col("rate_v").isNotNull)
      .drop("value", "__delta")
      .withColumnRenamed("rate_v", "value")
    // a rate is never integral (reference RateSpan emits doubles
    // only); stale value_l/is_int from the input must not leak into
    // downstream truncating aggregation
    if (hasLong)
      cleaned.withColumn("value_l", lit(null).cast("long"))
        .withColumn("is_int", lit(false))
    else cleaned
  }
}
