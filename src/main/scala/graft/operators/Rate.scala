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
    val delta = col("value") - prevV

    val rate =
      if (!opts.counter) delta / dtSec
      else {
        val rolled = (lit(opts.counterMax).cast("double") - prevV + col("value")) / dtSec
        val r = when(delta < 0, rolled).otherwise(delta / dtSec)
        if (opts.resetValue > 0) when(r > opts.resetValue, lit(0.0)).otherwise(r) else r
      }

    val out = withSeries
      .withColumn("prev_v", prevV)
      .withColumn("rate_v", rate)
    val dropped =
      if (opts.dropResets) out.filter(col("value") - col("prev_v") >= 0 || col("prev_v").isNull)
      else out
    dropped
      .filter(col("rate_v").isNotNull)
      .drop("value", "prev_v")
      .withColumnRenamed("rate_v", "value")
  }
}
