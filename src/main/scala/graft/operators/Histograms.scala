package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Histogram data points and percentile extraction (reference:
 * src/core/HistogramDataPoint.java:56-67 interface,
 * src/core/SimpleHistogram.java bundled codec,
 * histogram queries test/core/TestTsdbQueryHistogramQueries.java).
 *
 * Spark-native model (SURVEY §1.5): a histogram is rows of
 * (group, bucket_lo, bucket_hi, count) — relational rather than an
 * opaque blob, so bucket merging across series/time is a plain
 * groupBy(bucket).sum(count) and Catalyst handles partial aggregation.
 * Percentile extraction walks the cumulative distribution with a
 * window, interpolating linearly inside the target bucket.
 */
object Histograms {

  /** Build fixed-width histogram rows from raw points:
    * bucket i = [i*width, (i+1)*width). */
  def fromPoints(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 width: Double): DataFrame = {
    val b = floor(col(valueCol) / width)
    df.withColumn("bucket_lo", b * width)
      .withColumn("bucket_hi", (b + 1) * width)
      .groupBy((groupCols.map(col) :+ col("bucket_lo")) :+ col("bucket_hi"): _*)
      .agg(count(lit(1)).as("count"))
  }

  /**
   * Percentile from histogram rows, per group: the value v such that a
   * fraction p of the mass lies below, interpolated linearly within
   * the bucket that crosses the threshold:
   *   v = lo + (hi - lo) * (p*total - cum_below) / bucket_count
   */
  def percentile(hist: DataFrame, groupCols: Seq[String], p: Double): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket_lo"))
    val cum = hist
      .withColumn("cum", sum(col("count")).over(w))
      .withColumn("total", sum(col("count")).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val target = col("total") * p
    // first bucket whose cumulative count reaches the target
    cum.filter(col("cum") >= target && (col("cum") - col("count")) < target)
      .withColumn("value",
        col("bucket_lo") + (col("bucket_hi") - col("bucket_lo")) *
          (target - (col("cum") - col("count"))) / col("count"))
      .select(groupCols.map(col) :+ col("value"): _*)
  }
}
