package graft.meta

import graft.model.Points
import graft.sources.Ingest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality scan — the reference's fsck tool (src/tools/Fsck.java:86:
 * duplicate timestamps, bad values, value-length checks) as one
 * DataFrame report. Each check is a full-scan aggregate; they share the
 * single pass over the input via one union-of-aggregates plan, so the
 * job reads the table once per check group, not once per row.
 */
object Fsck {

  /**
   * Quality report: one row per check with the offending row count.
   *  - duplicate_points: extra rows per (series, ts) beyond the first
   *    (the reference resolves these at compaction with last-write-wins)
   *  - non_finite_values: NaN/±Inf doubles
   *  - null_values: null value column
   *  - future_timestamps: ts beyond `nowMs`
   *  - bad_metric_charset: metric violating the reference charset rule
   */
  def report(points: DataFrame, nowMs: Long): DataFrame = {
    val p = if (points.columns.contains("series_id")) points
            else Points.withSeriesId(points)
    val dups = p.groupBy(col("series_id"), col("ts"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n"))
      .select(lit("duplicate_points").as("check"), col("n"))
    val flat = p.agg(
      count(when(isnan(col("value")) ||
        col("value") === Double.PositiveInfinity ||
        col("value") === Double.NegativeInfinity, 1)).as("non_finite_values"),
      count(when(col("value").isNull, 1)).as("null_values"),
      count(when(col("ts") > nowMs, 1)).as("future_timestamps"),
      count(when(!col("metric").rlike(Ingest.NAME_RE), 1))
        .as("bad_metric_charset"))
    val checks = Seq("non_finite_values", "null_values",
      "future_timestamps", "bad_metric_charset")
    dups.unionByName(
      flat.select(explode(map(checks.flatMap(c =>
        Seq(lit(c), col(c))): _*)).as(Seq("check", "n"))))
  }

  /**
   * Repair mode — the reference fsck's `--fix`/`--resolve-duplicates`
   * (src/tools/Fsck.java:86, fix flags at :60-84) as one relational
   * pass: every check [[report]] counts is enforced on the data.
   *  - null / NaN / ±Inf values dropped
   *  - timestamps beyond `nowMs` dropped
   *  - bad-charset metrics dropped
   *  - duplicate (series, ts) points resolved to ONE row. The
   *    reference keeps the cell HBase wrote last; our model carries
   *    no write timestamp, so the resolution key is the value itself
   *    (greatest wins, then the integer flags) — deterministic across
   *    runs and engines, which last-write-wins on a distributed
   *    ingest is not.
   *
   * Plan: one filter (scan-stage, pushdown-able) + one partial+final
   * max_by aggregation keyed on (series_id, ts) — the same
   * high-cardinality key every per-series stage shuffles on, so a
   * bucketed table repairs with no exchange at all.
   */
  def repair(points: DataFrame, nowMs: Long): DataFrame = {
    val p0 = if (points.columns.contains("series_id")) points
             else Points.withSeriesId(points)
    val clean = p0.filter(
      col("value").isNotNull && !isnan(col("value")) &&
        col("value") =!= Double.PositiveInfinity &&
        col("value") =!= Double.NegativeInfinity &&
        col("ts") <= nowMs &&
        col("metric").rlike(Ingest.NAME_RE))
    val payload = struct(clean.columns.filter(_ != "series_id")
      .map(col): _*)
    val order = if (clean.columns.contains("value_l"))
      struct(col("value"),
        coalesce(col("value_l"), lit(Long.MinValue)).as("vl"))
    else struct(col("value"))
    clean.groupBy(col("series_id"), col("ts").as("__ts"))
      .agg(max_by(payload, order).as("__r"))
      .select("__r.*")
  }
}
