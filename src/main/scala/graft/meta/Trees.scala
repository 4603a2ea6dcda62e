package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tree API — rule-driven hierarchical browsing of the series set
 * (reference: src/tree/Tree.java:73, TreeBuilder.java:62,
 * src/tsd/TreeRpc.java). A tree is built from ordered rules, each
 * producing one path level from a series' metric or a tag value
 * (reference rule types METRIC / METRIC_CUSTOM / TAGK ...).
 *
 * Spark-native: rules are Column extractors over a distinct-series
 * frame; the tree materializes as one row per (depth, path) node with
 * its parent path and leaf count — a browsable adjacency table rather
 * than the reference's HBase branch/leaf rows.
 */
object Trees {

  /** Rule: level from a tag value (reference TAGK rule). */
  def tagRule(tagk: String): Column = col("tags").getItem(tagk)

  /** Rule: level from the metric name, optionally a dot-split component
    * (reference METRIC rule with separator). */
  def metricRule(component: Int = -1): Column =
    if (component < 0) col("metric")
    else element_at(split(col("metric"), "\\."), component + 1)

  /**
   * Build tree nodes from a points or series frame. Series whose rule
   * value is null at any level are pruned at that depth (the
   * reference's no-match branch behavior).
   *
   * @return (depth, path, name, parent, leaves) — one row per node,
   *         `leaves` = number of distinct series below it
   */
  def build(series: DataFrame, rules: Seq[Column]): DataFrame = {
    val withId = if (series.columns.contains("series_id")) series
                 else graft.model.Points.withSeriesId(series)
    // distinct on (series hash, levels) — a map column is not a valid
    // set-operation key, the hash is
    val leveled = withId.select(
      col("series_id") +:
        rules.zipWithIndex.map { case (r, i) => r.as(s"__l$i") }: _*)
      .distinct()
    val paths = (1 to rules.length).map { depth =>
      val lvls = (0 until depth).map(i => col(s"__l$i"))
      leveled
        .filter(lvls.map(_.isNotNull).reduce(_ && _))
        .groupBy(lvls: _*)
        .agg(countDistinct(col("series_id")).as("leaves"))
        .select(
          lit(depth).as("depth"),
          concat_ws("/", lvls: _*).as("path"),
          lvls.last.as("name"),
          (if (depth == 1) lit("") else concat_ws("/", lvls.dropRight(1): _*))
            .as("parent"),
          col("leaves"))
    }
    paths.reduce(_ unionByName _)
  }
}
