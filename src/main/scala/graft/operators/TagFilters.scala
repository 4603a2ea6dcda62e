package graft.operators

import graft.query._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tag filtering — every reference TagVFilter compiled to a Catalyst
 * predicate (reference: src/query/filter/TagVLiteralOrFilter.java,
 * TagVNotLiteralOrFilter.java, TagVWildcardFilter.java,
 * TagVRegexFilter.java, TagVNotKeyFilter.java).
 *
 * The reference splits filters into rowkey-regex pushdown vs post-scan
 * (src/core/TsdbQuery.java:675-768); with Catalyst all predicates push
 * down to the Parquet scan automatically, so there is one code path.
 */
object TagFilters {

  /** Translate the reference's glob (`*` only wildcard, case-opt) to a
    * SQL LIKE pattern. Reference: TagVWildcardFilter matches with
    * components split on `*`. */
  private def globToRegex(pattern: String): String =
    pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")

  /** Compile one filter to a boolean Column over `tags`. */
  def compile(f: TagFilter, tags: Column): Column = f match {
    case LiteralOr(k, vs, ci, _) =>
      val tv = tags.getItem(k)
      if (ci) lower(tv).isin(vs.map(_.toLowerCase): _*) else tv.isin(vs: _*)
    case NotLiteralOr(k, vs, ci, _) =>
      val tv = tags.getItem(k)
      // reference semantics: a series WITHOUT the tag passes
      // (TagVNotLiteralOrFilter.match returns true on tagv == null,
      // src/query/filter/TagVNotLiteralOrFilter.java:81-83)
      val in = if (ci) lower(tv).isin(vs.map(_.toLowerCase): _*) else tv.isin(vs: _*)
      tv.isNull || !in
    case Wildcard(k, pat, ci, _) =>
      val tv = tags.getItem(k)
      if (pat == "*") tv.isNotNull
      else if (ci) lower(tv).rlike("^" + globToRegex(pat.toLowerCase) + "$")
      else tv.rlike("^" + globToRegex(pat) + "$")
    case RegexpFilter(k, re, _) => tags.getItem(k).rlike(re)
    case NotKey(k) => !map_contains_key(tags, lit(k))
    case GroupByAll(k) => tags.getItem(k).isNotNull
    case PluginFilter(_, predicate, _) => predicate(tags)
  }

  /** Apply all filters plus the `explicit_tags` rule (series' tag set
    * must be exactly the filtered keys — reference
    * src/core/TSSubQuery.java:89, src/query/QueryUtil.java:414-480). */
  def apply(df: DataFrame, filters: Seq[TagFilter], explicitTags: Boolean = false): DataFrame = {
    val tags = col("tags")
    val base = filters.foldLeft(df)((d, f) => d.filter(compile(f, tags)))
    if (explicitTags && filters.nonEmpty) {
      val keys = filters.map(_.tagk).distinct
      base.filter(size(tags) === keys.length &&
        keys.map(k => map_contains_key(tags, lit(k))).reduce(_ && _))
    } else base
  }

  /** Grouping tag keys out of a filter list (groupBy=true filters and
    * GroupByAll markers — reference TsdbQuery.findGroupBys
    * src/core/TsdbQuery.java:675-768). */
  def groupByKeys(filters: Seq[TagFilter]): Seq[String] =
    filters.filter(_.groupBy).map(_.tagk).distinct
}
