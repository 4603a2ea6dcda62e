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

  // ---- path-element escaping -----------------------------------------
  // "/" is a LEGAL character in reference metric/tag names
  // (Tags.validateString allows a-zA-Z0-9-_./), so element boundaries in
  // the "/"-joined path/parent/branch_path identity columns must survive
  // names containing it — otherwise two distinct element tuples (e.g.
  // ["a/b"] vs ["a","b"]) conflate, and the hex branch address (which
  // hashes WHOLE element names, Branch.compileBranchId) can never match
  // a stored row. %-encoding of just {%, /}: identity for every name
  // without those characters, so stored paths (and the oracle contract)
  // are unchanged for ordinary names; literal `replace` stays in
  // whole-stage codegen.

  /** Escape one path element for storage inside a "/"-joined path. */
  def escapeElem(c: Column): Column =
    replace(replace(c, lit("%"), lit("%25")), lit("/"), lit("%2F"))

  /** Inverse of [[escapeElem]] (column form). */
  def unescapeElem(c: Column): Column =
    replace(replace(c, lit("%2F"), lit("/")), lit("%25"), lit("%"))

  /** Inverse of [[escapeElem]] (driver-side form, for rendering). */
  def unescapeElemStr(s: String): String =
    s.replace("%2F", "/").replace("%25", "%")

  // ---- rules as data (reference TreeRule model, src/tree/TreeRule.java:
  // 57-110 — tree_id/level/order identity, type, field, regex,
  // separator; CRUD via src/tsd/TreeRpc.java handleRule) ---------------

  /**
   * One stored rule. `level` is the tree depth the rule feeds; within a
   * level, rules are tried in `order` until one produces a value
   * (reference TreeBuilder.processRuleset fallback chain,
   * src/tree/TreeBuilder.java:62). `separator` splits the source value
   * and `component` selects the piece; `regex` then extracts
   * `regexGroup` (reference rule processing order: split, then regex).
   */
  case class Rule(treeId: Int, level: Int, order: Int, ruleType: String,
                  field: String = "", separator: String = "",
                  component: Int = 0, regex: String = "",
                  regexGroup: Int = 0, description: String = "",
                  customField: String = "", notes: String = "",
                  displayFormat: String = "")

  /** separator-then-regex post-processing shared by every rule type
    * (reference TreeBuilder.processParsedValue order). */
  private def applyTransforms(r: Rule, base: Column): Column = {
    val split0 =
      if (r.separator.isEmpty) base
      else element_at(split(base,
        java.util.regex.Pattern.quote(r.separator)), r.component + 1)
    if (r.regex.isEmpty) split0
    else {
      val ex = regexp_extract(split0, r.regex, r.regexGroup)
      when(ex === "", lit(null: String)).otherwise(ex)
    }
  }

  private def isCustom(r: Rule): Boolean =
    Set("METRIC_CUSTOM", "TAGK_CUSTOM", "TAGV_CUSTOM")
      .contains(r.ruleType.toUpperCase)

  /** Compile one stored rule to its extractor Column. Non-matching
    * regexes and missing tags yield null, which prunes the series at
    * that depth (same as the inline-Column rules). Custom rules read
    * the pre-joined `__custom_<level>_<order>` column that
    * [[withCustomSources]] attaches. */
  def compileRule(r: Rule): Column = {
    val base = r.ruleType.toUpperCase match {
      case "METRIC" => col("metric")
      case "TAGK"   => tagRule(r.field)
      case t if isCustom(r) => col(s"__custom_${r.level}_${r.order}")
      case other => throw new IllegalArgumentException(
        s"unsupported tree rule type: $other")
    }
    applyTransforms(r, base)
  }

  /**
   * Attach the source columns custom rules read — the reference's
   * *_CUSTOM rule types (TreeBuilder.java:800-900): the level value
   * comes from a UID's meta `custom` map rather than the name itself.
   *  - METRIC_CUSTOM: custom[customField] of the series' metric UID
   *  - TAGK_CUSTOM: custom[customField] of the tag KEY named `field`
   *    (only when the series carries that tag)
   *  - TAGV_CUSTOM: custom[customField] of the VALUE of tag `field`
   *
   * `uidMeta` rows: (kind ∈ metric/tagk/tagv, name, custom map). Each
   * custom rule adds one broadcast-able left join keyed on the
   * rule's source name — meta is name-cardinality, the series frame
   * streams. Where the reference throws per-series on a null custom
   * value, a columnar plan prunes (null) instead — its TESTING-mode
   * behavior — since a vectorized operator cannot throw per row.
   */
  def withCustomSources(series: DataFrame, rules: Seq[Rule],
                        uidMeta: DataFrame): DataFrame =
    rules.filter(isCustom).foldLeft(series) { (s, r) =>
      val kind = r.ruleType.toUpperCase match {
        case "METRIC_CUSTOM" => "metric"
        case "TAGK_CUSTOM"   => "tagk"
        case "TAGV_CUSTOM"   => "tagv"
      }
      val key = r.ruleType.toUpperCase match {
        case "METRIC_CUSTOM" => col("metric")
        case "TAGK_CUSTOM"   => lit(r.field)
        case "TAGV_CUSTOM"   => col("tags").getItem(r.field)
      }
      val outCol = s"__custom_${r.level}_${r.order}"
      val m = uidMeta.filter(col("kind") === kind)
        .select(col("name").as("__mname"),
          element_at(col("custom"), r.customField).as(outCol))
      val joined = s.join(broadcast(m), key === col("__mname"), "left")
        .drop("__mname")
      // TAGK_CUSTOM matches the key's meta, but only applies to
      // series that actually carry the tag
      if (r.ruleType.toUpperCase == "TAGK_CUSTOM")
        joined.withColumn(outCol,
          when(col("tags").getItem(r.field).isNotNull, col(outCol)))
      else joined
    }

  /** The rules table schema-bearer: an empty Dataset[Rule]. */
  def emptyRules(spark: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import spark.implicits._
    spark.emptyDataset[Rule].toDF()
  }

  /** TreeRule.stringToType (src/tree/TreeRule.java:478-494):
    * case-insensitive accepted names — note there is NO plain TAGV
    * type; errors verbatim. */
  def stringToType(t: String): String = {
    if (t == null || t.isEmpty)
      throw new IllegalArgumentException("Rule type was empty")
    t.toLowerCase match {
      case "metric" => "METRIC"
      case "metric_custom" => "METRIC_CUSTOM"
      case "tagk" => "TAGK"
      case "tagk_custom" => "TAGK_CUSTOM"
      case "tagv_custom" => "TAGV_CUSTOM"
      case _ => throw new IllegalArgumentException("Unrecognized rule type")
    }
  }

  /** TreeRule.validateRule + the id gates shared by fetch/store/delete
    * (src/tree/TreeRule.java:252-254, 346-360, validateRule body):
    * tree ids are 16-bit nonzero, TAGK and every *_CUSTOM type require
    * `field`, custom types additionally `customField`; a non-empty
    * regex must compile (setRegex) and its group index be ≥ 0. */
  def validateRule(r: Rule): Unit = {
    if (r.treeId < 1 || r.treeId > 65535)
      throw new IllegalArgumentException("Invalid Tree ID")
    if (r.level < 0) throw new IllegalArgumentException("Invalid rule level")
    if (r.order < 0) throw new IllegalArgumentException("Invalid rule order")
    val t = stringToType(r.ruleType)
    t match {
      case "METRIC" =>
      case "METRIC_CUSTOM" | "TAGK_CUSTOM" | "TAGV_CUSTOM" =>
        if (r.field == null || r.field.isEmpty)
          throw new IllegalArgumentException(
            s"Missing field name required for $t rule")
        if (r.customField == null || r.customField.isEmpty)
          throw new IllegalArgumentException(
            s"Missing custom field name required for $t rule")
      case "TAGK" =>
        if (r.field == null || r.field.isEmpty)
          throw new IllegalArgumentException(
            s"Missing field name required for $t rule")
    }
    if (r.regex.nonEmpty)
      java.util.regex.Pattern.compile(r.regex) // PatternSyntaxException
    if (r.regexGroup < 0) throw new IllegalArgumentException(
      "Invalid regex group index. Cannot be less than 0")
  }

  /** Create-or-replace a rule; identity = (treeId, level, order) —
    * the reference's POST /api/tree/rule upsert (TreeRpc.handleRule →
    * TreeRule.syncToStorage, which validates before the CAS). */
  def upsertRule(table: DataFrame, rule: Rule): DataFrame = {
    validateRule(rule)
    val spark = table.sparkSession
    import spark.implicits._
    table.filter(!(col("treeId") === rule.treeId &&
        col("level") === rule.level && col("order") === rule.order))
      .unionByName(Seq(rule).toDS().toDF())
  }

  /** DELETE /api/tree/rule by identity. */
  def deleteRule(table: DataFrame, treeId: Int, level: Int,
                 order: Int): DataFrame =
    table.filter(!(col("treeId") === treeId &&
      col("level") === level && col("order") === order))

  /** A tree's stored rules, materialized and ordered. Rules are
    * admin-authored (a handful of rows), so the collect is
    * wire-sized — never data-sized. */
  def rulesFor(table: DataFrame, treeId: Int): Seq[Rule] = {
    val spark = table.sparkSession
    import spark.implicits._
    table.filter(col("treeId") === treeId).as[Rule].collect()
      .sortBy(r => (r.level, r.order)).toSeq
  }

  /** Build a tree from its STORED rules: per level, rules apply in
    * `order` with first-non-null-wins (the reference's intra-level
    * fallback chain), then the level columns feed [[build]]. Custom
    * rule types require `uidMeta` (see [[withCustomSources]]). */
  def buildFromRules(series: DataFrame, rulesTable: DataFrame,
                     treeId: Int,
                     uidMeta: Option[DataFrame] = None,
                     strictMatch: Boolean = false): DataFrame = {
    val rules = rulesFor(rulesTable, treeId)
    require(rules.nonEmpty, s"tree $treeId has no rules")
    require(uidMeta.isDefined || !rules.exists(isCustom),
      s"tree $treeId has *_CUSTOM rules but no uidMeta table was given")
    val prepared = uidMeta match {
      case Some(m) => withCustomSources(series, rules, m)
      case None => series
    }
    val levels = rules.groupBy(_.level).toSeq.sortBy(_._1).map {
      case (_, rs) => coalesce(rs.sortBy(_.order).map(compileRule): _*)
    }
    build(prepared, levels, strictMatch)
  }

  /** `tsd treesync` (reference src/tools/UidManager.java:1102 →
    * TreeSync): rebuild EVERY tree that has rules, one
    * [[buildFromRules]] pass per tree, branches labeled by tree_id.
    * The reference walks all TSMeta through every enabled tree's rule
    * set; here each tree is one distributed build over the series
    * table and the union is the synced branch store. */
  def syncAll(series: DataFrame, rulesTable: DataFrame,
              uidMeta: Option[DataFrame] = None,
              strictMatch: Boolean = false): DataFrame = {
    val ids = rulesTable.select("treeId").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(ids.nonEmpty, "no trees have rules")
    ids.map { id =>
      buildFromRules(series, rulesTable, id, uidMeta, strictMatch)
        .withColumn("tree_id", lit(id))
    }.reduce(_ unionByName _)
  }

  /** `tsd treepurge <id> [definition]` (reference
    * src/tools/UidManager.java:1149 → TreeSync.purgeTree): drop one
    * tree's branches, and with `deleteDefinition` its rule rows too.
    * Returns (branches', rules'). */
  def purge(branches: DataFrame, rulesTable: DataFrame, treeId: Int,
            deleteDefinition: Boolean = false): (DataFrame, DataFrame) =
    (branches.filter(col("tree_id") =!= treeId),
      if (deleteDefinition) rulesTable.filter(col("treeId") =!= treeId)
      else rulesTable)

  /** The reference's per-rule log/trace tag (TreeRule.toString,
    * src/tree/TreeRule.java:227: `[tree:level:order:TYPE]`). */
  private def ruleTag(r: Rule): String =
    s"[${r.treeId}:${r.level}:${r.order}:${r.ruleType.toUpperCase}]"

  /** Default human-readable TSUID surrogate: metric + sorted k=v tag
    * pairs (null tag values render as `-`). Deterministic in any SQL
    * engine, unlike the xxhash64 series_id. */
  def canonicalTsuid: Column =
    concat_ws("|", col("metric"),
      concat_ws(",", transform(array_sort(map_entries(col("tags"))),
        e => concat(e.getField("key"), lit("="),
          coalesce(e.getField("value"), lit("-"))))))

  /** The tree plus the two failure side-channels the reference stores
    * next to it (src/tree/Tree.java:64-68, TreeBuilder.java:48). */
  case class BuildReport(tree: DataFrame, collisions: DataFrame,
                         notMatched: DataFrame)

  /**
   * [[buildFromRules]] plus the side outputs a user debugging tree
   * rules reaches for (reference `/api/tree/collisions|notmatched`,
   * src/tsd/TreeRpc.java; recorded via Tree.addCollision /
   * addNotMatched):
   *
   *  - `collisions` (tsuid, existing_tsuid, path): series whose
   *    full-depth path equals another series' path — the reference's
   *    leaf-hash collision (Branch.addLeaf, src/tree/Branch.java:
   *    238-252). The reference keeps whichever TSUID its meta sync
   *    happened to process first; a relational build has no arrival
   *    order, so the winner is the MIN tsuid — deterministic and
   *    re-run-stable.
   *  - `notMatched` (tsuid, message): series with no value at one or
   *    more levels; the message space-joins the failed levels' rule
   *    tags exactly as TreeBuilder accumulates them
   *    (`not_matched += " " + rule`, TreeBuilder.java:647-650 — the
   *    LAST rule tried on the failed level).
   *
   * The reference flushes not-matched only under strict_match +
   * store-failures; here both channels are always computed and the
   * caller decides what to persist. Both are grouped/joined on the
   * full path — one shuffle each, no pair joins, scale-safe.
   */
  def buildReport(series: DataFrame, rulesTable: DataFrame, treeId: Int,
                  uidMeta: Option[DataFrame] = None,
                  strictMatch: Boolean = false,
                  tsuid: Column = canonicalTsuid): BuildReport = {
    val rules = rulesFor(rulesTable, treeId)
    require(rules.nonEmpty, s"tree $treeId has no rules")
    require(uidMeta.isDefined || !rules.exists(isCustom),
      s"tree $treeId has *_CUSTOM rules but no uidMeta table was given")
    val prepared = uidMeta match {
      case Some(m) => withCustomSources(series, rules, m)
      case None => series
    }
    val byLevel = rules.groupBy(_.level).toSeq.sortBy(_._1)
    val levelCols = byLevel.map { case (_, rs) =>
      coalesce(rs.sortBy(_.order).map(compileRule): _*) }
    val lastRuleTags = byLevel.map { case (_, rs) =>
      ruleTag(rs.sortBy(_.order).last) }
    val n = levelCols.length
    val leveled = prepared
      .select(tsuid.as("__tsuid") +:
        levelCols.zipWithIndex.map { case (c, i) => c.as(s"__l$i") }: _*)
      .distinct()
    val fullDepth = (0 until n).map(i => col(s"__l$i").isNotNull)
      .reduce(_ && _)
    val notMatched = leveled.filter(!fullDepth)
      .select(col("__tsuid").as("tsuid"),
        concat_ws(" ", (0 until n).map(i =>
          when(col(s"__l$i").isNull, lit(lastRuleTags(i)))): _*)
          .as("message"))
    val full = leveled.filter(fullDepth)
      .withColumn("path",
        concat_ws("/", (0 until n).map(i => escapeElem(col(s"__l$i"))): _*))
    val winners = full.groupBy("path")
      .agg(min(col("__tsuid")).as("existing_tsuid"))
    val collisions = full.join(winners, Seq("path"))
      .filter(col("__tsuid") =!= col("existing_tsuid"))
      .select(col("__tsuid").as("tsuid"), col("existing_tsuid"), col("path"))
    BuildReport(build(prepared, levelCols, strictMatch), collisions,
      notMatched)
  }

  /**
   * Branch + leaf store for `/api/tree/branch` browsing (reference
   * Branch/Leaf rows, src/tree/Branch.java:88, Leaf.java:60): branches
   * are the adjacency nodes ABOVE the leaf level (depth 1..n-1 — the
   * reference materializes the final rule level as LEAVES on the
   * depth-(n-1) branch, not as branches), leaves are one row per
   * full-depth series keyed by the parent branch's path and carrying
   * the reference Leaf fields (displayName, tsuid, metric, tags —
   * Leaf.java:60-86). Leaf collisions on (branch, displayName) keep
   * the MIN tsuid — the same deterministic winner as [[buildReport]].
   * One shuffle each; both frames are (tree_id, path)-addressable so
   * browse lookups are pushed-down scans, never table collects.
   */
  def buildBranchStore(series: DataFrame, rulesTable: DataFrame,
                       treeId: Int,
                       uidMeta: Option[DataFrame] = None,
                       strictMatch: Boolean = false,
                       tsuid: Column = canonicalTsuid)
      : (DataFrame, DataFrame) = {
    val rules = rulesFor(rulesTable, treeId)
    require(rules.nonEmpty, s"tree $treeId has no rules")
    require(uidMeta.isDefined || !rules.exists(isCustom),
      s"tree $treeId has *_CUSTOM rules but no uidMeta table was given")
    val prepared = uidMeta match {
      case Some(m) => withCustomSources(series, rules, m)
      case None => series
    }
    val byLevel = rules.groupBy(_.level).toSeq.sortBy(_._1)
    val levelCols = byLevel.map { case (_, rs) =>
      coalesce(rs.sortBy(_.order).map(compileRule): _*) }
    val n = levelCols.length
    val branches = build(prepared, levelCols, strictMatch)
      .filter(col("depth") < n)
      .withColumn("tree_id", lit(treeId))
    val full = prepared
      .select(Seq(tsuid.as("tsuid"), col("metric"), col("tags")) ++
        levelCols.zipWithIndex.map { case (c, i) => c.as(s"__l$i") }: _*)
      .filter((0 until n).map(i => col(s"__l$i").isNotNull).reduce(_ && _))
      .withColumn("branch_path",
        if (n == 1) lit("")
        else concat_ws("/",
          (0 until n - 1).map(i => escapeElem(col(s"__l$i"))): _*))
      .withColumn("display_name", col(s"__l${n - 1}"))
    val leaves = full.groupBy("branch_path", "display_name")
      .agg(min_by(struct(col("tsuid"), col("metric"), col("tags")),
        col("tsuid")).as("__w"))
      .select(lit(treeId).as("tree_id"), col("branch_path"),
        col("display_name"), col("__w.tsuid").as("tsuid"),
        col("__w.metric").as("metric"), col("__w.tags").as("tags"))
    (branches, leaves)
  }

  /**
   * `/api/tree/test` — run series through a tree's rules WITHOUT
   * storing, returning the per-rule trace the reference's testing mode
   * compiles (TreeBuilder.testMessage / TreeRpc handleTest): one row
   * per (series, rule) with the extracted value, whether the rule was
   * even tried (an earlier-order rule on the level already matched —
   * "rules on a given level are ORd", TreeBuilder.java:637-641), and
   * whether it matched.
   */
  def testRun(series: DataFrame, rulesTable: DataFrame, treeId: Int,
              uidMeta: Option[DataFrame] = None,
              tsuid: Column = canonicalTsuid): DataFrame = {
    val rules = rulesFor(rulesTable, treeId)
    require(rules.nonEmpty, s"tree $treeId has no rules")
    val prepared = uidMeta match {
      case Some(m) => withCustomSources(series, rules, m)
      case None => series
    }
    val base = prepared
      .select(tsuid.as("__tsuid") +:
        rules.zipWithIndex.map { case (r, i) => compileRule(r).as(s"__v$i") }: _*)
      .distinct()
    rules.zipWithIndex.map { case (r, i) =>
      // tried ⇔ every earlier-order rule on the same level missed
      val earlier = rules.zipWithIndex.filter { case (e, _) =>
        e.level == r.level && e.order < r.order }
      val tried = earlier.map { case (_, j) => col(s"__v$j").isNull }
        .foldLeft(lit(true))(_ && _)
      base.select(
        col("__tsuid").as("tsuid"),
        lit(r.level).as("level"),
        lit(r.order).as("order"),
        lit(ruleTag(r)).as("rule"),
        col(s"__v$i").as("value"),
        tried.as("tried"),
        (tried && col(s"__v$i").isNotNull).as("matched"))
    }.reduce(_ unionByName _)
  }

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
  def build(series: DataFrame, rules: Seq[Column],
            strictMatch: Boolean = false): DataFrame = {
    val withId = if (series.columns.contains("series_id")) series
                 else graft.model.Points.withSeriesId(series)
    // distinct on (series hash, levels) — a map column is not a valid
    // set-operation key, the hash is
    val leveled0 = withId.select(
      col("series_id") +:
        rules.zipWithIndex.map { case (r, i) => r.as(s"__l$i") }: _*)
      .distinct()
    // strict matching (reference Tree.strict_match, src/tree/Tree.java
    // :107): a series failing ANY level is excluded from the tree
    // entirely, instead of contributing to the levels it did match
    val leveled =
      if (strictMatch)
        leveled0.filter(rules.indices
          .map(i => col(s"__l$i").isNotNull).reduce(_ && _))
      else leveled0
    val paths = (1 to rules.length).map { depth =>
      val lvls = (0 until depth).map(i => col(s"__l$i"))
      val esc = lvls.map(escapeElem)
      leveled
        .filter(lvls.map(_.isNotNull).reduce(_ && _))
        .groupBy(lvls: _*)
        .agg(countDistinct(col("series_id")).as("leaves"))
        .select(
          lit(depth).as("depth"),
          concat_ws("/", esc: _*).as("path"),
          lvls.last.as("name"),
          (if (depth == 1) lit("") else concat_ws("/", esc.dropRight(1): _*))
            .as("parent"),
          col("leaves"))
    }
    paths.reduce(_ unionByName _)
  }
}
