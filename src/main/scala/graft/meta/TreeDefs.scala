package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/**
 * Tree-DEFINITION storage + the `/api/tree` endpoint family
 * (reference src/tsd/TreeRpc.java:92-520 over src/tree/Tree.java) —
 * the CRUD layer a tree user hits before anything else: tree
 * definitions (name/description/notes/strict_match/enabled/
 * store_failures), rule CRUD with the fetch-copy-save merge and
 * not-modified contract, bulk rules replace, and hex-addressed
 * `/api/tree/branch` browsing.
 *
 * Storage model: tree definitions are one admin-sized DataFrame
 * (`treeId` unique); branches/leaves are the distributed frames
 * [[Trees.buildBranchStore]] produces. The reference's CAS discipline
 * (storeTree/syncToStorage fetch, copyChanges, compare-and-set —
 * Tree.java:312-375, TreeRule.java:250-320) maps to pure
 * fetch-merge-replace over immutable frames: same observable merge
 * semantics, no in-flight races to guard. Error texts are the
 * reference's, verbatim; per repo convention IllegalArgumentException
 * is the 400 mapping, NoSuchElementException the 404 and
 * IllegalStateException the 304.
 */
object TreeDefs {

  // ------------------------------------------------------------------
  // Tree definition model (reference Tree POJO, src/tree/Tree.java:96-129)
  // ------------------------------------------------------------------

  /** One stored tree definition. Defaults mirror the reference's
    * zero-arg POJO (empty strings, false flags, created 0). */
  case class TreeDef(treeId: Int = 0, name: String = "",
                     description: String = "", notes: String = "",
                     strictMatch: Boolean = false, enabled: Boolean = false,
                     storeFailures: Boolean = false, created: Long = 0L)

  /** The tree-definitions table schema-bearer. */
  def emptyTrees(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[TreeDef].toDF()
  }

  /** Tree.fetchTree (src/tree/Tree.java:470-533): the 16-bit id gate,
    * then the single definition row (None when absent). */
  def fetchTree(table: DataFrame, treeId: Int): Option[TreeDef] = {
    if (treeId < 1 || treeId > 65535)
      throw new IllegalArgumentException("Invalid Tree ID")
    val spark = table.sparkSession
    import spark.implicits._
    table.filter(col("treeId") === treeId).as[TreeDef].collect().headOption
  }

  /** Tree.fetchAllTrees (:535-628) — admin-sized collect, id order. */
  def fetchAllTrees(table: DataFrame): Seq[TreeDef] = {
    val spark = table.sparkSession
    import spark.implicits._
    table.as[TreeDef].collect().sortBy(_.treeId).toSeq
  }

  /** Tree.copyChanges (:202-240): each user-mutable field copies when
    * the overwrite flag is up OR the local tree flagged it changed.
    * Unlike TreeRule's, this copy does NOT compare values — the caller
    * already gated on an empty change set. */
  def copyChanges(stored: TreeDef, local: TreeDef, changed: Set[String],
                  overwrite: Boolean): TreeDef = {
    if (stored.treeId != local.treeId)
      throw new IllegalArgumentException("Tree IDs do not match")
    def pick[A](field: String, s: A, l: A): A =
      if (overwrite || changed(field)) l else s
    stored.copy(
      name = pick("name", stored.name, local.name),
      description = pick("description", stored.description,
        local.description),
      notes = pick("notes", stored.notes, local.notes),
      strictMatch = pick("strict_match", stored.strictMatch,
        local.strictMatch),
      enabled = pick("enabled", stored.enabled, local.enabled),
      storeFailures = pick("store_failures", stored.storeFailures,
        local.storeFailures))
  }

  /** Tree.storeTree (:312-375): id gate, the no-changes 304, then
    * fetch-merge-replace (new row when absent). Returns the updated
    * definitions table. */
  def storeTree(table: DataFrame, local: TreeDef, changed: Set[String],
                overwrite: Boolean): DataFrame = {
    if (local.treeId < 1 || local.treeId > 65535)
      throw new IllegalArgumentException("Invalid Tree ID")
    if (changed.isEmpty)
      throw new IllegalStateException("No changes detected in the tree")
    val stored = fetchTree(table, local.treeId)
    val merged = stored match {
      case None => local
      case Some(s) => copyChanges(s, local, changed, overwrite)
    }
    replaceRow(table, merged)
  }

  /** Tree.createNewTree (:407-463): id must be unassigned, name
    * required, max+1 allocation behind the 16-bit gate. Returns the
    * updated table and the assigned id. */
  def createNewTree(table: DataFrame, local: TreeDef, changed: Set[String],
                    now: Long = System.currentTimeMillis() / 1000L)
      : (DataFrame, Int) = {
    if (local.treeId > 0)
      throw new IllegalArgumentException("Tree ID has already been set")
    if (local.name == null || local.name.isEmpty)
      throw new IllegalArgumentException("Tree was missing the name")
    val maxId = fetchAllTrees(table).lastOption.map(_.treeId).getOrElse(0)
    val id = maxId + 1
    if (id > 65535)
      throw new IllegalStateException("Exhausted all Tree IDs")
    val assigned = local.copy(treeId = id, created = now)
    (storeTree(table, assigned, changed + "name", overwrite = true), id)
  }

  private def replaceRow(table: DataFrame, row: TreeDef): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    table.filter(col("treeId") =!= row.treeId)
      .unionByName(Seq(row).toDS().toDF())
  }

  // ------------------------------------------------------------------
  // Tree / rule parsing (TreeRpc.parseTree:571-616, parseRule:625-691)
  // ------------------------------------------------------------------

  private val mapper = new ObjectMapper()

  /** TreeRpc.parseTreeId (:698-715): absent → 0 unless required. */
  def parseTreeId(qs: Map[String, String], required: Boolean): Int =
    qs.get("treeid") match {
      case Some(v) =>
        try v.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException("Unable to parse 'tree' value")
        }
      case None if required => throw new IllegalArgumentException(
        "Missing parameter <code>treeid</code>")
      case None => 0
    }

  /** Query-string tree parse (TreeRpc.parseTree): a param's presence
    * flags its field changed (the POJO setters' changed map). */
  def parseTreeQs(qs: Map[String, String]): (TreeDef, Set[String]) = {
    var t = TreeDef(treeId = parseTreeId(qs, required = false))
    var changed = Set.empty[String]
    qs.get("name").foreach { v => t = t.copy(name = v); changed += "name" }
    qs.get("description").foreach { v =>
      t = t.copy(description = v); changed += "description" }
    qs.get("notes").foreach { v => t = t.copy(notes = v); changed += "notes" }
    qs.get("strict_match").foreach { v =>
      t = t.copy(strictMatch = v.toLowerCase == "true")
      changed += "strict_match" }
    qs.get("enabled").foreach { v =>
      t = t.copy(enabled = v.toLowerCase == "true"); changed += "enabled" }
    qs.get("store_failures").foreach { v =>
      t = t.copy(storeFailures = v.toLowerCase == "true")
      changed += "store_failures" }
    (t, changed)
  }

  /** JSON body tree parse (parseTreeV1 → the Tree POJO's setters). */
  def parseTreeJson(body: String): (TreeDef, Set[String]) = {
    val n = mapper.readTree(body)
    var t = TreeDef(treeId = if (n.hasNonNull("treeId"))
      n.get("treeId").asInt() else 0)
    var changed = Set.empty[String]
    if (n.hasNonNull("name")) {
      t = t.copy(name = n.get("name").asText()); changed += "name" }
    if (n.hasNonNull("description")) {
      t = t.copy(description = n.get("description").asText())
      changed += "description" }
    if (n.hasNonNull("notes")) {
      t = t.copy(notes = n.get("notes").asText()); changed += "notes" }
    if (n.hasNonNull("strictMatch")) {
      t = t.copy(strictMatch = n.get("strictMatch").asBoolean())
      changed += "strict_match" }
    if (n.hasNonNull("enabled")) {
      t = t.copy(enabled = n.get("enabled").asBoolean())
      changed += "enabled" }
    if (n.hasNonNull("storeFailures")) {
      t = t.copy(storeFailures = n.get("storeFailures").asBoolean())
      changed += "store_failures" }
    (t, changed)
  }

  /** Query-string rule parse (TreeRpc.parseRule:625-691): level and
    * order are REQUIRED params, type/regex/regex_group_idx parse
    * failures get the reference's wrapped texts, and each setter only
    * flags `changed` when the value differs from the POJO default
    * (TreeRule setters, src/tree/TreeRule.java:649-752 — which is why
    * `?treeid=1&level=1&order=0&method_override=post` on a stored rule
    * is a 304: level/order never survive copyChanges). */
  def parseRuleQs(qs: Map[String, String]): (Trees.Rule, Set[String]) = {
    val treeId = parseTreeId(qs, required = true)
    def requiredInt(p: String): Int = qs.get(p) match {
      case None => throw new IllegalArgumentException(
        s"Missing parameter <code>$p</code>")
      case Some(v) => try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"Unable to parse the '$p' parameter")
      }
    }
    val level = requiredInt("level")
    if (level < 0)
      throw new IllegalArgumentException("Negative levels are not allowed")
    val order = requiredInt("order")
    var changed = Set.empty[String]
    if (level != 0) changed += "level"
    if (order != 0) changed += "order"
    val ruleType = qs.get("type").map { v =>
      changed += "type"
      try Trees.stringToType(v) catch {
        case _: IllegalArgumentException => throw new IllegalArgumentException(
          "Unable to parse the 'type' parameter")
      }
    }.getOrElse("")
    def str(p: String, flag: String): String = qs.get(p) match {
      case Some(v) => if (v.nonEmpty) changed += flag; v
      case None => ""
    }
    val field = str("field", "field")
    val customField = str("custom_field", "custom_field")
    val regex = qs.get("regex").map { v =>
      changed += "regex"
      try { java.util.regex.Pattern.compile(v); v } catch {
        case _: java.util.regex.PatternSyntaxException =>
          throw new IllegalArgumentException(
            "Unable to parse the 'regex' parameter")
      }
    }.getOrElse("")
    val separator = str("separator", "separator")
    val description = str("description", "description")
    val notes = str("notes", "notes")
    val displayFormat = str("display_format", "display_format")
    val regexGroup = qs.get("regex_group_idx").map { v =>
      val i = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          "Unable to parse the 'regex_group_idx' parameter")
      }
      if (i != 0) changed += "regex_group_idx"
      i
    }.getOrElse(0)
    (Trees.Rule(treeId, level, order, ruleType, field = field,
      separator = separator, regex = regex, regexGroup = regexGroup,
      description = description, customField = customField, notes = notes,
      displayFormat = displayFormat), changed)
  }

  /** JSON body rule parse (parseTreeRuleV1 → the POJO setters, same
    * changed-map semantics as the query-string path). */
  def parseRuleJson(body: String): (Trees.Rule, Set[String]) =
    parseRuleNode(mapper.readTree(body))

  private def parseRuleNode(
      n: com.fasterxml.jackson.databind.JsonNode): (Trees.Rule, Set[String]) = {
    var changed = Set.empty[String]
    val treeId = if (n.hasNonNull("treeId")) n.get("treeId").asInt() else 0
    val level = if (n.hasNonNull("level")) n.get("level").asInt() else 0
    if (level < 0)
      throw new IllegalArgumentException("Negative levels are not allowed")
    val order = if (n.hasNonNull("order")) n.get("order").asInt() else 0
    if (level != 0) changed += "level"
    if (order != 0) changed += "order"
    val ruleType = if (n.hasNonNull("type")) {
      changed += "type"; Trees.stringToType(n.get("type").asText())
    } else ""
    def str(p: String, flag: String): String =
      if (n.hasNonNull(p)) {
        val v = n.get(p).asText(); if (v.nonEmpty) changed += flag; v
      } else ""
    val field = str("field", "field")
    val customField = str("customField", "custom_field")
    val regex = str("regex", "regex")
    if (regex.nonEmpty) java.util.regex.Pattern.compile(regex)
    val separator = str("separator", "separator")
    val description = str("description", "description")
    val notes = str("notes", "notes")
    val displayFormat = str("displayFormat", "display_format")
    val regexGroup = if (n.hasNonNull("regexGroupIdx")) {
      val i = n.get("regexGroupIdx").asInt()
      if (i != 0) changed += "regex_group_idx"; i
    } else 0
    (Trees.Rule(treeId, level, order, ruleType, field = field,
      separator = separator, regex = regex, regexGroup = regexGroup,
      description = description, customField = customField, notes = notes,
      displayFormat = displayFormat), changed)
  }

  // ------------------------------------------------------------------
  // Rule sync (TreeRule.copyChanges:162-235, syncToStorage:250-320,
  // validateRule:542-578)
  // ------------------------------------------------------------------

  /** TreeRule.toString (:227): `[tree:level:order:TYPE]`, a never-set
    * type printing as the POJO's null. */
  def ruleToString(r: Trees.Rule): String =
    s"[${r.treeId}:${r.level}:${r.order}:" +
      s"${if (r.ruleType.isEmpty) "null" else r.ruleType.toUpperCase}]"

  /** TreeRule.copyChanges: identity must match; each field copies when
    * overwriting OR (flagged changed AND actually different). Returns
    * (merged, anyFieldCopied). `component` rides with `separator` —
    * it parameterizes the same split step. */
  def copyRuleChanges(stored: Trees.Rule, local: Trees.Rule,
                      changed: Set[String], overwrite: Boolean)
      : (Trees.Rule, Boolean) = {
    if (stored.treeId != local.treeId)
      throw new IllegalArgumentException("Tree IDs do not match")
    if (stored.level != local.level)
      throw new IllegalArgumentException("Levels do not match")
    if (stored.order != local.order)
      throw new IllegalArgumentException("Orders do not match")
    var any = false
    def pick[A](field: String, s: A, l: A): A =
      if (overwrite || (changed(field) && s != l)) { any = true; l } else s
    val merged = stored.copy(
      ruleType = pick("type", stored.ruleType, local.ruleType),
      field = pick("field", stored.field, local.field),
      customField = pick("custom_field", stored.customField,
        local.customField),
      regex = pick("regex", stored.regex, local.regex),
      separator = pick("separator", stored.separator, local.separator),
      component = pick("separator", stored.component, local.component),
      description = pick("description", stored.description,
        local.description),
      notes = pick("notes", stored.notes, local.notes),
      regexGroup = pick("regex_group_idx", stored.regexGroup,
        local.regexGroup),
      displayFormat = pick("display_format", stored.displayFormat,
        local.displayFormat))
    (merged, any)
  }

  /** TreeRule.validateRule (:542-578) — the STORE-time validation with
    * its own texts (distinct from the parse layer's stringToType
    * texts). The reference's regex guard `(regex != null ||
    * !regex.isEmpty())` is vacuously true, so the group-index check
    * always applies — transcribed as written. */
  def validateStoredRule(r: Trees.Rule): Unit = {
    if (r.ruleType == null || r.ruleType.isEmpty)
      throw new IllegalArgumentException("Missing rule type")
    val t = r.ruleType.toUpperCase
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
      case _ => throw new IllegalArgumentException("Invalid rule type")
    }
    if (r.regexGroup < 0)
      throw new IllegalArgumentException(
        "Invalid regex group index. Cannot be less than 0")
  }

  /** A stored rule by identity (TreeRule.fetchRule gates). */
  def fetchRule(rules: DataFrame, treeId: Int, level: Int,
                order: Int): Option[Trees.Rule] = {
    if (treeId < 1 || treeId > 65535)
      throw new IllegalArgumentException("Invalid Tree ID")
    if (level < 0) throw new IllegalArgumentException("Invalid rule level")
    if (order < 0) throw new IllegalArgumentException("Invalid rule order")
    val spark = rules.sparkSession
    import spark.implicits._
    rules.filter(col("treeId") === treeId && col("level") === level &&
      col("order") === order).as[Trees.Rule].collect().headOption
  }

  /** TreeRule.syncToStorage (:250-320): id gate, the local no-changes
    * 304, fetch-merge (copyChanges deciding a second 304 on identical
    * values), store-time validation, replace. */
  def syncRule(rules: DataFrame, local: Trees.Rule, changed: Set[String],
               overwrite: Boolean): DataFrame = {
    if (local.treeId < 1 || local.treeId > 65535)
      throw new IllegalArgumentException("Invalid Tree ID")
    if (changed.isEmpty)
      throw new IllegalStateException("No changes detected in the rule")
    val stored = fetchRule(rules, local.treeId, local.level, local.order)
    val merged = stored match {
      case None => local
      case Some(s) =>
        val (m, any) = copyRuleChanges(s, local, changed, overwrite)
        if (!any)
          throw new IllegalStateException("No changes detected in the rule")
        m
    }
    validateStoredRule(merged)
    val spark = rules.sparkSession
    import spark.implicits._
    rules.filter(!(col("treeId") === merged.treeId &&
        col("level") === merged.level && col("order") === merged.order))
      .unionByName(Seq(merged).toDS().toDF())
  }

  // ------------------------------------------------------------------
  // Branch id codec (Branch.compileBranchId:268-307, stringToId:595-608,
  // idToString:585-587; Tree.idToBytes:942-948, bytesToId:959-969)
  // ------------------------------------------------------------------

  /** Tree.idToBytes: 2-byte big-endian tree id behind the 16-bit gate. */
  def treeIdToBytes(treeId: Int): Array[Byte] = {
    if (treeId < 1 || treeId > 65535)
      throw new IllegalArgumentException("Missing or invalid tree ID")
    Array(((treeId >> 8) & 0xFF).toByte, (treeId & 0xFF).toByte)
  }

  /** Tree.bytesToId: the first 2 bytes of any branch row key. */
  def bytesToTreeId(rowKey: Array[Byte]): Int = {
    if (rowKey.length < 2)
      throw new IllegalArgumentException("Row key was less than 2 in length")
    ((rowKey(0) & 0xFF) << 8) | (rowKey(1) & 0xFF)
  }

  /** Branch.idToString: upper-case hex. */
  def idToString(id: Array[Byte]): String =
    id.map(b => f"${b & 0xFF}%02X").mkString

  /** Branch.stringToId: empty/short gates, odd length 0-padded LEFT. */
  def stringToId(hex: String): Array[Byte] = {
    if (hex == null || hex.isEmpty)
      throw new IllegalArgumentException("Branch ID was empty")
    if (hex.length < 4)
      throw new IllegalArgumentException("Branch ID was too short")
    val padded = if (hex.length % 2 != 0) "0" + hex else hex
    padded.grouped(2).map(s => Integer.parseInt(s, 16).toByte).toArray
  }

  /** Branch.compileBranchId as hex: 2-byte tree id then one 4-byte
    * `String.hashCode` per NON-ROOT path element (the root is skipped
    * to keep row keys short — Branch.java:296-299). */
  def branchIdHex(treeId: Int, path: Seq[String]): String =
    idToString(treeIdToBytes(treeId)) +
      path.map(e => f"${e.hashCode}%08X").mkString

  // ------------------------------------------------------------------
  // Branch browsing
  // ------------------------------------------------------------------

  /** Decoded branch address: tree id + the path-element hash chain. */
  private def decodeBranchId(hex: String): (Int, Seq[Int], String) = {
    val bytes = stringToId(hex)
    val treeId = bytesToTreeId(bytes)
    val rest = bytes.drop(2)
    val rendered = idToString(bytes)
    if (rest.length % 4 != 0)
      throw new NoSuchElementException(
        s"Unable to locate branch '$rendered' for tree '$treeId'")
    val hashes = rest.grouped(4).map(g =>
      ((g(0) & 0xFF) << 24) | ((g(1) & 0xFF) << 16) |
        ((g(2) & 0xFF) << 8) | (g(3) & 0xFF)).toSeq
    (treeId, hashes, rendered)
  }

  /** The hash-chain match column: a branch row whose path elements
    * hash (java String.hashCode, the reference's row-key hash) to the
    * requested chain. Stored elements are %-escaped ("/" is a legal
    * reference name character) so the split is boundary-exact; the
    * hash runs over the UNESCAPED element — Branch.compileBranchId
    * hashes whole raw names. Pushed-down depth/tree filters keep this
    * a narrow scan; hash + replace run in whole-stage codegen
    * ([[graft.functions.JavaHashCode]]). */
  private def hashChainMatches(hashes: Seq[Int]) =
    transform(split(col("path"), "/"),
      e => graft.functions.JavaHashCode(Trees.unescapeElem(e))) ===
      lit(hashes.toArray)

  /**
   * Hex-addressed branch browse, relational form: one row per child
   * branch and per leaf of the addressed branch (reference
   * Branch.fetchBranch loads the branch, its leaves, and its
   * one-level-down child branches — src/tree/Branch.java:426-553).
   * A hex of just the tree id (or none + treeid param) addresses the
   * ROOT branch. Output: (branch, kind, display_name, path, tsuid,
   * metric) ordered (kind, display_name); child-branch rows carry the
   * node's series count in no column — browse is navigation, counts
   * live on the branches frame itself.
   */
  def browseRows(branches: DataFrame, leaves: DataFrame,
                 branchHex: String,
                 trees: Option[DataFrame] = None): DataFrame = {
    val (treeId, hashes, rendered) = decodeBranchId(branchHex)
    val targetPath: String =
      if (hashes.isEmpty) {
        // a root browse of a tree with no stored branches is a 404,
        // not a silent empty frame — the reference's fetchBranch finds
        // no root row for a tree that never built (TreeRpc 404s it).
        // Passing `trees` opts into branchDoc's LENIENT divergence
        // (the virtual root is addressable for any DEFINED tree, built
        // or not); without it, defined-but-never-built trees 404 like
        // the reference.
        if (trees.forall(t => fetchTree(t, treeId).isEmpty) &&
            branches.filter(col("tree_id") === treeId).isEmpty)
          throw new NoSuchElementException(
            s"Unable to locate branch '$rendered' for tree '$treeId'")
        ""
      }
      else {
        val hit = branches
          .filter(col("tree_id") === treeId &&
            col("depth") === hashes.length && hashChainMatches(hashes))
          .select("path").limit(2).collect()
        if (hit.isEmpty)
          throw new NoSuchElementException(
            s"Unable to locate branch '$rendered' for tree '$treeId'")
        hit.head.getString(0)
      }
    val kids = branches
      .filter(col("tree_id") === treeId &&
        col("depth") === hashes.length + 1 && col("parent") === targetPath)
      .select(lit(targetPath).as("branch"), lit("branch").as("kind"),
        col("name").as("display_name"), col("path"),
        lit(null: String).as("tsuid"), lit(null: String).as("metric"))
    val escName = Trees.escapeElem(col("display_name"))
    val leafRows = leaves
      .filter(col("tree_id") === treeId && col("branch_path") === targetPath)
      .select(lit(targetPath).as("branch"), lit("leaf").as("kind"),
        col("display_name"),
        (if (targetPath.isEmpty) escName
         else concat(lit(targetPath + "/"), escName)).as("path"),
        col("tsuid"), col("metric"))
    kids.unionByName(leafRows).orderBy("kind", "display_name")
  }

  /**
   * Persist a branch/leaf store as partitioned parquet — the layout
   * that makes [[browseRows]]/[[branchDoc]] POINT READS at any scale:
   * branches partition by (tree_id, depth) so a browse lists exactly
   * one directory (the reference reads one HBase row per branch; this
   * is the columnar analog), leaves by tree_id with the branch_path
   * equality pushed into the scan. At 10⁹ series the branch table is
   * data-sized, and browse cost must stay bounded by the addressed
   * node's fan-out — partition pruning + pushed filters deliver that
   * (PlansSpec proves the PartitionFilters and the pruned file count).
   */
  def writeBranchStore(branches: DataFrame, leaves: DataFrame,
                       path: String): Unit = {
    branches.write.partitionBy("tree_id", "depth")
      .mode("overwrite").parquet(s"$path/branches")
    leaves.write.partitionBy("tree_id")
      .mode("overwrite").parquet(s"$path/leaves")
  }

  /** The stored pair back, partition columns restored to the browse
    * schema's types. */
  def readBranchStore(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val b = spark.read.parquet(s"$path/branches")
      .withColumn("tree_id", col("tree_id").cast("int"))
      .withColumn("depth", col("depth").cast("int"))
    val l = spark.read.parquet(s"$path/leaves")
      .withColumn("tree_id", col("tree_id").cast("int"))
    (b, l)
  }

  /** formatBranchV1 (HttpJsonSerializer over the Branch POJO): the
    * branch document with its `path` map (ROOT at 0), leaves and
    * one-level child branches — null (not empty) arrays when absent,
    * as the POJO serializes. Wire-sized collects only: the child/leaf
    * filters are pushed-down scans. */
  def branchDoc(trees: DataFrame, branches: DataFrame, leaves: DataFrame,
                branchHex: String): String = {
    val (treeId, hashes, rendered) = decodeBranchId(branchHex)
    val targetPath: String =
      if (hashes.isEmpty) {
        // the root branch exists once the tree definition does
        // (TreeBuilder stores it on the first build; our virtual root
        // is addressable for any defined tree)
        if (fetchTree(trees, treeId).isEmpty &&
            branches.filter(col("tree_id") === treeId).isEmpty)
          throw new NoSuchElementException(
            s"Unable to locate branch '$rendered' for tree '$treeId'")
        ""
      } else {
        val hit = branches
          .filter(col("tree_id") === treeId &&
            col("depth") === hashes.length && hashChainMatches(hashes))
          .select("path").limit(2).collect()
        if (hit.isEmpty)
          throw new NoSuchElementException(
            s"Unable to locate branch '$rendered' for tree '$treeId'")
        hit.head.getString(0)
      }
    val elems = if (targetPath.isEmpty) Seq.empty
      else targetPath.split("/").toSeq.map(Trees.unescapeElemStr)
    val o = mapper.createObjectNode()
    def pathMap(node: ObjectNode, es: Seq[String]): Unit = {
      val p = node.putObject("path")
      p.put("0", "ROOT")
      es.zipWithIndex.foreach { case (e, i) => p.put((i + 1).toString, e) }
    }
    o.put("treeId", treeId)
    pathMap(o, elems)
    o.put("displayName", if (elems.isEmpty) "ROOT" else elems.last)
    o.put("depth", elems.length)
    val leafRows = leaves
      .filter(col("tree_id") === treeId && col("branch_path") === targetPath)
      .select("display_name", "tsuid", "metric", "tags")
      .collect().sortBy(_.getString(0))
    if (leafRows.isEmpty) o.putNull("leaves")
    else {
      val arr = o.putArray("leaves")
      leafRows.foreach { r =>
        val l = arr.addObject()
        l.put("displayName", r.getString(0))
        l.put("tsuid", r.getString(1))
        l.put("metric", r.getString(2))
        val tags = l.putObject("tags")
        Option(r.getMap[String, String](3)).foreach(
          _.toSeq.sortBy(_._1).foreach { case (k, v) => tags.put(k, v) })
      }
    }
    val kidRows = branches
      .filter(col("tree_id") === treeId &&
        col("depth") === elems.length + 1 && col("parent") === targetPath)
      .select("name", "path", "depth")
      .collect().sortBy(_.getString(0))
    if (kidRows.isEmpty) o.putNull("branches")
    else {
      val arr = o.putArray("branches")
      kidRows.foreach { r =>
        val b = arr.addObject()
        b.put("treeId", treeId)
        pathMap(b, r.getString(1).split("/").toSeq.map(Trees.unescapeElemStr))
        b.put("displayName", r.getString(0))
        b.put("depth", r.getInt(2))
        b.putNull("leaves")
        b.putNull("branches")
      }
    }
    mapper.writeValueAsString(o)
  }

  // ------------------------------------------------------------------
  // RPC facade (TreeRpc.execute routing + the per-endpoint handlers)
  // ------------------------------------------------------------------

  /** The tree API's storage bundle: definitions + rules (admin-sized)
    * and branches + leaves (distributed, [[Trees.buildBranchStore]]). */
  case class TreeStore(trees: DataFrame, rules: DataFrame,
                       branches: DataFrame, leaves: DataFrame)

  object TreeStore {
    def empty(spark: SparkSession): TreeStore = {
      import spark.implicits._
      TreeStore(emptyTrees(spark), Trees.emptyRules(spark),
        spark.emptyDataset[(Int, Int, String, String, String, Long)]
          .toDF("tree_id", "depth", "path", "name", "parent", "leaves"),
        spark.emptyDataset[(Int, String, String, String, String,
            Map[String, String])]
          .toDF("tree_id", "branch_path", "display_name", "tsuid",
            "metric", "tags"))
    }
  }

  /** One endpoint response: the (possibly updated) store, the HTTP
    * status the reference would send (200/204/304 — 4xx surface as
    * exceptions per repo convention) and the JSON body. */
  case class RpcReply(store: TreeStore, status: Int, body: String)

  /** Tree POJO serialization (formatTreeV1 — getter-visible fields,
    * rules loaded as fetchTree does). */
  def treeDoc(t: TreeDef, rules: DataFrame): String = {
    val o = mapper.createObjectNode()
    o.put("name", t.name)
    o.put("description", t.description)
    o.put("notes", t.notes)
    o.put("strictMatch", t.strictMatch)
    val rs = Trees.rulesFor(rules, t.treeId)
    if (rs.isEmpty) o.putNull("rules")
    else {
      val arr = o.putArray("rules")
      rs.foreach(r => arr.add(mapper.readTree(ruleDoc(r))))
    }
    o.put("created", t.created)
    o.put("treeId", t.treeId)
    o.put("enabled", t.enabled)
    o.put("storeFailures", t.storeFailures)
    mapper.writeValueAsString(o)
  }

  /** TreeRule serialization (formatTreeRuleV1). */
  def ruleDoc(r: Trees.Rule): String = {
    val o = mapper.createObjectNode()
    if (r.ruleType.isEmpty) o.putNull("type")
    else o.put("type", r.ruleType.toUpperCase)
    o.put("field", r.field)
    o.put("customField", r.customField)
    o.put("regex", r.regex)
    o.put("separator", r.separator)
    o.put("description", r.description)
    o.put("notes", r.notes)
    o.put("level", r.level)
    o.put("order", r.order)
    o.put("treeId", r.treeId)
    o.put("regexGroupIdx", r.regexGroup)
    o.put("displayFormat", r.displayFormat)
    mapper.writeValueAsString(o)
  }

  /** `/api/tree` CRUD (TreeRpc.handleTree:98-204). GET lists or
    * fetches; POST/PUT edit an EXISTING tree (404 otherwise) or create
    * when no id was given; DELETE drops branches/leaves and, with
    * `definition`, the definition + rules. IllegalStateException (the
    * no-changes path) maps to 304 exactly where the reference catches
    * it. */
  def handleTree(store: TreeStore, method: String,
                 qs: Map[String, String] = Map.empty,
                 body: Option[String] = None,
                 now: Long = System.currentTimeMillis() / 1000L): RpcReply = {
    val (local, changed) = body match {
      case Some(b) if b.nonEmpty => parseTreeJson(b)
      case _ => parseTreeQs(qs)
    }
    method.toUpperCase match {
      case "GET" =>
        if (local.treeId == 0) {
          val all = fetchAllTrees(store.trees)
            .map(t => treeDoc(t, store.rules))
          RpcReply(store, 200, all.mkString("[", ",", "]"))
        } else fetchTree(store.trees, local.treeId) match {
          case None => throw new NoSuchElementException(
            s"Unable to locate tree: ${local.treeId}")
          case Some(t) => RpcReply(store, 200, treeDoc(t, store.rules))
        }
      case m @ ("POST" | "PUT") =>
        try {
          if (local.treeId > 0) {
            if (fetchTree(store.trees, local.treeId).isEmpty)
              throw new NoSuchElementException(
                s"Unable to locate tree: ${local.treeId}")
            val trees2 = storeTree(store.trees, local, changed, m == "PUT")
            val stored = fetchTree(trees2, local.treeId).get
            RpcReply(store.copy(trees = trees2), 200,
              treeDoc(stored, store.rules))
          } else {
            val (trees2, id) = createNewTree(store.trees, local, changed, now)
            val stored = fetchTree(trees2, id).get
            RpcReply(store.copy(trees = trees2), 200,
              treeDoc(stored, store.rules))
          }
        } catch {
          // the reference's blanket IllegalStateException → 304 catch
          // (TreeRpc.java:199-200) — including, quirkily, the
          // exhausted-IDs error on the create path; the out-of-IDs
          // TEST actually trips the earlier missing-name gate
          case _: IllegalStateException => RpcReply(store, 304, "")
        }
      case "DELETE" =>
        // the reference double-parses the body as a string map, so
        // {"definition":true} and {"definition":"true"} both count
        // (TreeRpc.java:163-180)
        val definition = body match {
          case Some(b) if b.nonEmpty =>
            val n = mapper.readTree(b)
            n.hasNonNull("definition") &&
              n.get("definition").asText().toLowerCase == "true"
          case _ => qs.get("definition").exists(_.toLowerCase == "true")
        }
        if (fetchTree(store.trees, local.treeId).isEmpty)
          throw new NoSuchElementException(
            s"Unable to locate tree: ${local.treeId}")
        val id = local.treeId
        val branches2 = store.branches.filter(col("tree_id") =!= id)
        val leaves2 = store.leaves.filter(col("tree_id") =!= id)
        val (trees2, rules2) =
          if (definition)
            (store.trees.filter(col("treeId") =!= id),
              store.rules.filter(col("treeId") =!= id))
          else (store.trees, store.rules)
        RpcReply(TreeStore(trees2, rules2, branches2, leaves2), 204, "")
      case _ => throw new IllegalArgumentException(
        "Unsupported HTTP request method")
    }
  }

  /** `/api/tree/branch` (TreeRpc.handleBranch:213-253): GET/POST only;
    * no branch hex falls back to the tree id's root (requiring a valid
    * treeid), then the formatted branch document. */
  def handleBranch(store: TreeStore, method: String,
                   qs: Map[String, String] = Map.empty): RpcReply = {
    if (!Set("GET", "POST").contains(method.toUpperCase))
      throw new IllegalArgumentException("Unsupported HTTP request method")
    val treeId = parseTreeId(qs, required = false)
    val hex = qs.get("branch").filter(_.nonEmpty) match {
      case Some(h) => h
      case None =>
        if (treeId < 1) throw new IllegalArgumentException(
          "Missing or invalid branch and tree IDs")
        idToString(treeIdToBytes(treeId))
    }
    RpcReply(store, 200,
      branchDoc(store.trees, store.branches, store.leaves, hex))
  }

  /** `/api/tree/rule` CRUD (TreeRpc.handleRule:263-330): the tree must
    * exist no matter what; GET fetches, POST/PUT syncs (304 from the
    * no-changes IllegalStateException), DELETE requires the rule. */
  def handleRule(store: TreeStore, method: String,
                 qs: Map[String, String] = Map.empty,
                 body: Option[String] = None): RpcReply = {
    val (local, changed) = body match {
      case Some(b) if b.nonEmpty => parseRuleJson(b)
      case _ => parseRuleQs(qs)
    }
    if (fetchTree(store.trees, local.treeId).isEmpty)
      throw new NoSuchElementException(
        s"Unable to locate tree: ${local.treeId}")
    method.toUpperCase match {
      case "GET" =>
        fetchRule(store.rules, local.treeId, local.level, local.order) match {
          case None => throw new NoSuchElementException(
            s"Unable to locate rule: ${ruleToString(local)}")
          case Some(r) => RpcReply(store, 200, ruleDoc(r))
        }
      case m @ ("POST" | "PUT") =>
        try {
          val rules2 = syncRule(store.rules, local, changed, m == "PUT")
          val stored =
            fetchRule(rules2, local.treeId, local.level, local.order).get
          RpcReply(store.copy(rules = rules2), 200, ruleDoc(stored))
        } catch {
          case _: IllegalStateException => RpcReply(store, 304, "")
        }
      case "DELETE" =>
        if (fetchRule(store.rules, local.treeId, local.level,
            local.order).isEmpty)
          throw new NoSuchElementException(
            s"Unable to locate rule: ${ruleToString(local)}")
        RpcReply(store.copy(rules =
          Trees.deleteRule(store.rules, local.treeId, local.level,
            local.order)), 204, "")
      case _ => throw new IllegalArgumentException(
        "Unsupported HTTP request method")
    }
  }

  /** `/api/tree/rules` bulk replace (TreeRpc.handleRules:340-404):
    * body rules must be non-empty and single-tree; POST merges each,
    * PUT purges the tree's rules first and overwrites; DELETE purges.
    * GET is the reference's unsupported-method error. */
  def handleRules(store: TreeStore, method: String,
                  qs: Map[String, String] = Map.empty,
                  body: Option[String] = None): RpcReply = {
    val parsed: Seq[(Trees.Rule, Set[String])] = body match {
      case Some(b) if b.nonEmpty =>
        val n = try mapper.readTree(b) catch {
          case _: Exception => throw new IllegalArgumentException(
            "Unable to parse the given JSON")
        }
        if (n == null || !n.isArray || n.size() == 0)
          throw new IllegalArgumentException("Missing tree rules")
        import scala.jdk.CollectionConverters._
        n.elements().asScala.map(parseRuleNode).toSeq
      case _ => Seq.empty
    }
    val treeId =
      if (parsed.nonEmpty) {
        val id = parsed.head._1.treeId
        if (parsed.exists(_._1.treeId != id))
          throw new IllegalArgumentException(
            "All rules must belong to the same tree")
        id
      } else parseTreeId(qs, required = false)
    if (fetchTree(store.trees, treeId).isEmpty)
      throw new NoSuchElementException(s"Unable to locate tree: $treeId")
    method.toUpperCase match {
      case m @ ("POST" | "PUT") =>
        if (parsed.isEmpty)
          throw new IllegalArgumentException("Missing tree rules")
        val base =
          if (m == "PUT") store.rules.filter(col("treeId") =!= treeId)
          else store.rules
        val rules2 = parsed.foldLeft(base) { case (t, (r, ch)) =>
          syncRule(t, r, ch, m == "PUT") }
        RpcReply(store.copy(rules = rules2), 204, "")
      case "DELETE" =>
        RpcReply(store.copy(rules =
          store.rules.filter(col("treeId") =!= treeId)), 204, "")
      case _ => throw new IllegalArgumentException(
        "Unsupported HTTP request method")
    }
  }

  /**
   * `/api/tree/test` endpoint gates + routing (TreeRpc
   * .handleTest:410-505): treeId required ("Missing or invalid Tree
   * ID" on the POJO path, the required-param error on the QS path),
   * the tree must exist, the TSUID list must be non-empty, and only
   * GET/POST/PUT route. The per-TSUID result is the relational
   * [[Trees.testRun]] trace (tried/matched per rule — the same
   * semantics TreeBuilder's testing-mode messages narrate); a TSUID
   * with no series row emits the reference's "Unable to locate TSUID
   * meta data" message row. Returns (tsuid, level, order, rule,
   * value, tried, matched, message).
   */
  def handleTest(store: TreeStore, series: DataFrame, method: String,
                 qs: Map[String, String] = Map.empty,
                 body: Option[String] = None,
                 uidMeta: Option[DataFrame] = None,
                 tsuid: org.apache.spark.sql.Column = Trees.canonicalTsuid)
      : DataFrame = {
    if (!Set("GET", "POST", "PUT").contains(method.toUpperCase))
      throw new IllegalArgumentException("Unsupported HTTP request method")
    val (treeId, tsuids) = body match {
      case Some(b) if b.nonEmpty =>
        val n = mapper.readTree(b)
        if (!n.hasNonNull("treeId"))
          throw new IllegalArgumentException("Missing or invalid Tree ID")
        import scala.jdk.CollectionConverters._
        (n.get("treeId").asInt(),
          if (n.hasNonNull("tsuids"))
            n.get("tsuids").elements().asScala.map(_.asText()).toSeq
          else Seq.empty[String])
      case _ =>
        (parseTreeId(qs, required = true),
          qs.get("tsuids").map(_.split(",").toSeq)
            .getOrElse(Seq.empty[String]))
    }
    if (fetchTree(store.trees, treeId).isEmpty)
      throw new NoSuchElementException(s"Unable to locate tree: $treeId")
    if (tsuids.isEmpty)
      throw new IllegalArgumentException("Missing or empty TSUID list")
    val trace = Trees.testRun(series, store.rules, treeId, uidMeta, tsuid)
      .filter(col("tsuid").isInCollection(tsuids))
      .withColumn("message", lit(null: String))
    val spark = series.sparkSession
    import spark.implicits._
    val missing = tsuids.toDF("tsuid")
      .join(trace.select("tsuid").distinct(), Seq("tsuid"), "left_anti")
      .select(col("tsuid"), lit(null).cast("int").as("level"),
        lit(null).cast("int").as("order"),
        lit(null).cast("string").as("rule"),
        lit(null).cast("string").as("value"),
        lit(null).cast("boolean").as("tried"),
        lit(null).cast("boolean").as("matched"),
        lit("Unable to locate TSUID meta data").as("message"))
    trace.unionByName(missing).orderBy("tsuid", "level", "order")
  }

  /** `/api/tree/collisions|notmatched` (TreeRpc
    * .handleCollisionNotMatched:519-556 over Tree.fetchCollisions /
    * fetchNotMatched:634-795): the tree must exist, treeId is
    * required, an optional tsuid list filters, and the response is the
    * flat {tsuid: value} map document. `frame` is a buildReport side
    * channel — (tsuid, existing_tsuid, …) for collisions, (tsuid,
    * message) for not-matched.
    *
    * `limit` bounds the unfiltered document: the reference returns the
    * FULL map (its single HBase row), which at 10⁶+ collisions makes
    * the response itself the bottleneck — a `limit` (query-string or
    * param; default unlimited = reference-compatible) caps the collect
    * at the first N tsuids in sort order via a TakeOrdered plan, so
    * driver memory stays bounded no matter the tree's collision
    * count.
    *
    * `start_tsuid` is the continuation cursor: rows strictly AFTER the
    * given tsuid in sort order, so `(limit = N, start_tsuid =
    * last-key-of-previous-page)` pages the full document in
    * deterministic N-row pages — the same resumable-scan shape the
    * reference's HBase scanner start-row gives for free, with the same
    * bounded-memory TakeOrdered plan per page. */
  def handleCollisionsNotMatched(store: TreeStore, frame: DataFrame,
                                 forCollisions: Boolean,
                                 qs: Map[String, String] = Map.empty,
                                 body: Option[String] = None,
                                 limit: Option[Int] = None,
                                 startTsuid: Option[String] = None): RpcReply = {
    // parseTSUIDsList (QS: treeid required, tsuids comma-split) vs the
    // POJO body, whose missing treeId is "Missing or invalid Tree ID"
    val (treeId, tsuids) = body match {
      case Some(b) if b.nonEmpty =>
        val n = mapper.readTree(b)
        if (!n.hasNonNull("treeId"))
          throw new IllegalArgumentException("Missing or invalid Tree ID")
        import scala.jdk.CollectionConverters._
        (n.get("treeId").asInt(),
          if (n.hasNonNull("tsuids"))
            n.get("tsuids").elements().asScala.map(_.asText()).toSeq
          else Seq.empty[String])
      case _ =>
        (parseTreeId(qs, required = true),
          qs.get("tsuids").map(_.split(",").toSeq)
            .getOrElse(Seq.empty[String]))
    }
    if (fetchTree(store.trees, treeId).isEmpty)
      throw new NoSuchElementException(s"Unable to locate tree: $treeId")
    val valueCol = if (forCollisions) "existing_tsuid" else "message"
    val filtered =
      if (tsuids.isEmpty) frame
      else frame.filter(col("tsuid").isInCollection(tsuids))
    val cap = qs.get("limit").map(_.toInt).orElse(limit)
    cap.filter(_ < 0).foreach(_ => throw new IllegalArgumentException(
      "Invalid limit: must be a non-negative integer"))
    // continuation cursor: strictly-after filter pushed into the scan,
    // so each page is an independent pushed-predicate + TakeOrdered
    val cursor = qs.get("start_tsuid").orElse(startTsuid)
    val paged = cursor.fold(filtered)(c => filtered.filter(col("tsuid") > c))
    val rows = (cap match {
      // orderBy+limit = TakeOrderedAndProject: first N tsuids in sort
      // order, bounded driver memory at any collision count
      case Some(n) => paged.select("tsuid", valueCol)
        .orderBy("tsuid").limit(n).collect()
      case None => paged.select("tsuid", valueCol).collect()
    }).sortBy(_.getString(0))
    val o = mapper.createObjectNode()
    rows.foreach(r => o.put(r.getString(0), r.getString(1)))
    RpcReply(store, 200, mapper.writeValueAsString(o))
  }
}
