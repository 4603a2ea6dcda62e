package graft.meta

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * /api/uid admin mutations — assign, rename, and the UIDMeta/TSMeta
 * CRUD (reference: src/tsd/UniqueIdRpc.java:48-124 handlers,
 * src/core/TSDB.java:2120-2152 renameUid, src/uid/UniqueId.java
 * assign/rename, src/meta/UIDMeta.java / src/meta/TSMeta.java models).
 *
 * The registry is a plain DataFrame (kind, name, uid) — seeded from
 * [[Introspect.uidRegistry]] (derived from data) or loaded from a
 * persisted table; every mutation returns the next version of the
 * table and the caller owns persistence, the same storage-agnostic
 * contract as [[Annotations]] CRUD.
 *
 * Scale: mutation requests are wire-sized (a handful of names typed by
 * an operator), so request-side literals, per-kind windows over the
 * REQUEST rows, and eager single-key existence checks are all bounded
 * by the request, never by the registry. The registry side is only
 * ever touched by broadcast-able joins and one max-per-kind aggregate.
 */
object Uids {

  val KINDS = Seq("metric", "tagk", "tagv")

  private val nameRe = graft.sources.Ingest.NAME_RE.r

  private def validate(kind: String, name: String): Unit = {
    require(KINDS.contains(kind), s"unknown uid kind: $kind")
    require(name != null && nameRe.matches(name),
      s"Invalid $kind name ($name): illegal characters")
  }

  /** UID filter plugin point (reference UniqueIdFilterPlugin,
    * src/uid/UniqueIdFilterPlugin.java): consulted before any NEW
    * name is assigned an id. */
  trait UidFilter {
    def allow(kind: String, value: String): Boolean
  }

  /** The active UID filter; [[assign]] consults it for fresh names
    * (reference UniqueId.java:786-794 — rejection throws-per-name,
    * surfaced in the assign report's error column). */
  @volatile var uidFilter: Option[UidFilter] = None

  /**
   * The stock whitelist filter (reference UniqueIdWhitelistFilter,
   * src/uid/UniqueIdWhitelistFilter.java): per-kind regex lists from
   * `tsd.uidfilter.whitelist.{metric,tagk,tagv}_patterns`, split on
   * `tsd.uidfilter.whitelist.delimiter` (default ",") — the delimiter
   * is itself a REGEX (`String.split` semantics; the reference's
   * constant is literally DEFAULT_REGEX_DELIMITER,
   * UniqueIdWhitelistFilter.java:40,65), so `\s*,\s*` splits on
   * spaced commas. A value must
   * match EVERY configured pattern for its kind — the reference
   * rejects when any pattern fails to find, so the list is an AND
   * (TestUniqueIdWhitelistFilter.allowUIDAssignmentMultiplePaterns:
   * ".*,^test.*" still rejects "metric"). A kind with no configured
   * patterns allows everything. Accept/reject counters feed
   * [[Introspect.incr]] (the plugin's collectStats namespace).
   */
  def whitelistFilter(config: Map[String, String]): UidFilter = {
    val delim = config.getOrElse("tsd.uidfilter.whitelist.delimiter", ",")
    def pats(key: String): Option[Seq[java.util.regex.Pattern]] =
      config.get(s"tsd.uidfilter.whitelist.${key}_patterns").map(
        _.split(delim).toSeq.map { p =>
          try java.util.regex.Pattern.compile(p)
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              throw new IllegalArgumentException(
                s"The $key whitelist pattern [$p] does not compile.", e)
          }
        })
    val byKind = Map("metric" -> pats("metric"), "tagk" -> pats("tagk"),
      "tagv" -> pats("tagv"))
    (kind: String, value: String) => {
      val ok = byKind.getOrElse(kind, None)
        .forall(_.forall(_.matcher(value).find()))
      Introspect.incr("uid.filter.whitelist." +
        (if (ok) "accepted" else "rejected") + s".$kind")
      ok
    }
  }

  /**
   * POST/GET /api/uid/assign — allocate ids for new names, one result
   * row per requested name (reference UniqueIdRpc.handleAssign:95-160:
   * each name processes independently; already-assigned names land in
   * the per-kind error map instead of failing the call).
   *
   * Returns (next registry, report). The report has one row per
   * request: (kind, name, uid, error) with `error` null on success and
   * the reference's message text for names that already exist. New ids
   * continue each kind's dense numbering from its current max.
   */
  def assign(registry: DataFrame,
             requests: Map[String, Seq[String]]): (DataFrame, DataFrame) = {
    val spark = registry.sparkSession
    require(requests.nonEmpty, "Missing values to assign UIDs")
    requests.foreach { case (k, ns) => ns.foreach(validate(k, _)) }
    val reqRows = requests.toSeq.flatMap { case (k, ns) =>
      ns.distinct.map(n => Row(k, n))
    }
    val req = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(reqRows).asJava,
      StructType(Seq(StructField("kind", StringType),
        StructField("name", StringType))))
    val existing = req.join(registry, Seq("kind", "name"))
      .select(col("kind"), col("name"), col("uid"),
        concat(lit("Name already exists with UID: "), col("uid"))
          .as("error"))
    val fresh = req.join(registry, Seq("kind", "name"), "left_anti")
    // the UID filter plugin is consulted ONLY for names needing a new
    // assignment (reference UniqueId.java:786-794: the filter runs
    // after NoSuchUniqueName); requests are wire-sized so the
    // driver-side split is bounded by the request, never the registry
    val reqSchema = StructType(Seq(StructField("kind", StringType),
      StructField("name", StringType)))
    val (granted, blocked) = uidFilter match {
      case None => (fresh, Seq.empty[Row])
      case Some(f) =>
        val (ok, no) = fresh.collect().toSeq.partition(r =>
          f.allow(r.getAs[String]("kind"), r.getAs[String]("name")))
        (spark.createDataFrame(
          scala.jdk.CollectionConverters.SeqHasAsJava(ok).asJava,
          reqSchema), no)
    }
    // dense continuation per kind: window over the REQUEST rows only
    // (wire-sized), rebased on the registry's per-kind max
    val bases = registry.groupBy("kind").agg(max(col("uid")).as("base"))
    val assigned = granted
      .join(broadcast(bases), Seq("kind"), "left")
      .withColumn("uid", coalesce(col("base"), lit(0L)) +
        row_number().over(
          Window.partitionBy(col("kind")).orderBy(col("name"))))
      .drop("base")
    // rejections surface in the report with the reference's message
    // (FailedToAssignUniqueIdException, "Blocked by UID filter.")
    val blockedRows = blocked.map { r =>
      val (k, n) = (r.getAs[String]("kind"), r.getAs[String]("name"))
      Row(k, n, null,
        s"Failed to assign ID for kind='$k' name='$n' after 0 attempts " +
          "due to: Blocked by UID filter.")
    }
    val blockedReport = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(blockedRows).asJava,
      StructType(Seq(StructField("kind", StringType),
        StructField("name", StringType), StructField("uid", LongType),
        StructField("error", StringType))))
    val report = existing
      .unionByName(assigned.withColumn("error", lit(null: String)))
      .unionByName(blockedReport)
    (registry.unionByName(assigned.select("kind", "name", "uid")), report)
  }

  /**
   * POST /api/uid/rename — move a name to an existing uid (reference
   * TSDB.renameUid:2120-2152 + UniqueId.rename: the old name must
   * exist, the new name must not). Same-uid identity: queries that
   * resolved the old name resolve the new one to the same id.
   */
  def rename(registry: DataFrame, kind: String, oldname: String,
             newname: String): DataFrame = {
    validate(kind, oldname)
    validate(kind, newname)
    val k = col("kind") === kind
    val hit = registry.filter(k && col("name") === oldname).limit(1)
    require(hit.take(1).nonEmpty, s"""Name("$oldname") does not exist""")
    require(registry.filter(k && col("name") === newname)
      .take(1).isEmpty,
      s"An UID with name $newname for type $kind already exists")
    registry.withColumn("name",
      when(k && col("name") === oldname, lit(newname))
        .otherwise(col("name")))
  }

  /** Resolve name→uid within a kind (the read side the RPC GETs use).
    * Empty result = NoSuchUniqueName. */
  def resolve(registry: DataFrame, kind: String, name: String): DataFrame =
    registry.filter(col("kind") === kind && col("name") === name)
      .select("uid")

  /**
   * `tsd uid delete <kind> <name>` — remove a (kind, name, uid) mapping
   * from the registry (reference src/tools/UidManager.java:417-436
   * delete subcommand → TSDB.deleteUidAsync, which drops both the
   * forward and reverse rows — one relational row here). Mirrors
   * [[rename]]'s error contract: deleting an absent name is a request
   * error, not a no-op.
   */
  def delete(registry: DataFrame, kind: String, name: String): DataFrame = {
    validate(kind, name)
    val k = col("kind") === kind && col("name") === name
    require(registry.filter(k).take(1).nonEmpty,
      s"""Name("$name") does not exist""")
    registry.filter(!k)
  }

  /**
   * `tsd uid grep [kind] <regex>` (reference
   * src/tools/UidManager.java:286-321): regex search over the
   * name→uid mappings, optionally restricted to one kind; the
   * `--ignore-case` flag prepends `(?i)` exactly like the CLI does.
   * The regex runs distributed (`rlike` inside the scan filter), so a
   * registry of any size greps without a collect.
   */
  def grep(registry: DataFrame, pattern: String, kind: Option[String] = None,
           ignoreCase: Boolean = false): DataFrame = {
    val re = (if (ignoreCase) "(?i)" else "") + pattern
    kind.foldLeft(registry)((df, k) => df.filter(col("kind") === k))
      .filter(col("name").rlike(re))
  }

  /**
   * `tsd uid fsck` report over the dual mapping tables (reference
   * src/tools/UidManager.java:446-800: the forward ID_FAMILY map and
   * reverse NAME_FAMILY map are stored independently and can drift).
   * `forward` = (kind, name, uid), `reverse` = (kind, uid, name).
   * One row per fault, `fault` ∈ {duplicate_forward, duplicate_reverse,
   * missing_reverse, mismatched_reverse, missing_forward,
   * mismatched_forward, uid_collision}; a collision row carries the
   * would-be repair name `fsck.<name1>.<name2>...` (sorted), the
   * reference's collision-rename convention. All checks are
   * relational — anti-joins and per-key aggregates on (kind, name) /
   * (kind, uid) — so the fsck scales to a registry of any size where
   * the reference builds driver-side hash maps.
   */
  def fsckUid(forward: DataFrame, reverse: DataFrame): DataFrame = {
    val f = forward.select("kind", "name", "uid").distinct()
    val r = reverse.select("kind", "uid", "name").distinct()
    val dupF = f.groupBy("kind", "name")
      .agg(countDistinct("uid").as("n"), min("uid").as("uid"))
      .filter(col("n") > 1)
      .select(col("kind"), lit("duplicate_forward").as("fault"),
        col("name"), col("uid"))
    val dupR = r.groupBy("kind", "uid")
      .agg(countDistinct("name").as("n"), min("name").as("name"))
      .filter(col("n") > 1)
      .select(col("kind"), lit("duplicate_reverse").as("fault"),
        col("name"), col("uid"))
    val coll = collisions(f)
      .select(col("kind"), lit("uid_collision").as("fault"),
        col("fsck_name").as("name"), col("uid"))
    val missR = f.join(r.select("kind", "uid").distinct(),
        Seq("kind", "uid"), "left_anti")
      .select(col("kind"), lit("missing_reverse").as("fault"),
        col("name"), col("uid"))
    val misR = f.join(r.withColumnRenamed("name", "rname"), Seq("kind", "uid"))
      .filter(col("name") =!= col("rname"))
      .select(col("kind"), lit("mismatched_reverse").as("fault"),
        col("name"), col("uid"))
    val missF = r.join(f.select("kind", "name").distinct(),
        Seq("kind", "name"), "left_anti")
      .select(col("kind"), lit("missing_forward").as("fault"),
        col("name"), col("uid"))
    val misF = r.join(f.withColumnRenamed("uid", "fuid"), Seq("kind", "name"))
      .filter(col("uid") =!= col("fuid"))
      .select(col("kind"), lit("mismatched_forward").as("fault"),
        col("name"), col("uid"))
    dupF.union(dupR).union(coll).union(missR).union(misR)
      .union(missF).union(misF)
  }

  /** uids mapped from ≥2 forward names, with the reference's repair
    * name `fsck.` + sorted names joined by `.`. */
  private def collisions(f: DataFrame): DataFrame =
    f.groupBy("kind", "uid")
      .agg(countDistinct("name").as("n"),
        concat_ws(".", lit("fsck"),
          array_join(array_sort(collect_set(col("name"))), "."))
          .as("fsck_name"))
      .filter(col("n") > 1)
      .select("kind", "uid", "fsck_name")

  /**
   * `tsd uid fsck --fix [--delete_unknown]` net effect (reference
   * UidManager.java:449-800 fix mode): collided uids are renamed to
   * the concatenated `fsck.` name and their old forward mappings
   * dropped; every surviving forward mapping gets its reverse restored
   * (the reference's restoreReverseMap for missing/mismatched rows);
   * orphan reverse mappings disappear (removeReverseMap). The net of
   * all three is "rebuild reverse from the repaired forward", which is
   * what this computes — returning (forward', reverse').
   */
  def fsckUidFix(forward: DataFrame,
                 reverse: DataFrame): (DataFrame, DataFrame) = {
    val f = forward.select("kind", "name", "uid").distinct()
    val coll = collisions(f)
    val fixedForward = f.join(coll, Seq("kind", "uid"), "left_anti")
      .select("kind", "name", "uid")
      .unionByName(coll.select(col("kind"),
        col("fsck_name").as("name"), col("uid")))
    (fixedForward, fixedForward.select("kind", "uid", "name"))
  }

  // ---- UIDMeta / TSMeta CRUD ------------------------------------------
  //
  // Reference UIDMeta (src/meta/UIDMeta.java: uid+type identity with
  // displayName/description/notes/custom) and TSMeta
  // (src/meta/TSMeta.java: tsuid identity). Both are upsert tables with
  // the same replace-by-identity contract as Annotations.upsert — rows
  // in `edits` replace table rows with the same identity.

  /** Upsert UIDMeta rows; identity = (kind, uid). */
  def upsertUidMeta(table: DataFrame, edits: DataFrame): DataFrame = {
    SearchPlugins.each(_.indexUidMeta(edits))
    upsertBy(table, edits, Seq("kind", "uid"))
  }

  /** Delete UIDMeta rows by (kind, uid). */
  def deleteUidMeta(table: DataFrame, kind: String, uid: Long): DataFrame = {
    SearchPlugins.each(_.deleteUidMeta(kind, uid))
    table.filter(!(col("kind") === kind && col("uid") === uid))
  }

  /** Upsert TSMeta rows; identity = tsuid (the series-hash hex the
    * engine uses wherever the reference uses TSUIDs). */
  def upsertTsMeta(table: DataFrame, edits: DataFrame): DataFrame = {
    SearchPlugins.each(_.indexTsMeta(edits))
    upsertBy(table, edits, Seq("tsuid"))
  }

  /** Delete TSMeta rows by tsuid. */
  def deleteTsMeta(table: DataFrame, tsuid: String): DataFrame = {
    SearchPlugins.each(_.deleteTsMeta(tsuid))
    table.filter(col("tsuid") =!= tsuid)
  }

  /**
   * The `/api/uid/assign` V1 response document over an [[assign]]
   * report (reference UniqueIdRpc.handleAssign:127-160): per kind a
   * name-sorted `{name: uid}` object, plus a `<kind>_errors` object
   * only when that kind had failures; uids render as the reference's
   * 3-byte hex ("000001"). Returns (json, hadErrors) — the RPC answers
   * 400 when any name failed, 200 otherwise.
   */
  def assignJson(report: DataFrame): (String, Boolean) = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val rows = report.select("kind", "name", "uid", "error").collect()
    var errs = false
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach {
      case (kind, rs) =>
        val ok = root.putObject(kind)
        rs.filter(_.isNullAt(3)).sortBy(_.getString(1)).foreach(r =>
          ok.put(r.getString(1), f"${r.getLong(2)}%06X"))
        val bad = rs.filterNot(_.isNullAt(3))
        if (bad.nonEmpty) {
          errs = true
          val eo = root.putObject(kind + "_errors")
          bad.sortBy(_.getString(1)).foreach(r =>
            eo.put(r.getString(1), r.getString(3)))
        }
    }
    (mapper.writeValueAsString(root), errs)
  }

  /** POST merge-upsert (UIDMeta.syncMeta / TSMeta.syncMeta with
    * overwrite=false, src/meta/UIDMeta.java:447-478 /
    * src/meta/TSMeta.java:769-812): a field the request did not set
    * (null in the edit row) keeps the stored value; PUT is the
    * replace-by-identity [[upsertUidMeta]]/[[upsertTsMeta]]. A
    * `created` column, when present, only ever moves EARLIER — the
    * least positive of edit and stored wins regardless of overwrite
    * (both syncMeta bodies guard `meta.created < created`). */
  def mergeUidMeta(table: DataFrame, edits: DataFrame): DataFrame = {
    SearchPlugins.each(_.indexUidMeta(edits))
    mergeBy(table, edits, Seq("kind", "uid"))
  }

  /** TSMeta POST merge; identity = tsuid. */
  def mergeTsMeta(table: DataFrame, edits: DataFrame): DataFrame = {
    SearchPlugins.each(_.indexTsMeta(edits))
    mergeBy(table, edits, Seq("tsuid"))
  }

  private def mergeBy(table: DataFrame, edits: DataFrame,
                      id: Seq[String]): DataFrame = {
    val fields = table.columns.filterNot(id.contains)
    // duplicate identities in one edit batch pre-merge fieldwise (max
    // skips nulls) — deterministic where the reference's sequential
    // CAS order is arrival-dependent; also keeps the full-outer join
    // from emitting one row per duplicate
    val dedup = edits.groupBy(id.map(col): _*)
      .agg(fields.map(c => max(col(c)).as(c)).head,
        fields.map(c => max(col(c)).as(c)).tail: _*)
    val e = dedup.select(table.columns.map(c => col(c).as(s"__e_$c")): _*)
    val cond = id.map(c => table(c) <=> e(s"__e_$c")).reduce(_ && _)
    table.join(e, cond, "full_outer")
      .select(
        id.map(c => coalesce(table(c), e(s"__e_$c")).as(c)) ++
          fields.map {
            case c @ "created" =>
              // least positive wins; 0/null means unset on either side
              val ec = e(s"__e_$c"); val sc = table(c)
              when(ec > 0 && (sc.isNull || sc <= 0), ec)
                .when(sc > 0 && (ec.isNull || ec <= 0), sc)
                .when(ec > 0 && sc > 0, least(ec, sc))
                .otherwise(coalesce(ec, sc)).as(c)
            case c => coalesce(e(s"__e_$c"), table(c)).as(c)
          }: _*)
  }

  private def upsertBy(table: DataFrame, edits: DataFrame,
                       id: Seq[String]): DataFrame =
    table.join(edits.select(id.map(col): _*), id, "left_anti")
      .unionByName(edits)

  /**
   * UIDMeta.syncToStorage's single-entity RPC sync (reference
   * src/meta/UIDMeta.java:175-277, routed by UniqueIdRpc
   * .handleUIDMeta:167-273): the Missing UID / Missing type gates, the
   * all-unset no-changes IllegalStateException (304), the UID-must-
   * resolve check (the reference's NoSuchUniqueId → the RPC's 404
   * "Could not find the requested UID"), then fetch-merge-replace —
   * POST keeps stored values where the edit is null (syncMeta
   * overwrite=false), PUT replaces every user field, and `created`
   * only ever moves EARLIER under both (syncMeta's unconditional
   * guard). `edit` is one wire-sized row on the uidMeta table's
   * schema; the stored-row fetch is a pushed-down point lookup.
   */
  def syncUidMetaRpc(table: DataFrame, registry: DataFrame,
                     edit: DataFrame, overwrite: Boolean): DataFrame = {
    val row = edit.limit(1).collect().headOption.getOrElse(
      throw new IllegalArgumentException("Missing UID"))
    val cols = edit.columns.toSeq
    val uidIx = cols.indexOf("uid")
    val kindIx = cols.indexOf("kind")
    if (uidIx < 0 || row.isNullAt(uidIx))
      throw new IllegalArgumentException("Missing UID")
    if (kindIx < 0 || row.isNullAt(kindIx) ||
        row.getString(kindIx).isEmpty)
      throw new IllegalArgumentException("Missing type")
    val uid = row.getLong(uidIx)
    val kind = row.getString(kindIx)
    // reference gate ORDER (UIDMeta.syncToStorage:189-193 before the
    // getFromStorage chain): the all-unset no-changes IllegalStateException
    // (304) fires BEFORE UID resolution — an all-unset edit for an unknown
    // UID is a 304, not a 404
    val fields = table.columns.toSeq.filterNot(Seq("kind", "uid").contains)
    def unset(c: String): Boolean = {
      val i = row.schema.fieldNames.indexOf(c)
      i < 0 || row.isNullAt(i)
    }
    if (fields.forall(unset))
      throw new IllegalStateException("No changes detected in UID meta data")
    if (registry.filter(col("kind") === kind && col("uid") === uid)
        .isEmpty)
      throw new NoSuchElementException("Could not find the requested UID")
    syncOneRow(table, Seq("kind", "uid"), row, overwrite,
      noChanges = "No changes detected in UID meta data",
      mustExist = None)
  }

  /**
   * TSMeta.syncToStorage's single-entity RPC sync (reference
   * src/meta/TSMeta.java:220-330, routed by UniqueIdRpc
   * .handleTSMeta:280-400): Missing TSUID, the no-changes
   * IllegalStateException, and — unlike UIDMeta — the row MUST already
   * exist ("Requested TSMeta did not exist", TSMeta.java:309; TSMeta
   * rows are system-created by the meta tracking path, never by the
   * RPC). Same POST-merge / PUT-replace / created-moves-earlier
   * contract.
   */
  def syncTsMetaRpc(table: DataFrame, edit: DataFrame,
                    overwrite: Boolean): DataFrame = {
    val row = edit.limit(1).collect().headOption.getOrElse(
      throw new IllegalArgumentException("Missing TSUID"))
    val cols = edit.columns.toSeq
    val idIx = cols.indexOf("tsuid")
    if (idIx < 0 || row.isNullAt(idIx) || row.getString(idIx).isEmpty)
      throw new IllegalArgumentException("Missing TSUID")
    syncOneRow(table, Seq("tsuid"), row, overwrite,
      noChanges = "No changes detected in TSUID meta data",
      mustExist = Some("Requested TSMeta did not exist"))
  }

  /** The shared fetch-merge-replace body: one stored-row point lookup,
    * driver-side field merge (the reference's syncMeta), one
    * replace-by-identity write back. */
  private def syncOneRow(table: DataFrame, id: Seq[String],
                         edit: org.apache.spark.sql.Row,
                         overwrite: Boolean, noChanges: String,
                         mustExist: Option[String]): DataFrame = {
    val cols = table.columns.toSeq
    val fields = cols.filterNot(id.contains)
    def at(r: org.apache.spark.sql.Row, c: String): Any = {
      val i = r.schema.fieldNames.indexOf(c)
      if (i < 0 || r.isNullAt(i)) null else r.get(i)
    }
    if (fields.forall(c => at(edit, c) == null))
      throw new IllegalStateException(noChanges)
    val idMatch = id.map(c => col(c) === lit(at(edit, c))).reduce(_ && _)
    val stored = table.filter(idMatch).limit(1).collect().headOption
    if (stored.isEmpty && mustExist.isDefined)
      throw new IllegalArgumentException(mustExist.get)
    val merged = stored match {
      case None => org.apache.spark.sql.Row.fromSeq(cols.map(at(edit, _)))
      case Some(s) => org.apache.spark.sql.Row.fromSeq(cols.map { c =>
        val ev = at(edit, c); val sv = at(s, c)
        if (id.contains(c)) sv
        else if (c == "created") (ev, sv) match {
          // least positive wins regardless of overwrite (syncMeta's
          // `meta.created > 0 && (created == 0 || meta.created <
          // created)` guard in both POJOs)
          case (e: Long, st: Long) if e > 0 && st > 0 => math.min(e, st)
          case (e: Long, _) if e > 0 => e
          case (_, st: Long) => st
          case _ => if (ev != null) ev else sv
        }
        else if (overwrite) ev
        else if (ev != null) ev else sv
      })
    }
    val spark = table.sparkSession
    val one = spark.createDataFrame(
      java.util.Arrays.asList(merged), table.schema)
    table.filter(!idMatch).unionByName(one)
  }

  // ---- MetaSync / MetaPurge -------------------------------------------
  //
  // Reference src/tools/MetaSync.java:40-50 (scan the data table,
  // create missing TSMeta/UIDMeta, fix wrong "created" times — the
  // earliest detected timestamp wins) and src/tools/MetaPurge.java
  // (drop meta rows). One relational pass each: the data side reduces
  // to (identity, earliest) under a single shuffle, the stored table
  // full-outer-joins on the identity, and every row is labeled
  //   ok | created | fixed_created | orphan
  // `orphan` (stored meta no data backs — MetaPurge's target) is kept
  // and flagged; [[purgeOrphans]] drops it.

  /**
   * Reconcile a STORED UIDMeta table — (kind, name, uid, created) —
   * against the points table. `registry` supplies name→uid (a data-
   * derived [[Introspect.uidRegistry]] or the CRUD-maintained table).
   * The reference only ever moves `created` EARLIER (a later stored
   * time is wrong by construction; an earlier one may predate retained
   * data), so `fixed_created` fires only on stored > earliest-in-data.
   */
  def syncUidMeta(points: DataFrame, registry: DataFrame,
                  stored: DataFrame): DataFrame = {
    // ONE scan for all three kinds (guide §2.4; same shape as
    // Introspect.uidRegistry): explode the concatenated (kind, name)
    // struct array instead of three union branches over the table
    val names = points
      .select(col("ts"), explode(concat(
        array(struct(lit("metric").as("kind"), col("metric").as("name"))),
        transform(map_keys(col("tags")),
          k => struct(lit("tagk").as("kind"), k.as("name"))),
        transform(map_values(col("tags")),
          v => struct(lit("tagv").as("kind"), v.as("name"))))).as("kn"))
      .select(col("kn.kind").as("kind"), col("kn.name").as("name"), col("ts"))
      .filter(col("name").isNotNull)
      .groupBy("kind", "name").agg(min(col("ts")).as("earliest"))
    val dataSide = names.join(registry, Seq("kind", "name"), "left")
    val j = dataSide.join(
      stored.withColumnRenamed("name", "stored_name")
        .withColumnRenamed("created", "stored_created"),
      Seq("kind", "uid"), "full_outer")
    val out = j.select(
      col("kind"),
      coalesce(col("name"), col("stored_name")).as("name"),
      col("uid"),
      when(col("stored_created").isNull, col("earliest"))
        .when(col("earliest").isNotNull &&
          col("stored_created") > col("earliest"), col("earliest"))
        .otherwise(col("stored_created")).as("created"),
      when(col("earliest").isNull, lit("orphan"))
        .when(col("stored_created").isNull, lit("created"))
        .when(col("stored_created") > col("earliest"), lit("fixed_created"))
        .otherwise(lit("ok")).as("status"))
    SearchPlugins.each(_.indexUidMeta(
      out.filter(col("status").isin("created", "fixed_created"))))
    out
  }

  /**
   * Reconcile a STORED TSMeta table — (tsuid, created) — against the
   * points table. `tsuid` names the series; defaults to the engine's
   * hex series hash, overridable with any deterministic surrogate
   * (e.g. [[Trees.canonicalTsuid]]).
   */
  def syncTsMeta(points: DataFrame, stored: DataFrame,
                 tsuid: Column = hex(graft.model.Points.seriesId(
                   col("metric"), col("tags")))): DataFrame = {
    val dataSide = points.select(tsuid.as("tsuid"), col("ts"))
      .groupBy("tsuid").agg(min(col("ts")).as("earliest"))
    val j = dataSide.join(
      stored.withColumnRenamed("created", "stored_created"),
      Seq("tsuid"), "full_outer")
    val out = j.select(
      col("tsuid"),
      when(col("stored_created").isNull, col("earliest"))
        .when(col("earliest").isNotNull &&
          col("stored_created") > col("earliest"), col("earliest"))
        .otherwise(col("stored_created")).as("created"),
      when(col("earliest").isNull, lit("orphan"))
        .when(col("stored_created").isNull, lit("created"))
        .when(col("stored_created") > col("earliest"), lit("fixed_created"))
        .otherwise(lit("ok")).as("status"))
    SearchPlugins.each(_.indexTsMeta(
      out.filter(col("status").isin("created", "fixed_created"))))
    out
  }

  /** MetaPurge: drop the rows [[syncUidMeta]]/[[syncTsMeta]] flagged as
    * data-less (reference src/tools/MetaPurge.java). */
  def purgeOrphans(synced: DataFrame): DataFrame =
    synced.filter(col("status") =!= "orphan")
}
