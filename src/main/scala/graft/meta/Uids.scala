package graft.meta

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    // dense continuation per kind: window over the REQUEST rows only
    // (wire-sized), rebased on the registry's per-kind max
    val bases = registry.groupBy("kind").agg(max(col("uid")).as("base"))
    val assigned = fresh
      .join(broadcast(bases), Seq("kind"), "left")
      .withColumn("uid", coalesce(col("base"), lit(0L)) +
        row_number().over(
          Window.partitionBy(col("kind")).orderBy(col("name"))))
      .drop("base")
    val report = existing
      .unionByName(assigned.withColumn("error", lit(null: String)))
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

  private def upsertBy(table: DataFrame, edits: DataFrame,
                       id: Seq[String]): DataFrame =
    table.join(edits.select(id.map(col): _*), id, "left_anti")
      .unionByName(edits)
}
