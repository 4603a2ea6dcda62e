package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Annotations — notes attached to a series (or globally) over a time
 * range (reference: src/meta/Annotation.java:79-110 model,
 * src/tsd/AnnotationRpc.java CRUD, query-time merge
 * src/tsd/QueryRpc.java:124-320).
 *
 * Model: a DataFrame with nullable series-key columns (null = global
 * annotation), start_ts, end_ts, description. CRUD is plain table
 * append/overwrite; the query-side operator below attaches to each
 * result row the annotations whose interval covers its timestamp.
 *
 * Scale note: a raw interval join would be a broadcast-nested-loop.
 * Banding by time bucket turns it into an equi-join on the bucket
 * (annotations explode to the buckets they span), with the exact
 * interval test as a post-filter.
 */
object Annotations {

  val BUCKET_MS = 3600000L

  /** Attach matching annotations to result rows (needs a `ts` column).
    * Global annotations (null key columns) match every series. */
  def attach(results: DataFrame, annotations: DataFrame,
             keyCols: Seq[String]): DataFrame = {
    val ann = annotations.select(
        keyCols.map(k => col(k).as(s"a_$k")) ++
          Seq(col("start_ts"), col("end_ts"), col("description")): _*)
      .withColumn("ab", explode(sequence(
        (col("start_ts") / BUCKET_MS).cast("long"),
        (col("end_ts") / BUCKET_MS).cast("long"))))
    val r = results.withColumn("rb", (col("ts") / BUCKET_MS).cast("long"))
    val cond = r("rb") === ann("ab") &&
      r("ts").between(ann("start_ts"), ann("end_ts")) &&
      keyCols.map(k => ann(s"a_$k").isNull || ann(s"a_$k") === r(k))
        .reduceOption(_ && _).getOrElse(lit(true))
    r.join(ann, cond, "left")
      .drop("rb", "ab")
      .drop(keyCols.map(k => s"a_$k"): _*)
  }

  // ---- CRUD (reference src/tsd/AnnotationRpc.java) --------------------
  //
  // Storage-agnostic DataFrame transforms: the caller owns persistence
  // (overwrite the annotation table / Delta MERGE). Identity of an
  // annotation = (series key columns, start_ts), matching the
  // reference's (tsuid, start_time) row key.

  /** Create-or-update: rows in `edits` replace table rows with the same
    * (keyCols, start_ts) identity — the reference's PUT upsert
    * (Annotation.syncToStorage overwrite=true: every user-accessible
    * field takes the request's value, unset ones their defaults —
    * TestAnnotationRpc.modifyPut expects notes reset to ""). */
  def upsert(table: DataFrame, edits: DataFrame,
             keyCols: Seq[String]): DataFrame = {
    SearchPlugins.each(_.indexAnnotation(edits))
    val id = keyCols :+ "start_ts"
    table.join(edits.select(id.map(col): _*), id, "left_anti")
      .unionByName(edits)
  }

  /**
   * POST merge-upsert (Annotation.syncToStorage overwrite=false →
   * syncNote, src/meta/Annotation.java:556-577): a field the request
   * did NOT set keeps the stored value — TestAnnotationRpc.modify
   * expects `description=Boo` while the stored `notes` survives. At
   * the DataFrame level "not set" = null in the edit row, so merged
   * field = coalesce(edit, stored). New identities insert as-is.
   * An edit row with EVERY field null is the reference's "No changes
   * detected in Annotation data" IllegalStateException (the RPC's 304).
   */
  def upsertMerge(table: DataFrame, edits: DataFrame,
                  keyCols: Seq[String]): DataFrame = {
    val fields = table.columns.filterNot((keyCols :+ "start_ts").contains)
    val id = keyCols :+ "start_ts"
    // an edit row that sets NOTHING (every field null) is the
    // reference's IllegalStateException — syncToStorage's
    // changed-map gate (Annotation.java:162-172) fires before any
    // storage call. Wire-sized edit batch → the driver-side check is
    // one action over request rows, never data-scaled.
    if (!edits.filter(fields.map(col(_).isNull).reduce(_ && _)).isEmpty)
      throw new IllegalStateException(
        "No changes detected in Annotation data")
    SearchPlugins.each(_.indexAnnotation(edits))
    // duplicate identities within ONE edit batch pre-merge fieldwise
    // (per-field max, which skips nulls) — the reference's bulk path
    // applies list items sequentially so the last writer wins by
    // arrival order; a DataFrame has no order, so the resolution is
    // the deterministic max (the established collision-winner policy).
    // Without this a full-outer join would emit one row per duplicate.
    val e = edits.groupBy(id.map(col): _*)
      .agg(fields.map(c => max(col(c)).as(c)).head,
        fields.map(c => max(col(c)).as(c)).tail: _*)
      .select(table.columns.map(c => col(c).as(s"__e_$c")): _*)
    val cond = id.map(c => table(c) <=> e(s"__e_$c")).reduce(_ && _)
    val merged = table.join(e, cond, "full_outer")
      .select(
        id.map(c => coalesce(table(c), e(s"__e_$c")).as(c)) ++
          fields.map(c => coalesce(e(s"__e_$c"), table(c)).as(c)): _*)
    merged
  }

  /** Delete by identity — DELETE /api/annotation. `ids` carries the
    * (keyCols, start_ts) rows to remove; key matching is null-safe so
    * global annotations (null key columns) are addressable too. */
  def delete(table: DataFrame, ids: DataFrame,
             keyCols: Seq[String]): DataFrame = {
    SearchPlugins.each(_.deleteAnnotation(ids))
    val idRows = ids.select((keyCols :+ "start_ts").map(c =>
      col(c).as(s"__d_$c")): _*)
    val cond = (keyCols.map(k => table(k) <=> idRows(s"__d_$k")) :+
      (table("start_ts") === idRows("__d_start_ts"))).reduce(_ && _)
    table.join(idRows, cond, "left_anti")
  }

  /** Bulk delete: annotations whose START falls in [startTs, endTs] —
    * the reference's range membership is the annotation's start_time
    * read back from the column qualifier, never an interval-overlap
    * test (Annotation.deleteRange, src/meta/Annotation.java:395-475:
    * `timestamp < start_time || timestamp > end_time` skips). Global
    * ones only when `globalOnly` (AnnotationRpc bulk path). */
  def bulkDelete(table: DataFrame, startTs: Long, endTs: Long,
                 keyCols: Seq[String], globalOnly: Boolean = false): DataFrame = {
    val inRange = col("start_ts").between(startTs, endTs)
    val isGlobal = keyCols.map(k => col(k).isNull)
      .reduceOption(_ && _).getOrElse(lit(true))
    table.filter(!(inRange && (if (globalOnly) isGlobal else lit(true))))
  }

  /** Global annotations in a time range (null key columns), attached to
    * query output when requested (reference QueryRpc globalAnnotations,
    * src/tsd/QueryRpc.java:124-320). Membership = the annotation's
    * START time in [startTs, endTs] (Annotation.getGlobalAnnotations
    * scans row keys/qualifiers, which encode start_time — an
    * annotation STARTING before the window never appears, however far
    * its end_ts reaches; src/meta/Annotation.java:304-390). */
  def globals(table: DataFrame, keyCols: Seq[String],
              startTs: Long, endTs: Long): DataFrame =
    table.filter(col("start_ts").between(startTs, endTs) &&
      keyCols.map(k => col(k).isNull).reduceOption(_ && _).getOrElse(lit(true)))

  /**
   * GET `/api/annotation` single-fetch (reference AnnotationRpc
   * .fetchSingleAnnotation:340-350 + the start_time gate in
   * parseQS:314-318): identity = (key values, start_ts) with null-safe
   * key matching so global rows (null keys) are addressable; a
   * start_ts < 1 is the reference's "Missing start time" and an absent
   * identity its 404 text.
   */
  def getOne(table: DataFrame, keyCols: Seq[String],
             keyVals: Seq[Option[String]], startTs: Long): DataFrame = {
    if (startTs < 1)
      throw new IllegalArgumentException("Missing start time")
    val cond = keyCols.zip(keyVals).map { case (k, v) =>
      col(k) <=> v.map(lit(_)).getOrElse(lit(null)) }
      .foldLeft(col("start_ts") === startTs)(_ && _)
    val out = table.filter(cond)
    if (out.isEmpty) throw new NoSuchElementException(
      "Unable to locate annotation in storage")
    out
  }

  /**
   * DELETE `/api/annotation/bulk` (reference AnnotationRpc
   * .executeBulkDelete:245-297 + AnnotationBulkDelete POJO:395-435):
   * deletes the start-in-range annotations of each listed series and,
   * with `global`, the global ones; end time defaults to `now`
   * (getEndTime), the start is required so "a timestamp of 0 to
   * delete all annotations" can't happen by accident, and a request
   * naming neither tsuids nor global is rejected — both error texts
   * verbatim. Returns (survivors, totalDeleted) — the response
   * document echoes the request with `totalDeleted` filled.
   */
  def bulkDeleteRpc(table: DataFrame, keyCols: Seq[String],
                    tsuids: Seq[Seq[Option[String]]] = Seq.empty,
                    global: Boolean = false,
                    startTs: Option[Long] = None, endTs: Long = 0L,
                    now: Long = System.currentTimeMillis())
      : (DataFrame, Long) = {
    val start = startTs.getOrElse(throw new IllegalArgumentException(
      "Missing the start time value"))
    if (!global && tsuids.isEmpty) throw new IllegalArgumentException(
      "Missing the TSUIDs or global annotations flag")
    val end = if (endTs == 0L) now else endTs
    // deleteRange's own guards (Annotation.java:397-403) — an inverted
    // or unset end range is an error, never a silent totalDeleted=0
    if (end < 1) throw new IllegalArgumentException(
      "The end timestamp has not been set")
    if (end < start) throw new IllegalArgumentException(
      "The end timestamp cannot be less than the start timestamp")
    val inRange = col("start_ts").between(start, end)
    val isGlobal = keyCols.map(k => col(k).isNull)
      .reduceOption(_ && _).getOrElse(lit(false))
    val matchesSeries = tsuids.map { vals =>
      keyCols.zip(vals).map { case (k, v) =>
        col(k) <=> v.map(lit(_)).getOrElse(lit(null)) }
        .reduceOption(_ && _).getOrElse(lit(false))
    }.reduceOption(_ || _).getOrElse(lit(false))
    val doomed = inRange &&
      ((if (global) isGlobal else lit(false)) || matchesSeries)
    val survivors = table.filter(!doomed)
    val deleted = table.count() - survivors.count()
    SearchPlugins.each(_.deleteAnnotation(table.filter(doomed)))
    (survivors, deleted)
  }

  /** GET `/api/annotations` (reference fetchMultipleAnnotations:
    * 352-365): global annotations from start_ts to end_ts, end_ts = 0
    * defaulting to `now`; the "Missing start time" gate plus
    * getGlobalAnnotations' own end-timestamp validations
    * (Annotation.java:306-312). */
  def getGlobalsRpc(table: DataFrame, keyCols: Seq[String], startTs: Long,
                    endTs: Long = 0L,
                    now: Long = System.currentTimeMillis()): DataFrame = {
    if (startTs < 1)
      throw new IllegalArgumentException("Missing start time")
    val end = if (endTs == 0L) now else endTs
    if (end < 1) throw new IllegalArgumentException(
      "The end timestamp has not been set")
    if (end < startTs) throw new IllegalArgumentException(
      "The end timestamp cannot be less than the start timestamp")
    globals(table, keyCols, startTs, end)
  }
}
