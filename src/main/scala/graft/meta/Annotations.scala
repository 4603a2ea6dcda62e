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
}
