package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Export — the reference's DumpSeries tool (src/tools/DumpSeries.java:42)
 * re-expressed as a DataFrame→lines transform whose output round-trips
 * through Ingest.parsePutLines. Writing is the caller's choice of sink
 * (`.write.text`, stream, ...), so the operator itself stays pure.
 */
object Export {

  /** Canonical points → `put <metric> <ts> <value> <tagk=tagv> ...`
    * lines (import format, `--import` flag of DumpSeries). Integer
    * points print their long form so a round-trip preserves `is_int`;
    * tags are emitted sorted by key like the reference row key. */
  def toPutLines(points: DataFrame): DataFrame = {
    val valueStr = when(col("is_int") && col("value_l").isNotNull,
        col("value_l").cast("string"))
      .otherwise(col("value").cast("string"))
    val tagStr = array_join(
      transform(array_sort(map_entries(col("tags"))),
        e => concat_ws("=", e.getField("key"), e.getField("value"))), " ")
    points.select(concat_ws(" ",
      lit("put"), col("metric"), col("ts").cast("string"),
      valueStr, tagStr).as("value"))
  }
}
