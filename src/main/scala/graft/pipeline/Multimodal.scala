package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, plus a decode/feature-extract stage.
 *
 * The real decode (JPEG/PNG/audio codecs) is STUBBED with a
 * deterministic byte-level fake — the image/audio libraries are not in
 * this container — but the Spark-side plumbing is real: schema shape
 * (binary payload + metadata struct), batch-friendly partition-level
 * processing, and a columnar feature extraction that whole-stage
 * codegens.
 *
 * At scale the pattern is: binary payloads live in their own parquet
 * column (column pruning keeps metadata-only queries from reading
 * bytes at all); decode runs per-partition with bounded batch size.
 */
object Multimodal {

  /** Media record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true))), nullable = false)
  ))

  /** Wrap a text table as fake media rows (payload = utf-8 bytes,
    * metadata derived deterministically) — test harness for the
    * pipeline shape. */
  def fromDocuments(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit("fake/raw").as("format"),
        (pmod(col(idCol), lit(64)) + 1).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 1).cast("int").as("height")).as("meta"))

  /**
   * STUB decode / feature-extract: nFeatures values from the leading
   * payload bytes (hex-pair → [0,1]). A real deployment swaps the
   * expression for a per-partition codec call with the same signature
   * (payload → fixed-width float vector); everything downstream
   * (schema, partitioning, batch shape) is unchanged.
   */
  def decodeFeatures(payload: Column, nFeatures: Int): Column = {
    val hx = hex(payload)
    array((0 until nFeatures).map { i =>
      coalesce(
        conv(substring(hx, i * 2 + 1, 2), 16, 10).cast("double") / 255.0,
        lit(0.0))
    }: _*)
  }

  /** Partition-level batch decode demonstrating the mapPartitions
    * shape used when the codec is a native library with per-batch
    * setup cost. Deterministic fake: mean byte value. */
  def decodeBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("mean_byte", DoubleType, nullable = true))
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition "codec init" would happen here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val mean =
          if (payload == null || payload.isEmpty) null
          else java.lang.Double.valueOf(
            payload.map(b => (b & 0xff).toDouble).sum / payload.length)
        Row.fromSeq(r.toSeq :+ mean)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
