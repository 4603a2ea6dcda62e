package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Histogram data points and percentile extraction (reference:
 * src/core/HistogramDataPoint.java:56-67 interface,
 * src/core/SimpleHistogram.java bundled codec,
 * histogram queries test/core/TestTsdbQueryHistogramQueries.java).
 *
 * Spark-native model (SURVEY §1.5): a histogram is rows of
 * (group, bucket_lo, bucket_hi, count) — relational rather than an
 * opaque blob, so bucket merging across series/time is a plain
 * groupBy(bucket).sum(count) and Catalyst handles partial aggregation.
 * Percentile extraction walks the cumulative distribution with a
 * window, interpolating linearly inside the target bucket.
 */
object Histograms {

  /** Build fixed-width histogram rows from raw points:
    * bucket i = [i*width, (i+1)*width). */
  def fromPoints(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 width: Double): DataFrame = {
    val b = floor(col(valueCol) / width)
    df.withColumn("bucket_lo", b * width)
      .withColumn("bucket_hi", (b + 1) * width)
      .groupBy((groupCols.map(col) :+ col("bucket_lo")) :+ col("bucket_hi"): _*)
      .agg(count(lit(1)).as("count"))
  }

  /**
   * Percentile from histogram rows, per group: the value v such that a
   * fraction p of the mass lies below, interpolated linearly within
   * the bucket that crosses the threshold:
   *   v = lo + (hi - lo) * (p*total - cum_below) / bucket_count
   */
  def percentile(hist: DataFrame, groupCols: Seq[String], p: Double): DataFrame =
    percentiles(hist, groupCols, Seq(p)).drop("__p")

  /**
   * Multi-percentile extraction in ONE pass: the cumulative
   * distribution (two windows over the histogram rows) is computed
   * once and every requested fraction probes it via an exploded
   * literal — where the old per-p form union'd one full
   * scan→aggregate→window branch PER percentile (P passes over the
   * histogram table for P percentiles, visible as P `Scan parquet`
   * nodes in q96's before-plan). Per-p rows and values are identical
   * to the single-p form (same crossing filter, same interpolation,
   * evaluated against the same cum/total). Emits groupCols + `__p`
   * (the requested fraction, exactly as passed) + `value`.
   */
  def percentiles(hist: DataFrame, groupCols: Seq[String],
                  ps: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket_lo"))
    val cum = hist
      .withColumn("cum", sum(col("count")).over(w))
      .withColumn("total", sum(col("count")).over(
        Window.partitionBy(groupCols.map(col): _*)))
      .withColumn("__p", explode(typedlit(ps)))
    val target = col("total") * col("__p")
    // first bucket whose cumulative count reaches the target
    cum.filter(col("cum") >= target && (col("cum") - col("count")) < target)
      .withColumn("value",
        col("bucket_lo") + (col("bucket_hi") - col("bucket_lo")) *
          (target - (col("cum") - col("count"))) / col("count"))
      .select(groupCols.map(col) ++ Seq(col("__p"), col("value")): _*)
  }

  /**
   * The BUNDLED codec's OWN percentile definition (reference
   * SimpleHistogram.percentile, src/core/SimpleHistogram.java:133-164):
   * the MIDPOINT of the first bucket whose cumulative share reaches
   * the percent, on the [1, 100] domain (outside it the reference
   * returns -1), with underflow/overflow counts excluded from the
   * total (calcBucketSum:124-131 iterates the bucket map only — and
   * [[simpleHistogramDecode]] likewise never materializes the blob's
   * trailing under/overflow longs as buckets).
   *
   * The engine's default [[percentile]] interpolates linearly inside
   * the crossing bucket instead — a deliberate, documented smoothing
   * divergence (midpoints quantize every percentile of a wide bucket
   * to one value); a deployment needing SimpleHistogram wire parity
   * for stored-blob queries extracts with this form.
   */
  def simplePercentile(hist: DataFrame, groupCols: Seq[String],
                       percent: Double): DataFrame = {
    if (percent < 1.0 || percent > 100.0)
      return hist.select(groupCols.map(col): _*).distinct()
        .withColumn("value", lit(-1.0))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bucket_lo"))
    val cum = hist
      .withColumn("cum", sum(col("count")).over(w))
      .withColumn("total", sum(col("count")).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val share = col("cum") * 100.0 / col("total")
    val prevShare = (col("cum") - col("count")) * 100.0 / col("total")
    // the first crossing bucket: a zero-count bucket can never be it
    // (its share equals its predecessor's), matching the reference's
    // first-entry-where-share-reaches loop
    cum.filter(share >= percent && prevShare < percent)
      .withColumn("value", (col("bucket_lo") + col("bucket_hi")) / 2.0)
      .select(groupCols.map(col) :+ col("value"): _*)
  }

  // ---- codec plugin point (reference HistogramCodecManager,
  // src/core/HistogramCodecManager.java:47-120: a thread-safe map of
  // codec ids to blob decoders; the id travels with the stored blob,
  // so it can never change once data is written) ----------------------

  /** One decoded bucket. */
  case class Bucket(lo: Double, hi: Double, count: Long)

  private val codecs = scala.collection.concurrent.TrieMap
    .empty[Int, Array[Byte] => Seq[Bucket]]

  /** Register a codec under an id (the reference's config-file mapping
    * `class → id`, done here as a runtime call like the custom
    * aggregator / gexp function registries). Decoders must return an
    * empty Seq, not throw, on payloads they cannot parse. */
  def registerCodec(id: Int, decode: Array[Byte] => Seq[Bucket]): Unit =
    codecs.put(id, decode)

  /** The bundled codec (id 0): the reference SimpleHistogram wire
    * layout (src/core/SimpleHistogram.java:76-120) minus the Kryo
    * framing — big-endian u16 bucket count then (f32 lo, f32 hi,
    * i64 count) triples. */
  val SIMPLE_CODEC_ID = 0

  def simpleHistogramDecode(bytes: Array[Byte]): Seq[Bucket] = {
    if (bytes == null || bytes.length < 2) return Seq.empty
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getShort & 0xffff
    if (bytes.length < 2 + n * 16) return Seq.empty
    (0 until n).map { _ =>
      Bucket(in.getFloat.toDouble, in.getFloat.toDouble, in.getLong)
    }
  }

  def simpleHistogramEncode(buckets: Seq[Bucket]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + buckets.length * 16)
    out.putShort(buckets.length.toShort)
    buckets.foreach { b =>
      out.putFloat(b.lo.toFloat); out.putFloat(b.hi.toFloat)
      out.putLong(b.count)
    }
    out.array()
  }

  registerCodec(SIMPLE_CODEC_ID, simpleHistogramDecode)

  /**
   * Parse the `tsd.core.histograms.config` document — `{"decoder
   * name": id, ...}` — and register each named decoder (reference
   * HistogramCodecManager ctor, src/core/HistogramCodecManager
   * .java:70-141, error texts verbatim): a null/empty config, an id
   * outside 0-255, or a duplicate id are IllegalArgumentExceptions; a
   * name `resolve` cannot supply is the reference's IllegalState
   * "Unable to find a decoder named '<name>'". The reference
   * Class.forName-loads each name; here `resolve` maps a decoder name
   * to its function (the classpath is the caller's concern — same
   * split as the rollup registryTables resolver). An empty mapping
   * object registers nothing and is NOT an error (the reference only
   * warns). Returns the (name → id) mapping in config order.
   */
  def parseCodecConfig(config: String,
                       resolve: String => Option[Array[Byte] => Seq[Bucket]])
      : Seq[(String, Int)] = {
    if (config == null || config.isEmpty)
      throw new IllegalArgumentException(
        "Missing configuration 'tsd.core.histograms.config'")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(config)
    if (node == null || !node.isObject)
      throw new IllegalArgumentException(
        "Unable to parse the given JSON")
    import scala.jdk.CollectionConverters._
    // the reference binds Map<String, Integer> via Jackson
    // (HistogramCodecManager.java:77-91, JSON.parseToObject wrapping
    // JsonMappingException as IllegalArgumentException): integral
    // numbers bind, digit strings coerce, floats truncate
    // (ACCEPT_FLOAT_AS_INT default), anything else fails the parse —
    // never a silent 0 that would shadow SIMPLE_CODEC_ID
    val mappings = node.fields().asScala.toSeq.map { e =>
      val v = e.getValue
      val id =
        if (v.isIntegralNumber && v.canConvertToInt) v.asInt()
        else if (v.isFloatingPointNumber) v.asDouble().toInt
        else if (v.isTextual)
          try v.asText().trim.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException("Unable to parse the given JSON")
          }
        else throw new IllegalArgumentException("Unable to parse the given JSON")
      e.getKey -> id
    }
    val seen = scala.collection.mutable.Set[Int]()
    // validate + resolve EVERYTHING before touching the registry, so a
    // bad document never leaves a partial registration behind (the
    // reference's ctor-owned map gets discarded with the thrown ctor;
    // a global registry needs the same all-or-nothing)
    val resolved = mappings.map { case (name, id) =>
      if (id < 0 || id > 255) throw new IllegalArgumentException(
        s"ID for codec '$name' must be from 0 to 255.")
      if (!seen.add(id)) throw new IllegalArgumentException(
        s"Duplicate ID found for codec '$name': $id")
      resolve(name) match {
        case Some(decode) => (id, decode)
        case None => throw new IllegalStateException(
          s"Unable to find a decoder named '$name'")
      }
    }
    resolved.foreach { case (id, d) => registerCodec(id, d) }
    mappings
  }

  /**
   * Inverse of [[decodeBlobs]]: one SimpleHistogram blob per group
   * from relational bucket rows — the write side of the stored-
   * histogram lifecycle (reference addHistogramPoint,
   * src/core/TSDB.java; blob layout SimpleHistogram.java:76-120).
   * Bounded per group: the collected array is the group's bucket
   * list (≤ value-range / bin-width entries), never the point count.
   */
  def encodeBlobs(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("bucket_lo"),
        col("bucket_hi"), col("count")))).as("__bs"))
    val keep = groupCols.map(c => grouped.schema(c))
    val outSchema = StructType(keep ++ Seq(
      StructField("codec_id", IntegerType, nullable = false),
      StructField("blob", BinaryType)))
    val keptIdx = groupCols.map(grouped.schema.fieldIndex)
    val bsIdx = grouped.schema.fieldIndex("__bs")
    grouped.mapPartitions { rows =>
      rows.map { r =>
        val kept = keptIdx.map(r.get)
        val bs = r.getSeq[Row](bsIdx).map(b =>
          Bucket(b.getDouble(0), b.getDouble(1), b.getLong(2)))
        Row.fromSeq((kept :+ Int.box(SIMPLE_CODEC_ID)) :+
          simpleHistogramEncode(bs))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * Decode a table of stored histogram blobs to relational bucket rows
   * via the codec registry: (groupCols..., codecIdCol, blobCol) →
   * (groupCols..., bucket_lo, bucket_hi, count). Runs per-partition
   * inside the SQL engine (same shape as the multimodal codec path) —
   * an unknown codec id or undecodable blob yields no rows for that
   * record, mirroring the reference's skip-and-log read behavior. The
   * output feeds [[percentile]] directly.
   */
  def decodeBlobs(df: DataFrame, groupCols: Seq[String],
                  codecIdCol: String = "codec_id",
                  blobCol: String = "blob"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val keep = groupCols.map(c => df.schema(c))
    val outSchema = StructType(keep ++ Seq(
      StructField("bucket_lo", DoubleType), StructField("bucket_hi", DoubleType),
      StructField("count", LongType)))
    val keptIdx = groupCols.map(df.schema.fieldIndex)
    val idIdx = df.schema.fieldIndex(codecIdCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    // snapshot the registry INTO the task closure: executors are fresh
    // JVMs whose object initializer only knows the bundled codec, so
    // driver-side registrations must travel with the plan (and a
    // decode is thereby pinned to the codecs known when it was planned,
    // the reference's write-time id binding)
    val codecSnapshot = codecs.toMap
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val kept = keptIdx.map(r.get)
        codecSnapshot.get(r.getAs[Number](idIdx).intValue).toSeq
          .flatMap(_(r.getAs[Array[Byte]](blobIdx)))
          // append one-by-one: Seq(b.lo, b.hi, b.count) would unify the
          // element type to Double and silently widen the Long count
          .map(b => Row.fromSeq(kept :+ b.lo :+ b.hi :+ b.count))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .groupBy((groupCols.map(col) :+ col("bucket_lo")) :+ col("bucket_hi"): _*)
      .agg(sum(col("count")).as("count"))
  }
}
