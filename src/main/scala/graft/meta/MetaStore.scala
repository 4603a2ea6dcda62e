package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed persistent meta tables — the storage layer behind the
 * discovery endpoints' O(series) paths ([[Introspect.lastWriteMeta]] /
 * [[Introspect.seriesMeta]]).
 *
 * The reference pays O(batch) per write to keep its meta current: the
 * tsdb-meta table's ts_counter / TSMeta rows are incremented per
 * ingested point (reference TSDB.java tsuid tracking,
 * src/meta/TSUIDQuery.java:239-316 reads them back). The naive
 * relational fold — `stored.unionByName(agg(batch)).groupBy(key)` with
 * a full-table rewrite — is correct but O(series) per MICRO-BATCH: at
 * 10⁷-10⁹ series that is the wrong cost shape, a full shuffle + file
 * rewrite every few seconds for a batch that touched a handful of
 * series.
 *
 * This store is the relational equivalent of the per-key increment:
 * the meta table persists as parquet PARTITIONED by a series-hash
 * bucket column (`bucket = pmod(hash(series key), N)`), and a fold
 *   1. aggregates the batch (O(batch), map-side combine),
 *   2. lists the buckets the batch touches (≤ N values, driver-side),
 *   3. reads ONLY those partitions back (partition pruning on the
 *      directory column — untouched buckets are never opened),
 *   4. merges with the batch aggregate (associative combine),
 *   5. dynamic-partition-overwrites ONLY the touched buckets
 *      (`partitionOverwriteMode=dynamic` replaces exactly the
 *      partitions present in the written frame; every other bucket's
 *      files are left byte-identical on disk).
 * Per-fold cost is O(batch + series_in_touched_buckets): independent
 * of total series count once N is sized so a batch touches a small
 * fraction of buckets. On a lakehouse table format this fold is
 * `MERGE INTO ... ON key` with partition pruning; plain parquet has no
 * row-level merge, so touched-bucket overwrite is the equivalent.
 *
 * The merged frame is `localCheckpoint`ed before the write: Spark
 * (correctly) refuses to overwrite files an in-flight plan still
 * reads, and the checkpoint is bounded by the touched buckets' rows —
 * the same O(series-slice) the fold already holds in the shuffle.
 */
object MetaStore {

  /** Default bucket count. Sized so a micro-batch touches a fraction
    * of buckets at large series cardinality while small stores stay a
    * handful of files; production tables tune it like any partition
    * grain (≥ executor count, ≤ thousands of dirs). */
  val DefaultBuckets = 64

  /** Deterministic bucket of a lastWriteMeta row (keyed by tsuid). */
  def lastWriteBucket(n: Int): Column =
    pmod(xxhash64(col("tsuid")), lit(n.toLong)).cast("int")

  /** Deterministic bucket of a seriesMeta row (keyed by metric+tags —
    * the same hash as [[graft.model.Points.seriesId]], so points
    * bucketing and meta bucketing agree on placement). */
  def seriesBucket(n: Int): Column =
    pmod(graft.model.Points.seriesId(col("metric"), col("tags")),
      lit(n.toLong)).cast("int")

  /** Fold one micro-batch of POINTS into a persistent
    * [[Introspect.lastWriteMeta]] store at `path`. Returns the bucket
    * ids the fold rewrote (empty batch → no write, empty result). */
  def foldLastWrite(spark: SparkSession, path: String, batch: DataFrame,
                    buckets: Int = DefaultBuckets): Seq[Int] =
    fold(spark, path, Introspect.lastWriteMeta(batch),
      lastWriteBucket(buckets), Introspect.combineLastWrite)

  /** Fold one micro-batch of POINTS into a persistent
    * [[Introspect.seriesMeta]] store at `path`. */
  def foldSeriesMeta(spark: SparkSession, path: String, batch: DataFrame,
                     buckets: Int = DefaultBuckets): Seq[Int] =
    fold(spark, path, Introspect.seriesMeta(batch),
      seriesBucket(buckets), Introspect.combineSeriesMeta)

  /** Read a stored meta table back for the endpoints (lookup /
    * suggest / queryLast take it as their `meta`/`lastMeta` argument);
    * the bucket column is an internal placement detail and is
    * dropped. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("bucket")

  /** Read ONLY the buckets that can hold the given tsuids — the
    * point-lookup path for a tsuid-addressed `/api/query/last` over a
    * bucketed lastWriteMeta store: bucket = f(tsuid) is computed
    * driver-side (a wire-sized request list), so the scan carries a
    * PartitionFilter and opens ≤ |tsuids| directories of the store no
    * matter how many series it holds. */
  def readLastWriteFor(spark: SparkSession, path: String,
                       tsuids: Seq[String],
                       buckets: Int = DefaultBuckets): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    // the same hash the fold used, evaluated on the request list
    val ids = spark.createDataFrame(
      tsuids.map(t => Row(t.toUpperCase)).asJava,
      StructType(Seq(StructField("tsuid", StringType))))
      .select(lastWriteBucket(buckets).as("b"))
      .collect().map(_.getInt(0)).distinct.toSeq
    spark.read.parquet(path)
      .filter(col("bucket").isin(ids.map(Int.box): _*))
      .drop("bucket")
      .filter(col("tsuid").isin(tsuids.map(_.toUpperCase): _*))
  }

  private def fold(spark: SparkSession, path: String, batchAgg: DataFrame,
                   bucket: Column, combine: (DataFrame, DataFrame) => DataFrame)
      : Seq[Int] = {
    // materialize the batch aggregate once (bounded by the batch's own
    // series): it is read twice — for the touched-bucket list and the
    // merge — and must not recompute against a moving source
    val b = batchAgg.withColumn("bucket", bucket).localCheckpoint(true)
    // ≤ bucket-count rows: a bounded driver-side list, never data-scaled
    val touched = b.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Seq.empty
    val exists = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val merged =
      if (!exists) b
      else {
        // partition-pruned read: `bucket` is the directory column, so
        // untouched buckets are never listed into the scan
        val storedTouched = spark.read.parquet(path)
          .filter(col("bucket").isin(touched.map(Int.box): _*))
        combine(storedTouched.drop("bucket"), b.drop("bucket"))
          .withColumn("bucket", bucket)
      }
    // break lineage off the store's own files before overwriting them;
    // bounded by the touched buckets' rows
    merged.localCheckpoint(true)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(path)
    touched
  }
}
