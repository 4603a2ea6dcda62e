package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Streaming scale-evidence harness (not part of the driver contract):
 * drives the stateful streaming operators with a file source split
 * into several micro-batches and records, per batch, the state-store
 * row count / bytes and the trigger latency from
 * `StreamingQueryProgress` — the measured counterpart to SCALING.md's
 * bounded-state arguments (state per series / per segment hash /
 * per pack bucket).
 *
 * Usage: runMain graft.StreamScale <srcDir> <label>
 *   e.g.  runMain graft.StreamScale /root/testdata/sf0.1 1x
 *         runMain graft.StreamScale /tmp/graft_scale10 10x
 * Prints one `STREAMSCALE` line per (operator, batch) plus a final
 * per-operator summary line.
 */
object StreamScale {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, label) = args.take(2)
    // optional third arg: comma-separated op subset for focused reruns
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = s"/tmp/graft_streamscale_$label"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(work), true)

    /** Write `df` as `nFiles` event-time-ordered files so the file
      * source replays it as an in-order stream of micro-batches. */
    def stage(df: DataFrame, orderCol: String, nFiles: Int,
              path: String): String = {
      df.repartitionByRange(nFiles, col(orderCol))
        .write.mode("overwrite").parquet(path)
      path
    }

    /** Run a streaming transform of a staged input to completion with
      * one file per micro-batch; report per-batch state + latency. */
    def drive(op: String, inPath: String,
              mk: DataFrame => DataFrame): Unit = {
      if (!only.forall(_.contains(op))) return
      val schema = spark.read.parquet(inPath).schema
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inPath)
      val q = mk(in).writeStream
        .format("noop")
        .option("checkpointLocation", s"$work/ckpt_$op")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      var maxRows = 0L; var maxBytes = 0L; var maxMs = 0L; var inRows = 0L
      progs.foreach { p =>
        val so = p.stateOperators.headOption
        val rows = so.map(_.numRowsTotal).getOrElse(0L)
        val bytes = so.map(_.memoryUsedBytes).getOrElse(0L)
        val ms = p.durationMs.getOrDefault("triggerExecution", 0L).longValue()
        maxRows = math.max(maxRows, rows); maxBytes = math.max(maxBytes, bytes)
        maxMs = math.max(maxMs, ms); inRows += p.numInputRows
        println(s"STREAMSCALE $label $op batch=${p.batchId} " +
          s"in=${p.numInputRows} stateRows=$rows stateBytes=$bytes " +
          s"batchMs=$ms")
      }
      println(s"STREAMSCALE-SUM $label $op batches=${progs.length} " +
        s"inRows=$inRows maxStateRows=$maxRows maxStateBytes=$maxBytes " +
        s"maxBatchMs=$maxMs")
      q.stop()
    }

    // ---- time-series operators over events-as-points ----------------
    val points = graft.model.Points.fromEvents(spark, srcDir)
    val nSeries = points
      .select(graft.model.Points.seriesId(col("metric"), col("tags")))
      .distinct.count()
    println(s"STREAMSCALE-INPUT $label points=${points.count()} " +
      s"series=$nSeries")
    val ptsPath = stage(points, "ts", 8, s"$work/points_in")

    // per-series rate: state bound = one (ts,value) per series
    drive("rate", ptsPath, in => graft.sources.Ingest.rateStream(in).toDF())
    // tumbling rollup: state bound = open windows x series within the
    // watermark horizon
    drive("rollup", ptsPath, in =>
      graft.sources.Ingest.rollupStream(in, "1 hour", "10 minutes"))
    // sliding avg: same machinery, overlap factor interval/slide
    drive("sliding", ptsPath, in =>
      graft.sources.Ingest.slidingAvgStream(in, "10 minutes", "5 minutes",
        "10 minutes"))

    // ---- trajectory operators over the raw interaction log ----------
    // sessionization: state = concurrently-OPEN session aggregates
    // (evicted at watermark close); funnel: buffered stage events per
    // OPEN user window (emitted + tombstoned at watermark close)
    val rawEv = graft.model.Points.rawEvents(spark, srcDir)
    val evPath = stage(rawEv, "ts", 8, s"$work/rawev_in")
    drive("sessions", evPath, in => graft.pipeline.Trajectories
      .sessionStream(in, gapMs = 1800000L, lateness = "10 minutes"))
    drive("funnel", evPath, in => graft.pipeline.Trajectories
      .funnelStream(in, Seq("view", "click", "purchase"),
        windowMs = 604800000L).toDF())

    // ---- document operators -----------------------------------------
    // arrivals 1 min apart in doc_id order: the stream spans days of
    // event time, so the 10-minute watermark horizon actually evicts —
    // the dedup operators' state must plateau at the per-horizon
    // distinct count, not grow with the corpus
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      .withColumn("arrival",
        timestamp_millis(lit(1704412800000L) + col("doc_id") * 60000L))
    println(s"STREAMSCALE-INPUT $label docs=${docs.count()}")
    val docsPath = stage(docs, "doc_id", 8, s"$work/docs_in")

    // segment dedup: state = one hash per distinct segment in horizon
    drive("segdedup", docsPath, in => graft.pipeline.Dedup
      .streamSegmentDedup(in, "text", "doc_id", "arrival", "10 minutes"))
    // sequence packing: state = ONE long per bucket, regardless of volume
    drive("pack", docsPath, in => graft.pipeline.TextAnalysis
      .streamPackSequences(in, "text", "doc_id", budget = 512,
        nBuckets = 8).toDF())
    // exact dedup at the ingest edge: 16 B per retained content hash
    drive("exactdedup", docsPath, in => graft.pipeline.Dedup
      .streamExactDedup(in, "text", "arrival", "10 minutes"))
    // arrivals-vs-arrivals NEAR-dup: state = band buckets of recent
    // members (≤ maxPerBucket shingle sets each), TTL-evicted at the
    // same 10-minute horizon — state must plateau with the horizon,
    // not grow with the corpus
    drive("neardedup", docsPath, in => graft.pipeline.Dedup
      .streamNearDedup(in, "text", "doc_id", "arrival", "10 minutes",
        stateTtlMs = 600000L).toDF())
    // long-document ADVERSARY for the near-dup state bound: 48 docs of
    // ~20k distinct shingles each (every token unique corpus-wide), so
    // per-member state is dominated by the stored shingle set. The
    // uncapped form's state grows with document length x bands; the
    // KMV-capped form (bottom-256 per member) must stay flat — the
    // measured counterpart of the maxStoredHashes bound
    val adv = spark.range(48).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(19999)),
          i => concat(lit("w"), col("id") * 20000 + i))).as("text"))
      .withColumn("arrival",
        timestamp_millis(lit(1704412800000L) + col("doc_id") * 60000L))
    val advPath = stage(adv, "doc_id", 8, s"$work/adv_in")
    drive("neardedup_adv_uncapped", advPath, in => graft.pipeline.Dedup
      .streamNearDedup(in, "text", "doc_id", "arrival", "10 minutes",
        stateTtlMs = 600000L, maxStoredHashes = Int.MaxValue).toDF())
    drive("neardedup_adv_kmv256", advPath, in => graft.pipeline.Dedup
      .streamNearDedup(in, "text", "doc_id", "arrival", "10 minutes",
        stateTtlMs = 600000L, maxStoredHashes = 256).toDF())
    // boilerplate screen: STATELESS claim at volume — frozen per-source
    // hash arrays broadcast; state rows must read 0 in every batch
    val refSets = graft.pipeline.Dedup.boilerplateRefSets(
      spark.read.parquet(s"$srcDir/documents.parquet"),
      "text", "doc_id", "source")
    drive("boiler", docsPath, in => graft.pipeline.Dedup
      .streamBoilerplateStrip(in, "text", "doc_id", "source", refSets))
    // DSIR scoring under a frozen ratio table: state = open
    // (doc, window) sums inside the watermark horizon, like the
    // unigram scorer — bounded by arrival rate, not corpus size
    val ratio = graft.pipeline.Sampling.dsirRatioTable(
      spark.read.parquet(s"$srcDir/documents.parquet"),
      "text", col("lang") === "en", buckets = 64)
    drive("dsir", docsPath, in => graft.pipeline.Sampling
      .streamScoreDsir(in, "text", "doc_id", "arrival", ratio,
        buckets = 64))

    spark.stop()
  }
}
