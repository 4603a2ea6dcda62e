package graft

import graft.meta.{Annotations, Introspect, Uids}
import graft.model.Points
import graft.sources.{Export, Ingest}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/**
 * Structured Streaming ingest + rollup materialization actually
 * executed on MemoryStreams (reference semantics: compaction-time
 * last-write-wins dedup src/core/CompactionQueue.java:267-500, rollup
 * writing src/rollup/RollupUtils.java:120-160), plus the metadata /
 * export / limits surface.
 */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streaming ingest: parse, watermark dedup, parquet sink") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Files.createTempDirectory("graft_stream_out").toString
    val cp = Files.createTempDirectory("graft_stream_cp").toString
    val q = Ingest.streamToParquet(spark, mem.toDF(), out, cp).start()
    mem.addData(
      "put cpu 1700000000 1 host=a",
      "put cpu 1700000000 1 host=a", // exact duplicate → dropped
      "put cpu 1700000060 2.5 host=a",
      "put cpu 1700000060 7 host=b",
      "this is not a put line") // parse error → dropped
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)
    assert(rows.filter(col("metric") === "cpu" && col("ts") === 1700000000000L)
      .count() == 1)
  }

  test("streaming last-write meta: foreachBatch max-merge == batch " +
       "recompute, out-of-order arrivals included") {
    // the reference updates the meta ts_counter per ingested point
    // (tsuid tracking); the Spark maintenance is a foreachBatch
    // max-merge into the stored lastWriteMeta table. Folding the
    // micro-batches must equal the offline batch recompute (the
    // MetaSync reconciliation) even when an old point arrives last.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ptsCols = Points.schema.fieldNames.map(col).toSeq
    val mem = MemoryStream[String]
    var stored: org.apache.spark.sql.DataFrame = null
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val pts = Ingest.parsePutLines(batch.toDF())
          .filter(col("_error").isNull).select(ptsCols: _*)
        if (!pts.isEmpty) {
          val merged =
            if (stored == null) Introspect.lastWriteMeta(pts)
            else Introspect.mergeLastWrite(stored, pts)
          // persist the O(series) state locally, as a sink would store it
          stored = spark.createDataFrame(
            spark.sparkContext.parallelize(merged.collect().toSeq),
            merged.schema)
        }
      }.start()
    val lines = Seq(
      "put cpu 1700003600 1 host=a",
      "put cpu 1700007200 2 host=a",   // newer write, same series
      "put cpu 1700000000 9 host=a",   // OLD point arriving later
      "put cpu 1700003600 5 host=b",
      "put mem 1700000000 2.5 host=a")
    mem.addData(lines.take(2): _*)
    q.processAllAvailable()
    mem.addData(lines.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val allPts = Ingest.parsePutLines(lines.toDF("value"))
      .filter(col("_error").isNull).select(ptsCols: _*)
    val expected = Introspect.lastWriteMeta(allPts)
      .collect().map(_.toSeq).toSet
    assert(stored.collect().map(_.toSeq).toSet == expected)
    // the old arrival did NOT regress the stored last write
    assert(stored.filter(col("metric") === "cpu" &&
        col("tags").getItem("host") === "a").head.getAs[String]("value")
      == "2")
  }

  test("bucketed meta store: streamed folds == batch recompute for both " +
       "stores, out-of-order arrivals included; endpoints answer from it") {
    // the scale-shaped fold (VERDICT r12 #3): the stored meta persists
    // partitioned by series-hash bucket and each micro-batch rewrites
    // ONLY the buckets it touches. The proof obligation is the same as
    // the in-memory fold's: any batch split, in any order, replays to
    // the offline batch recompute.
    import spark.implicits._
    import graft.meta.{Introspect, MetaStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ptsCols = Points.schema.fieldNames.map(col).toSeq
    val lastDir = Files.createTempDirectory("graft_meta_last").toString + "/t"
    val seriesDir = Files.createTempDirectory("graft_meta_series").toString + "/t"
    val mem = MemoryStream[String]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val pts = Ingest.parsePutLines(batch.toDF())
          .filter(col("_error").isNull).select(ptsCols: _*)
        MetaStore.foldLastWrite(spark, lastDir, pts, buckets = 8)
        MetaStore.foldSeriesMeta(spark, seriesDir, pts, buckets = 8)
        ()
      }.start()
    val lines = Seq(
      "put cpu 1700003600 1 host=a",
      "put cpu 1700007200 2 host=a",   // newer write, same series
      "put cpu 1700000000 9 host=a",   // OLD point arriving later
      "put cpu 1700003600 5 host=b",
      "put mem 1700000000 2.5 host=a dc=x")
    mem.addData(lines.take(2): _*)
    q.processAllAvailable()
    mem.addData(lines.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val allPts = Ingest.parsePutLines(lines.toDF("value"))
      .filter(col("_error").isNull).select(ptsCols: _*)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    // bucketed fold == batch recompute (the MetaSync reconciliation)
    val lastStore = MetaStore.read(spark, lastDir)
    val seriesStore = MetaStore.read(spark, seriesDir)
    assert(rows(lastStore.select("tsuid", "timestamp", "value", "metric",
        "tags")) == rows(Introspect.lastWriteMeta(allPts)))
    assert(rows(seriesStore.select("metric", "tags", "first_seen",
        "last_seen", "points")) == rows(Introspect.seriesMeta(allPts)))
    // the endpoints answer from the stored tables directly
    val ql = Introspect.queryLast(allPts,
      Seq(Introspect.LastPointSpec("cpu")), backScan = 0, resolve = true,
      lastMeta = Some(lastStore))
    assert(rows(ql) == rows(Introspect.queryLast(allPts,
      Seq(Introspect.LastPointSpec("cpu")), backScan = 0, resolve = true)))
    assert(rows(Introspect.lookup(allPts, "cpu", meta = Some(seriesStore)))
      == rows(Introspect.lookup(allPts, "cpu")))
    assert(Introspect.suggestRpc(allPts, Map("type" -> "tagk"),
        meta = Some(seriesStore)).collect().map(_.getString(0)).toSeq ==
      Seq("dc", "host"))
  }

  test("streaming series meta: mergeSeriesMeta folds == batch recompute; " +
       "lookup/suggest answers match either path") {
    import spark.implicits._
    import graft.meta.Introspect
    val ptsCols = Points.schema.fieldNames.map(col).toSeq
    def pts(lines: String*) = Ingest.parsePutLines(lines.toDF("value"))
      .filter(col("_error").isNull).select(ptsCols: _*)
    val b1 = pts("put cpu 1700003600 1 host=a",
      "put cpu 1700007200 2 host=a")
    val b2 = pts("put cpu 1700000000 9 host=a", // out-of-order arrival
      "put mem 1700000000 2.5 host=a dc=x")
    val all = b1.unionByName(b2)
    val inc = Introspect.mergeSeriesMeta(Introspect.seriesMeta(b1), b2)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(inc) == rows(Introspect.seriesMeta(all)))
    // first_seen survives the out-of-order replay
    assert(inc.filter(col("metric") === "cpu")
      .head.getAs[Long]("first_seen") == 1700000000000L)
    // the discovery endpoints answer identically from the stored table
    assert(rows(Introspect.lookup(all, "cpu", meta = Some(inc))) ==
      rows(Introspect.lookup(all, "cpu")))
    assert(Introspect.suggestRpc(all, Map("type" -> "tagk"),
        meta = Some(inc)).collect().map(_.getString(0)).toSeq ==
      Seq("dc", "host"))
  }

  test("streaming decontamination: eval-shingle overlap flags arriving docs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evalDocs = Seq("alpha beta gamma delta epsilon").toDF("text")
    val mem = MemoryStream[(Long, String)]
    val flagged = graft.pipeline.Dedup.streamDecontaminate(
      mem.toDF().toDF("doc_id", "text"), "text", evalDocs, "text")
    val q = flagged.writeStream.format("memory")
      .queryName("decon_stream_test").outputMode("append").start()
    mem.addData(
      (1L, "beta gamma delta leaked into the corpus"), // shares "beta gamma delta"
      (2L, "completely unrelated training text here"),
      (3L, "alpha beta but only a bigram"))            // no full 3-shingle match
    q.processAllAvailable()
    q.stop()
    val got = spark.table("decon_stream_test")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("contaminated")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("streaming decontamination fails fast on an oversized eval set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evalDocs = Seq("alpha beta gamma delta epsilon").toDF("text")
    val mem = MemoryStream[(Long, String)]
    val err = intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.streamDecontaminate(
        mem.toDF().toDF("doc_id", "text"), "text", evalDocs, "text",
        maxEvalHashes = 2) // the eval doc has 3 distinct 3-shingles
    }
    assert(err.getMessage.contains("decontaminateFromPostings"))
  }

  test("streaming document dedup: first arrival kept, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "epoch")
      .withColumn("arrival", timestamp_seconds(col("epoch")))
    val deduped = graft.pipeline.Dedup
      .streamExactDedup(docs, "text", "arrival", "10 minutes")
    val q = deduped.writeStream.format("memory")
      .queryName("doc_dedup").outputMode("append").start()
    mem.addData(
      (1L, "alpha beta gamma", 1700000000L),
      (2L, "alpha beta gamma", 1700000005L), // dup within watermark → dropped
      (3L, "something else entirely", 1700000010L))
    q.processAllAvailable()
    mem.addData((4L, "alpha beta gamma", 1700000020L)) // still within horizon
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("doc_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("streaming near-dup (stateful banded LSH) == batch minhashLshPairs " +
       "over the same documents within the state horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    // pairs (2k, 2k+1): the odd doc mutates the even doc's last word —
    // 5 of 11 union shingles shared (J ≈ 0.45); whether a given pair
    // also LANDS a band collision is the operator's own business, and
    // identical for both forms
    val docs = (0 until 24).map { i =>
      val base = (0 until 10).map(w => words((i / 2 * 3 + w) % words.size))
      val text = if (i % 2 == 1) (base.dropRight(1) :+ "mut").mkString(" ")
                 else base.mkString(" ")
      (i.toLong, text, 1700000000L + i * 10)
    }
    val expected = graft.pipeline.Dedup.minhashLshPairs(
        docs.toDF("doc_id", "text", "epoch"), "text", "doc_id",
        bands = 4, threshold = 0.4, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce near-dup pairs")
    val mem = MemoryStream[(Long, String, Long)]
    val stream = graft.pipeline.Dedup.streamNearDedup(
      mem.toDF().toDF("doc_id", "text", "epoch")
        .withColumn("arrival", timestamp_seconds(col("epoch"))),
      "text", "doc_id", "arrival", "10 minutes",
      bands = 4, threshold = 0.4, portable = true)
    val q = stream.writeStream.format("memory")
      .queryName("near_dedup_stream").outputMode("append").start()
    val (first, second) = docs.splitAt(9) // pairs span micro-batches
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("near_dedup_stream")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected,
      s"stream $streamed vs batch $expected")
  }

  test("streaming near-dup: KMV-capped member state still catches a " +
       "long-document near-dup (estimate path)") {
    // long-document adversary: ~2000 distinct shingles per doc, far
    // above the 64-hash cap, so the stored member is a bottom-64 KMV
    // sketch and verification takes the estimate path. Doc 1 mutates
    // doc 0's last token → true Jaccard ≈ 0.997; the KMV estimate
    // (shared fraction of the 64 smallest union hashes) must stay
    // near 1 and well above the 0.5 threshold. Doc 2 is disjoint
    // vocabulary — no shared band bucket, no pair.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = (0 until 2002).map(i => s"tok$i")
    val docs = Seq(
      (0L, base.mkString(" "), 1700000000L),
      (1L, (base.dropRight(1) :+ "mut").mkString(" "), 1700000010L),
      (2L, (0 until 2002).map(i => s"other$i").mkString(" "), 1700000020L))
    val mem = MemoryStream[(Long, String, Long)]
    val stream = graft.pipeline.Dedup.streamNearDedup(
      mem.toDF().toDF("doc_id", "text", "epoch")
        .withColumn("arrival", timestamp_seconds(col("epoch"))),
      "text", "doc_id", "arrival", "10 minutes",
      bands = 4, threshold = 0.5, portable = true,
      maxStoredHashes = 64)
    val q = stream.writeStream.format("memory")
      .queryName("near_dedup_kmv").outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("near_dedup_kmv")
      .select("id_a", "id_b", "jaccard").dropDuplicates("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)),
      s"pairs ${pairs.toSeq}")
    assert(pairs.head._3 >= 0.9 && pairs.head._3 <= 1.0,
      s"KMV estimate ${pairs.head._3} should be near the true ~0.997")
  }

  test("streaming index ingest: foreachBatch appends == one batch append") {
    // the persisted-ANN ingest path: arriving vectors encode under the
    // STORED codebooks inside foreachBatch (stateless per batch), so a
    // stream of arrivals must leave the index exactly as a single
    // batch append of the same rows would
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("pqstream")
      .toString + "/idx"
    Similarity.writePqIndex(e.filter(col("vec_id") % 2 === 0),
      "embedding", "vec_id", dir, kCells = 4, m = 2, k = 4, iters = 1)
    val arrivals = e.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          Similarity.appendToPqIndex(batch.toDF(), "embedding", "vec_id", dir)
      }.start()
    // two micro-batches: cross-batch arrivals must not interfere
    mem.addData(arrivals.take(arrivals.length / 2).toSeq: _*)
    q.processAllAvailable()
    mem.addData(arrivals.drop(arrivals.length / 2).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val idx = Similarity.readPqIndex(spark, dir)
    assert(idx.codes.count() == e.count())
    // streamed appends == deterministic full re-encode under stored state
    val expected = Similarity.pqEncode(
        Similarity.assignWith(e, "embedding", idx.cents), "embedding",
        idx.books)
      .select("vec_id", "cluster", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val stored = idx.codes.select("vec_id", "cluster", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(stored == expected)
  }

  test("streaming ANN serving: per-batch pqIndexTopK == batch serving") {
    // the query-side streaming path: queries ARRIVE as a stream and
    // each micro-batch serves from the static stored index
    // (pqIndexTopK is stateless w.r.t. the stream — codes table +
    // sidecar codebooks are the only state, and they live on disk),
    // so results across micro-batches must equal one batch run
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("pqserve")
      .toString + "/idx"
    Similarity.writePqIndex(e, "embedding", "vec_id", dir,
      kCells = 4, m = 2, k = 4, iters = 1)
    val index = Similarity.readPqIndex(spark, dir)
    val queries = e.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val got = scala.collection.mutable.Set[(Long, Long, Int)]()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("q_id", "q_vec").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          got ++= Similarity.pqIndexTopK(index, batch.toDF(), 5)
            .select("q_id", "vec_id", "rank").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        }
        ()
      }.start()
    mem.addData(queries.take(3).toSeq: _*)
    q.processAllAvailable()
    mem.addData(queries.drop(3).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val expected = Similarity.pqIndexTopK(index,
        e.filter(col("vec_id") < 6).select(col("vec_id").as("q_id"),
          col("embedding").as("q_vec")), 5)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.toSet == expected && expected.nonEmpty)
  }

  test("snapshot screen: exact beats near, verdicts per arrival, streamable") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Dedup
    val longA = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, longA),
      (2L, "completely different content about spark engines and files"),
      (5L, "short text")).toDF("doc_id", "text")
    val arrivals = Seq(
      (101L, longA),                               // verbatim → exact of 1
      (102L, longA.replace("upsilon", "phi")),     // one-token edit → near of 1
      (103L, "totally unrelated sentence mentioning volcanoes and glaciers"))
      .toDF("doc_id", "text")
    val out = Dedup.screenAgainstCorpus(corpus, arrivals, "text", "doc_id",
        bands = 4, threshold = 0.35)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(101L) == ((false, Some("exact"), Some(1L))))
    assert(out(102L) == ((false, Some("near"), Some(1L))))
    assert(out(103L) == ((true, None, None)))
    // verdicts depend only on (arrival, frozen corpus) — per-arrival
    // independent, so the screen streams embarrassingly: per-micro-
    // batch foreachBatch screening must equal the one-shot batch run
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map[Long, (Boolean, Option[Any], Option[Any])]()
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          Dedup.screenAgainstCorpus(corpus, batch.toDF(), "text", "doc_id",
              bands = 4, threshold = 0.35)
            .collect().foreach(r => got.synchronized {
              got(r.getLong(0)) =
                (r.getBoolean(1), Option(r.get(2)), Option(r.get(3)))
            })
      }.start()
    mem.addData((101L, longA))
    q.processAllAvailable()
    mem.addData((102L, longA.replace("upsilon", "phi")),
      (103L, "totally unrelated sentence mentioning volcanoes and glaciers"))
    q.processAllAvailable()
    q.stop()
    assert(got.toMap == out)
  }

  test("streaming semantic dedup: stateless cell screen == Scala brute force") {
    // arrivals screen against a FROZEN per-cell reference: stateless
    // stream-static broadcast join + array expression — no state
    // store, no watermark, so the plan runs in append mode directly
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.{Dedup, Similarity}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ref = e.filter(col("vec_id") % 2 === 0)
    val cents = Similarity.kmeansCentroids(ref, "embedding", "vec_id",
      k = 4, iters = 1)
    val refCells = Dedup.semDedupRefCells(
      Similarity.assignWith(ref, "embedding", cents),
      "embedding", "vec_id", "cluster")
    val arrivals = e.filter(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val screened = Dedup.streamSemDedup(
      mem.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
      refCells, cents, eps = 0.35)
    val q = screened.select("vec_id", "cluster", "keep", "dup_of")
      .writeStream.format("memory").queryName("semscreen")
      .outputMode("append").start()
    mem.addData(arrivals.take(arrivals.length / 2).toSeq: _*)
    q.processAllAvailable()
    mem.addData(arrivals.drop(arrivals.length / 2).toSeq: _*)
    q.processAllAvailable()
    // the statelessness claim, asserted: no state store operator in
    // the executed streaming plan (vs dedup/rollup streams, which
    // report rows/bytes here)
    assert(q.lastProgress.stateOperators.isEmpty,
      "semantic screen must run without streaming state")
    q.stop()
    val got = spark.table("semscreen").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // independent Scala brute force over the same frozen quantizer
    val refRows = Similarity.assignWith(ref, "embedding", cents)
      .select("vec_id", "cluster", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def assign(v: Seq[Float]): Int = cents.zipWithIndex.map { case (c, i) =>
      val d = v.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
      (math.floor(d * 1e6 + 0.5) / 1e6, i)
    }.min._2
    def cos(a: Seq[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    arrivals.foreach { case (id, v) =>
      val cell = assign(v)
      val dups = refRows.filter(r => r._2 == cell && r._1 != id &&
        cos(v, r._3) >= 0.35).map(_._1)
      val want = (cell, dups.isEmpty, if (dups.isEmpty) -1L else dups.min)
      assert(got(id) == want, s"vec $id")
    }
    assert(got.values.exists(!_._2), "expected at least one duplicate")
  }

  test("streaming boilerplate screen == batch strip under frozen ref sets") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text")
    val batch = Dedup.boilerplateStrip(docs, "text", "doc_id", "source",
        width = 3, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    val ref = Dedup.boilerplateRefSets(docs, "text", "doc_id", "source",
      width = 3, minDf = 2)
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mem = MemoryStream[(Long, String, String)]
    val q = Dedup.streamBoilerplateStrip(
        mem.toDF().toDF("doc_id", "source", "text"),
        "text", "doc_id", "source", ref, width = 3)
      .writeStream.format("memory").queryName("boiler_stream")
      .outputMode("append").start()
    mem.addData(rows.take(rows.length / 2).toSeq: _*)
    q.processAllAvailable()
    mem.addData(rows.drop(rows.length / 2).toSeq: _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "boilerplate screen must run without streaming state")
    q.stop()
    val streamed = spark.table("boiler_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(streamed == batch)
    // something actually stripped
    assert(streamed.exists(r => r._3 < r._2))
  }

  test("frozen ref sets refresh mid-stream: post-swap arrivals screen on the new table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Dedup
    // corpus A: only 'aaa bbb ccc' is boilerplate (df=2 in source s).
    // corpus B grows with docs repeating 'xxx yyy zzz' — a refit picks
    // the new segment up. The screen is STATELESS, so the documented
    // swap is stop → recompute ref sets offline → restart the
    // transform; this proves arrivals after the swap strip segments
    // only the NEW table knows.
    val corpusA = Seq(
      (1L, "s", "aaa bbb ccc one two three"),
      (2L, "s", "aaa bbb ccc four five six"))
      .toDF("doc_id", "source", "text")
    val corpusB = corpusA.unionByName(Seq(
      (3L, "s", "xxx yyy zzz seven eight nine"),
      (4L, "s", "xxx yyy zzz ten eleven twelve"))
      .toDF("doc_id", "source", "text"))
    val refA = Dedup.boilerplateRefSets(corpusA, "text", "doc_id", "source",
      width = 3, minDf = 2)
    val refB = Dedup.boilerplateRefSets(corpusB, "text", "doc_id", "source",
      width = 3, minDf = 2)
    val mem = MemoryStream[(Long, String, String)]
    def start(ref: org.apache.spark.sql.DataFrame, sink: String) =
      Dedup.streamBoilerplateStrip(
          mem.toDF().toDF("doc_id", "source", "text"),
          "text", "doc_id", "source", ref, width = 3)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
    // phase 1 under refA: the xxx-segment doc passes UNstripped
    val q1 = start(refA, "swap_phase1")
    mem.addData((10L, "s", "xxx yyy zzz pre swap words"))
    q1.processAllAvailable(); q1.stop()
    val pre = spark.table("swap_phase1")
      .filter(col("id") === 10L).head
    assert(pre.getAs[Long]("n_kept") == pre.getAs[Long]("n_seg"))
    // refit + restart under refB: the SAME content now strips
    val q2 = start(refB, "swap_phase2")
    mem.addData((11L, "s", "xxx yyy zzz post swap words"))
    q2.processAllAvailable(); q2.stop()
    val post = spark.table("swap_phase2")
      .filter(col("id") === 11L).head
    assert(post.getAs[Long]("n_kept") == post.getAs[Long]("n_seg") - 1)
    assert(!post.getAs[String]("clean_text").contains("xxx"))
    // and the old boilerplate still strips after the swap
    mem.addData((12L, "s", "aaa bbb ccc still stripped here"))
    val q3 = start(refB, "swap_phase3")
    q3.processAllAvailable(); q3.stop()
    val old = spark.table("swap_phase3")
      .filter(col("id") === 12L).head
    assert(!old.getAs[String]("clean_text").contains("aaa"))
  }

  test("streaming DSIR scoring under a frozen ratio table == batch weights") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.Sampling
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    val batch = Sampling.dsirWeights(docs, "text", "doc_id",
        col("lang") === "en", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val ratio = Sampling.dsirRatioTable(docs, "text",
      col("lang") === "en", buckets = 64)
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDF().toDF("doc_id", "text", "epoch")
      .withColumn("arrival", timestamp_seconds(col("epoch")))
    val q = Sampling.streamScoreDsir(stream, "text", "doc_id",
        "arrival", ratio, buckets = 64)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    val half = rows.length / 2
    mem.addData(rows.take(half).map(r => (r._1, r._2, 1700000000L)).toSeq: _*)
    q.processAllAvailable()
    mem.addData(rows.drop(half).map(r => (r._1, r._2, 1700000010L)).toSeq: _*)
    q.processAllAvailable()
    mem.addData((999999L, "watermarkpush", 1700009999L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_stream")
      .filter(col("id") =!= 999999L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(streamed == batch, s"diff=${(streamed diff batch).take(3)}")
  }

  test("streaming unigram scoring under a frozen table == batch scorer") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.TextAnalysis
    val corpus = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha alpha delta"),
      (3L, "gamma delta beta alpha")).toDF("doc_id", "text")
    val freq = TextAnalysis.unigramTable(corpus, "text")
    val batch = TextAnalysis.unigramLogProb(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val mem = MemoryStream[(Long, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "epoch")
      .withColumn("arrival", timestamp_seconds(col("epoch")))
    val out = TextAnalysis.streamScoreUnigram(docs, "text", "doc_id",
      "arrival", freq)
    val q = out.writeStream.format("memory").queryName("uni_score")
      .outputMode("append").start()
    // same docs arrive across two micro-batches; watermark must pass
    // the window before append emits, so push a late high-ts row
    mem.addData((1L, "alpha beta beta gamma", 1700000000L),
      (2L, "alpha alpha delta", 1700000010L))
    q.processAllAvailable()
    mem.addData((3L, "gamma delta beta alpha", 1700000020L))
    q.processAllAvailable()
    mem.addData((99L, "alpha", 1700009999L)) // watermark push
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("uni_score")
      .filter(col("id") < 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("streaming classifier scoring under frozen weights == batch (stateless)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.TextAnalysis
    val corpus = Seq(
      (1L, "alpha beta beta", "en"), (2L, "un deux trois", "fr"),
      (3L, "alpha gamma", "en"), (4L, "", "fr"))
      .toDF("doc_id", "text", "lang")
    val (w, bias) = TextAnalysis.trainHashedLogreg(corpus, "text", "doc_id",
      col("lang") === "en", buckets = 8, iters = 2)
    val batch = TextAnalysis.classifierScore(corpus, "text", "doc_id", w, bias)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val mem = MemoryStream[(Long, String)]
    val out = TextAnalysis.classifierScore(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id", w, bias)
    val q = out.writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    mem.addData((1L, "alpha beta beta"), (2L, "un deux trois"))
    q.processAllAvailable()
    mem.addData((3L, "alpha gamma"), (4L, ""))
    q.processAllAvailable()
    // a pure projection: no state store, no watermark, emits per batch
    assert(q.lastProgress.stateOperators.isEmpty,
      "classifier scoring must run without streaming state")
    q.stop()
    val streamed = spark.table("clf_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(streamed == batch)
  }

  test("streaming WET extraction + URL normalization == batch (stateless)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.TextAnalysis
    val pages = Seq(
      (1L, "<p>A &amp; B</p><script>x<1</script>",
        "HTTPS://Ex.COM:443//a/?utm_source=x&b=1#f"),
      (2L, "<div>plain</div><!-- c -->",
        "http://a.Ex.CO.UK:8080/P"))
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextAnalysis.htmlExtract(col("html")).as("text_plain"),
        TextAnalysis.canonicalUrl(col("url")).as("url_canon"),
        TextAnalysis.registeredDomain(
          TextAnalysis.urlHost(col("url"))).as("domain"))
    val batch = shape(pages.toDF("doc_id", "html", "url"))
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String, String)]
    val q = shape(mem.toDF().toDF("doc_id", "html", "url"))
      .writeStream.format("memory").queryName("wet_stream")
      .outputMode("append").start()
    mem.addData(pages.head)
    q.processAllAvailable()
    mem.addData(pages(1))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "extraction/normalization must run without streaming state")
    q.stop()
    val streamed = spark.table("wet_stream").collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming intra-doc line dedup == batch (stateless projection)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.pipeline.TextAnalysis
    val rows = Seq((1L, "nav\nbody\nnav\nfooter"), (2L, "a\na\na"),
      (3L, ""))
    val batch = TextAnalysis.stripRepeatedLines(
        rows.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val q = TextAnalysis.stripRepeatedLines(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("linededup_stream")
      .outputMode("append").start()
    mem.addData(rows.take(2): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(2): _*)
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "line dedup must run without streaming state")
    q.stop()
    val streamed = spark.table("linededup_stream")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("streaming segment dedup: repeated segments dropped across documents") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val docs = mem.toDF().toDF("doc_id", "text", "epoch")
      .withColumn("arrival", timestamp_seconds(col("epoch")))
    val out = graft.pipeline.Dedup
      .streamSegmentDedup(docs, "text", "doc_id", "arrival",
        "10 minutes", width = 4)
    val q = out.writeStream.format("memory")
      .queryName("seg_dedup").outputMode("append").start()
    mem.addData((1L, "a b c d e f g h", 1700000000L))
    q.processAllAvailable()
    // doc 2 repeats doc 1's first segment, brings one new segment
    mem.addData((2L, "a b c d x y z w", 1700000005L))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("seg_dedup")
      .select("id", "start", "segment").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(kept == Set((1L, 0, "a b c d"), (1L, 4, "e f g h"),
      (2L, 4, "x y z w")))
  }

  test("streaming sequence packing == batch packing across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val texts = (0L until 12L).map(id =>
      (id, Seq.fill(3 + (id % 5).toInt)("w").mkString(" ")))
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis
      .streamPackSequences(docs, "text", "doc_id", budget = 8, nBuckets = 3)
    val q = out.writeStream.format("memory")
      .queryName("pack_stream").outputMode("append").start()
    // id-ordered arrival split across two micro-batches: the per-bucket
    // cursor must carry over the batch boundary
    mem.addData(texts.take(6): _*)
    q.processAllAvailable()
    mem.addData(texts.drop(6): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pack_stream")
      .select("id", "bucket", "pack", "packOff", "nTok").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(4))).toSet
    val batch = graft.pipeline.TextAnalysis
      .packSequences(texts.toDF("doc_id", "text"), "text", "doc_id",
        budget = 8, nBuckets = 3, portable = false)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getInt(4),
        r.getInt(2))).toSet
    assert(streamed == batch)
  }

  test("streaming domain mix == batch mix under the same rate table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = (0L until 60L).map(id => (id, s"src${id % 3}"))
      .toDF("doc_id", "source")
    val targets = Map("src0" -> 0.6, "src1" -> 0.4)
    val rates = graft.pipeline.Sampling
      .domainMixRates(corpus, "source", targets, frac = 0.5)
    val expected = graft.pipeline.Sampling
      .applyDomainMix(corpus, "source", "doc_id", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < 60)
    val mem = MemoryStream[(Long, String)]
    val q = graft.pipeline.Sampling
      .applyDomainMix(mem.toDF().toDF("doc_id", "source"),
        "source", "doc_id", rates)
      .writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    corpus.collect().foreach(r => mem.addData((r.getLong(0), r.getString(1))))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mix_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == expected)

    // temperature-α rates are just another rates table: arrivals filter
    // under the FROZEN thresholds (fit on the landed corpus), stateless
    val tRates = graft.pipeline.Sampling
      .temperatureMixRates(corpus, "source", alpha = 0.5, frac = 0.5)
    val tExpected = graft.pipeline.Sampling
      .applyDomainMix(corpus, "source", "doc_id", tRates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tExpected.nonEmpty)
    val mem2 = MemoryStream[(Long, String)]
    val q2 = graft.pipeline.Sampling
      .applyDomainMix(mem2.toDF().toDF("doc_id", "source"),
        "source", "doc_id", tRates)
      .writeStream.format("memory").queryName("tmix_stream")
      .outputMode("append").start()
    corpus.collect().foreach(r => mem2.addData((r.getLong(0), r.getString(1))))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.table("tmix_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet == tExpected)
  }

  test("streaming rollup materialization (tumbling window agg)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val pts = Ingest.parsePutLines(mem.toDF())
      .filter(col("_error").isNull).drop("_error")
    val q = Ingest.rollupStream(pts, "1 hour").writeStream
      .format("memory").queryName("rollup_stream_test")
      .outputMode("complete").start()
    mem.addData(
      "put cpu 1700000000 1 host=a",
      "put cpu 1700000100 3 host=a",
      "put cpu 1700003700 5 host=a") // next hour bucket
    q.processAllAvailable()
    q.stop()
    val r = spark.table("rollup_stream_test")
      .orderBy("ts").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Double]("sum") == 4.0 && r(0).getAs[Long]("count") == 2)
    assert(r(1).getAs[Double]("sum") == 5.0 && r(1).getAs[Long]("count") == 1)
    // schema is registrable as an Engine rollup table
    assert(Seq("metric", "tags", "series_id", "ts", "sum", "count", "min", "max")
      .forall(spark.table("rollup_stream_test").columns.contains))
  }

  test("streaming sliding-window average (movingAverage's streaming form)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val pts = Ingest.parsePutLines(mem.toDF())
      .filter(col("_error").isNull).drop("_error")
    val q = Ingest.slidingAvgStream(pts, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("sliding_stream_test")
      .outputMode("complete").start()
    // 1700000000 = ..:53:20; 10m/5m windows → each point lands in 2
    mem.addData(
      "put cpu 1700000000 2 host=a",   // windows 53:20∈[:45,:55),[:50,:00)
      "put cpu 1700000200 4 host=a")   // 56:40 ∈ [:50,:00),[:55,:05)
    q.processAllAvailable()
    q.stop()
    val r = spark.table("sliding_stream_test").orderBy("ts")
      .collect().map(row => row.getAs[Long]("ts") ->
        ((row.getAs[Double]("avg"), row.getAs[Long]("count"))))
    // [:45,:55) holds only the first point, [:50,:00) both, [:55,:05)
    // only the second
    assert(r.toSeq == Seq(
      1699999500000L -> ((2.0, 1L)),
      1699999800000L -> ((3.0, 2L)),
      1700000100000L -> ((4.0, 1L))))
  }

  test("config-document registry (parseConfig → registryTables) routes " +
       "identically to a hand-built registry") {
    // the tsd.rollups.config document must be able to DRIVE the engine:
    // same interval + a delaySla that lands the same freshness horizon
    // ⇒ byte-identical results with the direct Engine.RollupTable
    import spark.implicits._
    import graft.operators.Rollups
    import graft.query.{QueryParser, TsQuery}
    val raw = Ingest.parsePutLines(Seq(
        "put cpu 1700000000 1 host=a",
        "put cpu 1700000100 3 host=a",
        "put cpu 1700003700 5 host=a",
        "put cpu 1700007300 7 host=b").toDF("value"))
      .filter(col("_error").isNull).drop("_error")
    val rollup = Rollups.materialize(raw, 3600000L)
    val query = TsQuery(1699999200000L, 1700010000000L, Seq.empty)
    val sub = QueryParser.parseSubQuery("sum:1h-sum:cpu")
    val horizon = 1700007200000L
    val direct = Engine.run(raw, query, sub,
        Seq(Engine.RollupTable(3600000L,
          rollup.filter(col("ts") < horizon), horizonMs = horizon)))
      .select("ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cfg = Rollups.parseConfig(
      """{"intervals":[
          {"interval":"1s","table":"tsdb","preAggregationTable":"tsdb",
           "rowSpan":"1h","defaultInterval":true},
          {"interval":"1h","table":"tsdb-rollup-1h",
           "preAggregationTable":"tsdb-rollup-1h-pre","rowSpan":"1d",
           "delaySla":"2h"}],
         "aggregationIds":{"sum":0,"count":1}}""")
    val registry = Rollups.registryTables(cfg,
      { case "tsdb-rollup-1h" => rollup.filter(col("ts") < horizon) },
      nowMs = horizon + 7200000L) // now − 2h delaySla = the horizon
    assert(registry.map(t => (t.intervalMs, t.horizonMs)) ==
      Seq((3600000L, horizon)))
    val routed = Engine.run(raw, query, sub, registry)
      .select("ts", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(routed == direct && direct.size == 3)
  }

  test("streamed rollup table serves an Engine query via rollup routing") {
    import spark.implicits._
    import graft.query.{QueryParser, TsQuery}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lines = Seq(
      "put cpu 1700000000 1 host=a",
      "put cpu 1700000100 3 host=a",
      "put cpu 1700003700 5 host=a",
      "put cpu 1700007300 7 host=a")
    // stream the points into a materialized 1h rollup table...
    val mem = MemoryStream[String]
    val pts = Ingest.parsePutLines(mem.toDF())
      .filter(col("_error").isNull).drop("_error")
    val q = Ingest.rollupStream(pts, "1 hour").writeStream
      .format("memory").queryName("rollup_route_src")
      .outputMode("complete").start()
    mem.addData(lines: _*)
    q.processAllAvailable()
    q.stop()
    val rollup = spark.table("rollup_route_src")
    // ...and serve a 1h-sum query from it: identical to raw-only
    val raw = Ingest.parsePutLines(lines.toDF("value"))
      .filter(col("_error").isNull).drop("_error")
    // start on the first hour-bucket boundary so no edge bucket clips
    val query = TsQuery(1699999200000L, 1700010000000L, Seq.empty)
    val sub = QueryParser.parseSubQuery("sum:1h-sum:cpu")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("ts", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = rows(Engine.run(raw, query, sub))
    val routed = rows(Engine.run(raw, query, sub,
      Seq(Engine.RollupTable(3600000L, rollup))))
    assert(direct == routed && direct.size == 3)
    // horizon split: rollup only complete before the 3rd hour; fresh
    // raw points must stitch in past it, same answer
    val horizon = 1700007200000L
    val split = rows(Engine.run(raw, query, sub,
      Seq(Engine.RollupTable(3600000L,
        rollup.filter(col("ts") < horizon), horizonMs = horizon))))
    assert(split == direct)
    // rate over the rollup-served downsample (downsample -> rate ->
    // aggregate order) must also match raw-only
    val rateSub = QueryParser.parseSubQuery("sum:1h-sum:rate:cpu")
    val directRate = rows(Engine.run(raw, query, rateSub))
    val routedRate = rows(Engine.run(raw, query, rateSub,
      Seq(Engine.RollupTable(3600000L, rollup))))
    assert(directRate == routedRate && directRate.nonEmpty)
    // tag-grouped aggregation over the rollup-served plan (Lerp policy
    // + grouping keys exercises the grid path's tag columns)
    val grpSub = QueryParser.parseSubQuery("sum:1h-sum:cpu{host=*}")
    def grows(df: org.apache.spark.sql.DataFrame) =
      df.select("tag_host", "ts", "value").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val directGrp = grows(Engine.run(raw, query, grpSub))
    val routedGrp = grows(Engine.run(raw, query, grpSub,
      Seq(Engine.RollupTable(3600000L, rollup))))
    assert(directGrp == routedGrp && directGrp.nonEmpty)
  }

  test("RT publisher: foreachBatch second sink sees each ingested batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val pts = Ingest.parsePutLines(mem.toDF())
      .filter(col("_error").isNull).drop("_error")
    val published = new java.util.concurrent.atomic.LongAdder
    val q = Ingest.withPublisher(pts, (batch, _) =>
      published.add(batch.count())).start()
    mem.addData(
      "put cpu 1700000000 1 host=a",
      "put cpu 1700000060 2 host=a",
      "put mem 1700000000 3 host=b")
    q.processAllAvailable()
    q.stop()
    assert(published.sum() == 3L)
  }

  test("streaming sketch fold: per-batch HLL/CMS/Bloom merges == one batch build") {
    import graft.pipeline.Sketches
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    // running state = the sketches themselves: 256 B + 64 KB + 8 KB,
    // bounded by construction no matter how long the stream runs
    var hllRegs = new Array[Byte](Sketches.HllM)
    val cms = new Array[Long](2048 * 4)
    val bloom = new Array[Byte]((1 << 16) / 8)
    val q = mem.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val hashed = batch.select(
          graft.pipeline.TextAnalysis.hash60(col("value"), portable = true)
            .as("h"))
        hllRegs = Sketches.hllMerge(hllRegs, Sketches.hllBuild(hashed, "h"))
        val grid = Sketches.cmsBuild(hashed, "h")
        var i = 0
        while (i < cms.length) { cms(i) += grid(i); i += 1 }
        val bits = Sketches.bloomBuild(hashed.distinct(), "h")
        i = 0
        while (i < bloom.length) {
          bloom(i) = (bloom(i) | bits(i)).toByte; i += 1
        }
        ()
      }.start()
    val all = (0 until 300).map(i => s"tok-${i % 120}")
    all.grouped(100).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    q.stop()
    // one-shot batch build over the union must equal the folded state
    val batchDf = all.toDF("value").select(
      graft.pipeline.TextAnalysis.hash60(col("value"), portable = true).as("h"))
    assert(Sketches.hllFinish(hllRegs) ==
      Sketches.hllFinish(Sketches.hllBuild(batchDf, "h")))
    assert(cms.toSeq == Sketches.cmsBuild(batchDf, "h").toSeq)
    assert(java.util.Arrays.equals(bloom,
      Sketches.bloomBuild(batchDf.distinct(), "h")))
    // and the folded estimate is sane for 120 distinct
    val est = Sketches.hllFinish(hllRegs).est
    assert(math.abs(est - 120.0) / 120.0 < 0.2, s"est $est")
  }

  test("streaming sessionization: closed session_window rows == batch sessionStats") {
    import graft.pipeline.Trajectories
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val ev = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // lateness must cover cross-batch disorder: user 2's session
    // continues in batch 2 while batch 1 already saw a later event
    val q = Trajectories.sessionStream(ev, gapMs = 1800000L,
        lateness = "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    val base = 1700000000000L
    // user 1: two sessions; user 2: one session, split across batches
    mem.addData(
      (1L, base, 1L, "view", 1.0),
      (2L, base + 60000, 1L, "click", 2.0),
      (3L, base + 3600000, 1L, "view", 3.0), // 1h gap → session 2
      (5L, base, 2L, "view", 5.0))
    q.processAllAvailable()
    mem.addData((6L, base + 120000, 2L, "click", 6.0))
    q.processAllAvailable()
    // sentinel far in the future closes every real session
    mem.addData((99L, base + 864000000L, 999L, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT * FROM sess_out WHERE user_id <> 999 ORDER BY user_id, start_ts")
      .collect()
    val batch = Trajectories.sessionStats(
        Seq((1L, base, 1L, "view", 1.0), (2L, base + 60000, 1L, "click", 2.0),
          (3L, base + 3600000, 1L, "view", 3.0), (5L, base, 2L, "view", 5.0),
          (6L, base + 120000, 2L, "click", 6.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value"),
        gapMs = 1800000L)
      .select("user_id", "n_events", "start_ts", "end_ts", "dur_ms",
        "sum_v", "n_types")
      .orderBy("user_id", "start_ts").collect()
    assert(streamed.length == batch.length && streamed.length == 3)
    streamed.zip(batch).foreach { case (s, b) =>
      Seq("user_id", "n_events", "start_ts", "end_ts", "dur_ms").foreach(c =>
        assert(s.getAs[Long](c) == b.getAs[Long](c), s"$c: $s vs $b"))
      assert(s.getAs[Double]("sum_v") == b.getAs[Double]("sum_v"))
      assert(s.getAs[Int]("n_types") == b.getAs[Long]("n_types").toInt)
    }
  }

  test("annotation CRUD: upsert replaces identity, bulk delete by range") {
    import spark.implicits._
    val table = Seq(
      (Some("s1"), 100L, 200L, "old"),
      (None: Option[String], 150L, 250L, "global note"))
      .toDF("series", "start_ts", "end_ts", "description")
    val edits = Seq((Some("s1"), 100L, 210L, "new"))
      .toDF("series", "start_ts", "end_ts", "description")
    val up = Annotations.upsert(table, edits, Seq("series"))
    assert(up.count() == 2)
    assert(up.filter(col("description") === "new").count() == 1)
    assert(up.filter(col("description") === "old").count() == 0)
    val afterDelete = Annotations.bulkDelete(up, 0L, 300L, Seq("series"),
      globalOnly = true)
    assert(afterDelete.count() == 1)
    assert(Annotations.globals(up, Seq("series"), 0L, 300L).count() == 1)
    // identity delete targets series rows, and null-safely global ones
    val delSeries = Seq((Some("s1"), 100L)).toDF("series", "start_ts")
    val d1 = Annotations.delete(up, delSeries, Seq("series"))
    assert(d1.count() == 1 && d1.filter(col("series").isNull).count() == 1)
    val delGlobal = Seq((None: Option[String], 150L)).toDF("series", "start_ts")
    assert(Annotations.delete(up, delGlobal, Seq("series")).count() == 1)
  }

  test("annotation POST merge vs PUT replace (TestAnnotationRpc.modify/" +
       "modifyPut ports): unset fields keep stored values under merge") {
    import spark.implicits._
    // the reference fixture: stored note with notes="My Notes"; a POST
    // setting only description merges (notes survives), a PUT replaces
    // (notes resets to the request's empty value)
    val table = Seq(
      (Some("000001"), 1388450562L, 0L, "Hello!", "My Notes"),
      (None: Option[String], 1328140800L, 0L, "Description", "Notes"))
      .toDF("series", "start_ts", "end_ts", "description", "notes")
    def row(d: org.apache.spark.sql.DataFrame, s: Option[String]) =
      d.filter(if (s.isDefined) col("series") === s.get
        else col("series").isNull).head
    // modify / modifyPOST: description set, notes NOT set (null edit)
    val post = Seq((Some("000001"), 1388450562L,
        None: Option[Long], Some("Boo"), None: Option[String]))
      .toDF("series", "start_ts", "end_ts", "description", "notes")
    val merged = Annotations.upsertMerge(table, post, Seq("series"))
    assert(merged.count() == 2)
    val m = row(merged, Some("000001"))
    assert(m.getAs[String]("description") == "Boo" &&
      m.getAs[String]("notes") == "My Notes")
    // modifyGlobalPOST: same merge on a global (null-key) annotation
    val gpost = Seq((None: Option[String], 1328140800L,
        None: Option[Long], Some("Boo"), None: Option[String]))
      .toDF("series", "start_ts", "end_ts", "description", "notes")
    val gm = row(Annotations.upsertMerge(table, gpost, Seq("series")), None)
    assert(gm.getAs[String]("description") == "Boo" &&
      gm.getAs[String]("notes") == "Notes")
    // modifyPut: PUT replaces wholesale — notes becomes the request's ""
    val put = Seq((Some("000001"), 1388450562L, 0L, "Boo", ""))
      .toDF("series", "start_ts", "end_ts", "description", "notes")
    val p = row(Annotations.upsert(table, put, Seq("series")), Some("000001"))
    assert(p.getAs[String]("description") == "Boo" &&
      p.getAs[String]("notes") == "")
    // postNew: an unmatched identity inserts as-is through the merge
    val fresh = Seq((Some("000001"), 1388450564L,
        None: Option[Long], Some("Boo"), None: Option[String]))
      .toDF("series", "start_ts", "end_ts", "description", "notes")
    val withNew = Annotations.upsertMerge(table, fresh, Seq("series"))
    assert(withNew.count() == 3 &&
      withNew.filter(col("start_ts") === 1388450564L)
        .head.getAs[String]("description") == "Boo")
    // GET single-fetch (get / getNotFound / getMissingStart): identity
    // hit, null-key global addressing, the 404 and start-gate texts
    assert(Annotations.getOne(table, Seq("series"), Seq(Some("000001")),
      1388450562L).head.getAs[String]("notes") == "My Notes")
    assert(Annotations.getOne(table, Seq("series"), Seq(None),
      1328140800L).head.getAs[String]("notes") == "Notes")
    assert(intercept[NoSuchElementException](
        Annotations.getOne(table, Seq("series"), Seq(Some("000001")),
          1388450568L)).getMessage ==
      "Unable to locate annotation in storage")
    assert(intercept[IllegalArgumentException](
        Annotations.getOne(table, Seq("series"), Seq(Some("000001")), 0L))
      .getMessage == "Missing start time")
    // getGlobals: end_ts=0 defaults to now; only null-key rows; range
    // membership is the annotation's START time (row-key scan), so a
    // window opening after the start misses it even though its end_ts
    // reaches in
    val g = Annotations.getGlobalsRpc(table, Seq("series"), 1L,
      now = 1400000000L * 1000)
    assert(g.count() == 1 && g.head.isNullAt(0))
    assert(Annotations.getGlobalsRpc(table, Seq("series"),
      1328140801L, 1400000000000L).isEmpty)
    assert(intercept[IllegalArgumentException](
        Annotations.getGlobalsRpc(table, Seq("series"), 100L, 50L))
      .getMessage ==
      "The end timestamp cannot be less than the start timestamp")
    // bulkDelete shares the start-in-range membership (deleteRange
    // skips qualifiers outside [start, end]): a window past the global
    // row's start deletes nothing
    assert(Annotations.bulkDelete(table, 1328140801L, 1400000000000L,
      Seq("series"), globalOnly = true).count() == 2)
    assert(Annotations.bulkDelete(table, 1L, 1328140800L,
      Seq("series"), globalOnly = true).count() == 1)
    // duplicate identities in ONE merge batch pre-merge fieldwise
    // (deterministic max), never duplicating the output row
    val dup = Seq(
      (Some("000001"), 1388450562L, None: Option[Long], Some("A"),
        None: Option[String]),
      (Some("000001"), 1388450562L, None: Option[Long], None,
        Some("zz")))
      .toDF("series", "start_ts", "end_ts", "description", "notes")
    val md = Annotations.upsertMerge(table, dup, Seq("series"))
    assert(md.count() == 2)
    val mr = row(md, Some("000001"))
    assert(mr.getAs[String]("description") == "A" &&
      mr.getAs[String]("notes") == "zz")
    // DELETE /api/annotation/bulk: per-tsuid + global start-in-range
    // deletion with totalDeleted; required start, tsuids-or-global
    val (surv, n) = Annotations.bulkDeleteRpc(table, Seq("series"),
      tsuids = Seq(Seq(Some("000001"))), global = true,
      startTs = Some(1L), now = 1400000000000L)
    assert(n == 2 && surv.isEmpty)
    // a series-only delete leaves the global row
    val (surv2, n2) = Annotations.bulkDeleteRpc(table, Seq("series"),
      tsuids = Seq(Seq(Some("000001"))), startTs = Some(1L),
      now = 1400000000000L)
    assert(n2 == 1 && surv2.head.isNullAt(0))
    // start-in-range: a window past both starts deletes nothing
    assert(Annotations.bulkDeleteRpc(table, Seq("series"),
      global = true, tsuids = Seq(Seq(Some("000001"))),
      startTs = Some(1388450563L), endTs = 1400000000000L)._2 == 0L)
    assert(intercept[IllegalArgumentException](
        Annotations.bulkDeleteRpc(table, Seq("series"), global = true))
      .getMessage == "Missing the start time value")
    assert(intercept[IllegalArgumentException](
        Annotations.bulkDeleteRpc(table, Seq("series"),
          startTs = Some(1L))).getMessage ==
      "Missing the TSUIDs or global annotations flag")
    // deleteRange's end-timestamp guards (Annotation.java:397-403):
    // an inverted or unset end range errors, never totalDeleted=0
    assert(intercept[IllegalArgumentException](
        Annotations.bulkDeleteRpc(table, Seq("series"), global = true,
          startTs = Some(100L), endTs = 50L)).getMessage ==
      "The end timestamp cannot be less than the start timestamp")
    assert(intercept[IllegalArgumentException](
        Annotations.bulkDeleteRpc(table, Seq("series"), global = true,
          startTs = Some(100L), now = -1L)).getMessage ==
      "The end timestamp has not been set")
    // an edit row that sets NOTHING is syncToStorage's changed-map
    // gate (Annotation.java:162-172) — IllegalStateException before
    // any merge happens, for existing AND fresh identities alike
    val noop = Seq((Some("000001"), 1388450562L, None: Option[Long],
        None: Option[String], None: Option[String]))
      .toDF("series", "start_ts", "end_ts", "description", "notes")
    assert(intercept[IllegalStateException](
        Annotations.upsertMerge(table, noop, Seq("series"))).getMessage ==
      "No changes detected in Annotation data")
  }

  test("introspection endpoints and series meta") {
    assert(Introspect.aggregators(spark).count() > 30)
    assert(Introspect.version(spark).count() == 1)
    assert(Introspect.config(spark).filter(col("key").startsWith("spark.sql"))
      .count() > 0)
    import spark.implicits._
    val pts = Seq(("cpu", 1000L, 1.0), ("cpu", 2000L, 2.0), ("mem", 1000L, 3.0))
      .toDF("metric", "ts", "value").withColumn("tags",
        map(lit("host"), lit("a")))
    val st = Introspect.stats(pts).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("points")).toMap
    assert(st == Map("cpu" -> 2L, "mem" -> 1L))
    assert(Introspect.seriesMeta(pts).count() == 2)
  }

  test("uid registry: dense per-kind ids, stable across partitioning") {
    import spark.implicits._
    val pts = Seq(("cpu", "a", "x"), ("mem", "b", "x"), ("cpu", "b", "y"))
      .toDF("metric", "u", "k")
      .withColumn("tags", map(lit("host"), col("u"), lit("dc"), col("k")))
      .select("metric", "tags")
    def reg(df: org.apache.spark.sql.DataFrame) =
      Introspect.uidRegistry(df).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ids = reg(pts)
    // per-kind dense ids starting at 1, names ranked lexicographically
    assert(ids(("metric", "cpu")) == 1 && ids(("metric", "mem")) == 2)
    assert(ids(("tagk", "dc")) == 1 && ids(("tagk", "host")) == 2)
    assert(ids(("tagv", "a")) == 1 && ids(("tagv", "b")) == 2 &&
      ids(("tagv", "x")) == 3 && ids(("tagv", "y")) == 4)
    // ids are a pure function of the data, not its partitioning
    assert(reg(pts.repartition(7)) == ids)
  }

  test("UID whitelist filter: AND'd per-kind patterns gate new " +
       "assignments (TestUniqueIdWhitelistFilter ports)") {
    import spark.implicits._
    // allowUIDAssignment / MultiplePaterns: EVERY pattern must find —
    // ".*,^test.*" still rejects "metric" (an AND whitelist)
    val f = Uids.whitelistFilter(Map(
      "tsd.uidfilter.whitelist.metric_patterns" -> ".*,^test.*",
      "tsd.uidfilter.whitelist.tagk_patterns" -> "^test.*",
      "tsd.uidfilter.whitelist.tagv_patterns" -> "^test.*"))
    assert(f.allow("metric", "test_metric") && !f.allow("metric", "metric"))
    assert(f.allow("tagk", "test_tagk") && !f.allow("tagk", "tagk"))
    assert(f.allow("tagv", "test_tagv") && !f.allow("tagv", "tagv"))
    // initalizeMultiplePatternsAlternateDelimiter: the delimiter is a
    // REGEX (String.split semantics, UniqueIdWhitelistFilter.java:65 —
    // the reference's own vector escapes it as "\\|")
    val alt = Uids.whitelistFilter(Map(
      "tsd.uidfilter.whitelist.delimiter" -> "\\|",
      "tsd.uidfilter.whitelist.metric_patterns" -> "^test.*|.*"))
    assert(alt.allow("metric", "test_x") && !alt.allow("metric", "x"))
    // a genuinely regex delimiter: spaced commas split as one separator
    val rx = Uids.whitelistFilter(Map(
      "tsd.uidfilter.whitelist.delimiter" -> "\\s*,\\s*",
      "tsd.uidfilter.whitelist.metric_patterns" -> "^test.* , .*x$"))
    assert(rx.allow("metric", "test_x") && !rx.allow("metric", "test_y"))
    // unconfigured kind allows everything
    assert(Uids.whitelistFilter(Map.empty).allow("metric", "anything"))
    // initalizeBadRegex: the reference's message
    assert(intercept[IllegalArgumentException] {
      Uids.whitelistFilter(Map(
        "tsd.uidfilter.whitelist.metric_patterns" -> "*noleading"))
    }.getMessage.contains("does not compile"))

    // assign integration: blocked names land in the report with the
    // FailedToAssignUniqueIdException message and never enter the
    // registry; existing names are untouched by the filter
    val pts = Seq(("click", "a")).toDF("metric", "u")
      .withColumn("tags", map(lit("host"), col("u")))
      .select("metric", "tags")
    val registry = Introspect.uidRegistry(pts)
    Uids.uidFilter = Some(Uids.whitelistFilter(Map(
      "tsd.uidfilter.whitelist.metric_patterns" -> "^zz.*")))
    try {
      val (reg2, report) = Uids.assign(registry,
        Map("metric" -> Seq("zz.new", "web.hits", "click")))
      val rep = report.collect().map(r => r.getString(1) ->
        r.getString(3)).toMap
      assert(rep("zz.new") == null)
      assert(rep("web.hits") == "Failed to assign ID for kind='metric' " +
        "name='web.hits' after 0 attempts due to: Blocked by UID filter.")
      assert(rep("click").startsWith("Name already exists"))
      assert(Uids.resolve(reg2, "metric", "web.hits").isEmpty)
      assert(Uids.resolve(reg2, "metric", "zz.new").take(1).nonEmpty)
    } finally Uids.uidFilter = None
  }

  test("/api/uid/assign V1 response document (TestUniqueIdRpc " +
       "assignQs* ports): per-kind name-sorted maps, _errors only on " +
       "failure, 400 iff any name failed") {
    import spark.implicits._
    import graft.meta.Uids
    val pts = Seq(("click", "a"), ("view", "b")).toDF("metric", "u")
      .withColumn("tags", map(lit("host"), col("u")))
      .select("metric", "tags")
    val registry = Introspect.uidRegistry(pts)
    // assignQsMetricDouble: all-fresh names → one kind object, no
    // _errors, 200
    val (_, repOk) = Uids.assign(registry,
      Map("metric" -> Seq("sys.cpu.0", "sys.cpu.2")))
    val (jsonOk, errOk) = Uids.assignJson(repOk)
    assert(!errOk)
    assert(jsonOk.contains(""""sys.cpu.0":"000003"""") &&
      jsonOk.contains(""""sys.cpu.2":"000004""""), jsonOk)
    assert(!jsonOk.contains("_errors"))
    // assignQsMetric2Good1Bad: mixed — results AND metric_errors, 400
    val (_, repMix) = Uids.assign(registry,
      Map("metric" -> Seq("sys.cpu.0", "click", "sys.cpu.2")))
    val (jsonMix, errMix) = Uids.assignJson(repMix)
    assert(errMix)
    assert(jsonMix.contains(""""metric_errors":{"click":"Name already """))
    // name-sorted within each object (TreeMap)
    assert(jsonMix.indexOf("sys.cpu.0") < jsonMix.indexOf("sys.cpu.2"))
    // assignQsFull: multiple kinds each get their own object
    val (_, repFull) = Uids.assign(registry, Map(
      "metric" -> Seq("sys.cpu.0"), "tagk" -> Seq("host2"),
      "tagv" -> Seq("web42")))
    val (jsonFull, _) = Uids.assignJson(repFull)
    assert(jsonFull.contains(""""metric":{""") &&
      jsonFull.contains(""""tagk":{""") && jsonFull.contains(""""tagv":{"""))
    // assignQsEmpty: the reference's error
    assert(intercept[IllegalArgumentException](
        Uids.assign(registry, Map.empty))
      .getMessage.contains("Missing values to assign UIDs"))
  }

  test("uid admin mutations: assign continues numbering, rename keeps uid") {
    import spark.implicits._
    val pts = Seq(("click", "a"), ("view", "b")).toDF("metric", "u")
      .withColumn("tags", map(lit("host"), col("u")))
      .select("metric", "tags")
    val registry = Introspect.uidRegistry(pts)
    def lookup(reg: org.apache.spark.sql.DataFrame) =
      reg.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // assign: new names continue each kind's dense numbering; an
    // already-assigned name reports an error row, others still succeed
    val (reg2, report) = Uids.assign(registry,
      Map("metric" -> Seq("purchase", "click"), "tagk" -> Seq("dc")))
    val rep = report.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getString(3))).toMap
    assert(rep(("metric", "purchase"))._2 == null)
    assert(rep(("metric", "click"))._2.startsWith("Name already exists"))
    assert(rep(("tagk", "dc"))._2 == null)
    val ids2 = lookup(reg2)
    assert(ids2(("metric", "purchase")) ==
      lookup(registry).filter(_._1._1 == "metric").values.max + 1)
    assert(ids2(("tagk", "dc")) == 2) // host=1 from the seed

    // rename: the NAME moves, the uid does not — re-resolving the
    // q49-style lookup under the new name yields the original id
    val oldUid = Uids.resolve(registry, "metric", "click")
      .head.getLong(0)
    val reg3 = Uids.rename(reg2, "metric", "click", "clicks")
    assert(Uids.resolve(reg3, "metric", "clicks").head.getLong(0) == oldUid)
    assert(Uids.resolve(reg3, "metric", "click").isEmpty)
    // old name gone → the reference's errors reproduce
    assert(intercept[IllegalArgumentException](
      Uids.rename(reg3, "metric", "click", "x")
    ).getMessage.contains("does not exist"))
    assert(intercept[IllegalArgumentException](
      Uids.rename(reg3, "metric", "view", "clicks")
    ).getMessage.contains("already exists"))

    // uidmeta upsert replaces by (kind, uid) identity
    val meta = Seq(("metric", 1L, "Click Events")).toDF(
      "kind", "uid", "displayName")
    val meta2 = Uids.upsertUidMeta(meta,
      Seq(("metric", 1L, "Clicks")).toDF("kind", "uid", "displayName"))
    assert(meta2.collect().map(_.getString(2)).toSeq == Seq("Clicks"))
    assert(Uids.deleteUidMeta(meta2, "metric", 1L).isEmpty)

    // `tsd uid delete`: mapping removed; absent name is a request error
    val reg4 = Uids.delete(reg3, "metric", "clicks")
    assert(Uids.resolve(reg4, "metric", "clicks").isEmpty)
    assert(intercept[IllegalArgumentException](
      Uids.delete(reg4, "metric", "clicks")
    ).getMessage.contains("does not exist"))
  }

  test("UIDMeta/TSMeta POST merge vs PUT replace; created moves earlier " +
       "(UIDMeta.syncMeta / TSMeta.syncMeta ports)") {
    import spark.implicits._
    import graft.meta.Uids
    val stored = Seq(
      ("metric", 1L, Some("Click Events"), Some("old notes"), Some(500L)))
      .toDF("kind", "uid", "displayName", "notes", "created")
    // POST sets only displayName: notes survives the merge
    val post = Seq(("metric", 1L, Some("Clicks"),
        None: Option[String], None: Option[Long]))
      .toDF("kind", "uid", "displayName", "notes", "created")
    val m = Uids.mergeUidMeta(stored, post).head
    assert(m.getAs[String]("displayName") == "Clicks" &&
      m.getAs[String]("notes") == "old notes" &&
      m.getAs[Long]("created") == 500L)
    // created only moves EARLIER: a later edit value loses, an earlier
    // one wins (both syncMeta bodies)
    def withCreated(c: Long) = Seq(("metric", 1L, None: Option[String],
        None: Option[String], Some(c)))
      .toDF("kind", "uid", "displayName", "notes", "created")
    assert(Uids.mergeUidMeta(stored, withCreated(900L))
      .head.getAs[Long]("created") == 500L)
    assert(Uids.mergeUidMeta(stored, withCreated(100L))
      .head.getAs[Long]("created") == 100L)
    // new identity inserts as-is; other rows untouched
    val fresh = Seq(("tagk", 7L, Some("Host"), None: Option[String],
        Some(50L))).toDF("kind", "uid", "displayName", "notes", "created")
    assert(Uids.mergeUidMeta(stored, fresh).count() == 2)
    // TSMeta merge: same contract on the tsuid identity
    val ts = Seq(("AB12", Some("d"), Some("n")))
      .toDF("tsuid", "displayName", "notes")
    val tsPost = Seq(("AB12", Some("d2"), None: Option[String]))
      .toDF("tsuid", "displayName", "notes")
    val t = Uids.mergeTsMeta(ts, tsPost).head
    assert(t.getAs[String]("displayName") == "d2" &&
      t.getAs[String]("notes") == "n")
  }

  test("UIDMeta/TSMeta single-entity RPC sync: gates, 304, merge vs " +
       "overwrite (TestUIDMeta.syncToStorage*, TestTSMeta.syncToStorage*)") {
    import spark.implicits._
    import graft.meta.Uids
    val registry = Seq(("metric", 1L, "sys.cpu.0"))
      .toDF("kind", "uid", "name")
    // stored row mirrors TestUIDMeta's fixture: notes "MyNotes",
    // created 1328140801
    val stored = Seq(("metric", 1L, Some("Name"), Some("MyNotes"),
        Some(1328140801L)))
      .toDF("kind", "uid", "displayName", "notes", "created")
    def edit(dn: Option[String], notes: Option[String] = None,
             created: Option[Long] = None) =
      Seq(("metric", 1L, dn, notes, created))
        .toDF("kind", "uid", "displayName", "notes", "created")
    // POST: un-set fields keep stored values (syncToStorage)
    val post = Uids.syncUidMetaRpc(stored, registry,
      edit(Some("New Display Name")), overwrite = false).head
    assert(post.getAs[String]("displayName") == "New Display Name")
    assert(post.getAs[String]("notes") == "MyNotes")
    assert(post.getAs[Long]("created") == 1328140801L)
    // PUT: user fields replace wholesale (syncToStorageOverwrite) but
    // created still only moves earlier
    val put = Uids.syncUidMetaRpc(stored, registry,
      edit(Some("New Display Name"), created = Some(9999999999L)),
      overwrite = true).head
    assert(put.getAs[String]("displayName") == "New Display Name")
    assert(put.isNullAt(put.fieldIndex("notes")))
    assert(put.getAs[Long]("created") == 1328140801L)
    // gates, texts verbatim (UIDMeta.java:177-192 + the RPC's 404)
    assert(intercept[IllegalStateException] {
      Uids.syncUidMetaRpc(stored, registry,
        edit(None), overwrite = false)
    }.getMessage == "No changes detected in UID meta data")
    assert(intercept[IllegalArgumentException] {
      Uids.syncUidMetaRpc(stored, registry,
        Seq((null.asInstanceOf[String], 1L, Some("x")))
          .toDF("kind", "uid", "displayName"), overwrite = true)
    }.getMessage == "Missing type")
    assert(intercept[NoSuchElementException] {
      Uids.syncUidMetaRpc(stored, registry,
        Seq(("metric", 2L, Some("Testing")))
          .toDF("kind", "uid", "displayName"), overwrite = true)
    }.getMessage == "Could not find the requested UID")
    // GATE ORDER (UIDMeta.syncToStorage:184-193 runs the no-changes
    // check BEFORE the NameCB UID resolution): an all-unset edit for an
    // UNKNOWN UID is a 304, not a 404
    assert(intercept[IllegalStateException] {
      Uids.syncUidMetaRpc(stored, registry,
        Seq(("metric", 2L, None: Option[String]))
          .toDF("kind", "uid", "displayName"), overwrite = false)
    }.getMessage == "No changes detected in UID meta data")
    // TSMeta: fixture retention 42; POST keeps it, PUT resets it
    // (TestTSMeta.syncToStorage / syncToStorageOverwrite)
    val tsStored = Seq(("000001000001000001", Some("ts"), Some(42L),
        Some(1357300800L)))
      .toDF("tsuid", "displayName", "retention", "created")
    def tsEdit(dn: Option[String]) =
      Seq(("000001000001000001", dn, None: Option[Long],
        None: Option[Long]))
        .toDF("tsuid", "displayName", "retention", "created")
    val tsPost2 = Uids.syncTsMetaRpc(tsStored, tsEdit(Some("New DN")),
      overwrite = false).head
    assert(tsPost2.getAs[String]("displayName") == "New DN")
    assert(tsPost2.getAs[Long]("retention") == 42L)
    val tsPut = Uids.syncTsMetaRpc(tsStored, tsEdit(Some("New DN")),
      overwrite = true).head
    assert(tsPut.isNullAt(tsPut.fieldIndex("retention")))
    assert(intercept[IllegalStateException] {
      Uids.syncTsMetaRpc(tsStored, tsEdit(None), overwrite = true)
    }.getMessage == "No changes detected in TSUID meta data")
    assert(intercept[IllegalArgumentException] {
      Uids.syncTsMetaRpc(tsStored,
        Seq(("", Some("x"))).toDF("tsuid", "displayName"),
        overwrite = true)
    }.getMessage == "Missing TSUID")
    assert(intercept[IllegalArgumentException] {
      Uids.syncTsMetaRpc(tsStored,
        Seq(("FFFF", Some("x"), None: Option[Long], None: Option[Long]))
          .toDF("tsuid", "displayName", "retention", "created"),
        overwrite = false)
    }.getMessage == "Requested TSMeta did not exist")
  }

  test("MetaSync reconciles stored meta against data; MetaPurge drops orphans") {
    import spark.implicits._
    import graft.meta.Uids
    val points = Seq(
      ("cpu", 100L, 1.0, Map("host" -> "a")),
      ("cpu", 50L, 2.0, Map("host" -> "a")),
      ("mem", 200L, 3.0, Map("host" -> "b")))
      .toDF("metric", "ts", "value", "tags")
    val registry = Seq(
      ("metric", "cpu", 1L), ("metric", "mem", 2L),
      ("tagk", "host", 1L), ("tagv", "a", 1L), ("tagv", "b", 2L))
      .toDF("kind", "name", "uid")
    // stored: cpu has a WRONG (too-late) created; ghost backs no data;
    // everything else is missing
    val stored = Seq(
      ("metric", "cpu", 1L, 5000L),
      ("metric", "ghost", 99L, 42L))
      .toDF("kind", "name", "uid", "created")
    val synced = Uids.syncUidMeta(points, registry, stored)
    val byName = synced.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("created"), r.getString(4))).toMap
    assert(byName(("metric", "cpu")) == ((50L, "fixed_created")))
    assert(byName(("metric", "mem")) == ((200L, "created")))
    assert(byName(("metric", "ghost")) == ((42L, "orphan")))
    assert(byName(("tagk", "host")) == ((50L, "created")))
    assert(byName(("tagv", "b")) == ((200L, "created")))
    assert(Uids.purgeOrphans(synced).filter(col("name") === "ghost").isEmpty)

    // an EARLIER stored created is preserved (may predate retained data)
    val stored2 = Seq(("metric", "cpu", 1L, 10L))
      .toDF("kind", "name", "uid", "created")
    val ok = Uids.syncUidMeta(points, registry, stored2)
      .filter(col("name") === "cpu").head()
    assert(ok.getAs[Long]("created") == 10L && ok.getString(4) == "ok")

    // TSMeta side with the canonical tsuid surrogate
    val ts = Uids.syncTsMeta(points,
      Seq(("cpu|host=a", 5000L), ("gone|host=z", 7L))
        .toDF("tsuid", "created"),
      graft.meta.Trees.canonicalTsuid)
    val m = ts.collect().map(r => r.getString(0) ->
      (r.getAs[Long]("created"), r.getString(2))).toMap
    assert(m("cpu|host=a") == ((50L, "fixed_created")))
    assert(m("mem|host=b") == ((200L, "created")))
    assert(m("gone|host=z") == ((7L, "orphan")))
  }

  test("tree rule CRUD: stored rules drive the branch build") {
    import spark.implicits._
    import graft.meta.Trees
    val series = Seq(
      ("sys.cpu.user", Map("host" -> "web01", "dc" -> "east")),
      ("sys.cpu.idle", Map("host" -> "web02")),
      ("app.latency", Map("dc" -> "west")))
      .toDF("metric", "tags")

    // level 0: first metric component; level 1: host tag with a dc-tag
    // FALLBACK at order 1 (first-non-null-wins within a level)
    var rules = Trees.emptyRules(spark)
    rules = Trees.upsertRule(rules,
      Trees.Rule(1, 0, 0, "METRIC", separator = ".", component = 0))
    rules = Trees.upsertRule(rules, Trees.Rule(1, 1, 0, "TAGK", field = "host"))
    rules = Trees.upsertRule(rules, Trees.Rule(1, 1, 1, "TAGK", field = "dc"))
    val nodes = Trees.buildFromRules(series, rules, 1).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("leaves")).toMap
    assert(nodes("sys") == 2 && nodes("app") == 1)
    assert(nodes("sys/web01") == 1 && nodes("sys/web02") == 1)
    assert(nodes("app/west") == 1) // dc fallback fired for app.latency

    // upsert replaces by (treeId, level, order) identity: swap level 0
    // to a regex rule that only matches sys.* metrics
    rules = Trees.upsertRule(rules,
      Trees.Rule(1, 0, 0, "METRIC", regex = "^(sys)\\..*", regexGroup = 1))
    assert(rules.filter(col("level") === 0).count() == 1)
    val pruned = Trees.buildFromRules(series, rules, 1).collect()
      .map(_.getAs[String]("path")).toSet
    assert(pruned("sys") && !pruned.exists(_.startsWith("app")))

    // delete removes the level-1 fallback; dc-only series prune at depth 2
    rules = Trees.deleteRule(rules, 1, 1, 1)
    val noFallback = Trees.buildFromRules(series, rules, 1).collect()
      .map(_.getAs[String]("path")).toSet
    assert(!noFallback.contains("sys/east") && noFallback("sys/web01"))
    // unknown tree id fails fast
    intercept[IllegalArgumentException](
      Trees.buildFromRules(series, rules, 9))
  }

  test("tree rule validation: type names, required fields, id gates " +
       "(TestTreeRule ports)") {
    import graft.meta.Trees
    def err(f: => Any) = intercept[IllegalArgumentException](f).getMessage
    // stringToType vectors: case-insensitive names, no plain TAGV
    assert(Trees.stringToType("Metric") == "METRIC")
    assert(Trees.stringToType("Metric_Custom") == "METRIC_CUSTOM")
    assert(Trees.stringToType("TagK") == "TAGK")
    assert(Trees.stringToType("TagK_Custom") == "TAGK_CUSTOM")
    assert(Trees.stringToType("TagV_Custom") == "TAGV_CUSTOM")
    assert(err(Trees.stringToType(null)) == "Rule type was empty")
    assert(err(Trees.stringToType("")) == "Rule type was empty")
    assert(err(Trees.stringToType("NotAType")) == "Unrecognized rule type")
    // storeRuleBadID0 / BadID65536 / BadLevel / BadOrder
    val ok = Trees.Rule(1, 1, 0, "TAGK", field = "host")
    assert(err(Trees.validateRule(ok.copy(treeId = 0))) == "Invalid Tree ID")
    assert(err(Trees.validateRule(ok.copy(treeId = 65536))) ==
      "Invalid Tree ID")
    assert(err(Trees.validateRule(ok.copy(level = -1))) ==
      "Invalid rule level")
    assert(err(Trees.validateRule(ok.copy(order = -1))) ==
      "Invalid rule order")
    // storeRuleInvalidType (no type set) / MissingFieldTagk / Custom
    assert(err(Trees.validateRule(ok.copy(ruleType = ""))) ==
      "Rule type was empty")
    assert(err(Trees.validateRule(ok.copy(field = ""))) ==
      "Missing field name required for TAGK rule")
    assert(err(Trees.validateRule(Trees.Rule(1, 1, 0, "TAGK_CUSTOM",
        field = ""))) == "Missing field name required for TAGK_CUSTOM rule")
    assert(err(Trees.validateRule(Trees.Rule(1, 1, 0, "TAGV_CUSTOM",
        field = "host"))) ==
      "Missing custom field name required for TAGV_CUSTOM rule")
    assert(err(Trees.validateRule(Trees.Rule(1, 1, 0, "METRIC_CUSTOM",
        field = "host"))) ==
      "Missing custom field name required for METRIC_CUSTOM rule")
    // setRegexBadPattern → PatternSyntaxException; bad group index
    intercept[java.util.regex.PatternSyntaxException](
      Trees.validateRule(ok.copy(regex = "Invalid\\\\(pattern")))
    assert(err(Trees.validateRule(ok.copy(regexGroup = -1))) ==
      "Invalid regex group index. Cannot be less than 0")
    // METRIC needs nothing beyond the ids
    Trees.validateRule(Trees.Rule(1, 0, 0, "METRIC"))
    // upsertRule gates on the same validation (syncToStorage order)
    assert(err(Trees.upsertRule(Trees.emptyRules(spark),
      Trees.Rule(0, 0, 0, "METRIC"))) == "Invalid Tree ID")
  }

  test("tree buildReport emits collision and not-matched side-channels") {
    import spark.implicits._
    import graft.meta.Trees
    // web01/web02 collide on path sys/east (reference Branch.addLeaf
    // leaf-hash collision); the host-less series strands at level 1
    val series = Seq(
      ("sys.cpu", Map("host" -> "web01", "dc" -> "east")),
      ("sys.cpu", Map("host" -> "web02", "dc" -> "east")),
      ("sys.cpu", Map("host" -> "web03")))
      .toDF("metric", "tags")
    var rules = Trees.emptyRules(spark)
    rules = Trees.upsertRule(rules, Trees.Rule(1, 0, 0, "METRIC"))
    rules = Trees.upsertRule(rules, Trees.Rule(1, 1, 0, "TAGK", field = "dc"))
    val rep = Trees.buildReport(series, rules, 1)
    val col0 = rep.collisions.collect()
    assert(col0.length == 1)
    // deterministic winner = MIN tsuid: web01 sorts before web02
    assert(col0(0).getAs[String]("tsuid").contains("web02"))
    assert(col0(0).getAs[String]("existing_tsuid").contains("web01"))
    assert(col0(0).getAs[String]("path") == "sys.cpu/east")
    val nm = rep.notMatched.collect()
    assert(nm.length == 1)
    assert(nm(0).getAs[String]("tsuid").contains("web03"))
    // message = the failed level's LAST rule tag (TreeBuilder.java:647)
    assert(nm(0).getAs[String]("message") == "[1:1:0:TAGK]")
    // the tree itself is unchanged by reporting
    assert(rep.tree.count() ==
      Trees.buildFromRules(series, rules, 1).count())
  }

  test("streaming funnel == batch funnel under time-ordered arrivals") {
    import graft.pipeline.Trajectories
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "purchase", 0.0),
      (4L, 1000L, 2L, "click", 0.0), (5L, 2000L, 2L, "view", 0.0),
      (6L, 1000L, 3L, "view", 0.0), (7L, 1500L, 3L, "click", 0.0),
      (8L, 999999999L, 3L, "purchase", 0.0),
      (9L, 2500L, 2L, "click", 0.0)) // u2 converts AFTER its view
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val ev = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Trajectories
      .funnelStream(ev, Seq("view", "click", "purchase"), windowMs = 10000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    // feed per-user time-ordered, split across batches
    rows.sortBy(r => (r._2, r._1)).grouped(3).foreach { g =>
      mem.addData(g: _*); q.processAllAvailable()
    }
    // advances emit when the watermark passes t0 + window: the far-
    // future event already pushed it there; one more tick fires the
    // event-time timeouts against the advanced watermark
    mem.addData((10L, 999999999L, 999L, "noop", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
        "SELECT stageIdx, count(DISTINCT userId) AS n FROM funnel_out GROUP BY stageIdx")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = Trajectories.funnel(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
        Seq("view", "click", "purchase"), windowMs = 10000L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
    assert(batch == Map(0 -> 3L, 1 -> 3L, 2 -> 1L))
  }

  test("streaming funnel == batch funnel under SHUFFLED arrivals (late within watermark)") {
    import graft.pipeline.Trajectories
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // u1 is the round-8 killer: the click arrives BEFORE its view.
    // Greedy arrival-order processing would skip the click (no stage-0
    // yet) and report u1 at stage 0; the buffered chain recompute must
    // recover the full view->click->purchase funnel.
    // u2: click ts precedes its view ts — never qualifies for stage 1.
    // u3: purchase lands outside the window — stages 0-1 only.
    val rows = Seq(
      (1L, 5000L, 1L, "click", 0.0),   // arrives first, out of order
      (2L, 1000L, 1L, "view", 0.0),    // the late stage-0 entry
      (3L, 6000L, 1L, "purchase", 0.0),
      (4L, 100000L, 2L, "view", 0.0),
      (5L, 99000L, 2L, "click", 0.0),  // before u2's t0: no stage 1
      (6L, 1000L, 3L, "view", 0.0),
      (7L, 1500L, 3L, "click", 0.0),
      (8L, 50000L, 3L, "purchase", 0.0)) // > t0 + 10000: outside window
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val ev = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    // lateness must cover the disorder: u1's view is 4 s older than
    // the click already delivered
    val q = Trajectories
      .funnelStream(ev, Seq("view", "click", "purchase"),
        windowMs = 10000L, lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_shuf").start()
    // deliver in the scrambled order above, two per micro-batch
    rows.grouped(2).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    // sentinel advances the watermark past every close; next tick fires
    mem.addData((90L, 999999999L, 999L, "noop", 0.0))
    q.processAllAvailable()
    mem.addData((91L, 999999999L, 999L, "noop", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
        "SELECT stageIdx, count(DISTINCT userId) AS n FROM funnel_shuf GROUP BY stageIdx")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = Trajectories.funnel(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
        Seq("view", "click", "purchase"), windowMs = 10000L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(streamed == batch, s"$streamed vs $batch")
    assert(batch == Map(0 -> 3L, 1 -> 2L, 2 -> 1L))
    // per-stage timestamps are the batch MIN-qualifying values
    val u1 = spark.sql(
        "SELECT stageIdx, ts FROM funnel_shuf WHERE userId = 1 ORDER BY stageIdx")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq
    assert(u1 == Seq(0 -> 1000L, 1 -> 5000L, 2 -> 6000L), u1.toString)
  }

  test("funnel tombstone expires at close + TTL even while the user " +
       "keeps emitting (TTL measures time since close, not idle time)") {
    import graft.pipeline.Trajectories
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val ev = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Trajectories
      .funnelStream(ev, Seq("view", "click"), windowMs = 10000L,
        lateness = "1 second", tombstoneTtlMs = 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_ttl").start()
    def feed(rows: (Long, Long, Long, String, Double)*): Unit = {
      mem.addData(rows: _*); q.processAllAvailable()
    }
    // first conversion closes once the watermark passes t0 + window;
    // the tombstone anchors at closedAtW ≈ 49 s → expiry ≈ 109 s
    feed((1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 50000L, 9L, "noop", 0.0))
    feed((4L, 50001L, 9L, "noop", 0.0)) // close fires
    feed((5L, 100000L, 9L, "noop", 0.0)) // watermark → ≈99 s
    // a stage event drains against the live tombstone at watermark
    // ≈99 s: the expiry must stay ANCHORED at ≈109 s — the pre-fix
    // bug re-armed to w + TTL ≈ 159 s on every such arrival, so a
    // chatty user never exited
    feed((6L, 105000L, 1L, "view", 0.0))
    // a dataless tick carries the watermark to ≈124 s, past the
    // anchored expiry (but well short of the old re-armed 159 s):
    // the tombstone clears
    feed((7L, 125000L, 9L, "noop", 0.0))
    // re-entry at 130 s is a fresh chain and converts again (under
    // the old re-arming it would be swallowed until 159 s)
    feed((8L, 130000L, 1L, "view", 0.0), (9L, 131000L, 1L, "click", 0.0))
    feed((10L, 150000L, 9L, "noop", 0.0))
    feed((11L, 150001L, 9L, "noop", 0.0))
    q.stop()
    val u1 = spark.sql(
        "SELECT stageIdx, ts FROM funnel_ttl WHERE userId = 1 ORDER BY ts")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(u1 == Seq((0, 1000L), (1, 2000L), (0, 130000L), (1, 131000L)),
      u1.toString)
  }

  test("streaming sessionization handles SHUFFLED arrivals within the lateness") {
    import graft.pipeline.Trajectories
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    // session events delivered out of order across batches: the
    // session start arrives AFTER its middle, and a second session's
    // event interleaves — native session_window must still merge them
    val rows = Seq(
      (2L, base + 60000, 1L, "click", 2.0),   // middle first
      (3L, base + 3600000, 1L, "view", 3.0),  // next session
      (1L, base, 1L, "view", 1.0),            // late session start
      (4L, base + 120000, 1L, "click", 4.0))  // back to session 1
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val ev = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Trajectories.sessionStream(ev, gapMs = 1800000L,
        lateness = "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_shuf").start()
    rows.foreach { r => mem.addData(r); q.processAllAvailable() }
    mem.addData((99L, base + 864000000L, 999L, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
        "SELECT user_id, n_events, start_ts, end_ts, dur_ms, sum_v, n_types " +
        "FROM sess_shuf WHERE user_id <> 999 ORDER BY start_ts").collect()
    val batch = Trajectories.sessionStats(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"),
        gapMs = 1800000L)
      .select("user_id", "n_events", "start_ts", "end_ts", "dur_ms",
        "sum_v", "n_types")
      .orderBy("start_ts").collect()
    assert(streamed.length == batch.length && streamed.length == 2)
    streamed.zip(batch).foreach { case (s, b) =>
      Seq("user_id", "n_events", "start_ts", "end_ts", "dur_ms").foreach(c =>
        assert(s.getAs[Long](c) == b.getAs[Long](c), s"$c: $s vs $b"))
      assert(s.getAs[Double]("sum_v") == b.getAs[Double]("sum_v"))
      assert(s.getAs[Int]("n_types") == b.getAs[Long]("n_types").toInt)
    }
  }

  test("treesync builds every ruled tree; treepurge drops one (optionally its rules)") {
    import spark.implicits._
    import graft.meta.Trees
    val series = Seq(
      ("sys.cpu", Map("host" -> "web01")),
      ("app.api", Map("host" -> "web02")))
      .toDF("metric", "tags")
    var rules = Trees.emptyRules(spark)
    rules = Trees.upsertRule(rules, Trees.Rule(1, 0, 0, "METRIC"))
    rules = Trees.upsertRule(rules, Trees.Rule(2, 0, 0, "TAGK", field = "host"))
    val synced = Trees.syncAll(series, rules)
    val byTree = synced.collect()
      .groupBy(_.getAs[Int]("tree_id"))
      .view.mapValues(_.map(_.getAs[String]("path")).toSet).toMap
    assert(byTree(1) == Set("sys.cpu", "app.api"))
    assert(byTree(2) == Set("web01", "web02"))
    // purge branches only: tree 1 gone, definition intact
    val (b1, r1) = Trees.purge(synced, rules, treeId = 1)
    assert(b1.select("tree_id").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(2))
    assert(r1.count() == rules.count())
    // purge with definition: rules for tree 2 gone too
    val (b2, r2) = Trees.purge(synced, rules, 2, deleteDefinition = true)
    assert(!b2.select("tree_id").distinct().collect()
      .map(_.getInt(0)).contains(2))
    assert(r2.collect().map(_.getAs[Int]("treeId")).toSet == Set(1))
    // no ruled trees at all fails fast
    intercept[IllegalArgumentException](
      Trees.syncAll(series, Trees.emptyRules(spark)))
  }

  test("tree testRun traces per-rule values with level fallback") {
    import spark.implicits._
    import graft.meta.Trees
    val series = Seq(
      ("sys.cpu", Map("host" -> "web01", "dc" -> "east")),
      ("sys.cpu", Map("host" -> "web02")))
      .toDF("metric", "tags")
    var rules = Trees.emptyRules(spark)
    rules = Trees.upsertRule(rules, Trees.Rule(1, 0, 0, "METRIC"))
    rules = Trees.upsertRule(rules, Trees.Rule(1, 1, 0, "TAGK", field = "dc"))
    rules = Trees.upsertRule(rules, Trees.Rule(1, 1, 1, "TAGK", field = "host"))
    val trace = Trees.testRun(series, rules, 1).collect()
      .map(r => (r.getAs[String]("tsuid"), r.getAs[String]("rule")) ->
        (r.getAs[String]("value"), r.getAs[Boolean]("tried"),
          r.getAs[Boolean]("matched"))).toMap
    val t1 = trace.keys.map(_._1).find(_.contains("east")).get
    val t2 = trace.keys.map(_._1).find(!_.contains("east")).get
    // series 1: dc matches at order 0, so the host fallback is NOT tried
    assert(trace((t1, "[1:1:0:TAGK]")) == (("east", true, true)))
    assert(trace((t1, "[1:1:1:TAGK]"))._2 == false)
    // series 2: dc misses, host fallback tried and matched
    assert(trace((t2, "[1:1:0:TAGK]")) == ((null, true, false)))
    assert(trace((t2, "[1:1:1:TAGK]")) == (("web02", true, true)))
  }

  test("tree *_CUSTOM rules read UID meta custom maps (TestTreeBuilder)") {
    // reference TreeBuilder.java:800-900 — the level value comes from
    // the UID's meta custom[customField], not the name itself
    // (processTimeseriesMetaMetricCustom / TagkCustom / TagvCustom)
    import spark.implicits._
    import graft.meta.Trees
    val series = Seq(
      ("sys.cpu.user", Map("host" -> "web01")),
      ("sys.cpu.idle", Map("host" -> "web02")),
      ("app.latency", Map("dc" -> "west")))
      .toDF("metric", "tags")
    val uidMeta = Seq(
      ("metric", "sys.cpu.user", Map("owner" -> "alice")),
      ("metric", "sys.cpu.idle", Map("owner" -> "bob")),
      ("tagk", "host", Map("datacenter" -> "lga")),
      ("tagv", "web01", Map("rack" -> "r7")))
      .toDF("kind", "name", "custom")
    var rules = Trees.emptyRules(spark)
    // the reference demands a non-empty field even for METRIC_CUSTOM
    // (validateRule), though the metric name is the implicit source
    rules = Trees.upsertRule(rules, Trees.Rule(2, 0, 0, "METRIC_CUSTOM",
      field = "metric", customField = "owner"))
    rules = Trees.upsertRule(rules, Trees.Rule(2, 1, 0, "TAGK_CUSTOM",
      field = "host", customField = "datacenter"))
    rules = Trees.upsertRule(rules, Trees.Rule(2, 2, 0, "TAGV_CUSTOM",
      field = "host", customField = "rack"))
    val nodes = Trees.buildFromRules(series, rules, 2, Some(uidMeta))
      .collect().map(r => r.getAs[String]("path") -> r.getAs[Long]("leaves"))
      .toMap
    // app.latency has no metric meta -> prunes at level 0 (no-match);
    // both sys metrics resolve their owner; only series WITH the host
    // tag get the tagk custom value; only web01 has a rack
    assert(nodes("alice") == 1 && nodes("bob") == 1)
    assert(!nodes.keys.exists(_.contains("app")))
    assert(nodes("alice/lga") == 1 && nodes("bob/lga") == 1)
    assert(nodes("alice/lga/r7") == 1)
    assert(!nodes.contains("bob/lga/r7")) // web02 has no rack meta
    // custom rules without a meta table fail fast
    intercept[IllegalArgumentException](
      Trees.buildFromRules(series, rules, 2))
    // separator/regex post-processing applies to custom values too
    var r2 = Trees.emptyRules(spark)
    r2 = Trees.upsertRule(r2, Trees.Rule(3, 0, 0, "METRIC_CUSTOM",
      field = "metric", customField = "owner", regex = "^(a).*",
      regexGroup = 1))
    val ex = Trees.buildFromRules(series, r2, 3, Some(uidMeta))
      .collect().map(_.getAs[String]("path")).toSet
    assert(ex == Set("a")) // only alice matches ^(a).*
    // strict matching (processTimeseriesMetaStrict/StrictNoMatch):
    // a series failing ANY level vanishes from the tree — web02 has no
    // rack meta, so under strict it contributes nothing, not "bob/lga"
    val strict = Trees.buildFromRules(series, rules, 2, Some(uidMeta),
        strictMatch = true)
      .collect().map(r => r.getAs[String]("path")).toSet
    assert(strict == Set("alice", "alice/lga", "alice/lga/r7"))
  }

  test("histogram codec registry decodes stored blobs to bucket rows") {
    import spark.implicits._
    import graft.operators.Histograms
    import graft.operators.Histograms.Bucket
    // bundled SimpleHistogram codec round-trip plus a custom codec
    // (single-byte count in [0,width) buckets) under a new id
    Histograms.registerCodec(7, bytes =>
      if (bytes == null || bytes.isEmpty) Seq.empty
      else bytes.toSeq.zipWithIndex.map { case (c, i) =>
        Bucket(i * 10.0, (i + 1) * 10.0, (c & 0xff).toLong)
      })
    val simple = Histograms.simpleHistogramEncode(
      Seq(Bucket(0, 10, 4), Bucket(10, 20, 6)))
    val rows = Seq(
      ("web", Histograms.SIMPLE_CODEC_ID, simple),
      ("web", 7, Array[Byte](1, 9)),   // buckets (0-10):1, (10-20):9
      ("web", 99, Array[Byte](1)),     // unknown codec id → no rows
      ("db", 7, null: Array[Byte]))    // undecodable → no rows
      .toDF("host", "codec_id", "blob")
    val hist = Histograms.decodeBlobs(rows, Seq("host"))
    val got = hist.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getLong(3))).toSet
    // same-bucket counts merge across blobs: (0,10) = 4+1, (10,20) = 6+9
    assert(got == Set(("web", 0.0, 5L), ("web", 10.0, 15L)))
    // decoded rows feed percentile extraction directly
    val p50 = Histograms.percentile(hist, Seq("host"), 0.5)
      .head.getDouble(1)
    assert(p50 > 10.0 && p50 < 20.0) // 10 of 20 lands in bucket (10,20)
  }

  test("search plugins see meta mutations and can serve lookups") {
    import spark.implicits._
    val seen = scala.collection.mutable.Buffer[String]()
    val served = Seq(("srv", Map("host" -> "x"))).toDF("metric", "tags")
    val plugin = new graft.meta.SearchPlugin {
      override def indexAnnotation(e: org.apache.spark.sql.DataFrame) =
        seen += s"ann+${e.count()}"
      override def deleteUidMeta(kind: String, uid: Long) =
        seen += s"uid-$kind/$uid"
      override def indexTsMeta(e: org.apache.spark.sql.DataFrame) =
        seen += s"ts+${e.count()}"
      override def executeLookup(metric: String, tags: Map[String, String]) =
        if (metric == "srv") Some(served) else None
    }
    graft.meta.SearchPlugins.register(plugin)
    try {
      val annTable = Seq(("a", 1L, 2L, "x")).toDF(
        "tag_host", "start_ts", "end_ts", "description")
      Annotations.upsert(annTable,
        Seq(("b", 3L, 4L, "y")).toDF(
          "tag_host", "start_ts", "end_ts", "description"),
        Seq("tag_host")).count()
      Uids.deleteUidMeta(
        Seq(("metric", 1L, "d")).toDF("kind", "uid", "displayName"),
        "metric", 1L).count()
      Uids.upsertTsMeta(Seq(("t1", "d")).toDF("tsuid", "displayName"),
        Seq(("t2", "e")).toDF("tsuid", "displayName")).count()
      assert(seen.toSet == Set("ann+1", "uid-metric/1", "ts+1"))
      // plugin-served lookup replaces the scan; others fall through
      val pts = Seq(("cpu", Map("host" -> "a"), 1L))
        .toDF("metric", "tags", "ts")
      assert(Introspect.lookup(pts, "srv").collect()
        .map(_.getString(0)).toSeq == Seq("srv"))
      assert(Introspect.lookup(pts, "cpu", Map("host" -> "a")).count() == 1)
      assert(Introspect.lookup(pts, "cpu", Map("host" -> "zz")).count() == 0)
    } finally graft.meta.SearchPlugins.deregister(plugin)
  }

  test("/api/search/<type> dispatches to plugins with reference errors") {
    import spark.implicits._
    import graft.meta.SearchPlugins
    // no plugin registered → the reference's IllegalStateException
    assert(intercept[IllegalStateException](
      SearchPlugins.search("tsmeta", "host:web*")
    ).getMessage.contains("Searching has not been enabled on this TSD"))
    // type parse errors match SearchQuery.parseSearchType
    assert(intercept[IllegalArgumentException](
      SearchPlugins.search("", "q")).getMessage
      .contains("Type provided was null or empty"))
    assert(intercept[IllegalArgumentException](
      SearchPlugins.search("bogus", "q")).getMessage
      .contains("Unknown type: bogus"))
    // a registered plugin serves the non-lookup types
    val hits = Seq(("t1", "sys.cpu")).toDF("tsuid", "metric")
    val plugin = new graft.meta.SearchPlugin {
      override def executeSearch(t: String, q: String, limit: Int,
                                 start: Int) =
        if (t == "tsmeta" && q == "host:web*") Some(hits) else None
    }
    SearchPlugins.register(plugin)
    try {
      assert(SearchPlugins.search("TSMETA", "host:web*").count() == 1)
      // lookup never routes through the plugin-search path
      assert(intercept[IllegalArgumentException](
        SearchPlugins.search("lookup", "q")).getMessage
        .contains("engine-served"))
    } finally SearchPlugins.deregister(plugin)
  }

  test("export round-trips through the put-line parser") {
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(Seq(
      Row("cpu", 1700000000000L, 42.0, 42L, true,
        Map("host" -> "a", "dc" -> "x")),
      Row("mem", 1700000001000L, 1.5, null, false, Map("host" -> "b"))
    ).asJava, Points.schema)
    val lines = Export.toPutLines(pts)
    val back = Ingest.parsePutLines(lines).filter(col("_error").isNull)
    assert(back.count() == 2)
    val cpu = back.filter(col("metric") === "cpu").collect()(0)
    assert(cpu.getAs[Long]("ts") == 1700000000000L)
    assert(cpu.getAs[Boolean]("is_int") && cpu.getAs[Long]("value_l") == 42L)
    assert(cpu.getAs[Map[String, String]]("tags") ==
      Map("dc" -> "x", "host" -> "a"))
  }

  test("histogram JSON sink parses to relational bucket rows") {
    import spark.implicits._
    val body =
      """{"metric":"lat","timestamp":1700000000,
         "buckets":{"0.0,10.0":5,"10.0,20.0":2},"tags":{"host":"a"}}"""
    val rows = Ingest.parseHistogramJson(Seq(body).toDF("value"))
      .orderBy("bucket_lo").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("ts") == 1700000000000L)
    assert(rows(0).getAs[Double]("bucket_lo") == 0.0 &&
      rows(0).getAs[Double]("bucket_hi") == 10.0 &&
      rows(0).getAs[Long]("count") == 5L)
    assert(rows(1).getAs[Long]("count") == 2L)
  }

  test("rollup JSON sink parses pre-aggregated points") {
    import spark.implicits._
    val body =
      """{"metric":"cpu","timestamp":1700000000,"value":"42.5",
         "interval":"1h","aggregator":"SUM","tags":{"host":"a"}}"""
    val r = Ingest.parseRollupJson(Seq(body).toDF("value")).collect()(0)
    assert(r.getAs[String]("metric") == "cpu")
    assert(r.getAs[Long]("ts") == 1700000000000L)
    assert(r.getAs[String]("aggregator") == "sum")
    assert(r.getAs[String]("interval") == "1h")
    assert(r.getAs[Double]("value") == 42.5)
  }

  test("data-point budget guard fails oversized results lazily") {
    import spark.implicits._
    val df = (1 to 10).toDF("v")
    assert(Engine.withMaxDataPoints(df, 10).count() == 10)
    intercept[Exception] { Engine.withMaxDataPoints(df, 9).count() }
  }

  test("scan-byte budget rejects overscan at plan time, before any job") {
    import spark.implicits._
    val df = (1 to 1000).toDF("v")
    assert(Engine.withMaxScanBytes(df, Long.MaxValue).count() == 1000)
    // plan-stat estimate of 1000 ints is far above 1 byte; the guard
    // must throw from the driver without running a job
    intercept[IllegalStateException] { Engine.withMaxScanBytes(df, 1L) }
  }

  test("compact rewrites many small files into few, preserving rows") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_compact").toString + "/pts"
    // simulate many micro-batch appends: 6 tiny files across 2 dates
    (0 until 6).foreach { i =>
      Seq(("cpu", 1700000000000L + i * 3600000L, i.toDouble))
        .toDF("metric", "ts", "value")
        .withColumn("date", to_date(timestamp_millis(col("ts"))))
        .write.mode("append").partitionBy("date").parquet(out)
    }
    val before = spark.read.parquet(out)
    val beforeRows = before.collect().toSet
    assert(before.inputFiles.length >= 6)
    Ingest.compact(spark, out)
    val after = spark.read.parquet(out)
    assert(after.collect().toSet == beforeRows)
    assert(after.inputFiles.length < 6)
  }

  test("put summary/details report success and failure counts") {
    import spark.implicits._
    val parsed = Ingest.parsePutLines(Seq(
      "put cpu 1700000000 1 host=a",
      "put cpu 1700000060 2 host=a",
      "not a put line",
      "put cpu notatime 3 host=a").toDF("value"))
    val s = Ingest.putSummary(parsed).collect()(0)
    assert(s.getAs[Long]("success") == 2L && s.getAs[Long]("failed") == 2L)
    assert(Ingest.putDetails(parsed).count() == 2)
  }

  test("truncated and malformed-tag put lines flow to _error, not errors") {
    import spark.implicits._
    // under ANSI mode (Spark 4 default) naive element_at/getItem would
    // THROW on these instead of routing them to the dead-letter column
    val parsed = Ingest.parsePutLines(Seq(
      "put",                               // 1 token
      "put cpu",                           // no ts/value
      "",                                  // blank
      "put cpu 1700000000 1 hostnoequals", // tag without '='
      "put cpu 1700000000 1 host=a").toDF("value"))
    val errs = parsed.select("_error").collect().map(_.getString(0))
    assert(errs.count(_ == null) == 1)
    assert(errs.contains("too few fields"))
    assert(errs.contains("bad tag"))
  }

  test("doubled spaces in put lines are errors, not whitespace collapse") {
    import spark.implicits._
    // the reference's WordSplitter splits on a SINGLE space char
    // (Tags.splitString(line, ' ')) — "put  cpu ..." yields an empty
    // token where the metric should be, and fails
    val parsed = Ingest.parsePutLines(Seq(
      "put  cpu 1700000000 1 host=a",   // doubled space → empty metric
      "put cpu 1700000000 1 host=a").toDF("value"))
      .select("_error").collect().map(_.getString(0))
    assert(parsed.count(_ == null) == 1)
    assert(parsed.exists(e => e != null))
  }

  test("normalize plugin rewrites tags at ingest (put line + JSON round-trip)") {
    import spark.implicits._
    import graft.sources.{Ingest, NormalizePlugins}
    try {
      // reference NormalizePlugin.normalizeTags: here lowercase keys
      // and rewrite a legacy tag value
      NormalizePlugins.register(tags =>
        transform_values(transform_keys(tags, (k, _) => lower(k)),
          (_, v) => when(v === "web-one", "web01").otherwise(v)))
      val parsed = Ingest.parsePutLines(
        Seq("put cpu 1700000000 1 HOST=web-one DC=east").toDF("value"))
      val m = parsed.select("tags").head.getMap[String, String](0)
      assert(m == Map("host" -> "web01", "dc" -> "east"))
      assert(parsed.select("_error").head.isNullAt(0))
      // q58-style JSON round-trip under the same normalizer
      val body = Seq(
        """{"metric":"cpu","timestamp":1700000000,"value":"2",
           "tags":{"HOST":"web-one"}}""").toDF("value")
      val viaJson = Ingest.parsePutJson(body).select("tags").head
        .getMap[String, String](0)
      assert(viaJson == Map("host" -> "web01"))
    } finally NormalizePlugins.reset()
    // default is identity
    val raw = Ingest.parsePutLines(
      Seq("put cpu 1700000000 1 HOST=web-one").toDF("value"))
      .select("tags").head.getMap[String, String](0)
    assert(raw == Map("HOST" -> "web-one"))
  }

  test("write filter plugin drops rejected points silently, counted aside") {
    import spark.implicits._
    import graft.sources.{Ingest, WriteFilterPlugins}
    val lines = Seq(
      "put cpu 1700000000 1 host=bad",
      "put cpu 1700000001 2 host=ok",
      "put mem 1700000002 3 host=bad",
      "not a put line").toDF("value")
    // gate off: identity, parse errors untouched
    val parsed = Ingest.parsePutLines(lines)
    assert(Ingest.applyWriteFilter(
      parsed.filter(col("_error").isNull)).count() == 3)
    try {
      // reference WriteableDataPointFilterPlugin.allowDataPoint:
      // refuse cpu points carrying host=bad
      WriteFilterPlugins.register((m, _, _, tags) =>
        !(m === "cpu" && tags.getItem("host") === "bad"))
      val stored = Ingest.applyWriteFilter(
        parsed.filter(col("_error").isNull))
      assert(stored.select("metric", "tags").collect()
        .map(r => (r.getString(0), r.getMap[String, String](1)("host")))
        .toSet == Set(("cpu", "ok"), ("mem", "bad")))
      // silent drop: the put summary still reports the rejected point
      // as success (TSDB.storeIntoDB WriteCB returns a completed
      // deferred on !allowed — only the parse error is a failure)
      val sm = Ingest.putSummary(parsed).head
      assert(sm.getLong(0) == 3 && sm.getLong(1) == 1)
      // the rejected complement counts ONLY valid-but-refused rows
      assert(Ingest.writeFilterRejected(parsed).count() == 1)
      // the streaming store path is gated by the same predicate
      val tmp = java.nio.file.Files.createTempDirectory("graft_wf_")
      val src = tmp.resolve("src"); java.nio.file.Files.createDirectory(src)
      java.nio.file.Files.write(src.resolve("a.txt"),
        ("put cpu 1700000000 1 host=bad\n" +
         "put cpu 1700000001 2 host=ok\n").getBytes)
      val q = Ingest.streamToParquet(spark,
          spark.readStream.text(src.toString),
          tmp.resolve("out").toString, tmp.resolve("cp").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = spark.read.parquet(tmp.resolve("out").toString)
      assert(out.count() == 1 &&
        out.head.getAs[Map[String, String]]("tags")("host") == "ok")
    } finally WriteFilterPlugins.reset()
  }

  test("/api/status follows table availability through the lifecycle") {
    import graft.meta.Introspect
    import spark.implicits._
    Introspect.resetStatus()
    def st(tables: Seq[() => org.apache.spark.sql.DataFrame]) =
      Introspect.status(spark, tables).head.getString(0)
    val good = () => Seq(1).toDF("x")
    val bad = () => spark.read.parquet("/nonexistent/graft/table")
    // startup grace: total unavailability before the first success
    assert(st(Seq(bad)) == "startup")
    assert(st(Seq(good, good)) == "ok")
    assert(st(Seq(good, bad)) == "partial")
    assert(st(Seq(bad)) == "error")
    Introspect.shutdown()
    assert(st(Seq(good)) == "shutting-down")
    Introspect.resetStatus()
  }

  test("delete-by-query removes only matched series in range") {
    import scala.jdk.CollectionConverters._
    import graft.query.{SubQuery, TsQuery}
    val p = spark.createDataFrame(Seq(
      Row("cpu", 1000L, 1.0, null, false, Map("host" -> "a")),
      Row("cpu", 5000L, 2.0, null, false, Map("host" -> "a")),
      Row("cpu", 1000L, 3.0, null, false, Map("host" -> "b")),
      Row("mem", 1000L, 4.0, null, false, Map("host" -> "a"))
    ).asJava, Points.schema)
    val q = TsQuery(0L, 2000L, Seq.empty)
    val sub = graft.query.QueryParser.parseSubQuery("sum:cpu{host=a}")
    val left = Engine.deletePoints(p, q, sub)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // cpu/a@1000 deleted; cpu/a@5000 out of range survives; b and mem stay
    assert(left == Set(("cpu", 5000L, 2.0), ("cpu", 1000L, 3.0),
      ("mem", 1000L, 4.0)))
  }

  test("wildcard delete on a high-cardinality metric never forces a broadcast") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    import graft.query.{QueryParser, TsQuery}
    // a wildcard delete matches EVERY series of the metric — at 100 TB
    // that set is unbounded, so the matched-series side must not carry
    // an explicit broadcast hint (AQE decides from runtime stats)
    val p = (0 until 5000).map(i => ("cpu", 1000L + i, i.toDouble, s"h$i"))
      .toDF("metric", "ts", "value", "host")
      .select(col("metric"), col("ts"), col("value"),
        lit(null).cast("long").as("value_l"), lit(false).as("is_int"),
        map(lit("host"), col("host")).as("tags"))
    val q = TsQuery(0L, 2000L, Seq.empty)
    val sub = QueryParser.parseSubQuery("sum:cpu{host=wildcard(h*)}")
    val del = Engine.deletePoints(p, q, sub)
    val hints = del.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, "deletePoints must not force a broadcast of the matched-series set")
    // semantics still hold: in-range rows of matched series are gone
    assert(del.count() == 5000 - 1000 - 1)
  }

  test("serializeV1 attaches globalAnnotations when requested") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import graft.query.{QueryParser, TsQuery}
    val p = spark.createDataFrame(Seq(
      Row("cpu", 1000L, 1.0, null, false, Map("host" -> "a"))
    ).asJava, Points.schema)
    val ann = Seq(
      (null.asInstanceOf[java.lang.Long], 500L, 1500L, "maintenance"),
      (java.lang.Long.valueOf(7L), 500L, 1500L, "series-scoped"),
      (null.asInstanceOf[java.lang.Long], 9000L, 9900L, "out of range"))
      .toDF("series", "start_ts", "end_ts", "description")
    val q = TsQuery(0L, 2000L, Seq.empty)
    val sub = QueryParser.parseSubQuery("sum:cpu")
    val doc = Engine.serializeV1(p, q, sub, Seq.empty, Some(ann))
      .collect()(0).getString(0)
    assert(doc.contains("\"globalAnnotations\""))
    assert(doc.contains("maintenance"))
    assert(!doc.contains("series-scoped") && !doc.contains("out of range"))
  }

  test("serializeV1 showTsuids emits the series ids tsuid queries accept") {
    import scala.jdk.CollectionConverters._
    import graft.query.{QueryParser, TsQuery}
    val p = spark.createDataFrame(Seq(
      Row("cpu", 1000L, 1.0, null, false, Map("host" -> "a")),
      Row("cpu", 1000L, 2.0, null, false, Map("host" -> "b"))
    ).asJava, Points.schema)
    val expected = graft.model.Points.withSeriesId(p)
      .select(hex(col("series_id"))).distinct()
      .collect().map(_.getString(0)).toSet
    val q = TsQuery(0L, 2000L, Seq.empty)
    val doc = Engine.serializeV1(p, q, QueryParser.parseSubQuery("zimsum:cpu"),
        showTsuids = true)
      .collect()(0).getString(0)
    assert(doc.contains("\"tsuids\""))
    assert(expected.forall(doc.contains))
  }

  test("serializeV1 attaches per-series annotations to their own group only") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    import graft.query.{QueryParser, TsQuery}
    val p = spark.createDataFrame(Seq(
      Row("cpu", 1000L, 1.0, null, false, Map("host" -> "a")),
      Row("cpu", 2000L, 3.0, null, false, Map("host" -> "b"))
    ).asJava, Points.schema)
    val idOf = Points.withSeriesId(p).select(
        col("tags").getItem("host").as("h"), col("series_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ann = Seq(
      (idOf("a"), 1500L, 1600L, "a-scoped"),
      (idOf("b"), 9000L, 9100L, "b-out-of-range"))
      .toDF("series", "start_ts", "end_ts", "description")
    val q = TsQuery(0L, 3000L, Seq.empty)
    val sub = QueryParser.parseSubQuery("sum:cpu{host=*}")
    val docs = Engine.serializeV1(p, q, sub, seriesAnnotations = Some(ann))
      .collect().map(_.getString(0))
    val a = docs.find(_.contains("\"host\":\"a\"")).get
    val b = docs.find(_.contains("\"host\":\"b\"")).get
    assert(a.contains("a-scoped"), a)
    assert(!b.contains("a-scoped") && !b.contains("b-out-of-range"), b)
    assert(b.contains("\"annotations\":[]"), b)
  }

  test("serializeV1 show_query/show_stats/show_summary ride-alongs") {
    import scala.jdk.CollectionConverters._
    import graft.query.{QueryParser, TsQuery}
    val p = spark.createDataFrame(Seq(
      Row("cpu", 1000L, 1.0, null, false, Map("host" -> "a")),
      Row("cpu", 2000L, 3.0, null, false, Map("host" -> "a")),
      Row("cpu", 1000L, 5.0, null, false, Map("host" -> "b"))
    ).asJava, Points.schema)
    val q = TsQuery(0L, 3000L, Seq.empty)
    val sub = QueryParser.parseSubQuery("sum:cpu{host=*}")
    val docs = Engine.serializeV1(p, q, sub, showQuery = true,
        showStats = true, showSummary = true)
      .collect().map(_.getString(0))
    // per-group documents + ONE trailing statsSummary element
    val summaries = docs.filter(_.contains("\"statsSummary\""))
    assert(summaries.length == 1)
    assert(summaries(0).contains("\"groups\":2") &&
      summaries(0).contains("\"emittedDPs\":3"))
    val series = docs.filterNot(_.contains("statsSummary"))
    assert(series.length == 2)
    // the echoed query object carries the parsed sub-query
    series.foreach { d =>
      assert(d.contains("\"query\":{\"aggregator\":\"sum\""), d)
      assert(d.contains("\"metric\":\"cpu\""), d)
      assert(d.contains("\"filters\":[{\"type\":\"wildcard\"," +
        "\"tagk\":\"host\",\"filter\":\"*\",\"groupBy\":true}]"), d)
    }
    // per-series stats: host=a aggregated 2 dps from 1 series; the
    // emittedDPs member is the QUERY total (3), like the reference's
    // QueryStats map (TestHttpJsonSerializer asserts the sub-query
    // total, not the group's)
    val a = series.find(_.contains("\"host\":\"a\"")).get
    assert(a.contains(
      "\"stats\":{\"aggregatedSize\":2,\"emittedDPs\":3,\"series\":1}"), a)
  }

  test("show_query echoes the request's original downsample text") {
    // reference TSSubQuery.getDownsample returns the REQUEST string
    // ('1h-sum-zero'), not a normalized form — clients round-trip it
    import scala.jdk.CollectionConverters._
    import graft.query.{QueryParser, TsQuery}
    val p = spark.createDataFrame(Seq(
      Row("cpu", 1000L, 1.0, null, false, Map("host" -> "a"))
    ).asJava, Points.schema)
    val q = TsQuery(0L, 3000L, Seq.empty)
    val doc = Engine.serializeV1(p, q,
        QueryParser.parseSubQuery("sum:1h-sum-zero:cpu{host=*}"),
        showQuery = true)
      .collect().map(_.getString(0)).head
    assert(doc.contains("\"downsample\":\"1h-sum-zero\""), doc)
  }

  test("runtime stats counters count engine sub-queries") {
    Introspect.resetStats()
    Introspect.incr("rpc.received")
    Introspect.incr("rpc.received")
    Introspect.incr("query.errors", 3)
    val st = Introspect.statsCounters(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == Map("rpc.received" -> 2L, "query.errors" -> 3L))
  }

  test("streaming rate carries one (ts,value) state per series across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val pts = Ingest.parsePutLines(mem.toDF())
      .filter(col("_error").isNull).drop("_error")
    val rates = Ingest.rateStream(pts,
      graft.query.RateOptions(counter = true, counterMax = 100L))
    val q = rates.toDF().writeStream.format("memory")
      .queryName("rate_stream_test").outputMode("append").start()
    mem.addData(
      "put cpu 1700000000 10 host=a",
      "put cpu 1700000010 30 host=a",  // (30-10)/10 = 2.0
      "put cpu 1700000000 5 host=b")
    q.processAllAvailable()
    mem.addData(
      // next batch: prev state for host=a is (t+10, 30)
      "put cpu 1700000020 90 host=a",  // (90-30)/10 = 6.0
      "put cpu 1700000030 20 host=a",  // rollover: (100-90+20)/10 = 3.0
      "put cpu 1700000010 8 host=b")   // (8-5)/10 = 0.3
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rate_stream_test")
      .select("metric", "ts", "rate").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(got == Seq(
      (1700000010000L, 2.0), (1700000010000L, 0.3),
      (1700000020000L, 6.0), (1700000030000L, 3.0)).sorted)
    // equivalence: same points through the BATCH rate operator
    val batch = graft.operators.Rate(
      Ingest.parsePutLines(Seq(
        "put cpu 1700000000 10 host=a", "put cpu 1700000010 30 host=a",
        "put cpu 1700000020 90 host=a", "put cpu 1700000030 20 host=a",
        "put cpu 1700000000 5 host=b", "put cpu 1700000010 8 host=b")
        .toDF("value")).filter(col("_error").isNull).drop("_error"),
      graft.query.RateOptions(counter = true, counterMax = 100L))
      .select(col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(batch == got)
  }

  test("serializers endpoint lists the built-in JSON serializer") {
    val r = Introspect.serializers(spark).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("serializer") == "json")
    assert(r(0).getAs[String]("response_content_type")
      .startsWith("application/json"))
  }

  test("dropcaches clears the table cache and responds like the reference") {
    import spark.implicits._
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("dc_probe")
    spark.catalog.cacheTable("dc_probe")
    assert(spark.catalog.isCached("dc_probe"))
    val resp = Introspect.dropCaches(spark).collect()(0)
    assert(resp.getAs[String]("status") == "200")
    assert(resp.getAs[String]("message") == "Caches dropped")
    assert(!spark.catalog.isCached("dc_probe"))
  }

  test("shared dedup intermediates re-persist after dropcaches (stale memo guard)") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("d03_minhash_lsh")(spark, dir).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Introspect.dropCaches(spark).collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // a stale memo would serve the unpersisted plan forever; the
    // storage-level guard must rebuild AND re-persist it
    SparkEntry.queries("d03_minhash_lsh")(spark, dir).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
  }
}
