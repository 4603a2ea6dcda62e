package graft

import graft.pipeline._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc local profiling of individual pipeline stages (not part of
  * the driver contract; run via `sbt "runMain graft.Scratch"`). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32).cache()
    docs.count()

    val post = docs.select(col("doc_id").as("id"),
      explode(array_distinct(Dedup.termHashes(col("text"), 3))).as("h"))
    time("postings (tokenize+md5)") { post.count() }
    time("postings again (no cache)") { post.count() }

    val cached = post.persist()
    time("postings persist") { cached.count() }

    val sig = cached.groupBy(col("id")).agg(
      min((col("h") * Dedup.MH_PARAMS.head._1 + Dedup.MH_PARAMS.head._2) % Dedup.MH_PRIME).as("mh0"),
      Dedup.MH_PARAMS.zipWithIndex.tail.map { case ((a, b), i) =>
        min((col("h") * a + b) % Dedup.MH_PRIME).as(s"mh$i")
      }: _*)
    time("signature agg") { sig.count() }

    time("full d03 portable md5") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", bands = 4,
        threshold = 0.5, ngram = 3, portable = true).count()
    }
    time("full d03 fast xxhash64") {
      Dedup.minhashLshPairs(docs, "text", "doc_id", bands = 4,
        threshold = 0.5, ngram = 3, portable = false).count()
    }
    time("full d02 fast xxhash64") {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        threshold = 0.5, ngram = 3, portable = false).count()
    }

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    embs.count()
    time("rhp bucketing only") {
      embs.select(Similarity.rhpBucket(col("embedding"), 6, 64, 0).as("b")).count()
    }
    time("full d05 rhp") {
      Dedup.embeddingRhpPairs(embs, "embedding", "vec_id", 0.35, 6, 64, 3).count()
    }
    spark.stop()
  }
}
