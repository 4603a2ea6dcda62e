package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-up synthesizer for the SCALING.md evidence runs: expands the
 * driver's sf0.1 tables N× into a scratch directory, preserving the
 * statistical shape the operators care about instead of naively
 * duplicating rows:
 *
 *  - documents: each copy suffixes EVERY alphanumeric run with its
 *    copy tag, a vocabulary remap w → wci that survives the engine's
 *    `[^a-z0-9]+` tokenizer as ONE token. Within a copy every shingle
 *    maps 1:1
 *    onto an original shingle, so each copy reproduces the original's
 *    shingle document-frequency distribution exactly, with zero
 *    overlap across copies: postings candidate pairs scale linearly
 *    in N, as they would in a real corpus that grew N×. (Naive copies
 *    make every doc an N-clique of near-dups — quadratic candidates;
 *    inserted marker tokens create low-diversity shingles around the
 *    marker — also superlinear. Both measure data artifacts, not the
 *    operator.)
 *  - events: each copy shifts user_id into a fresh range — same time
 *    window, N× the series, which is how a metrics corpus actually
 *    grows (more hosts, not longer history, for a fixed query range).
 *  - embeddings: each copy circularly rotates the vector by its copy
 *    index — new points with the same norm/coordinate distribution
 *    (a scalar multiple would leave cosine similarity unchanged).
 *
 * Usage: runMain graft.ScaleGen <srcDir> <outDir> <copies>
 */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesS) = args
    val copies = copiesS.toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ID_STRIDE = 10000000L

    def expand(name: String)(variant: (DataFrame, Int) => DataFrame): Unit = {
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      val out = (0 until copies).map(i => variant(src, i))
        .reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scalegen] $name: ${src.count()} -> ${out.count()} rows")
    }

    expand("documents") { (df, i) =>
      if (i == 0) df
      else df
        .withColumn("doc_id", col("doc_id") + lit(i * ID_STRIDE))
        .withColumn("text",
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"$$1c$i"))
        .withColumn("n_chars", length(col("text")))
    }

    expand("events") { (df, i) =>
      if (i == 0) df
      else df
        .withColumn("event_id", col("event_id") + lit(i * ID_STRIDE))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L))
    }

    expand("embeddings") { (df, i) =>
      if (i == 0) df
      else {
        // rotate by the copy index (new coordinates, same norm and
        // distribution) THEN flip signs by a deterministic per-copy
        // mask (rhpSign): within-copy cosines are preserved exactly
        // (signs cancel in the dot product) while cross-copy cosines
        // decorrelate — rotation alone aliases copies into genuinely
        // similar vectors, inflating true near-dup pair density
        // quadratically as a data artifact (measured: 1069 pairs at
        // 1x -> 111k at 10x with rotation only)
        // rotation index wraps modulo the dimension so copy counts
        // above dim don't drive slice lengths negative
        val n = size(col("embedding"))
        val r = pmod(lit(i), n)
        val rotated = concat(
          slice(col("embedding"), r + 1, n - r),
          slice(col("embedding"), lit(1), r))
        val signs = typedlit((0 until 64).map(d =>
          graft.pipeline.Similarity.rhpSign(i, d).toFloat))
        df.withColumn("vec_id", col("vec_id") + lit(i * ID_STRIDE))
          .withColumn("embedding", zip_with(rotated, signs, (a, b) => a * b))
      }
    }

    spark.stop()
  }
}
