package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines, designed for
 * the 100 TB regime:
 *
 *  - exact: hash-groupBy — one shuffle on the content hash.
 *  - n-gram Jaccard: token-postings self-join (shuffle on token), NOT
 *    an O(n²) cross join; a document-frequency cap drops ultra-common
 *    tokens to kill join skew.
 *  - MinHash + LSH banding: signature is a per-doc aggregation; the
 *    band-bucket self-join only compares docs sharing a bucket, so
 *    cost scales with collision counts, not n².
 *  - SimHash: 32-bit signature by per-bit weighted vote, a pure
 *    aggregation; near-dup candidates found by signature equality (or
 *    banded prefixes).
 *  - embedding near-dup: cosine pairs blocked by a coarse cell id
 *    (IVF-style), avoiding the full cross join.
 *
 * All hashing uses the portable TextAnalysis.h32 so results are
 * engine-independent (and DuckDB-oracle-checkable).
 */
object Dedup {

  import TextAnalysis.{h32, shingles, tokens}

  /** Term extractor: 1 → distinct tokens, n>1 → word n-gram shingles. */
  private def terms(text: Column, ngram: Int): Column =
    if (ngram <= 1) array_distinct(tokens(text)) else shingles(text, ngram)

  /** Exact duplicate groups by content hash: keeper = min id.
    * One shuffle; map-side partial aggregation applies. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /** Distinct (id, token) postings with an optional document-frequency
    * cap (tokens in more than maxDf docs are dropped — the classic
    * skew guard for postings joins). */
  def postings(df: DataFrame, textCol: String, idCol: String,
               maxDf: Option[Long] = None, ngram: Int = 1): DataFrame = {
    val p = df.select(col(idCol).as("id"),
        explode(terms(col(textCol), ngram)).as("tok"))
    maxDf match {
      case None => p
      case Some(cap) =>
        val dfreq = p.groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
        p.join(dfreq.select("tok"), Seq("tok"))
    }
  }

  /**
   * Exact token-set Jaccard similarity for all pairs with similarity ≥
   * threshold, via the postings join. Returns (id_a, id_b, jaccard)
   * with id_a < id_b.
   */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double, maxDf: Option[Long] = None,
                        ngram: Int = 3): DataFrame = {
    val sizes = df.select(col(idCol).as("id"),
      size(terms(col(textCol), ngram)).as("sz"))
    val p = postings(df, textCol, idCol, maxDf, ngram)
    val shared = p.as("a").join(p.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Deterministic MinHash permutation parameters. Multipliers are kept
    * under 2^30 so a*h32 (< 2^62) never overflows a signed 64-bit long;
    * arithmetic is mod the largest 32-bit prime. */
  val MH_PRIME = 4294967291L
  val MH_PARAMS: Seq[(Long, Long)] = Seq(
    (836603681L, 1L), (442543251L, 7L), (1004818243L, 13L), (668265263L, 31L),
    (374761393L, 97L), (741103597L, 41L), (988021567L, 151L), (540483477L, 65537L))

  /** MinHash signature column: for each (a,b) param, min over tokens of
    * (a*h32(tok)+b) mod p. Returns array<long> of length MH_PARAMS. */
  def minhashSignature(text: Column, ngram: Int = 3): Column = {
    val hs = transform(terms(text, ngram), t => h32(t))
    array(MH_PARAMS.map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % MH_PRIME))
    }: _*)
  }

  /**
   * MinHash-LSH candidate pairs: signatures banded (rows-per-band
   * consecutive hashes); docs sharing any band bucket become
   * candidates; candidates verified with exact Jaccard ≥ threshold.
   */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      bands: Int, threshold: Double, ngram: Int = 3): DataFrame = {
    val rowsPerBand = MH_PARAMS.length / bands
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"),
      minhashSignature(col(textCol), ngram).as("sig"))
    val banded = sig.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))
      }: _*)))
      .select(col("id"), col("col.band"), col("col.key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // verify candidates with exact Jaccard over the same term space
    val toks = df.select(col(idCol).as("id"),
      terms(col(textCol), ngram).as("toks"))
    cand
      .join(toks.withColumnRenamed("id", "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
      .join(toks.withColumnRenamed("id", "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 32-bit SimHash: per bit j, sum over distinct tokens of
    * (bit_j(h32)*2 - 1); bit set in the signature iff the vote is
    * non-negative. Pure column expressions (higher-order functions). */
  def simhash32(text: Column, ngram: Int = 3): Column = {
    val hs = transform(terms(text, ngram), t => h32(t))
    val bits = (0 until 32).map { j =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, blocked by a
    * coarse cell (IVF-style) to avoid the cross join. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            cellCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(cellCol).as("cell"),
      col(vecCol).as("vec"))
    v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cos", Similarity.cosine(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }
}
