package graft.pipeline

import graft.functions.{BloomHit, CmsEstimate, SketchOps}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/**
 * Bounded-memory mergeable sketches for corpus-scale statistics: the
 * piece of a 100 TB training-data pipeline where even "just a groupBy"
 * stops being cheap because the KEY space itself is huge (distinct
 * tokens, eval-set n-grams, vocabulary frequencies). Every sketch here
 * is a fixed-size commutative monoid, which buys three things at scale:
 *
 *  - map-side combine collapses each input partition to ONE buffer
 *    (256 B / 8 KB / 64 KB) before the shuffle — shuffle traffic is
 *    `partitions × sketch-size`, independent of row count;
 *  - sketches of disjoint corpus shards merge exactly (elementwise
 *    max / or / sum), so incremental ingest folds new shards into a
 *    stored sketch without touching old data — the streaming story is
 *    the SAME code path as batch;
 *  - the frozen sketch is small enough to ride into whole-stage
 *    codegen as a reference object, so the probe side is a pure
 *    projection over the corpus — no join, no shuffle, no state.
 *
 * All index math uses the engine's portable 60-bit md5-prefix hash
 * (`TextAnalysis.h60`) with power-of-two tables and the two-hash
 * position scheme in [[SketchOps]], chosen precisely so the DuckDB
 * oracle replicates every register/bit/counter with integer SQL.
 *
 * HLL per Flajolet et al. 2007 (+ the HLL++ 64-bit-hash fix that
 * removes the large-range correction); CMS per Cormode & Muthukrishnan
 * 2005; the two-hash Bloom scheme per Kirsch & Mitzenmacher 2006.
 */
object Sketches {

  // ---------------------------------------------------------------- HLL

  /** m = 2^8 registers; ranks beyond 50 clamp so the harmonic term
    * `2^(50-rank)` stays integral (a register rank above 50 needs
    * ~2^58 distinct values to appear — beyond any corpus). */
  val HllM = 256
  val HllRankCap = 50

  /** `sum_j 2^(50 - M_j)` — the HLL harmonic denominator scaled by
    * 2^50 so it is an EXACT integer (the raw `sum 2^-M_j` is a dyadic
    * rational; scaling makes the cross-engine compare bit-trivial). */
  case class HllSketch(v_zero: Int, harm_x2p50: Long, est: Double)

  /** alpha_m * m^2 * 2^50, every factor a power of two except alpha —
    * one IEEE division by the integral harmonic term yields the raw
    * HLL estimate deterministically on any engine. */
  private val HllNumerator =
    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 1125899906842624.0

  /** Small-range (linear-counting) correction `m ln(m/V)`, applied
    * when raw ≤ 2.5m and V > 0. The transcendental makes cross-engine
    * bit-equality non-trivial, but V has only 256 possible values —
    * so the oracle embeds THIS table (rendered from the same JVM's
    * Math.log) as literals instead of calling the other engine's ln. */
  val HllCorrection: Array[Double] =
    Array.tabulate(HllM + 1)(v =>
      if (v == 0) 0.0 else HllM * math.log(HllM.toDouble / v))

  /** Fold one hash into a register array (mutates and returns it). */
  def hllReduce(b: Array[Byte], h: Long): Array[Byte] = {
    val j = SketchOps.hllRegister(h)
    val r = math.min(SketchOps.hllRank(h), HllRankCap)
    if (r > b(j)) b(j) = r.toByte
    b
  }

  /** Elementwise-max merge of two register arrays (into the first). */
  def hllMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < HllM) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
    a
  }

  /** Registers → (v_zero, harmonic term, corrected estimate). */
  def hllFinish(r: Array[Byte]): HllSketch = {
    var harm = 0L
    var vZero = 0
    var j = 0
    while (j < HllM) {
      harm += 1L << (HllRankCap - r(j))
      if (r(j) == 0) vZero += 1
      j += 1
    }
    val raw = HllNumerator / harm
    val est =
      if (vZero > 0 && raw <= 2.5 * HllM) HllCorrection(vZero) else raw
    HllSketch(vZero, harm, est)
  }

  /** HyperLogLog over 60-bit hashes: buffer = 256 byte-wide registers,
    * reduce = elementwise max of ranks, merge = elementwise max. */
  class HllAgg extends Aggregator[Long, Array[Byte], HllSketch] {
    def zero: Array[Byte] = new Array[Byte](HllM)
    def reduce(b: Array[Byte], h: Long): Array[Byte] = hllReduce(b, h)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = hllMerge(a, b)
    def finish(r: Array[Byte]): HllSketch = hllFinish(r)
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[HllSketch] = ExpressionEncoder[HllSketch]()
  }

  /** Register-level variant for incremental pipelines: emits the raw
    * 256-byte register array so a stored sketch can fold new shards
    * with [[hllMerge]] and re-finish with [[hllFinish]] — the
    * streaming/ingest path (state = the sketch, 256 B, exact merge). */
  class HllRegAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](HllM)
    def reduce(b: Array[Byte], h: Long): Array[Byte] = hllReduce(b, h)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = hllMerge(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Fold STORED register arrays (one row per shard sketch) into one —
    * the aggregation a sketch-table compaction or a cross-shard
    * rollup runs: input is already sketches, not hashes. */
  class HllRegMergeAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](HllM)
    def reduce(b: Array[Byte], in: Array[Byte]): Array[Byte] = hllMerge(b, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = hllMerge(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build one register array over a hash column (256 B collect). */
  def hllBuild(hashes: DataFrame, hashCol: String): Array[Byte] = {
    val agg = udaf(new HllRegAgg, ExpressionEncoder[Long]())
    hashes.agg(agg(col(hashCol).cast("long")).as("regs"))
      .collect()(0).getAs[Array[Byte]]("regs")
  }

  /** The HLL aggregation as a Column, composable next to other
    * aggregates in one groupBy (single scan, single shuffle). Yields a
    * struct (v_zero, harm_x2p50, est). */
  def hll(hash: Column): Column = {
    val agg = udaf(new HllAgg, ExpressionEncoder[Long]())
    agg(hash.cast("long"))
  }

  /** Per-group distinct estimate of a pre-hashed column: one hash-
    * partitioned aggregation whose shuffled payload is a 256-byte
    * sketch per (group × map partition). Emits
    * (group, v_zero, harm_x2p50, est). */
  def hllDistinct(df: DataFrame, groupCol: String, hashCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll(col(hashCol)).as("__hll"))
      .select(col(groupCol), col("__hll.v_zero").as("v_zero"),
        col("__hll.harm_x2p50").as("harm_x2p50"), col("__hll.est").as("est"))

  // ------------------------------------------------ KMV (bottom-k)

  /** Hash domain size for the 60-bit portable hash (2^60, exactly
    * representable as a double). */
  val KmvDomain = 1152921504606846976.0

  /** k-minimum-values sketch: the k smallest DISTINCT hash values of a
    * set. Unlike HLL it supports set INTERSECTION estimates (Beyer et
    * al. 2007 / the theta-sketch family): bottomk(A ∪ B) =
    * bottomk(bottomk(A) ∪ bottomk(B)) — mergeable — and the fraction
    * of the merged bottom-k present in both sketches estimates
    * Jaccard. Entirely deterministic (no sampling randomness beyond
    * the hash itself), so the oracle mirrors it with ORDER BY + list
    * ops. */
  class BottomKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], h: Long): Seq[Long] =
      // fast path: full buffer and h can't displace anything
      if (b.size >= k && h >= b.last) b
      else if (b.contains(h)) b
      else ((b :+ h).sorted).take(k)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group bottom-k sketch table (group, hs sorted ascending). */
  def kmvSketches(df: DataFrame, groupCol: String, hashCol: String,
                  k: Int = 256): DataFrame = {
    val agg = udaf(new BottomKAgg(k), ExpressionEncoder[Long]())
    df.groupBy(col(groupCol)).agg(agg(col(hashCol).cast("long")).as("hs"))
  }

  /** Pairwise overlap estimates from a sketch table: for every group
    * pair (a < b), the merged bottom-k drives a union-size estimate
    * ((k-1)·D / h_k, or the exact union size when fewer than k values
    * exist) and a Jaccard estimate (shared fraction of the merged
    * bottom-k). Pure array expressions over a self-join of the
    * sketch TABLE — group-count², not data-sized, and each sketch is
    * ≤ 8·k bytes, so the join side broadcasts. */
  def kmvOverlap(sketches: DataFrame, k: Int = 256): DataFrame = {
    val a = sketches.select(col(sketches.columns.head).as("src_a"),
      col("hs").as("hs_a"))
    val b = sketches.select(col(sketches.columns.head).as("src_b"),
      col("hs").as("hs_b"))
    val u = array_sort(array_union(col("hs_a"), col("hs_b")))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("u", u)
      .withColumn("k2", least(lit(k), size(col("u"))))
      .withColumn("bk", slice(col("u"), 1, k))
      .withColumn("overlap", size(array_intersect(col("bk"),
        array_intersect(col("hs_a"), col("hs_b")))))
      .select(col("src_a"), col("src_b"), col("k2"),
        col("overlap").cast("long").as("n_shared_bk"),
        when(size(col("u")) < k, size(col("u")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * KmvDomain /
            element_at(col("u"), k).cast("double")).as("union_est"),
        (col("overlap").cast("double") / col("k2")).as("jaccard_est"))
  }

  // -------------------------------------------- histogram quantiles

  /** Log2 bins over non-negative longs: bin = bitlength(x+1)-1, so
    * bin b covers [2^b - 1, 2^(b+1) - 1). Bit-length (not log2) keeps
    * the bin assignment pure integer math the oracle mirrors with
    * `length(bin(x+1)) - 1`. 40 bins cover values up to 2^40. */
  val HistBins = 40

  case class HistQuantiles(total: Long, p50: Double, p90: Double, p99: Double)

  /** Mergeable log-histogram quantile sketch: buffer = 40 longs per
    * group, merge = elementwise sum — the fixed-size alternative to an
    * exact per-group sort at quantile time. Quantile q(p): nearest
    * rank r = ceil(p·total), linear interpolation inside the covering
    * bin; every operand is an exactly-representable integer, so the
    * one multiply/divide chain is IEEE-deterministic cross-engine. */
  class HistQuantAgg extends Aggregator[Long, Array[Long], HistQuantiles] {
    def zero: Array[Long] = new Array[Long](HistBins)
    def reduce(b: Array[Long], x: Long): Array[Long] = {
      val v = if (x < 0) 0L else x
      val bin = 63 - java.lang.Long.numberOfLeadingZeros(v + 1)
      b(math.min(bin, HistBins - 1)) += 1L
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < HistBins) { a(i) += b(i); i += 1 }
      a
    }
    def finish(c: Array[Long]): HistQuantiles = {
      val total = c.sum
      def q(p: Double): Double = {
        if (total == 0) return 0.0
        val r = math.ceil(p * total.toDouble).toLong
        var cum = 0L
        var b = 0
        while (b < HistBins) {
          if (cum + c(b) >= r) {
            val rb = r - cum
            val lo = (1L << b) - 1
            val width = 1L << b
            return lo.toDouble + width.toDouble * rb.toDouble / c(b).toDouble
          }
          cum += c(b)
          b += 1
        }
        (1L << HistBins).toDouble
      }
      HistQuantiles(total, q(0.5), q(0.9), q(0.99))
    }
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[HistQuantiles] = ExpressionEncoder[HistQuantiles]()
  }

  /** Per-group quantile summary of a long column: one hash-partitioned
    * aggregation shuffling 320 B per (group × partition). */
  def histQuantiles(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val agg = udaf(new HistQuantAgg, ExpressionEncoder[Long]())
    df.groupBy(col(groupCol))
      .agg(agg(col(valCol).cast("long")).as("__hq"))
      .select(col(groupCol), col("__hq.total").as("total"),
        col("__hq.p50").as("p50"), col("__hq.p90").as("p90"),
        col("__hq.p99").as("p99"))
  }

  // -------------------------------------------------------------- Bloom

  /** Bitset builder: buffer = mBits/8 bytes, merge = elementwise OR. */
  class BloomAgg(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new Array[Byte](mBits / 8)
    def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      SketchOps.bloomSet(b, h, mBits, k); b
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build the filter over a hash column and pull it to the driver —
    * a `mBits/8`-byte collect, bounded by CONSTRUCTION (the reason
    * this exists next to the exact-set path, whose broadcast grows
    * with the eval set and needs a `maxEvalHashes` guard). */
  def bloomBuild(hashes: DataFrame, hashCol: String,
                 mBits: Int = 1 << 16, k: Int = 4): Array[Byte] = {
    val agg = udaf(new BloomAgg(mBits, k), ExpressionEncoder[Long]())
    val rows = hashes.agg(agg(col(hashCol).cast("long")).as("bits"))
      .collect()
    rows(0).getAs[Array[Byte]]("bits")
  }

  /** Membership probe column over a pre-built filter. */
  def bloomProbe(hash: Column, bits: Array[Byte],
                 mBits: Int = 1 << 16, k: Int = 4): Column =
    Bridge.column(BloomHit(Bridge.expression(hash.cast("long")), bits, mBits, k))

  /** Bloom-screened decontamination: like
    * `Dedup.decontaminateFromPostings` but against a fixed-size filter
    * of the eval side. Emits one row per corpus doc:
    * (id, n_grams, n_hits, flagged). Never misses a real overlap;
    * overcounts with probability ≈ (1-e^(-kn/m))^k per clean gram. */
  def bloomDecontaminate(corpusPost: DataFrame, benchPost: DataFrame,
                         mBits: Int = 1 << 16, k: Int = 4): DataFrame = {
    val bits = bloomBuild(benchPost.select(col("h")).distinct(), "h", mBits, k)
    corpusPost
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(bloomProbe(col("h"), bits, mBits, k).cast("long")).as("n_hits"))
      .withColumn("flagged", col("n_hits") > 0L)
  }

  // ---------------------------------------------------------- Count-Min

  /** Counter-grid builder: buffer = depth×width longs, merge =
    * elementwise sum. */
  class CmsAgg(width: Int, depth: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](width * depth)
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      SketchOps.cmsAdd(b, h, width, depth); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build the counter grid over a hash column (with multiplicity) and
    * pull it to the driver — a `depth×width×8`-byte collect, bounded
    * by construction. */
  def cmsBuild(hashes: DataFrame, hashCol: String,
               width: Int = 2048, depth: Int = 4): Array[Long] = {
    val agg = udaf(new CmsAgg(width, depth), ExpressionEncoder[Long]())
    val rows = hashes.agg(agg(col(hashCol).cast("long")).as("counters"))
      .collect()
    rows(0).getAs[scala.collection.Seq[Long]]("counters").toArray
  }

  /** Frequency-estimate probe column over a pre-built grid. */
  def cmsProbe(hash: Column, counters: Array[Long],
               width: Int = 2048, depth: Int = 4): Column =
    Bridge.column(CmsEstimate(Bridge.expression(hash.cast("long")),
      counters, width, depth))

  /** Heavy hitters over a token stream: CMS estimate ≥ threshold,
    * reported next to the exact count so the one-sided error
    * (`est ≥ exact`, within `2N/width` w.h.p.) is visible in the
    * output. The candidate probe runs over the distinct-token table;
    * the sketch itself never grows with the vocabulary, which is what
    * lets the COUNTING pass survive a vocabulary that would blow up
    * an exact groupBy's shuffle. */
  def cmsHeavyHitters(tokens: DataFrame, tokenCol: String, hashCol: String,
                      threshold: Long, width: Int = 2048,
                      depth: Int = 4): DataFrame = {
    val counters = cmsBuild(tokens, hashCol, width, depth)
    tokens
      .groupBy(col(tokenCol), col(hashCol))
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("est", cmsProbe(col(hashCol), counters, width, depth))
      .filter(col("est") >= threshold)
      .select(col(tokenCol), col("est"), col("n_exact"))
  }
}
