package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. Everything is
 * hash-based — no RNG state, no seed-per-partition coupling — so a
 * sample is reproducible across runs, cluster sizes, and engines
 * (the portable hash is replicable in the DuckDB oracle), and a
 * document's membership can be audited after the fact.
 */
object Sampling {

  import TextAnalysis.hash32

  /** Salted per-row hash in [0, 2^32). */
  private def rowHash(idCol: Column, salt: String, portable: Boolean): Column =
    hash32(concat(lit(salt), idCol.cast("string")), portable)

  /**
   * Deterministic Bernoulli sample: keep rows whose salted id-hash
   * falls under `fraction` of the 32-bit space. Pure filter — no
   * shuffle, fully pushed into the scan stage, trivially parallel at
   * any scale.
   */
  def bernoulli(df: DataFrame, idCol: String, fraction: Double,
                salt: String = "s", portable: Boolean = false): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction")
    df.filter(rowHash(col(idCol), salt, portable) <
      (fraction * 4294967296.0).toLong)
  }

  /**
   * Domain mixing — re-weight a multi-source corpus toward target
   * proportions: source `s` keeps
   * `min(1, targets(s) * frac * N_total / N_s)` of its rows (sources
   * absent from `targets` drop entirely), membership decided by the
   * same salted deterministic hash as [[bernoulli]]. The per-source
   * rates come from one tiny aggregation (`|sources|` rows) that
   * joins back broadcast; the corpus itself only sees a pushdown-able
   * filter — no shuffle, no driver-side counts.
   */
  /** The per-source keep-rate table (source, __thresh) — computed
    * batch-side from corpus counts; tiny (|sources| rows). Split out
    * so the filter side ([[applyDomainMix]]) can also run on a
    * STREAM: rates come from the reference corpus, arrivals only see
    * a stream-static broadcast join + hash filter. */
  def domainMixRates(df: DataFrame, sourceCol: String,
                     targets: Map[String, Double],
                     frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac $frac")
    val weight = coalesce(
      element_at(typedlit(targets), col(sourceCol)), lit(0.0))
    val total = df.agg(count(lit(1)).as("n_total"))
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_src"))
      .crossJoin(broadcast(total))
      .select(col(sourceCol),
        floor(least(lit(1.0),
          weight * frac * col("n_total") / col("n_src")) * 4294967296.0)
          .cast("long").as("__thresh"))
  }

  /** Membership filter under a precomputed rate table — batch or
    * streaming (stream-static join; stateless, no watermark). */
  def applyDomainMix(docs: DataFrame, sourceCol: String, idCol: String,
                     rates: DataFrame, salt: String = "mix",
                     portable: Boolean = false): DataFrame =
    docs.join(broadcast(rates), Seq(sourceCol))
      .filter(rowHash(col(idCol), salt, portable) < col("__thresh"))
      .drop("__thresh")

  def domainMix(df: DataFrame, sourceCol: String, idCol: String,
                targets: Map[String, Double], frac: Double,
                salt: String = "mix", portable: Boolean = false): DataFrame =
    applyDomainMix(df, sourceCol, idCol,
      domainMixRates(df, sourceCol, targets, frac), salt, portable)

  /**
   * Temperature-smoothed mixture weights — the multilingual-corpus
   * sampling standard (mBERT/XLM-R/mT5 exponential smoothing): with
   * p_i a source's natural share, its target share is
   * q_i = p_i^α / Σ_j p_j^α. α = 1 keeps natural proportions, α → 0
   * approaches uniform, the usual α ∈ [0.2, 0.7] up-samples tail
   * languages/domains without flattening the head. Instead of a
   * hand-maintained [[domainMix]] targets map, the weights come from
   * the corpus itself: one |sources|-row count aggregation + two
   * 1-row broadcasts — the corpus is never reshuffled and no counts
   * reach the driver. IEEE-exact exponent paths (α ∈ {0, 0.5, 1} →
   * const/sqrt/identity) are special-cased so oracle contracts avoid
   * cross-engine pow() last-ulp drift; other α use pow().
   */
  def temperatureTargets(df: DataFrame, sourceCol: String,
                         alpha: Double): DataFrame = {
    require(alpha >= 0, s"alpha $alpha")
    def tpow(c: Column): Column = alpha match {
      case 0.0 => lit(1.0)
      case 0.5 => sqrt(c)
      case 1.0 => c
      case a => pow(c, a)
    }
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("__N"))
    val powed = counts.crossJoin(broadcast(total))
      .withColumn("__p", tpow(col("n_docs").cast("double") / col("__N")))
    val z = powed.agg(sum(col("__p")).as("__Z"))
    powed.crossJoin(broadcast(z))
      .select(col(sourceCol), col("n_docs"),
        (col("__p") / col("__Z")).as("weight"))
  }

  /** [[domainMixRates]] with the targets computed IN-PLAN by
    * [[temperatureTargets]] — per-source keep thresholds with no
    * driver-side map, streamable like any rates table. */
  def temperatureMixRates(df: DataFrame, sourceCol: String,
                          alpha: Double, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac $frac")
    val targets = temperatureTargets(df, sourceCol, alpha)
    // N from the |sources|-row targets frame — NOT a second corpus
    // scan (targets already paid the one groupBy-count pass)
    val total = targets.agg(sum(col("n_docs")).as("__n_total"))
    targets.crossJoin(broadcast(total))
      .select(col(sourceCol),
        floor(least(lit(1.0),
          col("weight") * frac * col("__n_total") / col("n_docs"))
          * 4294967296.0).cast("long").as("__thresh"))
  }

  /** Temperature-α mixture sample at a `frac` global budget: the
    * [[domainMix]] membership filter under [[temperatureMixRates]].
    * Same deterministic salted-hash membership — batch == streaming
    * (rates are stream-static), re-run-stable. */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     alpha: Double, frac: Double,
                     salt: String = "mix",
                     portable: Boolean = false): DataFrame =
    applyDomainMix(df, sourceCol, idCol,
      temperatureMixRates(df, sourceCol, alpha, frac), salt, portable)

  /** Bounded top-n buffer: keeps the n smallest (hash, id) pairs.
    * The buffer never exceeds n entries, so map-side partial
    * aggregation ships at most n pairs per stratum per partition —
    * unlike a window over the stratum (single-task sort of the whole
    * stratum) or collect_list (unbounded buffer). */
  class TopNAgg(n: Int)
      extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    def zero: Seq[(Long, Long)] = Seq.empty
    private def cap(s: Seq[(Long, Long)]) = s.sorted.take(n)
    def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      cap(b :+ a)
    def merge(b1: Seq[(Long, Long)], b2: Seq[(Long, Long)]): Seq[(Long, Long)] =
      cap(b1 ++ b2)
    def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r.sorted
    def bufferEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
    def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
  }

  /**
   * Deterministic stratified sample: the n rows with the smallest
   * salted hash per stratum (ties broken by id). One hash-partitioned
   * aggregation with a bounded buffer — no per-stratum global sort, so
   * a stratum with billions of rows costs the same shuffle as a small
   * one.
   */
  def stratifiedTopN(df: DataFrame, strataCol: String, idCol: String, n: Int,
                     salt: String = "s", portable: Boolean = false): DataFrame = {
    val topN = udaf(new TopNAgg(n),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    df.select(col(strataCol).as("stratum"),
        rowHash(col(idCol), salt, portable).as("__h"),
        col(idCol).cast("long").as("__id"))
      .groupBy("stratum")
      .agg(topN(col("__h"), col("__id")).as("picks"))
      .select(col("stratum"), explode(col("picks")).as("p"))
      .select(col("stratum"), col("p._2").as("id"))
  }

  /**
   * Deterministic train/val/test split: each row lands in the first
   * split whose cumulative fraction its salted id-hash falls under.
   * Pure per-row expression — no shuffle, no state, reproducible
   * across runs/engines/cluster sizes, and a row's assignment is
   * auditable from its id alone. `fractions` must sum to <= 1; rows
   * past the last cumulative threshold get the LAST split (so
   * fractions summing to 1 cover the id space exactly).
   */
  def splitAssign(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = "split",
                  portable: Boolean = false): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions must be non-empty and sum to <= 1: $fractions")
    val h = rowHash(col(idCol), salt, portable)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(f => (f * 4294967296.0).toLong)
    val assign = fractions.zip(cuts).init
      .foldRight(lit(fractions.last._1): Column) {
        case (((name, _), cut), elze) => when(h < cut, lit(name)).otherwise(elze)
      }
    df.withColumn("split", assign)
  }

  /**
   * Token-budget selection: keep the PREFIX of the corpus, in salted-
   * hash-then-id order, whose cumulative token count stays within
   * `budget` — "give me B tokens, deterministically, spread across the
   * corpus". Returns (id, n_tok, cum) with cum = the inclusive global
   * running total.
   *
   * A naive formulation is one global ORDER BY + running sum — a
   * single-task sort at 100 TB. This one never orders globally: rows
   * band by their hash's top `bandBits` bits (band order == hash
   * order), per-band totals aggregate to `2^bandBits` rows on the
   * driver, whole bands past the budget boundary prune out BEFORE the
   * per-row work, and the in-band running sum is a window PARTITIONED
   * by band (the same salted-cumsum shape as sequence packing). Band
   * populations are hash-uniform, so no skew hot-spot; widen bandBits
   * as the corpus grows.
   */
  def tokenBudget(df: DataFrame, idCol: String, tokCol: String,
                  budget: Long, bandBits: Int = 8,
                  salt: String = "tb", portable: Boolean = false): DataFrame = {
    require(bandBits >= 1 && bandBits <= 24, s"bandBits $bandBits")
    // persisted: read twice (driver-side band totals + the banded
    // window pass) and an uncached replay re-pays the md5 hash and
    // whatever the caller computed upstream (t21: tokenCount over
    // text) for every row; only (id, n_tok, h, band) persists
    val Seq(base) = graft.util.Caching.persistOwned("Sampling.tokenBudget",
      df.select(col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("n_tok"),
        rowHash(col(idCol), salt, portable).as("__h"))
        .withColumn("__band",
          shiftright(col("__h"), 32 - bandBits).cast("int")))
    // 2^bandBits rows — legitimately driver-sized at any corpus scale
    val totals = base.groupBy("__band")
      .agg(sum(col("n_tok")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bands = totals.keys.toSeq.sorted
    val offsets: Map[Int, Long] = bands.zip(
      bands.scanLeft(0L)((acc, b) => acc + totals(b)).init).toMap
    val off = element_at(typedlit(offsets), col("__band"))
    base
      // whole-band prune: bands whose exclusive prefix already
      // exceeds the budget never reach the window
      .filter(off <= budget)
      .withColumn("cum", off + sum(col("n_tok")).over(
        Window.partitionBy(col("__band"))
          .orderBy(col("__h"), col("id"))))
      .filter(col("cum") <= budget)
      .select(col("id"), col("n_tok"), col("cum"))
  }

  /**
   * Epoch shuffle order: a deterministic global pseudo-random
   * permutation rank (0-based, dense) for training-order shuffling —
   * change the salt (e.g. "epoch3") and the corpus reshuffles into a
   * fresh, reproducible order. Same no-global-sort construction as
   * [[tokenBudget]]: rows band by the hash's top bits (band order ==
   * hash order), per-band COUNTS aggregate to the driver, and the
   * in-band rank is a band-partitioned row_number — global position =
   * band offset + in-band rank. Hash-uniform bands, no skew; widen
   * bandBits with the corpus.
   */
  def shuffleOrder(df: DataFrame, idCol: String, bandBits: Int = 8,
                   salt: String = "epoch", portable: Boolean = false): DataFrame = {
    require(bandBits >= 1 && bandBits <= 24, s"bandBits $bandBits")
    val Seq(base) = graft.util.Caching.persistOwned("Sampling.shuffleOrder",
      df.select(col(idCol).cast("long").as("id"),
        rowHash(col(idCol), salt, portable).as("__h"))
        .withColumn("__band",
          shiftright(col("__h"), 32 - bandBits).cast("int")))
    val counts = base.groupBy("__band").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bands = counts.keys.toSeq.sorted
    val offsets: Map[Int, Long] = bands.zip(
      bands.scanLeft(0L)((acc, b) => acc + counts(b)).init).toMap
    base.withColumn("pos",
        element_at(typedlit(offsets), col("__band")) - 1 +
          row_number().over(Window.partitionBy(col("__band"))
            .orderBy(col("__h"), col("id"))))
      .select(col("id"), col("pos"))
  }

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): each document scores
   * `Σ_tokens ln(p_target(bucket)/p_raw(bucket))` over hashed-unigram
   * feature buckets, where both distributions are add-α-smoothed bag
   * models fit on the corpus itself — target = rows matching
   * `isTarget`, raw = everything. High weight = "looks like the
   * target domain relative to the raw pool".
   *
   * Plan shape at 100 TB: one token explode, one BUCKETS-sized count
   * aggregation (the only shuffle whose key isn't high-cardinality —
   * and it is bounded by the constant `buckets`, with map-side
   * combine doing all the work), the tiny log-ratio table broadcast
   * back onto the token stream, and one per-doc aggregation. The
   * corpus is never joined row-to-row and no distribution fit touches
   * the driver.
   */
  /** The frozen per-bucket log-ratio table (`__b`, `__lr`) the DSIR
    * scorer consumes — `buckets` rows from one bounded count
    * aggregation over the fit corpus. Split out so the scoring side
    * ([[streamScoreDsir]]) can also run on a STREAM under the same
    * frozen-state discipline as the unigram table and PQ codebooks:
    * fit offline, score arrivals, refit on drift. */
  def dsirRatioTable(df: DataFrame, textCol: String, isTarget: Column,
                     buckets: Int = 256, alpha: Double = 1.0,
                     portable: Boolean = false): DataFrame = {
    require(buckets > 0 && alpha > 0, s"buckets $buckets alpha $alpha")
    val toks = df.select(isTarget.as("__t"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("__b", hash32(col("tok"), portable) % buckets)
    val counts = toks.groupBy("__b").agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
      count(lit(1)).as("__rc"))
    val totals = counts.agg(sum("__tc").as("__tt"), sum("__rc").as("__rt"))
    counts.crossJoin(broadcast(totals))
      .select(col("__b"),
        (log(col("__tc") + alpha) - log(col("__tt") + alpha * buckets) -
          log(col("__rc") + alpha) + log(col("__rt") + alpha * buckets))
          .as("__lr"))
  }

  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
                  isTarget: Column, buckets: Int = 256,
                  alpha: Double = 1.0,
                  portable: Boolean = false): DataFrame = {
    val ratio = dsirRatioTable(df, textCol, isTarget, buckets, alpha,
      portable)
    df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("__b", hash32(col("tok"), portable) % buckets)
      .join(broadcast(ratio), Seq("__b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"), sum(col("__lr")).as("log_w"))
  }

  /**
   * Streaming DSIR scoring at the ingest edge: arrivals score under a
   * FROZEN ratio table ([[dsirRatioTable]], fit on the landed corpus)
   * — token join is stream-static against `buckets` broadcast rows
   * (stateless); only the per-document sum is stateful, grouped on
   * (id, event-time window) so the watermark bounds state exactly
   * like the streaming unigram scorer. Inner join is lossless here —
   * every bucket the fit corpus saw has a row, and an arrival token
   * hashing to an unseen bucket has no evidence either way (it
   * contributes nothing, matching a batch re-fit's smoothed
   * near-zero ratio in expectation).
   */
  def streamScoreDsir(docs: DataFrame, textCol: String, idCol: String,
                      tsCol: String, ratio: DataFrame,
                      buckets: Int = 256,
                      horizon: String = "10 minutes",
                      lateness: String = "10 minutes",
                      portable: Boolean = false): DataFrame =
    docs.withWatermark(tsCol, lateness)
      .select(col(idCol).as("id"), col(tsCol),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("__b", hash32(col("tok"), portable) % buckets)
      .join(broadcast(ratio), Seq("__b"))
      .groupBy(col("id"), window(col(tsCol), horizon))
      .agg(count(lit(1)).as("n_tok"), sum(col("__lr")).as("log_w"))
      .drop("window")

  /**
   * DSIR selection: draw `n` documents WITHOUT replacement with
   * probability proportional to `exp(log_w)` via the Gumbel top-k
   * trick — `key = log_w + Gumbel(0,1)`, top n keys — with the
   * uniform draw derived from the salted deterministic hash, so the
   * sample is reproducible, auditable per document, and replicable in
   * the oracle. The reduction is `orderBy(key).limit(n)`
   * (TakeOrderedAndProject: per-partition top-n, driver merge), never
   * a global sort.
   */
  def dsirSample(df: DataFrame, textCol: String, idCol: String,
                 isTarget: Column, n: Int, buckets: Int = 256,
                 alpha: Double = 1.0, salt: String = "dsir",
                 portable: Boolean = false): DataFrame = {
    val u = (rowHash(col("id"), salt, portable).cast("double") + 0.5d) /
      4294967296.0d
    dsirWeights(df, textCol, idCol, isTarget, buckets, alpha, portable)
      // round-before-rank (the kmeans/ADC 1e-6 discipline): the key
      // mixes a run-order-dependent partial-aggregated sum with
      // libm-dependent ln(), so ranking raw doubles would make the
      // selected SET engine- and run-sensitive at the cut boundary
      .withColumn("__key",
        floor((col("log_w") - log(-log(u))) * 1e6 + 0.5) / 1e6)
      .orderBy(col("__key").desc, col("id"))
      .limit(n)
      .select(col("id"), col("n_tok"), col("log_w"))
  }

  /** Window-function formulation of the same stratified sample —
    * simpler plan for small strata; kept as the semantic reference
    * (identical output to stratifiedTopN by construction). */
  def stratifiedTopNWindow(df: DataFrame, strataCol: String, idCol: String,
                           n: Int, salt: String = "s",
                           portable: Boolean = false): DataFrame =
    df.select(col(strataCol).as("stratum"), col(idCol).cast("long").as("id"),
        rowHash(col(idCol), salt, portable).as("__h"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("__h"), col("id"))))
      .filter(col("__rn") <= n)
      .select("stratum", "id")
}
