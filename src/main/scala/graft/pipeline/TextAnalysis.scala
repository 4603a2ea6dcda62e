package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, token counting, quality scoring, language ID, and
 * document fingerprinting. All pure column expressions (whole-stage
 * codegen, no UDFs) so they scan-scale linearly — no shuffles at all
 * until an aggregation is requested.
 *
 * Hashing convention (shared with Dedup/Similarity and the DuckDB
 * oracles): h32(s) = first 15 hex digits of md5(s) parsed as a long,
 * mod 2^32 — portable across engines, no dependence on engine-native
 * hash functions.
 */
/** Streaming sequence-packing row shapes (case classes at package
  * level for stable Dataset encoders). */
case class PackIn(id: Long, nTok: Int, bucket: Int)
case class PackOut(id: Long, bucket: Int, pack: Long, packOff: Int,
                   nTok: Int)

object TextAnalysis {

  /** 32-bit portable string hash (see object doc). Computed by the
    * native Md5Prefix60 expression — digest bytes folded directly,
    * no hex-string round-trip (graft.functions.Md5Prefix60). */
  def h32(c: Column): Column =
    graft.functions.Md5Prefix60(c) % 4294967296L

  /** 32-bit engine-native hash: xxhash64 masked to 32 bits — markedly
    * cheaper than the md5-based portable hash (no digest, no hex
    * round-trip) but not replicable in the DuckDB oracle. Production
    * default for dedup; oracle-checked queries pin `portable = true`. */
  def h32Fast(c: Column): Column =
    xxhash64(c).bitwiseAND(lit(4294967295L))

  /** Hash selector shared by the dedup family. */
  def hash32(c: Column, portable: Boolean): Column =
    if (portable) h32(c) else h32Fast(c)

  /** 60-bit portable hash: first 15 hex digits of md5 (no modulo) —
    * the wider variant for signature schemes (SimHash) where 32 bits
    * leave band keys too narrow to block effectively at scale. */
  def h60(c: Column): Column =
    graft.functions.Md5Prefix60(c)

  /** 60-bit engine-native hash: top 60 bits of xxhash64. */
  def h60Fast(c: Column): Column =
    shiftrightunsigned(xxhash64(c), 4)

  /** 60-bit hash selector. */
  def hash60(c: Column, portable: Boolean): Column =
    if (portable) h60(c) else h60Fast(c)

  /** Lowercased alnum tokens; empty strings removed. */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** Relational let-binding: evaluate `v` ONCE per row and hand it to
    * `body` as a bound lambda variable. Higher-order-function lambdas
    * are interpreted (no codegen, no subexpression elimination), so an
    * expression referenced INSIDE a lambda re-evaluates at every
    * element — e.g. a shingle window that reads `tokens(text)` inline
    * re-splits the whole text once per shingle, turning a linear
    * per-row scan O(tokens * text_len)-quadratic on long documents
    * (measured: a 20k-token document took minutes; bound, it takes
    * milliseconds). `transform` over a 1-element array is the
    * cheapest let Spark's expression language offers; operators that
    * span several exprs materialize a real column instead (the `__tk`
    * pattern in Dedup.winnowFingerprints / dupSpans). */
  private[pipeline] def bindOnce(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Whitespace-ish token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word n-gram shingles (space-joined); documents shorter
    * than n tokens collapse to one whole-text shingle. The shingle
    * space is |vocab|^n, which keeps postings joins discriminative even
    * over small vocabularies. */
  def shingles(text: Column, n: Int = 3): Column =
    // tokens bound once per row (bindOnce doc): inlined, the split
    // re-ran inside every window's element_at
    bindOnce(tokens(text)) { tk =>
      when(size(tk) >= n,
        array_distinct(transform(sequence(lit(0), size(tk) - n), i =>
          concat_ws(" ", (1 to n).map(o => element_at(tk, i + o)): _*))))
        .otherwise(array(array_join(tk, " ")))
    }

  /** BPE-ish subword count: alnum runs + punctuation marks each count
    * (a cheap proxy for byte-pair tokenizers: words + symbols). */
  def bpeishCount(text: Column): Column =
    size(array_remove(split(text, "\\s+"), "")) +
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))

  /** Count of non-alnum, non-space characters. */
  def punctChars(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))

  private val STOPWORDS = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "are", "was", "for", "on", "with", "as", "by", "at", "it")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = array(STOPWORDS.map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(stops, t)))
        .cast("double") / size(toks))
  }

  /**
   * Heuristic quality score in [0,1]: rewards mid-length documents,
   * some stopword presence (English prose), low punctuation density,
   * and mid-length tokens. Deterministic formula, replicated in the
   * oracle.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctScore = greatest(lit(0.0),
      lit(1.0) - punctChars(text).cast("double") / greatest(length(text), lit(1)).cast("double") * 10.0)
    val avgTokLen = when(nTok === 0, 0.0)
      .otherwise(aggregate(tokens(text), lit(0), (acc, t) => acc + length(t)).cast("double") / nTok)
    val tokLenScore = when(avgTokLen >= 3 && avgTokLen <= 8, 1.0).otherwise(0.5)
    (lenScore + stopScore + punctScore + tokLenScore) / 4.0
  }

  /** Gopher's rule-filter stopword set (Rae et al. 2021,
    * arXiv:2112.11446, Appendix A1.1) — distinct from [[STOPWORDS]],
    * which feeds the stopword-RATIO quality signal. */
  val GOPHER_STOPWORDS: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher quality-rule battery (Rae et al. 2021, arXiv:2112.11446,
   * Appendix A1.1): the deterministic per-document filter rules a
   * production web-corpus pipeline applies before any model-based
   * scoring. Each rule is a named boolean column; `gopherPass` is
   * their conjunction. All pure codegen'd column expressions — zero
   * shuffles, scan-parallel at any corpus size, and the filter pushes
   * into the parquet scan when used as a predicate.
   *
   * Rules: word count in [minWords, maxWords]; mean word length in
   * [3, 10]; symbol-to-word ratio (# or ...) <= 0.1; >= 80% of words
   * contain an alphabetic char; >= 2 Gopher stopwords; <= 90% of
   * lines bullet-started; <= 30% of lines ellipsis-ended.
   */
  def gopherFlags(text: Column, minWords: Int = 50,
                  maxWords: Int = 100000): Seq[(String, Column)] = {
    val words = array_remove(split(text, "\\s+"), "")
    val n = size(words).cast("double")
    val meanLen = when(n === 0, 0.0).otherwise(
      aggregate(words, lit(0), (a, w) => a + length(w)).cast("double") / n)
    val symbols = (length(text) - length(regexp_replace(text, "#", ""))) +
      size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))
    val alphaFrac = when(n === 0, 0.0).otherwise(
      size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") / n)
    val stops = array(GOPHER_STOPWORDS.map(lit): _*)
    val nStops = size(filter(words, w => array_contains(stops, lower(w))))
    val lines = split(text, "\n")
    val nl = size(lines).cast("double")
    val bulletFrac = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* "))).cast("double") / nl
    val ellipsisFrac =
      size(filter(lines, l => l.endsWith("..."))).cast("double") / nl
    Seq(
      "ok_words" -> (size(words) >= minWords && size(words) <= maxWords),
      "ok_mean_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "ok_symbol_ratio" ->
        (when(n === 0, lit(false))
          .otherwise(symbols.cast("double") / n <= 0.1)),
      "ok_alpha_words" -> (alphaFrac >= 0.8),
      "ok_stopwords" -> (nStops >= 2),
      "ok_bullets" -> (bulletFrac <= 0.9),
      "ok_ellipsis" -> (ellipsisFrac <= 0.3))
  }

  /** Conjunction of every [[gopherFlags]] rule. */
  def gopherPass(text: Column, minWords: Int = 50,
                 maxWords: Int = 100000): Column =
    gopherFlags(text, minWords, maxWords).map(_._2).reduce(_ && _)

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. */
  val LANG_MARKERS: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "de"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Distinct-token overlap with each language's marker list. */
  def langHits(text: Column): Seq[(String, Column)] = {
    val toks = array_distinct(tokens(text))
    LANG_MARKERS.map { case (lang, markers) =>
      lang -> size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))
    }
  }

  /** Predicted language: argmax of marker hits, first-wins tie-break in
    * LANG_MARKERS order (alphabetical). */
  def langId(text: Column): Column = {
    val hits = langHits(text)
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((lang, h), elze) =>
      when(h === best && h > 0, lit(lang)).otherwise(elze)
    }
  }

  /** Document fingerprint: min h32 over k-char shingles (winnowing-
    * style rolling signature) plus the distinct-shingle count. The
    * window array comes from ONE native forward pass
    * (graft.functions.CharWindows) — the substr-per-position form
    * re-scanned the UTF-8 bytes from the string start for every
    * window, O(chars²) on long documents. */
  def fingerprint(text: Column, k: Int = 8): (Column, Column) = {
    val sh = graft.functions.CharWindows(text, k)
    (array_min(transform(sh, s => h32(s))), size(array_distinct(sh)))
  }

  /** PII patterns `(name, regex, replacement)` in scrub order. The
    * regexes stay inside RE2's feature set (no lookaround, ASCII `\b`)
    * so the DuckDB oracle can run them verbatim; Java's engine treats
    * them identically. Emails scrub first — an address can contain
    * digit runs that the phone pattern would otherwise split. */
  val PII_PATTERNS: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ip", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}-[0-9]{4}\\b", "<PHONE>"))

  /** Per-pattern match counts over the ORIGINAL text (audit columns —
    * a redaction pipeline reports what it removed). Pure codegen'd
    * column expressions, zero shuffles. */
  def piiCounts(text: Column): Seq[(String, Column)] =
    PII_PATTERNS.map { case (name, re, _) =>
      name -> size(regexp_extract_all(text, lit(re), lit(0))).cast("long")
    }

  /** Redacted text: each PII pattern replaced by its placeholder, in
    * PII_PATTERNS order (Spark's regexp_replace is replace-all). */
  def scrubPii(text: Column): Column =
    PII_PATTERNS.foldLeft(text) { case (t, (_, re, repl)) =>
      regexp_replace(t, re, repl)
    }

  /**
   * Fixed-size token chunking with overlap — the training-data
   * chunker: windows of `width` tokens starting every
   * `width - overlap` tokens, last chunk ragged. Returns
   * `array<struct<start, n_tok, chunk>>`; pair with `posexplode` to
   * get one row per chunk. Per-row column expressions only, so
   * chunking a 100 TB corpus is a single scan-shaped pass with no
   * shuffle — parallelism stays whatever the scan had.
   */
  def chunks(text: Column, width: Int, overlap: Int): Column = {
    require(width > overlap && overlap >= 0, s"width $width overlap $overlap")
    val stride = width - overlap
    // tokens bound once per row (bindOnce doc): inlined, the split
    // re-ran inside every chunk's slice
    bindOnce(tokens(text)) { tk =>
      val n = size(tk)
      // CaseWhen evaluates only the branch taken, so the empty-doc row
      // never reaches sequence() (whose bounds would be inverted there)
      when(n === 0,
          array().cast("array<struct<start:int,n_tok:int,chunk:string>>"))
        .otherwise(transform(sequence(lit(0), n - 1, lit(stride)), s =>
          struct(s.cast("int").as("start"),
            least(lit(width), n - s).cast("int").as("n_tok"),
            array_join(slice(tk, s + 1, lit(width)), " ").as("chunk"))))
    }
  }

  /**
   * Corpus-trained unigram log-probability per document — the
   * relational analog of LM-perplexity quality filtering: a document
   * scores the average ln(tf/T) of its token occurrences under the
   * corpus's own unigram distribution (low = unusually rare
   * vocabulary, high = boilerplate). Plan: one token explode, one
   * vocabulary-sized frequency shuffle, a co-partitioned join back on
   * the token, one per-doc aggregation; the corpus total rides a
   * broadcast single-row aggregate, never a driver-side count.
   */
  def unigramLogProb(df: DataFrame, textCol: String,
                     idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = freq.agg(sum(col("tf")).as("T"))
    toks.join(freq, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("id").agg(count(lit(1)).as("n_tok"),
        avg(log(col("tf").cast("double")) - log(col("T").cast("double")))
          .as("logprob"))
  }

  /**
   * Streaming LM-quality scoring at the ingest edge: arriving
   * documents score under a FROZEN unigram frequency table — the
   * streaming complement of [[unigramLogProb]], whose corpus-global
   * counts cannot be computed on an unbounded stream. Production
   * pipelines score arrivals under the last trained table and retrain
   * offline (the same frozen-state discipline as
   * [[graft.pipeline.Similarity.appendToPqIndex]]). The token join is
   * stream-static (stateless); only the per-document average is
   * stateful, grouped on (id, event-time window) so the watermark
   * bounds state exactly like the rollup path. Inner join ⇒ tokens
   * absent from the table contribute nothing — identical to the batch
   * scorer when the table came from the same corpus.
   */
  def streamScoreUnigram(docs: DataFrame, textCol: String, idCol: String,
                         tsCol: String, freq: DataFrame,
                         horizon: String = "10 minutes",
                         lateness: String = "10 minutes"): DataFrame = {
    val total = freq.agg(sum(col("tf")).as("T"))
    docs.withWatermark(tsCol, lateness)
      .select(col(idCol).as("id"), col(tsCol),
        explode(tokens(col(textCol))).as("tok"))
      .join(freq, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("id"), window(col(tsCol), horizon))
      .agg(count(lit(1)).as("n_tok"),
        avg(log(col("tf").cast("double")) - log(col("T").cast("double")))
          .as("logprob"))
      .drop("window")
  }

  /** The frozen table [[streamScoreUnigram]] consumes: (tok, tf) from
    * a landed corpus — one vocabulary-keyed aggregation. */
  def unigramTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))

  /**
   * Corpus-trained BIGRAM conditional log-probability per document
   * with add-alpha smoothing — one rung up the LM-quality ladder from
   * [[unigramLogProb]] (KenLM-style pipeline filters score n-gram
   * perplexity, not unigram): a document scores the average
   * `ln((c(w1,w2) + α) / (c(w1·) + α·V))` over its bigram positions,
   * where the counts are corpus-wide, `c(w1·) = Σ_w2 c(w1,w2)` is the
   * proper conditional denominator and V the distinct-next-word
   * vocabulary. Plan shape: one bigram explode, one bigram-keyed
   * count shuffle, a w1-keyed rollup of it (vocabulary-sized, NOT
   * corpus-sized), co-partitioned joins back, one per-doc agg; V
   * rides a broadcast single-row aggregate. Documents with fewer than
   * two tokens emit no row (no bigram evidence).
   */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String,
                    alpha: Double = 1.0): DataFrame = {
    val tk = df.select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
    val bi = tk.filter(size(col("tk")) >= 2)
      .select(col("id"), explode(
        transform(sequence(lit(0), size(col("tk")) - 2), i =>
          struct(element_at(col("tk"), i + 1).as("w1"),
            element_at(col("tk"), i + 2).as("w2")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cBi = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val cW1 = cBi.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = bi.agg(count_distinct(col("w2")).as("V"))
    bi.join(cBi, Seq("w1", "w2")).join(cW1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("id").agg(count(lit(1)).as("n_bigram"),
        avg(log((col("c2") + alpha) /
          (col("c1") + lit(alpha) * col("V")))).as("logprob"))
  }

  /**
   * Reliability (calibration) report for a probabilistic classifier —
   * the table behind a reliability diagram and expected-calibration-
   * error: scores fall into `bins` equal-width probability bins and
   * each bin reports its population, mean predicted score and
   * empirical positive rate. A quality-classifier pipeline checks
   * this before thresholding on scores (a mis-calibrated score makes
   * any "keep if p > 0.8" rule mean something else). One aggregation
   * keyed by bin id — a single corpus pass with map-side combine,
   * `bins` rows out; stateless, so it runs on a stream per window.
   * Scores at a bin's upper edge belong to the lower bin except 1.0,
   * which folds into the top bin.
   */
  def calibrationBins(scored: DataFrame, scoreCol: String,
                      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins $bins")
    scored.groupBy(least(floor(col(scoreCol) * bins).cast("int"),
        lit(bins - 1)).as("bin"))
      .agg(count(lit(1)).as("n"),
        avg(col(scoreCol)).as("mean_score"),
        avg(col(labelCol).cast("double")).as("frac_pos"))
  }

  /**
   * Per-language discrete score thresholds for CCNet-style perplexity
   * bucketing (CCNet splits each language's corpus into head/middle/
   * tail thirds by KenLM perplexity and trains preferentially on the
   * head). Thresholds are DISCRETE percentiles — the value at
   * ascending rank ceil(f·n), an actual data value with no
   * interpolation, so any engine mirrors them bit-exactly. Score
   * convention: HIGHER = more fluent (a logprob; perplexity is
   * exp(-logprob)), so the f=1/3 threshold bounds the TAIL.
   *
   * Fit this on a per-language SAMPLE at scale — CCNet fits its
   * thresholds offline on a sample too. The collect inside is
   * per-language data-sized (the price of exact discrete percentiles
   * without a global sort); assignment over the full corpus is
   * [[assignPplBuckets]]'s zero-shuffle broadcast comparison.
   */
  def pplThresholds(scored: DataFrame, langCol: String, scoreCol: String,
                    fracs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3))
      : DataFrame = {
    require(fracs.nonEmpty && fracs == fracs.sorted, s"bad fracs $fracs")
    scored.groupBy(col(langCol))
      .agg(count(lit(1)).as("__n"),
        sort_array(collect_list(col(scoreCol))).as("__arr"))
      .select(col(langCol) +: fracs.zipWithIndex.map { case (f, i) =>
        element_at(col("__arr"),
          ceil(lit(f) * col("__n")).cast("int")).as(s"t$i")
      }: _*)
  }

  /**
   * CCNet head/middle/tail assignment: each document's score compares
   * against its language's fitted thresholds ([[pplThresholds]] t0/t1
   * shape) — tail = score ≤ t0 (least fluent third), middle ≤ t1,
   * head above (most fluent = lowest perplexity). One broadcast join
   * on the language key, then a pure comparison projection: zero
   * shuffles over the corpus, stream-ready (frozen thresholds — the
   * same discipline as the other frozen-table streaming screens). A
   * language absent from the threshold table yields a null bucket.
   */
  def assignPplBuckets(df: DataFrame, langCol: String, scoreCol: String,
                       thresholds: DataFrame): DataFrame =
    df.join(broadcast(thresholds), Seq(langCol), "left")
      .withColumn("ppl_bucket",
        when(col("t0").isNull, lit(null).cast("string"))
          .when(col(scoreCol) <= col("t0"), "tail")
          .when(col(scoreCol) <= col("t1"), "middle")
          .otherwise("head"))
      .drop("t0", "t1")

  /**
   * Sequence packing — the pretraining batch-assembly op: documents
   * are concatenated (in id order) and cut into fixed `budget`-token
   * training sequences; each document is assigned the pack its first
   * token lands in plus its offset inside that pack. Packing is
   * inherently sequential, so the corpus is first salted into
   * `nBuckets` independent packing streams (pack identity =
   * (bucket, pack)) — per-bucket cumulative sums are windows over a
   * key whose group size shrinks as nBuckets grows with the cluster,
   * never a single global ordering.
   */
  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    budget: Int, nBuckets: Int = 8,
                    portable: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && nBuckets > 0, s"budget $budget buckets $nBuckets")
    val bucket = pmod(hash32(
      concat(lit("pack"), col(idCol).cast("string")), portable),
      lit(nBuckets)).cast("int")
    val cum = sum(col("n_tok")).over(
      Window.partitionBy("bucket").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.select(col(idCol).as("id"), tokenCount(col(textCol)).as("n_tok"),
        bucket.as("bucket"))
      .withColumn("cum", cum)
      .select(col("id"), col("bucket"), col("n_tok"),
        ((col("cum") - col("n_tok")) / budget).cast("long").as("pack"),
        ((col("cum") - col("n_tok")) % budget).cast("int").as("pack_off"))
  }

  /**
   * Streaming sequence packing — the stateful continuation of
   * [[packSequences]]: each bucket's packing cursor (cumulative token
   * count) lives in `flatMapGroupsWithState`, so sequences keep
   * filling across micro-batches exactly where the previous batch
   * left off. State is ONE long per bucket — bounded by nBuckets,
   * never by stream length. Arrivals are packed in id order within a
   * batch; feed an id-ordered source for batch-identical output.
   */
  def streamPackSequences(docs: DataFrame, textCol: String, idCol: String,
                          budget: Int, nBuckets: Int = 8,
                          portable: Boolean = false)
      : org.apache.spark.sql.Dataset[PackOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(budget > 0 && nBuckets > 0, s"budget $budget buckets $nBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        tokenCount(col(textCol)).as("nTok"),
        pmod(hash32(concat(lit("pack"), col(idCol).cast("string")),
          portable), lit(nBuckets)).cast("int").as("bucket"))
      .as[PackIn]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (bucket: Int, it: Iterator[PackIn], state: GroupState[Long]) => {
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.id).map { p =>
            val o = PackOut(p.id, bucket, cum / budget,
              (cum % budget).toInt, p.nTok)
            cum += p.nTok
            o
          }
          state.update(cum)
          out.iterator
        })
  }

  /**
   * BPE merge candidates — the first iteration of byte-pair-encoding
   * tokenizer training: adjacent character pairs, weighted by corpus
   * word frequency, ranked by count. The 100 TB shape: the corpus
   * collapses to its word-frequency table FIRST (one shuffle on the
   * word — vocabulary-sized, orders of magnitude smaller than the
   * corpus), pairs explode off that small table, and the final top-k
   * is a TakeOrderedAndProject. Subsequent BPE iterations would merge
   * the winning pair into the symbol sequences and repeat — each
   * round the same two bounded shuffles.
   */
  def bpeMergeCandidates(df: DataFrame, textCol: String,
                         k: Int): DataFrame = {
    val words = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    words.filter(length(col("w")) >= 2)
      .select(col("freq"), explode(
        transform(sequence(lit(0), length(col("w")) - 2),
          i => col("w").substr(i + 1, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
  }

  /**
   * Greedy BPE encode of one word under an ordered merge list
   * (Sennrich et al. 2016, arXiv:1508.07909 — the APPLY side of
   * [[bpeMergeCandidates]]' training counts): the word splits to
   * characters and each merge rule, in priority order, fuses ALL its
   * adjacent occurrences left-to-right — including chains
   * (`a b a b` → `ab ab`), which is why this is a real loop and not
   * a replace expression.
   */
  def bpeEncodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.result()
    }
    syms
  }

  /**
   * BPE segmentation of a document column: every [[tokens]]-style
   * word encodes under the (small, driver-held) merge list; adds
   * `pieces` (words' symbol runs joined by " | ") and `n_pieces`
   * (total symbol count — the sequence length a BPE-tokenized
   * training run would see). Per-row iterative logic →
   * Dataset.mapPartitions like the multimodal codecs: the merge
   * table rides the closure once per partition, rows stream through
   * with no shuffle.
   */
  def bpeSegment(df: DataFrame, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("pieces", StringType), StructField("n_pieces", IntegerType)))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val words = Option(r.getString(idx)).getOrElse("")
          .toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        val encoded = words.map(w => bpeEncodeWord(w, merges))
        Row.fromSeq(r.toSeq :+
          encoded.map(_.mkString(" ")).mkString(" | ") :+
          encoded.map(_.length).sum)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * Content-defined chunking (the storage-dedup counterpart of the
   * fixed token windows in [[chunks]]): cut wherever the portable
   * hash of the trailing `width`-char window is ≡ 0 mod `modulus`
   * (expected chunk ≈ modulus chars) — boundaries survive insertions
   * and deletions elsewhere in the document, which is what makes
   * chunk-hash dedup robust to edits. The boundary scan is a native
   * expression (graft.functions.CdcBoundaries); the chunk assembly is
   * small per-row array algebra. Scan-shaped, zero shuffles.
   */
  def cdcChunks(text: Column, width: Int = 16, modulus: Int = 64): Column =
    // boundary scan and start/end arrays each bound once per row
    // (bindOnce doc): inlined, the O(text) boundary scan re-ran inside
    // every chunk's element_at
    bindOnce(graft.functions.CdcBoundaries(text, width, modulus)) { b =>
      bindOnce(concat(array(lit(1)), transform(b, x => x + 1))) { starts =>
        bindOnce(concat(b, array(length(text)))) { ends =>
          filter(
            transform(sequence(lit(0), size(ends) - 1), j =>
              struct(element_at(starts, j + 1).as("start"),
                (element_at(ends, j + 1) - element_at(starts, j + 1) + 1)
                  .as("len"),
                text.substr(element_at(starts, j + 1),
                  element_at(ends, j + 1) - element_at(starts, j + 1) + 1)
                  .as("chunk"))),
            c => c.getField("len") > 0)
        }
      }
    }

  /** Non-distinct word bigrams (repetition measures need counts). */
  private def bigrams(text: Column): Column =
    // tokens bound once per row (bindOnce doc)
    bindOnce(tokens(text)) { tk =>
      when(size(tk) >= 2,
        transform(sequence(lit(0), size(tk) - 2), i =>
          concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2))))
        .otherwise(array().cast("array<string>"))
    }

  /**
   * Repetition signal: fraction of bigrams taken by the most frequent
   * bigram (the "fraction of characters in most common n-gram" family
   * of training-data quality filters). Pure per-row column
   * expressions — quadratic in tokens-per-doc (bounded, ~tens), zero
   * shuffles over the corpus.
   */
  def topBigramFraction(text: Column): Column =
    // the bigram array binds once per row; the count-per-distinct
    // filter inside stays quadratic in BIGRAMS by design (documented
    // above), but no longer re-tokenizes per element
    bindOnce(bigrams(text)) { bi =>
      val top = array_max(transform(array_distinct(bi), b =>
        size(filter(bi, x => x === b))))
      when(size(bi) === 0, lit(0.0))
        .otherwise(top.cast("double") / size(bi))
    }

  /** Lexical-diversity signal: distinct tokens / tokens (type-token
    * ratio); heavily repeated boilerplate scores low. */
  def typeTokenRatio(text: Column): Column = {
    val tk = tokens(text)
    when(size(tk) === 0, lit(0.0))
      .otherwise(size(array_distinct(tk)).cast("double") / size(tk))
  }

  /**
   * TF-IDF top-k terms per document: tf(doc, term) × ln(N / df(term)),
   * the k highest-scoring terms each (ties by term). Three shuffles —
   * token postings, document frequency, per-doc ranking — all keyed on
   * high-cardinality columns (term / doc), so no skew hot-spot; the
   * corpus size joins in as a broadcast single-row aggregate rather
   * than a driver-side count, keeping the whole transform lazy.
   */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
    // read twice (document frequency + the scoring join): persist when
    // big enough that the tokenize+count pass dominates (size-aware —
    // spills rather than recomputes at scale, no barrier at small inputs)
    val tf = graft.util.Caching.maybePersist(
      toks.groupBy("id", "tok").agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("tfidf").desc, col("tok").asc)))
      .filter(col("__rn") <= k)
      .select(col("id"), col("tok"), col("tfidf"))
  }

  /**
   * N-gram novelty score: the fraction of a document's distinct
   * n-grams that occur in NO other document (corpus-wide document
   * frequency 1). Low novelty identifies boilerplate/templated text —
   * a standard corpus-quality filter next to dedup (which only flags
   * whole near-duplicate documents, not shared scaffolding).
   *
   * Plan shape: postings → document-frequency aggregation → join back
   * → per-document aggregation. Three shuffles, all keyed on
   * high-cardinality columns (n-gram hash / doc id), map-side
   * combined; nothing is quadratic in documents or corpus size.
   */
  def noveltyScore(df: DataFrame, textCol: String, idCol: String,
                   ngram: Int = 3, portable: Boolean = false): DataFrame =
    noveltyFromPostings(
      Dedup.hashedPostings(df, textCol, idCol, ngram, portable))

  /** Novelty from pre-materialized (id, h) postings (shared with the
    * dedup family — one tokenize+hash scan feeds both). */
  def noveltyFromPostings(post: DataFrame): DataFrame = {
    val dfreq = post.groupBy("h").agg(count(lit(1)).as("df"))
    post.join(dfreq, "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        col("n_unique").cast("double") / col("n_shingles"))
  }

  /**
   * Hashed-feature logistic regression, trained IN the engine by
   * full-batch gradient descent — the fastText/CCNet-style quality
   * classifier (a linear model over a hashed bag of words) without
   * shipping the corpus to a separate trainer. Features are the
   * L1-normalized hashed bag of tokens (x_b = count of tokens hashing
   * to bucket b / n_tok — fastText's mean of one-hot buckets), the
   * intercept rides as a constant pseudo-feature at index `buckets`
   * (the augmented-vector trick), and each GD step is
   * w ← w − lr·(1/N)·Σ_d (σ(w·x_d) − y_d)·x_d.
   *
   * Scale shape: the corpus is tokenized ONCE into a (doc, bucket, x)
   * feature table, repartitioned by doc id and persisted; every
   * iteration after that is (a) a per-doc margin aggregation and a
   * join back to the feature table — both satisfied by the id
   * partitioning, so NO per-iteration shuffle of the corpus — and
   * (b) a bucket-keyed gradient aggregation whose output is exactly
   * `buckets + 1` rows to the driver. The weight vector enters each
   * plan as a broadcast array literal (element_at, no join). Zero
   * tokenization or scan work repeats across iterations; doubling
   * `iters` costs two more bounded aggregations, not another corpus
   * pass. Training docs with zero tokens carry no evidence and are
   * excluded (x would be the zero vector); docs whose label evaluates
   * to null are excluded too — a null label would stay in nDocs while
   * its margin dropped out of the gradient sums, silently shrinking
   * the effective learning rate instead of erroring.
   */
  def trainHashedLogreg(df: DataFrame, textCol: String, idCol: String,
                        label: Column, buckets: Int = 64, iters: Int = 2,
                        lr: Double = 0.5, portable: Boolean = false)
      : (Array[Double], Double) = {
    val base = df.select(col(idCol).as("id"),
        label.cast("double").as("y"), tokens(col(textCol)).as("tks"))
      .withColumn("n_tok", size(col("tks")))
      .filter(col("n_tok") > 0 && col("y").isNotNull)
    val feat = base
      .select(col("id"), col("y"), col("n_tok"),
        explode(col("tks")).as("tok"))
      .withColumn("b", (hash32(col("tok"), portable) % buckets).cast("int"))
      .groupBy("id", "y", "n_tok", "b").agg(count(lit(1)).as("cnt"))
      .select(col("id"), col("y"), col("b"),
        (col("cnt").cast("double") / col("n_tok")).as("x"))
      .unionByName(base.select(col("id"), col("y"),
        lit(buckets).as("b"), lit(1.0).as("x")))
      .repartition(col("id"))
      .persist()
    val nDocs = feat.filter(col("b") === buckets).count().toDouble
    // w(buckets) is the intercept (its feature is the constant 1.0)
    val w = Array.fill(buckets + 1)(0.0)
    for (_ <- 0 until iters) {
      val wl = lit(w)
      val perDoc = feat.groupBy("id", "y")
        .agg(sum(element_at(wl, col("b") + 1) * col("x")).as("s"))
        .select(col("id"),
          (lit(1.0) / (lit(1.0) + exp(-col("s"))) - col("y")).as("r"))
      val grad = feat.join(perDoc, "id")
        .groupBy("b").agg(sum(col("r") * col("x")).as("g"))
        .collect()
      grad.foreach { row =>
        val b = row.getInt(0)
        w(b) -= lr * row.getDouble(1) / nDocs
      }
    }
    feat.unpersist()
    (w.dropRight(1), w(buckets))
  }

  /**
   * Apply a hashed linear classifier ([[trainHashedLogreg]] output, or
   * any externally trained fastText-style model's hashed weights):
   * score = σ(Σ_tok w[h(tok) % buckets] / n_tok + bias). A pure
   * column expression — the weight vector is an array literal probed
   * per token with element_at inside `aggregate`, so scoring is a
   * zero-shuffle, whole-stage-codegen'd scan projection that pushes
   * down like any filter. Stateless, so it runs unchanged on a
   * stream (no state store, no watermark). Zero-token docs score
   * σ(bias) — the prior.
   */
  def classifierScore(df: DataFrame, textCol: String, idCol: String,
                      weights: Array[Double], bias: Double,
                      portable: Boolean = false): DataFrame = {
    val buckets = weights.length
    val wl = lit(weights)
    val tks = tokens(col(textCol))
    val dot = aggregate(tks, lit(0.0), (acc, t) =>
      acc + element_at(wl, (hash32(t, portable) % buckets).cast("int") + 1))
    val s = when(size(tks) > 0, dot / size(tks) + lit(bias))
      .otherwise(lit(bias))
    df.select(col(idCol).as("id"), size(tks).as("n_tok"),
      (lit(1.0) / (lit(1.0) + exp(-s))).as("score"))
  }

  /**
   * HTML → plain-text extraction (the WET-style pass a crawl corpus
   * runs before every text-quality/dedup stage): drops comments and
   * whole script/style elements (lazy block matches so one unclosed
   * element cannot swallow the document past its real close tag),
   * strips every remaining tag to a space, decodes the common named
   * entities — `&amp;` strictly LAST, so `&amp;lt;` round-trips to
   * the literal `&lt;` instead of double-decoding to `<` — and
   * collapses runs of whitespace. Pure regexp/replace column
   * expressions: zero shuffles, whole-stage codegen, and every
   * pattern is RE2-compatible (inline (?is) flags, lazy quantifiers,
   * NO backreferences — script and style are two passes instead of a
   * `\1` close tag) so external engines can mirror it. The
   * whitespace class is spelled explicitly ([ \t\n\r\f]) because
   * Java's \s and RE2's \s disagree on vertical tab.
   */
  def htmlExtract(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment,
      "(?is)<script\\b[^>]*>.*?</script[ \\t\\n\\r]*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style[ \\t\\n\\r]*>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val amp = replace(named, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "[ \\t\\n\\r\\f]+", " "))
  }

  /**
   * Within-document repeated-line removal — RefinedWeb's
   * intra-document dedup pass, the complement of
   * [[graft.pipeline.Dedup.boilerplateStrip]]'s CROSS-document
   * frequency rule: a line repeated inside ONE document keeps only
   * its first occurrence (nav menus, footers, pagination stamped
   * down the same page), while the same line appearing in other
   * documents is untouched. Output per doc: total line count, kept
   * count, and the reassembled text in original order.
   *
   * A pure column expression — keep line i iff its FIRST occurrence
   * index is i (`array_position` inside an indexed `filter`), so the
   * pass is a zero-shuffle, whole-stage-codegen'd scan projection
   * that runs unchanged on a stream (no state store). The expression
   * is quadratic in the PER-DOC line count (array_position rescans
   * the array per line) — the right trade for real documents (tens
   * to hundreds of lines, all in cache); a corpus of pathological
   * million-line docs should route through the d11-style
   * explode + (doc, line)-keyed first-occurrence aggregation, whose
   * shuffles stay doc-keyed.
   */
  def stripRepeatedLines(df: DataFrame, textCol: String, idCol: String,
                         sep: String = "\n"): DataFrame = {
    val ls = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val kept = filter(ls, (l, i) => array_position(ls, l) === i + 1)
    df.select(col(idCol).as("id"),
      size(ls).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, sep).as("text_clean"))
  }

  /** Lowercased host of an absolute URL: an optional userinfo prefix
    * (`user:pass@`) is stripped — credentials must never reach a dedup
    * key or domain grouping — then the port. A bracketed IPv6 literal
    * keeps its brackets (the port regex only strips after `]`); bare
    * unbracketed IPv6 is not a valid URL host and is out of scope. */
  def urlHost(url: Column): Column = {
    val afterScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = lower(regexp_extract(afterScheme, "^([^/?#]+)", 1))
    val hostport = regexp_replace(authority, "^[^/?#@]*@", "")
    regexp_replace(hostport, ":[0-9]*$", "")
  }

  /**
   * Registered (pay-level) domain of a lowercased host — the key a
   * crawl pipeline groups by for per-site caps, politeness budgets
   * and URL dedup. Heuristic public-suffix rule kept deliberately
   * small and mirrorable: hosts ending in a two-letter ccTLD behind a
   * common second-level label (co/com/net/org/gov/ac/edu, the co.uk
   * family) keep THREE labels, everything else keeps two; bare or
   * single-label hosts pass through. It misclassifies multi-part
   * suffixes outside that list (github.io, com.au) — the real
   * public-suffix path is [[withRegisteredDomainPsl]]; this heuristic
   * stays as its no-rule fallback and as the zero-join column form.
   */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    val tld = element_at(labels, -1)
    when(n >= 3 &&
        sld.isin("co", "com", "net", "org", "gov", "ac", "edu") &&
        length(tld) === 2,
        concat_ws(".", slice(labels, -3, 3)))
      .when(n >= 2, concat_ws(".", slice(labels, -2, 2)))
      .otherwise(host)
  }

  /** One parsed public-suffix rule: `suffix` is the rule with any
    * `*.` / `!` marker stripped, `kind` ∈ rule|wildcard|exception. */
  case class PslRule(suffix: String, kind: String)

  /** Parse public-suffix-list lines (the publicsuffix.org file format:
    * `//` comments and blanks skipped, `*.foo` wildcard rules, `!bar`
    * exception rules) into [[PslRule]]s. Feed it the full PSL snapshot
    * in production; [[defaultPsl]] is a curated slice for tests. */
  def pslRules(lines: Seq[String]): Seq[PslRule] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      .map {
        case l if l.startsWith("!")  => PslRule(l.drop(1), "exception")
        case l if l.startsWith("*.") => PslRule(l.drop(2), "wildcard")
        case l                       => PslRule(l, "rule")
      }

  /** A curated snapshot of publicsuffix.org rules covering the common
    * TLD families plus the shapes the heuristic gets wrong
    * (multi-part ccSLDs like com.au, private-registry suffixes like
    * github.io, wildcard + exception rules). Swap in the full list
    * file via [[pslRules]] for production. */
  val defaultPsl: Seq[PslRule] = pslRules(Seq(
    "com", "net", "org", "edu", "gov", "mil", "int", "io", "co", "ai",
    "dev", "app", "info", "biz", "me", "tv", "us", "de", "fr", "nl",
    "it", "es", "se", "ch", "ru", "cn", "in", "ca", "eu",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "br", "com.br", "net.br", "org.br", "gov.br",
    "nz", "co.nz", "net.nz", "org.nz", "govt.nz",
    "kr", "co.kr", "or.kr", "za", "co.za", "org.za",
    "mx", "com.mx", "pl", "com.pl",
    // wildcard + exception family (the PSL's *.ck carve-out)
    "*.ck", "!www.ck",
    // private-registry suffixes a crawl MUST split sites on
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "cloudfront.net", "s3.amazonaws.com", "web.app", "pages.dev"))

  /** The FULL publicsuffix.org snapshot, bundled as a resource
    * (public content, MPL 2.0 — the file's own header; ~9.5k rules,
    * suffixes up to 5 labels). This is the production rule set for
    * [[withRegisteredDomainPsl]]; [[defaultPsl]] stays as the small
    * fixture the unit vectors read by eye. Loaded once per JVM;
    * rules are broadcast per suffix length at query time, so the
    * snapshot's size never touches the corpus-side plan. */
  lazy val fullPsl: Seq[PslRule] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try pslRules(src.getLines().toSeq) finally src.close()
  }

  /**
   * Registered domain against a real public-suffix table — the scale
   * path the heuristic [[registeredDomain]] documents a slot for.
   * Implements the PSL algorithm: the LONGEST matching rule is the
   * public suffix (wildcard `*.foo` counts as one label longer;
   * a matching exception rule `!bar` IS the registered domain), the
   * registered domain is the suffix plus one label, a host equal to
   * its public suffix has none (null), and a host matching no rule
   * falls back to the heuristic (stricter than the PSL's implicit `*`
   * — an unknown TLD still groups co.uk-style hosts sanely).
   *
   * Plan shape: rules pre-bucket by label count driver-side (the PSL
   * is wire-sized), then ONE BROADCAST JOIN per suffix length 1..
   * `maxSuffixLabels` against the host's k-label tail — no shuffle of
   * the host side, no explode, no per-row scan of the rule set; the
   * host column streams through whole-stage codegen between the hash
   * probes. The default cap of 5 covers every rule in the bundled
   * [[fullPsl]] snapshot (its longest suffixes — the 5-label s3/cloud9
   * private entries — and its longest wildcards, whose 4-label
   * suffixes match one label longer).
   */
  def withRegisteredDomainPsl(df: DataFrame, host: Column,
                              rules: Seq[PslRule] = defaultPsl,
                              out: String = "registered_domain",
                              maxSuffixLabels: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byLen: Map[Int, Seq[PslRule]] =
      rules.groupBy(_.suffix.count(_ == '.') + 1).view.mapValues(_.toSeq)
        .toMap
    val labels = split(host, "\\.")
    val n = size(labels)
    def tail(k: Int) = concat_ws(".", slice(labels, -k, k))
    val ks = (1 to maxSuffixLabels).filter(byLen.contains)
    val joined = ks.foldLeft(df.withColumn("__n", n)) { (d, k) =>
      val flags = byLen(k)
        .groupBy(_.suffix).map { case (sfx, rs) =>
          (sfx, rs.exists(_.kind == "rule"),
            rs.exists(_.kind == "wildcard"),
            rs.exists(_.kind == "exception"))
        }.toSeq
        .toDF(s"__sfx$k", s"__r$k", s"__w$k", s"__e$k")
      d.join(broadcast(flags),
        when(col("__n") >= k, tail(k)) === col(s"__sfx$k"), "left")
    }
    def f(c: String) = coalesce(col(c), lit(false))
    // longest exception wins outright: the exception IS the regdom
    val excDom = ks.reverse.map(k =>
      when(f(s"__e$k"), tail(k))).reduceOption(coalesce(_, _))
      .getOrElse(lit(null: String))
    // longest public suffix: wildcard at k means k+1 labels when the
    // wildcard label actually exists
    val sufLen = ks.reverse.flatMap(k => Seq(
        when(f(s"__w$k") && col("__n") >= k + 1, lit(k + 1)),
        when(f(s"__r$k"), lit(k))))
      .reduceOption(greatest(_, _)).getOrElse(lit(null: Integer))
    val psl = when(excDom.isNotNull, excDom)
      .when(sufLen.isNotNull && col("__n") >= sufLen + 1,
        concat_ws(".",
          slice(labels, -(sufLen + lit(1)), sufLen + lit(1))))
      .when(sufLen.isNotNull, lit(null: String)) // host IS a suffix
      .otherwise(registeredDomain(host))
    joined.withColumn(out, psl)
      .drop("__n" +: ks.flatMap(k =>
        Seq(s"__sfx$k", s"__r$k", s"__w$k", s"__e$k")): _*)
  }

  /**
   * Canonical form of an absolute http(s) URL — the normalization a
   * crawl corpus applies before URL-keyed dedup, so the dozens of
   * spellings of one page collapse to a single key: scheme and host
   * lowercase; default port (http:80 / https:443) dropped, explicit
   * non-default ports kept; duplicate slashes in the path collapsed
   * and trailing slashes stripped (empty path → "/"; path CASE is
   * preserved — it is significant); tracking parameters (utm_*,
   * gclid, fbclid) removed and the surviving query parameters sorted
   * (first `?` starts the query); the fragment dropped. Pure
   * RE2-safe regexp/array column expressions — zero shuffles,
   * whole-stage codegen, runs unchanged on a stream.
   */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = lower(regexp_extract(afterScheme, "^([^/?#]+)", 1))
    // userinfo never survives canonicalization: spellings with and
    // without credentials collapse, and a secret-bearing URL cannot
    // leak its password into the dedup key
    val hostport = regexp_replace(authority, "^[^/?#@]*@", "")
    val host = regexp_replace(hostport, ":[0-9]*$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val portPart = when(port === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(afterScheme, "^[^/?#]+([^?#]*)", 1)
    val stripped =
      regexp_replace(regexp_replace(rawPath, "/{2,}", "/"), "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid)(=|$)"))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, portPart, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }
}
