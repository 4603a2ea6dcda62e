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
 * Hashing: the production default is the engine-native h32Fast
 * (xxhash64 masked to 32 bits); oracle-checked contract queries pin
 * `portable = true` to get the md5-based TextAnalysis.h32, which is
 * replicable in DuckDB. Both live behind the same `portable` flag.
 */
object Dedup {

  import TextAnalysis.{hash32, shingles, tokens}

  /** Term extractor: 1 → distinct tokens, n>1 → word n-gram shingles. */
  private def terms(text: Column, ngram: Int): Column =
    if (ngram <= 1) array_distinct(tokens(text)) else shingles(text, ngram)

  /** Exact duplicate groups by content hash: keeper = min id.
    * One shuffle; map-side partial aggregation applies. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_docs"))

  /**
   * Segment-level exact dedup — MassiveText-style paragraph dedup
   * generalized to fixed non-overlapping token windows (the segment
   * boundary when the text carries no newlines): each distinct
   * segment survives only at its FIRST corpus occurrence (lowest id,
   * then lowest start offset); every later occurrence is dropped and
   * the documents are reassembled from their surviving segments in
   * order. Returns one row per input document:
   * (id, n_seg, n_kept, dedup_text).
   *
   * 100 TB shape: the corpus is scanned ONCE; chunking is scan-shaped
   * (no shuffle); first-occurrence is a window over the segment hash
   * (high-cardinality key, per-hash group = that segment's occurrence
   * count); reassembly is one aggregation shuffle on the document id.
   * Nothing is quadratic and no driver state exists.
   */
  def segmentDedup(df: DataFrame, textCol: String, idCol: String,
                   width: Int = 8, portable: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seg = df.select(col(idCol).as("id"), posexplode(
        TextAnalysis.chunks(col(textCol), width, 0)).as(Seq("ix", "ch")))
      .select(col("id"), col("ch.start").as("start"),
        col("ch.chunk").as("segment"),
        TextAnalysis.hash60(col("ch.chunk"), portable).as("seg_hash"))
    val ranked = seg.withColumn("rn", row_number().over(
      Window.partitionBy("seg_hash").orderBy("id", "start")))
    // collect_list skips nulls, so the non-keeper rows vanish from the
    // reassembly while still counting toward n_seg
    val perDoc = ranked.groupBy("id").agg(
      count(lit(1)).as("n_seg"),
      count(when(col("rn") === 1, 1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(when(col("rn") === 1,
          struct(col("start"), col("segment"))))),
        _.getField("segment")), " ").as("dedup_text"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_seg"), lit(0L)).as("n_seg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  /**
   * Frequency-based boilerplate removal (the CCNet/RefinedWeb line
   * dedup step, generalized to token windows since this corpus has no
   * line structure): a segment that appears in `minDf` or more
   * DISTINCT documents of the same source is boilerplate (headers,
   * nav text, license banners — content templated by the site, not
   * authored per page) and is stripped from every document carrying
   * it. Differs from [[segmentDedup]] in both trigger and effect:
   * segmentDedup keeps the FIRST occurrence of any repeat, this
   * removes ALL occurrences once the per-source document frequency
   * crosses the threshold — rare cross-doc repeats survive.
   *
   * Plan: segment explode → distinct (source, seg_hash, id) → count
   * per (source, seg_hash) → hash join back (co-partitioned on the
   * same key) → per-doc reassembly agg. All keys high-cardinality;
   * no windows, no self-join — at 100 TB the frequency table is the
   * only added shuffle and it is bounded by distinct segments, with
   * map-side combine.
   */
  def boilerplateStrip(df: DataFrame, textCol: String, idCol: String,
                       sourceCol: String, width: Int = 3,
                       minDf: Long = 2,
                       portable: Boolean = true): DataFrame = {
    // NOT persisted, deliberately (measured): the two readers want
    // different widths — the frequency branch needs only
    // (src, seg_hash, id) while the flag join needs the segment text —
    // and a persist barrier materializes the WIDE rows for both
    // (1×: 3.6 s → 13.7 s, 30×: 33 s → 35 s, checksums identical).
    // Recomputing the window pass once per branch lets Catalyst prune
    // each to its own column slice — the same lesson as the top-k
    // input in SCALING.md, and the inverse of d15's narrow-pair
    // persist (16 B/row there, ~width tokens/row here).
    val seg = sourceSegments(df, textCol, idCol, sourceCol, width, portable)
    val freq = seg.select("src", "seg_hash", "id").distinct()
      .groupBy("src", "seg_hash")
      .agg(count(lit(1)).as("seg_df"))
    val flagged = seg.join(freq, Seq("src", "seg_hash"))
      .withColumn("boiler", col("seg_df") >= minDf)
    val perDoc = flagged.groupBy("id").agg(
      count(lit(1)).as("n_seg"),
      count(when(!col("boiler"), 1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(when(!col("boiler"),
          struct(col("start"), col("segment"))))),
        _.getField("segment")), " ").as("clean_text"))
    df.select(col(idCol).as("id")).distinct()
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_seg"), lit(0L)).as("n_seg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** The (id, src, start, segment, seg_hash) window table both
    * boilerplate forms derive from — ONE definition, so the batch
    * strip and the frozen ref sets the streaming screen consumes can
    * never drift apart in tokenization, width handling, or hash
    * choice (the StreamingSpec equivalence depends on it). Catalyst
    * prunes unused columns per consumer. */
  private def sourceSegments(df: DataFrame, textCol: String, idCol: String,
                             sourceCol: String, width: Int,
                             portable: Boolean): DataFrame =
    df.select(col(idCol).as("id"), col(sourceCol).as("src"),
        posexplode(TextAnalysis.chunks(col(textCol), width, 0))
          .as(Seq("ix", "ch")))
      .select(col("id"), col("src"), col("ch.start").as("start"),
        col("ch.chunk").as("segment"),
        TextAnalysis.hash60(col("ch.chunk"), portable).as("seg_hash"))

  /**
   * The frozen per-source boilerplate sets [[streamBoilerplateStrip]]
   * screens against: one row per source carrying the array of segment
   * hashes whose document frequency reached `minDf` in the landed
   * corpus — |sources| rows, broadcast-able. The same frozen-state
   * discipline as the decontamination eval set and the PQ codebooks:
   * recompute offline as the corpus grows; arrivals never mutate it.
   * `maxHashes` fails fast before the per-source collect_set can hit
   * the row/broadcast ceilings (boilerplate sets are small by
   * construction — they hold only segments REPEATED across >= minDf
   * docs of one source).
   */
  def boilerplateRefSets(df: DataFrame, textCol: String, idCol: String,
                         sourceCol: String, width: Int = 3,
                         minDf: Long = 2, portable: Boolean = true,
                         maxHashes: Long = 10_000_000L): DataFrame = {
    // persist the POST-aggregation frame (|boilerplate hashes| rows —
    // tiny by construction) so the guard count and the collect_set do
    // not each replay the full corpus explode + distinct + aggregate
    val Seq(boiler) = graft.util.Caching.persistOwned(
      "Dedup.boilerplateRefSets",
      sourceSegments(df, textCol, idCol, sourceCol, width, portable)
        .select("src", "seg_hash", "id")
        .distinct()
        .groupBy("src", "seg_hash")
        .agg(count(lit(1)).as("seg_df"))
        .filter(col("seg_df") >= minDf))
    val n = boiler.agg(count(lit(1))).head.getLong(0)
    require(n <= maxHashes,
      s"boilerplateRefSets: $n boilerplate hashes exceed the $maxHashes " +
        "cap for the per-source broadcast arrays. Use boilerplateStrip " +
        "(batch, join-based) or raise maxHashes.")
    boiler.groupBy("src").agg(collect_set(col("seg_hash")).as("boiler_hs"))
  }

  /**
   * Streaming boilerplate removal — [[boilerplateStrip]]'s
   * arrival-screening form: each arriving document joins its source's
   * frozen boilerplate-hash array (stream-static broadcast join,
   * STATELESS — no state store, no watermark, no streaming agg) and
   * the strip is a pure array expression: windows whose hash sits in
   * the array vanish, the rest reassemble in order. A source with no
   * boilerplate row passes untouched (left join + null-safe filter).
   * Equal to the batch op when the ref sets came from the same corpus
   * (asserted in StreamingSpec).
   */
  def streamBoilerplateStrip(docs: DataFrame, textCol: String,
                             idCol: String, sourceCol: String,
                             refSets: DataFrame, width: Int = 3,
                             portable: Boolean = true): DataFrame = {
    // The frozen sets ride an executor BROADCAST as real hash sets —
    // built once, O(1) membership per window. The two relational
    // formulations both rebuilt per-row lookup structure against the
    // joined array column and died at scale (measured at 30×,
    // ~12k hashes/source: array_contains per window = O(win×set),
    // 177 s/batch; array_intersect per doc = a fresh 12k-entry set
    // PER ROW, 26 s/batch; this closure: sub-second). refSets is
    // wire-sized by boilerplateRefSets' maxHashes guard, so the
    // collect is bounded — the same frozen-state shape as the
    // decontamination eval set, with the right lookup structure.
    val sets: Map[String, Set[Long]] = refSets.collect().map { r =>
      r.getString(0) -> r.getSeq[Long](1).toSet
    }.toMap
    val badOf = udf((src: String, whs: Seq[Long]) =>
      sets.get(src) match {
        case Some(s) => whs.filter(s.contains).distinct
        case None => Seq.empty[Long]
      })
    val ch = TextAnalysis.chunks(col(textCol), width, 0)
    val kept = filter(arrays_zip(col("__ch"), col("__wh")), z =>
      !array_contains(col("__bad"), z.getField("__wh")))
    docs.select(col(idCol).as("id"), col(sourceCol).as("src"),
        ch.as("__ch"))
      .withColumn("__wh", transform(col("__ch"), c =>
        TextAnalysis.hash60(c.getField("chunk"), portable)))
      .withColumn("__bad", badOf(col("src"), col("__wh")))
      .select(col("id"),
        size(col("__ch")).cast("long").as("n_seg"),
        size(kept).cast("long").as("n_kept"),
        array_join(transform(kept,
          z => z.getField("__ch").getField("chunk")), " ")
          .as("clean_text"))
  }

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
  /** Default document-frequency cap: ON by default — it is the one
    * guard that keeps the postings self-join from going quadratic on a
    * boilerplate shingle (a term in d docs contributes d²/2 pairs). */
  val DEFAULT_MAX_DF = 1000L

  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        threshold: Double,
                        maxDf: Option[Long] = Some(DEFAULT_MAX_DF),
                        ngram: Int = 3,
                        portable: Boolean = false): DataFrame = {
    // join on the 32-bit term hash, not the term string: the postings
    // shuffle moves 8-byte longs instead of ~20-char shingles, and the
    // Jaccard is computed over the hashed term sets on both engine and
    // oracle so rare collisions stay consistent.
    // self-join + sizes read postings 3-4×; persist unconditionally:
    // the recompute is CPU-dense (tokenize + per-shingle hash), which
    // a bytes-based size estimate cannot see, and the self-join
    // amplifies it on both sides (spills at scale, never recomputes)
    // generation-bounded ownership (Caching.persistOwned): the cache
    // outlives the call so the plan stays lazy (one action runs the
    // whole DAG), but the next invocation releases it — no unbounded
    // session-lifetime leak
    val Seq(post) = graft.util.Caching.persistOwned("Dedup.ngramJaccardPairs",
      hashedPostings(df, textCol, idCol, ngram, portable))
    jaccardFromPostings(post, threshold, maxDf)
  }

  /** Jaccard pairs from pre-materialized (id, h) postings — feed a
    * persisted hashedPostings when several dedup passes share it. */
  def jaccardFromPostings(post: DataFrame, threshold: Double,
                          maxDf: Option[Long] = Some(DEFAULT_MAX_DF)): DataFrame = {
    val p = post.transform(d => maxDf match {
      case None => d
      case Some(cap) =>
        val dfreq = d.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
        d.join(dfreq.select("h"), Seq("h"))
    })
    // set sizes derived from the (capped) postings — one groupBy instead
    // of a second full text scan
    val sizes = p.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val shared = p.as("a").join(p.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
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

  /**
   * Asymmetric containment — |A∩B| / |A| — the quote/subset detector:
   * a short document wholly contained in a long one scores ~1.0 while
   * its symmetric Jaccard stays low (the union is dominated by the
   * long side), so containment catches exactly the copies Jaccard
   * misses. Emits BOTH directions of every qualifying ordered pair
   * (contained id, container id). Same postings self-join + DF-cap
   * shape (and shuffle keys) as [[jaccardFromPostings]].
   */
  def containmentFromPostings(post: DataFrame, threshold: Double,
                              maxDf: Option[Long] = Some(DEFAULT_MAX_DF))
      : DataFrame = {
    val p = post.transform(d => maxDf match {
      case None => d
      case Some(cap) =>
        val dfreq = d.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
        d.join(dfreq.select("h"), Seq("h"))
    })
    val sizes = p.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val shared = p.as("a").join(p.as("b"),
        col("a.h") === col("b.h") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id"), col("b.id").as("id_in"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes, Seq("id"))
      .withColumn("containment", col("shared").cast("double") / col("sz"))
      .filter(col("containment") >= threshold)
      .select("id", "id_in", "containment")
  }

  /** Deterministic MinHash permutation parameters. Multipliers are kept
    * under 2^30 so a*h32 (< 2^62) never overflows a signed 64-bit long;
    * arithmetic is mod the largest 32-bit prime. */
  val MH_PRIME = 4294967291L
  val MH_PARAMS: Seq[(Long, Long)] = Seq(
    (836603681L, 1L), (442543251L, 7L), (1004818243L, 13L), (668265263L, 31L),
    (374761393L, 97L), (741103597L, 41L), (988021567L, 151L), (540483477L, 65537L))

  /** Array of h32 term hashes — materialize this ONCE per row before
    * feeding minhash/simhash, so the md5-per-term cost is not inlined
    * into every downstream expression (Catalyst does not CSE across
    * higher-order-function lambdas). */
  def termHashes(text: Column, ngram: Int = 3,
                 portable: Boolean = false): Column =
    transform(terms(text, ngram), t => hash32(t, portable))

  /** 60-bit term-hash array (for signature schemes; see SIMHASH_BITS). */
  def termHashes60(text: Column, ngram: Int = 3,
                   portable: Boolean = false): Column =
    transform(terms(text, ngram), t => TextAnalysis.hash60(t, portable))

  /**
   * (id, h) term-hash postings — THE shared intermediate of the dedup
   * family. A pipeline running several dedup passes (Jaccard + MinHash
   * + SimHash) should materialize this once and feed the
   * `...FromPostings` variants: the tokenize+hash scan is the dominant
   * cost at any scale and is identical across passes of one bit width.
   */
  /**
   * Duplicated-span detection over OVERLAPPING token windows — the
   * exact-substring flavor of dedup (Lee et al. 2021,
   * arXiv:2107.06499): where [[segmentDedup]] cuts the document into
   * disjoint chunks (a repeat must align to a chunk boundary to be
   * seen), this hashes the `width`-token window at EVERY token
   * position, so any verbatim repeat of `width`+ tokens — at any
   * offset, in any document — is caught. Emits per-doc
   * (n_windows, n_dup, dup_frac): the fraction of a document's
   * windows that occur anywhere else in the corpus (or again in the
   * same document), the signal a pipeline thresholds to drop
   * boilerplate-heavy docs or route them to span-level cutting.
   *
   * Scale shape: one scan explodes ~|tokens| windows/doc (linear, not
   * quadratic — windows join a COUNT table, never each other), one
   * high-cardinality shuffle on the window hash, one join back, one
   * per-doc aggregation. No pair list exists at any point, so no DF
   * cap is needed: a window repeated a million times costs one count
   * row, unlike a postings self-join where it would cost 10^12 pairs.
   */
  /**
   * Winnowing fingerprint postings (Schleimer, Wilkerson & Aiken,
   * "Winnowing: Local Algorithms for Document Fingerprinting",
   * SIGMOD 2003 — the MOSS algorithm): hash every k-token shingle at
   * every position (ordered, NOT distinct — position matters), slide
   * a window of w consecutive shingle hashes, and keep each window's
   * MINIMUM hash. Set semantics collapse repeats, so a doc stores
   * only ~2/(w+1) of its shingles, yet any shared token run of length
   * ≥ w+k-1 is GUARANTEED to contribute at least one common
   * fingerprint — the deterministic storage/recall dial that MinHash
   * (probabilistic, d03) and full postings (exhaustive, d02) sit on
   * either side of.
   *
   * Returns distinct (id, h) fingerprint postings — feed to
   * [[jaccardFromPostings]] / [[containmentFromPostings]] exactly like
   * the shingle postings. Docs shorter than k tokens collapse to one
   * whole-text fingerprint (same degenerate rule as
   * TextAnalysis.shingles); empty docs emit nothing.
   *
   * Scale shape: selection is pure per-row column expressions (zero
   * shuffles — the min-of-window runs inside the projection), then one
   * distinct on (id, h). The pair join downstream operates on the
   * winnowed ~2/(w+1) sample instead of the full postings, shrinking
   * the self-join's input by the same factor.
   */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
                         k: Int = 4, w: Int = 4,
                         portable: Boolean = true): DataFrame = {
    val tk = col("__tk")
    val sh = when(size(tk) >= k,
        transform(sequence(lit(0), size(tk) - k), i =>
          TextAnalysis.hash60(
            concat_ws(" ", (1 to k).map(o => element_at(tk, i + o)): _*),
            portable)))
      .otherwise(when(size(tk) > 0,
          array(TextAnalysis.hash60(array_join(tk, " "), portable)))
        .otherwise(array().cast("array<long>")))
    val shc = col("__sh")
    val fps = when(size(shc) >= w,
        array_distinct(transform(sequence(lit(0), size(shc) - w), j =>
          array_min(slice(shc, j + 1, lit(w))))))
      .otherwise(when(size(shc) > 0, array(array_min(shc)))
        .otherwise(array().cast("array<long>")))
    df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("id"), sh.as("__sh"))
      // array_distinct already dedups within the doc, so (id, h) rows
      // are unique by construction — no shuffle-backed distinct needed
      .select(col("id"), explode(fps).as("h"))
  }

  def dupSpans(df: DataFrame, textCol: String, idCol: String,
               width: Int = 8, portable: Boolean = true): DataFrame = {
    // tokens materialize as a bound column BEFORE the window lambda:
    // referenced inline, the regex split's subtree rides into every
    // element_at occurrence — width+1 splits per row instead of one
    val tk = col("__tk")
    val winText = when(size(tk) >= width,
        transform(sequence(lit(0), size(tk) - width), i =>
          concat_ws(" ", (1 to width).map(o => element_at(tk, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    // persisted (generation-bounded ownership): read twice — the
    // count aggregation and the join-back side — and every uncached
    // replay re-pays tokenize + window explode + md5 over the corpus
    // (measured 2× the whole operator at 30×). Only (id, h) persists:
    // 16 B per window, the strings never leave the projection.
    val Seq(wins) = graft.util.Caching.persistOwned("Dedup.dupSpans",
      df.select(col(idCol).as("id"),
          TextAnalysis.tokens(col(textCol)).as("__tk"))
        .select(col("id"), explode(winText).as("win"))
        .select(col("id"), TextAnalysis.hash60(col("win"), portable).as("h")))
    val counts = wins.groupBy("h").agg(count(lit(1)).as("__n"))
    val perDoc = wins.join(counts, "h")
      .groupBy("id")
      .agg(count(lit(1)).as("n_windows"),
        count(when(col("__n") >= 2, 1)).as("n_dup"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_windows"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_windows"))
          .as("dup_frac"))
  }

  def hashedPostings(df: DataFrame, textCol: String, idCol: String,
                     ngram: Int = 3, portable: Boolean = false,
                     bits: Int = 32): DataFrame = {
    val hs = bits match {
      case 32 => array_distinct(termHashes(col(textCol), ngram, portable))
      case 60 => termHashes60(col(textCol), ngram, portable)
      case other => throw new IllegalArgumentException(s"bits $other")
    }
    df.select(col(idCol).as("id"), explode(hs).as("h"))
  }

  /** MinHash signature from a materialized hash array: for each (a,b)
    * param, min over terms of (a*h+b) mod p. */
  def minhashSigFromHashes(hs: Column): Column =
    array(MH_PARAMS.map { case (a, b) =>
      array_min(transform(hs, h => (h * a + b) % MH_PRIME))
    }: _*)

  /** MinHash signature column (prefer materializing termHashes first
    * when the text expression is reused). The hash array binds once
    * per row (TextAnalysis.bindOnce doc): inlined, each of the 8
    * per-param transforms re-ran the tokenize+md5 scan. */
  def minhashSignature(text: Column, ngram: Int = 3,
                       portable: Boolean = false): Column =
    TextAnalysis.bindOnce(termHashes(text, ngram, portable))(
      minhashSigFromHashes)

  /**
   * MinHash-LSH candidate pairs: signatures banded (rows-per-band
   * consecutive hashes); docs sharing any band bucket become
   * candidates; candidates verified with exact Jaccard ≥ threshold.
   *
   * The text is tokenized+hashed exactly ONCE: the distinct (id, hash)
   * postings feed the signature build, the set-size table, AND the
   * verify stage (shared-hash counts per candidate pair), so no stage
   * re-tokenizes raw text or joins full shingle arrays.
   */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      bands: Int, threshold: Double, ngram: Int = 3,
                      portable: Boolean = false): DataFrame = {
    // one tokenize+hash pass; persisted unconditionally because it is
    // read three times (signature+size agg, both sides of the verify
    // join) and the tokenize+hash recompute is CPU-dense
    // generation-bounded ownership — see ngramJaccardPairs
    val Seq(post) = graft.util.Caching.persistOwned("Dedup.minhashLshPairs",
      hashedPostings(df, textCol, idCol, ngram, portable))
    minhashLshFromPostings(post, bands, threshold)
  }

  /** MinHash-LSH pairs from pre-materialized (id, h) postings. */
  def minhashLshFromPostings(post: DataFrame, bands: Int,
                             threshold: Double): DataFrame = {
    // relational signature: the aggregate is a hard barrier, and the
    // partial-agg combine keeps shuffle traffic at 9 longs per doc.
    // The set size rides along in the SAME aggregation — the verify
    // stage needs it, and folding it here saves a full second shuffle
    // over the postings
    // persisted: read by the banding explode AND the sizes join, and
    // recomputing it replays the full postings aggregation
    // ONE persist, on the narrow root: sig (9 longs per doc) feeds the
    // banding explode (both self-join sides) and both size joins.
    // banded itself stays lazy — re-deriving it from cached sig is a
    // posexplode over in-memory rows, far cheaper than a second
    // materialization barrier (each persist is a job + sync point; at
    // bench scale the barriers dominate, at cluster scale they
    // serialize the DAG). Ownership is generation-bounded
    // (Caching.persistOwned): lazy plan, released on next invocation.
    val Seq(sig) = graft.util.Caching.persistOwned(
      "Dedup.minhashLshFromPostings", minhashSigAgg(post))
    val bandedP = lshBands(sig, bands)
    val cand = bandedP.as("x").join(bandedP.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    // verify from the postings: |A∩B| = shared hash count per pair,
    // |A∪B| = sz_a + sz_b - shared. Intermediate size is |cand| × avg
    // doc size, not |docs|² — the LSH savings survive verification.
    val sizes = sig.select(col("id"), col("sz"))
    val shared = cand
      .join(post.select(col("id").as("id_a"), col("h")), Seq("id_a"))
      .join(post.select(col("id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** The (id, mh0..mh7, sz) MinHash signature aggregation over (id, h)
    * postings — one shuffle, partial-agg combined to 9 longs per doc. */
  private def minhashSigAgg(post: DataFrame): DataFrame =
    post.groupBy(col("id")).agg(
      min((col("h") * MH_PARAMS.head._1 + MH_PARAMS.head._2) % MH_PRIME).as("mh0"),
      MH_PARAMS.zipWithIndex.tail.map { case ((a, b), i) =>
        min((col("h") * a + b) % MH_PRIME).as(s"mh$i")
      } :+ count(lit(1)).as("sz"): _*)

  /** Banded LSH keys from a signature table: (id, band, key) with
    * rows-per-band consecutive hashes concatenated into the key. */
  private def lshBands(sig: DataFrame, bands: Int): DataFrame = {
    val rowsPerBand = MH_PARAMS.length / bands
    sig.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            col(s"mh${b * rowsPerBand + r}")): _*).as("key"))
      }: _*)))
      .select(col("id"), col("col.band"), col("col.key"))
  }

  /**
   * Incremental dedup: screen an arriving snapshot against a FROZEN,
   * already-deduped corpus — the production nightly shape. Only the
   * arrivals get verdicts; corpus×corpus pairs are NEVER generated.
   *
   * Exact layer: an arrival whose full-content hash exists in the
   * corpus is a duplicate of the lowest corpus id carrying that hash.
   * Near layer: MinHash-LSH across the two tables — band signatures
   * of both sides, candidates = arrival bands probing corpus bands
   * (the corpus side (band, key) table is the persistable "LSH
   * index": computed once per corpus version, reused every night),
   * verified by true Jaccard from the two postings sets; an arrival
   * at >= threshold against any corpus doc is a near-duplicate of the
   * lowest qualifying corpus id. Exact beats near in the verdict.
   *
   * Returns one row per arrival: (id, keep, reason, dup_of) with
   * reason ∈ ('exact', 'near', null) and dup_of the corpus keeper.
   *
   * 100 TB shape: the corpus contributes one postings scan (in
   * production a stored signature/postings table — zero recompute);
   * every join is keyed (content hash / band key / candidate id); the
   * only pair set materialized is arrivals×corpus band-bucket
   * collisions, linear in the arrival batch for a clean corpus.
   */
  def screenAgainstCorpus(corpus: DataFrame, arrivals: DataFrame,
                          textCol: String, idCol: String,
                          bands: Int, threshold: Double,
                          ngram: Int = 3,
                          portable: Boolean = false): DataFrame = {
    // exact layer: min corpus id per content hash, left-joined onto
    // the arrivals' hashes (hash-keyed shuffle join; a nightly batch
    // small enough to broadcast lets AQE pick that plan from stats)
    val corpusHash = corpus
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("exact_of"))
    val base = arrivals
      .select(col(idCol).as("id"), md5(col(textCol)).as("content_hash"))
      .join(corpusHash, Seq("content_hash"), "left")
      .select(col("id"), col("exact_of"))
    // near layer: both postings sides are read twice (signature agg +
    // verify join) — persist under one owner key
    val Seq(cPost, aPost) = graft.util.Caching.persistOwned(
      "Dedup.screenAgainstCorpus.post",
      hashedPostings(corpus, textCol, idCol, ngram, portable),
      hashedPostings(arrivals, textCol, idCol, ngram, portable))
    val Seq(cSig, aSig) = graft.util.Caching.persistOwned(
      "Dedup.screenAgainstCorpus.sig",
      minhashSigAgg(cPost), minhashSigAgg(aPost))
    val cand = lshBands(aSig, bands).as("x")
      .join(lshBands(cSig, bands).as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col("x.id").as("id"), col("y.id").as("cid")).distinct()
    val near = cand
      .join(aPost.select(col("id"), col("h")), Seq("id"))
      .join(cPost.select(col("id").as("cid"), col("h")), Seq("cid", "h"))
      .groupBy(col("id"), col("cid")).agg(count(lit(1)).as("shared"))
      .join(aSig.select(col("id"), col("sz").as("sz_a")), "id")
      .join(cSig.select(col("id").as("cid"), col("sz").as("sz_c")), "cid")
      .filter(col("shared").cast("double") /
        (col("sz_a") + col("sz_c") - col("shared")) >= threshold)
      .groupBy(col("id")).agg(min(col("cid")).as("near_of"))
    base.join(near, Seq("id"), "left")
      .select(col("id"),
        (col("exact_of").isNull && col("near_of").isNull).as("keep"),
        when(col("exact_of").isNotNull, "exact")
          .when(col("near_of").isNotNull, "near").as("reason"),
        coalesce(col("exact_of"), col("near_of")).as("dup_of"))
  }

  /** 32-bit SimHash: per bit j, sum over distinct tokens of
    * (bit_j(h32)*2 - 1); bit set in the signature iff the vote is
    * non-negative. Pure column expressions (higher-order functions). */
  def simhash32FromHashes(hs: Column): Column = {
    val bits = (0 until 32).map { j =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash over a text column (materialize termHashes first when
    * composing with other hash consumers). */
  def simhash32(text: Column, ngram: Int = 3,
                portable: Boolean = false): Column =
    simhash32FromHashes(termHashes(text, ngram, portable))

  /** SimHash signature bit width for the pair query: 60 bits (15 hex
    * md5 digits — the widest portably-replicable slice). A 32-bit
    * signature caps band keys at 8 bits = 256 buckets, so bucket
    * population grows as n/256 and candidate pairs quadratically; 60
    * bits give 15-bit bands (32k buckets per band) — the classic
    * simhash64 blocking shape. */
  val SIMHASH_BITS = 60

  /**
   * 60-bit SimHash signatures, relationally: postings explode to
   * (id, term-hash) rows, one conditional-sum vote per bit in a single
   * groupBy — plain declarative aggregates, so Catalyst plans map-side
   * partial aggregation and the shuffle carries 60 longs per doc
   * regardless of document length.
   */
  def simhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        ngram: Int = 3, portable: Boolean = false): DataFrame =
    simhashSignaturesFromPostings(
      hashedPostings(df, textCol, idCol, ngram, portable, bits = 60))

  /** Signatures from pre-materialized 60-bit (id, h) postings (NOT
    * distinct-ed: each distinct term votes once; hash collisions vote
    * per term on both engine and oracle). */
  def simhashSignaturesFromPostings(post: DataFrame): DataFrame = {
    val votes = (0 until SIMHASH_BITS).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$j"))
    post.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until SIMHASH_BITS).map(j =>
          when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim"))
  }

  /**
   * SimHash near-duplicate pairs: 60-bit signatures banded into
   * `bands` equal bit-slices; docs sharing any band value become
   * candidates, verified by Hamming distance ≤ maxHamming.
   *
   * Pigeonhole recall guarantee: with 4 bands, any pair at Hamming
   * distance ≤ 3 has at least one identical band, so recall is exact
   * for maxHamming < bands. Cost scales with band-bucket collision
   * counts (the signature is 1 long per doc), never |docs|² — the
   * companion candidate query the SimHash signature (simhash32) was
   * missing.
   */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int, ngram: Int = 3, bands: Int = 4,
                   portable: Boolean = false): DataFrame =
    simhashPairsFromPostings(
      hashedPostings(df, textCol, idCol, ngram, portable, bits = 60),
      maxHamming, bands)

  /** Banded SimHash pairs from pre-materialized 60-bit postings. */
  def simhashPairsFromPostings(post: DataFrame, maxHamming: Int,
                               bands: Int = 4): DataFrame = {
    require(SIMHASH_BITS % bands == 0, s"bands=$bands must divide $SIMHASH_BITS")
    val bandBits = SIMHASH_BITS / bands
    val sigs = simhashSignaturesFromPostings(post)
    // signature + band keys in one pass; the signature rides along the
    // band join so the verify stage needs no join back to sigs.
    // Persisted via generation-bounded ownership: the self-join below
    // would otherwise replay the 60-vote signature aggregation on BOTH
    // sides — the single most CPU-dense recompute in the dedup family.
    val Seq(banded) = graft.util.Caching.persistOwned(
      "Dedup.simhashPairsFromPostings",
      sigs.select(col("id"), col("sim"), posexplode(
          array((0 until bands).map(b =>
            shiftright(col("sim"), b * bandBits)
              .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
        .select(col("id"), col("sim"), col("pos").as("band"), col("col").as("key")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.sim").as("sim_a"), col("y.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /**
   * Embedding near-duplicate pairs via multi-table random-hyperplane
   * LSH blocking: each vector lands in `tables` independent nBits-bit
   * buckets; docs sharing any bucket are candidates; candidates are
   * verified with exact cosine ≥ threshold.
   *
   * The 100 TB shape: bucket population is |corpus| / 2^nBits per
   * table (data-independent, no skewed "label" cells), so the
   * within-bucket pair count is bounded and tunable. Recall is
   * OR-amplified across tables — 1-(1-p^nBits)^tables for collision
   * probability p = 1-θ/π — and still < 1: this is an approximate
   * near-dup pass by design; raise `tables` (or add multi-probe) to
   * trade cost for recall.
   */
  /** Default bucket-population cap — the embedding analog of
    * [[DEFAULT_MAX_DF]]: a bucket with p members contributes p²/2
    * candidate pairs, and RHP buckets are NOT uniform on clustered
    * data (a tight cluster sits on the same side of most hyperplanes,
    * so raising nBits cannot split it — measured on a 60k synthetic:
    * top bucket 6.4k at nBits=6 and still 2.2k at nBits=12, keeping
    * candidate volume quadratic at any nBits). Oversized buckets are
    * dense clusters that flood a pair listing anyway; they belong to
    * the clustering operator ([[duplicateClusters]]), not all-pairs. */
  val DEFAULT_MAX_BUCKET = 1000

  def embeddingRhpPairs(df: DataFrame, vecCol: String, idCol: String,
                        threshold: Double, nBits: Int, dim: Int,
                        tables: Int,
                        maxBucket: Option[Int] = Some(DEFAULT_MAX_BUCKET))
      : DataFrame = {
    // bucket/dot/norm are native Catalyst expressions
    // (graft.functions.VectorMath): constant codegen size AND
    // codegen'd evaluation, so the old size-estimate regime switch
    // (interpreted HOF folds vs ~9 s of Janino for the unrolled
    // tables×nBits×dim projection) is gone entirely — one form serves
    // both the 500-row oracle run and the billion-row corpus, with
    // bit-identical results (same index-order IEEE accumulation).
    def bkt(vec: Column, off: Int): Column =
      graft.functions.VectorMath.rhpBucketCol(vec, nBits, dim, off)
    val nrmOf: Column => Column = graft.functions.VectorMath.normCol
    val dotOf: (Column, Column) => Column = graft.functions.VectorMath.dotCol
    // ONE persisted table carries everything downstream stages need —
    // norm and all `tables` bucket ids next to the vector — so the
    // pipeline materializes a single intermediate instead of three
    // (each persist is a job + barrier; at bench scale those dominate,
    // at cluster scale they serialize the DAG). The hyperplane dots and
    // the norm land in one projection: one scan computes them all.
    // persisted (generation-bounded ownership): read 4× — self-join +
    // both verify sides — and every UNCACHED replay re-pays the bucket
    // projection (codegen compile at small inputs, hyperplane dots at
    // scale)
    val Seq(v) = graft.util.Caching.persistOwned("Dedup.embeddingRhpPairs",
      (0 until tables).foldLeft(
          df.select(col(idCol).as("id"), col(vecCol).as("vec"))
            .withColumn("nrm", nrmOf(col("vec")))) {
          (d, t) => d.withColumn(s"__b$t", bkt(col("vec"), t * nBits))
        })
    val exploded = v.select(col("id"),
        posexplode(array((0 until tables).map(t => col(s"__b$t")): _*)))
      .select(col("id"), col("pos").as("t"), col("col").as("bkt"))
    // population cap: one tiny agg on the (table, bucket) key, then a
    // co-partitioned semi-join — same shape as the postings DF cap
    val bucketed = maxBucket match {
      case None => exploded
      case Some(cap) =>
        val ok = exploded.groupBy("t", "bkt")
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= cap)
        exploded.join(ok.select("t", "bkt"), Seq("t", "bkt"))
    }
    val cand = bucketed.as("a").join(bucketed.as("b"),
        col("a.t") === col("b.t") && col("a.bkt") === col("b.bkt") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val pairs = cand
      .join(v.select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b")), "id_b")
      .withColumn("cos",
        dotOf(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
    pairs
  }

  /**
   * Duplicate-cluster resolution: near-dup pairs → connected
   * components → keeper per component (min id) — the step that turns
   * any of the pair detectors (ngramJaccardPairs / minhashLshPairs /
   * simhashPairs / embeddingRhpPairs) into an actionable drop list.
   *
   * Algorithm: iterative min-label propagation over the undirected
   * pair graph. Each round every node adopts the minimum label in its
   * neighborhood (including its own); rounds double the distance a
   * minimum travels, so convergence needs O(diameter) ≤ O(log n)
   * rounds for the short, chain-like components near-dup graphs
   * produce. Each round is one groupBy over the (symmetrized) edge
   * list — map-side combined, shuffle keyed by node — and convergence
   * is detected with a count of changed labels (one cheap action per
   * round). maxIter caps pathological chains; persist keeps each
   * round's labels from recomputing the whole lineage.
   *
   * Returns (id, component) for every node appearing in `pairs`;
   * component = min doc id of the cluster (the keeper).
   */
  /**
   * Canonical-document selection: for each duplicate cluster, keep the
   * highest-quality member (ties broken by lowest id). `clusters` is
   * the (id, comp) labeling from [[duplicateClusters]]; `quality` maps
   * id → a deterministic score column named `q` (pass it pre-rounded —
   * cross-engine double ordering on raw scores is a tie-break hazard).
   *
   * One equi-join on id plus one aggregation on comp — `max_by` over a
   * (q, -id) struct gives argmax-with-tiebreak inside the partial+final
   * aggregation, so there is no per-cluster window or sort; comp is
   * high-cardinality (many small clusters), no skew hot-spot at scale.
   */
  def keepBest(clusters: DataFrame, quality: DataFrame): DataFrame =
    clusters.join(quality, "id")
      .groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("q").as("q"), (-col("id")).as("nid"))).as("best"))
      .select(col("cluster_id"), (-col("best.nid")).as("keep_id"),
        col("n_members"), col("best.q").as("quality"))

  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // localCheckpoint (eager) after every round truncates lineage —
    // without it the logical plan chains all rounds (hundreds of scan
    // nodes by round 20) and a lost cached partition would recompute
    // the entire iteration history
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // min over neighbors' labels and own label, one shuffle
      val viaEdges = sym
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("comp"))
      val next = viaEdges.unionByName(labels)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("comp", "old"), "id")
        .filter(col("comp") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      it += 1
    }
    labels
  }

  /**
   * Benchmark decontamination: flag corpus documents that share any
   * word n-gram with a benchmark/eval set — the standard guard against
   * test-set leakage in LLM training corpora. Returns (doc_id,
   * n_contaminated) for every corpus document with ≥1 shared n-gram.
   *
   * The 100 TB shape: eval sets are tiny relative to the corpus, so
   * the benchmark's distinct n-gram hashes BROADCAST — the corpus
   * postings stream through a map-side hash join and are never
   * shuffled; the only shuffle is the per-document count aggregation
   * (map-side combined).
   */
  def decontaminate(corpus: DataFrame, bench: DataFrame, textCol: String,
                    idCol: String, ngram: Int = 3,
                    portable: Boolean = false): DataFrame =
    decontaminateFromPostings(
      hashedPostings(corpus, textCol, idCol, ngram, portable),
      hashedPostings(bench, textCol, idCol, ngram, portable))

  /** Decontamination from pre-materialized (id, h) postings — a
    * pipeline holding the shared postings splits them into corpus and
    * benchmark sides with two filters instead of re-tokenizing. */
  def decontaminateFromPostings(corpusPost: DataFrame,
                                benchPost: DataFrame): DataFrame =
    corpusPost
      .join(broadcast(benchPost.select(col("h")).distinct()), Seq("h"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_contaminated"))

  /**
   * Pair-detector evaluation: compare a candidate detector's pair set
   * against a ground-truth pair set → one row of (n_true, n_found,
   * n_correct). In production this runs the detector AND the exact
   * quadratic truth on a SAMPLE of the corpus to tune banding/threshold
   * parameters before committing to the full run; the evaluation join
   * itself is linear in the two pair lists (equi-join on the pair key).
   */
  def pairEval(truth: DataFrame, found: DataFrame): DataFrame = {
    val t = truth.select(col("id_a"), col("id_b")).withColumn("t", lit(1L))
    val f = found.select(col("id_a"), col("id_b")).withColumn("f", lit(1L))
    t.join(f, Seq("id_a", "id_b"), "full_outer")
      .agg(
        sum(coalesce(col("t"), lit(0L))).as("n_true"),
        sum(coalesce(col("f"), lit(0L))).as("n_found"),
        sum(coalesce(col("t"), lit(0L)) * coalesce(col("f"), lit(0L)))
          .as("n_correct"))
  }

  /**
   * Streaming exact dedup for document ingest: keeps the first arrival
   * of each content hash; duplicates arriving within the watermark
   * horizon are dropped. State per retained document is one 16-byte
   * hash (not the text), and the watermark bounds state size — the two
   * properties that make this viable on an unbounded 100 TB ingest
   * stream. Batch dedup over the landed corpus (exact/minhash/simhash)
   * remains the backstop for duplicates farther apart than the
   * watermark; this is the cheap first line at the ingest edge.
   */
  def streamExactDedup(docs: DataFrame, textCol: String, tsCol: String,
                       watermarkDelay: String): DataFrame =
    docs.withColumn("__content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  /**
   * Streaming segment-level dedup at the ingest edge: arriving
   * documents explode into fixed token-window segments and each
   * distinct segment survives only at its first arrival (state = one
   * hash per segment, watermark-bounded like [[streamExactDedup]]).
   * Emits the surviving (id, start, segment) rows — reassembly stays
   * a batch concern ([[segmentDedup]]): an append-mode stream cannot
   * retract text it already emitted for a document.
   */
  def streamSegmentDedup(docs: DataFrame, textCol: String, idCol: String,
                         tsCol: String, watermarkDelay: String,
                         width: Int = 8,
                         portable: Boolean = false): DataFrame =
    docs.select(col(idCol).as("id"), col(tsCol), posexplode(
        TextAnalysis.chunks(col(textCol), width, 0)).as(Seq("ix", "ch")))
      .select(col("id"), col(tsCol), col("ch.start").as("start"),
        col("ch.chunk").as("segment"),
        TextAnalysis.hash60(col("ch.chunk"), portable).as("__seg_hash"))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__seg_hash")
      .drop("__seg_hash")

  /** One stored member of a streaming LSH band bucket (public only
    * because encoder codegen must construct it; internal otherwise).
    * `hs` is the member's distinct shingle-hash set, or its bottom-k
    * (k smallest hashes — a KMV sketch) when the set exceeded
    * `maxStoredHashes` at admission; `n` is the full distinct count,
    * so `n > hs.size` marks a truncated member. */
  case class BucketMember(id: Long, tsMs: Long, hs: Seq[Long], n: Int)
  /** One banded arrival row (encoder-visible, internal otherwise). */
  case class BucketRow(key: String, id: Long,
                       eventTime: java.sql.Timestamp, hs: Seq[Long])
  /** Emitted near-dup pair, ids ordered ascending. */
  case class StreamNearPair(id_a: Long, id_b: Long, jaccard: Double)

  /**
   * Streaming NEAR-dup pair detection over the arrival stream itself —
   * arrivals vs EARLIER ARRIVALS, the stateful sibling of
   * [[screenAgainstCorpus]] (which screens against a frozen corpus)
   * and the near-dup analog of [[streamExactDedup]]. Each arrival's
   * MinHash signature is a per-row column expression (no explode of
   * the corpus, no streaming aggregation); the signature bands into
   * `bands` bucket keys, and each band bucket keeps a bounded state of
   * recent members. An arrival pairs with every stored member of any
   * shared bucket, and the pair is verified by EXACT Jaccard over the
   * stored shingle-hash sets — the batch operator's verification, not
   * a signature estimate, so within the state horizon the emitted
   * pair set EQUALS [[minhashLshPairs]] over the same documents
   * (proven in StreamingSpec).
   *
   * State bounds (the unbounded-ingest contract): per bucket at most
   * `maxPerBucket` members — a hot bucket (the streaming analog of a
   * high-DF shingle) stops ADMITTING members but keeps screening
   * arrivals against the stored ones, mirroring the batch DF cap's
   * skew discipline — each member one (id, ts, shingle-hash set);
   * buckets idle `stateTtlMs` past their newest member expire via
   * event-time timeout. Duplicates farther apart than the horizon
   * remain the batch backstop's job, like every streaming screen
   * here. Band collisions can emit a pair once per shared bucket —
   * `dropDuplicates(id_a, id_b)` downstream, exactly like the batch
   * operator's distinct-before-verify.
   *
   * Per-MEMBER state is bounded too: a stored set is capped at its
   * bottom-`maxStoredHashes` hashes (a KMV sketch — the k smallest of
   * a uniform hash are a uniform sample of the set, the same
   * machinery as [[Sketches.kmvSketches]]), so a pathological long
   * document costs at most `8 * maxStoredHashes` bytes per band
   * instead of its full shingle count. Verification tradeoff,
   * documented: a pair against an UNtruncated member is exact Jaccard
   * (identical to the batch operator); against a truncated member it
   * degrades to the KMV overlap estimate — shared fraction of the k
   * smallest hashes of the union, relative error ~ 1/sqrt(k), k =
   * `maxStoredHashes` — since the true intersection against a
   * subsampled set is unrecoverable. The default cap (4096) keeps
   * every document under ~4k distinct shingles (>= 99% of web-scale
   * corpora) on the exact path.
   */
  def streamNearDedup(docs: DataFrame, textCol: String, idCol: String,
                      tsCol: String, watermarkDelay: String,
                      bands: Int = 4, threshold: Double = 0.5,
                      ngram: Int = 3, portable: Boolean = false,
                      maxPerBucket: Int = 64,
                      stateTtlMs: Long = 3600000L,
                      maxStoredHashes: Int = 4096)
      : org.apache.spark.sql.Dataset[StreamNearPair] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(bands > 0 && MH_PARAMS.length % bands == 0,
      s"bands $bands must divide ${MH_PARAMS.length}")
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = MH_PARAMS.length / bands
    val base = docs
      .withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).cast("long").as("id"),
        col(tsCol).as("eventTime"),
        array_distinct(termHashes(col(textCol), ngram, portable)).as("hs"))
      // empty-shingle docs have no postings in the batch operator and
      // would all collide on the null-signature key here — drop them
      .filter(size(col("hs")) > 0)
      .withColumn("sig", minhashSigFromHashes(col("hs")))
      .select(col("id"), col("eventTime"), col("hs"),
        explode(array((0 until bands).map { b =>
          concat_ws("_", lit(b.toString) +: (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
        }: _*)).as("key"))
      .as[BucketRow]
    base.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(
        (_: String, it: Iterator[BucketRow],
         st: GroupState[Seq[BucketMember]]) => {
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val stored = scala.collection.mutable.ArrayBuffer[BucketMember](
              st.getOption.getOrElse(Seq.empty): _*)
            val out = scala.collection.mutable.ArrayBuffer[StreamNearPair]()
            // arrival order within the batch: event time then id, so
            // same-batch pairs resolve exactly like cross-batch ones
            it.toSeq.sortBy(r => (r.eventTime.getTime, r.id)).foreach { r =>
              val hsSet = r.hs.toSet
              // the arrival's bottom-k, for screening against members
              // stored as KMV sketches (computed once, only if needed)
              lazy val arrBottomK = r.hs.sorted.take(maxStoredHashes)
              stored.foreach { m =>
                if (m.id != r.id) {
                  val j =
                    if (m.n == m.hs.size) {
                      // untruncated member: exact Jaccard, identical
                      // to the batch operator's verification
                      val shared = m.hs.count(hsSet.contains)
                      shared.toDouble / (hsSet.size + m.n - shared)
                    } else {
                      // truncated member: KMV overlap estimate —
                      // shared fraction of the k smallest hashes of
                      // the union of the two bottom-k sketches
                      // (kmvOverlap's jaccard_est, in closure form)
                      val k = m.hs.size
                      val mSet = m.hs.toSet
                      val u = (arrBottomK ++ m.hs).distinct.sorted.take(k)
                      u.count(h => hsSet.contains(h) && mSet.contains(h))
                        .toDouble / u.size
                    }
                  if (j >= threshold)
                    out += StreamNearPair(math.min(m.id, r.id),
                      math.max(m.id, r.id), j)
                }
              }
              if (stored.size < maxPerBucket) {
                val hsStored =
                  if (r.hs.size <= maxStoredHashes) r.hs else arrBottomK
                stored += BucketMember(r.id, r.eventTime.getTime,
                  hsStored, r.hs.size)
              }
            }
            if (stored.isEmpty) st.remove()
            else {
              st.update(stored.toSeq)
              st.setTimeoutTimestamp(math.max(
                stored.map(_.tsMs).max + stateTtlMs,
                st.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
        })
  }

  /**
   * Streaming benchmark decontamination at the ingest edge: flag (and
   * let the caller drop) arriving documents that share any n-gram
   * shingle with a static evaluation corpus. The eval side collapses
   * to ONE broadcast row holding its distinct shingle-hash set — eval
   * sets are tiny next to a 100 TB corpus, so the stream side stays
   * stateless and shuffle-free: per-row shingle hashing plus an
   * `arrays_overlap` probe against the broadcast set, no watermark, no
   * streaming state store. Complements the batch pass
   * ([[decontaminateFromPostings]]), which reports per-doc hit counts.
   */
  def streamDecontaminate(docs: DataFrame, textCol: String,
                          evalDocs: DataFrame, evalTextCol: String,
                          ngram: Int = 3,
                          portable: Boolean = false,
                          maxEvalHashes: Long = 10_000_000L): DataFrame = {
    val evalHashes = evalDocs
      .select(explode(termHashes(col(evalTextCol), ngram, portable)).as("h"))
    // The single-row collect_set below hits the 2 GB row / broadcast
    // ceilings ABRUPTLY if someone feeds a large corpus as the "eval"
    // side; fail fast at setup with an actionable message instead.
    // The eval side is static (batch), so one small count-distinct job
    // here costs nothing against an unbounded stream.
    val nHashes = evalHashes.agg(count_distinct(col("h"))).head.getLong(0)
    require(nHashes <= maxEvalHashes,
      s"streamDecontaminate: eval corpus has $nHashes distinct shingle " +
        s"hashes, above the $maxEvalHashes cap for the single broadcast " +
        "row this operator builds. Use decontaminateFromPostings (batch, " +
        "join-based) for large eval sets, or raise maxEvalHashes.")
    val evalSet = evalHashes
      .agg(collect_set(col("h")).as("__eval_hs"))
      .withColumn("__one", lit(1))
    docs.withColumn("__one", lit(1))
      .join(broadcast(evalSet), Seq("__one"), "left")
      .withColumn("contaminated",
        arrays_overlap(termHashes(col(textCol), ngram, portable),
          col("__eval_hs")))
      .drop("__one", "__eval_hs")
  }

  /**
   * Streaming semantic dedup — [[semDedup]]'s arrival-screening form:
   * each arriving vector is assigned to its coarse cell under FROZEN
   * centroids (the same deterministic quantizer, retrained offline on
   * drift like the PQ codebooks) and joined against only that cell of
   * a static reference corpus; it is flagged a duplicate when any
   * reference neighbor sits at cosine ≥ eps. Stream-static join +
   * broadcast-able reference → STATELESS: no state store, no
   * watermark, no streaming aggregation (the per-arrival verdict is a
   * pure expression over the joined cell array), per-batch cost =
   * |batch| × |cell| cosines. Build the per-cell reference ONCE with
   * [[semDedupRefCells]] from a corpus assigned under the SAME
   * centroids ([[graft.pipeline.Similarity.assignWith]]). Adds
   * (cluster, dup_of, keep) — dup_of = the lowest-id eps-neighbor in
   * the reference, null when kept. NOTE the rule differs from
   * [[semDedup]]'s lower-id-only pairwise rule on purpose: an arrival
   * is a duplicate of ANY reference neighbor (the reference is the
   * already-kept corpus — arrival order, not id order, decides
   * precedence at the ingest edge). Works identically on a batch
   * frame (proven == a Scala brute force of the same any-neighbor
   * rule in StreamingSpec).
   */
  /** The per-cell reference table [[streamSemDedup]] joins against:
    * one row per coarse cell carrying that cell's (id, vec, norm)
    * structs. Built ONCE batch-side from a reference pre-assigned
    * with [[graft.pipeline.Similarity.assignWith]]; cell populations
    * are bounded by the quantizer's k (grow k with the corpus — see
    * SCALING.md), which is what keeps the row arrays broadcast-able. */
  def semDedupRefCells(reference: DataFrame, refVecCol: String,
                       refIdCol: String, refCellCol: String): DataFrame =
    reference
      .select(col(refCellCol).as("cluster"),
        struct(col(refIdCol).cast("long").as("id"),
          col(refVecCol).as("v"),
          graft.functions.VectorMath.normCol(col(refVecCol)).as("nrm"))
          .as("__r"))
      .groupBy("cluster")
      .agg(collect_list(col("__r")).as("__refs"))

  def streamSemDedup(arrivals: DataFrame, vecCol: String, idCol: String,
                     refCells: DataFrame, cents: Seq[Seq[Double]],
                     eps: Double): DataFrame = {
    val assigned = arrivals.withColumn("cluster",
        graft.functions.VectorMath.argminDistCol(col(vecCol), cents))
      .withColumn("__nrm", graft.functions.VectorMath.normCol(col(vecCol)))
    assigned
      .join(broadcast(refCells), Seq("cluster"), "left")
      // lowest-id eps-neighbor in the cell; array_min skips the nulls
      // the non-qualifying entries map to, and a cell with no
      // reference rows (null __refs) propagates to null = keep
      .withColumn("dup_of", array_min(transform(col("__refs"), r =>
        when(r.getField("id") =!= col(idCol).cast("long") &&
            graft.functions.VectorMath.dotCol(col(vecCol), r.getField("v")) /
              (col("__nrm") * r.getField("nrm")) >= eps,
          r.getField("id")))))
      .withColumn("keep", col("dup_of").isNull)
      .drop("__refs", "__nrm")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, blocked by a
    * coarse cell column (IVF-style). Prefer embeddingRhpPairs when no
    * trained/balanced cell assignment exists — a skewed cell column
    * makes the within-cell pair count quadratic. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            cellCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(cellCol).as("cell"),
        col(vecCol).as("vec"))
      .withColumn("nrm", graft.functions.VectorMath.normCol(col("vec")))
    v.as("a").join(v.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cos",
        graft.functions.VectorMath.dotCol(col("a.vec"), col("b.vec")) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /**
   * SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — SEMANTIC
   * deduplication: k-means-cluster the embeddings (deterministic
   * Lloyd, [[graft.pipeline.Similarity.kmeansAssign]]) and, within
   * each cluster, drop every vector that has an eps-or-closer cosine
   * neighbor with a lower id. Unlike the pair detectors this emits a
   * per-vector VERDICT: (id, cluster, keep, dup_of) where `dup_of` is
   * the lowest-id eps-neighbor of a dropped vector (null when kept).
   * The keeper rule is deliberately pairwise, not transitive — chains
   * A~B~C with cos(A,C) < eps keep A only (B, C both see a lower-id
   * neighbor); transitive-closure resolution is
   * [[duplicateClusters]]'s job.
   *
   * Scale shape: the quadratic pair work is confined within clusters,
   * and SemDeDup's own prescription is to grow k with the corpus
   * (the paper runs 50k clusters on LAION) so cell populations stay
   * bounded; the cluster column also blocks the join, so candidates
   * never cross cells. The keep decision is one groupBy(id)->min
   * aggregation plus a left join back — both keyed on id, no window,
   * no global sort. For corpora with pathological cells, cap
   * populations upstream like [[embeddingRhpPairs]]'s maxBucket.
   */
  def semDedup(df: DataFrame, vecCol: String, idCol: String,
               k: Int, iters: Int, eps: Double): DataFrame = {
    val assigned = graft.pipeline.Similarity
      .kmeansAssign(df, vecCol, idCol, k, iters)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cluster"))
      .withColumn("nrm", graft.functions.VectorMath.normCol(col("vec")))
    // lowest-id eps-neighbor per vector, within its cluster only
    val dupOf = assigned.as("x").join(assigned.as("y"),
        col("x.cluster") === col("y.cluster") && col("y.id") < col("x.id"))
      .withColumn("cos",
        graft.functions.VectorMath.dotCol(col("x.vec"), col("y.vec")) /
          (col("x.nrm") * col("y.nrm")))
      .filter(col("cos") >= eps)
      .groupBy(col("x.id").as("id"))
      .agg(min(col("y.id")).as("dup_of"))
    assigned.select(col("id"), col("cluster"))
      .join(dupOf, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("dup_of").isNull.as("keep"),
        col("dup_of"))
  }
}
