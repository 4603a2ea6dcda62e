package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (array<float>).
 *
 *  - brute-force cosine top-k: broadcast the (small) query set, score
 *    the whole corpus in a single codegen'd projection, rank per query.
 *    At 100 TB the corpus side stays partition-parallel; only the
 *    query set is replicated.
 *  - IVF-style top-k: corpus pre-bucketed by a coarse cell id (here
 *    the dataset's cluster label; in production, a k-means assignment
 *    maintained as a column). Probing only the query's cell turns the
 *    scan into a partition-pruned lookup.
 */
object Similarity {

  /** Dot product of two float-array columns in double; sequential fold
    * keeps summation order deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a float-array column. Precompute this per row before a
    * pair join — recomputing it inside the join multiplies the O(dim)
    * work by the pair count. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Fixed-dim dot product as an unrolled index sum. Higher-order
    * functions (aggregate/zip_with) are interpreted — they never enter
    * whole-stage codegen — so on a verify stage touching millions of
    * candidate pairs the lambda interpreter dominates the runtime. The
    * unrolled form is plain codegen'd arithmetic and adds terms in the
    * same left-to-right index order as the sequential fold (0.0 + t0
    * == t0 in IEEE), so results are bit-identical. */
  def dotN(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i =>
      a.getItem(i).cast("double") * b.getItem(i).cast("double")).reduce(_ + _)

  /** Fixed-dim L2 norm, unrolled (see dotN). */
  def normN(a: Column, dim: Int): Column =
    sqrt((0 until dim).map { i =>
      val x = a.getItem(i).cast("double"); x * x
    }.reduce(_ + _))

  /** dot/norm dispatch — now always the native Catalyst expression
    * (graft.functions.VectorMath): one tight static loop inside
    * whole-stage codegen, constant compile size, no interpreted-vs-
    * unrolled regime switch. Identical index-order double accumulation
    * as both legacy forms, so results are bit-for-bit unchanged; the
    * `dim` parameter is retained for API compatibility. */
  private[pipeline] def dotc(a: Column, b: Column, dim: Int): Column =
    graft.functions.VectorMath.dotCol(a, b)
  private[pipeline] def normc(a: Column, dim: Int): Column =
    graft.functions.VectorMath.normCol(a)

  /** L2-normalize a float-array column (unit vector, double
    * components). The production preprocessing step when COSINE is
    * the serving metric but the index ranks by L2 (PQ's ADC): on unit
    * vectors ||a−b||² = 2 − 2·cos(a,b), so L2 order == cosine order
    * and the metric-mismatch recall gap closes (measured in
    * SCALING.md's recall sweep). Zero-vector inputs pass through
    * unscaled rather than dividing by zero. */
  def l2Normalize(vec: Column): Column =
    // the norm binds once per row (TextAnalysis.bindOnce doc):
    // referenced inline, the O(dim) norm re-ran inside every
    // element's division — O(dim^2) per vector
    TextAnalysis.bindOnce(graft.functions.VectorMath.normCol(vec)) { n =>
      transform(vec, x =>
        when(n === 0.0, x.cast("double")).otherwise(x.cast("double") / n))
    }

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorMath.dotCol(a, b) /
      (graft.functions.VectorMath.normCol(a) * graft.functions.VectorMath.normCol(b))

  /**
   * Lloyd's k-means cell assignment — the trained quantizer for real
   * IVF search (vs blocking on a pre-existing label column).
   *
   * Deterministic and engine-reproducible by construction:
   *  - init = the k lowest-id vectors (no RNG);
   *  - squared distances are rounded to 1e-6 BEFORE the argmin (fp
   *    summation order in the centroid averages differs across
   *    engines/partitionings at ~1e-13 — rounding makes that noise
   *    unobservable), ties broken by lowest cluster id;
   *  - an emptied cluster keeps its previous centroid.
   *
   * Each iteration broadcasts k×dim doubles in the plan (centroid
   * literals — no join) and runs one (cluster, dim) aggregation; the
   * corpus is scanned, never shuffled by vector. Returns the input
   * plus a `cluster` column from the final assignment.
   */
  /** Rounded squared-distance columns to each centroid (shared by the
    * argmin assignment and the multi-probe ranking). Distance stays a
    * compact zip_with fold ON PURPOSE: k distance subtrees ride in
    * one array constructor, so an unrolled 64-term tree per distance
    * multiplies into thousands of nodes and Janino compile time
    * dominates (measured 0.55 s → 3.4 s). */
  private def centroidDists(vec: Column,
                            cents: Seq[Seq[Double]]): Seq[(Int, Column)] =
    cents.zipWithIndex.map { case (c, i) =>
      val d = aggregate(
        zip_with(vec, typedlit(c), (a, b) =>
          (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x)
      (i, floor(d * 1e6 + 0.5) / 1e6)
    }

  /** Nearest-centroid assignment — the native argmin expression
    * (graft.functions.VectorMath.argminDistCol): one tight k×dim
    * double loop inside whole-stage codegen, centroid matrix as a
    * codegen reference object. Exact history of why: the original
    * foldRight(when(d === least(allDists))) inlined the k-wide
    * least() into every branch — O(k²·dim) interpreted work per row,
    * measured 10× SLOWER at the paper-prescribed k=64 than at k=4
    * despite 16× fewer candidate pairs; an array_min over
    * (rounded dist, id) structs fixed the quadratic term but still
    * paid k interpreted zip_with folds per row. All three forms are
    * bit-identical (same index-order accumulation, same 1e-6
    * rounding, lowest-id ties). */
  private def assignTo(df: DataFrame, vecCol: String,
                       cents: Seq[Seq[Double]]): DataFrame =
    df.withColumn("cluster",
      graft.functions.VectorMath.argminDistCol(col(vecCol), cents))

  /** Deterministic Lloyd training: k lowest-id vectors seed, `iters`
    * mean updates; emptied clusters keep their centroid. */
  private def trainCentroids(df: DataFrame, vecCol: String, idCol: String,
                             k: Int, iters: Int): Seq[Seq[Double]] = {
    // seed vectors may be float (raw embeddings) or double (residuals)
    var cents: Seq[Seq[Double]] = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue).toSeq).toSeq
    for (_ <- 1 to iters) {
      val perDim = assignTo(df, vecCol, cents)
        .select(col("cluster"), posexplode(col(vecCol)))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("col").cast("double")).as("v"))
        .collect()
      val updated = perDim.groupBy(_.getAs[Int]("cluster")).map { case (c, rows) =>
        c -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("v")).toSeq
      }
      cents = cents.zipWithIndex.map { case (old, i) =>
        updated.getOrElse(i, old) // emptied cluster keeps its centroid
      }
    }
    cents
  }

  def kmeansAssign(df: DataFrame, vecCol: String, idCol: String,
                   k: Int, iters: Int): DataFrame =
    assignTo(df, vecCol, trainCentroids(df, vecCol, idCol, k, iters))

  /** The trained centroid vectors themselves — needed when a caller
    * composes on the quantizer (e.g. residual PQ encodes
    * vec − centroid[cell]). Same deterministic Lloyd discipline as
    * [[kmeansAssign]]. */
  def kmeansCentroids(df: DataFrame, vecCol: String, idCol: String,
                      k: Int, iters: Int): Seq[Seq[Double]] =
    trainCentroids(df, vecCol, idCol, k, iters)

  /** Assignment under given centroids (adds `cluster`) — pairs with
    * [[kmeansCentroids]] so train runs once per session, not once per
    * derived column. */
  def assignWith(df: DataFrame, vecCol: String,
                 cents: Seq[Seq[Double]]): DataFrame =
    assignTo(df, vecCol, cents)

  /** Residual vector (double) w.r.t. the row's coarse cell centroid —
    * the quantity real IVF-PQ encodes: residual magnitudes are much
    * smaller than raw coordinates, so the same codebook budget buys
    * finer resolution. Pure column expression (centroids ride as
    * literals). */
  def residual(vec: Column, cents: Seq[Seq[Double]],
               cell: Column): Column =
    zip_with(vec, element_at(typedlit(cents), cell + 1),
      (a, b) => a.cast("double") - b)

  /**
   * Multi-probe cell lists: the `nprobe` nearest centroids per vector
   * (ordered, ties by centroid id) as a `probes` array column. The IVF
   * recall lever — querying nprobe cells scans nprobe/k of the corpus
   * instead of 1/k while covering boundary vectors whose true
   * neighbors sit in an adjacent cell. Same rounded distances and
   * tie-break as [[kmeansAssign]], so probes.head == cluster.
   */
  def kmeansProbes(df: DataFrame, vecCol: String, idCol: String,
                   k: Int, iters: Int, nprobe: Int): DataFrame =
    probesWith(df, vecCol, trainCentroids(df, vecCol, idCol, k, iters), nprobe)

  /** Probe lists under GIVEN centroids (adds `probes`) — pairs with
    * [[kmeansCentroids]] the way [[assignWith]] does, so a caller
    * composing on the quantizer (residual IVF-PQ) trains once. */
  def probesWith(df: DataFrame, vecCol: String,
                 cents: Seq[Seq[Double]], nprobe: Int): DataFrame = {
    val dists = centroidDists(col(vecCol), cents)
    val ranked = array_sort(array(dists.map { case (i, d) =>
      struct(d.as("d"), lit(i).as("i")) }: _*))
    df.withColumn("probes",
      transform(slice(ranked, 1, nprobe), s => s.getField("i")))
  }

  /** Bounded top-k candidate buffer over (score, id) — the scale-safe
    * replacement for `row_number().over(Window.partitionBy(q_id))`:
    * that window ships EVERY candidate row of a query to one task
    * (O(corpus) rows per query for the brute-force paths), whereas a
    * partial-aggregating buffer capped at k ships at most k pairs per
    * query per map partition. Same ordering contract as the window:
    * best score first (desc for cosine, asc for ADC distance), ties by
    * lowest id, computed on the RAW double score (rounding happens
    * after ranking, as in the oracle). */
  class TopKAgg(k: Int, ascending: Boolean)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] = {
      val byScore =
        if (ascending) Ordering.Double.TotalOrdering
        else Ordering.Double.TotalOrdering.reverse
      Ordering.Tuple2(byScore, Ordering.Long)
    }
    def zero: Seq[(Double, Long)] = Seq.empty
    private def cap(s: Seq[(Double, Long)]) = s.sorted(ord).take(k)
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      cap(b :+ a)
    def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      cap(b1 ++ b2)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** Per-query top-k reduction via [[TopKAgg]]: one hash-partitioned
    * aggregation keyed by the query id, map-side combined, then the
    * ≤k winners explode back out with a 1-based rank. Emits
    * (queryId, corpusId, scoreCol, rank) — identical rows to the
    * window formulation it replaces. */
  private def topKReduce(scored: DataFrame, k: Int,
                         queryId: String, corpusId: String,
                         scoreCol: String, ascending: Boolean): DataFrame = {
    val agg = udaf(new TopKAgg(k, ascending),
      ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy(col(queryId))
      .agg(agg(col(scoreCol).cast("double"), col(corpusId).cast("long"))
        .as("__picks"))
      .select(col(queryId), posexplode(col("__picks")))
      .select(col(queryId), col("col._2").as(corpusId),
        col("col._1").as(scoreCol), (col("pos") + 1).as("rank"))
  }

  /**
   * Brute-force cosine top-k: for each query vector, the k most
   * similar corpus vectors. `queries` is expected to be small (it is
   * broadcast).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusId: String = "vec_id", corpusVec: String = "embedding",
                     queryId: String = "q_id", queryVec: String = "q_vec",
                     dim: Int = 0): DataFrame = {
    val scored = corpus.select(col(corpusId), col(corpusVec))
      .withColumn("__cn", normc(col(corpusVec), dim))
      .crossJoin(broadcast(queries.select(col(queryId), col(queryVec))
        .withColumn("__qn", normc(col(queryVec), dim))))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("cos", dotc(col(corpusVec), col(queryVec), dim) / (col("__cn") * col("__qn")))
    topKReduce(scored, k, queryId, corpusId, "cos", ascending = false)
  }

  /** IVF-style top-k: only corpus vectors in the query's coarse cell
    * are scored (single-probe). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              cellCol: String = "label",
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "q_id", queryVec: String = "q_vec",
              queryCell: String = "q_cell", dim: Int = 0): DataFrame = {
    val scored = corpus.select(col(corpusId), col(corpusVec), col(cellCol))
      .withColumn("__cn", normc(col(corpusVec), dim))
      .join(broadcast(queries.select(col(queryId), col(queryVec), col(queryCell))
          .withColumn("__qn", normc(col(queryVec), dim))),
        col(cellCol) === col(queryCell) && col(corpusId) =!= col(queryId))
      .withColumn("cos", dotc(col(corpusVec), col(queryVec), dim) / (col("__cn") * col("__qn")))
    topKReduce(scored, k, queryId, corpusId, "cos", ascending = false)
  }

  /**
   * Multi-probe IVF top-k: queries carry an array of probe cells
   * (from [[kmeansProbes]]); a corpus vector is a candidate when its
   * cell is in the query's probe list. The probe list lives on the
   * BROADCAST side, so the corpus still streams through once with no
   * shuffle — per-query cost grows to nprobe/k of the corpus, recall
   * covers cell-boundary neighbors single-probe misses.
   */
  def ivfTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
                        cellCol: String = "cluster",
                        corpusId: String = "vec_id",
                        corpusVec: String = "embedding",
                        queryId: String = "q_id", queryVec: String = "q_vec",
                        queryProbes: String = "q_probes",
                        dim: Int = 0): DataFrame = {
    val scored = corpus.select(col(corpusId), col(corpusVec), col(cellCol))
      .withColumn("__cn", normc(col(corpusVec), dim))
      .join(broadcast(queries
          .select(col(queryId), col(queryVec), col(queryProbes))
          .withColumn("__qn", normc(col(queryVec), dim))),
        array_contains(col(queryProbes), col(cellCol)) &&
          col(corpusId) =!= col(queryId))
      .withColumn("cos",
        dotc(col(corpusVec), col(queryVec), dim) / (col("__cn") * col("__qn")))
    topKReduce(scored, k, queryId, corpusId, "cos", ascending = false)
  }

  /**
   * Filtered vector search: each query carries its own metadata
   * constraint — an array of allowed values for a corpus filter
   * column — and only corpus vectors satisfying it compete for the
   * top-k. This is the "filtered ANN" shape production vector stores
   * serve (category-/tenant-/language-scoped retrieval), done as
   * PRE-filtering: the predicate applies before scoring, so the
   * returned k are exact under the constraint (post-filtering an
   * unconstrained top-k can come up short or miss qualifying
   * neighbors entirely).
   *
   * The constraint rides the BROADCAST query side (`array_contains`
   * in the join condition): the corpus streams through exactly once
   * with no shuffle, the scan reads only (id, vec, filter) columns,
   * and the bounded-heap [[TopKAgg]] reduction is unchanged. A
   * corpus-side residency predicate (e.g. a language whitelist shared
   * by all queries) should instead be a plain `.filter` on `corpus`
   * so Catalyst pushes it into the parquet scan; this operator is for
   * the per-query constraint that can't push down.
   */
  def filteredTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   filterCol: String = "label",
                   queryAllowed: String = "q_allowed",
                   corpusId: String = "vec_id", corpusVec: String = "embedding",
                   queryId: String = "q_id", queryVec: String = "q_vec",
                   dim: Int = 0): DataFrame = {
    val scored = corpus.select(col(corpusId), col(corpusVec), col(filterCol))
      .withColumn("__cn", normc(col(corpusVec), dim))
      .join(broadcast(queries
          .select(col(queryId), col(queryVec), col(queryAllowed))
          .withColumn("__qn", normc(col(queryVec), dim))),
        array_contains(col(queryAllowed), col(filterCol)) &&
          col(corpusId) =!= col(queryId))
      .withColumn("cos",
        dotc(col(corpusVec), col(queryVec), dim) / (col("__cn") * col("__qn")))
    topKReduce(scored, k, queryId, corpusId, "cos", ascending = false)
  }

  // ---- Product quantization (PQ / ADC) ------------------------------

  /**
   * Train per-subspace PQ codebooks: the vector splits into `m`
   * contiguous subvectors (dim must divide evenly) and each subspace
   * gets its own deterministic Lloyd codebook of `k` centroids (seeded
   * by the k lowest-id vectors, identical discipline to
   * [[kmeansAssign]] — same 1e-6-rounded distances, same
   * lowest-centroid tie-break, emptied clusters keep their centroid).
   *
   * PQ is the memory/IO lever for ANN at 100 TB: the corpus is stored
   * as m small codes (m bytes at k ≤ 256) instead of dim floats — 32×
   * compression at dim=64/m=2/float32 — and query-time scoring reads
   * ONLY the codes column. The codebooks are k·dim doubles held on the
   * driver (like the IVF centroids): legitimately tiny.
   */
  def pqTrain(df: DataFrame, vecCol: String, idCol: String,
              m: Int, k: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    val dim = df.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      val sliced = df.withColumn("__sub", slice(col(vecCol), s * sub + 1, sub))
      trainCentroids(sliced, "__sub", idCol, k, iters)
    }
  }

  /** Per-subspace argmin code assignment: adds `codes`, an
    * array<int> of length m — the ONLY per-vector state [[pqTopK]]
    * reads. Same rounded-distance/tie-break as [[kmeansAssign]]. */
  def pqEncode(df: DataFrame, vecCol: String,
               codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val sub = codebooks.head.head.size
    val codeCols = codebooks.zipWithIndex.map { case (cents, s) =>
      graft.functions.VectorMath.argminDistCol(
        slice(col(vecCol), s * sub + 1, sub), cents)
    }
    df.withColumn("codes", array(codeCols: _*))
  }

  /**
   * Asymmetric-distance (ADC) top-k: each query scores corpus CODES
   * against its own subvectors — corpus vectors are never read after
   * encoding. Score = Σ over subspaces of the 1e-6-rounded squared L2
   * distance from the query subvector to the code's centroid;
   * ascending, ties by corpus id. The queries (plus the codebook
   * literals inside the projection) broadcast; the codes column
   * streams through one codegen'd stage with no shuffle before the
   * per-query bounded-heap top-k reduction.
   */
  /** The ADC score column: Σ over subspaces of the 1e-6-rounded
    * squared L2 distance from the query subvector to the centroid the
    * corpus row's code names. Pure literal arithmetic — whole-stage
    * codegen'd, no shuffle. */
  private def adcScore(codebooks: Seq[Seq[Seq[Double]]],
                       queryVec: String): Column = {
    val sub = codebooks.head.head.size
    codebooks.zipWithIndex.map { case (cents, s) =>
      val qs = slice(col(queryVec), s * sub + 1, sub)
      val cent = element_at(typedlit(cents), col("codes").getItem(s) + 1)
      val d = aggregate(
        zip_with(qs, cent, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
        lit(0.0), (acc, x) => acc + x)
      floor(d * 1e6 + 0.5) / 1e6
    }.reduce(_ + _)
  }

  def pqTopK(codes: DataFrame, queries: DataFrame, k: Int,
             codebooks: Seq[Seq[Seq[Double]]],
             corpusId: String = "vec_id",
             queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val score = adcScore(codebooks, queryVec)
    val scored = codes.select(col(corpusId), col("codes"))
      .crossJoin(broadcast(queries.select(col(queryId), col(queryVec))))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("adc", score)
    topKReduce(scored, k, queryId, corpusId, "adc", ascending = true)
  }

  /**
   * IVF-PQ top-k: the coarse IVF cell restricts candidates (like
   * [[ivfTopK]]) and PQ asymmetric distance scores them (like
   * [[pqTopK]]) — the composed production ANN design: cell pruning
   * cuts the scan to 1/k of the corpus, PQ codes cut the bytes per
   * scanned row. `codes` must carry the corpus id, `codes` array and
   * the coarse cell column.
   */
  def ivfPqTopK(codes: DataFrame, queries: DataFrame, k: Int,
                codebooks: Seq[Seq[Seq[Double]]],
                cellCol: String = "cluster",
                corpusId: String = "vec_id",
                queryId: String = "q_id", queryVec: String = "q_vec",
                queryCell: String = "q_cell"): DataFrame = {
    val score = adcScore(codebooks, queryVec)
    val scored = codes.select(col(corpusId), col("codes"), col(cellCol))
      .join(broadcast(queries.select(col(queryId), col(queryVec),
          col(queryCell))),
        col(cellCol) === col(queryCell) && col(corpusId) =!= col(queryId))
      .withColumn("adc", score)
    topKReduce(scored, k, queryId, corpusId, "adc", ascending = true)
  }

  /**
   * Multi-probe residual IVF-PQ top-k — the full FAISS-style serving
   * stack in one plan: coarse cells prune candidates, each query
   * probes its `nprobe` nearest cells (probe lists from
   * [[probesWith]]), and PQ codes trained on RESIDUALS score them.
   * The residual is probe-dependent — under probe cell p the query
   * side scores `q_vec − centroid[p]` — so the (tiny, broadcast)
   * query set explodes to one row per probe, each carrying its own
   * residual, while the corpus codes stream through once with no
   * shuffle: a corpus vector lives in exactly one cell, so no probe
   * ever scores the same (query, vector) pair twice and no dedup is
   * needed before the bounded-heap reduction.
   *
   * `codes` must carry the corpus id, the `codes` array (from
   * [[pqEncode]] over residuals) and the coarse cell column; `queries`
   * must carry the RAW query vector plus its probe array.
   */
  def ivfPqTopKMultiProbe(codes: DataFrame, queries: DataFrame, k: Int,
                          codebooks: Seq[Seq[Seq[Double]]],
                          cents: Seq[Seq[Double]],
                          cellCol: String = "cluster",
                          corpusId: String = "vec_id",
                          queryId: String = "q_id",
                          queryVec: String = "q_vec",
                          queryProbes: String = "q_probes"): DataFrame = {
    val probed = queries
      .select(col(queryId), col(queryVec),
        explode(col(queryProbes)).as("__probe"))
      .withColumn("__qres", residual(col(queryVec), cents, col("__probe")))
      .select(col(queryId), col("__probe"), col("__qres"))
    val score = adcScore(codebooks, "__qres")
    val scored = codes.select(col(corpusId), col("codes"), col(cellCol))
      .join(broadcast(probed),
        col(cellCol) === col("__probe") && col(corpusId) =!= col(queryId))
      .withColumn("adc", score)
    topKReduce(scored, k, queryId, corpusId, "adc", ascending = true)
  }

  /**
   * Persist a trained IVF-PQ index — the production ANN lifecycle the
   * per-query paths (s08–s11) fold into one plan: train the coarse
   * quantizer and the PQ codebooks ONCE, encode the corpus ONCE, and
   * store the serving state as a parquet codes table
   * (id, cell, codes — m small ints per vector) plus a tiny JSON
   * sidecar holding the centroids/codebooks. Every query thereafter
   * reads ONLY the index: no float vectors, no training pass. At
   * 100 TB this is the amortization that makes PQ serving real — the
   * index build is one pass over the corpus, and the per-query cost
   * is a codes-only scan of the probed cells.
   */
  def writePqIndex(df: DataFrame, vecCol: String, idCol: String,
                   dir: String, kCells: Int, m: Int, k: Int,
                   iters: Int): Unit = {
    val cents = trainCentroids(df, vecCol, idCol, kCells, iters)
    val books = pqTrain(df, vecCol, idCol, m, k, iters)
    // the codes table is PARTITIONED by the coarse cell: a query's
    // probed cells become directory pruning (static or via dynamic
    // partition pruning through the broadcast join), so serving reads
    // nprobe/kCells of the index files, not all of them
    pqEncode(assignTo(df, vecCol, cents), vecCol, books)
      .select(col(idCol), col("cluster"), col("codes"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$dir/codes")
    // sidecar JSON, hand-rendered: Double.toString round-trips the
    // binary value exactly, so reload reproduces training bit-for-bit
    def a2(x: Seq[Seq[Double]]) =
      x.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    val json = s"""{"cents":${a2(cents)},""" +
      s""""books":${books.map(a2).mkString("[", ",", "]")}}"""
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** A reloaded IVF-PQ index: the codes table plus the coarse
    * centroids and per-subspace codebooks from the sidecar. */
  case class PqIndex(codes: DataFrame, cents: Seq[Seq[Double]],
                     books: Seq[Seq[Seq[Double]]])

  def readPqIndex(spark: org.apache.spark.sql.SparkSession,
                  dir: String): PqIndex = {
    import scala.jdk.CollectionConverters._
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def a2(n: com.fasterxml.jackson.databind.JsonNode): Seq[Seq[Double]] =
      n.elements().asScala.map(
        _.elements().asScala.map(_.asDouble).toSeq).toSeq
    PqIndex(spark.read.parquet(s"$dir/codes"), a2(root.get("cents")),
      root.get("books").elements().asScala.map(a2).toSeq)
  }

  /** Append new vectors to a stored index WITHOUT retraining: assign
    * them to coarse cells and encode them under the index's existing
    * centroids/codebooks (the production ingest path — codebooks are
    * retrained offline on drift, not per arrival), appending the new
    * (id, cell, codes) rows to the codes table. Works identically for
    * a batch or a `foreachBatch` streaming sink: encoding is a pure
    * per-row projection with the codebooks as broadcast literals —
    * stateless, shuffle-free. */
  def appendToPqIndex(df: DataFrame, vecCol: String, idCol: String,
                      dir: String): Unit = {
    val idx = readPqIndex(df.sparkSession, dir)
    val idName = idx.codes.columns.filter(c =>
      c != "cluster" && c != "codes").head
    pqEncode(assignTo(df, vecCol, idx.cents), vecCol, idx.books)
      .select(col(idCol).as(idName), col("cluster"), col("codes"))
      .write.mode("append").partitionBy("cluster").parquet(s"$dir/codes")
  }

  /** Serve top-k from a stored index: queries are assigned to their
    * coarse cell with the sidecar centroids (same rounded-distance
    * discipline as training) and scored by cell-pruned ADC over the
    * codes table — [[ivfPqTopK]] fed entirely from disk state. */
  def pqIndexTopK(index: PqIndex, queries: DataFrame, k: Int,
                  queryId: String = "q_id", queryVec: String = "q_vec",
                  corpusId: String = "vec_id"): DataFrame = {
    val q = assignTo(queries, queryVec, index.cents)
      .withColumnRenamed("cluster", "q_cell")
    ivfPqTopK(index.codes, q, k, index.books, corpusId = corpusId,
      queryId = queryId, queryVec = queryVec)
  }

  /**
   * Scalar-quantizer training (FAISS IndexScalarQuantizer QT_8bit):
   * per-dimension (min, range) bounds from one aggregation pass —
   * 2×dim values, legitimately driver-sized like the k-means
   * centroids. No iterations: SQ training is one scan, the cheap end
   * of the quantizer family (PQ pays Lloyd rounds for better
   * distortion at the same bit budget).
   */
  def sqTrain(df: DataFrame, vecCol: String,
              dim: Int): Seq[(Double, Double)] = {
    val aggs = (0 until dim).flatMap { d =>
      val x = element_at(col(vecCol), d + 1).cast("double")
      Seq(min(x).as(s"mn$d"), max(x).as(s"mx$d"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    (0 until dim).map { d =>
      val mn = r.getDouble(2 * d); val mx = r.getDouble(2 * d + 1)
      (mn, mx - mn)
    }
  }

  /** 8-bit scalar encode: code_d = floor((x_d − min_d)/range_d · 255
    * + 0.5) — 4× less scan I/O than float32 vectors, no codebook.
    * floor(+0.5), not round(): bit-identical across engines (the
    * round() half-case discipline used throughout the oracles).
    * Zero-range dims encode 0. In-domain inputs land in [0, 255] by
    * construction; out-of-domain encode (an arrival beyond the
    * trained bounds) should clamp — arrivals here are the trained
    * corpus, so the clamp is omitted from the hot expression. */
  def sqEncode(df: DataFrame, vecCol: String,
               bounds: Seq[(Double, Double)]): DataFrame = {
    val b = typedlit(bounds.map { case (mn, sc) => Seq(mn, sc) })
    df.withColumn("codes",
      zip_with(col(vecCol), b, (x, ms) => {
        val sc = element_at(ms, 2)
        when(sc === 0.0, lit(0))
          .otherwise(floor((x.cast("double") - element_at(ms, 1)) / sc
            * 255.0 + 0.5).cast("int"))
      }))
  }

  /**
   * SQ8 asymmetric top-k: the query stays full-precision, corpus
   * codes decode on the fly (x̂_d = min_d + code_d/255 · range_d) and
   * score squared-L2 — the third compression family next to PQ ADC
   * (s08) and the float scan (s01): 4× less corpus I/O, zero
   * training iterations, distortion bounded by range/255 per dim.
   * Same scale shape as the siblings: queries broadcast, codes
   * stream once, bounded-heap reduction. Composes with the IVF cell
   * restriction the same way pqTopK does.
   */
  def sqTopK(codes: DataFrame, queries: DataFrame, k: Int,
             bounds: Seq[(Double, Double)],
             corpusId: String = "vec_id",
             queryId: String = "q_id", queryVec: String = "q_vec"): DataFrame = {
    val b = typedlit(bounds.map { case (mn, sc) => Seq(mn, sc) })
    val decoded = zip_with(col("codes"), b, (c, ms) =>
      element_at(ms, 1) + c.cast("double") / 255.0 * element_at(ms, 2))
    val d = aggregate(
      zip_with(col(queryVec), col("__dec"), (a, x) =>
        (a.cast("double") - x) * (a.cast("double") - x)),
      lit(0.0), (acc, x) => acc + x)
    // decode is bound to a column BEFORE the query cross join, so the
    // scoring lambda consumes a bound reference instead of carrying
    // the decode subtree (the inline-HOF trap from SCALING.md's d15
    // post-mortem). NB: with a single downstream consumer Catalyst's
    // CollapseProject may still inline it across the join — per-pair
    // decode is unmeasurable at bench |Q|; a huge query set would
    // want a materialization barrier on the decoded codes instead
    val scored = codes.select(col(corpusId), col("codes"))
      .withColumn("__dec", decoded)
      .crossJoin(broadcast(queries.select(col(queryId), col(queryVec))))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("sqd", floor(d * 1e6 + 0.5) / 1e6)
    topKReduce(scored, k, queryId, corpusId, "sqd", ascending = true)
  }

  /**
   * IVF-SQ8 top-k (FAISS IndexIVFScalarQuantizer): the coarse cell
   * restricts candidates (like [[ivfTopK]]) and SQ8 asymmetric
   * decode-on-scan scores them (like [[sqTopK]]) — completing the
   * quantizer × cell-pruning matrix next to IVF-PQ (s09): same 1/k
   * scan cut from the cells, 4× less I/O per scanned row from the
   * byte codes, zero codebook training beyond the coarse quantizer.
   * `codes` must carry the corpus id, the SQ `codes` array and the
   * coarse cell column; queries broadcast with their cell, the codes
   * stream through one codegen'd stage, bounded-heap reduction.
   */
  def ivfSqTopK(codes: DataFrame, queries: DataFrame, k: Int,
                bounds: Seq[(Double, Double)],
                cellCol: String = "cluster",
                corpusId: String = "vec_id",
                queryId: String = "q_id", queryVec: String = "q_vec",
                queryCell: String = "q_cell"): DataFrame = {
    val b = typedlit(bounds.map { case (mn, sc) => Seq(mn, sc) })
    val decoded = zip_with(col("codes"), b, (c, ms) =>
      element_at(ms, 1) + c.cast("double") / 255.0 * element_at(ms, 2))
    val d = aggregate(
      zip_with(col(queryVec), col("__dec"), (a, x) =>
        (a.cast("double") - x) * (a.cast("double") - x)),
      lit(0.0), (acc, x) => acc + x)
    val scored = codes.select(col(corpusId), col("codes"), col(cellCol))
      .withColumn("__dec", decoded)
      .join(broadcast(queries.select(col(queryId), col(queryVec),
          col(queryCell))),
        col(cellCol) === col(queryCell) && col(corpusId) =!= col(queryId))
      .withColumn("sqd", floor(d * 1e6 + 0.5) / 1e6)
    topKReduce(scored, k, queryId, corpusId, "sqd", ascending = true)
  }

  /**
   * Exact re-ranking refine over an ANN shortlist — the FAISS
   * `IndexRefineFlat` pattern: any approximate top-R result (ADC,
   * IVF, RHP) is re-scored with EXACT cosine against the full float
   * vectors and the true top-k of the shortlist kept. This is how
   * production stacks buy back the PQ quantization error measured in
   * SCALING.md's recall table: the quantized scan proposes R ≥ k
   * candidates cheaply, the refine pays full-precision math on only
   * |queries|×R rows.
   *
   * Scale shape: `shortlist` (q_id, vec_id pairs, ≤ R per query) is
   * tiny and broadcasts into a semi-join against the corpus, so the
   * float vectors of non-candidates are never deserialized, let alone
   * shuffled; queries broadcast as everywhere else in this family;
   * the final reduction is the bounded-heap [[TopKAgg]].
   */
  def refineTopK(shortlist: DataFrame, corpus: DataFrame,
                 queries: DataFrame, k: Int,
                 corpusId: String = "vec_id",
                 corpusVec: String = "embedding",
                 queryId: String = "q_id",
                 queryVec: String = "q_vec"): DataFrame = {
    val cand = corpus.select(col(corpusId), col(corpusVec))
      .join(broadcast(shortlist.select(col(queryId), col(corpusId))),
        Seq(corpusId))
    val scored = cand
      .join(broadcast(queries.select(col(queryId), col(queryVec))
        .withColumn("__qn", normc(col(queryVec), 0))), Seq(queryId))
      .withColumn("cos",
        dotc(col(corpusVec), col(queryVec), 0) /
          (normc(col(corpusVec), 0) * col("__qn")))
    topKReduce(scored, k, queryId, corpusId, "cos", ascending = false)
  }

  /**
   * Recall@k — the standard ANN quality harness: per query,
   * |approx ∩ exact| / |exact| against the exact top-k ground truth.
   * A production ANN deployment runs this continuously (sampled
   * queries vs a brute-force pass) to decide when nprobe/codebooks
   * need retuning. One (query, id) equi-join + per-query aggregation:
   * linear in k×queries, no windows, ground truth is the expensive
   * side and is typically sampled.
   */
  def annRecall(exact: DataFrame, approx: DataFrame,
                queryId: String = "q_id",
                corpusId: String = "vec_id"): DataFrame =
    exact.select(col(queryId), col(corpusId))
      .join(approx.select(col(queryId), col(corpusId))
          .withColumn("__m", lit(1)),
        Seq(queryId, corpusId), "left")
      .groupBy(col(queryId))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__m"), lit(0))).as("n_match"))
      .withColumn("recall",
        col("n_match").cast("double") / col("n_exact"))

  /**
   * Graded ranking-quality evaluation — nDCG@k and MRR per query —
   * of a retrieval result list against ground-truth relevance: the
   * ORDER-sensitive complement of [[annRecall]] (recall@k cannot see
   * that the best hit ranks 5th instead of 1st; a retrieval-backed
   * training pipeline tunes on exactly that difference).
   *
   *   DCG@k  = Σ_{r ≤ k} rel(doc at rank r) / log2(r + 1)
   *   IDCG@k = the same sum over the k most relevant judged docs
   *            (ties broken on id, so the ideal is deterministic)
   *   nDCG   = DCG / IDCG (0 when the query has no judged-relevant
   *            docs); MRR = 1 / first rank holding rel > 0 (0 if the
   *            list holds none).
   *
   * Unjudged retrieved docs score rel = 0 (the standard convention).
   * The output is TRUTH-driven like the sibling [[annRecall]]: every
   * query appearing in either input emits a row, so a query whose
   * retrieval returned nothing (or nothing within k) scores
   * ndcg=0/mrr=0 instead of silently dropping out — a macro-average
   * over the output never overstates quality. Duplicate (query, doc)
   * judgment rows pre-merge to their max relevance, so a sloppy
   * judgment file cannot double-count a doc in DCG or inflate IDCG.
   * Scale shape: both inputs are per-query bounded lists (≤ k rows
   * and the judgment set), so the joins and every aggregation
   * (including the dedup) key on the high-cardinality query id; the
   * ideal-ranking window partitions by query over those bounded
   * judgment rows — no global sort, nothing data-sized.
   */
  def rankingEval(approx: DataFrame, truth: DataFrame, k: Int,
                  queryId: String = "q_id", corpusId: String = "vec_id",
                  relCol: String = "rel", rankCol: String = "rank")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = truth.select(col(queryId), col(corpusId),
        col(relCol).cast("double").as("__rel"))
      .groupBy(col(queryId), col(corpusId))
      .agg(max(col("__rel")).as("__rel"))
    val retrieved = approx.filter(col(rankCol) <= k)
      .select(col(queryId), col(corpusId), col(rankCol))
    val got = retrieved
      .join(t, Seq(queryId, corpusId), "left")
      .na.fill(0.0, Seq("__rel"))
      .groupBy(col(queryId))
      .agg(sum(col("__rel") / log2(col(rankCol).cast("double") + 1))
          .as("dcg"),
        min(when(col("__rel") > 0, col(rankCol))).as("__first"))
    val ideal = t.filter(col("__rel") > 0)
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(queryId))
          .orderBy(col("__rel").desc, col(corpusId))))
      .filter(col("__i") <= k)
      .groupBy(col(queryId))
      .agg(sum(col("__rel") / log2(col("__i").cast("double") + 1))
        .as("idcg"))
    val spine = t.select(col(queryId))
      .unionByName(retrieved.select(col(queryId))).distinct()
    spine.join(got, Seq(queryId), "left")
      .join(ideal, Seq(queryId), "left")
      .select(col(queryId),
        coalesce(col("dcg") / col("idcg"), lit(0.0)).as("ndcg"),
        coalesce(lit(1.0) / col("__first"), lit(0.0)).as("mrr"))
  }

  /**
   * ANN top-k via multi-table random-hyperplane LSH: only corpus
   * vectors sharing a bucket with the query (in any of `tables`
   * independent tables) are scored — the trained-quantizer-free scale
   * path next to ivfTopK. Candidates dedup on ids before vectors are
   * joined back, so the distinct never shuffles embedding arrays.
   * Approximate by construction: recall grows with `tables`
   * (OR-amplification) and with `probeHamming` (multi-probe).
   *
   * probeHamming = 1 additionally probes every bucket one bit-flip
   * away from the query's bucket (nBits extra probes per table) — the
   * classic multi-probe LSH recall knob. The expansion happens on the
   * QUERY side only, which is broadcast anyway: corpus cost is
   * unchanged, candidate count grows with the probed buckets'
   * population. A vector near a hyperplane lands on its far side in
   * some tables; flip-1 probes recover exactly those misses.
   */
  def rhpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nBits: Int, dim: Int, tables: Int,
              corpusId: String = "vec_id", corpusVec: String = "embedding",
              queryId: String = "q_id", queryVec: String = "q_vec",
              probeHamming: Int = 0): DataFrame = {
    require(probeHamming <= 1, "only Hamming-1 multi-probe is implemented")
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(col(id), posexplode(array((0 until tables).map(t =>
          graft.functions.VectorMath.rhpBucketCol(
            col(vec), nBits, dim, t * nBits)): _*)))
        .select(col(id), col("pos").as("t"), col("col").as("bkt"))
    val cb = bucketed(corpus, corpusId, corpusVec)
    val qb0 = bucketed(queries, queryId, queryVec)
    val qb = if (probeHamming <= 0) qb0
      else qb0.select(col(queryId), col("t"),
        explode(array((0 to nBits).map {
          case 0 => col("bkt")
          case j => col("bkt").bitwiseXOR(lit(1L << (j - 1)))
        }: _*)).as("bkt"))
    val cand = cb.join(broadcast(qb),
        cb("t") === qb("t") && cb("bkt") === qb("bkt") &&
          col(corpusId) =!= col(queryId))
      .select(col(queryId), col(corpusId)).distinct()
    val scored = cand
      .join(corpus.select(col(corpusId), col(corpusVec))
        .withColumn("__cn", norm(col(corpusVec))), corpusId)
      .join(broadcast(queries.select(col(queryId), col(queryVec))
        .withColumn("__qn", norm(col(queryVec)))), queryId)
      .withColumn("cos",
        dot(col(corpusVec), col(queryVec)) / (col("__cn") * col("__qn")))
    topKReduce(scored, k, queryId, corpusId, "cos", ascending = false)
  }

  /** Sign (±1) of component j of deterministic pseudo-hyperplane p —
    * shared by the Column implementation and oracle-SQL generation. */
  def rhpSign(p: Int, j: Int): Double =
    if (((p * 1103515245L + j * 12345L) >> 16) % 2 == 0) 1.0 else -1.0

  /** Random-hyperplane LSH bucket id (nBits-bit signature) from
    * deterministic pseudo-hyperplanes: component j of plane
    * (planeOffset + b) has sign rhpSign. Used to bucket a corpus for
    * ANN without a trained quantizer; distinct planeOffsets give
    * independent hash tables for OR-amplified (multi-table) LSH. */
  def rhpBucket(vec: Column, nBits: Int, dim: Int, planeOffset: Int = 0): Column = {
    val planes = (0 until nBits).map { b =>
      val p = planeOffset + b
      // sign vector as an array literal + zip_with fold: compact codegen
      // (an unrolled dim-term sum blows the 64 KB JVM method limit and
      // drops the whole stage out of codegen). The sequential fold adds
      // terms in index order — the same IEEE order as the oracle SQL.
      val signs = typedlit((0 until dim).map(j => rhpSign(p, j)))
      val dots = aggregate(
        zip_with(vec, signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(dots >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a + b)
  }

  /** rhpBucket with the per-plane dot unrolled to ±vec[j] terms (the
    * sign is a compile-time constant, so x*s becomes x or -x — exact in
    * IEEE). Same left-to-right order as the zip_with fold → identical
    * buckets; plain arithmetic instead of interpreted lambdas. Emit ONE
    * bucket expression per projection column (each nBits×dim terms) so
    * codegen's per-expression method splitting keeps methods under the
    * JVM limit — packing all tables into a single array() constructor
    * is what used to blow it. */
  def rhpBucketN(vec: Column, nBits: Int, dim: Int, planeOffset: Int = 0): Column = {
    val planes = (0 until nBits).map { b =>
      val p = planeOffset + b
      val dots = (0 until dim).map { j =>
        val x = vec.getItem(j).cast("double")
        if (rhpSign(p, j) > 0) x else -x
      }.reduce(_ + _)
      when(dots >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    planes.reduce((a, b) => a + b)
  }

  // ------------------------------------------------ lexical retrieval

  /**
   * Okapi BM25 top-k — the lexical half of hybrid retrieval (the
   * other half is any of the vector top-k forms above). Distinct
   * query terms score each document
   * `idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with
   * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))` (the non-negative
   * Lucene variant).
   *
   * Scale shape: one token explode feeds both the (id, term) tf
   * aggregation and the per-doc length (a second agg on the same
   * partitioning); df is vocabulary-sized with map-side combine;
   * N/avgdl ride a broadcast 1-row aggregate (never a driver count);
   * the query-term dim joins df FIRST (vocabulary join pruned to
   * |query terms| rows) and the result broadcasts into the tf table —
   * the corpus is scanned once and shuffled only on (id, term)/(id),
   * exactly the postings discipline of the dedup family. Per-(q,d)
   * scores fold the per-term contributions in SORTED term order (a
   * sequential IEEE sum the oracle mirrors with an ordered list_sum),
   * so scores are bit-deterministic; ties rank by doc id ([[TopKAgg]]).
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               textCol: String = "text", idCol: String = "doc_id",
               queryId: String = "q_id", queryText: String = "q_text",
               k1: Double = 1.2, b: Double = 0.75,
               excludeSelf: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    // persisted (generation-bounded ownership): the tf table is the
    // BM25 analog of the dedup family's postings — read THREE times
    // (doc lengths, document frequencies, the scoring join), and every
    // uncached replay re-pays the tokenize+explode corpus scan
    val Seq(tf) = graft.util.Caching.persistOwned("Similarity.bm25TopK",
      toks.groupBy("id", "term").agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // integer total/count → avgdl division is engine-deterministic
    val stats = dl.agg(sum("dl").as("__tok"), count(lit(1)).as("__n"))
    val qterms = queries.select(col(queryId).cast("long").as(queryId),
      explode(array_distinct(TextAnalysis.tokens(col(queryText))))
        .as("term"))
    val qidf = dfT.join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .select(col(queryId), col("term"),
        log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).as("idf"),
        (col("__tok").cast("double") / col("__n")).as("avgdl"))
    val scoredTerms = tf.join(broadcast(qidf), "term")
      .join(dl, "id")
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
    val filtered =
      if (excludeSelf) scoredTerms.filter(col("id") =!= col(queryId))
      else scoredTerms
    val scored = filtered.groupBy(col(queryId), col("id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("contrib")))),
        lit(0.0), (acc, x) => acc + x.getField("contrib")).as("bm25"))
    topKReduce(scored, k, queryId, "id", "bm25", ascending = false)
  }

  /**
   * Reciprocal-rank fusion of ranked lists (Cormack et al. 2009):
   * `rrf(d) = Σ_r 1/(kRrf + rank_r(d))` over the rankers that
   * returned d — the standard score-free way to combine a lexical
   * (BM25) and a vector (cosine/ANN) ranking into one hybrid list,
   * robust to incomparable score scales. Input lists are already
   * bounded (top-k per query per ranker), so the fusion works on
   * |Q|·k·|rankers| rows — a rounding error at any corpus scale; the
   * contributions fold in ranker order (sequential IEEE sum, oracle-
   * mirrored), ties rank by doc id.
   */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60,
              queryId: String = "q_id", docId: String = "id"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(queryId), col(docId).cast("long").as("__doc"),
        col("rank").cast("int").as("__rank"), lit(i).as("__ranker"))
    }.reduce(_ unionByName _)
    val fused = tagged.groupBy(col(queryId), col("__doc"))
      .agg(aggregate(
          array_sort(collect_list(struct(col("__ranker"), col("__rank")))),
          lit(0.0),
          (acc, x) => acc + lit(1.0) / (lit(kRrf) + x.getField("__rank")))
        .as("rrf"),
        count(lit(1)).as("n_rankers"))
    topKReduce(fused.withColumnRenamed("__doc", docId), k,
        queryId, docId, "rrf", ascending = false)
      .join(fused.withColumnRenamed("__doc", docId)
          .select(col(queryId), col(docId), col("n_rankers")),
        Seq(queryId, docId))
  }
}
