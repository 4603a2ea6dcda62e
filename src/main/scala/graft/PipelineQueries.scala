package graft

import graft.pipeline._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data pipeline queries over the `documents` and `embeddings`
 * tables: dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash /
 * embedding), similarity search (brute-force + IVF top-k), text
 * analysis (stats, language ID, fingerprints) and multimodal column
 * plumbing. Same conventions as the TSDB queries: matching column
 * names, floor-based 4-decimal rounding, deterministic ORDER BY.
 */
object PipelineQueries {

  private def r4(c: Column): Column =
    signum(c) * floor(abs(c) * 10000d + 0.5d) / 10000d

  /** documents arrives as a single parquet file → one partition; the
    * per-row work downstream (regex tokenize, shingle, md5) is CPU-
    * bound, so spread it across the cluster first. On a real multi-file
    * 100 TB table this is a no-op decision — input splits already
    * parallelize — hence the small-input guard. */
  private def docs(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
    // inputFiles reads the file index only — no RDD lineage instantiated
    if (d.inputFiles.length < s.sparkContext.defaultParallelism)
      d.repartition(s.sparkContext.defaultParallelism)
    else d
  }

  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Per-session cache of the dedup family's shared (id, h) postings —
    * the tokenize+md5 scan is the dominant cost of every dedup pass,
    * and a pipeline running several passes materializes it once
    * (Dedup.hashedPostings doc). Keyed by (bits, dir); rebuilt when the
    * session changes. */
  private val postCache = scala.collection.concurrent.TrieMap
    .empty[(Int, String), (SparkSession, DataFrame)]

  private def sharedPostings(s: SparkSession, dir: String, bits: Int): DataFrame =
    postCache.get((bits, dir)) match {
      // a memo hit is only valid while its cached blocks still exist:
      // /api/dropcaches (or any external clearCache) unpersists behind
      // the memo's back, and serving the stale DataFrame would replay
      // the full recompute on EVERY downstream read without ever
      // re-persisting — measured as a 3-4x slowdown on the dedup family
      case Some((sess, df)) if (sess eq s) &&
          df.storageLevel != org.apache.spark.storage.StorageLevel.NONE => df
      case _ =>
        val df = bits match {
          case 60 =>
            // pre-partition by doc id: the signature/size aggregations
            // and the verify joins all key on id, so they reuse this
            // hash partitioning with no further exchange of the postings
            Dedup.hashedPostings(docs(s, dir), "text", "doc_id",
                ngram = 3, portable = true, bits = 60)
              .repartition(col("id"))
          case 32 =>
            // h32 = h60 mod 2^32 by construction (TextAnalysis.h32), so
            // the 32-bit postings DERIVE from the 60-bit scan: one
            // tokenize+md5 pass over the corpus feeds the whole dedup
            // family. dropDuplicates collapses post-mod collisions
            // exactly like hashedPostings' per-doc array_distinct, and
            // runs exchange-free on the inherited id partitioning.
            sharedPostings(s, dir, 60)
              .select(col("id"), (col("h") % 4294967296L).as("h"))
              .dropDuplicates("id", "h")
          case other => throw new IllegalArgumentException(s"bits $other")
        }
        // unconditional persist: shared by 4+ queries of the dedup
        // family and the tokenize+hash recompute is CPU-dense (a
        // bytes-based size estimate undercounts an exploded postings
        // table by the shingle factor)
        val persisted = df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        postCache.put((bits, dir), (s, persisted))
        persisted
    }

  /** Per-session cache of the simhash near-dup pair list — d06 reports
    * the pairs and d07 clusters them; one banded self-join feeds both
    * (the same share-the-intermediate pattern as sharedPostings). The
    * pair list is persisted via generation-bounded ownership so the
    * second consumer reads the cache instead of replaying the
    * signature aggregation and band join. */
  private val simhashPairsCache = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, DataFrame)]

  private def sharedSimhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairsCache.get(dir) match {
      // a memo hit is only valid while its cached blocks still exist:
      // /api/dropcaches (or any external clearCache) unpersists behind
      // the memo's back, and serving the stale DataFrame would replay
      // the full recompute on EVERY downstream read without ever
      // re-persisting — measured as a 3-4x slowdown on the dedup family
      case Some((sess, df)) if (sess eq s) &&
          df.storageLevel != org.apache.spark.storage.StorageLevel.NONE => df
      case _ =>
        val Seq(df) = graft.util.Caching.persistOwned(
          "PipelineQueries.sharedSimhashPairs",
          Dedup.simhashPairsFromPostings(sharedPostings(s, dir, 60),
            maxHamming = 3, bands = 4))
        simhashPairsCache.put(dir, (s, df))
        df
    }

  /** Per-session cache of the MinHash-LSH verified pair list — d03
    * reports it and d09 evaluates it against exact truth; one
    * signature+banding+verify pipeline feeds both. */
  private val lshPairsCache = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, DataFrame)]

  private def sharedLshPairs(s: SparkSession, dir: String): DataFrame =
    lshPairsCache.get(dir) match {
      // a memo hit is only valid while its cached blocks still exist:
      // /api/dropcaches (or any external clearCache) unpersists behind
      // the memo's back, and serving the stale DataFrame would replay
      // the full recompute on EVERY downstream read without ever
      // re-persisting — measured as a 3-4x slowdown on the dedup family
      case Some((sess, df)) if (sess eq s) &&
          df.storageLevel != org.apache.spark.storage.StorageLevel.NONE => df
      case _ =>
        val Seq(df) = graft.util.Caching.persistOwned(
          "PipelineQueries.sharedLshPairs",
          Dedup.minhashLshFromPostings(sharedPostings(s, dir, 32),
            bands = 4, threshold = 0.5))
        lshPairsCache.put(dir, (s, df))
        df
    }

  /** DuckDB mirror of TextAnalysis.tokens / shingles(3) over documents. */
  private val O_SH =
    """WITH toks AS (
         SELECT doc_id, lang, text,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS tk
         FROM documents),
       sh AS (
         SELECT doc_id, CASE WHEN len(tk) >= 3
           THEN list_distinct(list_transform(range(len(tk) - 2),
             i -> tk[CAST(i AS INT) + 1] || ' ' || tk[CAST(i AS INT) + 2]
               || ' ' || tk[CAST(i AS INT) + 3]))
           ELSE [array_to_string(tk, ' ')] END AS sh
         FROM toks),
       post AS (SELECT doc_id, unnest(sh) AS term FROM sh)"""

  /** DuckDB mirror of TextAnalysis.h32. */
  /** Fixed merge list for the BPE apply query (t22) — in training
    * order; covers the synthetic corpus's frequent bigrams. The
    * replace-chain oracle is exact on this corpus because no
    * vocabulary word repeats a merge pair back-to-back (no `thth`,
    * `anan`, … — verified against the generator's 31-word vocab);
    * the Scala side handles such chains correctly in general. */
  private val BPE_MERGES: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "s" -> "c", "a" -> "n",
    "e" -> "r", "o" -> "r")

  private def oH32(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT) % 4294967296"

  /** DuckDB mirror of Similarity.bm25TopK over documents with the
    * s19/s20 query set (first 6 tokens of docs 0/150/300, self
    * excluded): ends at the `bm25_ranked` CTE. Constants are written
    * as the SAME arithmetic the Scala side compiles (`1.2 + 1`, not
    * `2.2` — the two differ in the last bit), and per-(q,d) sums fold
    * in sorted term order via an ordered list, so scores are
    * bit-identical across engines. */
  private lazy val O_BM25: String =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '') AS tk
         FROM documents),
       tf AS (
         SELECT doc_id, t AS term, count(*) AS tf
         FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY 1, 2),
       dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       stats AS (SELECT sum(dl) AS tok, count(*) AS n FROM dl),
       qt AS (
         SELECT doc_id AS q_id, unnest(list_distinct(tk[1:6])) AS term
         FROM toks WHERE doc_id IN (0, 150, 300)),
       qidf AS (
         SELECT q_id, term,
           ln(1.0 + (n - df + 0.5) / (df + 0.5)) AS idf,
           CAST(tok AS DOUBLE) / n AS avgdl
         FROM dfq JOIN qt USING (term) CROSS JOIN stats),
       contrib AS (
         SELECT q_id, tf.doc_id, term,
           idf * (tf * (1.2 + 1)) /
             (tf + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl))) AS c
         FROM tf JOIN qidf USING (term) JOIN dl ON dl.doc_id = tf.doc_id
         WHERE tf.doc_id <> q_id),
       bm25_scored AS (
         SELECT q_id, doc_id, list_sum(list(c ORDER BY term)) AS bm25
         FROM contrib GROUP BY 1, 2),
       bm25_ranked AS (
         SELECT q_id, doc_id, bm25, row_number() OVER
           (PARTITION BY q_id ORDER BY bm25 DESC, doc_id) AS rank
         FROM bm25_scored)"""

  /** DuckDB formulation of the MinHash-LSH verified pair list (4 bands
    * × 2 rows, threshold 0.5, 32-bit hashes) — the shared oracle of the
    * batch (d03) and streaming (d20) forms, which provably agree inside
    * the streaming state horizon. */
  private lazy val oLshPairsSql: String =
    s"""$O_SH,
       hpost AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
       params AS (SELECT * FROM (VALUES
         (0, 836603681, 1), (1, 442543251, 7), (2, 1004818243, 13),
         (3, 668265263, 31), (4, 374761393, 97), (5, 741103597, 41),
         (6, 988021567, 151), (7, 540483477, 65537)) p(i, a, b)),
       sig AS (
         SELECT doc_id, i, min((h * a + b) % 4294967291) AS mh
         FROM hpost CROSS JOIN params GROUP BY doc_id, i),
       band AS (
         SELECT doc_id, i // 2 AS band,
           string_agg(mh::VARCHAR, '_' ORDER BY i) AS key
         FROM sig GROUP BY doc_id, i // 2),
       cand AS (
         SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         FROM band x JOIN band y
           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       sizes AS (SELECT doc_id, count(*) AS sz FROM hpost GROUP BY doc_id),
       shared AS (
         SELECT id_a, id_b, count(*) AS shared
         FROM cand
           JOIN hpost a ON a.doc_id = cand.id_a
           JOIN hpost b ON b.doc_id = cand.id_b AND b.h = a.h
         GROUP BY id_a, id_b),
       verified AS (
         SELECT id_a, id_b,
           CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) AS jaccard
         FROM shared JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b)
       SELECT id_a, id_b, (sign(jaccard) * floor(abs(jaccard) * 10000 + 0.5) / 10000) AS jaccard
       FROM verified WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""

  /** Deterministic messy URL per doc for the t31/t32 URL family:
    * mixed-case scheme/host, default vs non-default port (scheme-
    * consistent), doubled slashes, mixed-case path, tracking params
    * out of order, a co.uk-family host on every third doc, and a
    * fragment — every branch of canonicalUrl/registeredDomain fires. */
  private def synthUrl(id: Column, source: Column): Column = concat(
    when(id % 2 === 0, lit("HTTPS")).otherwise(lit("http")),
    lit("://WWW."), source,
    when(id % 3 === 0, lit(".CO.UK")).otherwise(lit(".COM")),
    when(id % 2 === 0, lit(":443"))
      .otherwise(when(id % 3 === 0, lit(":8080")).otherwise(lit(":80"))),
    lit("//Docs//"), id.cast("string"),
    when(id % 2 === 0, lit("/")).otherwise(lit("")),
    lit("?utm_source=feed&b=2&a=1"),
    when(id % 5 === 0, lit("&gclid=xyz")).otherwise(lit("")),
    lit("#sec"))

  /** DuckDB mirror of synthUrl (same branch structure). */
  private val oSynthUrl: String =
    """(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) ||
       '://WWW.' || source ||
       (CASE WHEN doc_id % 3 = 0 THEN '.CO.UK' ELSE '.COM' END) ||
       (CASE WHEN doc_id % 2 = 0 THEN ':443'
             WHEN doc_id % 3 = 0 THEN ':8080' ELSE ':80' END) ||
       '//Docs//' || CAST(doc_id AS VARCHAR) ||
       (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
       '?utm_source=feed&b=2&a=1' ||
       (CASE WHEN doc_id % 5 = 0 THEN '&gclid=xyz' ELSE '' END) ||
       '#sec'"""

  /** DuckDB mirror of the canonicalUrl + urlHost + registeredDomain
    * chain over a CTE `u(doc_id, url)` — yields
    * `fin(doc_id, url_canon, host, domain)`. */
  private val oUrlCanonChain: String =
    """c AS (
           SELECT doc_id, url,
             regexp_replace(url, '#.*$', '') AS nofrag,
             lower(regexp_extract(url,
               '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             regexp_replace(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
           FROM u),
         h AS (
           SELECT doc_id, scheme, nofrag,
             lower(regexp_extract(rest, '^([^/?#]+)', 1)) AS hostport,
             regexp_extract(rest, '^[^/?#]+([^?#]*)', 1) AS rawpath
           FROM c),
         h2 AS (
           SELECT doc_id, scheme, nofrag, rawpath,
             regexp_replace(hostport, ':[0-9]*$', '') AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port
           FROM h),
         p AS (
           SELECT doc_id, scheme, host,
             CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                    OR (scheme = 'https' AND port = '443') THEN ''
                  ELSE ':' || port END AS portpart,
             CASE WHEN regexp_replace(regexp_replace(rawpath,
                    '/{2,}', '/', 'g'), '/+$', '') = '' THEN '/'
                  ELSE regexp_replace(regexp_replace(rawpath,
                    '/{2,}', '/', 'g'), '/+$', '') END AS path,
             array_to_string(list_sort(list_filter(
               string_split(regexp_extract(nofrag, '\?([^#]*)', 1), '&'),
               x -> x <> '' AND NOT regexp_matches(x,
                 '^(utm_[^=]*|gclid|fbclid)(=|$)'))), '&') AS qs
           FROM h2),
         fin AS (
           SELECT doc_id,
             scheme || '://' || host || portpart || path ||
               (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS url_canon,
             host,
             CASE WHEN len(string_split(host, '.')) >= 3
                    AND string_split(host, '.')[len(string_split(host, '.')) - 1]
                      IN ('co', 'com', 'net', 'org', 'gov', 'ac', 'edu')
                    AND length(string_split(host, '.')[len(string_split(host, '.'))]) = 2
                  THEN array_to_string(string_split(host, '.')[
                    len(string_split(host, '.')) - 2:len(string_split(host, '.'))], '.')
                  WHEN len(string_split(host, '.')) >= 2
                  THEN array_to_string(string_split(host, '.')[
                    len(string_split(host, '.')) - 1:len(string_split(host, '.'))], '.')
                  ELSE host END AS domain
           FROM p)"""

  /** DuckDB mirror of TextAnalysis.h60 (same 15 hex digits, no mod). */
  private def oH60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB mirror of Dedup.simhashSignatures + banding: CTE chain
    * from the O_SH postings to `cand` (candidate pairs with both
    * signatures). Shared by d06 (pair output) and d07 (clusters). */
  private def oSimhashCand: String =
    s"""hashed AS (SELECT doc_id, ${oH60("term")} AS h FROM post),
         votes AS (
           SELECT doc_id, j,
             CASE WHEN sum(((h >> j) & 1) * 2 - 1) >= 0
               THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END AS bit
           FROM hashed CROSS JOIN range(60) t(j)
           GROUP BY doc_id, j),
         sig AS (
           SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sim
           FROM votes GROUP BY doc_id),
         banded AS (
           SELECT doc_id, sim, b AS band,
             (sim >> CAST(b * 15 AS INT)) & 32767 AS key
           FROM sig CROSS JOIN range(4) t(b)),
         cand AS (
           SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             x.sim AS sim_a, y.sim AS sim_b
           FROM banded x JOIN banded y
             ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)"""

  /** DuckDB mirror of Similarity.kmeansAssign(k=4, iters=1): CTE chain
    * ending in `a2` = the final (vec_id, cluster) assignment, with `e`
    * = the embeddings in scope. Distances round to 1e-6 before the
    * argmin exactly like the engine, so assignments match bit-for-bit. */
  private def oKmeansA2: String = {
    def assignRanked(centCte: String) =
      s"""SELECT e.vec_id, c.cluster,
            row_number() OVER (PARTITION BY e.vec_id ORDER BY
              floor(list_sum(list_transform(list_zip(e.embedding, c.cvec),
                z -> (CAST(z[1] AS DOUBLE) - z[2])
                  * (CAST(z[1] AS DOUBLE) - z[2])))
                * 1000000 + 0.5) / 1000000, c.cluster) AS rn
          FROM e CROSS JOIN $centCte c"""
    def assign(centCte: String) =
      s"""SELECT vec_id, cluster FROM (
          ${assignRanked(centCte)}) t WHERE rn = 1"""
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       c0 AS (
         SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
             AS cluster,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
         FROM (SELECT * FROM e ORDER BY vec_id LIMIT 4)),
       a1 AS (${assign("c0")}),
       d1 AS (
         SELECT a1.cluster, i.i AS pos,
           avg(CAST(e.embedding[CAST(i.i AS INT)] AS DOUBLE)) AS v
         FROM a1 JOIN e USING (vec_id) CROSS JOIN range(1, 65) i(i)
         GROUP BY a1.cluster, i.i),
       cm AS (
         SELECT cluster, list(v ORDER BY pos) AS cvec
         FROM d1 GROUP BY cluster),
       c1 AS (
         SELECT c0.cluster, coalesce(cm.cvec, c0.cvec) AS cvec
         FROM c0 LEFT JOIN cm USING (cluster)),
       a2r AS (${assignRanked("c1")}),
       a2 AS (SELECT vec_id, cluster FROM a2r WHERE rn = 1)"""
  }

  /** DuckDB mirror of one PQ subspace (Similarity.pqTrain/pqEncode/
    * pqTopK at m=2, k=4, iters=1): slice → 4-seed → one Lloyd step →
    * argmin code → per-(query, corpus) ADC distance, with the same
    * 1e-6 distance rounding and lowest-centroid tie-break as the Spark
    * side. `p` prefixes the CTE names so two subspaces coexist. */
  private def oPqSub(p: String, lo: Int, hi: Int,
                     src: String = "embeddings"): String = {
    val len = hi - lo + 1
    def assignRanked(centCte: String) =
      s"""SELECT pe.vec_id, c.cluster,
            row_number() OVER (PARTITION BY pe.vec_id ORDER BY
              floor(list_sum(list_transform(list_zip(pe.sv, c.cvec),
                z -> (CAST(z[1] AS DOUBLE) - z[2])
                  * (CAST(z[1] AS DOUBLE) - z[2])))
                * 1000000 + 0.5) / 1000000, c.cluster) AS rn
          FROM ${p}e pe CROSS JOIN $centCte c"""
    s"""${p}e AS (SELECT vec_id, embedding[$lo:$hi] AS sv FROM $src),
       ${p}c0 AS (
         SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
             AS cluster,
           list_transform(sv, x -> CAST(x AS DOUBLE)) AS cvec
         FROM (SELECT * FROM ${p}e ORDER BY vec_id LIMIT 4)),
       ${p}a1 AS (SELECT vec_id, cluster FROM (
         ${assignRanked(s"${p}c0")}) t WHERE rn = 1),
       ${p}d1 AS (
         SELECT a.cluster, i.i AS pos,
           avg(CAST(pe.sv[CAST(i.i AS INT)] AS DOUBLE)) AS v
         FROM ${p}a1 a JOIN ${p}e pe USING (vec_id)
           CROSS JOIN range(1, ${len + 1}) i(i)
         GROUP BY a.cluster, i.i),
       ${p}cm AS (
         SELECT cluster, list(v ORDER BY pos) AS cvec
         FROM ${p}d1 GROUP BY cluster),
       ${p}c1 AS (
         SELECT c0.cluster, coalesce(cm.cvec, c0.cvec) AS cvec
         FROM ${p}c0 c0 LEFT JOIN ${p}cm cm USING (cluster)),
       ${p}code AS (SELECT vec_id, cluster AS code FROM (
         ${assignRanked(s"${p}c1")}) t WHERE rn = 1),
       ${p}adc AS (
         SELECT q.vec_id AS q_id, pc.vec_id,
           floor(list_sum(list_transform(list_zip(q.sv, c.cvec),
             z -> (CAST(z[1] AS DOUBLE) - z[2])
               * (CAST(z[1] AS DOUBLE) - z[2])))
             * 1000000 + 0.5) / 1000000 AS d
         FROM ${p}code pc
         JOIN ${p}c1 c ON c.cluster = pc.code
         CROSS JOIN (SELECT vec_id, sv FROM ${p}e WHERE vec_id < 3) q)"""
  }

  /** IVF-PQ cell-pruned ADC oracle — shared by s09 (in-session train +
    * encode + query in one plan) and s12 (the identical computation
    * served from a persisted index): both must reproduce this SQL's
    * deterministic Lloyd cells, per-subspace codes and rounded ADC. */
  private def ivfPqOracleSql: String =
    s"""WITH $oKmeansA2,
       ${oPqSub("p0", 1, 32)},
       ${oPqSub("p1", 33, 64)},
       summed AS (
         SELECT a0.q_id, a0.vec_id, a0.d + a1.d AS adc
         FROM p0adc a0 JOIN p1adc a1 USING (q_id, vec_id)
         WHERE vec_id <> q_id),
       cellok AS (
         SELECT s.q_id, s.vec_id, s.adc
         FROM summed s
           JOIN a2 cq ON cq.vec_id = s.q_id
           JOIN a2 cc ON cc.vec_id = s.vec_id
         WHERE cq.cluster = cc.cluster),
       ranked AS (
         SELECT q_id, vec_id, adc, row_number() OVER
           (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
         FROM cellok)
       SELECT q_id, vec_id, (sign(adc) * floor(abs(adc) * 10000 + 0.5) / 10000) AS adc, rank
       FROM ranked WHERE rank <= 5 ORDER BY q_id, rank"""

  /** DuckDB mirror of Similarity.rhpBucket(vec, nBits, dim, planeOffset):
    * generated with the same rhpSign constants, same left-associative
    * addition order, so doubles match bit-for-bit. */
  private def rhpBucketSql(nBits: Int, dim: Int, planeOffset: Int): String =
    (0 until nBits).map { b =>
      val p = planeOffset + b
      val dots = (0 until dim).map { j =>
        val s = if (Similarity.rhpSign(p, j) > 0) "+" else "-"
        s"$s CAST(embedding[${j + 1}] AS DOUBLE)"
      }.mkString(" ")
      s"(CASE WHEN ($dots) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup by content hash
    "d01_exact_dedup" -> ((s, dir) => {
      Dedup.exact(docs(s, dir), "text", "doc_id")
        .orderBy("content_hash")
    }),

    // MassiveText-style sub-document dedup: 8-token segments, each
    // distinct segment kept only at its first corpus occurrence,
    // documents reassembled from the survivors
    "d11_segment_dedup" -> ((s, dir) => {
      Dedup.segmentDedup(docs(s, dir), "text", "doc_id", width = 8)
        .select(col("id").as("doc_id"), col("n_seg"), col("n_kept"),
          col("dedup_text"))
        .orderBy("doc_id")
    }),

    // n-gram (3-shingle) Jaccard near-dup pairs via postings join
    // (shares the materialized postings with d03)
    "d02_ngram_jaccard" -> ((s, dir) => {
      Dedup.jaccardFromPostings(sharedPostings(s, dir, 32), threshold = 0.5)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // asymmetric containment >= 0.8: the quote/subset detector — a doc
    // mostly contained in another scores ~1 even when symmetric
    // Jaccard is low; both directions of each ordered pair
    "d13_containment" -> ((s, dir) => {
      Dedup.containmentFromPostings(sharedPostings(s, dir, 32),
          threshold = 0.8)
        .select(col("id"), col("id_in"),
          r4(col("containment")).as("containment"))
        .orderBy("id", "id_in")
    }),

    // exact-substring spans: overlapping 8-token window hashes (every
    // position, unlike d11's disjoint segments) -> per-doc duplicated
    // fraction; windows join a count table, never each other.
    // The fraction ships as basis points (BIGINT) computed with pure
    // integer arithmetic — floor(n_dup*1e4/n_windows + 0.5) ==
    // (20000*n_dup + n_windows) div (2*n_windows) — so the contract
    // carries no double at all and hashes identically everywhere.
    "d15_dup_spans" -> ((s, dir) => {
      Dedup.dupSpans(docs(s, dir), "text", "doc_id", width = 8)
        .select(col("id").as("doc_id"), col("n_windows"), col("n_dup"),
          when(col("n_windows") === 0, lit(0L))
            .otherwise(expr(
              "(20000 * n_dup + n_windows) div (2 * n_windows)"))
            .cast("long").as("dup_frac_bp"))
        .orderBy("doc_id")
    }),

    // frequency-based boilerplate removal (CCNet/RefinedWeb line
    // dedup over token windows): a 3-token segment appearing in >= 2
    // distinct docs of the SAME source is template text and strips
    // from every carrier — unlike d11, which keeps first occurrences
    "d16_boilerplate" -> ((s, dir) => {
      Dedup.boilerplateStrip(docs(s, dir), "text", "doc_id", "source",
          width = 3, minDf = 2)
        .select(col("id").as("doc_id"), col("n_seg"), col("n_kept"),
          col("clean_text"))
        .orderBy("doc_id")
    }),

    // winnowing fingerprints (MOSS, Schleimer et al. 2003): min-of-
    // window fingerprint sampling with a deterministic match floor
    // (any shared run >= w+k-1 tokens collides) — pairs off the
    // winnowed ~2/(w+1) postings sample instead of full postings
    "d17_winnow_pairs" -> ((s, dir) => {
      Dedup.jaccardFromPostings(
          Dedup.winnowFingerprints(docs(s, dir), "text", "doc_id",
            k = 4, w = 4),
          threshold = 0.35)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // incremental dedup: screen an arriving snapshot (every 5th doc
    // re-id'd, plus verbatim copies of every 50th corpus doc) against
    // the frozen corpus — exact layer by content hash, near layer by
    // cross-table MinHash-LSH; corpus×corpus pairs never generated
    "d18_screen_snapshot" -> ((s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 5 =!= 0)
      val arrivals = d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 50 === 1)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      Dedup.screenAgainstCorpus(corpus, arrivals, "text", "doc_id",
          bands = 4, threshold = 0.35, portable = true)
        .orderBy("id")
    }),

    // SemDeDup: k-means cells (same deterministic Lloyd as s04) +
    // within-cell pairwise cosine; a vector is dropped when a lower-id
    // neighbor sits at cos >= 0.35 in its cell — per-vector verdicts
    // with the keeper's id, not a pair list
    "d14_semdedup" -> ((s, dir) => {
      Dedup.semDedup(embs(s, dir), "embedding", "vec_id",
          k = 4, iters = 1, eps = 0.35)
        .select(col("id").as("vec_id"), col("cluster"), col("keep"),
          col("dup_of"))
        .orderBy("vec_id")
    }),

    // ensemble consensus: a pair is a near-dup when >= 2 independent
    // detectors (exact Jaccard, MinHash-LSH, SimHash) agree — the
    // production pattern for precision without hand-tuning any single
    // threshold; all three lists come from the SAME shared postings
    // scan, so the ensemble costs three small pair unions, not three
    // corpus passes
    "d12_consensus_pairs" -> ((s, dir) => {
      val j = Dedup.jaccardFromPostings(sharedPostings(s, dir, 32),
          threshold = 0.5)
        .select(col("id_a"), col("id_b"), lit("jaccard").as("det"))
      val m = sharedLshPairs(s, dir)
        .select(col("id_a"), col("id_b"), lit("minhash").as("det"))
      val sh = sharedSimhashPairs(s, dir)
        .select(col("id_a"), col("id_b"), lit("simhash").as("det"))
      j.unionByName(m).unionByName(sh)
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_detectors"),
          array_join(array_sort(collect_list(col("det"))), ",")
            .as("detectors"))
        .filter(col("n_detectors") >= 2)
        .orderBy("id_a", "id_b")
    }),

    // MinHash-LSH banded candidates, verified at jaccard >= 0.5
    "d03_minhash_lsh" -> ((s, dir) => {
      sharedLshPairs(s, dir)
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // benchmark decontamination: corpus docs sharing any 3-shingle
    // with the "eval set" (every 50th doc); bench postings broadcast
    "d08_decontaminate" -> ((s, dir) => {
      val post = sharedPostings(s, dir, 32)
      Dedup.decontaminateFromPostings(
          post.filter(col("id") % 50 =!= 0),
          post.filter(col("id") % 50 === 0))
        .select(col("id").as("doc_id"), col("n_contaminated"))
        .orderBy("doc_id")
    }),

    // n-gram novelty: fraction of a doc's distinct shingles with
    // corpus-wide document frequency 1 (boilerplate filter)
    "t09_novelty" -> ((s, dir) => {
      TextAnalysis.noveltyFromPostings(sharedPostings(s, dir, 32))
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_unique"),
          r4(col("novelty")).as("novelty"))
        .orderBy("doc_id")
    }),

    // detector evaluation: MinHash-LSH recall against uncapped exact
    // Jaccard truth — the parameter-tuning report a dedup pipeline
    // runs on a corpus sample before the full pass
    "d09_lsh_eval" -> ((s, dir) => {
      val post = sharedPostings(s, dir, 32)
      val truth = Dedup.jaccardFromPostings(post, 0.5, maxDf = None)
      val lsh = sharedLshPairs(s, dir)
      Dedup.pairEval(truth, lsh)
        .select(col("n_true"), col("n_found"), col("n_correct"),
          r4(col("n_correct").cast("double") / col("n_found")).as("precision"),
          r4(col("n_correct").cast("double") / col("n_true")).as("recall"))
    }),

    // 32-bit SimHash signatures (term hashes materialized once)
    "d04_simhash" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          Dedup.termHashes(col("text"), 3, portable = true).as("hs"))
        .select(col("doc_id"), Dedup.simhash32FromHashes(col("hs")).as("simhash"))
        .orderBy("doc_id")
    }),

    // SimHash banded near-dup pairs: 4×8-bit bands, Hamming ≤ 3
    // (pigeonhole: any pair within Hamming 3 shares at least one band)
    "d06_simhash_pairs" -> ((s, dir) => {
      sharedSimhashPairs(s, dir)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // duplicate-cluster resolution: simhash pairs → connected
    // components → keeper per cluster (min doc id)
    "d07_dedup_clusters" -> ((s, dir) => {
      Dedup.duplicateClusters(sharedSimhashPairs(s, dir))
        .select(col("id").as("doc_id"), col("comp").as("keeper_id"))
        .orderBy("doc_id")
    }),

    // embedding near-dup pairs blocked by 3-table 6-bit RHP-LSH buckets
    // (data-independent cells — bounded bucket population at any scale,
    // unlike blocking on a skewed label column)
    "d05_embedding_neardup" -> ((s, dir) => {
      Dedup.embeddingRhpPairs(embs(s, dir), "embedding", "vec_id",
          threshold = 0.35, nBits = 6, dim = 64, tables = 3)
        .select(col("id_a"), col("id_b"), r4(col("cos")).as("cos"))
        .orderBy("id_a", "id_b")
    }),

    // trained quantizer: deterministic Lloyd k-means cell assignment
    // (k lowest-id init, rounded-distance argmin, 1 iteration)
    "s04_kmeans_cells" -> ((s, dir) => {
      Similarity.kmeansAssign(embs(s, dir), "embedding", "vec_id",
          k = 4, iters = 1)
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // IVF top-5 over the TRAINED k-means cells (query probes its own
    // cell — single-probe on a learned quantizer, not a given label)
    "s05_ivf_trained" -> ((s, dir) => {
      val assigned = Similarity.kmeansAssign(embs(s, dir),
        "embedding", "vec_id", k = 4, iters = 1)
      val q = assigned.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("cluster").as("q_cell"))
      Similarity.ivfTopK(assigned, q, 5, cellCol = "cluster")
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // multi-probe trained IVF: each query searches its 2 nearest
    // cells (of 4) — the recall lever over s05's single probe; probe
    // lists ride the broadcast side, corpus streams once
    "s07_ivf_multiprobe" -> ((s, dir) => {
      val e = embs(s, dir)
      val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val q = Similarity.kmeansProbes(e, "embedding", "vec_id",
          k = 4, iters = 1, nprobe = 2)
        .filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("probes").as("q_probes"))
      Similarity.ivfTopKMultiProbe(assigned, q, 5)
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // product-quantization ADC top-5: corpus encoded to 2 subspace
    // codes (4 centroids each, deterministic Lloyd), queries score the
    // CODES — the 100 TB ANN memory path (codes are m bytes/vector,
    // the float vectors are never read after encoding)
    "s08_pq_adc_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val books = Similarity.pqTrain(e, "embedding", "vec_id",
        m = 2, k = 4, iters = 1)
      val encoded = Similarity.pqEncode(e, "embedding", books)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.pqTopK(encoded.select("vec_id", "codes"), q, 5, books)
        .select(col("q_id"), col("vec_id"), r4(col("adc")).as("adc"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // IVF-PQ top-5: trained coarse cells prune candidates (s05's
    // quantizer) and PQ codes score them (s08's ADC) — the composed
    // production ANN design; corpus float vectors are read only at
    // train/encode time, the serving scan touches cells + codes only
    "s09_ivf_pq_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val books = Similarity.pqTrain(e, "embedding", "vec_id",
        m = 2, k = 4, iters = 1)
      val encoded = Similarity.pqEncode(assigned, "embedding", books)
      val q = encoded.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("cluster").as("q_cell"))
      Similarity.ivfPqTopK(encoded.select("vec_id", "codes", "cluster"),
          q, 5, books)
        .select(col("q_id"), col("vec_id"), r4(col("adc")).as("adc"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // ANN recall@5: the IVF-PQ serving path (s09's construction)
    // scored against the exact brute-force top-5 ground truth — the
    // continuous quality check a production ANN deployment runs. The
    // toy config (4 cells, m=2/k=4 codebooks, squared-L2 ADC vs
    // cosine truth) scores low by design: the eval exists to expose
    // exactly that, and the knobs (nprobe, m, k) are its output
    "s13_ann_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val exact = Similarity.bruteForceTopK(e, q, 5)
      val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val books = Similarity.pqTrain(e, "embedding", "vec_id",
        m = 2, k = 4, iters = 1)
      val encoded = Similarity.pqEncode(assigned, "embedding", books)
      val qc = encoded.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("cluster").as("q_cell"))
      val approx = Similarity.ivfPqTopK(
        encoded.select("vec_id", "codes", "cluster"), qc, 5, books)
      Similarity.annRecall(exact, approx)
        .select(col("q_id"), col("n_match"), r4(col("recall")).as("recall"))
        .orderBy("q_id")
    }),

    // matryoshka truncation sweep: recall@5 of brute-force cosine over
    // PREFIX dims 8/16/32 against the full-dim truth — the evaluation
    // a pipeline runs before serving truncated (matryoshka) embeddings
    // to cut index bytes; each prefix search is the same broadcast-
    // query scan shape as s01 on a sliced vector column
    "s21_matryoshka_recall" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val exact = Similarity.bruteForceTopK(e, q, 5)
      Seq(8, 16, 32).map { d =>
        val ep = e.select(col("vec_id"),
          slice(col("embedding"), 1, d).as("embedding"))
        val qp = q.select(col("q_id"),
          slice(col("q_vec"), 1, d).as("q_vec"))
        Similarity.annRecall(exact, Similarity.bruteForceTopK(ep, qp, 5))
          .withColumn("dim", lit(d))
      }.reduce(_ unionByName _)
        .select(col("dim"), col("q_id"), col("n_match"),
          r4(col("recall")).as("recall"))
        .orderBy("dim", "q_id")
    }),

    // graded ranking quality of the same IVF-PQ serving path: s13's
    // recall sees only SET overlap; nDCG@5 + MRR grade the ORDER of
    // the returned list (a hit at rank 5 vs rank 1 is invisible to
    // recall and exactly what retrieval tuning optimizes). Truth =
    // the exact brute-force top-5 with graded relevance 6 − rank
    "s18_ranking_eval" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val truth = Similarity.bruteForceTopK(e, q, 5)
        .select(col("q_id"), col("vec_id"),
          (lit(6) - col("rank")).cast("double").as("rel"))
      val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val books = Similarity.pqTrain(e, "embedding", "vec_id",
        m = 2, k = 4, iters = 1)
      val encoded = Similarity.pqEncode(assigned, "embedding", books)
      val qc = encoded.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("cluster").as("q_cell"))
      val approx = Similarity.ivfPqTopK(
        encoded.select("vec_id", "codes", "cluster"), qc, 5, books)
      Similarity.rankingEval(approx, truth, 5)
        .select(col("q_id"), r4(col("ndcg")).as("ndcg"),
          r4(col("mrr")).as("mrr"))
        .orderBy("q_id")
    }),

    // exact re-rank refine (FAISS IndexRefineFlat): the IVF-PQ ADC
    // scan proposes a top-10 shortlist per query, then ONLY those
    // |Q|×10 rows pay full-precision cosine against the float
    // vectors — the production fix for PQ quantization error (the
    // recall gap measured in SCALING.md). The shortlist broadcasts
    // into a semi-join, so non-candidate embeddings never move.
    "s14_pq_refine" -> ((s, dir) => {
      val e = embs(s, dir)
      val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val books = Similarity.pqTrain(e, "embedding", "vec_id",
        m = 2, k = 4, iters = 1)
      val encoded = Similarity.pqEncode(assigned, "embedding", books)
      val qc = encoded.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("cluster").as("q_cell"))
      val shortlist = Similarity.ivfPqTopK(
        encoded.select("vec_id", "codes", "cluster"), qc, 10, books)
      Similarity.refineTopK(shortlist, e,
          qc.select(col("q_id"), col("q_vec")), 5)
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // 8-bit scalar quantization (FAISS QT_8bit): per-dim (min, range)
    // bounds, corpus stored as 64 byte-codes, asymmetric decode-on-
    // scan squared-L2 — the zero-training compression family next to
    // PQ; same broadcast-queries / streaming-corpus / bounded-heap
    // shape
    "s15_sq8_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val bounds = Similarity.sqTrain(e, "embedding", 64)
      val codes = Similarity.sqEncode(e, "embedding", bounds)
        .select("vec_id", "codes")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.sqTopK(codes, q, 5, bounds)
        .select(col("q_id"), col("vec_id"), r4(col("sqd")).as("sqd"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // IVF-SQ8 top-5 (FAISS IndexIVFScalarQuantizer): trained coarse
    // cells prune candidates (s05's quantizer) and per-dim byte codes
    // score them (s15's asymmetric decode) — completing the
    // quantizer × cell matrix next to IVF-PQ: 1/k scan from the
    // cells, 4× less I/O per row from the codes, no Lloyd rounds
    // beyond the coarse quantizer
    "s16_ivf_sq8" -> ((s, dir) => {
      val e = embs(s, dir)
      val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val bounds = Similarity.sqTrain(e, "embedding", 64)
      val codes = Similarity.sqEncode(assigned, "embedding", bounds)
        .select("vec_id", "codes", "cluster")
      val q = assigned.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("cluster").as("q_cell"))
      Similarity.ivfSqTopK(codes, q, 5, bounds)
        .select(col("q_id"), col("vec_id"), r4(col("sqd")).as("sqd"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // filtered vector search: each query carries an allowed-label
    // array (its own label + the next) and only qualifying corpus
    // vectors compete — pre-filtering, so the top-5 is exact under
    // the constraint; the filter rides the broadcast query side
    "s17_filtered_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          array(col("label"), col("label") + 1).as("q_allowed"))
      Similarity.filteredTopK(e, q, 5)
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // residual IVF-PQ top-5: codes encode vec − coarse centroid (the
    // production design — residual magnitudes are small, so the same
    // codebook budget buys finer resolution); ADC scores the query's
    // residual against residual codebooks within its cell
    "s10_ivf_pq_residual" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansCentroids(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val res = Similarity.assignWith(e, "embedding", cents)
        .withColumn("resid",
          Similarity.residual(col("embedding"), cents, col("cluster")))
      val books = Similarity.pqTrain(res, "resid", "vec_id",
        m = 2, k = 4, iters = 1)
      val encoded = Similarity.pqEncode(res, "resid", books)
      val q = encoded.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("resid").as("q_vec"),
          col("cluster").as("q_cell"))
      Similarity.ivfPqTopK(encoded.select("vec_id", "codes", "cluster"),
          q, 5, books)
        .select(col("q_id"), col("vec_id"), r4(col("adc")).as("adc"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // multi-probe residual IVF-PQ top-5: the full FAISS-style stack —
    // each query probes its 2 nearest coarse cells, scoring residual
    // codes against a PER-PROBE query residual (q_vec − centroid[p]);
    // probe expansion rides the broadcast side, corpus codes stream
    // through once
    "s11_ivf_pq_multiprobe" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.kmeansCentroids(e, "embedding", "vec_id",
        k = 4, iters = 1)
      val res = Similarity.assignWith(e, "embedding", cents)
        .withColumn("resid",
          Similarity.residual(col("embedding"), cents, col("cluster")))
      val books = Similarity.pqTrain(res, "resid", "vec_id",
        m = 2, k = 4, iters = 1)
      val encoded = Similarity.pqEncode(res, "resid", books)
      val q = Similarity.probesWith(e.filter(col("vec_id") < 3),
          "embedding", cents, nprobe = 2)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("probes").as("q_probes"))
      Similarity.ivfPqTopKMultiProbe(
          encoded.select("vec_id", "codes", "cluster"), q, 5, books, cents)
        .select(col("q_id"), col("vec_id"), r4(col("adc")).as("adc"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // IVF-PQ through a PERSISTED index: train+encode once into a
    // parquet codes table + JSON sidecar, reload, and serve the same
    // queries as s09 entirely from disk state — proving the stored
    // index reproduces the in-session computation bit-for-bit (same
    // oracle as s09). The production lifecycle: build one pass,
    // queries read only (cell, codes).
    "s12_pq_index_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val idxDir = java.nio.file.Files.createTempDirectory("s12index")
        .toString + "/idx"
      Similarity.writePqIndex(e, "embedding", "vec_id", idxDir,
        kCells = 4, m = 2, k = 4, iters = 1)
      val index = Similarity.readPqIndex(s, idxDir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.pqIndexTopK(index, q, 5)
        .select(col("q_id"), col("vec_id"), r4(col("adc")).as("adc"),
          col("rank"))
        .orderBy("q_id", "rank")
    }),

    // brute-force cosine top-10 for 3 query vectors
    "s01_cosine_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(e, q, 10)
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // Okapi BM25 lexical top-10 for 3 query strings derived from the
    // corpus itself (the first 6 tokens of docs 0/150/300 — so each
    // query has a known best answer), self excluded like the vector
    // top-k rows; scores fold per-term contributions in sorted term
    // order (bit-deterministic, oracle-mirrored)
    "s19_bm25_topk" -> ((s, dir) => {
      val d = docs(s, dir)
      val q = d.filter(col("doc_id").isin(0, 150, 300))
        .select(col("doc_id").as("q_id"),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 6), " ")
            .as("q_text"))
      Similarity.bm25TopK(d, q, 10, excludeSelf = true)
        .select(col("q_id"), col("id").as("doc_id"),
          r4(col("bm25")).as("bm25"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // hybrid retrieval: BM25 lexical top-10 + brute-force cosine
    // top-10 (documents and embeddings pair by id) fused by
    // reciprocal rank (k=60) — the standard score-free lexical+vector
    // combination; both input lists are bounded per query so the
    // fusion is |Q|-sized at any corpus scale
    "s20_rrf_hybrid" -> ((s, dir) => {
      val d = docs(s, dir)
      val e = embs(s, dir)
      val q = d.filter(col("doc_id").isin(0, 150, 300))
        .select(col("doc_id").as("q_id"),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 6), " ")
            .as("q_text"))
      val lex = Similarity.bm25TopK(d, q, 10, excludeSelf = true)
      val qv = e.filter(col("vec_id").isin(0, 150, 300))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val vec = Similarity.bruteForceTopK(e, qv, 10)
        .withColumnRenamed("vec_id", "id")
      Similarity.rrfFuse(Seq(lex, vec), 10)
        .select(col("q_id"), col("id").as("doc_id"),
          r4(col("rrf")).as("rrf"), col("rank"), col("n_rankers"))
        .orderBy("q_id", "rank")
    }),

    // IVF-style single-probe top-5 within the query's label cell
    "s02_ivf_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
          col("label").as("q_cell"))
      Similarity.ivfTopK(e, q, 5)
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // ANN top-5 via 3-table 6-bit RHP-LSH buckets (the quantizer-free
    // scale path: candidates bounded by bucket population, recall
    // OR-amplified across tables)
    "s03_rhp_ann" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.rhpTopK(e, q, 5, nBits = 6, dim = 64, tables = 3)
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // multi-probe RHP ANN: additionally probes every Hamming-1 bucket
    // on the (broadcast) query side — recall knob at zero corpus cost
    "s06_rhp_multiprobe" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.rhpTopK(e, q, 5, nBits = 6, dim = 64, tables = 3,
          probeHamming = 1)
        .select(col("q_id"), col("vec_id"), r4(col("cos")).as("cos"), col("rank"))
        .orderBy("q_id", "rank")
    }),

    // token counting / punctuation / stopword ratio / quality score
    "t01_text_stats" -> ((s, dir) => {
      val t = col("text")
      docs(s, dir).select(
          col("doc_id"),
          TextAnalysis.tokenCount(t).as("n_tokens"),
          TextAnalysis.bpeishCount(t).as("n_bpeish"),
          TextAnalysis.punctChars(t).as("n_punct"),
          r4(TextAnalysis.stopwordRatio(t)).as("stop_ratio"),
          r4(TextAnalysis.qualityScore(t)).as("quality"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic vs labeled lang
    "t02_langid" -> ((s, dir) => {
      val t = col("text")
      val hits = TextAnalysis.langHits(t)
      docs(s, dir).select(
          Seq(col("doc_id"), col("lang"), TextAnalysis.langId(t).as("predicted")) ++
            hits.map { case (l, c) => c.as(s"h_$l") }: _*)
        .orderBy("doc_id")
    }),

    // document fingerprint: min rolling-hash over 8-char shingles
    "t03_fingerprint" -> ((s, dir) => {
      val (fp, n) = TextAnalysis.fingerprint(col("text"), 8)
      docs(s, dir).select(col("doc_id"), fp.as("fp_min"),
          n.as("n_shingles"))
        .orderBy("doc_id")
    }),

    // TF-IDF top-3 terms per doc (corpus-size as broadcast aggregate)
    "t06_tfidf" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(docs(s, dir), "text", "doc_id", 3)
        .select(col("id").as("doc_id"), col("tok"),
          r4(col("tfidf")).as("tfidf"))
        .orderBy("doc_id", "tok")
    }),

    // Gopher rule-filter battery: every A1.1 rule as a named flag +
    // the conjunction — pure column exprs, zero shuffles
    "t19_gopher_rules" -> ((s, dir) => {
      val t = col("text")
      val flags = TextAnalysis.gopherFlags(t, minWords = 50)
      docs(s, dir).select(
          col("doc_id") +: flags.map { case (n, c) => c.as(n) } :+
            flags.map(_._2).reduce(_ && _).as("pass"): _*)
        .orderBy("doc_id")
    }),

    // repetition quality signals: top-bigram fraction + type-token ratio
    "t08_repetition" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
          r4(TextAnalysis.topBigramFraction(col("text"))).as("top_bigram_frac"),
          r4(TextAnalysis.typeTokenRatio(col("text"))).as("type_token_ratio"))
        .orderBy("doc_id")
    }),

    // deterministic Bernoulli sample: pure filter, reproducible by hash
    "t04_sample_bernoulli" -> ((s, dir) => {
      Sampling.bernoulli(docs(s, dir), "doc_id", 0.1, "s42", portable = true)
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),

    // corpus-trained unigram log-prob per doc (perplexity-style
    // quality signal: low = rare vocabulary, high = boilerplate)
    "t16_unigram_logprob" -> ((s, dir) => {
      TextAnalysis.unigramLogProb(docs(s, dir), "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_tok"),
          r4(col("logprob")).as("logprob"))
        .orderBy("doc_id")
    }),

    // corpus-trained bigram conditional log-prob with add-1 smoothing
    // (the KenLM-style filter one rung up from t16: scores word
    // TRANSITIONS, so shuffled/templated text separates from fluent
    // text sharing the same vocabulary)
    "t17_bigram_logprob" -> ((s, dir) => {
      TextAnalysis.bigramLogProb(docs(s, dir), "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_bigram"),
          r4(col("logprob")).as("logprob"))
        .orderBy("doc_id")
    }),

    // quality-band curriculum sampling: docs band by their unigram LM
    // score (floor of t16's logprob) and each band contributes a
    // deterministic n-doc sample — the composition a curriculum /
    // ablation pipeline runs to draw equal-sized slices across the
    // quality spectrum. Bands shuffle once; the per-band pick is the
    // bounded-heap aggregation (<= n pairs per band per partition)
    "t18_quality_sample" -> ((s, dir) => {
      val banded = TextAnalysis.unigramLogProb(docs(s, dir), "text", "doc_id")
        // eighth-nat bands: the corpus's score spread is a fraction of
        // a nat, so integer bands would collapse to one stratum
        .withColumn("band", floor(col("logprob") * 8).cast("int"))
      Sampling.stratifiedTopN(banded, "band", "id", n = 5,
          salt = "q", portable = true)
        .select(col("stratum").as("band"), col("id").as("doc_id"))
        .orderBy("band", "doc_id")
    }),

    // hashed logistic-regression quality classifier, trained IN the
    // engine (fastText/CCNet-style linear model over a hashed bag of
    // words): 2 full-batch GD steps against the is-English label on
    // 16 hash buckets, then the zero-shuffle scoring projection over
    // the corpus. The discriminative sibling of t16/t24's generative
    // ratio scores — the oracle re-derives the SAME weights by
    // unrolling both GD steps in SQL
    "t29_classifier_score" -> ((s, dir) => {
      val d = docs(s, dir)
      val (w, bias) = TextAnalysis.trainHashedLogreg(d, "text", "doc_id",
        col("lang") === "en", buckets = 16, iters = 2, lr = 0.5,
        portable = true)
      TextAnalysis.classifierScore(d, "text", "doc_id", w, bias,
          portable = true)
        .filter(col("n_tok") > 0)
        .select(col("id").as("doc_id"), col("n_tok"),
          r4(col("score")).as("score"))
        .orderBy("doc_id")
    }),

    // HTML → text extraction (the WET pass): each doc wraps into a
    // synthesized page — comments, a style block, a script whose BODY
    // contains < > && and a quoted tag, entity-escaped text, named
    // entities — and the extractor must strip structure and restore
    // the text. Both sides synthesize the same page and run their own
    // regex chains
    "t30_html_extract" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val page = concat(
        lit("<!DOCTYPE html><html><head><title>Doc "), id,
        lit("</title><style type=\"text/css\">p { color: #333; }" +
          "</style><script>if (1 < 2 && 3 > 0) { var s = \"<p>\"; }" +
          "</script></head><body><!-- header --><h1>Doc "), id,
        lit("</h1><p class=\"main\">"),
        replace(replace(col("text"), lit("&"), lit("&amp;")),
          lit("<"), lit("&lt;")),
        lit("</p><div>tail &amp;amp; &lt;end&gt;&nbsp;fin</div>" +
          "<!-- footer\n spans lines --></body></html>"))
      docs(s, dir).select(col("doc_id"),
          TextAnalysis.htmlExtract(page).as("text_plain"))
        .withColumn("n_chars", length(col("text_plain")))
        .orderBy("doc_id")
    }),

    // URL canonicalization + registered domain (the crawl pipeline's
    // URL-dedup key): each doc synthesizes a deliberately messy URL
    // (mixed case, default/non-default ports, doubled slashes,
    // tracking params, co.uk hosts, fragments) and both sides run
    // their own normalization chains
    "t31_url_canonicalize" -> ((s, dir) => {
      val url = synthUrl(col("doc_id"), col("source"))
      val host = TextAnalysis.urlHost(url)
      docs(s, dir).select(col("doc_id"),
          TextAnalysis.canonicalUrl(url).as("url_canon"),
          host.as("host"),
          TextAnalysis.registeredDomain(host).as("domain"))
        .orderBy("doc_id")
    }),

    // per-domain cap (SEO-spam / politeness budget): at most 5 docs
    // per registered domain, picked in deterministic salted-hash
    // order — registeredDomain feeding the bounded-heap stratified
    // pick, the composition a crawl corpus runs after t31
    "t32_domain_cap" -> ((s, dir) => {
      val url = synthUrl(col("doc_id"), col("source"))
      val withDom = docs(s, dir).select(col("doc_id"),
        TextAnalysis.registeredDomain(TextAnalysis.urlHost(url))
          .as("domain"))
      Sampling.stratifiedTopN(withDom, "domain", "doc_id", 5,
          "d7", portable = true)
        .select(col("stratum").as("domain"), col("id").as("doc_id"))
        .orderBy("domain", "doc_id")
    }),

    // classifier calibration report: a fixed-weight hashed linear
    // scorer (the t29 scoring projection with literal weights — no
    // training, so the oracle mirrors only the scoring chain) binned
    // into the reliability table against the is-English label; bins
    // computed on the 4dp-rounded score so both engines bin identical
    // doubles. Zero-token docs score sigma(bias) and participate.
    "t36_calibration_bins" -> ((s, dir) => {
      val d = docs(s, dir)
      val w = Array(-1.2, 0.8, -0.4, 1.5, 0.3, -0.9, 0.6, -0.2)
      val scored = TextAnalysis.classifierScore(d, "text", "doc_id",
          w, bias = 0.1137, portable = true)
        .join(d.select(col("doc_id").as("id"),
          (col("lang") === "en").as("label")), Seq("id"))
        .withColumn("score_r", r4(col("score")))
      TextAnalysis.calibrationBins(scored, "score_r", "label", bins = 10)
        .select(col("bin"), col("n"),
          r4(col("mean_score")).as("mean_score"),
          r4(col("frac_pos")).as("frac_pos"))
        .orderBy("bin")
    }),

    // CCNet-style perplexity bucketing: per-language head/middle/tail
    // thirds over the t17 bigram-LM score — thresholds are discrete
    // percentiles (actual data values at rank ceil(n/3), ceil(2n/3),
    // no interpolation, fitted per language) and assignment is a
    // broadcast-compare; docs with <2 tokens carry no LM evidence and
    // drop (t17's contract). Scores pre-rounded to 4dp so both
    // engines threshold identical doubles.
    "t35_ppl_buckets" -> ((s, dir) => {
      val scored = TextAnalysis.bigramLogProb(docs(s, dir), "text",
          "doc_id")
        .select(col("id").as("doc_id"), r4(col("logprob")).as("score"))
        .join(docs(s, dir).select(col("doc_id"), col("lang")),
          Seq("doc_id"))
      val thr = TextAnalysis.pplThresholds(scored, "lang", "score")
      TextAnalysis.assignPplBuckets(scored, "lang", "score", thr)
        .select(col("doc_id"), col("lang"), col("score"),
          col("ppl_bucket"))
        .orderBy("doc_id")
    }),

    // public-suffix-list registered domains end-to-end (the t31
    // heuristic's production path): one host per doc exercising every
    // PSL rule family — private-registry suffix (github.io), 2-label
    // ccSLD (com.au), co.uk, the !www.ck exception, the *.ck wildcard
    // and a plain gTLD — resolved by the per-length broadcast joins of
    // withRegisteredDomainPsl; the oracle states each family's
    // expected pay-level domain directly
    "t34_psl_domain" -> ((s, dir) => {
      val m = col("doc_id") % 6
      val host = when(m === 0,
          concat(lit("docs."), col("source"), lit(".github.io")))
        .when(m === 1, concat(lit("www."), col("source"), lit(".com.au")))
        .when(m === 2, concat(col("source"), lit(".co.uk")))
        .when(m === 3, lit("sub.www.ck"))
        .when(m === 4, concat(lit("a.b."), col("source"), lit(".ck")))
        .otherwise(concat(col("source"), lit(".com")))
      TextAnalysis.withRegisteredDomainPsl(
          docs(s, dir).select(col("doc_id"), host.as("host")), col("host"))
        .select("doc_id", "host", "registered_domain")
        .orderBy("doc_id")
    }),

    // the FULL bundled publicsuffix.org snapshot end-to-end (~9.5k
    // rules, suffixes to 5 labels): families the curated slice cannot
    // resolve — a 5-label private rule (s3.dualstack), a 5-label
    // wildcard match (*.compute.amazonaws.com.cn), the Japanese
    // city exception/wildcard pair, 4-label ICANN registries
    // (schools.nsw.edu.au, pvt.k12.ma.us), a host EQUAL to its suffix
    // (null regdom), the unknown-TLD heuristic fallback, and the
    // private-beats-ICANN longest-rule case (blogspot.com over com)
    "t37_psl_full" -> ((s, dir) => {
      val m = col("doc_id") % 10
      val host = when(m === 0, concat(col("source"),
          lit(".s3.dualstack.ap-south-1.amazonaws.com")))
        .when(m === 1, concat(lit("x."), col("source"),
          lit(".compute.amazonaws.com.cn")))
        .when(m === 2, lit("foo.city.kawasaki.jp"))
        .when(m === 3, lit("a.b.kawasaki.jp"))
        .when(m === 4, concat(col("source"), lit(".schools.nsw.edu.au")))
        .when(m === 5, lit("s3.cn-north-1.amazonaws.com.cn"))
        .when(m === 6, concat(lit("www."), col("source"), lit(".qqq")))
        .when(m === 7, concat(lit("a.b.c."), col("source"), lit(".com")))
        .when(m === 8, concat(col("source"), lit(".pvt.k12.ma.us")))
        .otherwise(concat(col("source"), lit(".blogspot.com")))
      TextAnalysis.withRegisteredDomainPsl(
          docs(s, dir).select(col("doc_id"), host.as("host")),
          col("host"), rules = TextAnalysis.fullPsl)
        .select("doc_id", "host", "registered_domain")
        .orderBy("doc_id")
    }),

    // within-document repeated-line removal (RefinedWeb intra-doc
    // dedup): each doc synthesizes a 6-line page with intra-doc
    // repeats (A B A footer B footer) — "footer" also repeats ACROSS
    // docs and must survive once per doc, the exact boundary with
    // d16's cross-doc rule
    "t33_line_dedup" -> ((s, dir) => {
      val tk = TextAnalysis.tokens(col("text"))
      val a = concat_ws(" ", slice(tk, 1, 5))
      val b = concat_ws(" ", slice(tk, 6, 5))
      val synth = concat_ws("\n", a, b, a, lit("footer"), b, lit("footer"))
      TextAnalysis.stripRepeatedLines(
          docs(s, dir).select(col("doc_id"), synth.as("text")),
          "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          col("text_clean"))
        .orderBy("doc_id")
    }),

    // sequence packing: 8 salted packing streams, 64-token training
    // sequences — each doc lands in (bucket, pack) at pack_off
    "t14_sequence_packing" -> ((s, dir) => {
      TextAnalysis.packSequences(docs(s, dir), "text", "doc_id",
          budget = 64, nBuckets = 8)
        .select(col("id").as("doc_id"), col("bucket"), col("n_tok"),
          col("pack"), col("pack_off"))
        .orderBy("doc_id")
    }),

    // domain mixing toward target source proportions at a 0.2 global
    // budget: src0/src1 clamp to keep-all, src2 keeps ~80%, every
    // unlisted source drops
    // temperature-α mixture sampling (the mBERT/XLM-R/mT5 exponential
    // smoothing): target shares q_i = p_i^α/Σp_j^α computed from the
    // corpus itself (α=0.5 — the IEEE-exact sqrt path — up-samples
    // tail sources), membership by the same deterministic salted hash
    // as t15; weights/thresholds are an in-plan |sources|-row dim,
    // no driver-side map
    "t38_temperature_mix" -> ((s, dir) => {
      Sampling.temperatureMix(docs(s, dir), "source", "doc_id",
          alpha = 0.5, frac = 0.3, salt = "tmix", portable = true)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    "t15_domain_mix" -> ((s, dir) => {
      Sampling.domainMix(docs(s, dir), "source", "doc_id",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
          frac = 0.2, salt = "mix42", portable = true)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // BPE segmentation under an ordered merge list (the apply side of
    // t12's training counts): real greedy per-word merging via
    // mapPartitions, merge table in the closure, no shuffle
    "t22_bpe_segment" -> ((s, dir) => {
      TextAnalysis.bpeSegment(docs(s, dir), "text", BPE_MERGES)
        .select(col("doc_id"), col("n_pieces"), col("pieces"))
        .orderBy("doc_id")
    }),

    // deterministic 80/10/10 train/val/test split: pure per-row hash
    // expression, reproducible and auditable from the id alone
    "t20_split_assign" -> ((s, dir) => {
      Sampling.splitAssign(docs(s, dir), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          salt = "sp42", portable = true)
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    }),

    // cross-split leakage report over the REAL split assignment: for
    // every non-train split, how many documents share at least one
    // 3-shingle with the train split (the train→eval contamination a
    // published data card reports), with the per-doc max shared count.
    // Same postings discipline as the dedup family: the train shingle
    // set is a distinct vocab-sized table, the probe joins on the
    // hash key — co-partitioned, no pairwise doc join anywhere
    "t39_split_leakage" -> ((s, dir) => {
      val sp = Sampling.splitAssign(docs(s, dir), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          salt = "sp42", portable = true)
        .select(col("doc_id").as("id"), col("split"))
      val post = sharedPostings(s, dir, 32).join(sp, "id")
      val trainH = post.filter(col("split") === "train")
        .select("h").distinct()
      val leaked = post.filter(col("split") =!= "train")
        .join(trainH, "h")
        .groupBy("split", "id").agg(count(lit(1)).as("n_shared"))
      val tot = sp.filter(col("split") =!= "train")
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
      tot.join(leaked, Seq("split"), "left")
        .groupBy("split", "n_docs")
        .agg(count(col("id")).as("n_leaked"),
          coalesce(max(col("n_shared")), lit(0L)).as("max_shared"))
        .select(col("split"), col("n_docs"), col("n_leaked"),
          r4(col("n_leaked").cast("double") / col("n_docs"))
            .as("leak_rate"),
          col("max_shared"))
        .orderBy("split")
    }),

    // token-budget prefix: 10k tokens in salted-hash order — banded
    // cumsum (window partitioned by hash band + broadcast band
    // offsets), never a global sort
    "t21_token_budget" -> ((s, dir) => {
      val withTok = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
      Sampling.tokenBudget(withTok, "doc_id", "n_tok",
          budget = 10000L, bandBits = 4, salt = "tb42", portable = true)
        .select(col("id").as("doc_id"), col("n_tok"), col("cum"))
        .orderBy("doc_id")
    }),

    // epoch shuffle: dense global permutation rank via banded
    // row_number + broadcast band offsets — reshuffles per salt,
    // never a global sort
    "t23_shuffle_order" -> ((s, dir) => {
      Sampling.shuffleOrder(docs(s, dir), "doc_id", bandBits = 4,
          salt = "epoch1", portable = true)
        .select(col("id").as("doc_id"), col("pos"))
        .orderBy("doc_id")
    }),

    // DSIR importance resampling: hashed-unigram bag log-ratio
    // weights (target = English docs vs the raw pool) + deterministic
    // Gumbel top-k draw — 50 docs sampled ∝ exp(log_w) without
    // replacement, reproducible from the salt
    "t24_dsir_sample" -> ((s, dir) => {
      Sampling.dsirSample(docs(s, dir), "text", "doc_id",
          col("lang") === "en", n = 50, buckets = 64, portable = true)
        .select(col("id").as("doc_id"), col("n_tok"),
          r4(col("log_w")).as("log_w"))
        .orderBy("doc_id")
    }),

    // deterministic stratified sample: 5 docs per language via the
    // bounded-heap top-n aggregate (no per-stratum global sort)
    "t05_sample_stratified" -> ((s, dir) => {
      Sampling.stratifiedTopN(docs(s, dir), "lang", "doc_id", 5,
          "s42", portable = true)
        .select(col("stratum").as("lang"), col("id").as("doc_id"))
        .orderBy("lang", "doc_id")
    }),

    // composed corpus-cleaning pipeline: exact-dedup keepers ∩ quality
    // threshold ∩ language gate — the end-to-end filter chain a corpus
    // build runs, as one declarative plan (semi-join + column filters)
    "t07_clean_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      val keepers = Dedup.exact(d, "text", "doc_id")
        .select(col("keeper_id").as("doc_id"))
      d.join(keepers, Seq("doc_id"), "left_semi")
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.7 &&
          TextAnalysis.langId(col("text")) === "en")
        .select(col("doc_id"),
          r4(TextAnalysis.qualityScore(col("text"))).as("quality"))
        .orderBy("doc_id")
    }),

    // PII scrubbing: the corpus word-salad carries no PII, so each doc
    // is seeded with deterministic doc_id-derived email/IP/phone spans
    // (the oracle derives the identical corpus); the operator then
    // counts and redacts them. Counts audit the extraction, the
    // portable hash of the redacted text proves the replacement
    // byte-for-byte.
    "t10_pii_scrub" -> ((s, dir) => {
      val seeded = docs(s, dir).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"),
          when(col("doc_id") % 3 === 0, lit(" cc admin@test.org"))
            .otherwise(lit("")),
          lit(" host 10."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("doc_id") * 7 % 256).cast("string"),
          lit("."), (col("doc_id") * 13 % 256).cast("string"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" tel 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("text"))
      val cnts = TextAnalysis.piiCounts(col("text"))
        .map { case (n, c) => c.as(s"n_$n") }
      seeded.select(col("doc_id") +: cnts :+
          TextAnalysis.h32(TextAnalysis.scrubPii(col("text")))
            .as("clean_hash"): _*)
        .orderBy("doc_id")
    }),

    // training-data chunking: 64-token windows, 16-token overlap; one
    // row per chunk with its token span and portable content hash
    "t11_chunks" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"),
          posexplode(TextAnalysis.chunks(col("text"), 64, 16)))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_ix"),
          col("col.start").cast("long").as("start"),
          col("col.n_tok").cast("long").as("n_tok"),
          TextAnalysis.h32(col("col.chunk")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_ix")
    }),

    // content-defined chunking: cut where the 16-char rolling window's
    // portable hash = 0 mod 64 (edit-robust chunk boundaries)
    "t13_cdc_chunks" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), posexplode(TextAnalysis.cdcChunks(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_ix"),
          col("col.start").cast("long").as("start"),
          col("col.len").cast("long").as("n_chars"),
          TextAnalysis.h32(col("col.chunk")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_ix")
    }),

    // BPE tokenizer training, iteration 1: top adjacent char pairs
    // weighted by word frequency (corpus collapses to its vocabulary
    // before pairs explode)
    "t12_bpe_merges" -> ((s, dir) => {
      TextAnalysis.bpeMergeCandidates(docs(s, dir), "text", 20)
        .orderBy(col("cnt").desc, col("pair").asc)
    }),

    // canonical-doc selection: per near-dup cluster (d07's components)
    // keep the highest-quality member; one join + one argmax
    // aggregation, no per-cluster sort
    "d10_keep_best" -> ((s, dir) => {
      val clusters = Dedup.duplicateClusters(sharedSimhashPairs(s, dir))
        .select(col("id"), col("comp"))
      val qual = docs(s, dir).select(col("doc_id").as("id"),
        r4(TextAnalysis.qualityScore(col("text"))).as("q"))
      Dedup.keepBest(clusters, qual)
        .orderBy("cluster_id")
    }),

    // multimodal audio: REAL WAV codec under oracle — canonical
    // 1-channel 8 kHz PCM with two identical 16-bit samples per doc,
    // decoded by the per-partition RIFF walker (chunk parse, sample
    // math), features checked arithmetically
    "m03_audio_decode" -> ((s, dir) => {
      def u16(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
      def u32(v: Int) = u16(v & 0xffff) + u16(v >>> 16)
      val headerHex = "52494646" + u32(36 + 4) + "57415645" + // RIFF/WAVE
        "666d7420" + u32(16) + u16(1) + u16(1) + u32(8000) +  // fmt PCM mono
        u32(16000) + u16(2) + u16(16) +                       // rates/align
        "64617461" + u32(4)                                   // data, 4 bytes
      val v = pmod(col("doc_id"), lit(20000))
      val sampleHex = concat(
        lpad(hex(pmod(v, lit(256))), 2, "0"),
        lpad(hex(v.divide(256).cast("long")), 2, "0"))
      val payload = unhex(concat(lit(headerHex), sampleHex, sampleHex))
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.decodeMedia(media)
        .select(col("media_id"),
          col("decoded.kind").as("kind"),
          col("decoded.channels").as("channels"),
          col("decoded.sample_rate").as("sample_rate"),
          r4(element_at(col("decoded.features"), 1)).as("dur_sec"),
          r4(element_at(col("decoded.features"), 2)).as("mean_amp"))
        .orderBy("media_id")
    }),

    // audio signal statistics: a 4-sample alternating-sign PCM wave
    // per doc; the WAV decode path computes RMS energy, zero-crossing
    // rate and peak amplitude in its single PCM pass
    "m07_audio_stats" -> ((s, dir) => {
      def u16h(v: Int) = f"${v & 0xff}%02X${(v >> 8) & 0xff}%02X"
      def u32h(v: Int) = u16h(v & 0xffff) + u16h(v >>> 16)
      val headerHex = "52494646" + u32h(36 + 8) + "57415645" +
        "666d7420" + u32h(16) + u16h(1) + u16h(1) + u32h(8000) +
        u32h(16000) + u16h(2) + u16h(16) +
        "64617461" + u32h(8) // 4 x 16-bit samples
      def le16(m: org.apache.spark.sql.Column) = concat(
        lpad(hex(pmod(m, lit(256))), 2, "0"),
        lpad(hex(m.divide(256).cast("long")), 2, "0"))
      val amp = (0 until 4).map(i =>
        pmod(col("doc_id") + lit(i * 1000), lit(20000)))
      val enc = amp.zipWithIndex.map { case (a, i) =>
        le16(if (i % 2 == 0) a else pmod(lit(65536) - a, lit(65536)))
      }
      val payload = unhex(concat(lit(headerHex) +: enc: _*))
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.decodeMedia(media)
        .select(col("media_id"), col("decoded.kind").as("kind"),
          r4(element_at(col("decoded.features"), 3)).as("rms"),
          r4(element_at(col("decoded.features"), 4)).as("zcr"),
          r4(element_at(col("decoded.features"), 5)).as("peak"))
        .orderBy("media_id")
    }),

    // image near-dup via perceptual hash: decode 2x2 PPMs whose
    // pixels collide across docs (doc_id % 37 pattern groups), aHash
    // the resized luma, and block on the hash — one hash-keyed
    // shuffle gives each image its duplicate-group size
    "m08_image_phash" -> ((s, dir) => {
      val g = pmod(col("doc_id"), lit(37))
      val pix = (0 until 4).map { i =>
        concat(
          lpad(hex(pmod(g * 7 + lit(i * 53), lit(256))), 2, "0"),
          lpad(hex(pmod(g * 11 + lit(i * 19), lit(256))), 2, "0"),
          lpad(hex(pmod(g * 3 + lit(i * 41), lit(256))), 2, "0"))
      }
      val payload = concat(encode(lit("P6\n2 2\n255\n"), "UTF-8") +:
        pix.map(unhex): _*)
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      // persisted: read twice (group count + join-back probe) and an
      // uncached replay re-decodes every image — the dupSpans re-read
      // trap; only (media_id, ahash) persists, the pixels never do
      val Seq(hashed) = graft.util.Caching.persistOwned(
        "PipelineQueries.m08",
        Multimodal.decodeMedia(media)
          .select(col("media_id"),
            Multimodal.aHash(col("decoded.features")).as("ahash")))
      val groups = hashed.groupBy("ahash")
        .agg(count(lit(1)).as("n_same"))
      hashed.join(groups, "ahash")
        .select(col("media_id"), col("ahash"), col("n_same"))
        .orderBy("media_id")
    }),

    // scene-change detection: frame-differencing shot boundaries over
    // the m04 4-frame synthetic videos — mean |ΔRGB| of the frame
    // means vs the previous frame, cut where it clears the threshold;
    // one per-media lag window on frameSample's bounded output
    "m09_scene_cuts" -> ((s, dir) => {
      def frame(f: Int) = {
        val pix = concat(
          lpad(hex(pmod(col("doc_id") + f * 17, lit(256))), 2, "0"),
          lpad(hex(pmod(col("doc_id") * 7 + f * 29, lit(256))), 2, "0"),
          lpad(hex(pmod(col("doc_id") * 13 + f * 31, lit(256))), 2, "0"))
        concat(encode(lit("P6\n2 2\n255\n"), "UTF-8"),
          unhex(concat(pix, pix, pix, pix)))
      }
      val payload = concat((0 until 4).map(frame): _*)
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.sceneCuts(media, every = 1, threshold = 0.2)
        .select(col("media_id"), col("frame_idx"),
          r4(col("delta")).as("delta"), col("is_cut"))
        .orderBy("media_id", "frame_idx")
    }),

    // multimodal: binary payload + metadata + stub feature extraction
    // ViT-style patch extraction: 4×4 synthetic PPMs tile into 2×2
    // patches of 2×2 pixels; per-patch mean R/G/B + luma checked
    // arithmetically — the image-tokenization pass before a vision
    // encoder
    "m10_patchify" -> ((s, dir) => {
      val pix = (0 until 16).map { p =>
        concat(
          lpad(hex(pmod(col("doc_id") * 3 + lit(p * 7), lit(256))), 2, "0"),
          lpad(hex(pmod(col("doc_id") * 5 + lit(p * 11), lit(256))), 2, "0"),
          lpad(hex(pmod(col("doc_id") * 7 + lit(p * 13), lit(256))), 2, "0"))
      }
      val payload = concat(encode(lit("P6\n4 4\n255\n"), "UTF-8") +:
        pix.map(unhex): _*)
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.patchify(media, patch = 2)
        .select(col("media_id"), col("patch_row"), col("patch_col"),
          r4(col("mean_r")).as("mean_r"), r4(col("mean_g")).as("mean_g"),
          r4(col("mean_b")).as("mean_b"), r4(col("luma")).as("luma"))
        .orderBy("media_id", "patch_row", "patch_col")
    }),

    // multimodal metadata contract through the REAL codec dispatch
    // (no byte-peek fake): each doc carries a 4×2 P6 image split into
    // two 2-column color blocks; withMediaMeta derives (n_bytes,
    // format, width, height) from the DECODED header and the features
    // are the codec's channel means + 2×2 resized luma, all checked
    // arithmetically by the oracle
    "m01_media_meta" -> ((s, dir) => {
      def px(mul: Int, off: Int) =
        lpad(hex(pmod(col("doc_id") * mul + off, lit(256))), 2, "0")
      val c1 = concat(px(1, 0), px(5, 0), px(9, 0))
      val c2 = concat(px(3, 0), px(7, 0), px(11, 0))
      val row = concat(c1, c1, c2, c2)
      val payload = concat(encode(lit("P6\n4 2\n255\n"), "UTF-8"),
        unhex(concat(row, row)))
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.withMediaMeta(media)
        .select(
          col("media_id"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          r4(element_at(col("decoded.features"), 1)).as("f0"),
          r4(element_at(col("decoded.features"), 2)).as("f1"),
          r4(element_at(col("decoded.features"), 3)).as("f2"),
          r4(element_at(col("decoded.features"), 4)).as("f3"))
        .orderBy("media_id")
    }),

    // multimodal video: frame sampling under oracle — each doc carries
    // a 4-frame motion-PPM payload (concatenated P6 frames); the
    // per-partition demuxer splits frames, every 2nd is decoded
    // (frames 0 and 2), features checked arithmetically
    "m04_frame_sample" -> ((s, dir) => {
      def frame(f: Int) = {
        val pix = concat(
          lpad(hex(pmod(col("doc_id") + f * 17, lit(256))), 2, "0"),
          lpad(hex(pmod(col("doc_id") * 7 + f * 29, lit(256))), 2, "0"),
          lpad(hex(pmod(col("doc_id") * 13 + f * 31, lit(256))), 2, "0"))
        concat(encode(lit("P6\n2 2\n255\n"), "UTF-8"),
          unhex(concat(pix, pix, pix, pix)))
      }
      val payload = concat((0 until 4).map(frame): _*)
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.frameSample(media, every = 2)
        .select(col("media_id"),
          col("frame.frame_idx").as("frame_idx"),
          col("frame.width").as("width"),
          col("frame.height").as("height"),
          r4(element_at(col("frame.features"), 1)).as("mean_r"),
          r4(element_at(col("frame.features"), 2)).as("mean_g"),
          r4(element_at(col("frame.features"), 3)).as("mean_b"),
          r4(element_at(col("frame.features"), 4)).as("luma"))
        .orderBy("media_id", "frame_idx")
    }),

    // multimodal: REAL codec path under oracle — 2×2 binary-PPM images
    // synthesized per doc, decoded by the per-partition PPM codec
    // (header parse + pixel math), features checked arithmetically
    "m02_media_decode" -> ((s, dir) => {
      val pix = concat(
        lpad(hex(pmod(col("doc_id"), lit(256))), 2, "0"),
        lpad(hex(pmod(col("doc_id") * 7, lit(256))), 2, "0"),
        lpad(hex(pmod(col("doc_id") * 13, lit(256))), 2, "0"))
      val payload = concat(encode(lit("P6\n2 2\n255\n"), "UTF-8"),
        unhex(concat(pix, pix, pix, pix)))
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.decodeMedia(media)
        .select(col("media_id"),
          col("decoded.kind").as("kind"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          r4(element_at(col("decoded.features"), 1)).as("mean_r"),
          r4(element_at(col("decoded.features"), 2)).as("mean_g"),
          r4(element_at(col("decoded.features"), 3)).as("mean_b"),
          r4(element_at(col("decoded.features"), 4)).as("luma"))
        .orderBy("media_id")
    }),

    // multimodal: REAL BMP codec under oracle — 24-bit uncompressed,
    // little-endian header, BOTTOM-UP 4-byte-padded rows, BGR pixel
    // order; 2×2 uniform image per doc so features are arithmetic
    "m05_bmp_decode" -> ((s, dir) => {
      // 54-byte BITMAPINFOHEADER for a 2×2 24-bit image (stride 8,
      // data 16 bytes, file 70 bytes), then two rows of BGR + 2 pad
      val headerHex = "424D46000000000000003600000028000000" +
        "0200000002000000010018000000000010000000" +
        "00000000000000000000000000000000"
      val bgr = concat(
        lpad(hex(pmod(col("doc_id") * 13, lit(256))), 2, "0"), // B
        lpad(hex(pmod(col("doc_id") * 7, lit(256))), 2, "0"),  // G
        lpad(hex(pmod(col("doc_id"), lit(256))), 2, "0"))      // R
      val row = concat(bgr, bgr, lit("0000"))
      val payload = unhex(concat(lit(headerHex), row, row))
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.decodeMedia(media)
        .select(col("media_id"),
          col("decoded.kind").as("kind"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          r4(element_at(col("decoded.features"), 1)).as("mean_r"),
          r4(element_at(col("decoded.features"), 2)).as("mean_g"),
          r4(element_at(col("decoded.features"), 3)).as("mean_b"),
          r4(element_at(col("decoded.features"), 4)).as("luma"))
        .orderBy("media_id")
    }),

    // JPEG through the decode pipeline: per-doc uniform-gray baseline
    // JFIF payloads (all-ones quant table → the lossy format decodes
    // bit-exactly, so the oracle can predict the features). 256
    // possible gray levels → a driver-built broadcast lookup keyed by
    // doc_id % 256; the corpus side streams, payload synthesis costs
    // O(256) regardless of corpus size.
    "m06_jpeg_decode" -> ((s, dir) => {
      import s.implicits._
      val payloads = (0 until 256)
        .map(g => (g.toLong, Multimodal.encodeGrayJpeg(g, w = 16, h = 8)))
        .toDF("gray", "payload")
      val media = docs(s, dir)
        .select(col("doc_id").as("media_id"),
          pmod(col("doc_id"), lit(256L)).as("gray"))
        .join(broadcast(payloads), Seq("gray"))
        .select(col("media_id"), col("payload"))
      Multimodal.decodeMedia(media)
        .select(col("media_id"),
          col("decoded.kind").as("kind"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height"),
          r4(element_at(col("decoded.features"), 1)).as("mean_r"),
          r4(element_at(col("decoded.features"), 2)).as("mean_g"),
          r4(element_at(col("decoded.features"), 3)).as("mean_b"),
          r4(element_at(col("decoded.features"), 4)).as("luma"))
        .orderBy("media_id")
    }),

    // per-source distinct-token estimate via a 256-register HLL: the
    // shuffled payload is one 256 B sketch per (source × partition)
    // instead of the token stream; exact count rides along so the
    // estimator error is visible in the oracle-checked output
    "t25_hll_distinct" -> ((s, dir) => {
      val hashed = docs(s, dir)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("source"),
          TextAnalysis.hash60(col("tok"), portable = true).as("h"))
      // exact rider counts distinct HASHES (the domain the sketch
      // sees): shuffles 8-byte longs instead of token strings, the
      // oracle mirrors the same domain so equality is definitional,
      // and both aggregates share ONE tokenize+md5 scan and shuffle
      hashed.groupBy("source")
        .agg(Sketches.hll(col("h")).as("__hll"),
          countDistinct("h").as("n_exact"))
        .select(col("source"), col("n_exact"),
          col("__hll.v_zero").as("v_zero"),
          col("__hll.harm_x2p50").as("harm_x2p50"),
          r4(col("__hll.est")).as("est"))
        .orderBy("source")
    }),

    // vocabulary heavy hitters via a 4×2048 Count-Min grid (64 KB of
    // state regardless of vocabulary size); threshold = total token
    // count / 256, so the query is scale-free across SFs
    "t26_cms_heavy" -> ((s, dir) => {
      val Seq(tk) = graft.util.Caching.persistOwned("PipelineQueries.t26",
        docs(s, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .select(col("tok"),
            TextAnalysis.hash60(col("tok"), portable = true).as("h")))
      val threshold = tk.count() / 256L
      Sketches.cmsHeavyHitters(tk, "tok", "h", threshold)
        .orderBy("tok")
    }),

    // decontamination against an 8 KB Bloom filter of the eval side —
    // the bounded-memory variant of d08's exact broadcast set; same
    // bench split (every 50th doc) so the spec can assert the
    // no-false-negative containment against d08's output
    "d19_bloom_decontam" -> ((s, dir) => {
      val post = sharedPostings(s, dir, 32)
      Sketches.bloomDecontaminate(
          post.filter(col("id") % 50 =!= 0),
          post.filter(col("id") % 50 === 0))
        .select(col("id").as("doc_id"), col("n_grams"), col("n_hits"),
          col("flagged"))
        .orderBy("doc_id")
    }),

    // streaming arrivals-vs-arrivals near-dup on the REAL file-stream
    // path: the corpus lands as a 4-file parquet source consumed one
    // file per micro-batch, arrival times synthesized 1 s apart from
    // doc_id so every document sits inside the 1 h state horizon —
    // where the stateful banded-LSH operator provably emits the same
    // pair set as batch minhashLshPairs (StreamingSpec equivalence),
    // so d03's oracle formulation applies verbatim. maxPerBucket is
    // lifted above the corpus size: the admission cap is a skew
    // defense, and a capped bucket would (by design) trade recall —
    // the contract row pins the uncapped semantics
    "d20_stream_neardedup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val tmp = java.nio.file.Files.createTempDirectory("graft_d20_")
      val src = tmp.resolve("src").toString
      docs(s, dir).select(col("doc_id"), col("text"))
        .repartition(4).write.parquet(src)
      val sch = s.read.parquet(src).schema
      // bounded state-partition clone (Ingest.streamSession doc): the
      // banded-LSH state op committed 32 store deltas per band per
      // trigger × 4 triggers
      val ss = graft.sources.Ingest.streamSession(s)
      val stream = ss.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .withColumn("arrival",
          timestamp_seconds(lit(1700000000L) + col("doc_id")))
      val sink = s"d20_sink_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = Dedup.streamNearDedup(stream, "text", "doc_id", "arrival",
          "1 hour", bands = 4, threshold = 0.5, portable = true,
          maxPerBucket = 1 << 20, maxStoredHashes = 1 << 20)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // band collisions emit a pair once per shared bucket with the
      // SAME exact jaccard — distinct like the batch operator
      ss.table(sink)
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"), r4(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // per-source doc-length quantiles from the mergeable log-histogram
    // sketch: 320 B of state per group regardless of row count
    "t27_quantile_sketch" -> ((s, dir) => {
      Sketches.histQuantiles(docs(s, dir), "source", "n_chars")
        .select(col("source"), col("total"), r4(col("p50")).as("p50"),
          r4(col("p90")).as("p90"), r4(col("p99")).as("p99"))
        .orderBy("source")
    }),

    // pairwise source-vocabulary overlap from KMV (bottom-256)
    // sketches — the set-INTERSECTION estimate HLL cannot give;
    // exact counts ride along so the estimator error is visible
    "t28_kmv_overlap" -> ((s, dir) => {
      val hashed = docs(s, dir)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("source"),
          TextAnalysis.hash60(col("tok"), portable = true).as("h"))
      val hset = hashed.distinct()
      val est = Sketches.kmvOverlap(
        Sketches.kmvSketches(hashed, "source", "h", k = 256), k = 256)
      val sizes = hset.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = hset.as("x")
        .join(hset.as("y"),
          col("x.h") === col("y.h") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      est
        .join(inter, Seq("src_a", "src_b"), "left")
        .join(broadcast(sizes.withColumnRenamed("source", "src_a")
          .withColumnRenamed("n", "na")), Seq("src_a"))
        .join(broadcast(sizes.withColumnRenamed("source", "src_b")
          .withColumnRenamed("n", "nb")), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("k2").cast("long").as("k2"),
          col("n_shared_bk"), r4(col("union_est")).as("union_est"),
          r4(col("jaccard_est")).as("jaccard_est"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          r4(coalesce(col("n_inter"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)))
              .cast("double")).as("jaccard"))
        .orderBy("src_a", "src_b")
    }),

    // gap-based sessionization of the interaction log into per-user
    // episodes (30-minute inactivity gap)
    "e01_sessionize" -> ((s, dir) => {
      Trajectories.sessionStats(
          graft.model.Points.rawEvents(s, dir), gapMs = 1800000L)
        .select(col("user_id"), col("session_idx"), col("n_events"),
          col("start_ts"), col("end_ts"), col("dur_ms"),
          r4(col("sum_v")).as("sum_v"), col("n_types"))
        .orderBy("user_id", "session_idx")
    }),

    // ordered funnel view → click → purchase within 7 days of entry
    "e02_funnel" -> ((s, dir) => {
      Trajectories.funnel(graft.model.Points.rawEvents(s, dir),
          Seq("view", "click", "purchase"), windowMs = 604800000L)
        .orderBy("stage_idx")
    })
  )

  def oracles: Map[String, String] = Map(

    "d01_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
           count(*) AS n_docs
         FROM documents GROUP BY md5(text) ORDER BY content_hash""",

    "d11_segment_dedup" ->
      s"""WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         c AS (
           SELECT doc_id, unnest(list_transform(range(0, len(tk), 8),
             s -> struct_pack(
               st := s,
               ck := array_to_string(list_slice(tk, CAST(s + 1 AS INT),
                 CAST(least(s + 8, len(tk)) AS INT)), ' ')))) AS ch
           FROM t WHERE len(tk) > 0),
         seg AS (
           SELECT doc_id, ch.st AS start, ch.ck AS segment,
             ${oH60("ch.ck")} AS h
           FROM c),
         kept AS (
           SELECT doc_id, start, segment FROM (
             SELECT doc_id, start, segment,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, start)
                 AS rn
             FROM seg) WHERE rn = 1),
         pa AS (SELECT doc_id, count(*) AS n_seg FROM seg GROUP BY doc_id),
         pk AS (SELECT doc_id, count(*) AS n_kept,
             string_agg(segment, ' ' ORDER BY start) AS dedup_text
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id, coalesce(pa.n_seg, 0) AS n_seg,
           coalesce(pk.n_kept, 0) AS n_kept,
           coalesce(pk.dedup_text, '') AS dedup_text
         FROM (SELECT DISTINCT doc_id FROM documents) d
         LEFT JOIN pa USING (doc_id) LEFT JOIN pk USING (doc_id)
         ORDER BY doc_id""",

    "d16_boilerplate" ->
      s"""WITH t AS (
           SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         c AS (
           SELECT doc_id, source,
             unnest(list_transform(range(0, len(tk), 3),
             s -> struct_pack(
               st := s,
               ck := array_to_string(list_slice(tk, CAST(s + 1 AS INT),
                 CAST(least(s + 3, len(tk)) AS INT)), ' ')))) AS ch
           FROM t WHERE len(tk) > 0),
         seg AS (
           SELECT doc_id, source, ch.st AS start, ch.ck AS segment,
             ${oH60("ch.ck")} AS h
           FROM c),
         freq AS (
           SELECT source, h, count(DISTINCT doc_id) AS seg_df
           FROM seg GROUP BY source, h),
         flagged AS (
           SELECT seg.doc_id, seg.start, seg.segment,
             freq.seg_df >= 2 AS boiler
           FROM seg JOIN freq ON freq.source = seg.source
             AND freq.h = seg.h),
         pa AS (
           SELECT doc_id, count(*) AS n_seg,
             count(CASE WHEN NOT boiler THEN 1 END) AS n_kept,
             coalesce(string_agg(CASE WHEN NOT boiler THEN segment END,
               ' ' ORDER BY start), '') AS clean_text
           FROM flagged GROUP BY doc_id)
         SELECT d.doc_id, coalesce(pa.n_seg, 0) AS n_seg,
           coalesce(pa.n_kept, 0) AS n_kept,
           coalesce(pa.clean_text, '') AS clean_text
         FROM (SELECT DISTINCT doc_id FROM documents) d
         LEFT JOIN pa USING (doc_id)
         ORDER BY doc_id""",

    "d02_ngram_jaccard" ->
      s"""$O_SH,
         hpost0 AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         dfq AS (SELECT h, count(*) AS df FROM hpost0 GROUP BY h),
         hpost AS (SELECT hpost0.doc_id, hpost0.h FROM hpost0
           JOIN dfq ON dfq.h = hpost0.h WHERE dfq.df <= ${Dedup.DEFAULT_MAX_DF}),
         sizes AS (SELECT doc_id, count(*) AS sz FROM hpost GROUP BY doc_id),
         shared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM hpost a JOIN hpost b
             ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT id_a, id_b,
           (sign(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared)) * floor(abs(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared)) * 10000 + 0.5) / 10000) AS jaccard
         FROM shared JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5
         ORDER BY id_a, id_b""",

    "d13_containment" ->
      s"""$O_SH,
         chpost0 AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         cdfq AS (SELECT h, count(*) AS df FROM chpost0 GROUP BY h),
         chpost AS (SELECT chpost0.doc_id, chpost0.h FROM chpost0
           JOIN cdfq ON cdfq.h = chpost0.h
           WHERE cdfq.df <= ${Dedup.DEFAULT_MAX_DF}),
         csizes AS (SELECT doc_id, count(*) AS sz FROM chpost
           GROUP BY doc_id),
         cshared AS (
           SELECT a.doc_id AS id, b.doc_id AS id_in, count(*) AS shared
           FROM chpost a JOIN chpost b
             ON a.h = b.h AND a.doc_id <> b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT id, id_in,
           (sign(CAST(shared AS DOUBLE) / sz) * floor(abs(CAST(shared AS DOUBLE) / sz) * 10000 + 0.5) / 10000) AS containment
         FROM cshared JOIN csizes ON csizes.doc_id = id
         WHERE CAST(shared AS DOUBLE) / sz >= 0.8
         ORDER BY id, id_in""",

    "d15_dup_spans" ->
      s"""WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         w AS (
           SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 8 THEN
               list_transform(range(0, len(tk) - 8 + 1),
                 i -> array_to_string(list_slice(tk,
                   CAST(i + 1 AS INT), CAST(i + 8 AS INT)), ' '))
               ELSE [] END) AS win
           FROM t),
         h AS (SELECT doc_id, ${oH60("win")} AS h FROM w),
         c AS (SELECT h, count(*) AS n FROM h GROUP BY h),
         p AS (
           SELECT doc_id, count(*) AS n_windows,
             sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS n_dup
           FROM h JOIN c USING (h) GROUP BY doc_id)
         SELECT d.doc_id,
           coalesce(p.n_windows, 0) AS n_windows,
           CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup,
           CAST(CASE WHEN coalesce(p.n_windows, 0) = 0 THEN 0
             ELSE (20000 * p.n_dup + p.n_windows) // (2 * p.n_windows)
             END AS BIGINT) AS dup_frac_bp
         FROM (SELECT doc_id FROM documents) d
         LEFT JOIN p USING (doc_id) ORDER BY doc_id""",

    "d18_screen_snapshot" ->
      s"""WITH docs2 AS (
           SELECT doc_id, text, 'c' AS side FROM documents
           WHERE doc_id % 5 <> 0
           UNION ALL
           SELECT doc_id + 100000, text, 'a' FROM documents
           WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 200000, text, 'a' FROM documents
           WHERE doc_id % 50 = 1),
         toks AS (
           SELECT doc_id, side,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM docs2),
         sh AS (
           SELECT doc_id, side, CASE WHEN len(tk) >= 3
             THEN list_distinct(list_transform(range(len(tk) - 2),
               i -> tk[CAST(i AS INT) + 1] || ' ' || tk[CAST(i AS INT) + 2]
                 || ' ' || tk[CAST(i AS INT) + 3]))
             ELSE [array_to_string(tk, ' ')] END AS sh
           FROM toks),
         hpost AS (
           SELECT DISTINCT doc_id, side, ${oH32("term")} AS h
           FROM (SELECT doc_id, side, unnest(sh) AS term FROM sh)),
         params AS (SELECT * FROM (VALUES
           (0, 836603681, 1), (1, 442543251, 7), (2, 1004818243, 13),
           (3, 668265263, 31), (4, 374761393, 97), (5, 741103597, 41),
           (6, 988021567, 151), (7, 540483477, 65537)) p(i, a, b)),
         sig AS (
           SELECT doc_id, side, i, min((h * a + b) % 4294967291) AS mh
           FROM hpost CROSS JOIN params GROUP BY doc_id, side, i),
         band AS (
           SELECT doc_id, side, i // 2 AS band,
             string_agg(mh::VARCHAR, '_' ORDER BY i) AS key
           FROM sig GROUP BY doc_id, side, i // 2),
         sizes AS (
           SELECT doc_id, side, count(*) AS sz FROM hpost
           GROUP BY doc_id, side),
         cand AS (
           SELECT DISTINCT x.doc_id AS id, y.doc_id AS cid
           FROM band x JOIN band y
             ON x.band = y.band AND x.key = y.key
           WHERE x.side = 'a' AND y.side = 'c'),
         shared AS (
           SELECT id, cid, count(*) AS shared
           FROM cand
             JOIN hpost a ON a.doc_id = cand.id AND a.side = 'a'
             JOIN hpost c ON c.doc_id = cand.cid AND c.side = 'c'
               AND c.h = a.h
           GROUP BY id, cid),
         near AS (
           SELECT id, min(cid) AS near_of
           FROM shared
             JOIN sizes sa ON sa.doc_id = id AND sa.side = 'a'
             JOIN sizes sc ON sc.doc_id = cid AND sc.side = 'c'
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sc.sz - shared) >= 0.35
           GROUP BY id),
         chash AS (
           SELECT md5(text) AS ch, min(doc_id) AS exact_of
           FROM docs2 WHERE side = 'c' GROUP BY 1),
         basex AS (
           SELECT a.doc_id AS id, c.exact_of
           FROM docs2 a LEFT JOIN chash c ON md5(a.text) = c.ch
           WHERE a.side = 'a')
         SELECT id, (exact_of IS NULL AND near_of IS NULL) AS keep,
           CASE WHEN exact_of IS NOT NULL THEN 'exact'
             WHEN near_of IS NOT NULL THEN 'near' END AS reason,
           coalesce(exact_of, near_of) AS dup_of
         FROM basex LEFT JOIN near USING (id) ORDER BY id""",

    "d17_winnow_pairs" ->
      s"""WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         sh AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 4 THEN
               list_transform(range(0, len(tk) - 4 + 1),
                 i -> array_to_string(list_slice(tk,
                   CAST(i + 1 AS INT), CAST(i + 4 AS INT)), ' '))
             WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
             ELSE [] END AS sg
           FROM t),
         hs AS (
           SELECT doc_id,
             list_transform(sg, g -> ${oH60("g")}) AS hh
           FROM sh),
         fp AS (
           SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(hh) >= 4 THEN
               list_transform(range(0, len(hh) - 4 + 1),
                 j -> list_min(list_slice(hh,
                   CAST(j + 1 AS INT), CAST(j + 4 AS INT))))
             WHEN len(hh) > 0 THEN [list_min(hh)] ELSE [] END) AS h
           FROM hs),
         dfq AS (SELECT h, count(*) AS df FROM fp GROUP BY h),
         post AS (SELECT fp.doc_id, fp.h FROM fp
           JOIN dfq ON dfq.h = fp.h WHERE dfq.df <= ${Dedup.DEFAULT_MAX_DF}),
         sizes AS (SELECT doc_id, count(*) AS sz FROM post GROUP BY doc_id),
         shared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM post a JOIN post b
             ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT id_a, id_b,
           (sign(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared)) * floor(abs(CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared)) * 10000 + 0.5) / 10000) AS jaccard
         FROM shared JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.35
         ORDER BY id_a, id_b""",

    "d14_semdedup" ->
      s"""WITH $oKmeansA2,
         sv AS (
           SELECT a2.vec_id AS id, a2.cluster, e.embedding AS vec,
             sqrt(list_sum(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
           FROM a2 JOIN e USING (vec_id)),
         dup AS (
           SELECT x.id AS id, min(y.id) AS dup_of
           FROM sv x JOIN sv y
             ON x.cluster = y.cluster AND y.id < x.id
           WHERE list_sum(list_transform(list_zip(x.vec, y.vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
             / (x.nrm * y.nrm) >= 0.35
           GROUP BY x.id)
         SELECT sv.id AS vec_id, sv.cluster,
           dup.dup_of IS NULL AS keep, dup.dup_of
         FROM sv LEFT JOIN dup ON dup.id = sv.id
         ORDER BY vec_id""",

    "d12_consensus_pairs" ->
      s"""$O_SH,
         jhpost0 AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         jdfq AS (SELECT h, count(*) AS df FROM jhpost0 GROUP BY h),
         jhpost AS (SELECT jhpost0.doc_id, jhpost0.h FROM jhpost0
           JOIN jdfq ON jdfq.h = jhpost0.h
           WHERE jdfq.df <= ${Dedup.DEFAULT_MAX_DF}),
         jsizes AS (SELECT doc_id, count(*) AS sz FROM jhpost
           GROUP BY doc_id),
         jshared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM jhpost a JOIN jhpost b
             ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id),
         jpairs AS (
           SELECT id_a, id_b FROM jshared
             JOIN jsizes sa ON sa.doc_id = id_a
             JOIN jsizes sb ON sb.doc_id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         mhpost AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         mparams AS (SELECT * FROM (VALUES
           (0, 836603681, 1), (1, 442543251, 7), (2, 1004818243, 13),
           (3, 668265263, 31), (4, 374761393, 97), (5, 741103597, 41),
           (6, 988021567, 151), (7, 540483477, 65537)) p(i, a, b)),
         msig AS (
           SELECT doc_id, i, min((h * a + b) % 4294967291) AS mh
           FROM mhpost CROSS JOIN mparams GROUP BY doc_id, i),
         mband AS (
           SELECT doc_id, i // 2 AS band,
             string_agg(mh::VARCHAR, '_' ORDER BY i) AS key
           FROM msig GROUP BY doc_id, i // 2),
         mcand AS (
           SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
           FROM mband x JOIN mband y
             ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         msizes AS (SELECT doc_id, count(*) AS sz FROM mhpost
           GROUP BY doc_id),
         mshared AS (
           SELECT id_a, id_b, count(*) AS shared
           FROM mcand
             JOIN mhpost a ON a.doc_id = mcand.id_a
             JOIN mhpost b ON b.doc_id = mcand.id_b AND b.h = a.h
           GROUP BY id_a, id_b),
         mpairs AS (
           SELECT id_a, id_b FROM mshared
             JOIN msizes sa ON sa.doc_id = id_a
             JOIN msizes sb ON sb.doc_id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         $oSimhashCand,
         spairs AS (
           SELECT id_a, id_b FROM cand
           WHERE bit_count(xor(sim_a, sim_b)) <= 3),
         allp AS (
           SELECT id_a, id_b, 'jaccard' AS det FROM jpairs
           UNION ALL SELECT id_a, id_b, 'minhash' FROM mpairs
           UNION ALL SELECT id_a, id_b, 'simhash' FROM spairs)
         SELECT id_a, id_b, count(*) AS n_detectors,
           string_agg(det, ',' ORDER BY det) AS detectors
         FROM allp GROUP BY id_a, id_b HAVING count(*) >= 2
         ORDER BY id_a, id_b""",

    "d09_lsh_eval" ->
      s"""$O_SH,
         hpost AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         sizes AS (SELECT doc_id, count(*) AS sz FROM hpost GROUP BY doc_id),
         tshared AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
           FROM hpost a JOIN hpost b ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id),
         truth AS (
           SELECT id_a, id_b FROM tshared
             JOIN sizes sa ON sa.doc_id = id_a
             JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         params AS (SELECT * FROM (VALUES
           (0, 836603681, 1), (1, 442543251, 7), (2, 1004818243, 13),
           (3, 668265263, 31), (4, 374761393, 97), (5, 741103597, 41),
           (6, 988021567, 151), (7, 540483477, 65537)) p(i, a, b)),
         sig AS (
           SELECT doc_id, i, min((h * a + b) % 4294967291) AS mh
           FROM hpost CROSS JOIN params GROUP BY doc_id, i),
         band AS (
           SELECT doc_id, i // 2 AS band,
             string_agg(mh::VARCHAR, '_' ORDER BY i) AS key
           FROM sig GROUP BY doc_id, i // 2),
         cand AS (
           SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
           FROM band x JOIN band y
             ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
         lshared AS (
           SELECT id_a, id_b, count(*) AS shared
           FROM cand
             JOIN hpost a ON a.doc_id = cand.id_a
             JOIN hpost b ON b.doc_id = cand.id_b AND b.h = a.h
           GROUP BY id_a, id_b),
         found AS (
           SELECT id_a, id_b FROM lshared
             JOIN sizes sa ON sa.doc_id = id_a
             JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(shared AS DOUBLE) / (sa.sz + sb.sz - shared) >= 0.5),
         eval AS (
           SELECT
             (SELECT count(*) FROM truth) AS n_true,
             (SELECT count(*) FROM found) AS n_found,
             (SELECT count(*) FROM truth JOIN found USING (id_a, id_b))
               AS n_correct)
         SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_found AS BIGINT) AS n_found,
           CAST(n_correct AS BIGINT) AS n_correct,
           (sign(CAST(n_correct AS DOUBLE) / n_found) * floor(abs(CAST(n_correct AS DOUBLE) / n_found) * 10000 + 0.5) / 10000) AS precision,
           (sign(CAST(n_correct AS DOUBLE) / n_true) * floor(abs(CAST(n_correct AS DOUBLE) / n_true) * 10000 + 0.5) / 10000) AS recall
         FROM eval""",

    "d08_decontaminate" ->
      s"""$O_SH,
         hpost AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         bench AS (SELECT DISTINCT h FROM hpost WHERE doc_id % 50 = 0),
         corp AS (SELECT doc_id, h FROM hpost WHERE doc_id % 50 <> 0)
         SELECT corp.doc_id, count(*) AS n_contaminated
         FROM corp JOIN bench USING (h)
         GROUP BY corp.doc_id ORDER BY doc_id""",

    "t09_novelty" ->
      s"""$O_SH,
         hpost AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         dfq AS (SELECT h, count(*) AS df FROM hpost GROUP BY h)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           (sign(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*)) * floor(abs(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*)) * 10000 + 0.5) / 10000) AS novelty
         FROM hpost JOIN dfq USING (h)
         GROUP BY doc_id ORDER BY doc_id""",

    "d03_minhash_lsh" -> oLshPairsSql,

    // the streaming form equals the batch form inside the state
    // horizon (StreamingSpec equivalence proof), and the contract row
    // keeps every document inside it — same oracle formulation
    "d20_stream_neardedup" -> oLshPairsSql,

    "d04_simhash" ->
      s"""$O_SH,
         hashed AS (SELECT doc_id, ${oH32("term")} AS h FROM post),
         votes AS (
           SELECT doc_id, j,
             CASE WHEN sum(((h >> j) & 1) * 2 - 1) >= 0
               THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END AS bit
           FROM hashed CROSS JOIN range(32) t(j)
           GROUP BY doc_id, j)
         SELECT doc_id, CAST(sum(bit) AS BIGINT) AS simhash
         FROM votes GROUP BY doc_id ORDER BY doc_id""",

    "d06_simhash_pairs" ->
      s"""$O_SH, $oSimhashCand
         SELECT id_a, id_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
         ORDER BY id_a, id_b""",

    "d07_dedup_clusters" ->
      s"""${O_SH.replaceFirst("WITH ", "WITH RECURSIVE ")}, $oSimhashCand,
         pairs AS (
           SELECT id_a, id_b FROM cand
           WHERE bit_count(xor(sim_a, sim_b)) <= 3),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT src AS id, dst AS r FROM edges
           UNION
           SELECT reach.id, edges.dst
           FROM reach JOIN edges ON reach.r = edges.src)
         SELECT id AS doc_id, least(id, min(r)) AS keeper_id
         FROM reach GROUP BY id ORDER BY doc_id""",

    "d10_keep_best" ->
      s"""${O_SH.replaceFirst("WITH ", "WITH RECURSIVE ")}, $oSimhashCand,
         pairs AS (
           SELECT id_a, id_b FROM cand
           WHERE bit_count(xor(sim_a, sim_b)) <= 3),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT src AS id, dst AS r FROM edges
           UNION
           SELECT reach.id, edges.dst
           FROM reach JOIN edges ON reach.r = edges.src),
         comps AS (
           SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
         m AS (
           SELECT doc_id, len(tk) AS n_tokens,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
             CASE WHEN len(tk) = 0 THEN 0.0 ELSE
               CAST(len(list_filter(tk, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it'], x))) AS DOUBLE)
                 / len(tk) END AS stop_ratio,
             length(text) AS n_chars,
             CASE WHEN len(tk) = 0 THEN 0.0 ELSE
               CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
                 / len(tk) END AS avg_tok
           FROM toks),
         quality AS (
           SELECT doc_id, (sign((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
             + least(stop_ratio * 4.0, 1.0)
             + greatest(0.0, 1.0 - CAST(n_punct AS DOUBLE)
                 / greatest(n_chars, 1) * 10.0)
             + CASE WHEN avg_tok >= 3 AND avg_tok <= 8 THEN 1.0 ELSE 0.5 END)
             / 4.0) * floor(abs((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
             + least(stop_ratio * 4.0, 1.0)
             + greatest(0.0, 1.0 - CAST(n_punct AS DOUBLE)
                 / greatest(n_chars, 1) * 10.0)
             + CASE WHEN avg_tok >= 3 AND avg_tok <= 8 THEN 1.0 ELSE 0.5 END)
             / 4.0) * 10000 + 0.5) / 10000) AS q
           FROM m),
         ranked AS (
           SELECT comps.comp, comps.id, quality.q,
             row_number() OVER
               (PARTITION BY comps.comp ORDER BY quality.q DESC, comps.id)
               AS rn,
             count(*) OVER (PARTITION BY comps.comp) AS n_members
           FROM comps JOIN quality ON quality.doc_id = comps.id)
         SELECT comp AS cluster_id, id AS keep_id, n_members, q AS quality
         FROM ranked WHERE rn = 1 ORDER BY cluster_id""",

    "d05_embedding_neardup" ->
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         exploded AS (
           ${(0 until 3).map(t =>
             s"SELECT vec_id, $t AS t, ${rhpBucketSql(6, 64, t * 6)} AS bkt FROM v")
             .mkString("\n           UNION ALL ")}),
         ok AS (
           SELECT t, bkt FROM exploded GROUP BY t, bkt
           HAVING count(*) <= ${Dedup.DEFAULT_MAX_BUCKET}),
         bucketed AS (
           SELECT e.* FROM exploded e JOIN ok USING (t, bkt)),
         cand AS (
           SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           FROM bucketed a JOIN bucketed b
             ON a.t = b.t AND a.bkt = b.bkt AND a.vec_id < b.vec_id),
         pairs AS (
           SELECT id_a, id_b,
             list_sum(list_transform(list_zip(va.embedding, vb.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(va.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(vb.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM cand JOIN v va ON va.vec_id = id_a
             JOIN v vb ON vb.vec_id = id_b)
         SELECT id_a, id_b, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos
         FROM pairs WHERE cos >= 0.35 ORDER BY id_a, id_b""",

    "s04_kmeans_cells" ->
      s"""WITH $oKmeansA2
         SELECT vec_id, cluster FROM a2 ORDER BY vec_id""",

    "s05_ivf_trained" ->
      s"""WITH $oKmeansA2,
         q AS (
           SELECT a2.vec_id AS q_id, e.embedding AS q_vec,
             a2.cluster AS q_cell
           FROM a2 JOIN e USING (vec_id) WHERE a2.vec_id < 3),
         corp AS (
           SELECT a2.vec_id, e.embedding, a2.cluster
           FROM a2 JOIN e USING (vec_id)),
         scored AS (
           SELECT q.q_id, corp.vec_id,
             list_sum(list_transform(list_zip(corp.embedding, q.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(corp.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM corp JOIN q
             ON corp.cluster = q.q_cell AND corp.vec_id <> q.q_id),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s07_ivf_multiprobe" ->
      s"""WITH $oKmeansA2,
         q AS (
           SELECT e.vec_id AS q_id, e.embedding AS q_vec
           FROM e WHERE e.vec_id < 3),
         qp AS (
           SELECT vec_id AS q_id, cluster FROM a2r
           WHERE rn <= 2 AND vec_id < 3),
         corp AS (
           SELECT a2.vec_id, e.embedding, a2.cluster
           FROM a2 JOIN e USING (vec_id)),
         scored AS (
           SELECT q.q_id, corp.vec_id,
             list_sum(list_transform(list_zip(corp.embedding, q.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(corp.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM corp JOIN qp ON corp.cluster = qp.cluster
             JOIN q ON q.q_id = qp.q_id AND corp.vec_id <> q.q_id),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s08_pq_adc_topk" ->
      s"""WITH ${oPqSub("p0", 1, 32)},
         ${oPqSub("p1", 33, 64)},
         summed AS (
           SELECT a0.q_id, a0.vec_id, a0.d + a1.d AS adc
           FROM p0adc a0 JOIN p1adc a1 USING (q_id, vec_id)
           WHERE vec_id <> q_id),
         ranked AS (
           SELECT q_id, vec_id, adc, row_number() OVER
             (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
           FROM summed)
         SELECT q_id, vec_id, (sign(adc) * floor(abs(adc) * 10000 + 0.5) / 10000) AS adc, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s09_ivf_pq_topk" -> ivfPqOracleSql,

    "s13_ann_recall" ->
      s"""WITH $oKmeansA2,
         ${oPqSub("p0", 1, 32)},
         ${oPqSub("p1", 33, 64)},
         summed AS (
           SELECT a0.q_id, a0.vec_id, a0.d + a1.d AS adc
           FROM p0adc a0 JOIN p1adc a1 USING (q_id, vec_id)
           WHERE vec_id <> q_id),
         cellok AS (
           SELECT s.q_id, s.vec_id, s.adc
           FROM summed s
             JOIN a2 cq ON cq.vec_id = s.q_id
             JOIN a2 cc ON cc.vec_id = s.vec_id
           WHERE cq.cluster = cc.cluster),
         approx5 AS (
           SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id, row_number() OVER
               (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
             FROM cellok) t WHERE rank <= 5),
         escore AS (
           SELECT q.vec_id AS q_id, c.vec_id,
             list_sum(list_transform(list_zip(c.embedding, q.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(c.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM e c CROSS JOIN e q
           WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
         exact5 AS (
           SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id, row_number() OVER
               (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
             FROM escore) t WHERE rank <= 5)
         SELECT exact5.q_id, count(approx5.vec_id) AS n_match,
           (sign(CAST(count(approx5.vec_id) AS DOUBLE) / 5) * floor(abs(CAST(count(approx5.vec_id) AS DOUBLE) / 5) * 10000 + 0.5) / 10000) AS recall
         FROM exact5 LEFT JOIN approx5 USING (q_id, vec_id)
         GROUP BY exact5.q_id ORDER BY q_id""",

    "s21_matryoshka_recall" -> {
      def cosSub(eVec: String, qVec: String): String =
        s"""SELECT q.q_id, e.vec_id,
             list_sum(list_transform(list_zip($eVec, $qVec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform($eVec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform($qVec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id"""
      def ranked(sub: String): String =
        s"""(SELECT q_id, vec_id, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM ($sub) t)"""
      val approx = Seq(8, 16, 32).map(d =>
        s"""SELECT $d AS dim, q_id, vec_id FROM ${ranked(
          cosSub(s"e.embedding[1:$d]", s"q.q_vec[1:$d]"))} r
           WHERE rank <= 5""").mkString("\nUNION ALL\n")
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
           FROM embeddings WHERE vec_id < 3),
         exact AS (
           SELECT q_id, vec_id FROM ${ranked(
        cosSub("e.embedding", "q.q_vec"))} r WHERE rank <= 5),
         approx AS ($approx),
         m AS (
           SELECT d.dim, e.q_id, count(*) AS n_exact,
             CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_match
           FROM exact e CROSS JOIN (VALUES (8), (16), (32)) d(dim)
           LEFT JOIN approx a ON a.dim = d.dim AND a.q_id = e.q_id
             AND a.vec_id = e.vec_id
           GROUP BY 1, 2)
         SELECT dim, q_id, n_match,
           (sign(CAST(n_match AS DOUBLE) / n_exact)
             * floor(abs(CAST(n_match AS DOUBLE) / n_exact)
               * 10000 + 0.5) / 10000) AS recall
         FROM m ORDER BY dim, q_id"""
    },

    // s13's approximate list re-derived WITH ranks, graded against
    // the exact top-5 (rel = 6 - exact rank): nDCG@5 + MRR
    "s18_ranking_eval" ->
      s"""WITH $oKmeansA2,
         ${oPqSub("p0", 1, 32)},
         ${oPqSub("p1", 33, 64)},
         summed AS (
           SELECT a0.q_id, a0.vec_id, a0.d + a1.d AS adc
           FROM p0adc a0 JOIN p1adc a1 USING (q_id, vec_id)
           WHERE vec_id <> q_id),
         cellok AS (
           SELECT s.q_id, s.vec_id, s.adc
           FROM summed s
             JOIN a2 cq ON cq.vec_id = s.q_id
             JOIN a2 cc ON cc.vec_id = s.vec_id
           WHERE cq.cluster = cc.cluster),
         approx5 AS (
           SELECT q_id, vec_id, rank FROM (
             SELECT q_id, vec_id, row_number() OVER
               (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
             FROM cellok) t WHERE rank <= 5),
         escore AS (
           SELECT q.vec_id AS q_id, c.vec_id,
             list_sum(list_transform(list_zip(c.embedding, q.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(c.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM e c CROSS JOIN e q
           WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id),
         exact5 AS (
           SELECT q_id, vec_id, CAST(6 - rank AS DOUBLE) AS rel FROM (
             SELECT q_id, vec_id, row_number() OVER
               (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
             FROM escore) t WHERE rank <= 5),
         got AS (
           SELECT a.q_id,
             sum(coalesce(e.rel, 0.0) / log2(a.rank + 1)) AS dcg,
             min(CASE WHEN coalesce(e.rel, 0.0) > 0 THEN a.rank END) AS fr
           FROM approx5 a LEFT JOIN exact5 e USING (q_id, vec_id)
           GROUP BY a.q_id),
         ideal AS (
           SELECT q_id, sum(rel / log2(i + 1)) AS idcg FROM (
             SELECT q_id, rel, row_number() OVER
               (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS i
             FROM exact5) t GROUP BY q_id),
         fin AS (
           SELECT got.q_id,
             coalesce(got.dcg / ideal.idcg, 0.0) AS ndcg,
             coalesce(1.0 / got.fr, 0.0) AS mrr
           FROM got LEFT JOIN ideal USING (q_id))
         SELECT q_id,
           (sign(ndcg) * floor(abs(ndcg) * 10000 + 0.5) / 10000) AS ndcg,
           (sign(mrr) * floor(abs(mrr) * 10000 + 0.5) / 10000) AS mrr
         FROM fin ORDER BY q_id""",

    // the persisted-index path serves the SAME computation as s09 —
    // one oracle proves both the in-session plan and the index
    // round-trip (train → store → reload → query)
    "s12_pq_index_topk" -> ivfPqOracleSql,

    // per-dim min/range bounds → byte codes → asymmetric decode +
    // squared-L2, same 1e-6 rounding and (distance, id) tie-break as
    // the Spark side
    "s15_sq8_topk" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
         b AS (
           SELECT i.i AS pos,
             min(CAST(e.embedding[CAST(i.i AS INT)] AS DOUBLE)) AS mn,
             max(CAST(e.embedding[CAST(i.i AS INT)] AS DOUBLE)) AS mx
           FROM e CROSS JOIN range(1, 65) i(i) GROUP BY i.i),
         bl AS (
           SELECT list(mn ORDER BY pos) AS mins,
             list(mx - mn ORDER BY pos) AS scs
           FROM b),
         codes AS (
           SELECT vec_id, list_transform(range(1, 65), j ->
             CASE WHEN scs[CAST(j AS INT)] = 0 THEN 0
               ELSE CAST(floor(
                 (CAST(embedding[CAST(j AS INT)] AS DOUBLE)
                   - mins[CAST(j AS INT)]) / scs[CAST(j AS INT)]
                   * 255.0 + 0.5) AS INT) END) AS codes
           FROM e CROSS JOIN bl),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id,
             floor(list_sum(list_transform(range(1, 65), j ->
               (CAST(q.embedding[CAST(j AS INT)] AS DOUBLE)
                 - (mins[CAST(j AS INT)]
                    + CAST(c.codes[CAST(j AS INT)] AS DOUBLE) / 255.0
                      * scs[CAST(j AS INT)]))
               * (CAST(q.embedding[CAST(j AS INT)] AS DOUBLE)
                 - (mins[CAST(j AS INT)]
                    + CAST(c.codes[CAST(j AS INT)] AS DOUBLE) / 255.0
                      * scs[CAST(j AS INT)]))))
               * 1000000 + 0.5) / 1000000 AS sqd
           FROM codes c
             CROSS JOIN (SELECT vec_id, embedding FROM e
               WHERE vec_id < 3) q
             CROSS JOIN bl
           WHERE c.vec_id <> q.vec_id),
         ranked AS (
           SELECT q_id, vec_id, sqd, row_number() OVER
             (PARTITION BY q_id ORDER BY sqd, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(sqd) * floor(abs(sqd) * 10000 + 0.5) / 10000) AS sqd, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    // SQ8 scoring under the kmeans cell restriction: s15's bounds →
    // codes → asymmetric decode CTEs composed with oKmeansA2's
    // deterministic cell assignment
    "s16_ivf_sq8" ->
      s"""WITH $oKmeansA2,
         b AS (
           SELECT i.i AS pos,
             min(CAST(e.embedding[CAST(i.i AS INT)] AS DOUBLE)) AS mn,
             max(CAST(e.embedding[CAST(i.i AS INT)] AS DOUBLE)) AS mx
           FROM e CROSS JOIN range(1, 65) i(i) GROUP BY i.i),
         bl AS (
           SELECT list(mn ORDER BY pos) AS mins,
             list(mx - mn ORDER BY pos) AS scs
           FROM b),
         codes AS (
           SELECT vec_id, list_transform(range(1, 65), j ->
             CASE WHEN scs[CAST(j AS INT)] = 0 THEN 0
               ELSE CAST(floor(
                 (CAST(embedding[CAST(j AS INT)] AS DOUBLE)
                   - mins[CAST(j AS INT)]) / scs[CAST(j AS INT)]
                   * 255.0 + 0.5) AS INT) END) AS codes
           FROM e CROSS JOIN bl),
         scored AS (
           SELECT q.vec_id AS q_id, c.vec_id,
             floor(list_sum(list_transform(range(1, 65), j ->
               (CAST(q.embedding[CAST(j AS INT)] AS DOUBLE)
                 - (mins[CAST(j AS INT)]
                    + CAST(c.codes[CAST(j AS INT)] AS DOUBLE) / 255.0
                      * scs[CAST(j AS INT)]))
               * (CAST(q.embedding[CAST(j AS INT)] AS DOUBLE)
                 - (mins[CAST(j AS INT)]
                    + CAST(c.codes[CAST(j AS INT)] AS DOUBLE) / 255.0
                      * scs[CAST(j AS INT)]))))
               * 1000000 + 0.5) / 1000000 AS sqd
           FROM codes c
             CROSS JOIN (SELECT vec_id, embedding FROM e
               WHERE vec_id < 3) q
             CROSS JOIN bl
           WHERE c.vec_id <> q.vec_id),
         cellok AS (
           SELECT s.q_id, s.vec_id, s.sqd
           FROM scored s
             JOIN a2 cq ON cq.vec_id = s.q_id
             JOIN a2 cc ON cc.vec_id = s.vec_id
           WHERE cq.cluster = cc.cluster),
         ranked AS (
           SELECT q_id, vec_id, sqd, row_number() OVER
             (PARTITION BY q_id ORDER BY sqd, vec_id) AS rank
           FROM cellok)
         SELECT q_id, vec_id, (sign(sqd) * floor(abs(sqd) * 10000 + 0.5) / 10000) AS sqd, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    // ADC top-10 shortlist (the s09 construction, deeper rank), then
    // exact cosine re-rank of only the shortlist rows
    "s14_pq_refine" ->
      s"""WITH $oKmeansA2,
         ${oPqSub("p0", 1, 32)},
         ${oPqSub("p1", 33, 64)},
         summed AS (
           SELECT a0.q_id, a0.vec_id, a0.d + a1.d AS adc
           FROM p0adc a0 JOIN p1adc a1 USING (q_id, vec_id)
           WHERE vec_id <> q_id),
         cellok AS (
           SELECT s.q_id, s.vec_id, s.adc
           FROM summed s
             JOIN a2 cq ON cq.vec_id = s.q_id
             JOIN a2 cc ON cc.vec_id = s.vec_id
           WHERE cq.cluster = cc.cluster),
         shortlist AS (
           SELECT q_id, vec_id FROM (
             SELECT q_id, vec_id, row_number() OVER
               (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
             FROM cellok) t WHERE rank <= 10),
         rescored AS (
           SELECT sl.q_id, sl.vec_id,
             list_sum(list_transform(list_zip(c.embedding, q.embedding),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(c.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM shortlist sl
             JOIN e c ON c.vec_id = sl.vec_id
             JOIN e q ON q.vec_id = sl.q_id),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM rescored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s10_ivf_pq_residual" ->
      s"""WITH $oKmeansA2,
         resid AS (
           SELECT e.vec_id,
             list_transform(list_zip(e.embedding, c1.cvec),
               z -> CAST(z[1] AS DOUBLE) - z[2]) AS embedding
           FROM e JOIN a2 USING (vec_id)
             JOIN c1 ON c1.cluster = a2.cluster),
         ${oPqSub("p0", 1, 32, "resid")},
         ${oPqSub("p1", 33, 64, "resid")},
         summed AS (
           SELECT a0.q_id, a0.vec_id, a0.d + a1.d AS adc
           FROM p0adc a0 JOIN p1adc a1 USING (q_id, vec_id)
           WHERE vec_id <> q_id),
         cellok AS (
           SELECT s.q_id, s.vec_id, s.adc
           FROM summed s
             JOIN a2 cq ON cq.vec_id = s.q_id
             JOIN a2 cc ON cc.vec_id = s.vec_id
           WHERE cq.cluster = cc.cluster),
         ranked AS (
           SELECT q_id, vec_id, adc, row_number() OVER
             (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
           FROM cellok)
         SELECT q_id, vec_id, (sign(adc) * floor(abs(adc) * 10000 + 0.5) / 10000) AS adc, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    // multi-probe residual IVF-PQ: probes = the 2 nearest cells per
    // query (a2r rn<=2, same rounded distance + cluster tie-break as
    // the engine), query residual recomputed PER PROBE against that
    // probe's centroid, ADC per subspace with the engine's 1e-6
    // rounding before the sum. The oPqSub codebook/code CTEs are
    // reused; its own adc CTE goes unused (per-probe residuals need a
    // probe-aware query side).
    "s11_ivf_pq_multiprobe" ->
      s"""WITH $oKmeansA2,
         resid AS (
           SELECT e.vec_id,
             list_transform(list_zip(e.embedding, c1.cvec),
               z -> CAST(z[1] AS DOUBLE) - z[2]) AS embedding
           FROM e JOIN a2 USING (vec_id)
             JOIN c1 ON c1.cluster = a2.cluster),
         ${oPqSub("p0", 1, 32, "resid")},
         ${oPqSub("p1", 33, 64, "resid")},
         qp AS (
           SELECT vec_id AS q_id, cluster FROM a2r
           WHERE rn <= 2 AND vec_id < 3),
         qres AS (
           SELECT qp.q_id, qp.cluster,
             list_transform(list_zip(e.embedding, c.cvec),
               z -> CAST(z[1] AS DOUBLE) - z[2]) AS rv
           FROM qp JOIN e ON e.vec_id = qp.q_id
             JOIN c1 c ON c.cluster = qp.cluster),
         scored AS (
           SELECT qres.q_id, pc0.vec_id,
             floor(list_sum(list_transform(list_zip(qres.rv[1:32], c0.cvec),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) * 1000000 + 0.5) / 1000000
             + floor(list_sum(list_transform(list_zip(qres.rv[33:64], cb1.cvec),
               z -> (z[1] - z[2]) * (z[1] - z[2]))) * 1000000 + 0.5) / 1000000
               AS adc
           FROM p0code pc0
             JOIN p1code pc1 ON pc1.vec_id = pc0.vec_id
             JOIN a2 ca ON ca.vec_id = pc0.vec_id
             JOIN qres ON qres.cluster = ca.cluster
               AND pc0.vec_id <> qres.q_id
             JOIN p0c1 c0 ON c0.cluster = pc0.code
             JOIN p1c1 cb1 ON cb1.cluster = pc1.code),
         ranked AS (
           SELECT q_id, vec_id, adc, row_number() OVER
             (PARTITION BY q_id ORDER BY adc, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(adc) * floor(abs(adc) * 10000 + 0.5) / 10000) AS adc, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s01_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
           FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.q_id, e.vec_id,
             list_sum(list_transform(list_zip(e.embedding, q.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""",

    "s19_bm25_topk" ->
      s"""$O_BM25
         SELECT q_id, doc_id,
           (sign(bm25) * floor(abs(bm25) * 10000 + 0.5) / 10000) AS bm25,
           rank
         FROM bm25_ranked WHERE rank <= 10 ORDER BY q_id, rank""",

    "s20_rrf_hybrid" ->
      s"""$O_BM25,
         cq AS (SELECT vec_id AS q_id, embedding AS q_vec
           FROM embeddings WHERE vec_id IN (0, 150, 300)),
         cos_scored AS (
           SELECT cq.q_id, e.vec_id AS doc_id,
             list_sum(list_transform(list_zip(e.embedding, cq.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(cq.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM embeddings e CROSS JOIN cq WHERE e.vec_id <> cq.q_id),
         cos_ranked AS (
           SELECT q_id, doc_id, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS rank
           FROM cos_scored),
         allr AS (
           SELECT q_id, doc_id, rank, 0 AS ranker
           FROM bm25_ranked WHERE rank <= 10
           UNION ALL
           SELECT q_id, doc_id, rank, 1 AS ranker
           FROM cos_ranked WHERE rank <= 10),
         fused AS (
           SELECT q_id, doc_id,
             list_sum(list(1.0 / (60 + rank) ORDER BY ranker)) AS rrf,
             count(*) AS n_rankers
           FROM allr GROUP BY 1, 2),
         franked AS (
           SELECT q_id, doc_id, rrf, n_rankers, row_number() OVER
             (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS frank
           FROM fused)
         SELECT q_id, doc_id,
           (sign(rrf) * floor(abs(rrf) * 10000 + 0.5) / 10000) AS rrf,
           frank AS rank, CAST(n_rankers AS BIGINT) AS n_rankers
         FROM franked WHERE frank <= 10 ORDER BY q_id, rank""",

    "s17_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec,
             label AS q_label
           FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.q_id, e.vec_id,
             list_sum(list_transform(list_zip(e.embedding, q.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM embeddings e CROSS JOIN q
           WHERE e.vec_id <> q.q_id
             AND e.label IN (q.q_label, q.q_label + 1)),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s02_ivf_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_cell
           FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.q_id, e.vec_id,
             list_sum(list_transform(list_zip(e.embedding, q.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM embeddings e JOIN q
             ON e.label = q.q_cell AND e.vec_id <> q.q_id),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s03_rhp_ann" ->
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         bucketed AS (
           ${(0 until 3).map(t =>
             s"SELECT vec_id, $t AS t, ${rhpBucketSql(6, 64, t * 6)} AS bkt FROM v")
             .mkString("\n           UNION ALL ")}),
         q AS (SELECT vec_id AS q_id, embedding AS q_vec
           FROM embeddings WHERE vec_id < 3),
         qb AS (SELECT vec_id AS q_id, t, bkt FROM bucketed WHERE vec_id < 3),
         cand AS (
           SELECT DISTINCT qb.q_id, b.vec_id
           FROM bucketed b JOIN qb
             ON b.t = qb.t AND b.bkt = qb.bkt AND b.vec_id <> qb.q_id),
         scored AS (
           SELECT cand.q_id, cand.vec_id,
             list_sum(list_transform(list_zip(e.embedding, q.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM cand JOIN v e ON e.vec_id = cand.vec_id
             JOIN q ON q.q_id = cand.q_id),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "s06_rhp_multiprobe" ->
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         bucketed AS (
           ${(0 until 3).map(t =>
             s"SELECT vec_id, $t AS t, ${rhpBucketSql(6, 64, t * 6)} AS bkt FROM v")
             .mkString("\n           UNION ALL ")}),
         q AS (SELECT vec_id AS q_id, embedding AS q_vec
           FROM embeddings WHERE vec_id < 3),
         qb0 AS (SELECT vec_id AS q_id, t, bkt FROM bucketed WHERE vec_id < 3),
         qb AS (
           SELECT q_id, t, CASE WHEN f = 0 THEN bkt
             ELSE xor(bkt, 1::BIGINT << CAST(f - 1 AS INT)) END AS bkt
           FROM qb0 CROSS JOIN range(7) r(f)),
         cand AS (
           SELECT DISTINCT qb.q_id, b.vec_id
           FROM bucketed b JOIN qb
             ON b.t = qb.t AND b.bkt = qb.bkt AND b.vec_id <> qb.q_id),
         scored AS (
           SELECT cand.q_id, cand.vec_id,
             list_sum(list_transform(list_zip(e.embedding, q.q_vec),
               z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) /
             (sqrt(list_sum(list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
              sqrt(list_sum(list_transform(q.q_vec,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
           FROM cand JOIN v e ON e.vec_id = cand.vec_id
             JOIN q ON q.q_id = cand.q_id),
         ranked AS (
           SELECT q_id, vec_id, cos, row_number() OVER
             (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, vec_id, (sign(cos) * floor(abs(cos) * 10000 + 0.5) / 10000) AS cos, rank
         FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""",

    "t01_text_stats" ->
      """WITH t AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         m AS (
           SELECT doc_id,
             len(tk) AS n_tokens,
             len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))
               + length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_bpeish,
             length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
             CASE WHEN len(tk) = 0 THEN 0.0 ELSE
               CAST(len(list_filter(tk, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it'], x))) AS DOUBLE)
                 / len(tk) END AS stop_ratio,
             length(text) AS n_chars,
             CASE WHEN len(tk) = 0 THEN 0.0 ELSE
               CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
                 / len(tk) END AS avg_tok
           FROM t)
         SELECT doc_id, n_tokens, n_bpeish, n_punct,
           (sign(stop_ratio) * floor(abs(stop_ratio) * 10000 + 0.5) / 10000) AS stop_ratio,
           (sign((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
             + least(stop_ratio * 4.0, 1.0)
             + greatest(0.0, 1.0 - CAST(n_punct AS DOUBLE)
                 / greatest(n_chars, 1) * 10.0)
             + CASE WHEN avg_tok >= 3 AND avg_tok <= 8 THEN 1.0 ELSE 0.5 END)
             / 4.0) * floor(abs((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
             + least(stop_ratio * 4.0, 1.0)
             + greatest(0.0, 1.0 - CAST(n_punct AS DOUBLE)
                 / greatest(n_chars, 1) * 10.0)
             + CASE WHEN avg_tok >= 3 AND avg_tok <= 8 THEN 1.0 ELSE 0.5 END)
             / 4.0) * 10000 + 0.5) / 10000) AS quality
         FROM m ORDER BY doc_id""",

    "t13_cdc_chunks" ->
      s"""WITH b AS (
           SELECT doc_id, text, length(text) AS n,
             list_filter(range(16, greatest(length(text), 16) + 1),
               i -> i <= length(text) AND
                 ${oH32("substr(text, CAST(i AS INT) - 15, 16)")} % 64 = 0)
               AS bnds
           FROM documents),
         c AS (
           SELECT doc_id, text, n,
             list_concat([CAST(1 AS BIGINT)],
               list_transform(bnds, x -> x + 1)) AS starts,
             list_concat(bnds, [CAST(n AS BIGINT)]) AS ends
           FROM b),
         e AS (
           SELECT doc_id, text, unnest(list_transform(range(0, len(ends)),
             j -> struct_pack(
               st := starts[CAST(j AS INT) + 1],
               ln := ends[CAST(j AS INT) + 1]
                 - starts[CAST(j AS INT) + 1] + 1))) AS ch
           FROM c),
         f AS (
           SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY ch.st) - 1
               AS chunk_ix,
             ch.st AS start, ch.ln AS n_chars,
             substr(text, CAST(ch.st AS INT), CAST(ch.ln AS INT)) AS chunk
           FROM e WHERE ch.ln > 0)
         SELECT doc_id, chunk_ix, start, n_chars,
           ${oH32("chunk")} AS chunk_hash
         FROM f ORDER BY doc_id, chunk_ix""",

    "t12_bpe_merges" ->
      """WITH toks AS (
           SELECT unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '')) AS w
           FROM documents),
         words AS (SELECT w, count(*) AS freq FROM toks GROUP BY w),
         pairs AS (
           SELECT unnest(list_transform(range(0, length(w) - 1),
             i -> substr(w, CAST(i AS INT) + 1, 2))) AS pair, freq
           FROM words WHERE length(w) >= 2)
         SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
         FROM pairs GROUP BY pair
         ORDER BY cnt DESC, pair LIMIT 20""",

    "t10_pii_scrub" ->
      s"""WITH seeded AS (
           SELECT doc_id, text ||
             ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
             CASE WHEN doc_id % 3 = 0 THEN ' cc admin@test.org' ELSE '' END ||
             ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
             CAST(doc_id * 7 % 256 AS VARCHAR) || '.' ||
             CAST(doc_id * 13 % 256 AS VARCHAR) ||
             CASE WHEN doc_id % 2 = 0 THEN ' tel 555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
             AS text
           FROM documents),
         scrub AS (
           SELECT doc_id,
             len(regexp_extract_all(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_email,
             len(regexp_extract_all(text,
               '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS n_ip,
             len(regexp_extract_all(text,
               '\\b[0-9]{3}-[0-9]{4}\\b')) AS n_phone,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
               '\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
               '\\b[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g') AS clean
           FROM seeded)
         SELECT doc_id, n_email, n_ip, n_phone,
           ${oH32("clean")} AS clean_hash
         FROM scrub ORDER BY doc_id""",

    "t11_chunks" ->
      s"""WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         c AS (
           SELECT doc_id, unnest(list_transform(range(0, len(tk), 48),
             s -> struct_pack(
               st := s,
               nt := least(s + 64, len(tk)) - s,
               ck := array_to_string(list_slice(tk, CAST(s + 1 AS INT),
                 CAST(least(s + 64, len(tk)) AS INT)), ' ')))) AS ch
           FROM t WHERE len(tk) > 0)
         SELECT doc_id, ch.st // 48 AS chunk_ix, ch.st AS start,
           ch.nt AS n_tok, ${oH32("ch.ck")} AS chunk_hash
         FROM c ORDER BY doc_id, chunk_ix""",

    "t02_langid" ->
      """WITH t AS (
           SELECT doc_id, lang,
             list_distinct(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS tk
           FROM documents),
         h AS (
           SELECT doc_id, lang,
             len(list_intersect(tk, ['der','die','das','und','ist','nicht','ein','zu'])) AS h_de,
             len(list_intersect(tk, ['the','and','of','to','is','in','that','it'])) AS h_en,
             len(list_intersect(tk, ['el','la','los','las','es','y','que','de'])) AS h_es,
             len(list_intersect(tk, ['le','la','les','et','est','que','une','dans'])) AS h_fr,
             len(list_intersect(tk, ['的','是','了','在','我','有','和','不'])) AS h_zh
           FROM t)
         SELECT doc_id, lang,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
             WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
             WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
             WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
             WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
             ELSE 'zh' END AS predicted,
           h_de, h_en, h_es, h_fr, h_zh
         FROM h ORDER BY doc_id""",

    "t03_fingerprint" ->
      s"""WITH sh AS (
           SELECT doc_id,
             list_transform(range(greatest(length(text) - 7, 1)),
               i -> substr(text, CAST(i AS INT) + 1, 8)) AS sgl
           FROM documents)
         SELECT doc_id,
           list_min(list_transform(sgl, s -> ${oH32("s")})) AS fp_min,
           len(list_distinct(sgl)) AS n_shingles
         FROM sh ORDER BY doc_id""",

    "m10_patchify" ->
      s"""WITH cell AS (
           SELECT doc_id, pr, pc,
             (pr * 2 + dy) * 4 + pc * 2 + dx AS p
           FROM (SELECT doc_id FROM documents)
             CROSS JOIN range(2) t1(pr) CROSS JOIN range(2) t2(pc)
             CROSS JOIN range(2) t3(dy) CROSS JOIN range(2) t4(dx)),
         px AS (
           SELECT doc_id, pr, pc,
             (doc_id * 3 + p * 7) % 256 AS r,
             (doc_id * 5 + p * 11) % 256 AS g,
             (doc_id * 7 + p * 13) % 256 AS b
           FROM cell),
         agg AS (
           SELECT doc_id, pr, pc, sum(r) AS sr, sum(g) AS sg, sum(b) AS sb
           FROM px GROUP BY doc_id, pr, pc),
         m AS (
           SELECT doc_id AS media_id, CAST(pr AS INT) AS patch_row,
             CAST(pc AS INT) AS patch_col,
             CAST(sr AS DOUBLE) / (4 * 255) AS mr,
             CAST(sg AS DOUBLE) / (4 * 255) AS mg,
             CAST(sb AS DOUBLE) / (4 * 255) AS mb
           FROM agg)
         SELECT media_id, patch_row, patch_col,
           (sign(mr) * floor(abs(mr) * 10000 + 0.5) / 10000) AS mean_r,
           (sign(mg) * floor(abs(mg) * 10000 + 0.5) / 10000) AS mean_g,
           (sign(mb) * floor(abs(mb) * 10000 + 0.5) / 10000) AS mean_b,
           (sign(0.299 * mr + 0.587 * mg + 0.114 * mb) *
             floor(abs(0.299 * mr + 0.587 * mg + 0.114 * mb) * 10000 + 0.5) / 10000) AS luma
         FROM m ORDER BY media_id, patch_row, patch_col""",

    // the 4×2 two-block P6 arithmetic: channel means average the two
    // blocks, the 2×2 luma resize samples pixels (0,0)/(2,0)/(0,1)/
    // (2,1) so feature 4 is block-1's luma; n_bytes = 11-byte header
    // + 24 pixel bytes, format/width/height from the decoded header
    "m01_media_meta" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
             CAST(doc_id % 256 AS DOUBLE) AS r1,
             CAST((doc_id * 5) % 256 AS DOUBLE) AS g1,
             CAST((doc_id * 9) % 256 AS DOUBLE) AS b1,
             CAST((doc_id * 3) % 256 AS DOUBLE) AS r2,
             CAST((doc_id * 7) % 256 AS DOUBLE) AS g2,
             CAST((doc_id * 11) % 256 AS DOUBLE) AS b2
           FROM documents),
         f AS (
           SELECT media_id,
             CAST(35 AS BIGINT) AS n_bytes,
             'image/ppm' AS format,
             CAST(4 AS INT) AS width, CAST(2 AS INT) AS height,
             (r1 + r2) / 2 / 255.0 AS v0,
             (g1 + g2) / 2 / 255.0 AS v1,
             (b1 + b2) / 2 / 255.0 AS v2,
             (0.299 * r1 + 0.587 * g1 + 0.114 * b1) / 255.0 AS v3
           FROM m)
         SELECT media_id, n_bytes, format, width, height,
           (sign(v0) * floor(abs(v0) * 10000 + 0.5) / 10000) AS f0,
           (sign(v1) * floor(abs(v1) * 10000 + 0.5) / 10000) AS f1,
           (sign(v2) * floor(abs(v2) * 10000 + 0.5) / 10000) AS f2,
           (sign(v3) * floor(abs(v3) * 10000 + 0.5) / 10000) AS f3
         FROM f ORDER BY media_id""",

    "t07_clean_corpus" ->
      """WITH t AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         m AS (
           SELECT doc_id, tk,
             len(tk) AS n_tokens,
             length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
             CASE WHEN len(tk) = 0 THEN 0.0 ELSE
               CAST(len(list_filter(tk, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it'], x))) AS DOUBLE)
                 / len(tk) END AS stop_ratio,
             length(text) AS n_chars,
             CASE WHEN len(tk) = 0 THEN 0.0 ELSE
               CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
                 / len(tk) END AS avg_tok
           FROM t),
         q AS (
           SELECT doc_id, tk,
             (least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
              + least(stop_ratio * 4.0, 1.0)
              + greatest(0.0, 1.0 - CAST(n_punct AS DOUBLE)
                  / greatest(n_chars, 1) * 10.0)
              + CASE WHEN avg_tok >= 3 AND avg_tok <= 8 THEN 1.0 ELSE 0.5 END)
             / 4.0 AS quality
           FROM m),
         h AS (
           SELECT doc_id, quality,
             len(list_intersect(list_distinct(tk), ['der','die','das','und','ist','nicht','ein','zu'])) AS h_de,
             len(list_intersect(list_distinct(tk), ['the','and','of','to','is','in','that','it'])) AS h_en,
             len(list_intersect(list_distinct(tk), ['el','la','los','las','es','y','que','de'])) AS h_es,
             len(list_intersect(list_distinct(tk), ['le','la','les','et','est','que','une','dans'])) AS h_fr,
             len(list_intersect(list_distinct(tk), ['的','是','了','在','我','有','和','不'])) AS h_zh
           FROM q),
         pred AS (
           SELECT doc_id, quality,
             CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
               WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
               WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
               WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
               WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
               ELSE 'zh' END AS predicted
           FROM h),
         keep AS (
           SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         SELECT p.doc_id, (sign(p.quality) * floor(abs(p.quality) * 10000 + 0.5) / 10000) AS quality
         FROM pred p JOIN keep k ON k.doc_id = p.doc_id
         WHERE p.quality >= 0.7 AND p.predicted = 'en'
         ORDER BY p.doc_id""",

    "t06_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             x -> x <> '')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, count(*) AS tf
           FROM toks GROUP BY doc_id, tok),
         dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, tok,
             tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
           FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
         r AS (
           SELECT doc_id, tok, tfidf, row_number() OVER
             (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
           FROM scored)
         SELECT doc_id, tok, (sign(tfidf) * floor(abs(tfidf) * 10000 + 0.5) / 10000) AS tfidf
         FROM r WHERE rn <= 3 ORDER BY doc_id, tok""",

    "t08_repetition" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         b AS (
           SELECT doc_id,
             CASE WHEN len(tk) >= 2
               THEN list_transform(range(len(tk) - 1),
                 i -> tk[CAST(i AS INT) + 1] || ' ' || tk[CAST(i AS INT) + 2])
               ELSE [] END AS bi,
             tk
           FROM t)
         SELECT doc_id,
           (sign(CASE WHEN len(bi) = 0 THEN 0.0 ELSE
             CAST(list_max(list_transform(list_distinct(bi),
               x -> len(list_filter(bi, y -> y = x)))) AS DOUBLE)
               / len(bi) END) * floor(abs(CASE WHEN len(bi) = 0 THEN 0.0 ELSE
             CAST(list_max(list_transform(list_distinct(bi),
               x -> len(list_filter(bi, y -> y = x)))) AS DOUBLE)
               / len(bi) END) * 10000 + 0.5) / 10000) AS top_bigram_frac,
           (sign(CASE WHEN len(tk) = 0 THEN 0.0 ELSE
             CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) END) * floor(abs(CASE WHEN len(tk) = 0 THEN 0.0 ELSE
             CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) END) * 10000 + 0.5) / 10000)
             AS type_token_ratio
         FROM b ORDER BY doc_id""",

    "t19_gopher_rules" ->
      """WITH w AS (
           SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\s+'),
               x -> x <> '') AS words,
             string_split(text, chr(10)) AS lines
           FROM documents),
         m AS (
           SELECT doc_id, len(words) AS n,
             CASE WHEN len(words) = 0 THEN 0.0 ELSE
               CAST(list_sum(list_transform(words, x -> len(x)))
                 AS DOUBLE) / len(words) END AS mean_len,
             (len(text) - len(replace(text, '#', '')))
               + len(regexp_extract_all(text, '\.\.\.')) AS symbols,
             CASE WHEN len(words) = 0 THEN 0.0 ELSE
               CAST(len(list_filter(words,
                 x -> regexp_matches(x, '[a-zA-Z]')))
                 AS DOUBLE) / len(words) END AS alpha_frac,
             len(list_filter(words, x -> list_contains(
               ['the','be','to','of','and','that','have','with'],
               lower(x)))) AS n_stops,
             CAST(len(list_filter(lines, l -> starts_with(l, '- ')
               OR starts_with(l, '* '))) AS DOUBLE) / len(lines)
               AS bullet_frac,
             CAST(len(list_filter(lines, l -> ends_with(l, '...')))
               AS DOUBLE) / len(lines) AS ellipsis_frac
           FROM w)
         SELECT doc_id,
           n BETWEEN 50 AND 100000 AS ok_words,
           mean_len BETWEEN 3.0 AND 10.0 AS ok_mean_word_len,
           CASE WHEN n = 0 THEN false ELSE
             CAST(symbols AS DOUBLE) / n <= 0.1 END AS ok_symbol_ratio,
           alpha_frac >= 0.8 AS ok_alpha_words,
           n_stops >= 2 AS ok_stopwords,
           bullet_frac <= 0.9 AS ok_bullets,
           ellipsis_frac <= 0.3 AS ok_ellipsis,
           (n BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
             AND (CASE WHEN n = 0 THEN false ELSE
               CAST(symbols AS DOUBLE) / n <= 0.1 END)
             AND alpha_frac >= 0.8 AND n_stops >= 2
             AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3 AS pass
         FROM m ORDER BY doc_id""",

    "t04_sample_bernoulli" ->
      s"""SELECT doc_id FROM documents
         WHERE ${oH32("'s42' || CAST(doc_id AS VARCHAR)")}
           < ${(0.1 * 4294967296.0).toLong}
         ORDER BY doc_id""",

    "t16_unigram_logprob" ->
      """WITH tk AS (
           SELECT doc_id,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS tok
           FROM documents),
         f AS (SELECT tok, count(*) AS tf FROM tk GROUP BY tok),
         t AS (SELECT CAST(sum(tf) AS BIGINT) AS T FROM f)
         SELECT doc_id, count(*) AS n_tok,
           (sign(avg(ln(tf) - ln(T))) * floor(abs(avg(ln(tf) - ln(T))) * 10000 + 0.5) / 10000) AS logprob
         FROM tk JOIN f USING (tok) CROSS JOIN t
         GROUP BY doc_id ORDER BY doc_id""",

    "t17_bigram_logprob" ->
      """WITH tk AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         bi AS (
           SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(range(1, len(tk)),
                 i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1])
               ELSE [] END) AS bg
           FROM tk),
         c2 AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg),
         c1 AS (
           SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
           FROM c2 GROUP BY 1),
         v AS (SELECT count(DISTINCT split_part(bg, ' ', 2)) AS V FROM bi)
         SELECT doc_id, count(*) AS n_bigram,
           (sign(avg(ln((c2 + 1.0) / (c1 + 1.0 * V)))) * floor(abs(avg(ln((c2 + 1.0) / (c1 + 1.0 * V)))) * 10000 + 0.5) / 10000) AS logprob
         FROM bi JOIN c2 USING (bg)
           JOIN c1 ON split_part(bi.bg, ' ', 1) = c1.w1
           CROSS JOIN v
         GROUP BY doc_id ORDER BY doc_id""",

    "t14_sequence_packing" ->
      s"""WITH t AS (
           SELECT doc_id,
             CAST(len(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS INT) AS n_tok,
             CAST(${oH32("'pack' || CAST(doc_id AS VARCHAR)")} % 8 AS INT)
               AS bucket
           FROM documents),
         c AS (
           SELECT doc_id, bucket, n_tok,
             CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM t)
         SELECT doc_id, bucket, n_tok,
           (cum - n_tok) // 64 AS pack,
           CAST((cum - n_tok) % 64 AS INT) AS pack_off
         FROM c ORDER BY doc_id""",

    // the sqrt path is IEEE-correctly-rounded in BOTH engines (unlike
    // pow), so the weight math mirrors exactly; threshold floor is the
    // same 2^32 grid as t15
    "t38_temperature_mix" ->
      s"""WITH n AS (SELECT count(*) AS n_total FROM documents),
         c AS (SELECT source, count(*) AS n_docs
           FROM documents GROUP BY source),
         t AS (SELECT c.source, c.n_docs,
             sqrt(CAST(c.n_docs AS DOUBLE) / n.n_total) AS p
           FROM c CROSS JOIN n),
         z AS (SELECT sum(p) AS zz FROM t),
         r AS (SELECT t.source,
             CAST(floor(least(1.0,
               (t.p / z.zz) * 0.3 * n.n_total / t.n_docs)
               * 4294967296.0) AS BIGINT) AS thresh
           FROM t CROSS JOIN z CROSS JOIN n)
         SELECT d.doc_id, d.source
         FROM documents d JOIN r ON d.source = r.source
         WHERE ${oH32("'tmix' || CAST(doc_id AS VARCHAR)")} < r.thresh
         ORDER BY d.doc_id""",

    "t15_domain_mix" ->
      s"""WITH n AS (SELECT count(*) AS n_total FROM documents),
         c AS (SELECT source, count(*) AS n_src
           FROM documents GROUP BY source),
         r AS (
           SELECT c.source,
             CAST(floor(least(1.0,
               CASE c.source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                 WHEN 'src2' THEN 0.2 ELSE 0.0 END
               * 0.2 * n.n_total / c.n_src) * 4294967296.0) AS BIGINT)
               AS thresh
           FROM c CROSS JOIN n)
         SELECT d.doc_id, d.source
         FROM documents d JOIN r ON d.source = r.source
         WHERE ${oH32("'mix42' || CAST(doc_id AS VARCHAR)")} < r.thresh
         ORDER BY d.doc_id""",

    "t22_bpe_segment" -> {
      // anchored space-padded replace chain == greedy left-to-right
      // merge application (exact on this corpus: no same-pair chains)
      val applyMerges = BPE_MERGES.foldLeft(
        "' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '") {
        case (acc, (a, b)) =>
          s"replace($acc, ' $a $b ', ' ${a + b} ')"
      }
      s"""WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         seg AS (
           SELECT doc_id,
             list_transform(tk, w -> trim($applyMerges)) AS ws
           FROM t)
         SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(ws,
             s -> len(string_split(s, ' ')))), 0) AS INT) AS n_pieces,
           array_to_string(ws, ' | ') AS pieces
         FROM seg ORDER BY doc_id"""
    },

    "t20_split_assign" ->
      s"""SELECT doc_id,
           CASE WHEN ${oH32("'sp42' || CAST(doc_id AS VARCHAR)")}
               < ${(0.8 * 4294967296.0).toLong} THEN 'train'
             WHEN ${oH32("'sp42' || CAST(doc_id AS VARCHAR)")}
               < ${(0.9 * 4294967296.0).toLong} THEN 'val'
             ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",

    "t39_split_leakage" ->
      s"""$O_SH,
         hpost AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         sp AS (SELECT doc_id,
           CASE WHEN ${oH32("'sp42' || CAST(doc_id AS VARCHAR)")}
               < ${(0.8 * 4294967296.0).toLong} THEN 'train'
             WHEN ${oH32("'sp42' || CAST(doc_id AS VARCHAR)")}
               < ${(0.9 * 4294967296.0).toLong} THEN 'val'
             ELSE 'test' END AS split
           FROM documents),
         hs AS (SELECT split, hpost.doc_id, h
           FROM hpost JOIN sp USING (doc_id)),
         train_h AS (SELECT DISTINCT h FROM hs WHERE split = 'train'),
         leaked AS (
           SELECT split, doc_id, count(*) AS n_shared
           FROM hs JOIN train_h USING (h)
           WHERE split <> 'train' GROUP BY 1, 2),
         tot AS (SELECT split, count(*) AS n_docs FROM sp
           WHERE split <> 'train' GROUP BY 1)
         SELECT tot.split, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(count(leaked.doc_id) AS BIGINT) AS n_leaked,
           (sign(CAST(count(leaked.doc_id) AS DOUBLE) / n_docs)
             * floor(abs(CAST(count(leaked.doc_id) AS DOUBLE) / n_docs)
               * 10000 + 0.5) / 10000) AS leak_rate,
           CAST(coalesce(max(n_shared), 0) AS BIGINT) AS max_shared
         FROM tot LEFT JOIN leaked ON leaked.split = tot.split
         GROUP BY tot.split, n_docs ORDER BY tot.split""",

    "t21_token_budget" ->
      s"""WITH t AS (
           SELECT doc_id,
             CAST(len(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS BIGINT) AS n_tok,
             ${oH32("'tb42' || CAST(doc_id AS VARCHAR)")} AS h
           FROM documents),
         c AS (
           SELECT doc_id, n_tok,
             CAST(sum(n_tok) OVER (ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM t)
         SELECT doc_id, n_tok, cum FROM c
         WHERE cum <= 10000 ORDER BY doc_id""",

    "t23_shuffle_order" ->
      s"""WITH h AS (
           SELECT doc_id,
             ${oH32("'epoch1' || CAST(doc_id AS VARCHAR)")} AS hh
           FROM documents)
         SELECT doc_id,
           row_number() OVER (ORDER BY hh, doc_id) - 1 AS pos
         FROM h ORDER BY doc_id""",

    "t24_dsir_sample" ->
      s"""WITH tk AS (
           SELECT doc_id, lang = 'en' AS t,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS tok
           FROM documents),
         bk AS (SELECT doc_id, t, ${oH32("tok")} % 64 AS b FROM tk),
         cnt AS (
           SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
             count(*) AS rc
           FROM bk GROUP BY b),
         tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM cnt),
         ratio AS (
           SELECT b, ln(tc + 1.0) - ln(tt + 64.0)
             - ln(rc + 1.0) + ln(rt + 64.0) AS lr
           FROM cnt CROSS JOIN tot),
         w AS (
           SELECT doc_id, count(*) AS n_tok, sum(lr) AS log_w
           FROM bk JOIN ratio USING (b) GROUP BY doc_id),
         keyed AS (
           SELECT doc_id, n_tok, log_w,
             floor((log_w - ln(-ln(
               (${oH32("'dsir' || CAST(doc_id AS VARCHAR)")} + 0.5)
                 / 4294967296.0))) * 1000000 + 0.5) / 1000000 AS k
           FROM w),
         sel AS (
           SELECT doc_id, n_tok, log_w FROM keyed
           ORDER BY k DESC, doc_id LIMIT 50)
         SELECT doc_id, n_tok, (sign(log_w) * floor(abs(log_w) * 10000 + 0.5) / 10000) AS log_w
         FROM sel ORDER BY doc_id""",

    // the hashed-logreg trainer unrolled: both GD steps re-derived in
    // SQL (iteration 1 collapses to p = 0.5 under w = 0), then the
    // scoring projection under the iteration-2 weights. b = 16 is the
    // intercept pseudo-feature
    "t29_classifier_score" ->
      s"""WITH base AS (
           SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tks
           FROM documents),
         nz AS (SELECT doc_id, y, tks, len(tks) AS n_tok
                FROM base WHERE len(tks) > 0),
         tk AS (SELECT doc_id, y, n_tok, unnest(tks) AS tok FROM nz),
         feat AS (
           SELECT doc_id, y, CAST(${oH32("tok")} % 16 AS INT) AS b,
             count(*) * 1.0 / n_tok AS x
           FROM tk GROUP BY doc_id, y, n_tok, b
           UNION ALL
           SELECT doc_id, y, 16 AS b, 1.0 AS x FROM nz),
         n AS (SELECT count(*) * 1.0 AS nd FROM nz),
         g1 AS (SELECT b, sum((0.5 - y) * x) AS g FROM feat GROUP BY b),
         w1 AS (SELECT b, -0.5 * g / nd AS w FROM g1 CROSS JOIN n),
         s2 AS (SELECT f.doc_id, f.y, sum(w1.w * f.x) AS s
                FROM feat f JOIN w1 USING (b) GROUP BY f.doc_id, f.y),
         r2 AS (SELECT doc_id, 1.0 / (1.0 + exp(-s)) - y AS r FROM s2),
         g2 AS (SELECT f.b, sum(r2.r * f.x) AS g
                FROM feat f JOIN r2 USING (doc_id) GROUP BY f.b),
         w2 AS (SELECT w1.b, w1.w - 0.5 * g2.g / nd AS w
                FROM w1 JOIN g2 USING (b) CROSS JOIN n),
         sco AS (
           SELECT t.doc_id, max(t.n_tok) AS n_tok,
             sum(w2.w) / max(t.n_tok) AS dot
           FROM tk t JOIN w2 ON w2.b = CAST(${oH32("t.tok")} % 16 AS INT)
           GROUP BY t.doc_id),
         fin AS (
           SELECT sco.doc_id, sco.n_tok,
             1.0 / (1.0 + exp(-(sco.dot + bias.w))) AS score
           FROM sco CROSS JOIN (SELECT w FROM w2 WHERE b = 16) bias)
         SELECT doc_id, n_tok,
           (sign(score) * floor(abs(score) * 10000 + 0.5) / 10000) AS score
         FROM fin ORDER BY doc_id""",

    // the WET extraction chain mirrored pass-for-pass on the same
    // synthesized page (patterns are RE2-safe by construction; &amp;
    // decodes LAST on both sides)
    "t30_html_extract" ->
      """WITH page AS (
           SELECT doc_id,
             '<!DOCTYPE html><html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
             '</title><style type="text/css">p { color: #333; }</style>' ||
             '<script>if (1 < 2 && 3 > 0) { var s = "<p>"; }</script></head>' ||
             '<body><!-- header --><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
             '</h1><p class="main">' ||
             replace(replace(text, '&', '&amp;'), '<', '&lt;') ||
             '</p><div>tail &amp;amp; &lt;end&gt;&nbsp;fin</div><!-- footer
 spans lines --></body></html>' AS h
           FROM documents),
         c1 AS (SELECT doc_id,
             regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g') AS h FROM page),
         c2 AS (SELECT doc_id, regexp_replace(h,
             '(?is)<script\b[^>]*>.*?</script[ \t\n\r]*>', ' ', 'g') AS h
           FROM c1),
         c3 AS (SELECT doc_id, regexp_replace(h,
             '(?is)<style\b[^>]*>.*?</style[ \t\n\r]*>', ' ', 'g') AS h
           FROM c2),
         c4 AS (SELECT doc_id,
             regexp_replace(h, '(?s)<[^>]*>', ' ', 'g') AS h FROM c3),
         c5 AS (SELECT doc_id,
             replace(replace(replace(replace(replace(replace(h,
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&apos;', ''''), '&#39;', ''''), '&nbsp;', ' ') AS h
           FROM c4),
         c6 AS (SELECT doc_id, replace(h, '&amp;', '&') AS h FROM c5),
         fin AS (SELECT doc_id,
             trim(regexp_replace(h, '[ \t\n\r\f]+', ' ', 'g')) AS text_plain
           FROM c6)
         SELECT doc_id, text_plain, length(text_plain) AS n_chars
         FROM fin ORDER BY doc_id""",

    // the URL normalization chain mirrored stage-for-stage on the
    // same synthesized messy URLs
    "t31_url_canonicalize" ->
      s"""WITH u AS (
           SELECT doc_id, $oSynthUrl AS url FROM documents),
         $oUrlCanonChain
         SELECT doc_id, url_canon, host, domain
         FROM fin ORDER BY doc_id""",

    // registered-domain derivation + the t05-style deterministic
    // salted-hash pick, capped at 5 per domain
    "t32_domain_cap" ->
      s"""WITH u AS (
           SELECT doc_id, $oSynthUrl AS url FROM documents),
         $oUrlCanonChain,
         hh AS (
           SELECT domain, doc_id,
             ${oH32("'d7' || CAST(doc_id AS VARCHAR)")} AS h
           FROM fin),
         r AS (
           SELECT domain, doc_id,
             row_number() OVER (PARTITION BY domain ORDER BY h, doc_id) AS rn
           FROM hh)
         SELECT domain, doc_id FROM r WHERE rn <= 5
         ORDER BY domain, doc_id""",

    // the fixed-weight scoring chain mirrored (hash -> bucket weight
    // CASE -> mean -> sigmoid -> 4dp round), then the equal-width
    // probability binning over the rounded scores
    "t36_calibration_bins" ->
      s"""WITH base AS (
           SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tks
           FROM documents),
         tk AS (
           SELECT doc_id, len(tks) AS n_tok, unnest(tks) AS tok
           FROM base WHERE len(tks) > 0),
         sco AS (
           SELECT doc_id,
             sum(CASE CAST(${oH32("tok")} % 8 AS INT)
               WHEN 0 THEN -1.2 WHEN 1 THEN 0.8 WHEN 2 THEN -0.4
               WHEN 3 THEN 1.5 WHEN 4 THEN 0.3 WHEN 5 THEN -0.9
               WHEN 6 THEN 0.6 ELSE -0.2 END) / max(n_tok) AS dot
           FROM tk GROUP BY doc_id),
         fin AS (
           SELECT b.doc_id, b.y,
             1.0 / (1.0 + exp(-(coalesce(s.dot, 0) + 0.1137))) AS score
           FROM base b LEFT JOIN sco s USING (doc_id)),
         rr AS (
           SELECT doc_id, y,
             (sign(score) * floor(abs(score) * 10000 + 0.5) / 10000)
               AS score_r
           FROM fin)
         SELECT least(CAST(floor(score_r * 10) AS INT), 9) AS bin,
           count(*) AS n,
           (sign(avg(score_r)) * floor(abs(avg(score_r)) * 10000 + 0.5) / 10000) AS mean_score,
           (sign(avg(y)) * floor(abs(avg(y)) * 10000 + 0.5) / 10000) AS frac_pos
         FROM rr GROUP BY 1 ORDER BY bin""",

    // the t17 LM-score chain feeding per-language discrete-percentile
    // thresholds (list_sort + 1-based pick at ceil(f*n), the same
    // float formula as the engine) and the three-way CASE
    "t35_ppl_buckets" ->
      """WITH tk AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         bi AS (
           SELECT doc_id,
             unnest(CASE WHEN len(tk) >= 2 THEN
               list_transform(range(1, len(tk)),
                 i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1])
               ELSE [] END) AS bg
           FROM tk),
         c2 AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg),
         c1 AS (
           SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
           FROM c2 GROUP BY 1),
         v AS (SELECT count(DISTINCT split_part(bg, ' ', 2)) AS V FROM bi),
         sc AS (
           SELECT doc_id,
             (sign(avg(ln((c2 + 1.0) / (c1 + 1.0 * V)))) * floor(abs(avg(ln((c2 + 1.0) / (c1 + 1.0 * V)))) * 10000 + 0.5) / 10000) AS score
           FROM bi JOIN c2 USING (bg)
             JOIN c1 ON split_part(bi.bg, ' ', 1) = c1.w1
             CROSS JOIN v
           GROUP BY doc_id),
         scl AS (
           SELECT s.doc_id, d.lang, s.score
           FROM sc s JOIN documents d USING (doc_id)),
         thr AS (
           SELECT lang,
             arr[CAST(ceil((1.0/3) * n) AS INT)] AS t0,
             arr[CAST(ceil((2.0/3) * n) AS INT)] AS t1
           FROM (SELECT lang, list_sort(list(score)) AS arr,
                   count(*) AS n
                 FROM scl GROUP BY lang))
         SELECT doc_id, lang, score,
           CASE WHEN score <= t0 THEN 'tail'
                WHEN score <= t1 THEN 'middle'
                ELSE 'head' END AS ppl_bucket
         FROM scl JOIN thr USING (lang)
         ORDER BY doc_id""",

    // per-family expected pay-level domain stated directly: the PSL
    // algorithm itself is pinned by the unit fuzz vs the heuristic;
    // this row pins the end-to-end broadcast-join plumbing
    "t34_psl_domain" ->
      s"""SELECT doc_id,
           CASE CAST(doc_id % 6 AS INT)
             WHEN 0 THEN 'docs.' || source || '.github.io'
             WHEN 1 THEN 'www.' || source || '.com.au'
             WHEN 2 THEN source || '.co.uk'
             WHEN 3 THEN 'sub.www.ck'
             WHEN 4 THEN 'a.b.' || source || '.ck'
             ELSE source || '.com'
           END AS host,
           CASE CAST(doc_id % 6 AS INT)
             WHEN 0 THEN source || '.github.io'
             WHEN 1 THEN source || '.com.au'
             WHEN 2 THEN source || '.co.uk'
             WHEN 3 THEN 'www.ck'
             WHEN 4 THEN 'b.' || source || '.ck'
             ELSE source || '.com'
           END AS registered_domain
         FROM documents ORDER BY doc_id""",

    // per-family expected pay-level domain against the FULL bundled
    // snapshot, stated directly (rule existence verified against
    // publicsuffix.org: s3.dualstack.ap-south-1.amazonaws.com,
    // *.compute.amazonaws.com.cn, !city.kawasaki.jp, *.kawasaki.jp,
    // schools.nsw.edu.au, s3.cn-north-1.amazonaws.com.cn,
    // pvt.k12.ma.us, blogspot.com)
    "t37_psl_full" ->
      s"""SELECT doc_id,
           CASE CAST(doc_id % 10 AS INT)
             WHEN 0 THEN source || '.s3.dualstack.ap-south-1.amazonaws.com'
             WHEN 1 THEN 'x.' || source || '.compute.amazonaws.com.cn'
             WHEN 2 THEN 'foo.city.kawasaki.jp'
             WHEN 3 THEN 'a.b.kawasaki.jp'
             WHEN 4 THEN source || '.schools.nsw.edu.au'
             WHEN 5 THEN 's3.cn-north-1.amazonaws.com.cn'
             WHEN 6 THEN 'www.' || source || '.qqq'
             WHEN 7 THEN 'a.b.c.' || source || '.com'
             WHEN 8 THEN source || '.pvt.k12.ma.us'
             ELSE source || '.blogspot.com'
           END AS host,
           CASE CAST(doc_id % 10 AS INT)
             WHEN 0 THEN source || '.s3.dualstack.ap-south-1.amazonaws.com'
             WHEN 1 THEN 'x.' || source || '.compute.amazonaws.com.cn'
             WHEN 2 THEN 'city.kawasaki.jp'
             WHEN 3 THEN 'a.b.kawasaki.jp'
             WHEN 4 THEN source || '.schools.nsw.edu.au'
             WHEN 5 THEN NULL
             WHEN 6 THEN source || '.qqq'
             WHEN 7 THEN source || '.com'
             WHEN 8 THEN source || '.pvt.k12.ma.us'
             ELSE source || '.blogspot.com'
           END AS registered_domain
         FROM documents ORDER BY doc_id""",

    // the intra-doc line dedup mirrored: positioned unnest, first
    // occurrence per (doc, line), ordered reassembly
    "t33_line_dedup" ->
      """WITH t AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS tk
           FROM documents),
         pg AS (
           SELECT doc_id,
             string_split(
               array_to_string(tk[1:5], ' ') || chr(10) ||
               array_to_string(tk[6:10], ' ') || chr(10) ||
               array_to_string(tk[1:5], ' ') || chr(10) ||
               'footer' || chr(10) ||
               array_to_string(tk[6:10], ' ') || chr(10) ||
               'footer', chr(10)) AS ls
           FROM t),
         ln AS (
           SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
             i -> struct_pack(pos := i,
               line := ls[CAST(i AS INT)]))) AS e
           FROM pg),
         l2 AS (SELECT doc_id, e.pos AS pos, e.line AS line FROM ln),
         fo AS (
           SELECT doc_id, line, min(pos) AS pos, count(*) AS occ
           FROM l2 GROUP BY doc_id, line),
         fin AS (
           SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_lines,
             count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS text_clean
           FROM fo GROUP BY doc_id)
         SELECT doc_id, n_lines, n_kept, text_clean
         FROM fin ORDER BY doc_id""",

    "t05_sample_stratified" ->
      s"""WITH h AS (
           SELECT lang, doc_id,
             ${oH32("'s42' || CAST(doc_id AS VARCHAR)")} AS hh
           FROM documents),
         r AS (
           SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS rn
           FROM h)
         SELECT lang, doc_id FROM r WHERE rn <= 5 ORDER BY lang, doc_id""",

    "t18_quality_sample" ->
      s"""WITH tk AS (
           SELECT doc_id,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS tok
           FROM documents),
         f AS (SELECT tok, count(*) AS tf FROM tk GROUP BY tok),
         t AS (SELECT CAST(sum(tf) AS BIGINT) AS T FROM f),
         scored AS (
           SELECT doc_id,
             CAST(floor(avg(ln(tf) - ln(T)) * 8) AS INT) AS band
           FROM tk JOIN f USING (tok) CROSS JOIN t
           GROUP BY doc_id),
         h AS (
           SELECT band, doc_id,
             ${oH32("'q' || CAST(doc_id AS VARCHAR)")} AS hh
           FROM scored),
         r AS (
           SELECT band, doc_id,
             row_number() OVER (PARTITION BY band ORDER BY hh, doc_id) AS rn
           FROM h)
         SELECT band, doc_id FROM r WHERE rn <= 5 ORDER BY band, doc_id""",

    "m03_audio_decode" ->
      """SELECT doc_id AS media_id, 'audio/wav' AS kind,
           CAST(1 AS INT) AS channels, CAST(8000 AS INT) AS sample_rate,
           (sign(CAST(2 AS DOUBLE) / 1 / 8000) * floor(abs(CAST(2 AS DOUBLE) / 1 / 8000) * 10000 + 0.5) / 10000) AS dur_sec,
           (sign(CAST(doc_id % 20000 AS DOUBLE) / 32768) * floor(abs(CAST(doc_id % 20000 AS DOUBLE) / 32768) * 10000 + 0.5) / 10000) AS mean_amp
         FROM documents ORDER BY media_id""",

    "m08_image_phash" ->
      """WITH ls AS (
           SELECT doc_id AS media_id,
             list_transform([0, 1, 2, 3], i ->
               (0.299 * (((doc_id % 37) * 7 + i * 53) % 256)
                + 0.587 * (((doc_id % 37) * 11 + i * 19) % 256)
                + 0.114 * (((doc_id % 37) * 3 + i * 41) % 256))
               / 255) AS l
           FROM documents),
         h AS (
           SELECT media_id,
             (CASE WHEN l[1] >= (((l[1] + l[2]) + l[3]) + l[4]) / 4
                THEN 1 ELSE 0 END
              + CASE WHEN l[2] >= (((l[1] + l[2]) + l[3]) + l[4]) / 4
                THEN 2 ELSE 0 END
              + CASE WHEN l[3] >= (((l[1] + l[2]) + l[3]) + l[4]) / 4
                THEN 4 ELSE 0 END
              + CASE WHEN l[4] >= (((l[1] + l[2]) + l[3]) + l[4]) / 4
                THEN 8 ELSE 0 END) AS ahash
           FROM ls),
         g AS (SELECT ahash, count(*) AS n_same FROM h GROUP BY ahash)
         SELECT h.media_id, h.ahash, g.n_same
         FROM h JOIN g USING (ahash) ORDER BY media_id""",

    "m07_audio_stats" ->
      """WITH s AS (
           SELECT doc_id AS media_id,
             [CAST(doc_id % 20000 AS DOUBLE),
              -CAST((doc_id + 1000) % 20000 AS DOUBLE),
              CAST((doc_id + 2000) % 20000 AS DOUBLE),
              -CAST((doc_id + 3000) % 20000 AS DOUBLE)] AS ss
           FROM documents)
         SELECT media_id, 'audio/wav' AS kind,
           (sign(sqrt(list_sum(list_transform(ss,
             x -> (x / 32768) * (x / 32768))) / 4)) * floor(abs(sqrt(list_sum(list_transform(ss,
             x -> (x / 32768) * (x / 32768))) / 4)) * 10000 + 0.5) / 10000) AS rms,
           (sign(CAST(len(list_filter([1, 2, 3],
             i -> ss[i] * ss[i + 1] < 0)) AS DOUBLE) / 3) * floor(abs(CAST(len(list_filter([1, 2, 3],
             i -> ss[i] * ss[i + 1] < 0)) AS DOUBLE) / 3) * 10000 + 0.5) / 10000) AS zcr,
           (sign(list_max(list_transform(ss, x -> abs(x) / 32768))) * floor(abs(list_max(list_transform(ss, x -> abs(x) / 32768))) * 10000 + 0.5) / 10000)
             AS peak
         FROM s ORDER BY media_id""",

    "m04_frame_sample" ->
      """WITH px AS (
           SELECT doc_id AS media_id, f.f AS frame_idx,
             CAST((doc_id + f.f * 17) % 256 AS DOUBLE) AS r,
             CAST((doc_id * 7 + f.f * 29) % 256 AS DOUBLE) AS g,
             CAST((doc_id * 13 + f.f * 31) % 256 AS DOUBLE) AS b
           FROM documents CROSS JOIN (VALUES (0), (2)) f(f))
         SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(2 AS INT) AS width, CAST(2 AS INT) AS height,
           (sign(r / CAST(255 AS DOUBLE)) * floor(abs(r / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_r,
           (sign(g / CAST(255 AS DOUBLE)) * floor(abs(g / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_g,
           (sign(b / CAST(255 AS DOUBLE)) * floor(abs(b / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_b,
           (sign((CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * b) / CAST(255 AS DOUBLE)) * floor(abs((CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * b) / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS luma
         FROM px ORDER BY media_id, frame_idx""",

    "m09_scene_cuts" ->
      """WITH px AS (
           SELECT doc_id AS media_id, f.f AS frame_idx,
             CAST((doc_id + f.f * 17) % 256 AS DOUBLE)
               / CAST(255 AS DOUBLE) AS r,
             CAST((doc_id * 7 + f.f * 29) % 256 AS DOUBLE)
               / CAST(255 AS DOUBLE) AS g,
             CAST((doc_id * 13 + f.f * 31) % 256 AS DOUBLE)
               / CAST(255 AS DOUBLE) AS b
           FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) f(f)),
         d AS (
           SELECT media_id, frame_idx,
             (abs(r - lag(r) OVER w) + abs(g - lag(g) OVER w)
               + abs(b - lag(b) OVER w)) / CAST(3 AS DOUBLE) AS delta
           FROM px
           WINDOW w AS (PARTITION BY media_id ORDER BY frame_idx))
         SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           (sign(delta) * floor(abs(delta) * 10000 + 0.5) / 10000) AS delta,
           coalesce(delta > CAST(0.2 AS DOUBLE), FALSE) AS is_cut
         FROM d ORDER BY media_id, frame_idx""",

    "m02_media_decode" ->
      """WITH px AS (
           SELECT doc_id AS media_id,
             CAST(doc_id % 256 AS DOUBLE) AS r,
             CAST((doc_id * 7) % 256 AS DOUBLE) AS g,
             CAST((doc_id * 13) % 256 AS DOUBLE) AS b
           FROM documents)
         SELECT media_id, 'image/ppm' AS kind,
           CAST(2 AS INT) AS width, CAST(2 AS INT) AS height,
           (sign(r / CAST(255 AS DOUBLE)) * floor(abs(r / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_r,
           (sign(g / CAST(255 AS DOUBLE)) * floor(abs(g / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_g,
           (sign(b / CAST(255 AS DOUBLE)) * floor(abs(b / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_b,
           (sign((CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * b) / CAST(255 AS DOUBLE)) * floor(abs((CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * b) / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS luma
         FROM px ORDER BY media_id""",

    "m05_bmp_decode" ->
      """WITH px AS (
           SELECT doc_id AS media_id,
             CAST(doc_id % 256 AS DOUBLE) AS r,
             CAST((doc_id * 7) % 256 AS DOUBLE) AS g,
             CAST((doc_id * 13) % 256 AS DOUBLE) AS b
           FROM documents)
         SELECT media_id, 'image/bmp' AS kind,
           CAST(2 AS INT) AS width, CAST(2 AS INT) AS height,
           (sign(r / CAST(255 AS DOUBLE)) * floor(abs(r / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_r,
           (sign(g / CAST(255 AS DOUBLE)) * floor(abs(g / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_g,
           (sign(b / CAST(255 AS DOUBLE)) * floor(abs(b / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_b,
           (sign((CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * b) / CAST(255 AS DOUBLE)) * floor(abs((CAST(0.299 AS DOUBLE) * r + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * b) / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS luma
         FROM px ORDER BY media_id""",

    "m06_jpeg_decode" ->
      """WITH px AS (
           SELECT doc_id AS media_id,
             CAST(doc_id % 256 AS DOUBLE) AS g
           FROM documents)
         SELECT media_id, 'image/jpeg' AS kind,
           CAST(16 AS INT) AS width, CAST(8 AS INT) AS height,
           (sign(g / CAST(255 AS DOUBLE)) * floor(abs(g / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_r,
           (sign(g / CAST(255 AS DOUBLE)) * floor(abs(g / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_g,
           (sign(g / CAST(255 AS DOUBLE)) * floor(abs(g / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS mean_b,
           (sign((CAST(0.299 AS DOUBLE) * g + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * g) / CAST(255 AS DOUBLE)) * floor(abs((CAST(0.299 AS DOUBLE) * g + CAST(0.587 AS DOUBLE) * g
             + CAST(0.114 AS DOUBLE) * g) / CAST(255 AS DOUBLE)) * 10000 + 0.5) / 10000) AS luma
         FROM px ORDER BY media_id""",

    // HLL mirror: register = h mod 256, rank = 53 - bitlength of the
    // 52-bit remainder (capped at 50), harmonic term kept as the exact
    // integer sum 2^(50-M_j). The raw estimate is one IEEE division of
    // deterministic operands; the linear-counting correction joins
    // against a 256-row table of m·ln(m/V) literals RENDERED FROM THE
    // ENGINE'S OWN Math.log (Sketches.HllCorrection), so no DuckDB
    // libm call is in the compare path
    "t25_hll_distinct" ->
      s"""WITH corr(v, cest) AS (VALUES ${
        (1 to 256).map(v => s"($v, ${Sketches.HllCorrection(v)})")
          .mkString(", ")}),
         tk AS (
           SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS tok
           FROM documents),
         h AS (SELECT source, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tk),
         reg AS (
           SELECT source, h % 256 AS j,
             least(max(CASE WHEN h // 256 = 0 THEN 53
               ELSE 53 - length(bin(h // 256)) END), 50) AS m
           FROM h GROUP BY source, j),
         grid AS (
           SELECT s.source, r.j, coalesce(reg.m, 0) AS m
           FROM (SELECT DISTINCT source FROM documents) s
           CROSS JOIN range(256) r(j)
           LEFT JOIN reg ON reg.source = s.source AND reg.j = r.j),
         agg AS (
           SELECT source,
             CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS INT) AS v_zero,
             CAST(sum(1::BIGINT << CAST(50 - m AS INT)) AS BIGINT) AS harm_x2p50
           FROM grid GROUP BY source),
         exact AS (SELECT source, count(DISTINCT h) AS n_exact FROM h GROUP BY source),
         est0 AS (
           SELECT source, v_zero, harm_x2p50,
             (CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0))
               * 65536.0 * 1125899906842624.0 / harm_x2p50 AS raw
           FROM agg),
         est1 AS (
           SELECT source, v_zero, harm_x2p50,
             CASE WHEN v_zero > 0 AND raw <= 640.0 THEN c.cest ELSE raw END AS fin
           FROM est0 LEFT JOIN corr c ON c.v = est0.v_zero)
         SELECT a.source, e.n_exact, a.v_zero, a.harm_x2p50,
           (sign(fin) * floor(abs(fin) * 10000 + 0.5) / 10000) AS est
         FROM est1 a JOIN exact e USING (source)
         ORDER BY source""",

    // CMS mirror: position_i = (h mod 2048 + i * odd((h div 2048) mod
    // 2048)) mod 2048; counters = exact integer sums, estimate = min
    // over the 4 rows — all integer arithmetic end to end
    "t26_cms_heavy" ->
      """WITH tk AS (
           SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS tok
           FROM documents),
         h AS (SELECT tok, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tk),
         pos AS (
           SELECT tok, h, i,
             ((h % 2048) + i * (((h // 2048) % 2048) - ((h // 2048) % 2048) % 2 + 1)) % 2048 AS c
           FROM h CROSS JOIN range(4) t(i)),
         counters AS (SELECT i, c, count(*) AS n FROM pos GROUP BY i, c),
         probe AS (SELECT DISTINCT tok, h FROM h),
         ppos AS (
           SELECT tok, i,
             ((h % 2048) + i * (((h // 2048) % 2048) - ((h // 2048) % 2048) % 2 + 1)) % 2048 AS c
           FROM probe CROSS JOIN range(4) t(i)),
         est AS (
           SELECT tok, min(n) AS est
           FROM ppos JOIN counters USING (i, c) GROUP BY tok),
         exact AS (SELECT tok, count(*) AS n_exact FROM tk GROUP BY tok),
         total AS (SELECT count(*) AS n FROM tk)
         SELECT e.tok, e.est, x.n_exact
         FROM est e JOIN exact x USING (tok)
         WHERE e.est >= (SELECT n // 256 FROM total)
         ORDER BY tok""",

    // Bloom mirror: the filter's set-bit positions materialize as a
    // table; a probe gram hits iff all 4 of its positions are present
    "d19_bloom_decontam" ->
      s"""$O_SH,
         hpost AS (SELECT DISTINCT doc_id, ${oH32("term")} AS h FROM post),
         bench AS (SELECT DISTINCT h FROM hpost WHERE doc_id % 50 = 0),
         bpos AS (
           SELECT DISTINCT ((h % 65536) + i * (((h // 65536) % 65536) - ((h // 65536) % 65536) % 2 + 1)) % 65536 AS b
           FROM bench CROSS JOIN range(4) t(i)),
         corp AS (SELECT doc_id, h FROM hpost WHERE doc_id % 50 <> 0),
         cpos AS (
           SELECT doc_id, h, i,
             ((h % 65536) + i * (((h // 65536) % 65536) - ((h // 65536) % 65536) % 2 + 1)) % 65536 AS b
           FROM corp CROSS JOIN range(4) t(i)),
         hitg AS (
           SELECT doc_id, cpos.h, count(bpos.b) AS nb
           FROM cpos LEFT JOIN bpos ON cpos.b = bpos.b
           GROUP BY doc_id, cpos.h),
         agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN nb = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
           FROM hitg GROUP BY doc_id)
         SELECT doc_id, n_grams, n_hits, n_hits > 0 AS flagged
         FROM agg ORDER BY doc_id""",

    // log-histogram quantile mirror: bin = bitlength(x+1)-1 (pure
    // integer), rank = ceil(p·total), interpolation operands all
    // exactly-representable ints → deterministic doubles
    "t27_quantile_sketch" ->
      """WITH v AS (SELECT source, n_chars AS x FROM documents),
         b AS (SELECT source, length(bin(x + 1)) - 1 AS bin FROM v),
         c AS (SELECT source, bin, count(*) AS cnt FROM b GROUP BY source, bin),
         t AS (SELECT source, count(*) AS total FROM v GROUP BY source),
         cum AS (SELECT source, bin, cnt,
           sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum FROM c),
         ps(p) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
           (CAST(0.99 AS DOUBLE))),
         ranks AS (SELECT t.source, p, total,
           CAST(ceil(p * total) AS BIGINT) AS r FROM t CROSS JOIN ps),
         pick AS (
           SELECT r2.source, r2.p, r2.r, min(cum.bin) AS bin
           FROM ranks r2 JOIN cum ON cum.source = r2.source AND cum.cum >= r2.r
           GROUP BY r2.source, r2.p, r2.r),
         est AS (
           SELECT p.source, p.p,
             CAST((1::BIGINT << p.bin) - 1 AS DOUBLE)
               + CAST(1::BIGINT << p.bin AS DOUBLE)
                 * CAST(p.r - (c2.cum - c2.cnt) AS DOUBLE)
                 / CAST(c2.cnt AS DOUBLE) AS e
           FROM pick p JOIN cum c2 ON c2.source = p.source AND c2.bin = p.bin)
         SELECT e2.source, max(t.total) AS total,
           max(CASE WHEN p = 0.5 THEN (sign(e) * floor(abs(e) * 10000 + 0.5) / 10000) END) AS p50,
           max(CASE WHEN p = 0.9 THEN (sign(e) * floor(abs(e) * 10000 + 0.5) / 10000) END) AS p90,
           max(CASE WHEN p = 0.99 THEN (sign(e) * floor(abs(e) * 10000 + 0.5) / 10000) END) AS p99
         FROM est e2 JOIN t ON t.source = e2.source
         GROUP BY e2.source ORDER BY e2.source""",

    // KMV mirror: bottom-256 per source via row_number, merged
    // bottom-k + shared fraction via list ops; 255·2^60 / h_k is
    // exact-operand IEEE arithmetic
    "t28_kmv_overlap" ->
      """WITH tk AS (
           SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               x -> x <> '')) AS tok
           FROM documents),
         h AS (SELECT DISTINCT source,
           CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tk),
         ranked AS (SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
         sk AS (SELECT source, list(h ORDER BY h) AS hs
           FROM ranked WHERE rn <= 256 GROUP BY source),
         pairs AS (SELECT a.source AS src_a, b.source AS src_b,
             a.hs AS ha, b.hs AS hb
           FROM sk a JOIN sk b ON a.source < b.source),
         comp AS (SELECT src_a, src_b, ha, hb,
             list_sort(list_distinct(list_concat(ha, hb))) AS u
           FROM pairs),
         est AS (SELECT src_a, src_b,
             CAST(least(256, len(u)) AS BIGINT) AS k2,
             CAST(len(list_filter(list_slice(u, 1, 256),
               x -> list_contains(ha, x) AND list_contains(hb, x))) AS BIGINT)
               AS n_shared_bk,
             CASE WHEN len(u) < 256 THEN CAST(len(u) AS DOUBLE)
               ELSE 255.0 * 1152921504606846976.0 / CAST(u[256] AS DOUBLE)
               END AS union_est,
             CAST(len(list_filter(list_slice(u, 1, 256),
               x -> list_contains(ha, x) AND list_contains(hb, x))) AS DOUBLE)
               / least(256, len(u)) AS jaccard_est
           FROM comp),
         sizes AS (SELECT source, count(*) AS n FROM h GROUP BY source),
         inter AS (SELECT x.source AS src_a, y.source AS src_b,
             count(*) AS n_inter
           FROM h x JOIN h y ON x.h = y.h AND x.source < y.source
           GROUP BY x.source, y.source)
         SELECT e.src_a, e.src_b, e.k2, e.n_shared_bk,
           (sign(union_est) * floor(abs(union_est) * 10000 + 0.5) / 10000) AS union_est,
           (sign(jaccard_est) * floor(abs(jaccard_est) * 10000 + 0.5) / 10000) AS jaccard_est,
           CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
           (sign(CAST(coalesce(i.n_inter, 0) AS DOUBLE) / CAST(sa.n + sb.n - coalesce(i.n_inter, 0) AS DOUBLE))
             * floor(abs(CAST(coalesce(i.n_inter, 0) AS DOUBLE) / CAST(sa.n + sb.n - coalesce(i.n_inter, 0) AS DOUBLE)) * 10000 + 0.5) / 10000) AS jaccard
         FROM est e
         LEFT JOIN inter i ON i.src_a = e.src_a AND i.src_b = e.src_b
         JOIN sizes sa ON sa.source = e.src_a
         JOIN sizes sb ON sb.source = e.src_b
         ORDER BY e.src_a, e.src_b""",

    // sessionization mirror: identical lag/gap/running-sum chain
    "e01_sessionize" ->
      """WITH ev AS (SELECT event_id, epoch_ms(ts) AS ts, user_id,
           event_type, value FROM events),
         x AS (SELECT *, lag(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM ev),
         y AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev > 1800000
           THEN 1 ELSE 0 END AS nw FROM x),
         z AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx FROM y)
         SELECT user_id, session_idx, count(*) AS n_events,
           min(ts) AS start_ts, max(ts) AS end_ts,
           max(ts) - min(ts) AS dur_ms,
           (sign(sum(value)) * floor(abs(sum(value)) * 10000 + 0.5) / 10000) AS sum_v,
           count(DISTINCT event_type) AS n_types
         FROM z GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",

    // funnel mirror: per-stage MIN qualifying ts, window from entry
    "e02_funnel" ->
      """WITH ev AS (SELECT event_id, epoch_ms(ts) AS ts, user_id,
           event_type FROM events),
         s0 AS (SELECT user_id, min(ts) AS t0 FROM ev
           WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT e.user_id, s0.t0, min(e.ts) AS t1
           FROM ev e JOIN s0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts >= s0.t0
             AND e.ts - s0.t0 <= 604800000
           GROUP BY e.user_id, s0.t0),
         s2 AS (SELECT e.user_id, s1.t0, s1.t1, min(e.ts) AS t2
           FROM ev e JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
             AND e.ts - s1.t0 <= 604800000
           GROUP BY e.user_id, s1.t0, s1.t1)
         SELECT * FROM (
           SELECT 0 AS stage_idx, 'view' AS stage,
             CAST(count(*) AS BIGINT) AS n_users FROM s0
           UNION ALL SELECT 1, 'click', CAST(count(*) AS BIGINT) FROM s1
           UNION ALL SELECT 2, 'purchase', CAST(count(*) AS BIGINT) FROM s2)
         ORDER BY stage_idx"""
  )
}
