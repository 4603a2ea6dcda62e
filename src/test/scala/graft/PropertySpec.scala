package graft

import graft.model.Points
import graft.operators._
import graft.query.DownsampleSpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Property-style invariants over seeded random data (SURVEY §5:
 * downsample(1ms) == identity, zimsum == aligned sum, rate∘cumsum == id,
 * stitch == direct at any horizon). Fixed seed keeps runs deterministic
 * while still exercising irregular shapes a hand-written golden never
 * would.
 */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val rnd = new scala.util.Random(42)

  /** ~n random points over `series` series with irregular timestamps. */
  private def randomPoints(n: Int, series: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (0 until n).map { _ =>
      val s = rnd.nextInt(series)
      val ts = 1700000000000L + rnd.nextInt(500000) * 100L
      Row("m", ts, rnd.nextDouble() * 100 - 20, null, false,
        Map("host" -> s"h$s"))
    }
    // one row per (series, ts): last-write-wins dedup as ingest would
    spark.createDataFrame(rows.asJava, Points.schema)
      .groupBy("metric", "ts", "tags").agg(
        first("value").as("value"), first("value_l").as("value_l"),
        first("is_int").as("is_int"))
      .select("metric", "ts", "value", "value_l", "is_int", "tags")
  }

  private def toMap(df: DataFrame): Map[(String, Long), Double] =
    df.collect().map(r => (r.getAs[Map[String, String]]("tags")("host"),
      r.getAs[Long]("ts")) -> r.getAs[Double]("value")).toMap

  test("property: 1ms-sum downsample is the identity") {
    val p = randomPoints(400, 5)
    val d = Downsample(p, DownsampleSpec.parse("1ms-sum"))
    val orig = p.collect().map(r => (r.getAs[Map[String, String]]("tags")("host"),
      r.getAs[Long]("ts")) -> r.getAs[Double]("value")).toMap
    assert(toMap(d) == orig)
  }

  test("property: zimsum equals the per-timestamp sum of present points") {
    val p = randomPoints(400, 5)
    val viaInterp = Interpolate.aggregate(p, "zimsum").collect()
      .map(r => r.getAs[Long]("ts") -> r.getAs[Double]("value")).toMap
    val direct = p.groupBy("ts").agg(sum("value").as("v")).collect()
      .map(r => r.getAs[Long]("ts") -> r.getAs[Double]("v")).toMap
    assert(viaInterp.keySet == direct.keySet)
    assert(viaInterp.forall { case (k, v) => math.abs(v - direct(k)) < 1e-9 })
  }

  test("property: rate of a cumulative counter recovers the increments") {
    import scala.jdk.CollectionConverters._
    val incs = (1 to 50).map(_ => rnd.nextInt(1000) + 1)
    val ts0 = 1700000000000L
    var acc = 0.0
    val rows = incs.zipWithIndex.map { case (inc, i) =>
      acc += inc
      Row("m", ts0 + (i + 1) * 10000L, acc, null, false, Map("host" -> "a"))
    }
    val p = spark.createDataFrame(rows.asJava, Points.schema)
    val rates = Rate(p).orderBy("ts").collect().map(_.getAs[Double]("value"))
    // dt = 10 s, so rate = increment / 10
    val expected = incs.drop(1).map(_ / 10.0)
    assert(rates.length == expected.length)
    rates.zip(expected).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-9) }
  }

  test("property: rollup stitch equals direct downsample at ANY horizon") {
    val p = randomPoints(300, 3)
    val rollup = Rollups.materialize(p, 3600000L)
    val spec = DownsampleSpec.parse("1d-avg")
    val direct = toMap(Downsample(p, spec))
    val (lo, hi) = (1700000000000L, 1700000000000L + 500000 * 100L)
    (0 until 4).foreach { _ =>
      val horizon = lo + (rnd.nextLong().abs % (hi - lo))
      val stitched = toMap(Rollups.stitch(rollup, p, spec, horizon))
      assert(stitched.keySet == direct.keySet, s"horizon $horizon")
      assert(stitched.forall { case (k, v) =>
        math.abs(v - direct(k)) < 1e-9 }, s"horizon $horizon")
    }
  }

  test("property: topK output is a subset with at most k series") {
    val p = randomPoints(300, 8)
    val flat = p.select(col("metric"),
      col("tags").getItem("host").as("tag_host"), col("ts"), col("value"))
    val top = SeriesFunctions.highestMax(flat, 3)
    assert(top.select("tag_host").distinct().count() <= 3)
    // every surviving row exists in the input
    assert(top.join(flat, Seq("metric", "tag_host", "ts", "value"),
      "left_anti").count() == 0)
  }

  test("property: simhashPairs == brute-force pairs at Hamming <= 3") {
    import spark.implicits._
    // random docs drawn from a tiny vocabulary so near-dups happen
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docs = (0L until 60L).map { i =>
      val words = (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = graft.pipeline.Dedup.simhashSignatures(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    val banded = graft.pipeline.Dedup
      .simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute) // pigeonhole recall is exact, filter is exact
  }

  test("property: minhash-LSH pairs are an exact-precision subset of Jaccard pairs") {
    import spark.implicits._
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum")
    // 25 random bases + a near-copy of each (one word mutated) so true
    // >=threshold pairs exist; distinct randoms keep negatives around
    val bases = (0L until 25L).map { i =>
      (i, (0 until 10).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val copies = bases.map { case (i, words) =>
      (i + 25L, words.updated(rnd.nextInt(words.size),
        vocab(rnd.nextInt(vocab.size))))
    }
    val docs = (bases ++ copies)
      .map { case (i, ws) => (i, ws.mkString(" ")) }.toDF("doc_id", "text")
    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // maxDf off on both so the universes match exactly
    val exact = pairs(graft.pipeline.Dedup
      .ngramJaccardPairs(docs, "text", "doc_id", 0.4, maxDf = None))
    val lsh = pairs(graft.pipeline.Dedup
      .minhashLshPairs(docs, "text", "doc_id", bands = 4, threshold = 0.4))
    // verification makes LSH precision exact: every emitted pair is a
    // true >=threshold pair with the same jaccard value; banding only
    // ever LOSES candidates (recall < 1 by design)
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-12) }
    // and on this vocabulary the bands actually fire: non-empty overlap
    assert(lsh.nonEmpty)
  }

  /** Reference 3-shingle set (mirrors TextAnalysis.tokens/shingles). */
  private def shingleSet(text: String): Set[String] = {
    val tk = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
    else Set(tk.mkString(" "))
  }

  test("property: decontaminate == brute-force shingle intersection") {
    import spark.implicits._
    val vocab = Vector("ash", "bay", "cod", "dew", "elm", "fog", "gum", "hop")
    val all = (0L until 80L).map { i =>
      (i, (0 until 10).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val corpus = all.filter(_._1 % 5 != 0)
    val bench = all.filter(_._1 % 5 == 0)
    val benchGrams = bench.flatMap(d => shingleSet(d._2)).toSet
    val expected = corpus
      .map { case (id, t) => id -> shingleSet(t).count(benchGrams) }
      .filter(_._2 > 0).toMap
    val got = graft.pipeline.Dedup
      .decontaminate(corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }

  test("property: noveltyScore == brute-force document-frequency count") {
    import spark.implicits._
    val vocab = Vector("oak", "fir", "yew", "ivy", "rue", "sage")
    val docs = (0L until 60L).map { i =>
      (i, (0 until 8).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dfreq = docs.flatMap(d => shingleSet(d._2).toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = docs.map { case (id, t) =>
      val sh = shingleSet(t)
      id -> ((sh.size, sh.count(dfreq(_) == 1)))
    }.toMap
    val got = graft.pipeline.TextAnalysis
      .noveltyScore(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1).toInt, r.getLong(2).toInt)))
      .toMap
    assert(got == expected)
  }

  test("property: m= URI grammar and JSON body produce identical results") {
    import graft.query.TsQuery
    // random points over 4 hosts, then the same logical query expressed
    // through BOTH entry points must match row-for-row — the parser
    // pair (QueryParser.parseSubQuery vs JsonQuery.parse) is the only
    // thing that differs, so any divergence is a parser bug
    val pts = randomPoints(400, 4)
    val q = TsQuery(1700000000000L, 1700060000000L, Seq.empty)
    val cases = Seq(
      ("sum:cpu", // trivial; metric mismatch on purpose → empty both
        """{"aggregator":"sum","metric":"cpu"}"""),
      ("sum:1m-avg:m{host=*}",
        """{"aggregator":"sum","metric":"m","downsample":"1m-avg",
           "tags":{"host":"*"}}"""),
      ("max:5m-sum-zero:m{host=h0|h1}",
        """{"aggregator":"max","metric":"m","downsample":"5m-sum-zero",
           "tags":{"host":"h0|h1"}}"""),
      ("avg:rate:m",
        """{"aggregator":"avg","metric":"m","rate":true}"""),
      ("zimsum:rate{counter,1000,5}:1m-max:m",
        """{"aggregator":"zimsum","rate":true,
           "rateOptions":{"counter":true,"counterMax":1000,"resetValue":5},
           "downsample":"1m-max","metric":"m"}"""),
      // m= first-braces filters group; the non-grouping JSON filter
      // (groupBy:false) corresponds to the second-braces form
      ("dev:m{}{host=regexp(h[02])}",
        """{"aggregator":"dev","metric":"m",
           "filters":[{"type":"regexp","tagk":"host","filter":"h[02]",
                       "groupBy":false}]}"""),
      ("count:m{host=wildcard(h*)}",
        """{"aggregator":"count","metric":"m",
           "filters":[{"type":"wildcard","tagk":"host","filter":"h*",
                       "groupBy":true}]}"""))
    for ((m, subJson) <- cases) {
      val viaM = Engine.runM(pts, q, m)
      val body =
        s"""{"start":${q.startMs},"end":${q.endMs},"queries":[$subJson]}"""
      val viaJson = Engine.runJson(pts, body).head
      val cols = viaM.columns.sorted.map(col)
      val a = viaM.select(cols: _*).collect().map(_.toString).sorted
      val b = viaJson.select(cols: _*).collect().map(_.toString).sorted
      assert(a.sameElements(b), s"mismatch for m=$m")
    }
  }

  test("property: chunks tile the token stream exactly") {
    import spark.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(30) // includes 0-token docs
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val width = 7; val overlap = 2; val stride = width - overlap
    val got = df.select(col("doc_id"),
        posexplode(graft.pipeline.TextAnalysis.chunks(col("text"), width, overlap)))
      .select(col("doc_id"), col("pos"), col("col.start"), col("col.n_tok"),
        col("col.chunk"))
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    docs.foreach { case (id, text) =>
      val tk = text.split(" ").filter(_.nonEmpty)
      val chunks = got.getOrElse(id, Array.empty)
      val starts = (0 until math.max(tk.length, 0) by stride).toSeq
      assert(chunks.map(_.getInt(2)).toSeq == starts, s"doc $id starts")
      chunks.foreach { r =>
        val (s, n, c) = (r.getInt(2), r.getInt(3), r.getString(4))
        assert(n == math.min(width, tk.length - s), s"doc $id n_tok")
        assert(c == tk.slice(s, s + width).mkString(" "), s"doc $id chunk")
      }
      // every token position is covered by at least one chunk
      val covered = chunks.flatMap(r =>
        r.getInt(2) until (r.getInt(2) + r.getInt(3))).toSet
      assert(covered == tk.indices.toSet, s"doc $id coverage")
    }
  }

  test("property: scrubPii is idempotent and leaves no matches behind") {
    import spark.implicits._
    val frag = Vector("plain words", "x@y.io", "1.2.3.4", "555-1234",
      "999.8.7.6", "a.b@c.de f", "12-3456", "10.0.0.255 end")
    val docs = (0 until 80).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(6))(frag(rnd.nextInt(frag.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val once = graft.pipeline.TextAnalysis.scrubPii(col("text"))
    val twice = graft.pipeline.TextAnalysis.scrubPii(once)
    val cnts = graft.pipeline.TextAnalysis.piiCounts(once)
      .map { case (n, c) => c.as(n) }
    val rows = df.select(Seq(once.as("c1"), twice.as("c2")) ++ cnts: _*)
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), "idempotent")
      assert((2 to 4).forall(r.getLong(_) == 0L), "no residual matches")
    }
  }

  test("property: native dot/norm expressions are bit-identical to both legacy forms") {
    import spark.implicits._
    val dim = 64
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 4 - 2),
        Array.fill(dim)(rnd.nextFloat() * 4 - 2))
    }.toDF("id", "a", "b")
    val rows = vecs.select(
      graft.functions.VectorMath.dotCol(col("a"), col("b")).as("native"),
      graft.pipeline.Similarity.dot(col("a"), col("b")).as("hof"),
      graft.pipeline.Similarity.dotN(col("a"), col("b"), dim).as("unrolled"),
      graft.functions.VectorMath.normCol(col("a")).as("n_native"),
      graft.pipeline.Similarity.norm(col("a")).as("n_hof"),
      graft.pipeline.Similarity.normN(col("a"), dim).as("n_unrolled"))
      .collect()
    rows.foreach { r =>
      // == on doubles: BIT-identical, not approximately equal
      assert(r.getDouble(0) == r.getDouble(1) && r.getDouble(0) == r.getDouble(2))
      assert(r.getDouble(3) == r.getDouble(4) && r.getDouble(3) == r.getDouble(5))
    }
    val buckets = vecs.select(
      graft.functions.VectorMath.rhpBucketCol(col("a"), 6, dim, 7).as("native"),
      graft.pipeline.Similarity.rhpBucket(col("a"), 6, dim, 7).as("hof"),
      graft.pipeline.Similarity.rhpBucketN(col("a"), 6, dim, 7).as("unrolled"))
      .collect()
    buckets.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(0) == r.getLong(2))
    }
  }

  test("property: multi-probe IVF refines single-probe (probes.head == cluster, top-1 dominates)") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id", 4, 1)
    val probed = Similarity.kmeansProbes(e, "embedding", "vec_id", 4, 1, 2)
    // the nearest probe IS the argmin cell — same distances, same ties
    val mismatch = assigned.select(col("vec_id"), col("cluster"))
      .join(probed.select(col("vec_id"), element_at(col("probes"), 1).as("p0")),
        "vec_id")
      .filter(col("cluster") =!= col("p0")).count()
    assert(mismatch == 0L)
    val q1 = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cluster").as("q_cell"))
    val qm = probed.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("probes").as("q_probes"))
    val single = Similarity.ivfTopK(assigned, q1, 1, cellCol = "cluster")
      .select(col("q_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val multi = Similarity.ivfTopKMultiProbe(assigned, qm, 1)
      .select(col("q_id"), col("cos")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // multi-probe candidates are a superset → its top-1 can only be
    // at least as close
    single.foreach { case (q, c) => assert(multi(q) >= c, s"q $q") }
  }

  test("property: PQ codes are the argmin over every code combination") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = Similarity.pqTrain(e, "embedding", "vec_id", m = 2, k = 4,
      iters = 1)
    assert(books.size == 2 && books.forall(_.size == 4) &&
      books.forall(_.forall(_.size == 32)))
    // training is deterministic: second run yields identical codebooks
    assert(books == Similarity.pqTrain(e, "embedding", "vec_id", 2, 4, 1))
    val sample = Similarity.pqEncode(e, "embedding", books)
      .select(col("vec_id"), col("embedding"), col("codes")).limit(40)
      .collect()
    def rd(v: Seq[Double], c: Seq[Double]): Double = {
      val s = v.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
        acc + (a - b) * (a - b) }
      math.floor(s * 1e6 + 0.5) / 1e6
    }
    sample.foreach { r =>
      val vec = r.getSeq[Float](1).map(_.toDouble)
      val codes = r.getSeq[Int](2)
      (0 until 2).foreach { s =>
        val sub = vec.slice(s * 32, s * 32 + 32)
        val dists = books(s).map(c => rd(sub, c))
        val best = dists.min
        // assigned code achieves the min; ties break to the LOWEST id,
        // matching kmeansAssign (so ADC(v, codes(v)) is globally
        // minimal — the score decomposes per subspace)
        assert(dists(codes(s)) == best)
        assert(codes(s) == dists.indexOf(best))
      }
    }
  }

  test("property: IVF-PQ == PQ ADC restricted to the query's cell") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id", 4, 1)
    val books = Similarity.pqTrain(e, "embedding", "vec_id", 2, 4, 1)
    val encoded = Similarity.pqEncode(assigned, "embedding", books)
      .select("vec_id", "codes", "cluster")
    val q = assigned.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cluster").as("q_cell"))
    val composed = Similarity.ivfPqTopK(encoded, q, 5, books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // reference computation: run full-corpus ADC per query, drop
    // candidates outside the query's cell, re-rank
    val cells = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = q.collect().flatMap { qr =>
      val qid = qr.getLong(0)
      Similarity.pqTopK(encoded, q.filter(col("q_id") === qid), Int.MaxValue,
          books)
        .collect()
        .filter(r => cells(r.getLong(1)) == cells(qid))
        .sortBy(r => (r.getDouble(2), r.getLong(1)))
        .take(5).zipWithIndex
        .map { case (r, i) => (qid, r.getLong(1), i + 1) }
    }.toSet
    assert(composed == expected)
    // every composed candidate shares the query's coarse cell
    composed.foreach { case (qid, vid, _) =>
      assert(cells(vid) == cells(qid))
    }
  }

  test("property: SQ8 codes in [0,255]; reconstruction error <= range/510") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bounds = Similarity.sqTrain(e, "embedding", 64)
    assert(bounds.size == 64 && bounds.forall(_._2 >= 0))
    val sample = Similarity.sqEncode(e, "embedding", bounds)
      .select(col("embedding"), col("codes")).limit(50).collect()
    sample.foreach { r =>
      val vec = r.getSeq[Float](0)
      val codes = r.getSeq[Int](1)
      codes.foreach(c => assert(c >= 0 && c <= 255))
      vec.indices.foreach { d =>
        val (mn, sc) = bounds(d)
        val dec = mn + codes(d) / 255.0 * sc
        // half-step quantization bound: |x - x̂| <= range/255/2 (+fp slack)
        assert(math.abs(vec(d) - dec) <= sc / 510.0 + 1e-9,
          s"dim $d: ${vec(d)} vs $dec (range $sc)")
      }
    }
    // an SQ8 scan at full k ranks like the exact scan ranks decoded
    // vectors: spot-check that top-1 neighbors under sqd are genuinely
    // close under exact L2 (distortion small relative to spread)
    val q = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val codes = Similarity.sqEncode(e, "embedding", bounds)
      .select("vec_id", "codes")
    val got = Similarity.sqTopK(codes, q, 3, bounds).collect()
    assert(got.length == 6)
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      val ds = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(ds.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    }
  }

  test("property: ivfSqTopK == full SQ8 scan restricted to the query's cell") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id",
      k = 4, iters = 1)
    val bounds = Similarity.sqTrain(e, "embedding", 64)
    val codes = Similarity.sqEncode(assigned, "embedding", bounds)
    val q = assigned.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cluster").as("q_cell"))
    val composed = Similarity.ivfSqTopK(
        codes.select("vec_id", "codes", "cluster"), q, 5, bounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // ground truth: full-corpus SQ8 distances, re-ranked within the cell
    val cells = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val fullScan = Similarity.sqTopK(codes.select("vec_id", "codes"),
        q.select("q_id", "q_vec"), cells.size, bounds).collect()
    val expected = fullScan.groupBy(_.getLong(0)).toSeq.flatMap {
      case (qid, rows) =>
        rows.filter(r => cells(r.getLong(1)) == cells(qid))
          .sortBy(r => (r.getDouble(2), r.getLong(1)))
          .take(5).zipWithIndex
          .map { case (r, i) => (qid, r.getLong(1), i + 1) }
    }.toSet
    assert(composed == expected)
    composed.foreach { case (qid, vid, _) =>
      assert(cells(vid) == cells(qid))
    }
  }

  test("property: refine over a complete shortlist == bruteForceTopK") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    // a shortlist containing EVERY (query, corpus) pair makes the
    // refine degenerate to exact brute-force — same rows, same ranks
    val full = e.select(col("vec_id"))
      .crossJoin(q.select(col("q_id")))
      .filter(col("vec_id") =!= col("q_id"))
    val refined = Similarity.refineTopK(full, e, q, 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(refined == brute)
  }

  test("property: refine re-ranks only shortlist rows, by exact cosine") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val assigned = Similarity.kmeansAssign(e, "embedding", "vec_id", 4, 1)
    val books = Similarity.pqTrain(e, "embedding", "vec_id", 2, 4, 1)
    val encoded = Similarity.pqEncode(assigned, "embedding", books)
      .select("vec_id", "codes", "cluster")
    val qc = assigned.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cluster").as("q_cell"))
    val shortlist = Similarity.ivfPqTopK(encoded, qc, 10, books)
    val pairs = shortlist.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refined = Similarity.refineTopK(shortlist, e,
      qc.select(col("q_id"), col("q_vec")), 5).collect()
    // candidates never escape the shortlist
    refined.foreach { r =>
      assert(pairs.contains((r.getLong(0), r.getLong(1))))
    }
    // per query: ranks are 1..k and cosine is non-increasing in rank
    refined.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to byRank.size))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
        case _ =>
      }
    }
  }

  test("property: index append encodes new vectors == full re-encode under stored state") {
    import graft.pipeline.Similarity
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("pqappend")
      .toString + "/idx"
    // build on the first half only, then append the second half: the
    // appended rows must carry exactly the codes a full encode under
    // the STORED centroids/codebooks would give (no retraining), and
    // queries must see both halves
    val (half, rest) =
      (e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1))
    Similarity.writePqIndex(half, "embedding", "vec_id", dir,
      kCells = 4, m = 2, k = 4, iters = 1)
    Similarity.appendToPqIndex(rest, "embedding", "vec_id", dir)
    val idx = Similarity.readPqIndex(spark, dir)
    assert(idx.codes.count() == e.count())
    val expected = Similarity.pqEncode(
        Similarity.assignWith(e, "embedding", idx.cents), "embedding",
        idx.books)
      .select("vec_id", "cluster", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    val stored = idx.codes.select("vec_id", "cluster", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(stored == expected)
    // a query over the appended index scores candidates from BOTH halves
    val q = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val hits = Similarity.pqIndexTopK(idx, q, 10).collect()
      .map(_.getLong(1)).toSet
    assert(hits.exists(_ % 2 == 0) && hits.exists(_ % 2 == 1))
    // the codes table is laid out cell-partitioned, so a probed cell
    // reads only its own directory
    assert(idx.codes.inputFiles.forall(_.contains("cluster=")))
    val scan = idx.codes.filter(col("cluster") === 0).queryExecution
      .executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scan.relation.location
      .listFiles(scan.partitionFilters, Nil).length == 1,
      "probing one cell must read exactly that cell's directory")
  }

  test("property: results are invariant to input partitioning") {
    import spark.implicits._
    // on a real cluster partition boundaries are arbitrary — any
    // result that depends on them (agg merge order, heap merges)
    // is a latent cluster-only bug invisible at local[2]
    val docs = (0L until 120L)
      .map(i => (s"s${i % 3}", i, s"w${i % 7} w${i % 11} w${i % 13} text $i"))
      .toDF("lang", "doc_id", "text")
    def sample(parts: Int) = graft.pipeline.Sampling
      .stratifiedTopN(docs.repartition(parts), "lang", "doc_id", 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sample(2) == sample(13))
    def sigs(parts: Int) = graft.pipeline.Dedup
      .simhashSignatures(docs.repartition(parts), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(2) == sigs(13))
    def kmeans(parts: Int) = {
      val vecs = (0L until 40L)
        .map(i => (i, Array.tabulate(8)(d => (i * 7 + d).toFloat % 5)))
        .toDF("vec_id", "embedding")
      graft.pipeline.Similarity
        .kmeansAssign(vecs.repartition(parts), "embedding", "vec_id", 3, 2)
        .select("vec_id", "cluster")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    assert(kmeans(2) == kmeans(11))
    def pq(parts: Int) = {
      val vecs = (0L until 40L)
        .map(i => (i, Array.tabulate(8)(d => (i * 3 + d * d).toFloat % 7)))
        .toDF("vec_id", "embedding").repartition(parts)
      val books = graft.pipeline.Similarity
        .pqTrain(vecs, "embedding", "vec_id", m = 2, k = 3, iters = 2)
      graft.pipeline.Similarity.pqEncode(vecs, "embedding", books)
        .select("vec_id", "codes")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    }
    assert(pq(2) == pq(11))
  }

  test("property: duplicateClusters == brute-force connected components") {
    import spark.implicits._
    val n = 40
    val edges = (0 until 50).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val pairs = edges.toDF("id_a", "id_b")
    // brute force: repeated min-relaxation to fixpoint on the driver
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var comp = nodes.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b) =>
        val m = math.min(comp(a), comp(b))
        if (comp(a) != m) { comp += a -> m; changed = true }
        if (comp(b) != m) { comp += b -> m; changed = true }
      }
    }
    val got = graft.pipeline.Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == comp)
  }

  test("property: tokenBudget == brute-force global-order prefix") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, 1L + rnd.nextInt(50)))
    val df = rows.toDF("doc_id", "n_tok").repartition(7)
    // brute force: hash order on the driver, running-sum prefix
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(("p" + id).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 4294967296L
    }
    for (budget <- Seq(0L, 100L, 1000L, 3000L, 100000L)) {
      var cum = 0L
      val want = rows.sortBy { case (id, _) => (h(id), id) }
        .map { case (id, t) => cum += t; (id, t, cum) }
        .takeWhile(_._3 <= budget).toSet
      val got = graft.pipeline.Sampling
        .tokenBudget(df, "doc_id", "n_tok", budget, bandBits = 3,
          salt = "p", portable = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want, s"budget $budget")
    }
    // shuffleOrder == brute-force global hash-order rank, and a new
    // salt produces a different permutation
    val order = graft.pipeline.Sampling
      .shuffleOrder(df, "doc_id", bandBits = 3, salt = "p", portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantOrder = rows.map(_._1).sortBy(id => (h(id), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(order == wantOrder)
    val order2 = graft.pipeline.Sampling
      .shuffleOrder(df, "doc_id", bandBits = 3, salt = "q", portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(order2 != order && order2.values.toSeq.sorted == order.values.toSeq.sorted)

    // split assignment partitions the id space exactly, ~80/10/10
    val sp = graft.pipeline.Sampling.splitAssign(df, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s", portable = true)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sp.values.sum == 200 && sp("train") > sp.getOrElse("val", 0L))
  }

  test("property: containment catches subset docs that Jaccard misses") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docsDf = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val post = graft.pipeline.Dedup
      .hashedPostings(docsDf, "text", "doc_id")
    val cont = graft.pipeline.Dedup
      .containmentFromPostings(post, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the short doc is fully contained in the long one...
    assert(cont.exists { case (id, in, c) => id == 1L && in == 2L && c == 1.0 })
    // ...but not vice versa, and symmetric Jaccard misses the pair
    assert(!cont.exists { case (id, in, _) => id == 2L && in == 1L })
    val jac = graft.pipeline.Dedup
      .jaccardFromPostings(post, threshold = 0.5).count()
    assert(jac == 0)
  }

  test("property: packSequences == per-bucket brute-force cumsum cut") {
    import spark.implicits._
    val docsDf = (0L until 40L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.pipeline.TextAnalysis
      .packSequences(docsDf, "text", "doc_id", budget = 16, nBuckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4))).sortBy(_._1)
    // brute force: group docs by the same salted hash bucket, walk in
    // id order accumulating token counts
    val byBucket = out.groupBy(_._2)
    byBucket.foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, nTok, pack, off) =>
        assert(pack == cum / 16, s"pack mismatch at cum=$cum")
        assert(off == cum % 16, s"offset mismatch at cum=$cum")
        assert(off >= 0 && off < 16)
        cum += nTok
      }
    }
    // every doc appears exactly once and token counts are preserved
    assert(out.length == 40)
    assert(out.map(_._3.toLong).sum ==
      docsDf.collect().map(_.getString(1).split(" ").length.toLong).sum)
  }

  test("property: segmentDedup keeps each segment once, at first occurrence") {
    import spark.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    // random corpus of 4-token segments drawn from a tiny segment pool
    // so cross-document repeats are guaranteed
    val pool = (0 until 6).map(_ =>
      Seq.fill(4)(vocab(rnd.nextInt(vocab.size))).mkString(" ")).toVector
    val docsDf = (0L until 12L).map { id =>
      (id, Seq.fill(1 + rnd.nextInt(4))(pool(rnd.nextInt(pool.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.pipeline.Dedup
      .segmentDedup(docsDf, "text", "doc_id", width = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)
    // brute force on the driver
    val toks = docsDf.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").toSeq).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val expected = toks.map { case (id, tk) =>
      val segs = tk.grouped(4).map(_.mkString(" ")).toSeq
      val keep = segs.filter(s => seen.add(s))
      (id, segs.size.toLong, keep.size.toLong, keep.mkString(" "))
    }
    assert(out.toSeq == expected.toSeq)
    // global invariant: no surviving segment appears twice
    val all = out.flatMap(_._4.split(" ").grouped(4).map(_.mkString(" ")))
      .filter(_.nonEmpty)
    assert(all.distinct.length == all.length)
  }

  test("property: boilerplateStrip == brute-force per-source df filter") {
    import spark.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val pool = (0 until 5).map(_ =>
      Seq.fill(3)(vocab(rnd.nextInt(vocab.size))).mkString(" ")).toVector
    val docsDf = (0L until 15L).map { id =>
      (id, s"src${id % 3}",
        Seq.fill(1 + rnd.nextInt(4))(pool(rnd.nextInt(pool.size)))
          .mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = graft.pipeline.Dedup
      .boilerplateStrip(docsDf, "text", "doc_id", "source",
        width = 3, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._1)
    // brute force on the driver: df per (source, segment) over
    // distinct docs; segments with df >= 2 strip everywhere
    val rows = docsDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val segsOf = rows.map { case (id, src, text) =>
      (id, src, text.split(" ").grouped(3).map(_.mkString(" ")).toSeq)
    }
    val df2 = segsOf.flatMap { case (id, src, segs) =>
      segs.distinct.map(s => (src, s) -> id)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }
    val expected = segsOf.map { case (id, src, segs) =>
      val keep = segs.filter(s => df2((src, s)) < 2)
      (id, segs.size.toLong, keep.size.toLong, keep.mkString(" "))
    }
    assert(out.toSeq == expected.toSeq)
  }

  test("property: DSIR weights vanish when target == raw; sample ⊆ corpus") {
    import graft.pipeline.Sampling
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // target == raw pool ⇒ per-bucket tc == rc and tt == rt, so every
    // log-ratio is EXACTLY ln(x)-ln(y)-ln(x)+ln(y) = 0.0 — identical
    // doubles, not merely close
    val flat = Sampling.dsirWeights(docs, "text", "doc_id",
      org.apache.spark.sql.functions.lit(true), buckets = 32)
    assert(flat.filter(col("log_w") =!= 0.0).count() == 0)
    // n_tok is the document's token count
    val nt = flat.select("id", "n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.pipeline.TextAnalysis.tokens(col("text"))).as("n"))
      .collect().foreach { r =>
        assert(nt(r.getLong(0)) == r.getInt(1).toLong, s"doc ${r.getLong(0)}")
      }
    // with an English target, English docs average a higher weight
    // than the rest (the point of the operator) — deterministic on
    // this fixed corpus
    val w = Sampling.dsirWeights(docs, "text", "doc_id",
        col("lang") === "en", buckets = 64)
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
    val Array(nonEn, en) = w.groupBy(col("lang") === "en")
      .agg(avg(col("log_w") / col("n_tok")).as("m"))
      .orderBy(col("lang") === "en").collect() // false sorts first
      .map(_.getDouble(1))
    assert(en > nonEn)
    // sample: exactly n rows, all present in the weight table
    val ids = Sampling.dsirSample(docs, "text", "doc_id",
      col("lang") === "en", n = 20, buckets = 64)
      .collect().map(_.getLong(0))
    assert(ids.length == 20 && ids.distinct.length == 20)
    val all = Sampling.dsirWeights(docs, "text", "doc_id",
      col("lang") === "en", buckets = 64)
      .select("id").collect().map(_.getLong(0)).toSet
    ids.foreach(i => assert(all.contains(i)))
  }

  test("property: rankingEval == independent driver-side nDCG/MRR") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val r = new scala.util.Random(20260818)
    val k = 4
    val queries = (1 to 12).map(_.toLong)
    // distinct judged docs per query, graded 0-3 (rel = 0 judged docs
    // must behave exactly like unjudged ones)
    val truthRows = queries.flatMap { q =>
      r.shuffle((0 to 9).toList).take(r.nextInt(6))
        .map(d => (q, d.toLong, r.nextInt(4).toDouble))
    }
    // result lists with ranks 1.., some docs unjudged (ids 10-11),
    // some lists longer than k, some queries absent
    val approxRows = queries.filter(_ => r.nextInt(5) > 0).flatMap { q =>
      r.shuffle((0 to 11).toList).take(1 + r.nextInt(6))
        .zipWithIndex.map { case (d, i) => (q, d.toLong, i + 1) }
    }
    val got = Similarity.rankingEval(
        approxRows.toDF("q_id", "vec_id", "rank"),
        truthRows.toDF("q_id", "vec_id", "rel"), k)
      .collect().map(row => row.getLong(0) ->
        (row.getDouble(1), row.getDouble(2))).toMap
    def lg2(x: Double) = math.log(x) / math.log(2)
    val relMap = truthRows.map { case (q, d, rel) => (q, d) -> rel }.toMap
    // truth-driven spine: every query judged OR retrieved-within-k
    // emits a row; a query retrieval missed scores 0/0 instead of
    // dropping out of the macro-average
    val spine = truthRows.map(_._1).toSet ++
      approxRows.filter(_._3 <= k).map(_._1).toSet
    val expect = spine.map { q =>
      val topk = approxRows.filter(r => r._1 == q && r._3 <= k)
      val dcg = topk.map { case (_, d, rk) =>
        relMap.getOrElse((q, d), 0.0) / lg2(rk + 1.0) }.sum
      val ideal = truthRows.filter(t => t._1 == q && t._3 > 0)
        .sortBy(t => (-t._3, t._2)).take(k)
      val idcg = ideal.zipWithIndex
        .map { case (t, i) => t._3 / lg2(i + 2.0) }.sum
      val first = topk
        .filter { case (_, d, _) => relMap.getOrElse((q, d), 0.0) > 0 }
        .map(_._3).sorted.headOption
      q -> (if (idcg == 0) 0.0 else dcg / idcg,
        first.map(1.0 / _).getOrElse(0.0))
    }.toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (q, (nd, mrr)) =>
      assert(math.abs(got(q)._1 - nd) < 1e-9, s"ndcg q$q")
      assert(math.abs(got(q)._2 - mrr) < 1e-9, s"mrr q$q")
    }
  }

  test("property: trainHashedLogreg == independent driver-side GD") {
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    val r = new scala.util.Random(20260819)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    val corpus = (1 to 25).map { i =>
      val text = (0 until r.nextInt(6))
        .map(_ => words(r.nextInt(words.size))).mkString(" ")
      (i.toLong, text, if (r.nextBoolean()) "en" else "fr")
    }
    val buckets = 8; val iters = 3; val lr = 0.4
    val (w, bias) = TextAnalysis.trainHashedLogreg(
      corpus.toDF("doc_id", "text", "lang"), "text", "doc_id",
      col("lang") === "en", buckets, iters, lr, portable = true)
    // independent trainer: own MD5 hashing, dense per-doc loops
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16) % 4294967296L
    }
    val feats = corpus
      .map { case (_, text, lang) =>
        (text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty),
          if (lang == "en") 1.0 else 0.0) }
      .filter(_._1.nonEmpty)
      .map { case (tk, y) =>
        val m = scala.collection.mutable.Map[Int, Double]()
          .withDefaultValue(0.0)
        tk.foreach(t => m((h32(t) % buckets).toInt) += 1.0 / tk.length)
        m(buckets) = 1.0
        (m.toMap, y)
      }
    val ww = Array.fill(buckets + 1)(0.0)
    for (_ <- 0 until iters) {
      val grad = Array.fill(buckets + 1)(0.0)
      feats.foreach { case (x, y) =>
        val s = x.map { case (b, v) => ww(b) * v }.sum
        val rr = 1.0 / (1.0 + math.exp(-s)) - y
        x.foreach { case (b, v) => grad(b) += rr * v }
      }
      for (b <- 0 to buckets) ww(b) -= lr * grad(b) / feats.size
    }
    (0 until buckets).foreach(b =>
      assert(math.abs(w(b) - ww(b)) < 1e-8, s"w($b)"))
    assert(math.abs(bias - ww(buckets)) < 1e-8)
  }

  test("property: temperatureTargets == driver transcription for random " +
       "counts and alphas; monotone toward uniform as alpha falls") {
    import spark.implicits._
    import graft.pipeline.Sampling
    val rnd = new scala.util.Random(20260816)
    (1 to 5).foreach { trial =>
      val nSrc = 2 + rnd.nextInt(8)
      val counts = (0 until nSrc).map(i => s"s$i" -> (1 + rnd.nextInt(500)))
      val df = counts.flatMap { case (s, n) =>
        (1 to n).map(i => (s, i.toLong))
      }.toDF("source", "doc_id")
      for (alpha <- Seq(0.0, 0.3, 0.5, 0.7, 1.0)) {
        val got = Sampling.temperatureTargets(df, "source", alpha)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
        // driver transcription: q_i = p_i^a / sum p_j^a
        val tot = counts.map(_._2).sum.toDouble
        val powed = counts.map { case (s, n) =>
          s -> math.pow(n / tot, alpha) }
        val z = powed.map(_._2).sum
        powed.foreach { case (s, p) =>
          assert(math.abs(got(s) - p / z) < 1e-9,
            s"trial $trial alpha $alpha source $s") }
      }
      // smoothing monotonicity at the extremes (provable: q_max =
      // 1/Σ(p_j/p_max)^α with ratios ≤ 1, so falling α raises the sum
      // and lowers q_max; dually for q_min — MIDDLE sources can cross
      // the uniform line, so no per-source claim there)
      val byAlpha = Seq(1.0, 0.5, 0.0).map(a =>
        Sampling.temperatureTargets(df, "source", a)
          .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap)
      val sMax = counts.maxBy(_._2)._1
      val sMin = counts.minBy(_._2)._1
      assert(byAlpha(0)(sMax) >= byAlpha(1)(sMax) - 1e-12 &&
        byAlpha(1)(sMax) >= byAlpha(2)(sMax) - 1e-12,
        s"trial $trial head source must shrink toward uniform")
      assert(byAlpha(0)(sMin) <= byAlpha(1)(sMin) + 1e-12 &&
        byAlpha(1)(sMin) <= byAlpha(2)(sMin) + 1e-12,
        s"trial $trial tail source must grow toward uniform")
    }
  }

  test("CharWindows == substr-per-position windows on random text " +
       "(ASCII, multibyte, short, empty)") {
    import spark.implicits._
    val pieces = Seq("ab", "x", "\u00e9", "\u4e16\u754c", " ", "0", "\ud83d\ude00", "qrs")
    val texts = (0 until 60).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => pieces(rnd.nextInt(pieces.size))).mkString)
    } ++ Seq((100L, ""), (101L, "exact8ch"), (102L, "a" * 200))
    val df = texts.toDF("id", "text")
    for (k <- Seq(3, 8)) {
      val legacy = transform(
        sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))),
        i => col("text").substr(i, lit(k)))
      val rows = df.select(col("id"),
          graft.functions.CharWindows(col("text"), k).as("native"),
          legacy.as("legacy"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"k=$k id=${r.getLong(0)}")
      }
    }
  }

  test("BM25 matches a scalar reimplementation on a tiny fixture; " +
       "RRF of a ranking with itself doubles every score") {
    import spark.implicits._
    import graft.pipeline.Similarity
    val docs = Seq((0L, "a a b"), (1L, "a c"), (2L, "b c c"))
      .toDF("doc_id", "text")
    val q = Seq((0L, "a")).toDF("q_id", "q_text")
    val got = Similarity.bm25TopK(docs, q, 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // scalar BM25 with the same constants: N=3, df(a)=2, avgdl=8/3
    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    val avgdl = 8.0 / 3
    def s(tf: Long, dl: Long): Double =
      idf * (tf * (1.2 + 1)) / (tf + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl)))
    val expected = Seq((0L, s(2, 3), 1), (1L, s(1, 2), 2))
    assert(got.length == 2)
    got.zip(expected).foreach { case ((id, sc, rk), (eid, esc, erk)) =>
      assert(id == eid && rk == erk && math.abs(sc - esc) < 1e-12,
        s"got ${got.toSeq} expected $expected")
    }
    // RRF self-fusion: each doc scores exactly 2/(60+rank), order kept
    val base = Similarity.bm25TopK(docs, q, 10)
    val fused = Similarity.rrfFuse(Seq(base, base), 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getLong(4)))
    assert(fused.toSeq.sortBy(_._3) == Seq(
      (0L, 2.0 / 61, 1, 2L), (1L, 2.0 / 62, 2, 2L)))
  }
}
