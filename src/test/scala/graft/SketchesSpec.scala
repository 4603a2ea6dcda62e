package graft

import graft.functions.SketchOps
import graft.pipeline.{Sketches, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Bounded-memory sketch family: HLL estimate quality + mergeability,
  * Bloom no-false-negative containment, CMS one-sided error — the
  * properties that make the fixed-size state trustworthy at scale. */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("HLL estimate lands within 2.5 sigma of exact at 5k distinct") {
    val agg = new Sketches.HllAgg
    var buf = agg.zero
    (0 until 5000).foreach(i => buf = agg.reduce(buf, h60(s"item-$i")))
    val r = agg.finish(buf)
    // m=256 → relative standard error 1.04/sqrt(256) = 6.5%
    assert(math.abs(r.est - 5000.0) / 5000.0 < 0.1625, s"est ${r.est}")
    assert(r.v_zero == 0)
  }

  test("HLL small-range regime uses linear counting: tight at 100 distinct") {
    val agg = new Sketches.HllAgg
    var buf = agg.zero
    (0 until 100).foreach(i => buf = agg.reduce(buf, h60(s"lc-$i")))
    val r = agg.finish(buf)
    assert(r.v_zero > 0)
    // linear-counting rse at n/m=0.39 is ~4.7%; allow ~3 sigma
    assert(math.abs(r.est - 100.0) / 100.0 < 0.15, s"est ${r.est}")
  }

  test("HLL sketches of disjoint shards merge exactly") {
    val agg = new Sketches.HllAgg
    var full = agg.zero
    var a = agg.zero
    var b = agg.zero
    (0 until 2000).foreach { i =>
      val h = h60(s"x-$i")
      full = agg.reduce(full, h)
      if (i % 2 == 0) a = agg.reduce(a, h) else b = agg.reduce(b, h)
    }
    // overlap too: shard b re-sees half of shard a's items
    (0 until 500).foreach(i => b = agg.reduce(b, h60(s"x-${i * 2}")))
    assert(agg.finish(agg.merge(a, b)) == agg.finish(full))
  }

  test("Bloom filter never misses an inserted key; FP rate is bounded") {
    val mBits = 1 << 16
    val keys = (0 until 2000).map(i => h60(s"gram-$i"))
    val bits = new Array[Byte](mBits / 8)
    keys.foreach(h => SketchOps.bloomSet(bits, h, mBits, 4))
    assert(keys.forall(h => SketchOps.bloomHit(h, bits, mBits, 4)))
    val probes = (0 until 20000).map(i => h60(s"other-$i"))
    val fp = probes.count(h => SketchOps.bloomHit(h, bits, mBits, 4))
    // theoretical FP ≈ (1-e^(-4*2000/65536))^4 ≈ 1.7e-4 → expect ~3
    assert(fp < 40, s"$fp false positives in 20k probes")
  }

  test("Bloom shard filters merge by OR to the filter of the union") {
    val mBits = 1 << 16
    val a = new Array[Byte](mBits / 8)
    val b = new Array[Byte](mBits / 8)
    val u = new Array[Byte](mBits / 8)
    (0 until 1000).foreach { i =>
      val h = h60(s"k-$i")
      SketchOps.bloomSet(u, h, mBits, 4)
      SketchOps.bloomSet(if (i % 2 == 0) a else b, h, mBits, 4)
    }
    val agg = new Sketches.BloomAgg(mBits, 4)
    assert(java.util.Arrays.equals(agg.merge(a, b), u))
  }

  test("CMS estimate is one-sided: est >= exact, overshoot bounded") {
    val width = 2048
    val counters = new Array[Long](width * 4)
    // zipfian-ish stream: item i appears ~ 3000/(i+1) times
    val counts = (0 until 500).map(i => s"w$i" -> (3000 / (i + 1) + 1))
    var n = 0L
    counts.foreach { case (w, c) =>
      val h = h60(w)
      (0 until c).foreach(_ => SketchOps.cmsAdd(counters, h, width, 4))
      n += c
    }
    counts.foreach { case (w, c) =>
      val est = SketchOps.cmsMin(h60(w), counters, width, 4)
      assert(est >= c, s"$w: est $est < exact $c")
      // standard CMS bound: overshoot <= 2N/width w.h.p.
      assert(est - c <= 2 * n / width + 1, s"$w: overshoot ${est - c}")
    }
  }

  test("CMS shard grids merge by elementwise sum") {
    val width = 2048
    val agg = new Sketches.CmsAgg(width, 4)
    var a = agg.zero
    var b = agg.zero
    var u = agg.zero
    (0 until 3000).foreach { i =>
      val h = h60(s"t-${i % 200}")
      u = agg.reduce(u, h)
      if (i % 3 == 0) a = agg.reduce(a, h) else b = agg.reduce(b, h)
    }
    assert(agg.merge(a, b).toSeq == u.toSeq)
  }

  test("probe expressions agree with the static kernels under codegen") {
    import spark.implicits._
    val mBits = 1 << 16
    val bits = new Array[Byte](mBits / 8)
    val counters = new Array[Long](2048 * 4)
    (0 until 100).foreach { i =>
      val h = h60(s"in-$i")
      SketchOps.bloomSet(bits, h, mBits, 4)
      SketchOps.cmsAdd(counters, h, 2048, 4)
    }
    val hashes = (0 until 100).map(i => h60(s"in-$i")) ++
      (0 until 100).map(i => h60(s"out-$i"))
    val got = hashes.toDF("h")
      .select(col("h"), Sketches.bloomProbe(col("h"), bits).as("hit"),
        Sketches.cmsProbe(col("h"), counters).as("est"))
      .collect()
    got.foreach { r =>
      val h = r.getLong(0)
      assert(r.getBoolean(1) == SketchOps.bloomHit(h, bits, mBits, 4))
      assert(r.getLong(2) == SketchOps.cmsMin(h, counters, 2048, 4))
    }
  }

  test("d19 bloom screen contains d08's exact contamination (no false negatives)") {
    val sf = "/root/testdata/sf0.001"
    val exact = PipelineQueries.queries("d08_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = PipelineQueries.queries("d19_bloom_decontam")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (doc, nExact) =>
      assert(bloom.getOrElse(doc, 0L) >= nExact,
        s"doc $doc: bloom ${bloom.get(doc)} < exact $nExact")
    }
  }

  test("t25 HLL per-source estimates track exact distinct counts") {
    val sf = "/root/testdata/sf0.001"
    val rows = PipelineQueries.queries("t25_hll_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nExact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est")
      // linear-counting regime at these cardinalities: tight band
      assert(est > nExact * 0.75 && est < nExact * 1.33,
        s"${r.get(0)}: est $est vs exact $nExact")
    }
  }

  test("t26 CMS heavy hitters: every estimate dominates its exact count") {
    val sf = "/root/testdata/sf0.001"
    val rows = PipelineQueries.queries("t26_cms_heavy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n_exact"))
    }
  }

  test("KMV bottom-k: mergeable, distinct estimate tracks, Jaccard estimate tracks") {
    val agg = new Sketches.BottomKAgg(256)
    val setA = (0 until 3000).map(i => h60(s"a-$i"))
    val setB = (0 until 3000).map(i => h60(s"a-${i + 1500}")) // 50% overlap
    def sketch(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
    val (ska, skb) = (sketch(setA), sketch(setB))
    // mergeability: bottomk(bottomk(A) ∪ bottomk(B)) == bottomk(A ∪ B)
    assert(agg.merge(ska, skb) == sketch(setA ++ setB))
    // distinct estimate from one sketch: (k-1)·D / h_k within ~3σ
    val est = 255.0 * Sketches.KmvDomain / ska.last.toDouble
    assert(math.abs(est - 3000.0) / 3000.0 < 0.20, s"est $est")
    // Jaccard estimate from the merged bottom-k: true J = 1500/4500
    val u = (ska ++ skb).distinct.sorted.take(256)
    val inA = setA.toSet
    val inB = setB.toSet
    val rho = u.count(x => inA(x) && inB(x)).toDouble / u.size
    assert(math.abs(rho - 1.0 / 3.0) < 0.12, s"rho $rho")
  }

  test("t28 KMV overlap estimates track the exact jaccard in-output") {
    val sf = "/root/testdata/sf0.001"
    val rows = PipelineQueries.queries("t28_kmv_overlap")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val estJ = r.getAs[Double]("jaccard_est")
      val exactJ = r.getAs[Double]("jaccard")
      // k=256 over small per-source vocabularies → sketch is exact
      // when the union fits in k; allow slack where it doesn't
      assert(math.abs(estJ - exactJ) < 0.15, s"$r")
    }
  }

  test("histogram quantile sketch: mergeable, and tracks exact quantiles") {
    val agg = new Sketches.HistQuantAgg
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(10000)(math.abs(rnd.nextGaussian() * 800 + 2000).toLong)
    var full = agg.zero
    var a = agg.zero
    var b = agg.zero
    xs.zipWithIndex.foreach { case (x, i) =>
      full = agg.reduce(full, x)
      if (i % 2 == 0) a = agg.reduce(a, x) else b = agg.reduce(b, x)
    }
    assert(agg.finish(agg.merge(a, b)) == agg.finish(full))
    val r = agg.finish(full)
    val sorted = xs.sorted
    def exact(p: Double) = sorted(math.ceil(p * xs.length).toInt - 1).toDouble
    assert(r.total == 10000L)
    // log bins: relative error bounded by the bin width (~2x worst
    // case); gaussian data interpolates much tighter
    assert(math.abs(r.p50 - exact(0.5)) / exact(0.5) < 0.35, s"p50 ${r.p50}")
    assert(math.abs(r.p90 - exact(0.9)) / exact(0.9) < 0.35, s"p90 ${r.p90}")
    assert(math.abs(r.p99 - exact(0.99)) / exact(0.99) < 0.35, s"p99 ${r.p99}")
    // quantiles are monotone and inside the data range
    assert(r.p50 <= r.p90 && r.p90 <= r.p99)
    assert(r.p99 <= sorted.last.toDouble * 2)
  }

  test("sessionize splits exactly at the gap and numbers sessions 1-based") {
    import spark.implicits._
    val ev = Seq(
      // user 1: two sessions (gap of 2h between ts 3000s and 10200s)
      (1L, 1000L * 1000, 1L, "view", 1.0),
      (2L, 2000L * 1000, 1L, "click", 2.0),
      (3L, 3000L * 1000, 1L, "view", 3.0),
      (4L, 10200L * 1000, 1L, "purchase", 4.0),
      // user 2: one event; duplicate-ts tie with event_id order
      (5L, 500L * 1000, 2L, "view", 1.0),
      (6L, 500L * 1000, 2L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.pipeline.Trajectories
      .sessionStats(ev, gapMs = 1800000L)
      .orderBy("user_id", "session_idx")
      .collect()
    assert(got.length == 3)
    val s1 = got(0)
    assert(s1.getAs[Long]("user_id") == 1L &&
      s1.getAs[Long]("session_idx") == 1L &&
      s1.getAs[Long]("n_events") == 3L &&
      s1.getAs[Long]("dur_ms") == 2000L * 1000)
    val s2 = got(1)
    assert(s2.getAs[Long]("session_idx") == 2L &&
      s2.getAs[Long]("n_events") == 1L)
    val s3 = got(2)
    assert(s3.getAs[Long]("user_id") == 2L &&
      s3.getAs[Long]("n_events") == 2L && s3.getAs[Long]("dur_ms") == 0L)
  }

  test("funnel honors stage order and the entry window") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes all three in order
      (1L, 1000L, 1L, "view", 0.0), (2L, 2000L, 1L, "click", 0.0),
      (3L, 3000L, 1L, "purchase", 0.0),
      // u2: click BEFORE view → stage 2 not reached via that click
      (4L, 1000L, 2L, "click", 0.0), (5L, 2000L, 2L, "view", 0.0),
      // u3: purchase outside the window
      (6L, 1000L, 3L, "view", 0.0), (7L, 1500L, 3L, "click", 0.0),
      (8L, 999999999L, 3L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.pipeline.Trajectories
      .funnel(ev, Seq("view", "click", "purchase"), windowMs = 10000L)
      .orderBy("stage_idx").collect()
    assert(got.map(_.getAs[Long]("n_users")).toSeq == Seq(3L, 2L, 1L))
  }

  test("persisted sketch lifecycle: parquet round-trip + shard fold == rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    // day 1: build per-source HLL register tables and persist them
    val day1 = (0 until 2000).map(i => (s"src${i % 4}", h60(s"d1-$i")))
      .toDF("source", "h")
    val agg = udaf(new Sketches.HllRegAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    day1.groupBy("source").agg(agg(col("h")).as("regs"))
      .write.mode("overwrite").parquet(s"$dir/hll")
    // day 2 shard arrives: fold INTO the stored sketch without
    // re-reading day 1's rows
    val day2 = (0 until 1000).map(i => (s"src${i % 4}", h60(s"d2-$i")))
      .toDF("source", "h")
    val fold = udaf(new Sketches.HllRegMergeAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]())
    val folded = spark.read.parquet(s"$dir/hll")
      .unionByName(day2.groupBy("source").agg(agg(col("h")).as("regs")))
      .groupBy("source").agg(fold(col("regs")).as("regs"))
    // fold of sketches == rebuild over the union of rows
    val rebuilt = day1.unionByName(day2)
      .groupBy("source").agg(agg(col("h")).as("regs"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("regs")).toMap
    folded.collect().foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("regs"),
        rebuilt(r.getString(0))), r.getString(0))
    }
  }

  test("HLL relational check: Spark tokens hash to the documented register/rank") {
    // pin the register/rank derivation the oracle mirrors: low 8 bits
    // index, rank = 53 - bitlength(h >> 8)
    val h = h60("hello")
    assert(SketchOps.hllRegister(h) == (h & 255L).toInt)
    val w = h >>> 8
    val expected = if (w == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    assert(SketchOps.hllRank(h) == expected)
    // and the Spark-side portable hash equals the local md5 prefix
    import spark.implicits._
    val got = Seq("hello").toDF("s")
      .select(TextAnalysis.hash60(col("s"), portable = true)).head.getLong(0)
    assert(got == h)
  }
}
