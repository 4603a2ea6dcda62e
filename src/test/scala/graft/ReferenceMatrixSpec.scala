package graft

import graft.model.Points
import graft.query._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, hex}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.collection.mutable.ArrayBuffer

/**
 * Ports of the reference's TestTsdbQueryAggregators matrix suite
 * (/root/reference/test/core/TestTsdbQueryAggregators.java) — the
 * full-query integration goldens over the BaseTsdbTest fixtures
 * (storeLongTimeSeriesSeconds / storeFloatTimeSeriesSeconds /
 * storeLongTimeSeriesWithMissingData, BaseTsdbTest.java:612-733).
 * Each test transliterates the reference's assert loop verbatim and
 * checks `Engine.run` output against it.
 *
 * These pin the round-9 semantics directly to reference numbers:
 * the OFFSET variants assert INTEGER-lerped values (truncating long
 * division at the cross-series layer, AggregationIterator
 * .nextLongValue:705) and runDev* assert the truncated long results
 * of the runLong aggregator path. runAvg/runAvgOffset live in
 * OperatorsSpec; runPercentiles is skipped (the reference itself only
 * asserts ±150, and exact percentile goldens live in OperatorsSpec).
 */
class ReferenceMatrixSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val M = "sys.cpu.user"
  private def web(i: Int) = Map("host" -> s"web0$i")

  /** storeLongTimeSeriesSeconds: A(web01) 1..300 asc from
    * 1356998430s step 30s; B(web02) 300..1 desc from 1356998430s
    * (aligned) or 1356998445s (offset). Long-typed points. */
  private def longRows(offset: Boolean): Seq[Row] = {
    val a = (1 to 300).map(i => Row(M, (1356998400L + 30L * i) * 1000L,
      i.toDouble, java.lang.Long.valueOf(i.toLong), true, web(1)))
    val base = if (offset) 1356998415L else 1356998400L
    val b = (1 to 300).map(j => Row(M, (base + 30L * j) * 1000L,
      (301 - j).toDouble, java.lang.Long.valueOf(301L - j), true, web(2)))
    a ++ b
  }

  /** storeFloatTimeSeriesSeconds: A 1.25..76.0 step .25;
    * B 75.0..0.25 desc. Float-typed (is_int = false). */
  private def floatRows(offset: Boolean): Seq[Row] = {
    val a = (1 to 300).map(i => Row(M, (1356998400L + 30L * i) * 1000L,
      1.0 + i * 0.25, null, false, web(1)))
    val base = if (offset) 1356998415L else 1356998400L
    val b = (1 to 300).map(j => Row(M, (base + 30L * j) * 1000L,
      75.25 - j * 0.25, null, false, web(2)))
    a ++ b
  }

  /** storeLongTimeSeriesWithMissingData: A keeps i%3!=0 (value i+1),
    * B keeps odd values (300-j), both 10s cadence from 1356998400s. */
  private def missingRows(): Seq[Row] = {
    val a = (0 until 300).filter(_ % 3 != 0).map(i =>
      Row(M, (1356998400L + 10L * i) * 1000L, (i + 1).toDouble,
        java.lang.Long.valueOf(i + 1L), true, web(1)))
    val b = (0 until 300).filter(j => (300 - j) % 2 != 0).map(j =>
      Row(M, (1356998400L + 10L * j) * 1000L, (300 - j).toDouble,
        java.lang.Long.valueOf(300L - j), true, web(2)))
    a ++ b
  }

  private def runQ(rows: Seq[Row], sub: SubQuery,
                   startMs: Long = 1356998400000L,
                   endMs: Long = 1357041600000L): Vector[(Long, Double)] = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, Points.schema)
    Engine.run(df, TsQuery(startMs, endMs, Seq(sub)), sub)
      .orderBy("ts").collect().map { r =>
        (r.getAs[Long]("ts"), r.getAs[Any]("value") match {
          case n: Number => n.doubleValue()
        })
      }.toVector
  }

  private def runAgg(rows: Seq[Row], agg: String): Vector[(Long, Double)] =
    runQ(rows, SubQuery(agg, M))

  /** Assert output == expected values on the fixed grid. */
  private def checkGrid(out: Vector[(Long, Double)], n: Int, stepMs: Long,
                        exp: Seq[Double], tol: Double = 0.0): Unit = {
    assert(out.size == n, s"expected $n dps, got ${out.size}")
    var ts = 1356998430000L
    out.zip(exp).zipWithIndex.foreach { case (((t, v), e), k) =>
      assert(t == ts, s"dp $k: ts $t != $ts")
      if (tol == 0.0) assert(v == e, s"dp $k @ $t: $v != $e")
      else assert(math.abs(v - e) <= tol, s"dp $k @ $t: $v != $e")
      ts += stepMs
    }
  }

  // ---- zimsum ---------------------------------------------------------

  test("runZimSum: aligned long series sum to 301 everywhere") {
    checkGrid(runAgg(longRows(false), "zimsum"), 300, 30000L,
      Seq.fill(300)(301.0))
  }

  test("runZimSumFloat: aligned float series sum to 76.25") {
    checkGrid(runAgg(floatRows(false), "zimsum"), 300, 30000L,
      Seq.fill(300)(76.25), tol = 0.001)
  }

  test("runZimSumOffset: interleaved series pass through unfilled") {
    val exp = (0 until 600).map(k =>
      if (k % 2 == 0) 1.0 + k / 2 else 300.0 - k / 2)
    checkGrid(runAgg(longRows(true), "zimsum"), 600, 15000L, exp)
  }

  test("runZimSumFloatOffset: interleaved float pass-through") {
    val exp = (0 until 600).map(k =>
      if (k % 2 == 0) 1.25 + 0.25 * (k / 2) else 75.0 - 0.25 * (k / 2))
    checkGrid(runAgg(floatRows(true), "zimsum"), 600, 15000L, exp,
      tol = 0.001)
  }

  test("runZimSumWithMissingData: gaps only where BOTH series miss") {
    val out = runAgg(missingRows(), "zimsum")
    assert(out.size == 250, s"got ${out.size}")
    var i = 0
    var ts = 1356998400000L
    out.foreach { case (t, v) =>
      var off = i % 6
      if (off == 0) { ts += 10000; i += 1; off = 1 }
      assert(t == ts, s"i=$i: ts $t != $ts")
      val e =
        if (off == 1 || off == 5) 301.0
        else if (off == 2 || off == 4) (i + 1).toDouble
        else (300 - i).toDouble
      assert(v == e, s"i=$i ts=$t: $v != $e")
      ts += 10000; i += 1
    }
  }

  // ---- min / max (LERP policy) ---------------------------------------

  test("runMin: aligned long min walks 1..150 and back") {
    val exp = ArrayBuffer[Double](); var v = 1L; var dec = false
    for (_ <- 0 until 300) {
      exp += v.toDouble
      if (dec) v -= 1 else v += 1
      if (v == 151) { v = 150; dec = true }
    }
    checkGrid(runAgg(longRows(false), "min"), 300, 30000L, exp.toSeq)
  }

  test("runMinFloat: aligned float min walks 1.25..38 and back") {
    val exp = ArrayBuffer[Double](); var v = 1.25; var dec = false
    for (_ <- 0 until 300) {
      exp += v
      if (dec) v -= 0.25 else v += 0.25
      if (v > 38) { v = 38.0; dec = true }
    }
    checkGrid(runAgg(floatRows(false), "min"), 300, 30000L, exp.toSeq,
      tol = 0.0001)
  }

  test("runMinOffset: INTEGER lerp min (truncating long division)") {
    val exp = ArrayBuffer[Double]()
    var v = 1L; var counter = 0; var dec = false
    for (_ <- 0 until 600) {
      exp += v.toDouble
      if (counter % 2 != 0) { if (dec) v -= 1 else v += 1 }
      else if (v == 151) { v = 150; dec = true; counter -= 1 }
      counter += 1
    }
    checkGrid(runAgg(longRows(true), "min"), 600, 15000L, exp.toSeq)
  }

  test("runMinFloatOffset: float lerp min in 0.125 steps") {
    val exp = ArrayBuffer[Double](); var v = 1.25; var dec = false
    for (_ <- 0 until 600) {
      exp += v
      if (dec) v -= 0.125 else v += 0.125
      if (v > 38.125) { v = 38.125; dec = true }
    }
    checkGrid(runAgg(floatRows(true), "min"), 600, 15000L, exp.toSeq,
      tol = 0.001)
  }

  test("runMax: aligned long max walks 300..151 and back") {
    val exp = ArrayBuffer[Double](); var v = 300L; var dec = true
    for (_ <- 0 until 300) {
      exp += v.toDouble
      if (dec) v -= 1 else v += 1
      if (v == 150) { v = 151; dec = false }
    }
    checkGrid(runAgg(longRows(false), "max"), 300, 30000L, exp.toSeq)
  }

  test("runMaxFloat: aligned float max walks 75.0..38.25 and back") {
    val exp = ArrayBuffer[Double](); var v = 75.0; var dec = true
    for (_ <- 0 until 300) {
      exp += v
      if (dec) v -= 0.25 else v += 0.25
      if (v < 38.25) { v = 38.25; dec = false }
    }
    checkGrid(runAgg(floatRows(false), "max"), 300, 30000L, exp.toSeq,
      tol = 0.001)
  }

  test("runMaxOffset: INTEGER lerp max with range-boundary singletons") {
    val exp = ArrayBuffer[Double]()
    var v = 1L; var counter = 0; var dec = true
    for (k <- 0 until 600) {
      val ts = 1356998430000L + 15000L * k
      exp += v.toDouble
      if (v == 1) v = 300
      else if (ts == 1357007400000L) v = 1
      else if (counter % 2 == 0) { if (dec) v -= 1 else v += 1 }
      if (v == 150) { v = 151; dec = false; counter -= 1 }
      counter += 1
    }
    checkGrid(runAgg(longRows(true), "max"), 600, 15000L, exp.toSeq)
  }

  test("runMaxFloatOffset: float lerp max with boundary singletons") {
    val exp = ArrayBuffer[Double](); var v = 1.25; var dec = true
    for (k <- 0 until 600) {
      val ts = 1356998430000L + 15000L * k
      exp += v
      if (v == 1.25) v = 75.0
      else if (ts == 1357007400000L) v = 0.25
      else {
        if (dec) v -= 0.125 else v += 0.125
        if (v < 38.25) { v = 38.25; dec = false }
      }
    }
    checkGrid(runAgg(floatRows(true), "max"), 600, 15000L, exp.toSeq,
      tol = 0.0001)
  }

  // ---- dev (runLong truncation at the cross-series layer) -------------

  test("runDev: aligned long dev truncates 149.5 -> 149 (runLong)") {
    val exp = ArrayBuffer[Double](); var v = 149L; var dec = true
    for (_ <- 0 until 300) {
      exp += v.toDouble
      if (dec) v -= 1 else v += 1
      if (v < 0) { v = 0; dec = false }
    }
    checkGrid(runAgg(longRows(false), "dev"), 300, 30000L, exp.toSeq)
  }

  test("runDevFloat: aligned float dev keeps fractions") {
    val exp = ArrayBuffer[Double](); var v = 36.875; var dec = true
    for (_ <- 0 until 300) {
      exp += v
      if (dec) v -= 0.25 else v += 0.25
      if (v < 0.125) { v = 0.125; dec = false }
    }
    checkGrid(runAgg(floatRows(false), "dev"), 300, 30000L, exp.toSeq,
      tol = 0.001)
  }

  test("runDevOffset: integer-lerped dev truncates per dp") {
    val exp = ArrayBuffer[Double]()
    var v = 0L; var counter = 0; var dec = true
    for (k <- 0 until 600) {
      val ts = 1356998430000L + 15000L * k
      exp += v.toDouble
      if (ts == 1356998430000L) v = 149
      else if (ts == 1357007400000L) v = 0
      else if (counter % 2 == 0) {
        if (dec) v -= 1 else v += 1
        if (v < 0) { v = 0; dec = false; counter += 1 }
      }
      counter += 1
    }
    checkGrid(runAgg(longRows(true), "dev"), 600, 15000L, exp.toSeq)
  }

  test("runDevFloatOffset: float lerped dev in 0.125 steps") {
    val exp = ArrayBuffer[Double](); var v = 0.0; var dec = true
    for (k <- 0 until 600) {
      val ts = 1356998430000L + 15000L * k
      exp += v
      if (ts == 1356998430000L) v = 36.8125
      else if (ts == 1357007400000L) v = 0.0
      else {
        if (dec) v -= 0.125 else v += 0.125
        if (v < 0.0625) { v = 0.0625; dec = false }
      }
    }
    checkGrid(runAgg(floatRows(true), "dev"), 600, 15000L, exp.toSeq,
      tol = 0.0001)
  }

  // ---- mimmin / mimmax (ignore-missing policy) -------------------------

  test("runMimMin: aligned behaves like min") {
    val exp = ArrayBuffer[Double](); var v = 1L; var dec = false
    for (_ <- 0 until 300) {
      exp += v.toDouble
      if (dec) v -= 1 else v += 1
      if (v == 151) { v = 150; dec = true }
    }
    checkGrid(runAgg(longRows(false), "mimmin"), 300, 30000L, exp.toSeq)
  }

  test("runMimMinOffset: missing series IGNORED, no lerp") {
    val exp = (0 until 600).map(k =>
      if (k % 2 == 0) 1.0 + k / 2 else 300.0 - k / 2)
    checkGrid(runAgg(longRows(true), "mimmin"), 600, 15000L, exp)
  }

  test("runMimMinFloat: aligned float behaves like min") {
    val exp = ArrayBuffer[Double](); var v = 1.25; var dec = false
    for (_ <- 0 until 300) {
      exp += v
      if (dec) v -= 0.25 else v += 0.25
      if (v > 38) { v = 38.0; dec = true }
    }
    checkGrid(runAgg(floatRows(false), "mimmin"), 300, 30000L, exp.toSeq,
      tol = 0.0001)
  }

  test("runMimMinFloatOffset: float pass-through under ignore-missing") {
    val exp = (0 until 600).map(k =>
      if (k % 2 == 0) 1.25 + 0.25 * (k / 2) else 75.0 - 0.25 * (k / 2))
    checkGrid(runAgg(floatRows(true), "mimmin"), 600, 15000L, exp,
      tol = 0.001)
  }

  test("runMimMax: aligned behaves like max") {
    val exp = ArrayBuffer[Double](); var v = 300L; var dec = true
    for (_ <- 0 until 300) {
      exp += v.toDouble
      if (dec) v -= 1 else v += 1
      if (v == 150) { v = 151; dec = false }
    }
    checkGrid(runAgg(longRows(false), "mimmax"), 300, 30000L, exp.toSeq)
  }

  test("runMimMaxFloat: aligned float behaves like max") {
    val exp = ArrayBuffer[Double](); var v = 75.0; var dec = true
    for (_ <- 0 until 300) {
      exp += v
      if (dec) v -= 0.25 else v += 0.25
      if (v < 38.25) { v = 38.25; dec = false }
    }
    checkGrid(runAgg(floatRows(false), "mimmax"), 300, 30000L, exp.toSeq,
      tol = 0.001)
  }

  test("runMimMaxOffset: missing series IGNORED, no lerp") {
    val exp = (0 until 600).map(k =>
      if (k % 2 == 0) 1.0 + k / 2 else 300.0 - k / 2)
    checkGrid(runAgg(longRows(true), "mimmax"), 600, 15000L, exp)
  }

  test("runMimMaxFloatOffset: float pass-through under ignore-missing") {
    val exp = (0 until 600).map(k =>
      if (k % 2 == 0) 1.25 + 0.25 * (k / 2) else 75.0 - 0.25 * (k / 2))
    checkGrid(runAgg(floatRows(true), "mimmax"), 600, 15000L, exp,
      tol = 0.001)
  }

  // ---- count (lerp contributions COUNT) --------------------------------

  test("runCount: aligned series count 2 everywhere") {
    checkGrid(runAgg(longRows(false), "count"), 300, 30000L,
      Seq.fill(300)(2.0))
  }

  test("runCountFloat: aligned float count 2 everywhere") {
    checkGrid(runAgg(floatRows(false), "count"), 300, 30000L,
      Seq.fill(300)(2.0))
  }

  test("runCountOffset: lerped contributions count; singletons at edges") {
    val exp = (0 until 600).map(k =>
      if (k == 0 || k == 599) 1.0 else 2.0)
    checkGrid(runAgg(longRows(true), "count"), 600, 15000L, exp)
  }

  test("runCountFloatOffset: float edition of the edge singletons") {
    val exp = (0 until 600).map(k =>
      if (k == 0 || k == 599) 1.0 else 2.0)
    checkGrid(runAgg(floatRows(true), "count"), 600, 15000L, exp)
  }

  // =====================================================================
  // TestTsdbQueryDownsample ports
  // (/root/reference/test/core/TestTsdbQueryDownsample.java) — the
  // single-series (host=web01) downsample matrix, the run_all family,
  // and the two-level agg x fill combos over missing data.
  // =====================================================================

  /** storeLongTimeSeriesMs / storeFloatTimeSeriesMs: 500 ms cadence. */
  private def longRowsMs(): Seq[Row] =
    (1 to 300).flatMap(i => Seq(
      Row(M, 1356998400000L + 500L * i, i.toDouble,
        java.lang.Long.valueOf(i.toLong), true, web(1)),
      Row(M, 1356998400000L + 500L * i, (301 - i).toDouble,
        java.lang.Long.valueOf(301L - i), true, web(2))))
  private def floatRowsMs(): Seq[Row] =
    (1 to 300).flatMap(i => Seq(
      Row(M, 1356998400000L + 500L * i, 1.0 + i * 0.25, null, false, web(1)),
      Row(M, 1356998400000L + 500L * i, 75.25 - i * 0.25, null, false,
        web(2))))

  private def web01 = Seq(LiteralOr("host", Seq("web01")))

  test("runLongSingleTSDownsample: 60s-avg buckets (1),(2,3)..(300)") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1m-avg")))
    val out = runQ(longRows(false), sub)
    assert(out.size == 151, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t == 1356998400000L + 60000L * i)
      val e = if (i == 0) 1.0 else if (i >= 150) 300.0 else i * 2 + 0.5
      assert(math.abs(v - e) <= 0.00001, s"dp $i: $v != $e")
    }
  }

  test("runLongSingleTSDownsampleMs: 1s-avg over 500ms cadence") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1s-avg")))
    val out = runQ(longRowsMs(), sub)
    assert(out.size == 151, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t % 1000 == 0)
      val e = if (i == 0) 1.0 else if (i >= 150) 300.0 else i * 2 + 0.5
      assert(math.abs(v - e) <= 0.00001, s"dp $i: $v != $e")
    }
  }

  test("runLongSingleTSDownsampleAndRate: rate over 60s-avg buckets") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1m-avg")),
      rate = Some(RateOptions()))
    val out = runQ(longRows(false), sub)
    assert(out.size == 150, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t == 1356998460000L + 60000L * i)
      if (i == 0 || i >= 149)
        assert(math.abs(v - 0.025) <= 0.001, s"dp $i: $v")
      else assert(math.abs(v - 0.033) <= 0.001, s"dp $i: $v")
    }
  }

  test("runLongSingleTSDownsampleAndRateMs: rate over 1s-avg buckets") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1s-avg")),
      rate = Some(RateOptions()))
    val out = runQ(longRowsMs(), sub)
    assert(out.size == 150, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t % 1000 == 0)
      if (i == 0 || i >= 149)
        assert(math.abs(v - 1.5) <= 0.001, s"dp $i: $v")
      else assert(math.abs(v - 2.0) <= 0.001, s"dp $i: $v")
    }
  }

  test("runFloatSingleTSDownsample: 60s-avg float buckets") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1m-avg")))
    val out = runQ(floatRows(false), sub)
    assert(out.size == 151, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t % 60000 == 0)
      val e = if (i == 0) 1.25 else if (i >= 150) 76.0 else (i + 2.25) / 2
      assert(math.abs(v - e) <= 0.00001, s"dp $i: $v != $e")
    }
  }

  test("runFloatSingleTSDownsampleMs: 1s-avg float over 500ms cadence") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1s-avg")))
    val out = runQ(floatRowsMs(), sub)
    assert(out.size == 151, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t % 1000 == 0)
      val e = if (i == 0) 1.25 else if (i >= 150) 76.0 else (i + 2.25) / 2
      assert(math.abs(v - e) <= 0.00001, s"dp $i: $v != $e")
    }
  }

  test("runFloatSingleTSDownsampleAndRate: rate over float 60s-avg") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1m-avg")),
      rate = Some(RateOptions()))
    val out = runQ(floatRows(false), sub)
    assert(out.size == 150, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t == 1356998460000L + 60000L * i)
      if (i == 0 || i >= 149)
        assert(math.abs(v - 0.00625) <= 0.000001, s"dp $i: $v")
      else assert(math.abs(v - 0.00833) <= 0.00001, s"dp $i: $v")
    }
  }

  test("runFloatSingleTSDownsampleAndRateMs: rate over float 1s-avg") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1s-avg")),
      rate = Some(RateOptions()))
    val out = runQ(floatRowsMs(), sub)
    assert(out.size == 150, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t % 1000 == 0)
      if (i == 0 || i >= 149)
        assert(math.abs(v - 0.375) <= 0.000001, s"dp $i: $v")
      else assert(math.abs(v - 0.5) <= 0.00001, s"dp $i: $v")
    }
  }

  test("runLongSingleTSDownsampleCount: 60s-count 1,2,..,2,1") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1m-count")))
    val out = runQ(longRows(false), sub)
    assert(out.size == 151, s"${out.size}")
    out.zipWithIndex.foreach { case ((_, v), i) =>
      val e = if (i == 0 || i == 150) 1.0 else 2.0
      assert(math.abs(v - e) <= 0.00001, s"dp $i: $v != $e")
    }
  }

  test("runLongSingleTSDownsampleAll: one [start,end) bucket at start") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("0all-sum")))
    val out = runQ(longRows(false), sub)
    assert(out == Vector((1356998400000L, 45150.0)), out.toString)
  }

  test("runLongSingleTSDownsampleAllSubSet: run_all excludes padded points") {
    // the reference golden that pins run_all's [start, end) point
    // bound: only values 4+5+6 = 15 fall in [..500s, ..600s) even
    // though the engine's lerp pad scans an hour either side
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("0all-sum")))
    val out = runQ(longRows(false), sub,
      startMs = 1356998500000L, endMs = 1356998600000L)
    assert(out == Vector((1356998500000L, 15.0)), out.toString)
  }

  test("runFloatSingleTSDownsampleAndRateAndCount: rate over counts") {
    val sub = SubQuery("sum", M, filters = web01,
      downsample = Some(DownsampleSpec.parse("1m-count")),
      rate = Some(RateOptions()))
    val out = runQ(floatRows(false), sub)
    assert(out.size == 150, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t == 1356998460000L + 60000L * i)
      val e = if (i == 0) 0.016666 else if (i == 149) -0.016666 else 0.0
      assert(math.abs(v - e) <= 0.00001, s"dp $i: $v != $e")
    }
  }

  // ---- two-level agg x fill combos over missing data -----------------
  // runTSDownsampleWithMissingData: 30s downsample with a fill policy,
  // then cross-series aggregation; the first 100 buckets carry data,
  // the rest are pure fill. NOTE the reference additionally emits its
  // scan-pad hour of fill buckets PAST the query end (dps == (end -
  // start + 3600)/30, a getScanEndTimeSeconds artifact); our fill grid
  // covers exactly [start, end) = 1440 buckets — deliberate divergence,
  // values identical where both emit.

  private def runWNulls(qAgg: String, dsAgg: String, fill: String)(
      valid: Double => Boolean)(isMissing: Double => Boolean): Unit = {
    val sub = SubQuery(qAgg, M,
      downsample = Some(DownsampleSpec.parse(s"30s-$dsAgg-$fill")))
    val out = runQ(missingRows(), sub)
    assert(out.size == 1440, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t == 1356998400000L + 30000L * i, s"dp $i ts $t")
      if (i < 100) assert(valid(v), s"dp $i: unexpected value $v")
      else assert(isMissing(v), s"dp $i: expected fill, got $v")
    }
  }
  private def fuzzy(e: Double)(v: Double) = math.abs(v - e) <= 0.0001
  private def isNaNv(v: Double) = v.isNaN
  private def isZero(v: Double) = math.abs(v) <= 0.0001

  test("runSumAvgLongSingleTSDownsampleWNulls: sum of 30s avgs = 301.5") {
    runWNulls("sum", "avg", "nan")(fuzzy(301.5))(isNaNv)
  }

  test("runAvgSumLongSingleTSDownsampleWNulls: 152, 301.5, 155, 301.5 ...") {
    var even = false; var evenExpected = 149.0
    runWNulls("avg", "sum", "nan") { v =>
      even = !even
      if (even) { evenExpected += 3.0; fuzzy(evenExpected)(v) }
      else fuzzy(301.5)(v)
    }(isNaNv)
  }

  test("runAvgAvgLongSingleTSDownsampleWNulls: flat 150.75, zero fill") {
    runWNulls("avg", "avg", "zero")(fuzzy(150.75))(isZero)
  }

  test("runSumSumLongSingleTSDownsampleWNulls: 304, 603, 310, 603 ...") {
    var even = false; var evenExpected = 298.0
    runWNulls("sum", "sum", "nan") { v =>
      even = !even
      if (even) { evenExpected += 6.0; fuzzy(evenExpected)(v) }
      else fuzzy(603.0)(v)
    }(isNaNv)
  }

  test("runMinMinLongSingleTSDownsampleWNulls: 2,5,8..149 then back") {
    var even = false
    var evenExpected = -4.0; var evenChange = 6.0
    var oddExpected = -1.0; var oddChange = 6.0
    runWNulls("min", "min", "zero") { v =>
      even = !even
      if (even) {
        evenExpected += evenChange
        if (fuzzy(152.0)(evenExpected)) { evenExpected = 149.0; evenChange = -6.0 }
        fuzzy(evenExpected)(v)
      } else {
        oddExpected += oddChange
        if (fuzzy(155.0)(oddExpected)) { oddExpected = 145.0; oddChange = -6.0 }
        fuzzy(oddExpected)(v)
      }
    }(isZero)
  }

  test("runMinSumLongSingleTSDownsampleWNulls: 5,11,17.. then the fold") {
    var even = false
    var evenExpected = -7.0; var evenChange = 12.0
    var oddExpected = -1.0; var oddChange = 12.0
    runWNulls("min", "sum", "nan") { v =>
      even = !even
      if (even) {
        evenExpected += evenChange
        if (fuzzy(209.0)(evenExpected)) { evenExpected = 197.0; evenChange = -6.0 }
        fuzzy(evenExpected)(v)
      } else {
        oddExpected += oddChange
        if (fuzzy(311.0)(oddExpected)) { oddExpected = 292.0; oddChange = -12.0 }
        fuzzy(oddExpected)(v)
      }
    }(isNaNv)
  }

  test("runSumMinLongSingleTSDownsampleWNulls: alternating 301, 300") {
    var even = false
    runWNulls("sum", "min", "nan") { v =>
      even = !even
      fuzzy(if (even) 301.0 else 300.0)(v)
    }(isNaNv)
  }

  // =====================================================================
  // TestTsdbQueryQueries ports
  // (/root/reference/test/core/TestTsdbQueryQueries.java) —
  // interpolation integration vectors, the mixed int/float series, and
  // the rate-counter family (whose Long.MAX_VALUE vectors REQUIRE exact
  // long rollover arithmetic: the double form cancels the +5 at 2^63).
  // =====================================================================

  private def longPt(ts: Long, v: Long) =
    Row(M, ts, v.toDouble, java.lang.Long.valueOf(v), true, web(1))

  test("runInterpolationSeconds: int-lerped sum alternates 301/302") {
    val out = runAgg(longRows(true), "sum")
    assert(out.size == 600, s"${out.size}")
    var v = 1L
    var ts = 1356998430000L
    out.foreach { case (t, value) =>
      assert(t == ts); ts += 15000
      assert(value == v.toDouble, s"at $t: $value != $v")
      if (t == 1357007400000L) v = 1
      else if (v == 1 || v == 302) v = 301
      else v = 302
    }
  }

  test("runInterpolationMs: 250ms-offset int-lerped sum") {
    val a = (1 to 300).map(i => longPt(1356998400000L + 500L * i, i.toLong))
    val b = (1 to 300).map(j => Row(M, 1356998400250L + 500L * j,
      (301 - j).toDouble, java.lang.Long.valueOf(301L - j), true, web(2)))
    val out = runAgg(a ++ b, "sum")
    assert(out.size == 600, s"${out.size}")
    var v = 1L
    var ts = 1356998400500L
    out.foreach { case (t, value) =>
      assert(t == ts); ts += 250
      assert(value == v.toDouble, s"at $t: $value != $v")
      if (t == 1356998550000L) v = 1
      else if (v == 1 || v == 302) v = 301
      else v = 302
    }
  }

  test("runInterpolationMsDownsampled: FLOAT lerp over double buckets") {
    // TS1: 500ms cadence to v=100 then 5s cadence to 120; TS2: 250ms-
    // offset descending. Downsample 1s-sum per series, then lerp sum —
    // the downsampled gaps interpolate in DOUBLE math (100.2, 100.4 …),
    // pinning that downsample output drops the integer typing
    val t1 = {
      var ts = 1356998400000L
      (1 to 120).map { i =>
        ts += (if (i <= 100) 500L else 5000L)
        longPt(ts, i.toLong)
      }
    }
    val t2 = (1 to 300).map(j => Row(M, 1356998400250L + 500L * j,
      (301 - j).toDouble, java.lang.Long.valueOf(301L - j), true, web(2)))
    val sub = SubQuery("sum", M,
      downsample = Some(DownsampleSpec.parse("1s-sum")))
    val out = runQ(t1 ++ t2, sub)
    assert(out.size == 151, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), i) =>
      assert(t == 1356998400000L + 1000L * i)
      val e =
        if (i == 0) 301.0
        else if (i < 50) 602.0
        else 701.0 + (i - 50) * 0.2 - i * 4
      assert(math.abs(v - e) <= 1e-7, s"dp $i @ $t: $v != $e")
    }
  }

  test("runMixedSingleTS: single mixed int/float series passes through avg") {
    // storeMixedTimeSeriesSeconds: 1.25..76 step .25, whole-even values
    // written as longs — single-series avg is the identity on values
    val rows = (1 to 300).map { k =>
      val v = 1.0 + k * 0.25
      if (v % 2 == 0) longPt((1356998400L + 30L * k) * 1000L, v.toLong)
      else Row(M, (1356998400L + 30L * k) * 1000L, v, null, false, web(1))
    }
    val out = runAgg(rows, "avg")
    assert(out.size == 300, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), k) =>
      assert(t == 1356998430000L + 30000L * k)
      assert(math.abs(v - (1.25 + 0.25 * k)) <= 0.001, s"dp $k: $v")
    }
  }

  private def rateCounterRun(values: Seq[Long], opts: RateOptions):
      Vector[(Long, Double)] = {
    val pts = values.zipWithIndex.map { case (v, i) =>
      longPt((1356998400L + 30L * (i + 1)) * 1000L, v)
    }
    runQ(pts, SubQuery("sum", M, rate = Some(opts)))
  }

  test("runRateCounterDefault: Long.MAX_VALUE rollover is exactly 1.0") {
    // MAX-55 → MAX-25 → 5 with counterMax = MAX: both deltas are
    // exactly 30 over 30 s ONLY in long arithmetic (double cancels at
    // 2^63 — reference RateSpan.calculateDelta + this golden)
    val out = rateCounterRun(
      Seq(Long.MaxValue - 55, Long.MaxValue - 25, 5L),
      RateOptions(counter = true))
    assert(out == Vector((1356998460000L, 1.0), (1356998490000L, 1.0)),
      out.toString)
  }

  test("runRateCounterDefaultNoOp: monotone counter never rolls") {
    val out = rateCounterRun(Seq(30L, 60L, 90L), RateOptions(counter = true))
    assert(out == Vector((1356998460000L, 1.0), (1356998490000L, 1.0)),
      out.toString)
  }

  test("runRateCounterMaxSet: rollover against a 100-cap counter") {
    val out = rateCounterRun(Seq(45L, 75L, 5L),
      RateOptions(counter = true, counterMax = 100L))
    assert(out == Vector((1356998460000L, 1.0), (1356998490000L, 1.0)),
      out.toString)
  }

  test("runRateCounterAnomally: rate above resetValue emits 0") {
    val out = rateCounterRun(Seq(45L, 75L, 25L),
      RateOptions(counter = true, counterMax = 10000L, resetValue = 35L))
    assert(out.size == 2 && out(0) == ((1356998460000L, 1.0)) &&
      out(1)._1 == 1356998490000L && math.abs(out(1)._2) <= 0.001,
      out.toString)
  }

  test("runRateCounterAnomallyDrop: dropResets removes the negative delta") {
    val out = rateCounterRun(Seq(45L, 75L, 25L, 55L),
      RateOptions(counter = true, counterMax = 10000L, resetValue = 35L,
        dropResets = true))
    assert(out == Vector((1356998460000L, 1.0), (1356998520000L, 1.0)),
      out.toString)
  }

  // =====================================================================
  // TestTsdbQueryRollup ports
  // (/root/reference/test/core/TestTsdbQueryRollup.java) — routing
  // (multiple-interval → rollup, otherwise raw), per-aggregation-id
  // series absence, and the sum/count pairing rule for avg.
  // =====================================================================

  import org.apache.spark.sql.types._
  private val rollupSchema = StructType(Seq(
    StructField("metric", StringType),
    StructField("ts", LongType, nullable = false),
    StructField("tags", MapType(StringType, StringType)),
    StructField("sum", DoubleType),
    StructField("count", LongType),
    StructField("min", DoubleType),
    StructField("max", DoubleType)))

  /** (tsSec, tags, sum?, count?, min?, max?) rows at 10m cadence. */
  private def rollupDf(rows: Seq[(Long, Map[String, String], Option[Double],
      Option[Long], Option[Double], Option[Double])]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.map { case (s, tg, su, c, mn, mx) =>
      Row(M, s * 1000L, tg, su.map(Double.box).orNull,
        c.map(Long.box).orNull, mn.map(Double.box).orNull,
        mx.map(Double.box).orNull)
    }.asJava, rollupSchema)
  }

  /** storeLongRollup(aggr): A sums 600,1200.. asc at 10m; B inverse.
    * Only the `col` aggregation-id series is populated. */
  private def longRollupRows(endSec: Long, which: String):
      Seq[(Long, Map[String, String], Option[Double], Option[Long],
           Option[Double], Option[Double])] = {
    val steps = (0 to ((endSec - 1356998400L) / 600L).toInt)
      .takeWhile(k => 1356998400L + 600L * k <= endSec)
    val n = steps.size
    def mk(v: Double, su: Boolean, cn: Boolean, mn: Boolean, mx: Boolean) =
      (if (su) Some(v) else None, if (cn) Some(v.toLong) else None,
       if (mn) Some(v) else None, if (mx) Some(v) else None)
    steps.flatMap { k =>
      val ts = 1356998400L + 600L * k
      val va = 600.0 * (k + 1)
      // loop 2 decrements i from loop 1's final 600n before storing:
      // B runs 600(n-1) down to 0
      val vb = 600.0 * (n - 1 - k)
      val (sa, ca, mna, mxa) = mk(va, which == "sum", which == "count",
        which == "min", which == "max")
      val (sb, cb, mnb, mxb) = mk(vb, which == "sum", which == "count",
        which == "min", which == "max")
      Seq((ts, web(1), sa, ca, mna, mxa), (ts, web(2), sb, cb, mnb, mxb))
    }
  }

  private def runRollup(rollRows: Seq[(Long, Map[String, String],
        Option[Double], Option[Long], Option[Double], Option[Double])],
      spec: String, agg: String, filter: Boolean = true,
      raw: Seq[Row] = longRows(false), rate: Boolean = false,
      endSec: Long = 1357041600L): Vector[(Long, Double)] = {
    import scala.jdk.CollectionConverters._
    val points = spark.createDataFrame(raw.asJava, Points.schema)
    val sub = SubQuery(agg, M,
      filters = if (filter) web01 else Seq.empty,
      downsample = Some(DownsampleSpec.parse(spec)),
      rate = if (rate) Some(RateOptions()) else None)
    Engine.run(points, TsQuery(1356998400000L, endSec * 1000L, Seq(sub)),
        sub, rollups = Seq(Engine.RollupTable(600000L, rollupDf(rollRows))))
      .orderBy("ts").collect().map { r =>
        (r.getAs[Long]("ts"), r.getAs[Any]("value") match {
          case n: Number => n.doubleValue()
        })
      }.toVector
  }

  test("run15mSumLongSingleTS: non-multiple interval falls back to RAW") {
    // 15m % 10m != 0 → the rollup cannot serve; values are the raw
    // 30s points re-bucketed (435, 1335, …, 300), not rollup sums
    val out = runRollup(longRollupRows(1357041600L, "sum"), "15m-sum", "sum")
    assert(out.size == 11, s"${out.size}")
    var v = 435.0
    var ts = 1356998400000L
    out.foreach { case (t, value) =>
      assert(t == ts); ts += 900000L
      assert(math.abs(value - v) <= 0.00001, s"at $t: $value != $v")
      v = if (v >= 8535.0) 300.0 else v + 900.0
    }
  }

  test("run30mSumLongSingleTS: coarser query re-aggregates the rollup") {
    val out = runRollup(longRollupRows(1357041599L, "sum"), "30m-sum", "sum")
    assert(out.size == 24, s"${out.size}")
    var v = 3600.0
    var ts = 1356998400000L
    out.foreach { case (t, value) =>
      assert(t == ts); ts += 1800000L
      assert(value == v, s"at $t: $value != $v")
      v += 5400.0
    }
  }

  test("run10mZimSumLongSingleTS: zimsum reads the sum rollup series") {
    val out = runRollup(longRollupRows(1357041599L, "sum"),
      "10m-zimsum", "zimsum")
    assert(out.size == 72, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), k) =>
      assert(t == 1356998400000L + 600000L * k)
      assert(v == 600.0 * (k + 1), s"dp $k: $v")
    }
  }

  test("run10mSumLongSingleTS: direct rollup serve, 73 buckets") {
    val out = runRollup(longRollupRows(1357041600L, "sum"), "10m-sum", "sum")
    assert(out.size == 73, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), k) =>
      assert(t == 1356998400000L + 600000L * k)
      assert(v == 600.0 * (k + 1), s"dp $k: $v")
    }
  }

  test("run10mMaxLongSingleTSNotFound: absent max series gives 0 dps, no raw fallback") {
    val out = runRollup(longRollupRows(1357041599L, "sum"), "10m-max", "max")
    assert(out.isEmpty, out.toString)
  }

  test("run10mMaxLongSingleTS / run10mMinLongSingleTS: stored series serve") {
    for (a <- Seq("max", "min")) {
      val out = runRollup(longRollupRows(1357041600L, a), s"10m-$a", a)
      assert(out.size == 73, s"$a: ${out.size}")
      out.zipWithIndex.foreach { case ((t, v), k) =>
        assert(t == 1356998400000L + 600000L * k)
        assert(v == 600.0 * (k + 1), s"$a dp $k: $v")
      }
    }
  }

  test("run10mSumLongSingleTSRate: rate over rollup sums is 1.0") {
    val out = runRollup(longRollupRows(1357041600L, "sum"), "10m-sum",
      "sum", rate = true)
    assert(out.size == 72, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), k) =>
      assert(t == 1356998400000L + 600000L * (k + 1))
      assert(math.abs(v - 1.0) <= 0.00001, s"dp $k: $v")
    }
  }

  test("run10mSumLongDoubleTS: unfiltered group over both rollup series") {
    val out = runRollup(longRollupRows(1357041600L, "sum"), "10m-sum",
      "sum", filter = false)
    assert(out.size == 73, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), k) =>
      assert(t == 1356998400000L + 600000L * k)
      assert(math.abs(v - 43800.0) <= 0.0001, s"dp $k: $v")
    }
  }

  test("run10mAvgLongSingleTS: avg = sum/count over paired series") {
    val rows = longRollupRows(1357041600L, "sum").map {
      case (ts, tg, su, _, _, _) => (ts, tg, su, Some(2L),
        Option.empty[Double], Option.empty[Double])
    }
    val out = runRollup(rows, "10m-avg", "avg")
    assert(out.size == 73, s"${out.size}")
    out.zipWithIndex.foreach { case ((t, v), k) =>
      assert(t == 1356998400000L + 600000L * k)
      assert(math.abs(v - (300.0 + 300.0 * k)) <= 0.0001, s"dp $k: $v")
    }
  }

  test("run10mAvgLongSingleTSMissingCount/MissingSum: unpaired → 0 dps") {
    // counts never written → avg has nothing to pair with (and the
    // engine must NOT fall back to raw despite raw points existing)
    assert(runRollup(longRollupRows(1357041600L, "sum"),
      "10m-avg", "avg").isEmpty)
    assert(runRollup(longRollupRows(1357041600L, "count"),
      "10m-avg", "avg").isEmpty)
  }

  private def avgPoints(rows: (Long, Option[Double], Option[Long])*) =
    rows.map { case (ts, su, c) =>
      (ts, web(1), su, c, Option.empty[Double], Option.empty[Double])
    }

  test("run10mAvgLongSingleTSMissingACount/ASum: unpaired rows dropped") {
    val aCount = avgPoints(
      (1356998400L, Some(20.0), Some(2L)), (1356999000L, Some(40.0), None),
      (1356999600L, Some(60.0), Some(3L)), (1357000200L, Some(80.0), Some(4L)))
    assert(runRollup(aCount, "10m-avg", "avg") == Vector(
      (1356998400000L, 10.0), (1356999600000L, 20.0),
      (1357000200000L, 20.0)))
    val aSum = avgPoints(
      (1356998400L, Some(20.0), Some(2L)), (1356999000L, None, Some(5L)),
      (1356999600L, Some(60.0), Some(3L)), (1357000200L, Some(80.0), Some(4L)))
    assert(runRollup(aSum, "10m-avg", "avg") == Vector(
      (1356998400000L, 10.0), (1356999600000L, 20.0),
      (1357000200000L, 20.0)))
  }

  test("run10mAvgLongSingleTSMissingToZero: nothing pairs → 0 dps") {
    val rows = avgPoints(
      (1356998400L, Some(20.0), None), (1356999000L, None, Some(5L)),
      (1356999600L, Some(60.0), None), (1357000200L, None, Some(4L)))
    assert(runRollup(rows, "10m-avg", "avg").isEmpty)
  }

  test("run10mAvgLongSingleTSMissingToZeroOneSpan: pairs survive across spans") {
    val rows = avgPoints(
      (1356998400L, Some(20.0), Some(2L)), (1356999000L, Some(40.0), Some(5L)),
      (1357084800L, Some(60.0), None), (1357085400L, None, Some(4L)),
      (1357171200L, Some(90.0), Some(3L)), (1357171800L, Some(100.0), Some(5L)))
    assert(runRollup(rows, "10m-avg", "avg", endSec = 1359590400L) == Vector(
      (1356998400000L, 10.0), (1356999000000L, 8.0),
      (1357171200000L, 30.0), (1357171800000L, 20.0)))
  }

  test("run10mAvgLongSingleTSMissingToZeroBookends: only the middle span pairs") {
    val rows = avgPoints(
      (1356998400L, Some(20.0), None), (1356999000L, None, Some(5L)),
      (1357084800L, Some(60.0), Some(3L)), (1357085400L, Some(80.0), Some(4L)),
      (1357171200L, None, Some(3L)), (1357171800L, Some(100.0), None))
    assert(runRollup(rows, "10m-avg", "avg", endSec = 1359590400L) == Vector(
      (1357084800000L, 20.0), (1357085400000L, 20.0)))
  }

  // =====================================================================
  // TestTsdbQueryHistogramQueries ports
  // (/root/reference/test/core/TestTsdbQueryHistogramQueries.java) —
  // the percentile query path over stored histogram dps. The reference
  // test decoder's percentile(p) == value * p; a single [0, value]
  // bucket through the interpolated-CDF walk reproduces it exactly.
  // =====================================================================

  /** storeTestHistogramTimeSeriesMs: A(web01) 1..300 and B(web02)
    * 300..1 at 500 ms cadence, single-[0,v]-bucket blobs. */
  private def histRows(): DataFrame = {
    import scala.jdk.CollectionConverters._
    import graft.operators.Histograms
    val schema = StructType(Seq(
      StructField("metric", StringType),
      StructField("ts", LongType, nullable = false),
      StructField("tags", MapType(StringType, StringType)),
      StructField("codec_id", IntegerType),
      StructField("blob", BinaryType)))
    def blob(v: Double) = Histograms.simpleHistogramEncode(
      Seq(Histograms.Bucket(0.0, v, 1L)))
    val rows = (1 to 300).flatMap { i =>
      Seq(Row("msg.end2end.latency", 1356998400000L + 500L * i,
            Map("host" -> "web01"), 0, blob(i.toDouble)),
          Row("msg.end2end.latency", 1356998400000L + 500L * i,
            Map("host" -> "web02"), 0, blob(301.0 - i)))
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  private def runHist(filters: Seq[TagFilter],
                      ps: Seq[Double]): Vector[Row] = {
    val sub = SubQuery("sum", "msg.end2end.latency", filters = filters,
      percentiles = ps)
    Engine.runPercentilesFromHistograms(histRows(),
        TsQuery(1356998400000L, 1357041600000L, Seq(sub)), sub)
      .orderBy("ptile", "ts").collect().toVector
  }

  test("runSingleTsMsSinglePercentile: per-dp p98 of one series") {
    val out = runHist(Seq(LiteralOr("host", Seq("web01"))), Seq(98.0))
    assert(out.size == 300, s"${out.size}")
    out.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Long]("ts") == 1356998400500L + 500L * k)
      assert(math.abs(r.getAs[Double]("value") - (k + 1) * 0.98) <= 0.0001,
        s"dp $k: ${r.getAs[Double]("value")}")
    }
  }

  test("runSingleTsMsDoulePercentile: two percentiles, two result sets") {
    val out = runHist(Seq(LiteralOr("host", Seq("web01"))),
      Seq(98.0, 95.0))
    assert(out.size == 600, s"${out.size}")
    val (p95, p98) = out.partition(_.getAs[Double]("ptile") == 95.0)
    p98.zipWithIndex.foreach { case (r, k) =>
      assert(math.abs(r.getAs[Double]("value") - (k + 1) * 0.98) <= 0.0001) }
    p95.zipWithIndex.foreach { case (r, k) =>
      assert(math.abs(r.getAs[Double]("value") - (k + 1) * 0.95) <= 0.0001) }
  }

  test("runSingleTsMsTwoAggSum: percentiles extract PER SERIES then sum") {
    // the golden that pins the order of operations: sum of the two
    // series' p98s = 301*0.98 at every timestamp (merging histograms
    // first would give the p98 of the combined distribution instead)
    val out = runHist(Seq.empty, Seq(98.0))
    assert(out.size == 300, s"${out.size}")
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("value") - 301.0 * 0.98) <= 0.0001,
        s"${r.getAs[Long]("ts")}: ${r.getAs[Double]("value")}")
    }
  }

  test("runLongTwoGroup: {host=*} sugar groups per tag value") {
    val sub = SubQuery("sum", M, filters = Seq(GroupByAll("host")))
    val out = Engine.run(
      { import scala.jdk.CollectionConverters._
        spark.createDataFrame(longRows(false).asJava, Points.schema) },
      TsQuery(1356998400000L, 1357041600000L, Seq(sub)), sub)
      .orderBy("tag_host", "ts").collect()
    assert(out.length == 600)
    val (a, b) = out.partition(_.getAs[String]("tag_host") == "web01")
    a.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Long]("ts") == 1356998430000L + 30000L * k)
      assert(r.getAs[Double]("value") == (k + 1).toDouble) }
    b.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Long]("ts") == 1356998430000L + 30000L * k)
      assert(r.getAs[Double]("value") == (300 - k).toDouble) }
  }

  test("runEndTime: exact clip by default, storage-row clip behind the flag") {
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(longRows(false).asJava, Points.schema)
    val sub = SubQuery("sum", M, filters = web01)
    val q = TsQuery(1356998400000L, 1357001900000L, Seq(sub))
    // default: last point <= 1357001900000 is value 116 at ...1880000
    val exact = Engine.run(pts, q, sub).orderBy("ts").collect()
    assert(exact.length == 116, s"${exact.length}")
    assert(exact.last.getAs[Long]("ts") == 1357001880000L)
    // reference golden (runEndTime): SpanGroup clips by the SCAN
    // bounds, so the result runs to the enclosing hour — 119 dps
    val row = Engine.run(pts, q, sub, rowClip = true)
      .orderBy("ts").collect()
    assert(row.length == 119, s"${row.length}")
    row.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Long]("ts") == 1356998430000L + 30000L * k)
      assert(r.getAs[Double]("value") == (k + 1).toDouble)
    }
  }

  test("runTSUIDQuery / runTSUIDsAggSum: explicit series addressing") {
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(longRows(false).asJava, Points.schema)
    val ids = Points.withSeriesId(pts)
      .select(col("tags").getItem("host").as("h"),
        hex(col("series_id")).as("id"))
      .distinct().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // one tsuid → that series' raw values
    val one = SubQuery("sum", M, tsuids = Seq(ids("web01")))
    val o1 = Engine.run(pts,
      TsQuery(1356998400000L, 1357041600000L, Seq(one)), one)
      .orderBy("ts").collect()
    assert(o1.length == 300)
    o1.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Double]("value") == (k + 1).toDouble) }
    // both tsuids → aggregated 301 everywhere
    val two = SubQuery("sum", M, tsuids = Seq(ids("web01"), ids("web02")))
    val o2 = Engine.run(pts,
      TsQuery(1356998400000L, 1357041600000L, Seq(two)), two)
      .orderBy("ts").collect()
    assert(o2.length == 300)
    o2.foreach(r => assert(r.getAs[Double]("value") == 301.0))
  }

  test("runRegexp / runRegexpNoMatch: regexp tag filter end-to-end") {
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(longRows(false).asJava, Points.schema)
    val hit = SubQuery("sum", M,
      filters = Seq(RegexpFilter("host", "web01", groupBy = true)))
    val o = Engine.run(pts,
      TsQuery(1356998400000L, 1357041600000L, Seq(hit)), hit)
      .orderBy("ts").collect()
    assert(o.length == 300)
    o.zipWithIndex.foreach { case (r, k) =>
      assert(r.getAs[Double]("value") == (k + 1).toDouble) }
    val miss = SubQuery("sum", M,
      filters = Seq(RegexpFilter("host", "dbsvr.*", groupBy = true)))
    assert(Engine.run(pts,
      TsQuery(1356998400000L, 1357041600000L, Seq(miss)), miss)
      .collect().isEmpty)
  }

  test("runSingleTsMsAggSumTwoGroups: group-by host keeps series apart") {
    val out = runHist(Seq(GroupByAll("host")), Seq(98.0))
    assert(out.size == 600, s"${out.size}")
    val byHost = out.groupBy(_.getAs[String]("tag_host"))
    byHost("web01").sortBy(_.getAs[Long]("ts")).zipWithIndex.foreach {
      case (r, k) =>
        assert(math.abs(r.getAs[Double]("value") - (k + 1) * 0.98) <= 0.0001)
    }
    byHost("web02").sortBy(_.getAs[Long]("ts")).zipWithIndex.foreach {
      case (r, k) =>
        assert(math.abs(r.getAs[Double]("value") - (300 - k) * 0.98) <= 0.0001)
    }
  }

  // ---- TestHistogramDownsampler ports ---------------------------------
  // (/root/reference/test/core/TestHistogramDownsampler.java — each
  // LongHistogramDataPointForTest(0, v) models as a one-bucket
  // SimpleHistogram blob with count v; the downsampled "raw data" the
  // reference asserts is then the merged bucket count per interval)

  private val HB = 1356998400000L // the suite's BASE_TIME

  private def histBlobs(dps: Seq[(Long, Long)]): org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    import graft.operators.Histograms
    val schema = StructType(Seq(
      StructField("metric", StringType), StructField("ts", LongType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("codec_id", IntegerType), StructField("blob", BinaryType)))
    spark.createDataFrame(dps.map { case (t, c) =>
      Row("hm", t, Map("host" -> "a"),
        Int.box(Histograms.SIMPLE_CODEC_ID),
        Histograms.simpleHistogramEncode(
          Seq(Histograms.Bucket(0.0, 1.0, c))))
    }.asJava, schema)
  }

  private def mergedCounts(dps: Seq[(Long, Long)], spec: String,
                           startMs: Long, endMs: Long,
                           tz: String = "UTC"): Map[Long, Long] = {
    val sub = SubQuery("sum", "hm",
      downsample = Some(DownsampleSpec.parse(spec)))
    Engine.histogramBuckets(histBlobs(dps),
        TsQuery(startMs, endMs, Seq.empty, timezone = tz), sub)
      .groupBy(col("ts"))
      .agg(org.apache.spark.sql.functions.sum(col("count")).as("c"))
      .collect().map(r => r.getAs[Long]("ts") -> r.getAs[Long]("c")).toMap
  }

  private val FAR = 4102444800000L

  test("histDownsampler: 1000s-sum merges within the interval floor") {
    val dps = Seq(HB -> 40L, (HB + 2000000L) -> 50L,
      (HB + 3600000L) -> 40L, (HB + 3605000L) -> 50L,
      (HB + 7200000L) -> 40L, (HB + 9200000L) -> 50L)
    assert(mergedCounts(dps, "1000s-sum", 0L, FAR) == Map(
      (HB - 400000L) -> 40L, (HB + 1600000L) -> 50L,
      (HB + 3600000L) -> 90L, (HB + 6600000L) -> 40L,
      (HB + 8600000L) -> 50L))
  }

  private def pow2Dps(stepMs: Long, n: Int, t0: Long = 0L): Seq[(Long, Long)] =
    (0 until n).map(k => (HB + t0 + stepMs * k) -> (1L << k))

  test("histDownsampler: 10s and 15s bucket sums") {
    assert(mergedCounts(pow2Dps(5000L, 11), "10s-sum", 0L, FAR) == Map(
      (HB + 0L) -> 3L, (HB + 10000L) -> 12L, (HB + 20000L) -> 48L,
      (HB + 30000L) -> 192L, (HB + 40000L) -> 768L, (HB + 50000L) -> 1024L))
    assert(mergedCounts(pow2Dps(10000L, 6, t0 = 5000L), "15s-sum", 0L, FAR)
      == Map((HB + 0L) -> 1L, (HB + 15000L) -> 6L,
        (HB + 30000L) -> 8L, (HB + 45000L) -> 48L))
  }

  test("histDownsampler: run_all merges [start, end) at the query start") {
    val dps = pow2Dps(10000L, 6, t0 = 5000L) // 1,2,4,8,16,32 at 5s..55s
    // full range: one dp at ts 0 summing everything
    assert(mergedCounts(dps, "0all-sum", 0L, FAR) == Map(0L -> 63L))
    // clipped: [15s, 45s) keeps 2+4+8, stamped at the start bound —
    // the dp exactly at the end bound is EXCLUDED
    assert(mergedCounts(dps, "0all-sum", HB + 15000L, HB + 45000L)
      == Map((HB + 15000L) -> 14L))
    // fully out of range on either side: no output
    assert(mergedCounts(dps, "0all-sum", HB + 65000L, HB + 75000L).isEmpty)
    assert(mergedCounts(dps, "0all-sum", HB - 15000L, HB - 5000L).isEmpty)
  }

  test("histDownsampler: calendar hours in offset zones (1hc, 4hc)") {
    val dps = Seq(HB -> 1L, (HB + 1800000L) -> 2L, (HB + 3599000L) -> 3L,
      (HB + 3600000L) -> 4L, (HB + 5400000L) -> 5L, (HB + 7199000L) -> 6L)
    // +12h no-DST zone: hour boundaries stay UTC-hour aligned
    assert(mergedCounts(dps, "1hc-sum", 0L, FAR, tz = "Pacific/Funafuti")
      == Map(HB -> 6L, (HB + 3600000L) -> 15L))
    // +4:30 zone: hour buckets sit on the half hour
    assert(mergedCounts(dps, "1hc-sum", 0L, FAR, tz = "Asia/Kabul")
      == Map((HB - 1800000L) -> 1L, (HB + 1800000L) -> 9L,
        (HB + 5400000L) -> 11L))
    // 4hc: one half-hour-offset bucket holds everything
    assert(mergedCounts(dps, "4hc-sum", 0L, FAR, tz = "Asia/Kabul")
      == Map((HB - 1800000L) -> 21L))
  }

  // ---- TestQueryStats ports (/root/reference/test/stats/
  // TestQueryStats.java) — the /api/stats/query registry contract ----

  private def fixedClocks(stepNs: Long = 1000000000L): (() => Long, () => Long) = {
    var n = 0L
    (() => { n += stepNs; n }, () => 1388534400000L)
  }

  test("QueryStats ctor/registry: running set, duplicate policy, " +
       "null guards (TestQueryStats ctor* vectors)") {
    import graft.query.QueryStatsLog
    QueryStatsLog.reset()
    val (nano, ms) = fixedClocks()
    val q = """{"start":"1h-ago"}"""
    val stats = new QueryStatsLog.QueryStats("192.168.1.1:4242", q,
      Map("Host" -> "localhost"), nanoClock = nano, msClock = ms)
    assert(QueryStatsLog.numRunning == 1)
    val doc = QueryStatsLog.getRunningAndCompleteStats(nano())
    assert(doc.contains(""""completed":[]""") &&
      doc.contains(""""remote":"192.168.1.1:4242"""") &&
      doc.contains(""""queryStart":1388534400000""") &&
      doc.contains(""""headers":{"Host":"localhost"}"""), doc)
    // ctorDuplicate: duplicates allowed by default — still ONE running
    // entry (putIfAbsent keeps the first), no throw
    new QueryStatsLog.QueryStats("192.168.1.1:4242", q,
      nanoClock = nano, msClock = ms)
    assert(QueryStatsLog.numRunning == 1)
    // with duplicates disabled the second registration throws
    QueryStatsLog.setEnableDuplicates(false)
    assert(intercept[IllegalStateException](
        new QueryStatsLog.QueryStats("192.168.1.1:4242", q,
          nanoClock = nano, msClock = ms)).getMessage ==
      "Query is already executing for endpoint: 192.168.1.1:4242")
    QueryStatsLog.setEnableDuplicates(true)
    // ctorNullRemote / ctorNullQuery
    assert(intercept[IllegalArgumentException](
        new QueryStatsLog.QueryStats("", q)).getMessage ==
      "Remote address was null or empty")
    assert(intercept[IllegalArgumentException](
        new QueryStatsLog.QueryStats("1.2.3.4:80", null)).getMessage ==
      "Query object was null")
    QueryStatsLog.reset()
  }

  test("QueryStats completion: ring membership, executed counter, " +
       "response code, exception text (markComplete/executed* vectors)") {
    import graft.query.QueryStatsLog
    QueryStatsLog.reset()
    val q = """{"start":"1h-ago"}"""
    def run(code: Int, reason: String, ex: Throwable = null): Unit = {
      val (nano, ms) = fixedClocks()
      new QueryStatsLog.QueryStats("192.168.1.1:4242", q,
        nanoClock = nano, msClock = ms).markSerialized(code, reason, ex)
    }
    // markComplete: running -> completed with the 200 code
    run(200, "OK")
    assert(QueryStatsLog.numRunning == 0)
    var doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(doc.contains(""""running":[]""") &&
      doc.contains(""""code":200""") &&
      doc.contains(""""executed":1"""), doc)
    // markCompleteTimeout: the 408 + exception message with its first
    // stack frame on the next line (getException:718-726)
    run(408, "Request Timeout", new RuntimeException("Timeout!"))
    doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(doc.contains(""""code":408"""))
    assert(doc.contains(""""exception":"Timeout!\n"""), doc)
    // executedTwice: same (remote, query, code) increments `executed`
    // instead of adding a ring row
    run(408, "Request Timeout")
    doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(doc.contains(""""executed":2"""), doc)
    // a DIFFERENT code is a different ring identity
    run(500, "Internal Server Error")
    doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(doc.contains(""""code":500"""))
    QueryStatsLog.reset()
  }

  test("QueryStats stats: getStat/getTimeStat vectors, sub-query " +
       "rollup with the reference's mis-wired AGG_MAP slots") {
    import graft.query.QueryStatsLog
    QueryStatsLog.reset()
    val (nano, ms) = fixedClocks() // 1s per nano-clock read
    val stats = new QueryStatsLog.QueryStats("10.0.0.1:4242",
      """{"start":"1h-ago"}""", nanoClock = nano, msClock = ms)
    stats.addStat("emittedDPs", 42L)
    // getStatTime's NaN-before-completion + the non-time guard
    assert(stats.getTimeStat("avgAggregationTime").isNaN)
    assert(intercept[IllegalArgumentException](
        stats.getTimeStat("emittedDPs")).getMessage ==
      "The stat is not a time stat")
    // sub-query time stats (nanos): two sub queries with queryScanTime
    // 2s and 4s -> rollup writes avg (3s) and max (4s) — into the
    // SWAPPED slots the reference wires (QueryStats.java:222-223):
    // avg lands in maxQueryScanTime, max in avgQueryScanTime
    stats.addStat(0, "queryScanTime", 2000000000L)
    stats.addStat(1, "queryScanTime", 4000000000L)
    // counters roll up by SUM into overall
    stats.addStat(0, "rowsFromStorage", 10L)
    stats.addStat(1, "rowsFromStorage", 5L)
    // updateStat accumulates within one sub query
    stats.updateStat(0, "dpsPostFilter", 3L)
    stats.updateStat(0, "dpsPostFilter", 4L)
    stats.markSerializationSuccessful()
    assert(stats.getStat("emittedDPs") == 42L)
    assert(stats.getStat("bytesFromStorage") == -1L)       // getStat miss
    // ctor read the clock twice (start ns, then register logging is
    // clock-free) and markSerialized read it once more: the mocked
    // step is 1s per read, so processingPreWriteTime == 1000.0 ms
    // (the TestQueryStats.getStatTime vector)
    assert(stats.getTimeStat("processingPreWriteTime") == 1000.0)
    assert(stats.getTimeStat("maxQueryScanTime") == 3000.0)  // the AVG
    assert(stats.getTimeStat("avgQueryScanTime") == 4000.0)  // the MAX
    assert(stats.getStat("rowsFromStorage") == 15L)
    assert(stats.getStat("dpsPostFilter") == 7L)
    // the serialized ring row carries the nested queryIdx_NN maps with
    // time stats as floating ms
    val doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(doc.contains(""""queryIdx_00":{"""), doc)
    assert(doc.contains(""""queryScanTime":2000.0"""), doc)
    assert(doc.contains(""""sentToClient":false"""))
    QueryStatsLog.reset()
  }

  // ---- TestHistogram ports (/root/reference/test/stats/
  // TestHistogram.java) — the latency self-metric histogram ----

  test("LatencyHistogram: bucket placement vectors (TestHistogram " +
       "16/1/5, 16/2/5, 160/20/50) and percentile walk") {
    import graft.meta.LatencyHistogram
    def assertBuckets(h: LatencyHistogram, pairs: (Int, Int)*): Unit =
      pairs.foreach { case (b, n) =>
        assert(h.valueInBucket(b) == n, s"bucket $b") }
    // percentile_empty_histogram
    val empty = new LatencyHistogram(16000, 2, 100)
    assert(empty.percentile(1) == 0 && empty.percentile(50) == 0 &&
      empty.percentile(99) == 0)
    // 16Max_1Interval_5Cutoff
    val h1 = new LatencyHistogram(16, 1, 5)
    assert(h1.buckets == 10)
    Seq(4, 5, 5, 0, 42, 6, 9, 10).foreach(h1.add)
    assertBuckets(h1, 0 -> 1, 1 -> 0, 2 -> 0, 3 -> 0, 4 -> 1, 5 -> 3,
      6 -> 0, 7 -> 2, 8 -> 0, 9 -> 1)
    // 16Max_2Interval_5Cutoff (effective cutoff snaps down to 4)
    val h2 = new LatencyHistogram(16, 2, 5)
    assert(h2.buckets == 6)
    Seq(4, 6, 7, 0, 42, 8, 9, 10, 11, 12).foreach(h2.add)
    assertBuckets(h2, 0 -> 1, 1 -> 0, 2 -> 3, 3 -> 4, 4 -> 1, 5 -> 1)
    // 160Max_20Interval_50Cutoff
    val h3 = new LatencyHistogram(160, 20, 50)
    assert(h3.buckets == 6)
    Seq(0, 40, 50, 60, 71, 72, 103, 104, 130, 160, 167, 168, 420)
      .foreach(h3.add)
    assertBuckets(h3, 0 -> 1, 1 -> 0, 2 -> 4, 3 -> 2, 4 -> 4, 5 -> 2)
    // ctor guards, negative add, percentile range — the exact texts
    assert(intercept[IllegalArgumentException](
      new LatencyHistogram(10, 11, 5)).getMessage ==
      "interval > max! interval=11, max=10")
    assert(intercept[IllegalArgumentException](
      new LatencyHistogram(10, 2, 11)).getMessage ==
      "cutoff > max! cutoff=11, max=10")
    assert(intercept[IllegalArgumentException](
      h1.add(-1)).getMessage == "negative value: -1")
    intercept[IllegalArgumentException](h1.percentile(0))
    intercept[IllegalArgumentException](h1.percentile(101))
    // percentile returns the bucket's EXCLUSIVE high bound; the
    // overflow bucket reports Int.MaxValue (the reference behavior)
    val hp = new LatencyHistogram(16, 1, 5)
    (1 to 99).foreach(_ => hp.add(2))
    hp.add(42) // one overflow sample
    assert(hp.percentile(50) == 3)  // bucket [2,3) -> high bound 3
    assert(hp.percentile(100) == Int.MaxValue)
    // /api/stats reports name_50pct.._95pct rows over the registry
    graft.meta.Introspect.resetStats()
    (1 to 100).foreach(i => graft.meta.Introspect.recordLatency(
      "http.latency", i % 10))
    val rows = graft.meta.Introspect.statsLatency(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("http.latency_50pct", "http.latency_75pct",
      "http.latency_90pct", "http.latency_95pct"))
    assert(rows("http.latency_50pct") == 6L) // values 0..9 x10, 2ms buckets
    graft.meta.Introspect.resetStats()
  }

  test("Engine.serveTracked: success/failure paths feed the query ring " +
       "(QueryRpc.handleQuery's QueryStats flow)") {
    import graft.query.QueryStatsLog
    QueryStatsLog.reset()
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(Seq(
      Row("cpu", HB, 1.0, java.lang.Long.valueOf(1L), true,
        Map("host" -> "a")),
      Row("cpu", HB + 60000L, 2.0, java.lang.Long.valueOf(2L), true,
        Map("host" -> "a"))).asJava, Points.schema)
    val q = TsQuery(HB - 1000L, HB + 3600000L,
      Seq(QueryParser.parseSubQuery("sum:cpu")))
    val ok = Engine.serveTracked("1.2.3.4:4242", "m=sum:cpu")(
      Engine.run(pts, q, q.queries.head))
    // ONE-EXECUTION PROOF: serveTracked itself runs no job — the query
    // is still RUNNING (the old pre-count() would have completed it
    // here), and the returned plan carries the CollectMetrics node
    // that makes the caller's own action do the counting.
    assert(QueryStatsLog.numRunning == 1,
      "serveTracked must not execute the plan itself")
    assert(ok.queryExecution.analyzed.collect {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
          if c.name.startsWith("graft_serve_") => c
    }.nonEmpty, "tracking must ride the caller's action via observe")
    assert(ok.count() == 2)
    assert(Engine.awaitTrackedServes(), "tracked serve never recorded")
    var doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(QueryStatsLog.numRunning == 0)
    assert(doc.contains(""""code":200""") &&
      doc.contains(""""emittedDPs":2""") &&
      doc.contains(""""sentToClient":true"""), doc)
    // failure: the 400 mapping records the exception and re-throws
    intercept[IllegalArgumentException] {
      Engine.serveTracked("1.2.3.4:4242", "m=bogus:cpu")(
        Engine.runM(pts, q, "bogus:cpu"))
    }
    doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(doc.contains(""""code":400""") &&
      doc.contains(""""sentToClient":false"""), doc)
    // the same (remote, query, code) re-executed bumps the ring counter
    Engine.serveTracked("1.2.3.4:4242", "m=sum:cpu")(
      Engine.run(pts, q, q.queries.head)).count()
    assert(Engine.awaitTrackedServes(), "tracked serve never recorded")
    doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(doc.contains(""""executed":2"""), doc)
    QueryStatsLog.reset()
  }

  test("Engine.runJson under trackServes: one QueryStats per body, " +
       "per-sub-query emittedDPs roll up, parse errors record 400 " +
       "(QueryRpc.handleQuery registers before parsing)") {
    import graft.query.QueryStatsLog
    QueryStatsLog.reset()
    Engine.clearPendingServes()
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(Seq(
      Row("cpu", HB, 1.0, java.lang.Long.valueOf(1L), true,
        Map("host" -> "a")),
      Row("cpu", HB + 60000L, 2.0, java.lang.Long.valueOf(2L), true,
        Map("host" -> "a")),
      Row("mem", HB, 5.0, java.lang.Long.valueOf(5L), true,
        Map("host" -> "a"))).asJava, Points.schema)
    val body =
      s"""{"start":${HB - 1000L},"end":${HB + 3600000L},"queries":[
         |{"aggregator":"sum","metric":"cpu"},
         |{"aggregator":"sum","metric":"mem"}]}""".stripMargin
    Engine.trackServes = true
    try {
      val dfs = Engine.runJson(pts, body, remote = "5.6.7.8:4242")
      assert(dfs.size == 2)
      // still running until the LAST frame is consumed
      assert(QueryStatsLog.numRunning == 1)
      assert(dfs.head.count() == 2)
      Thread.sleep(50)
      assert(QueryStatsLog.numRunning == 1,
        "must stay running until every sub-query frame is served")
      assert(dfs(1).count() == 1)
      assert(Engine.awaitTrackedServes(), "tracked serve never recorded")
      assert(QueryStatsLog.numRunning == 0)
      val doc = QueryStatsLog.getRunningAndCompleteStats(0L)
      // counters sum into overall through aggSubQueryStats
      assert(doc.contains(""""emittedDPs":3"""), doc)
      assert(doc.contains("queryIdx_00") && doc.contains("queryIdx_01"),
        doc)
      assert(doc.contains(""""remote":"5.6.7.8:4242""""), doc)
      // parse error: registered before parsing, recorded as 400
      intercept[IllegalArgumentException] {
        Engine.runJson(pts, """{"start":1}""", remote = "5.6.7.8:4242")
      }
      val doc2 = QueryStatsLog.getRunningAndCompleteStats(0L)
      assert(doc2.contains(""""code":400"""), doc2)
    } finally {
      Engine.trackServes = false
      Engine.clearPendingServes()
      QueryStatsLog.reset()
    }
  }

  test("Engine.serveTracked: partial actions (show/limit/isEmpty) must " +
       "NOT complete the serve — prefix counts are under-counts; a full " +
       "materialization still completes it afterwards") {
    import graft.query.QueryStatsLog
    QueryStatsLog.reset()
    Engine.clearPendingServes()
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(Seq(
      Row("cpu", HB, 1.0, java.lang.Long.valueOf(1L), true,
        Map("host" -> "a")),
      Row("cpu", HB + 60000L, 2.0, java.lang.Long.valueOf(2L), true,
        Map("host" -> "a")),
      Row("cpu", HB + 120000L, 3.0, java.lang.Long.valueOf(3L), true,
        Map("host" -> "a"))).asJava, Points.schema)
    val q = TsQuery(HB - 1000L, HB + 3600000L,
      Seq(QueryParser.parseSubQuery("sum:cpu")))
    val ok = Engine.serveTracked("1.2.3.4:4242", "m=sum:cpu")(
      Engine.run(pts, q, q.queries.head))
    // each of these pushes only a prefix through the observe node
    assert(ok.limit(1).collect().length == 1)
    assert(!ok.isEmpty)
    ok.show(1)
    // the listener bus is async — give it time to (wrongly) fire
    Thread.sleep(200)
    assert(QueryStatsLog.numRunning == 1,
      "a row-limited action must not complete the serve")
    // the full materialization completes it with the EXACT count
    assert(ok.count() == 3)
    assert(Engine.awaitTrackedServes(), "tracked serve never recorded")
    val doc = QueryStatsLog.getRunningAndCompleteStats(0L)
    assert(QueryStatsLog.numRunning == 0)
    assert(doc.contains(""""code":200""") &&
      doc.contains(""""emittedDPs":3"""), doc)
    QueryStatsLog.reset()
  }

  test("tracked serves feed the /api/stats latency histogram " +
       "(HttpQuery.done → httplatency.add(processing_time)): success " +
       "AND failure paths record http.latency") {
    import graft.query.QueryStatsLog
    import graft.meta.Introspect
    QueryStatsLog.reset()
    Engine.clearPendingServes()
    Introspect.resetStats()
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(Seq(
      Row("cpu", HB, 1.0, java.lang.Long.valueOf(1L), true,
        Map("host" -> "a"))).asJava, Points.schema)
    val q = TsQuery(HB - 1000L, HB + 3600000L,
      Seq(QueryParser.parseSubQuery("sum:cpu")))
    try {
      assert(Introspect.statsLatency(spark).count() == 0)
      Engine.serveTracked("1.2.3.4:4242", "m=sum:cpu")(
        Engine.run(pts, q, q.queries.head)).count()
      assert(Engine.awaitTrackedServes())
      val rows = Introspect.statsLatency(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.keySet == Set("http.latency_50pct", "http.latency_75pct",
        "http.latency_90pct", "http.latency_95pct"), rows.toString)
      // the 400 path records too (the reference's done() runs on every
      // response, error replies included)
      intercept[IllegalArgumentException] {
        Engine.serveTracked("1.2.3.4:4242", "m=bogus:cpu")(
          Engine.runM(pts, q, "bogus:cpu"))
      }
      // two samples now: the served query + the failed parse — the
      // 95th-pct bound can only move up or stay
      val rows2 = Introspect.statsLatency(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows2("http.latency_95pct") >= rows("http.latency_95pct"))
    } finally {
      Engine.clearPendingServes()
      QueryStatsLog.reset()
      Introspect.resetStats()
    }
  }

  test("Engine.reapExpiredServes: an abandoned tracked frame is evicted " +
       "after serveTtlMs as a failed send (no unbounded pendingServes " +
       "growth in a long-lived daemon)") {
    import graft.query.QueryStatsLog
    QueryStatsLog.reset()
    Engine.clearPendingServes()
    import scala.jdk.CollectionConverters._
    val pts = spark.createDataFrame(Seq(
      Row("cpu", HB, 1.0, java.lang.Long.valueOf(1L), true,
        Map("host" -> "a"))).asJava, Points.schema)
    val q = TsQuery(HB - 1000L, HB + 3600000L,
      Seq(QueryParser.parseSubQuery("sum:cpu")))
    val oldTtl = Engine.serveTtlMs
    try {
      Engine.serveTtlMs = 0L
      Engine.serveTracked("1.2.3.4:4242", "m=sum:cpu")(
        Engine.run(pts, q, q.queries.head)) // frame never consumed
      assert(QueryStatsLog.numRunning == 1)
      Thread.sleep(5)
      assert(Engine.reapExpiredServes() == 1)
      assert(Engine.awaitTrackedServes(), "reap must drain pendingServes")
      assert(QueryStatsLog.numRunning == 0)
      val doc = QueryStatsLog.getRunningAndCompleteStats(0L)
      assert(doc.contains(""""code":500""") &&
        doc.contains(""""sentToClient":false"""), doc)
      // a fresh serve after the reap still works end-to-end
      Engine.serveTtlMs = oldTtl
      val ok = Engine.serveTracked("1.2.3.4:4242", "m=sum:cpu")(
        Engine.run(pts, q, q.queries.head))
      assert(ok.count() == 1)
      assert(Engine.awaitTrackedServes())
    } finally {
      Engine.serveTtlMs = oldTtl
      Engine.clearPendingServes()
      QueryStatsLog.reset()
    }
  }
}
