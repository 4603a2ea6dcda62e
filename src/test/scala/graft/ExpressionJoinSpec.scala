package graft

import graft.model.Points
import graft.operators.ExpressionJoin
import graft.operators.ExpressionJoin.VarSet
import graft.query._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Ports of the reference's expression-layer iterator suites — the
 * UNION / INTERSECTION series-matching vectors of
 * /root/reference/test/query/expression/TestUnionIterator.java and
 * TestIntersectionIterator.java over the BaseTimeSyncedIteratorTest
 * fixtures (BaseTimeSyncedIteratorTest.java:147-649). Each fixture
 * feeds raw points through the real pipeline (Engine.runForExpression:
 * run + SpanGroup.computeTags identity) and asserts the assembled
 * expression grid against the reference's expected values.
 *
 * The reference tests assert positional arrays ordered by flattened
 * UID bytes; series here are keyed by their result tags (or the
 * flattened key where tags collide), so assertions are written as
 * (series, ts) → (value per variable) maps — same content, order-free.
 *
 * The reference's *ExtraDP* variants add points AFTER the query ran
 * (MockBase is queried inside runQueries), so those points are
 * invisible and the vectors collapse to their base tests — not
 * ported separately.
 */
abstract class ExpressionJoinSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  protected val T0 = 1431561600000L
  protected val T1 = T0 + 60000L
  protected val T2 = T0 + 120000L
  protected val T3 = T0 + 180000L
  // START_TS (BaseTimeSyncedIteratorTest.java:34) .. far future
  protected val Q = TsQuery(1388534400000L, 1500000000000L, Seq.empty)

  /** (metric, tsMs, longValue, tags) → typed points df. */
  protected def pts(rows: Seq[(String, Long, Long, Map[String, String])])
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.map { case (m, t, v, tg) =>
      Row(m, t, v.toDouble, java.lang.Long.valueOf(v), true, tg)
    }.asJava, Points.schema)
  }

  /** Three points at T0/T1/T2 with ascending values from `v0`. */
  protected def series(m: String, v0: Long, tags: (String, String)*)
      : Seq[(String, Long, Long, Map[String, String])] =
    Seq((m, T0, v0, tags.toMap), (m, T1, v0 + 1, tags.toMap),
      (m, T2, v0 + 2, tags.toMap))

  /** queryAB_Dstar / queryAB_AggAll / queryA_DD sub-queries. */
  protected def varSet(points: DataFrame, name: String, metric: String,
                     filters: Seq[TagFilter]): VarSet =
    VarSet(name, Engine.runForExpression(points, Q,
      SubQuery("sum", metric, filters)),
      queryTagKs = filters.map(_.tagk).toSet)

  protected def dStar(points: DataFrame): Seq[VarSet] = Seq(
    varSet(points, "a", "A", Seq(GroupByAll("D"))),
    varSet(points, "b", "B", Seq(GroupByAll("D"))))

  protected def aggAll(points: DataFrame): Seq[VarSet] = Seq(
    varSet(points, "a", "A", Seq.empty),
    varSet(points, "b", "B", Seq.empty))

  /** Collect the assembled grid as (sorted-tags-repr, ts) →
    * (v_a, v_b). */
  protected def grid(df: DataFrame): Map[(String, Long), (Double, Double)] =
    df.collect().map { r =>
      val tags = r.getMap[String, String](r.fieldIndex("tags")).toMap
      val repr = tags.toSeq.sorted.map { case (k, v) => s"$k=$v" }
        .mkString(",")
      ((repr, r.getAs[Long]("ts")),
        (r.getAs[Double]("__v_a"), r.getAs[Double]("__v_b")))
    }.toMap

  protected def seriesCount(df: DataFrame): Long =
    df.select("__skey").distinct().count()

  // ---- fixtures (BaseTimeSyncedIteratorTest) --------------------------

  protected def oneExtraSameE = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 4, "D" -> "F", "E" -> "E") ++
    series("B", 11, "D" -> "D", "E" -> "E") ++
    series("B", 14, "D" -> "F", "E" -> "E") ++
    series("B", 17, "D" -> "G", "E" -> "E"))

  protected def threeDisjointSameE = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 4, "D" -> "F", "E" -> "E") ++
    series("A", 7, "D" -> "G", "E" -> "E") ++
    series("B", 11, "D" -> "D", "E" -> "E") ++
    series("B", 14, "D" -> "Q", "E" -> "E") ++
    series("B", 17, "D" -> "G", "E" -> "E"))

  protected def reduceToOne = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 4, "D" -> "F", "E" -> "E") ++
    series("A", 7, "D" -> "G", "E" -> "E") ++
    series("B", 11, "D" -> "P", "E" -> "E") ++
    series("B", 14, "D" -> "Q", "E" -> "E") ++
    series("B", 17, "D" -> "G", "E" -> "E"))

  protected def threeSameE = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 4, "D" -> "F", "E" -> "E") ++
    series("A", 7, "D" -> "G", "E" -> "E") ++
    series("B", 11, "D" -> "D", "E" -> "E") ++
    series("B", 14, "D" -> "F", "E" -> "E") ++
    series("B", 17, "D" -> "G", "E" -> "E"))

  protected def threeSameENoB = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 4, "D" -> "F", "E" -> "E") ++
    series("A", 7, "D" -> "G", "E" -> "E"))

  protected def threeDifE = pts(
    series("A", 1, "D" -> "D", "E" -> "A") ++
    series("A", 4, "D" -> "F", "E" -> "B") ++
    series("A", 7, "D" -> "G", "E" -> "C") ++
    series("B", 11, "D" -> "D", "E" -> "D") ++
    series("B", 14, "D" -> "F", "E" -> "F") ++
    series("B", 17, "D" -> "G", "E" -> "G"))

  protected def threeAMissingE = pts(
    series("A", 1, "D" -> "D") ++
    series("A", 4, "D" -> "F") ++
    series("A", 7, "D" -> "G") ++
    series("B", 11, "D" -> "D", "E" -> "E") ++
    series("B", 14, "D" -> "F", "E" -> "E") ++
    series("B", 17, "D" -> "G", "E" -> "E"))

  protected def twoSeriesAggedE = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 1, "D" -> "D", "E" -> "F") ++
    series("B", 11, "D" -> "D", "E" -> "E") ++
    series("B", 11, "D" -> "D", "E" -> "F"))

  protected def twoSeriesAggedEandExtraTagK = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 1, "D" -> "D", "E" -> "F") ++
    series("B", 11, "D" -> "D", "E" -> "E", "Z" -> "A") ++
    series("B", 11, "D" -> "D", "E" -> "F", "Z" -> "B"))

  protected def oneAggedTheOtherTagged = pts(
    series("A", 1, "D" -> "D", "E" -> "E") ++
    series("A", 1, "D" -> "E", "E" -> "F") ++
    series("B", 11, "D" -> "D", "E" -> "E"))

  /** threeSameEGaps: each series is missing one point. */
  protected def threeSameEGaps = pts(Seq(
    ("A", T0, 1L, Map("D" -> "D", "E" -> "E")),
    ("A", T2, 3L, Map("D" -> "D", "E" -> "E")),
    ("A", T0, 4L, Map("D" -> "F", "E" -> "E")),
    ("A", T1, 5L, Map("D" -> "F", "E" -> "E")),
    ("A", T1, 8L, Map("D" -> "G", "E" -> "E")),
    ("A", T2, 9L, Map("D" -> "G", "E" -> "E")),
    ("B", T2, 13L, Map("D" -> "D", "E" -> "E")),
    ("B", T1, 15L, Map("D" -> "F", "E" -> "E")),
    ("B", T2, 19L, Map("D" -> "G", "E" -> "E"))))

  /** timeOffset: A at T0/T1 only, B at T2/T3 only. */
  protected def timeOffset = pts(Seq(
    ("A", T0, 1L, Map("D" -> "D", "E" -> "E")),
    ("A", T1, 2L, Map("D" -> "D", "E" -> "E")),
    ("A", T0, 4L, Map("D" -> "F", "E" -> "E")),
    ("A", T1, 5L, Map("D" -> "F", "E" -> "E")),
    ("B", T2, 13L, Map("D" -> "D", "E" -> "E")),
    ("B", T3, 14L, Map("D" -> "D", "E" -> "E")),
    ("B", T2, 16L, Map("D" -> "F", "E" -> "E")),
    ("B", T3, 17L, Map("D" -> "F", "E" -> "E"))))

  protected def asc(repr: String, v0: Double, w0: Double,
                  g: Map[(String, Long), (Double, Double)]): Unit =
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g((repr, t)) == (v0 + i, w0 + i), s"$repr @ $t")
    }

  // ---- IntersectionIterator ports -------------------------------------


















  // ---- UnionIterator ports ---------------------------------------------
















  // ---- ExpressionIterator evaluation ports -----------------------------
  // (TestExpressionIterator.java; remapResults gives every variable a
  // fresh TimeSyncedIterator whose fill policy is the DEFAULT ZERO,
  // TimeSyncedIterator.java:74)

  import org.apache.spark.sql.functions.col

  protected def dStarFill(points: DataFrame, fill: Double): Seq[VarSet] =
    dStar(points).map(_.copy(tsFill = fill))

  protected def evalIntersect(expr: String, sets: Seq[VarSet]): DataFrame = {
    val joined = ExpressionJoin.intersection("ei", sets,
      useQueryTags = false, includeAggTags = false)
    joined.withColumn("value",
      ExpQuery.bindColumns(expr, n => col(s"__v_$n")))
  }

  protected def evalGrid(df: DataFrame): Map[(String, Long), Double] =
    df.collect().map { r =>
      val tags = r.getMap[String, String](r.fieldIndex("tags")).toMap
      val repr = tags.toSeq.sorted.map { case (k, v) => s"$k=$v" }
        .mkString(",")
      ((repr, r.getAs[Long]("ts")), r.getAs[Double]("value"))
    }.toMap










  // ---- QueryExecutor end-to-end ports ----------------------------------
  // (/root/reference/test/tsd/TestQueryExecutor.java: the whole
  // /api/query/exp POJO request through runExpJson; values assert the
  // per-series dps columns the reference's V2 serializer emits)

  protected def expBody(metrics: Seq[(String, String)],
                      exprs: Seq[(String, String)],
                      outs: Seq[(String, Option[String])] = Seq.empty,
                      downsampler: String = ""): String = {
    val ms = metrics.map { case (id, m) =>
      s"""{"id":"$id","metric":"$m","filter":"f1"}""" }.mkString(",")
    val es = exprs.map { case (id, x) =>
      s"""{"id":"$id","expr":"$x",
          "join":{"operator":"intersection"}}""" }.mkString(",")
    val os = outs.map { case (id, al) =>
      s"""{"id":"$id"${al.map(a => s""","alias":"$a"""").getOrElse("")}}"""
    }.mkString(",")
    val ds = if (downsampler.isEmpty) ""
      else s""","downsampler":$downsampler"""
    s"""{"time":{"start":1431561600,"aggregator":"sum"$ds},
        "filters":[{"id":"f1","tags":[
          {"type":"wildcard","tagk":"D","filter":"*","groupBy":true}]}],
        "metrics":[$ms],
        "expressions":[$es]${if (os.isEmpty) "" else s""","outputs":[$os]"""}}"""
  }

  protected val NOW = 1431600000000L

  protected def runExp(points: DataFrame, body: String)
      : Map[String, Map[Long, Set[Double]]] =
    Engine.runExpJson(points, body, now = NOW).map { case (id, df) =>
      id -> df.collect().groupBy(_.getAs[Long]("ts")).map {
        case (t, rs) => t -> rs.map(_.getAs[Double]("value")).toSet
      }
    }.toMap
















}

class ExpressionJoinSpec extends ExpressionJoinSpecBase {

  test("intersection: twoAndThreeSeries — B's extra series is kicked") {
    val out = ExpressionJoin.intersection("it", dStar(oneExtraSameE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 2)
    val g = grid(out)
    assert(g.size == 6)
    asc("D=D,E=E", 1, 11, g)
    asc("D=F,E=E", 4, 14, g)
  }

  test("intersection: threeSeriesIntersectToTwo — disjoint series kicked " +
       "from both sides") {
    val out = ExpressionJoin.intersection("it", dStar(threeDisjointSameE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 2)
    val g = grid(out)
    asc("D=D,E=E", 1, 11, g)
    asc("D=G,E=E", 7, 17, g)
  }

  test("intersection: threeSeriesIntersectToOne") {
    val out = ExpressionJoin.intersection("it", dStar(reduceToOne),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 1)
    asc("D=G,E=E", 7, 17, grid(out))
  }

  test("intersection: threeSeriesAggedIntoOne — agg-all variables match " +
       "on the single-valued E") {
    val out = ExpressionJoin.intersection("it", aggAll(threeSameE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val g = grid(out)
    assert(g(("E=E", T0)) == (12.0, 42.0))
    assert(g(("E=E", T1)) == (15.0, 45.0))
    assert(g(("E=E", T2)) == (18.0, 48.0))
  }

  test("intersection: threeSeriesFullIntersectWithNaNs — per-series gaps " +
       "NaN-fill on the common grid") {
    val out = ExpressionJoin.intersection("it", dStar(threeSameEGaps),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 3)
    val g = grid(out)
    assert(g.size == 9)
    def chk(repr: String, exp: Seq[(Double, Double)]): Unit =
      Seq(T0, T1, T2).zip(exp).foreach { case (t, (ea, eb)) =>
        val (a, b) = g((repr, t))
        def ok(x: Double, e: Double) = if (e.isNaN) x.isNaN else x == e
        assert(ok(a, ea) && ok(b, eb), s"$repr @ $t: ($a,$b) != ($ea,$eb)")
      }
    val nan = Double.NaN
    chk("D=D,E=E", Seq((1, nan), (nan, nan), (3, 13)))
    chk("D=F,E=E", Seq((4, nan), (5, 15), (nan, nan)))
    chk("D=G,E=E", Seq((nan, nan), (8, nan), (9, 19)))
  }

  test("intersection: twoSeriesTimeOffset — disjoint time ranges NaN " +
       "against each other") {
    val out = ExpressionJoin.intersection("it", dStar(timeOffset),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 2)
    val g = grid(out)
    assert(g.size == 8) // 2 series × grid {T0,T1,T2,T3}
    assert(g(("D=D,E=E", T0)) == (1.0, Double.NaN) ||
      (g(("D=D,E=E", T0))._1 == 1.0 && g(("D=D,E=E", T0))._2.isNaN))
    assert(g(("D=D,E=E", T1))._1 == 2.0 && g(("D=D,E=E", T1))._2.isNaN)
    assert(g(("D=D,E=E", T2))._1.isNaN && g(("D=D,E=E", T2))._2 == 13.0)
    assert(g(("D=D,E=E", T3))._1.isNaN && g(("D=D,E=E", T3))._2 == 14.0)
    assert(g(("D=F,E=E", T0))._1 == 4.0 && g(("D=F,E=E", T0))._2.isNaN)
    assert(g(("D=F,E=E", T3))._1.isNaN && g(("D=F,E=E", T3))._2 == 17.0)
  }

  test("intersection: noIntersectionUsingResultTags throws") {
    intercept[IllegalArgumentException] {
      ExpressionJoin.intersection("it", dStar(threeDifE),
        useQueryTags = false, includeAggTags = false)
    }
  }

  test("intersection: intersectUsingQueryTags matches on the filter keys " +
       "only") {
    val out = ExpressionJoin.intersection("it", dStar(threeDifE),
      useQueryTags = true, includeAggTags = false)
    assert(seriesCount(out) == 3)
    val g = grid(out)
    // tags repr comes from variable a's result identity
    asc("D=D,E=A", 1, 11, g)
    asc("D=F,E=B", 4, 14, g)
    asc("D=G,E=C", 7, 17, g)
  }

  test("intersection: commonAggregatedTag — both sides aggregated E away") {
    val out = ExpressionJoin.intersection("it", dStar(twoSeriesAggedE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val g = grid(out)
    assert(g(("D=D", T0)) == (2.0, 22.0))
    assert(g(("D=D", T1)) == (4.0, 24.0))
    assert(g(("D=D", T2)) == (6.0, 26.0))
  }

  test("intersection: extraAggTagIgnored without includeAggTags") {
    val out = ExpressionJoin.intersection("it",
      dStar(twoSeriesAggedEandExtraTagK),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val g = grid(out)
    assert(g(("D=D", T0)) == (2.0, 22.0))
    assert(g(("D=D", T2)) == (6.0, 26.0))
  }

  test("intersection: extraAggTagNoIntersection — B's extra aggregated Z " +
       "breaks the match when agg tags are included") {
    intercept[IllegalArgumentException] {
      ExpressionJoin.intersection("it",
        dStar(twoSeriesAggedEandExtraTagK),
        useQueryTags = false, includeAggTags = true)
    }
  }

  test("intersection: onlyOneResultSet throws — B returned nothing") {
    intercept[IllegalArgumentException] {
      ExpressionJoin.intersection("it", dStar(threeSameENoB),
        useQueryTags = false, includeAggTags = true)
    }
  }

  test("intersection: oneAggedOneTaggedNoIntersection — empty-tag key vs " +
       "full-tag key") {
    intercept[IllegalArgumentException] {
      ExpressionJoin.intersection("it", aggAll(oneAggedTheOtherTagged),
        useQueryTags = false, includeAggTags = true)
    }
  }

  test("intersection: oneAggedOneTaggedUseQueryTagsWoutQueryTags — both " +
       "flatten to the empty key and match") {
    val out = ExpressionJoin.intersection("it",
      aggAll(oneAggedTheOtherTagged),
      useQueryTags = true, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val g = grid(out)
    // a is the 2-series aggregate (2,4,6), b the lone tagged series
    assert(g.values.toSet == Set((2.0, 11.0), (4.0, 12.0), (6.0, 13.0)))
  }

  test("intersection: singleSeries — one variable intersects with itself") {
    val p = oneExtraSameE
    val out = ExpressionJoin.intersection("it", Seq(
      varSet(p, "a", "A", Seq(LiteralOr("D", Seq("D"), groupBy = true)))),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val vals = out.collect().map(r =>
      r.getAs[Long]("ts") -> r.getAs[Double]("__v_a")).toMap
    assert(vals == Map(T0 -> 1.0, T1 -> 2.0, T2 -> 3.0))
  }

  test("intersection: setAMissingE throws on result tags, matches on " +
       "query tags") {
    intercept[IllegalArgumentException] {
      ExpressionJoin.intersection("it", dStar(threeAMissingE),
        useQueryTags = false, includeAggTags = false)
    }
    val out = ExpressionJoin.intersection("it", dStar(threeAMissingE),
      useQueryTags = true, includeAggTags = false)
    assert(seriesCount(out) == 3)
    val g = grid(out)
    asc("D=D", 1, 11, g)
    asc("D=F", 4, 14, g)
    asc("D=G", 7, 17, g)
  }

  test("intersection: noData — empty result sets yield an empty grid, " +
       "no exception") {
    val p = pts(Seq.empty)
    val out = ExpressionJoin.intersection("it", dStar(p),
      useQueryTags = false, includeAggTags = false)
    assert(out.count() == 0)
  }

  test("broadcastKeyCeiling: opt-in fail-fast on the series-key dim " +
       "for both join kinds; off by default; boundary exact") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("tags", MapType(StringType, StringType)),
      StructField("agg_tags", ArrayType(StringType)),
      StructField("ts", LongType), StructField("value", DoubleType)))
    def frame(nSeries: Int) = spark.createDataFrame(
      (0 until nSeries).map(i =>
        Row(Map("host" -> s"h$i"), Seq.empty[String],
          java.lang.Long.valueOf(T0), java.lang.Double.valueOf(i.toDouble))
      ).asJava, schema)
    def sets(n: Int) = Seq(
      VarSet("a", frame(n), tsFill = 0.0),
      VarSet("b", frame(n), tsFill = 0.0))
    assert(ExpressionJoin.broadcastKeyCeiling == 0L) // default: off
    try {
      ExpressionJoin.broadcastKeyCeiling = 3L
      // at the ceiling: allowed
      assert(ExpressionJoin.union("u", sets(3), useQueryTags = false,
        includeAggTags = false).count() == 3)
      // one past it: clear 400 for union AND intersection
      val eu = intercept[IllegalArgumentException] {
        ExpressionJoin.union("u", sets(4), useQueryTags = false,
          includeAggTags = false).count() }
      assert(eu.getMessage.contains("exceeds the configured ceiling"))
      val ei = intercept[IllegalArgumentException] {
        ExpressionJoin.intersection("i", sets(4), useQueryTags = false,
          includeAggTags = false).count() }
      assert(ei.getMessage.contains("exceeds the configured ceiling"))
    } finally ExpressionJoin.broadcastKeyCeiling = 0L
  }
}

class ExpressionJoinUnionSpec extends ExpressionJoinSpecBase {

  test("union: twoAndThreeSeries — missing series zero-fill") {
    val out = ExpressionJoin.union("it", dStar(oneExtraSameE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 3)
    val g = grid(out)
    asc("D=D,E=E", 1, 11, g)
    asc("D=F,E=E", 4, 14, g)
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("D=G,E=E", t)) == (0.0, 17.0 + i))
    }
  }

  test("union: threeSeriesUnionToFour") {
    val out = ExpressionJoin.union("it", dStar(threeDisjointSameE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 4)
    val g = grid(out)
    asc("D=D,E=E", 1, 11, g)
    asc("D=G,E=E", 7, 17, g)
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("D=F,E=E", t)) == (4.0 + i, 0.0))
      assert(g(("D=Q,E=E", t)) == (0.0, 14.0 + i))
    }
  }

  test("union: threeSeriesAgged — agg-all matches into one series") {
    val out = ExpressionJoin.union("it", aggAll(threeSameE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val g = grid(out)
    assert(g(("E=E", T0)) == (12.0, 42.0))
    assert(g(("E=E", T2)) == (18.0, 48.0))
  }

  test("union: threeSeriesWithNaNs — ts gaps NaN, missing series zero") {
    val out = ExpressionJoin.union("it", dStar(threeSameEGaps),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 3)
    val g = grid(out)
    // same as the intersection variant: all three keys survive in both
    val (a0, b0) = g(("D=D,E=E", T1))
    assert(a0.isNaN && b0.isNaN)
    assert(g(("D=G,E=E", T2)) == (9.0, 19.0))
    val (a1, b1) = g(("D=F,E=E", T2))
    assert(a1.isNaN && b1.isNaN)
  }

  test("union: twoSeriesTimeOffset") {
    val out = ExpressionJoin.union("it", dStar(timeOffset),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 2)
    val g = grid(out)
    assert(g.size == 8)
    assert(g(("D=D,E=E", T0))._1 == 1.0 && g(("D=D,E=E", T0))._2.isNaN)
    assert(g(("D=D,E=E", T3))._1.isNaN && g(("D=D,E=E", T3))._2 == 14.0)
  }

  test("union: threeSeriesUsingResultTags — six disjoint series") {
    val out = ExpressionJoin.union("it", dStar(threeDifE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 6)
    val g = grid(out)
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("D=D,E=A", t)) == (1.0 + i, 0.0))
      assert(g(("D=F,E=B", t)) == (4.0 + i, 0.0))
      assert(g(("D=G,E=C", t)) == (7.0 + i, 0.0))
      assert(g(("D=D,E=D", t)) == (0.0, 11.0 + i))
      assert(g(("D=F,E=F", t)) == (0.0, 14.0 + i))
      assert(g(("D=G,E=G", t)) == (0.0, 17.0 + i))
    }
  }

  test("union: threeSeriesUsingQueryTags — collapses to three matched " +
       "series") {
    val out = ExpressionJoin.union("it", dStar(threeDifE),
      useQueryTags = true, includeAggTags = false)
    assert(seriesCount(out) == 3)
    val g = grid(out)
    asc("D=D,E=A", 1, 11, g)
    asc("D=F,E=B", 4, 14, g)
    asc("D=G,E=C", 7, 17, g)
  }

  test("union: commonAggregatedTag and extraAggTagIgnored") {
    val g1 = grid(ExpressionJoin.union("it", dStar(twoSeriesAggedE),
      useQueryTags = false, includeAggTags = false))
    assert(g1(("D=D", T0)) == (2.0, 22.0))
    assert(g1(("D=D", T2)) == (6.0, 26.0))
    val g2 = grid(ExpressionJoin.union("it",
      dStar(twoSeriesAggedEandExtraTagK),
      useQueryTags = false, includeAggTags = false))
    assert(g2(("D=D", T0)) == (2.0, 22.0))
  }

  test("union: extraAggTag — Z splits the union into two zero-filled " +
       "series") {
    val out = ExpressionJoin.union("it", dStar(twoSeriesAggedEandExtraTagK),
      useQueryTags = false, includeAggTags = true)
    assert(seriesCount(out) == 2)
    // tags collide on repr (both {D:D}) — assert the value pairs per ts
    val byTs = out.collect().groupBy(_.getAs[Long]("ts")).map {
      case (t, rows) =>
        t -> rows.map(r => (r.getAs[Double]("__v_a"),
          r.getAs[Double]("__v_b"))).toSet
    }
    assert(byTs(T0) == Set((2.0, 0.0), (0.0, 22.0)))
    assert(byTs(T1) == Set((4.0, 0.0), (0.0, 24.0)))
    assert(byTs(T2) == Set((6.0, 0.0), (0.0, 26.0)))
  }

  test("union: onlyOneResultSet — every B value zero-fills, under all " +
       "three flag shapes") {
    for ((uq, iat) <- Seq((false, false), (true, false), (false, true))) {
      val out = ExpressionJoin.union("it", dStar(threeSameENoB),
        useQueryTags = uq, includeAggTags = iat)
      assert(seriesCount(out) == 3, s"uq=$uq iat=$iat")
      val g = grid(out)
      Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
        assert(g(("D=D,E=E", t)) == (1.0 + i, 0.0))
        assert(g(("D=F,E=E", t)) == (4.0 + i, 0.0))
        assert(g(("D=G,E=E", t)) == (7.0 + i, 0.0))
      }
    }
  }

  test("union: oneAggedOneTagged — empty-tag key and full-tag key stay " +
       "separate series") {
    val out = ExpressionJoin.union("it", aggAll(oneAggedTheOtherTagged),
      useQueryTags = false, includeAggTags = true)
    assert(seriesCount(out) == 2)
    val g = grid(out)
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("", t)) == (2.0 + 2 * i, 0.0))
      assert(g(("D=D,E=E", t)) == (0.0, 11.0 + i))
    }
  }

  test("union: oneAggedOneTaggedUseQueryTagsWoutQueryTags — both flatten " +
       "empty and merge") {
    val out = ExpressionJoin.union("it", aggAll(oneAggedTheOtherTagged),
      useQueryTags = true, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val g = grid(out)
    assert(g.values.toSet == Set((2.0, 11.0), (4.0, 12.0), (6.0, 13.0)))
  }

  test("union: singleSeries") {
    val out = ExpressionJoin.union("it", Seq(
      varSet(oneExtraSameE, "a", "A",
        Seq(LiteralOr("D", Seq("D"), groupBy = true)))),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 1)
    val vals = out.collect().map(r =>
      r.getAs[Long]("ts") -> r.getAs[Double]("__v_a")).toMap
    assert(vals == Map(T0 -> 1.0, T1 -> 2.0, T2 -> 3.0))
  }

  test("union: setAMissingE — result-tag keys disjoint (6 series), query " +
       "tags merge (3)") {
    val out = ExpressionJoin.union("it", dStar(threeAMissingE),
      useQueryTags = false, includeAggTags = false)
    assert(seriesCount(out) == 6)
    val g = grid(out)
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("D=D", t)) == (1.0 + i, 0.0))
      assert(g(("D=D,E=E", t)) == (0.0, 11.0 + i))
    }
    val merged = ExpressionJoin.union("it", dStar(threeAMissingE),
      useQueryTags = true, includeAggTags = false)
    assert(seriesCount(merged) == 3)
    val g2 = grid(merged)
    asc("D=D", 1, 11, g2)
    asc("D=F", 4, 14, g2)
    asc("D=G", 7, 17, g2)
  }

  test("union: noData yields an empty grid") {
    val out = ExpressionJoin.union("it", dStar(pts(Seq.empty)),
      useQueryTags = false, includeAggTags = false)
    assert(out.count() == 0)
  }

  test("union: colliding flat keys keep ONE series wholesale — never a " +
       "pointwise mix (reference ByteMap overwrite)") {
    // two series flatten to the same key once useQueryTags drops E;
    // the winner (max tag entries: E=F) is kept WHOLE — its gap at T1
    // takes the variable's tsFill, not the kicked series' value
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("tags", MapType(StringType, StringType)),
      StructField("agg_tags", ArrayType(StringType)),
      StructField("ts", LongType), StructField("value", DoubleType)))
    val rows = Seq(
      (Map("D" -> "D", "E" -> "E"), T0, 1.0),
      (Map("D" -> "D", "E" -> "E"), T1, 2.0),
      (Map("D" -> "D", "E" -> "E"), T2, 3.0),
      (Map("D" -> "D", "E" -> "F"), T0, 10.0),
      (Map("D" -> "D", "E" -> "F"), T2, 30.0))
    val df = spark.createDataFrame(rows.map { case (tg, t, v) =>
      Row(tg, Seq.empty[String], java.lang.Long.valueOf(t),
        java.lang.Double.valueOf(v))
    }.asJava, schema)
    val out = ExpressionJoin.union("u",
      Seq(VarSet("a", df, queryTagKs = Set("D"), tsFill = -1.0)),
      useQueryTags = true, includeAggTags = false)
    val got = out.collect().map(r =>
      r.getAs[Long]("ts") -> r.getAs[Double]("__v_a")).toMap
    assert(got == Map(T0 -> 10.0, T1 -> -1.0, T2 -> 30.0), got.toString)
    assert(out.select("__skey").distinct().count() == 1)
  }
}

class ExpressionJoinExprSpec extends ExpressionJoinSpecBase {

  test("combined-base equivalence: the shared variable scan computes " +
       "exactly what the per-variable direct scans computed") {
    // round-17 optimization: runExpJsonMeta feeds every variable from
    // ONE persisted (metric-set, padded-window) scan. strictMetrics
    // keeps the old per-variable direct path, so the same body run
    // both ways must produce identical rows — including under
    // timeOffset (shifted windows) and a downsampler (padded scans).
    val body = s"""{"time":{"start":${T0 / 1000},"aggregator":"sum",
        "downsampler":{"interval":"1m","aggregator":"sum"}},
        "filters":[{"id":"f1","tags":[
          {"type":"wildcard","tagk":"D","filter":"*","groupBy":true}]}],
        "metrics":[{"id":"a","metric":"A","filter":"f1"},
          {"id":"b","metric":"B","filter":"f1",
           "timeOffset":"1m-ago"}],
        "expressions":[{"id":"e","expr":"a + b * 2",
          "join":{"operator":"union"}}]}"""
    def run(): Seq[(String, Long, Double)] =
      Engine.runExpJson(threeSameEGaps, body, now = T3 + 1000)
        .head._2.collect().map { r =>
          (r.getAs[String]("__skey"), r.getAs[Long]("ts"),
            r.getAs[Double]("value"))
        }.sortBy(t => (t._1, t._2)).toSeq
    val combined = run()
    Engine.strictMetrics = false // (default — combined path)
    val direct =
      try { Engine.strictMetrics = true; run() }
      finally Engine.strictMetrics = false
    assert(combined.nonEmpty)
    assert(combined == direct)
  }

  test("expression: aPlusBWithTwoSeries") {
    val g = evalGrid(evalIntersect("a + b", dStarFill(oneExtraSameE, 0.0)))
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("D=D,E=E", t)) == 12.0 + 2 * i)
      assert(g(("D=F,E=E", t)) == 18.0 + 2 * i)
    }
  }

  test("expression: aMinusB / aTimesB / aDivideB / aModB") {
    val sets = dStarFill(oneExtraSameE, 0.0)
    val gm = evalGrid(evalIntersect("a - b", sets))
    assert(gm(("D=D,E=E", T0)) == -10.0 && gm(("D=F,E=E", T2)) == -10.0)
    val gt = evalGrid(evalIntersect("a * b", sets))
    assert(gt(("D=D,E=E", T0)) == 11.0 && gt(("D=D,E=E", T1)) == 24.0)
    val gd = evalGrid(evalIntersect("b / a", sets))
    assert(gd(("D=D,E=E", T0)) == 11.0 && gd(("D=D,E=E", T1)) == 6.0)
    val gmod = evalGrid(evalIntersect("b % a", sets))
    assert(gmod(("D=D,E=E", T1)) == 0.0 && gmod(("D=D,E=E", T2)) == 1.0)
  }

  test("expression: aDivideByZero emits zero (JEXL quirk)") {
    val g = evalGrid(evalIntersect("a / 0", dStarFill(oneExtraSameE, 0.0)))
    assert(g.values.forall(_ == 0.0))
    assert(g.size == 6)
  }

  test("expression: doubleVariableAndPrecedence a + (b * b)") {
    val g = evalGrid(evalIntersect("a + (b * b)",
      dStarFill(oneExtraSameE, 0.0)))
    assert(g(("D=D,E=E", T0)) == 1.0 + 11.0 * 11.0)
    assert(g(("D=F,E=E", T2)) == 6.0 + 16.0 * 16.0)
    // precedence without parens is identical
    val g2 = evalGrid(evalIntersect("a + b * b",
      dStarFill(oneExtraSameE, 0.0)))
    assert(g2 == g)
  }

  test("expression: aPlusScalarDropB — scalar operand, b ignored") {
    val g = evalGrid(evalIntersect("a + 1", dStarFill(oneExtraSameE, 0.0)))
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("D=D,E=E", t)) == 2.0 + i)
      assert(g(("D=F,E=E", t)) == 5.0 + i)
    }
  }

  test("expression: aPlusB missing points — default zero fill, scalar " +
       "fill, infectious NaN") {
    // threeSameEGaps intersection, per-variable fill at eval
    val zero = evalGrid(evalIntersect("a + b", dStarFill(threeSameEGaps, 0.0)))
    assert(zero(("D=D,E=E", T0)) == 1.0)
    assert(zero(("D=F,E=E", T0)) == 4.0)
    assert(zero(("D=G,E=E", T0)) == 0.0)
    assert(zero(("D=D,E=E", T1)) == 0.0)
    assert(zero(("D=F,E=E", T1)) == 20.0)
    assert(zero(("D=G,E=E", T1)) == 8.0)
    assert(zero(("D=D,E=E", T2)) == 16.0)
    assert(zero(("D=F,E=E", T2)) == 0.0)
    assert(zero(("D=G,E=E", T2)) == 28.0)
    val one = evalGrid(evalIntersect("a + b", dStarFill(threeSameEGaps, 1.0)))
    assert(one(("D=D,E=E", T0)) == 2.0)
    assert(one(("D=F,E=E", T0)) == 5.0)
    assert(one(("D=G,E=E", T0)) == 2.0)
    assert(one(("D=G,E=E", T1)) == 9.0)
    assert(one(("D=F,E=E", T2)) == 2.0)
    val nan = evalGrid(evalIntersect("a + b",
      dStarFill(threeSameEGaps, Double.NaN)))
    assert(nan(("D=D,E=E", T2)) == 16.0)
    assert(nan(("D=D,E=E", T0)).isNaN)
    assert(nan(("D=G,E=E", T1)).isNaN)
  }

  test("expression: singleNestedExpression x * 2 over (a + b)") {
    // the inner expression result feeds the outer join as a variable
    // whose identity is the joined series tags
    val inner = evalIntersect("a + b", dStarFill(oneExtraSameE, 0.0))
    val innerVar = VarSet("x", inner.select(col("tags"),
      org.apache.spark.sql.functions.array()
        .cast("array<string>").as("agg_tags"),
      col("ts"), col("value")), tsFill = 0.0)
    val g = evalGrid(evalIntersect("x * 2", Seq(innerVar)))
    Seq(T0, T1, T2).zipWithIndex.foreach { case (t, i) =>
      assert(g(("D=D,E=E", t)) == 24.0 + 4 * i)
      assert(g(("D=F,E=E", t)) == 36.0 + 4 * i)
    }
  }

  test("expression: noIntersectionFound throws") {
    intercept[IllegalArgumentException] {
      evalIntersect("a + b", dStarFill(threeDifE, 0.0))
    }
  }

  test("expression: aLessThanb yields 1/0; aGreaterThanb is rejected " +
       "as variable-free (JEXL 2 collector quirk)") {
    val g = evalGrid(evalIntersect("a < b", dStarFill(oneExtraSameE, 0.0)))
    assert(g.size == 6)
    assert(g.values.forall(_ == 1.0))
    // '>' contributes no variables, so the ctor-level guard fires —
    // the reference throws IllegalArgumentException("The expression
    // didn't appear to have any variables")
    assert(ExpQuery.variables(ExpQuery.parse("a > b")).isEmpty)
  }

  test("exp cache lifecycle: serializeExpV2 releases on exit; raw " +
       "runExpJson runs are bounded by the eviction ring") {
    val df = oneExtraSameE
    // e is referenced by e2, so the run persists two variables AND
    // checkpoints one expression — both kinds must be released
    val body = expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + b", "e2" -> "e * 2"))
    Engine.clearExpCache()
    Engine.clearResultCache()
    Engine.serializeExpV2(df, body, now = NOW)
    val base = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach(_ => Engine.serializeExpV2(df, body, now = NOW))
    // flat: every serializeExpV2 call releases its own persists and
    // checkpoint blocks (the round-10 lifecycle leak)
    assert(spark.sparkContext.getPersistentRDDs.size == base)

    val prev = Engine.expCacheMaxEntries
    Engine.expCacheMaxEntries = 2
    try {
      (1 to 5).foreach { _ =>
        Engine.runExpJson(df, body, now = NOW).foreach(_._2.collect())
      }
      // at most 2 runs' frames live: 2 persisted vars + 1 checkpoint
      assert(spark.sparkContext.getPersistentRDDs.size <= base + 6)
      Engine.clearExpCache()
      assert(spark.sparkContext.getPersistentRDDs.size <= base)
    } finally {
      Engine.expCacheMaxEntries = prev
      Engine.clearExpCache()
    }
  }

  test("exp data-point budget guard fires before the serializer collect") {
    Engine.expMaxDataPoints = 3L
    try {
      def chain(t: Throwable): String =
        if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
      // e is 2 series × 3 grid timestamps = 6 rows > 3
      val ex = intercept[Exception] {
        Engine.serializeExpV2(oneExtraSameE, expBody(
          Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b")), now = NOW)
      }
      assert(chain(ex).contains("data-point budget"), chain(ex))
    } finally Engine.expMaxDataPoints = Long.MaxValue
  }
}

class ExpressionJoinExecutorSpec extends ExpressionJoinSpecBase {

  test("executor: oneExpressionWithOutputAlias + metric outputs") {
    // oneExpressionWithOutputAlias / oneExpressionOutputAndBAlso
    val out = runExp(oneExtraSameE, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b"),
      outs = Seq("e" -> Some("A plus B"), "a" -> None, "b" -> None)))
    assert(out("e") == Map(T0 -> Set(12.0, 18.0), T1 -> Set(14.0, 20.0),
      T2 -> Set(16.0, 22.0)))
    assert(out("a")(T0) == Set(1.0, 4.0))
    assert(out("b")(T0) == Set(11.0, 14.0, 17.0))
    // the alias names the emitted metric
    val named = Engine.runExpJson(oneExtraSameE, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b"),
      outs = Seq("e" -> Some("A plus B"))), now = NOW)
      .head._2.select("metric").distinct().collect().map(_.getString(0))
    assert(named.toSeq == Seq("A plus B"))
  }

  test("executor: justMetrics — a metrics-only body emits each metric " +
       "(outputs default to the metrics, QueryExecutor.serialize:499-517)") {
    val out = runExp(oneExtraSameE, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq.empty))
    assert(out.keySet == Set("a", "b"))
    assert(out("a")(T0) == Set(1.0, 4.0))
    assert(out("b")(T0) == Set(11.0, 14.0, 17.0))
  }

  test("executor: oneExpressionDefaultFill — missing points zero-fill, " +
       "with and without a no-fill downsample") {
    val exp = Map(T0 -> Set(1.0, 4.0, 0.0), T1 -> Set(0.0, 20.0, 8.0),
      T2 -> Set(16.0, 0.0, 28.0))
    val plain = runExp(threeSameEGaps, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b")))
    assert(plain("e") == exp)
    // oneExpressionDownsamplingMissingTimestampNoFill: a 1m-sum
    // downsample with no fill leaves the same gaps
    val ds = runExp(threeSameEGaps, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b"),
      downsampler = """{"interval":"1m","aggregator":"sum"}"""))
    assert(ds("e") == exp)
  }

  test("executor: two expressions, nested one/two levels, declaration " +
       "order independent (DAG compile)") {
    val two = runExp(oneExtraSameE, expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + b", "e2" -> "a * b")))
    assert(two("e")(T1) == Set(14.0, 20.0))
    assert(two("e2") == Map(T0 -> Set(11.0, 56.0), T1 -> Set(24.0, 75.0),
      T2 -> Set(39.0, 96.0)))
    val nested = runExp(oneExtraSameE, expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + b", "e2" -> "e * 2", "e3" -> "e * 2",
        "e4" -> "e2 + e3")))
    assert(nested("e2") == Map(T0 -> Set(24.0, 36.0), T1 -> Set(28.0, 40.0),
      T2 -> Set(32.0, 44.0)))
    assert(nested("e4") == Map(T0 -> Set(48.0, 72.0), T1 -> Set(56.0, 80.0),
      T2 -> Set(64.0, 88.0)))
    // nestedExpressionsTwoLevelsDefaultOutputOrdering: same result when
    // declared with forward references
    val shuffled = runExp(oneExtraSameE, expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e2" -> "e * 2", "e4" -> "e2 + e3", "e3" -> "e * 2",
        "e" -> "a + b")))
    assert(shuffled("e4") == nested("e4"))
    assert(shuffled("e2") == nested("e2"))
  }

  test("executor: empty result sets are empty, not errors") {
    // emptyResultSet: no data at all
    val none = runExp(pts(Seq.empty), expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + b")))
    assert(none("e").isEmpty)
    // twoExpressionsOneWithoutResultsDefaultOutput: metrics D/F hold no
    // data — x is empty while e computes normally
    val mixed = runExp(oneExtraSameE, expBody(
      Seq("a" -> "A", "b" -> "B", "d" -> "D", "f" -> "F"),
      Seq("e" -> "a + b", "x" -> "d + f")))
    assert(mixed("e")(T0) == Set(12.0, 18.0))
    assert(mixed("x").isEmpty)
  }

  test("executor: the V2 response document (dps arrays, dpsMeta, " +
       "per-series meta, query echo)") {
    // oneExpressionWithOutputAlias's response assertions
    val resp = Engine.serializeExpV2(oneExtraSameE, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b"),
      outs = Seq("e" -> Some("A plus B"))), now = NOW)
    assert(resp.contains(""""alias":"A plus B""""))
    assert(resp.contains(""""dps":[[1431561600000,12.0,18.0]"""))
    assert(resp.contains("[1431561660000,14.0,20.0]"))
    assert(resp.contains("[1431561720000,16.0,22.0]"))
    assert(resp.contains(""""firstTimestamp":1431561600000"""))
    assert(resp.contains(""""lastTimestamp":1431561720000"""))
    assert(resp.contains(""""setCount":3"""))
    assert(resp.contains(""""index":1"""))
    assert(resp.contains(""""metrics":["A","B"]"""))
    assert(resp.contains(""""index":2"""))
    assert(resp.contains(""""metrics":["timestamp"]"""))
    // commonTags = the series' EDP tag map — SpanGroup.computeTags
    // keeps ALL tags of a one-series group (E=E survives alongside the
    // grouped D), reference SpanGroup.java:348-388 via
    // ExpressionDataPoint(dps).tags()
    assert(resp.contains(""""commonTags":{"D":"D","E":"E"}"""))
    assert(resp.contains(""""query":{"""))
    // emptyResultSet: dps:[], zeroed dpsMeta, no meta array
    val none = Engine.serializeExpV2(pts(Seq.empty), expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b")), now = NOW)
    assert(none.contains(""""dps":[]"""))
    assert(none.contains(""""firstTimestamp":0"""))
    assert(none.contains(""""series":0"""))
    assert(!none.contains(""""meta""""))
    // a metric output serializes its own series columns
    val withB = Engine.serializeExpV2(oneExtraSameE, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b"),
      outs = Seq("e" -> None, "b" -> None)), now = NOW)
    assert(withB.contains(""""id":"b""""))
    assert(withB.contains(""""dps":[[1431561600000,11.0,14.0,17.0]"""))
    assert(withB.contains(""""metrics":["B"]"""))
  }

  test("executor: V2 response byte-equality golden (regression pin of " +
       "the whole document)") {
    // the COMPLETE serialized response for the canonical
    // oneExpressionWithOutputAlias fixture, pinned byte for byte so
    // any serializer drift (field order, dps column order, meta
    // shape, query echo) fails loudly. Body is a fixed string so the
    // echo is stable.
    val body = """{"time":{"start":1431561600,"aggregator":"sum"},""" +
      """"filters":[{"id":"f1","tags":[{"type":"wildcard","tagk":"D",""" +
      """"filter":"*","groupBy":true}]}],""" +
      """"metrics":[{"id":"a","metric":"A","filter":"f1"},""" +
      """{"id":"b","metric":"B","filter":"f1"}],""" +
      """"expressions":[{"id":"e","expr":"a + b",""" +
      """"join":{"operator":"intersection"}}],""" +
      """"outputs":[{"id":"e","alias":"A plus B"}]}"""
    val resp = Engine.serializeExpV2(oneExtraSameE, body, now = NOW)
    val expected =
      """{"outputs":[{"id":"e","alias":"A plus B","dps":""" +
      """[[1431561600000,12.0,18.0],[1431561660000,14.0,20.0],""" +
      """[1431561720000,16.0,22.0]],"dpsMeta":""" +
      """{"firstTimestamp":1431561600000,"lastTimestamp":1431561720000,""" +
      """"setCount":3,"series":2},"meta":[{"index":0,"metrics":""" +
      """["timestamp"]},{"index":1,"metrics":["A","B"],"commonTags":""" +
      """{"D":"D","E":"E"},"aggregatedTags":[]},{"index":2,"metrics":""" +
      """["A","B"],"commonTags":{"D":"F","E":"E"},"aggregatedTags":[]}]}],""" +
      """"query":{"time":{"start":1431561600,"aggregator":"sum"},""" +
      """"filters":[{"id":"f1","tags":[{"type":"wildcard","tagk":"D",""" +
      """"filter":"*","groupBy":true}]}],""" +
      """"metrics":[{"id":"a","metric":"A","filter":"f1"},""" +
      """{"id":"b","metric":"B","filter":"f1"}],""" +
      """"expressions":[{"id":"e","expr":"a + b",""" +
      """"join":{"operator":"intersection"}}],""" +
      """"outputs":[{"id":"e","alias":"A plus B"}]}}"""
    assert(resp == expected, resp)
  }

  test("executor: error contracts — self reference, cycle, missing " +
       "variable, no intersections") {
    def msg(body: String, points: DataFrame = oneExtraSameE): String =
      intercept[IllegalArgumentException] {
        Engine.runExpJson(points, body, now = NOW).foreach(_._2.collect())
      }.getMessage
    assert(msg(expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + b", "e2" -> "e * 2", "e3" -> "e * 2",
        "e4" -> "e2 + e4")))
      .startsWith("Self referencing expression found"))
    assert(msg(expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + e4", "e2" -> "e * 2", "e3" -> "e * 2",
        "e4" -> "e2 + e3")))
      .startsWith("Circular reference found"))
    // an unknown variable dies in Query.validate BEFORE the executor
    // runs (Query.java:165-170 — QueryRpc validates the POJO first);
    // the executor's own "Missing results for variable" guard
    // (ExpressionIterator.java:257) stays as the backstop for ids the
    // gate can't see
    assert(msg(expBody(Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + b + c")))
      == "Expression [a + b + c] was missing input c")
    // noIntersectionsFound: disjoint tag sets
    assert(msg(expBody(Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b")),
      points = threeDifE).startsWith("No intersections found"))
    // noIntersectionsFoundOneMetricEmpty: one side has series, the
    // other none at all
    assert(msg(expBody(Seq("a" -> "A", "b" -> "D"), Seq("e" -> "a + b")))
      .startsWith("No intersections found"))
    // noIntersectionsFoundNestedExpression: the empty metric joins a
    // live expression result
    assert(msg(expBody(Seq("a" -> "A", "b" -> "B", "d" -> "D"),
      Seq("e" -> "a + b", "x" -> "d + e")))
      .startsWith("No intersections found"))
  }

  test("executor: oneExpressionNoFilter — aggregate-all variables join " +
       "on the agg-tag key; aggregatedTags serialized per series") {
    // metrics WITHOUT filters: each variable aggregates every series
    // into one (A: 1+4.., B: 11+14+17..), both flatten to the same
    // {E:E}+aggD key and the intersection holds exactly one series
    val body = """{"time":{"start":1431561600,"aggregator":"sum"},
        "metrics":[{"id":"a","metric":"A"},{"id":"b","metric":"B"}],
        "expressions":[{"id":"e","expr":"a + b",
          "join":{"operator":"intersection"}}],
        "outputs":[{"id":"e","alias":"A plus B"}]}"""
    val resp = Engine.serializeExpV2(oneExtraSameE, body, now = NOW)
    assert(resp.contains(""""alias":"A plus B""""))
    assert(resp.contains(""""dps":[[1431561600000,47.0]"""))
    assert(resp.contains("[1431561660000,52.0]"))
    assert(resp.contains("[1431561720000,57.0]"))
    assert(resp.contains(""""firstTimestamp":1431561600000"""))
    assert(resp.contains(""""metrics":["A","B"]"""))
    // the V2 meta reports the aggregated-away keys per series
    // (QueryExecutor MetaSerializer, QueryExecutor.java:848-880/:926-930)
    assert(resp.contains(""""commonTags":{"E":"E"}"""))
    assert(resp.contains(""""aggregatedTags":["D"]"""))
  }

  test("executor: multiExpressionsOneOutput — only the named output " +
       "is serialized") {
    val resp = Engine.serializeExpV2(oneExtraSameE, expBody(
      Seq("a" -> "A", "b" -> "B"),
      Seq("e" -> "a + b", "e2" -> "e * 2", "e3" -> "e * 2",
        "e4" -> "e2 + e3"),
      outs = Seq("e" -> Some("A plus B"))), now = NOW)
    assert(resp.contains("[1431561660000,14.0,20.0]"))
    assert(resp.contains("[1431561720000,16.0,22.0]"))
    // outputs holds ONLY the named output (the query echo still lists
    // every expression definition)
    val outs = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(resp).get("outputs")
    assert(outs.size() == 1 && outs.get(0).get("id").asText() == "e")
  }

  test("executor: nsunMetric — unknown metric fails under strict " +
       "resolution (reference NoSuchUniqueName → 400)") {
    Engine.strictMetrics = true
    try {
      val ex = intercept[NoSuchElementException] {
        Engine.runExpJson(oneExtraSameE, expBody(
          Seq("a" -> "A", "b" -> "NOPE"), Seq("e" -> "a + b")), now = NOW)
      }
      assert(ex.getMessage.startsWith("No such name for"), ex.getMessage)
    } finally Engine.strictMetrics = false
  }

  test("executor: dpsMeta quirks — metric outputs stamp lastTimestamp " +
       "on every row, expression outputs only from the second") {
    // one timestamp only: the expression output reports lastTimestamp 0
    // (first/last split, QueryExecutor.java:698-704) while the metric
    // output reports last == first (SerializeSubIterator stamps last on
    // every row, :786-800)
    val oneTs = pts(Seq(("A", T0, 1L, Map("D" -> "D")),
      ("B", T0, 2L, Map("D" -> "D"))))
    val resp = Engine.serializeExpV2(oneTs, expBody(
      Seq("a" -> "A", "b" -> "B"), Seq("e" -> "a + b"),
      outs = Seq("e" -> None, "a" -> None)), now = NOW)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val outs = mapper.readTree(resp).get("outputs")
    val byId = (0 until outs.size()).map(i =>
      outs.get(i).get("id").asText() -> outs.get(i).get("dpsMeta")).toMap
    assert(byId("e").get("firstTimestamp").asLong() == T0)
    assert(byId("e").get("lastTimestamp").asLong() == 0L)
    assert(byId("a").get("firstTimestamp").asLong() == T0)
    assert(byId("a").get("lastTimestamp").asLong() == T0)
  }
}
