package graft

import graft.model.Points
import graft.operators._
import graft.query._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

/**
 * Randomized query-config fuzzing against an independently rendered SQL
 * oracle. The reference's subtlety lives in the cross-product
 * aggregator × interpolation policy × downsample interval/fill × rate
 * options × filter type × value typing, which the reference itself
 * covers with matrix suites (test/core/TestTsdbQueryAggregators.java,
 * test/core/TestTsdbQueryDownsample.java and their salted re-runs).
 *
 * Here: draw deterministic pseudo-random query configs, run each
 * through `Engine.run`, and compare against a from-scratch ANSI-SQL
 * transcription of the same reference semantics (scan pad → per-series
 * downsample + fill → rate → slot-grid interpolation with bounded
 * carry → cross-series aggregation with the long/double dual path →
 * range clip), executed by Spark SQL over a temp view. The renderer is
 * pure string templates sharing no code with the engine, so an engine
 * bug must be independently reproduced in SQL to go unnoticed.
 *
 * Excluded dimensions, each golden-tested elsewhere: calendar/tz
 * downsampling (OperatorsSpec q36/q51/q81 vectors), explicit_tags,
 * run_all, `mult`/`diff` cross-series (ts ties make max_by/min_by
 * nondeterministic across plans), and ms-vs-s timestamp parsing.
 */
class FuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val T0 = 1356998400000L // 2013-01-01T00:00:00Z
  private val NAN = "CAST('NaN' AS DOUBLE)"

  // ---- datasets -------------------------------------------------------

  /** 5 series over a 40-slot 10s grid with ~28% dropout; `jitter` adds
    * per-point sub-slot offsets (misaligned stamps force lerp), `style`
    * types the values: f = floats (eighths, exact in binary), i = longs
    * (signed, exercising truncation toward zero), m = mixed per series
    * (demotes the long path only where float series contribute). */
  private def genRows(seed: Int, jitter: Boolean,
                      style: String): Seq[Row] = {
    val rnd = new Random(seed)
    val combos = for (h <- Seq("h0", "h1", "h2", "h3");
                      d <- Seq("east", "west")) yield (h, d)
    val picked = rnd.shuffle(combos).take(5)
    picked.zipWithIndex.flatMap { case ((h, d), si) =>
      val isInt = style match {
        case "i" => true
        case "f" => false
        case _   => si % 2 == 0
      }
      (0 until 40).flatMap { k =>
        val keep = rnd.nextDouble() < 0.72
        val off = if (jitter) rnd.nextInt(9000) else 0
        val vl = (rnd.nextInt(2001) - 700).toLong
        val vf = (rnd.nextInt(16001) - 6000) / 8.0
        if (!keep) None
        else if (isInt)
          Some(Row("fm", T0 + k * 10000L + off, vl.toDouble,
            java.lang.Long.valueOf(vl), true, Map("host" -> h, "dc" -> d)))
        else
          Some(Row("fm", T0 + k * 10000L + off, vf, null, false,
            Map("host" -> h, "dc" -> d)))
      }
    }
  }

  /** (points DF for the engine, temp view for the SQL oracle). */
  private def mkDataset(name: String, seed: Int, jitter: Boolean,
                        style: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(genRows(seed, jitter, style).asJava,
      Points.schema)
    df.select(col("metric"), col("ts"), col("value"), col("value_l"),
        col("is_int"),
        col("tags").getItem("host").as("tag_host"),
        col("tags").getItem("dc").as("tag_dc"),
        concat_ws("|", col("tags").getItem("host"),
          col("tags").getItem("dc")).as("sid"))
      .createOrReplaceTempView(name)
    df
  }

  private lazy val datasets: Map[String, (DataFrame, Boolean)] = Map(
    // name -> (engine df, typed: value_l/is_int carry information)
    "fz_af" -> (mkDataset("fz_af", 101, jitter = false, "f"), false),
    "fz_jf" -> (mkDataset("fz_jf", 102, jitter = true,  "f"), false),
    "fz_ai" -> (mkDataset("fz_ai", 103, jitter = false, "i"), true),
    "fz_ji" -> (mkDataset("fz_ji", 104, jitter = true,  "i"), true),
    "fz_jm" -> (mkDataset("fz_jm", 105, jitter = true,  "m"), true))

  // ---- config drawing -------------------------------------------------

  private case class Cfg(id: Int, view: String, agg: String,
                         ds: Option[DownsampleSpec],
                         rate: Option[RateOptions],
                         filters: Seq[TagFilter],
                         startMs: Long, endMs: Long) {
    def typed: Boolean = datasets(view)._2
    def hasDual: Boolean = typed && ds.isEmpty && rate.isEmpty
    override def toString: String =
      s"cfg#$id[$view ${ds.map(_.spec + ":").getOrElse("")}" +
        s"${rate.map(o => s"rate{${o.counter},${o.counterMax}," +
          s"${o.resetValue},${o.dropResets}}:").getOrElse("")}$agg " +
        s"filters=$filters range=[$startMs,$endMs]]"
  }

  private val crossAggs = Seq("sum", "avg", "min", "max", "dev", "count",
    "median", "zimsum", "pfsum", "mimmin", "mimmax", "p50", "p90")
  private val dsAggs = Seq("sum", "avg", "min", "max", "count",
    "first", "last")

  private def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  private def drawCfg(rnd: Random, id: Int): Cfg = {
    val view = pick(rnd, datasets.keys.toSeq.sorted)
    val agg = pick(rnd, crossAggs)
    val ds = if (rnd.nextDouble() < 0.45) None else {
      val ivl = pick(rnd, Seq(10, 30, 60, 120))
      val da = pick(rnd, dsAggs)
      val fill = pick(rnd, Seq("", "-zero", "-nan", "-null"))
      Some(DownsampleSpec.parse(s"${ivl}s-$da$fill"))
    }
    val rate = if (rnd.nextDouble() < 0.65) None
      else if (rnd.nextBoolean()) Some(RateOptions())
      else Some(RateOptions(counter = true,
        counterMax = if (rnd.nextBoolean()) Long.MaxValue else 65536L,
        resetValue = if (rnd.nextBoolean()) 0L else 500L,
        dropResets = rnd.nextBoolean()))
    val filter: Option[TagFilter] = rnd.nextInt(6) match {
      case 0 => None
      case 1 => Some(LiteralOr("host",
        Seq(pick(rnd, Seq("h0", "h1", "h2", "h3")),
            pick(rnd, Seq("h0", "h1", "h2", "h3")))))
      case 2 => Some(LiteralOr("host", Seq("H0", "H2"),
        caseInsensitive = true))
      case 3 => Some(NotLiteralOr("host",
        Seq(pick(rnd, Seq("h0", "h1", "h2", "h3")))))
      case 4 => Some(Wildcard("host", pick(rnd, Seq("h*", "*0", "h*0"))))
      case 5 => Some(RegexpFilter("host", pick(rnd, Seq("h[01]", "h[23]"))))
    }
    val group: Option[TagFilter] = rnd.nextInt(3) match {
      case 0 => None
      case 1 => Some(GroupByAll("host"))
      case 2 => Some(GroupByAll("dc"))
    }
    val start = T0 + rnd.nextInt(15) * 10000L
    val end = start + (8 + rnd.nextInt(32)) * 10000L
    Cfg(id, view, agg, ds, rate, filter.toSeq ++ group.toSeq, start, end)
  }

  // ---- SQL renderer (independent transcription) ----------------------

  /** Mirror of the aggregator registry's double-path semantics (NaN
    * inputs skipped; empty group yields NaN, count yields 0). */
  private def aggSql(name: String, v: String, ts: String): String = {
    def nn = s"(CASE WHEN NOT isnan($v) THEN $v END)"
    def srt = s"sort_array(collect_list($nn))"
    def pctR6(p: Double): String = {
      val n = s"CAST(size($srt) AS DOUBLE)"
      val h = s"(($n + 1.0) * $p)"
      val fl = s"CAST(floor($h) AS INT)"
      s"""(CASE WHEN size($srt) = 0 THEN $NAN
            WHEN $h <= 1.0 THEN element_at($srt, 1)
            WHEN $h >= $n THEN element_at($srt, size($srt))
            ELSE element_at($srt, $fl) +
              ($h - floor($h)) *
              (element_at($srt, $fl + 1) - element_at($srt, $fl))
          END)"""
    }
    name match {
      case "sum" | "zimsum" | "pfsum" => s"coalesce(sum($nn), $NAN)"
      case "min" | "mimmin" => s"coalesce(min($nn), $NAN)"
      case "max" | "mimmax" => s"coalesce(max($nn), $NAN)"
      case "avg" => s"coalesce(avg($nn), $NAN)"
      case "count" => s"count($nn)"
      case "dev" => s"coalesce(stddev_pop($nn), $NAN)"
      case "median" =>
        s"""(CASE WHEN size($srt) = 0 THEN $NAN
             ELSE element_at($srt,
               CAST(CAST(size($srt) AS DOUBLE) / 2 AS INT) + 1) END)"""
      case "first" => s"min_by($v, $ts)"
      case "last" => s"max_by($v, $ts)"
      case p if p.startsWith("p") && p.drop(1).forall(_.isDigit) =>
        val d = p.drop(1)
        pctR6(d.toDouble / math.pow(10, d.length))
      case other => sys.error(s"no SQL mirror for aggregator $other")
    }
  }

  /** Truncating long-path result (reference runLong): avg is exact
    * long-sum / count truncated toward zero; every other aggregator
    * runs over the long contributions and truncates its result. */
  private def longAggSql(name: String, lv: String, ts: String): String =
    name match {
      case "avg" => s"CAST(CAST(sum($lv) / count($lv) AS BIGINT) AS DOUBLE)"
      case other =>
        s"CAST(CAST(${aggSql(other, s"CAST($lv AS DOUBLE)", ts)} " +
          "AS BIGINT) AS DOUBLE)"
    }

  /** Reference glob → Java regex; fuzz patterns are [a-z0-9*] so no
    * quoting is needed (the engine quotes; same matches on this
    * alphabet). */
  private def glob(pat: String): String =
    pat.split("\\*", -1).mkString(".*")

  private def filterSql(f: TagFilter): String = f match {
    case LiteralOr(k, vs, ci, _) =>
      if (ci) s"lower(tag_$k) IN (${vs.map(v => s"'${v.toLowerCase}'").mkString(",")})"
      else s"tag_$k IN (${vs.map(v => s"'$v'").mkString(",")})"
    case NotLiteralOr(k, vs, ci, _) =>
      val in =
        if (ci) s"lower(tag_$k) IN (${vs.map(v => s"'${v.toLowerCase}'").mkString(",")})"
        else s"tag_$k IN (${vs.map(v => s"'$v'").mkString(",")})"
      s"(tag_$k IS NULL OR NOT ($in))"
    case Wildcard(k, pat, ci, _) =>
      if (pat == "*") s"tag_$k IS NOT NULL"
      else if (ci) s"lower(tag_$k) RLIKE '^${glob(pat.toLowerCase)}$$'"
      else s"tag_$k RLIKE '^${glob(pat)}$$'"
    case RegexpFilter(k, re, _) => s"tag_$k RLIKE '$re'"
    case NotKey(k) => s"tag_$k IS NULL"
    case GroupByAll(k) => s"tag_$k IS NOT NULL"
    case other => sys.error(s"no SQL mirror for filter $other")
  }

  /** Render the full pipeline for one config as a single SQL query. */
  private def renderSql(c: Cfg): String = {
    val keys = TagFilters.groupByKeys(c.filters)
    val g = ("metric" +: keys.map(k => s"tag_$k")).mkString(", ")
    val needsNeighbors = c.rate.isDefined ||
      Interpolate.policyOf(c.agg) == Interpolate.Lerp
    val pad = math.max(
      c.ds.map(d => math.max(d.intervalMs, 1L)).getOrElse(0L),
      if (needsNeighbors) Engine.RATE_LERP_PAD_MS else 0L)
    val fcond = c.filters.map(filterSql).map(f => s" AND $f").mkString

    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    val dualSel = if (c.hasDual) ", value_l, is_int" else ""
    ctes += s"""scan AS (
      SELECT sid, metric, tag_host, tag_dc, ts, value$dualSel
      FROM ${c.view}
      WHERE metric = 'fm' AND ts >= ${c.startMs - pad}
        AND ts <= ${c.endMs + pad}$fcond)"""
    var prev = "scan"

    c.ds.foreach { spec =>
      val ivl = spec.intervalMs
      ctes += s"""ds0 AS (
        SELECT sid, metric, tag_host, tag_dc, ts - ts % $ivl AS ts,
          ${aggSql(spec.aggregator, "value", "ts")} AS value
        FROM $prev
        GROUP BY sid, metric, tag_host, tag_dc, ts - ts % $ivl)"""
      prev = "ds0"
      if (spec.fill != FillPolicy.None) {
        val fv = spec.fill match {
          case FillPolicy.Zero => "CAST(0.0 AS DOUBLE)"
          case FillPolicy.NaN => NAN
          case FillPolicy.Null => "CAST(NULL AS DOUBLE)"
          case FillPolicy.Scalar(x) => s"CAST($x AS DOUBLE)"
          case FillPolicy.None => "NULL"
        }
        val alo = c.startMs - c.startMs % ivl
        val ahi = (c.endMs - 1) - ((c.endMs - 1) % ivl)
        ctes += s"""dsg AS (
          SELECT sid, metric, tag_host, tag_dc,
            explode(sequence(${alo}L, ${ahi}L, ${ivl}L)) AS ts
          FROM (SELECT DISTINCT sid, metric, tag_host, tag_dc FROM ds0))"""
        ctes += s"""dsf AS (
          SELECT g.sid, g.metric, g.tag_host, g.tag_dc, g.ts,
            coalesce(d.value, $fv) AS value
          FROM dsg g LEFT JOIN ds0 d ON g.sid = d.sid AND g.ts = d.ts)"""
        prev = "dsf"
      }
    }

    c.rate.foreach { o =>
      ctes += s"""r0 AS (
        SELECT sid, metric, tag_host, tag_dc, ts, value,
          lag(value) OVER (PARTITION BY sid ORDER BY ts) AS pv,
          lag(ts) OVER (PARTITION BY sid ORDER BY ts) AS pt
        FROM $prev)"""
      ctes += s"""r1 AS (
        SELECT *, (value - pv) AS delta,
          CASE WHEN (ts - pt) != 0
            THEN CAST(ts - pt AS DOUBLE) / 1000.0 END AS dtsec
        FROM r0)"""
      val rexpr = if (!o.counter) "delta / dtsec" else {
        val rolled =
          s"(CAST(${o.counterMax} AS DOUBLE) - pv + value) / dtsec"
        val r = s"(CASE WHEN delta < 0 THEN $rolled " +
          "ELSE delta / dtsec END)"
        if (o.resetValue > 0)
          s"(CASE WHEN $r > ${o.resetValue} THEN 0.0 ELSE $r END)"
        else r
      }
      val drop = if (o.dropResets) "(delta >= 0 OR delta IS NULL) AND "
        else ""
      ctes += s"""rt AS (
        SELECT sid, metric, tag_host, tag_dc, ts, $rexpr AS value
        FROM r1 WHERE $drop($rexpr) IS NOT NULL)"""
      prev = "rt"
    }

    val policy = Interpolate.policyOf(c.agg) match {
      case Interpolate.Lerp if c.rate.isDefined => Interpolate.Prev
      case p => p
    }
    val clip = s"ts >= ${c.startMs} AND ts <= ${c.endMs}"
    val body =
      if (policy == Interpolate.Zim || policy == Interpolate.Ignore)
        // zero-fill cannot change a sum and nulls are skipped by
        // min/max — the engine short-circuits, and so does the oracle
        s"""SELECT $g, ts, ${aggSql(c.agg, "value", "ts")} AS value
           FROM $prev WHERE $clip GROUP BY $g, ts"""
      else {
        val onG = ("metric" +: keys.map(k => s"tag_$k"))
          .map(k => s"g1.$k = g2.$k").mkString(" AND ")
        val slG = ("metric" +: keys.map(k => s"tag_$k"))
          .map(k => s"sl.$k").mkString(", ")
        val dualJ = if (c.hasDual) ", p.value_l, p.is_int" else ""
        val stFields = "'ts', ts, 'value', value" +
          (if (c.hasDual) ", 'vl', value_l, 'ii', is_int" else "")
        ctes += s"""g1 AS (SELECT DISTINCT $g, ts FROM $prev)"""
        ctes += s"""g2 AS (SELECT DISTINCT $g, sid FROM $prev)"""
        ctes += s"""sl AS (SELECT g1.*, g2.sid FROM g1 JOIN g2 ON $onG)"""
        ctes += s"""jn AS (
          SELECT $slG, sl.ts, sl.sid, p.value$dualJ
          FROM sl LEFT JOIN $prev p
            ON sl.sid = p.sid AND sl.ts = p.ts)"""
        ctes += s"""w AS (
          SELECT *,
            last(CASE WHEN value IS NOT NULL
                THEN named_struct($stFields) END, true)
              OVER (PARTITION BY sid ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pp,
            first(CASE WHEN value IS NOT NULL
                THEN named_struct($stFields) END, true)
              OVER (PARTITION BY sid ORDER BY ts
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
          FROM jn)"""
        val fillD = policy match {
          case Interpolate.Lerp =>
            "pp.value + CAST(ts - pp.ts AS DOUBLE) * " +
              "(np.value - pp.value) / CAST(np.ts - pp.ts AS DOUBLE)"
          case _ => "pp.value"
        }
        val ivalCol = s"""CASE WHEN value IS NOT NULL THEN value
            WHEN pp IS NOT NULL AND np IS NOT NULL THEN $fillD
          END AS ival"""
        if (!c.hasDual) {
          ctes += s"""iv AS (SELECT $g, ts, $ivalCol FROM w)"""
          s"""SELECT $g, ts, ${aggSql(c.agg, "ival", "ts")} AS value
             FROM iv WHERE $clip GROUP BY $g, ts"""
        } else {
          // long path: integer lerp with truncating division; one
          // float contribution at a timestamp demotes it to doubles
          val lerpL = "pp.vl + ((ts - pp.ts) * (np.vl - pp.vl)) " +
            "DIV (np.ts - pp.ts)"
          val pint = "(coalesce(pp.ii, false) AND pp.vl IS NOT NULL)"
          val nint = "(coalesce(np.ii, false) AND np.vl IS NOT NULL)"
          val both = "pp.ts IS NOT NULL AND np.ts IS NOT NULL"
          val (lv, ifl) = policy match {
            case Interpolate.Lerp => (
              s"""CASE WHEN value IS NOT NULL THEN value_l
                  WHEN $both THEN $lerpL
                  ELSE CAST(NULL AS BIGINT) END""",
              s"""CASE WHEN value IS NOT NULL
                    THEN (is_int AND value_l IS NOT NULL)
                  WHEN $both
                    THEN ($pint AND $nint AND ($lerpL) IS NOT NULL)
                  ELSE CAST(NULL AS BOOLEAN) END""")
            case _ => (
              s"""CASE WHEN value IS NOT NULL THEN value_l
                  WHEN $both THEN pp.vl
                  ELSE CAST(NULL AS BIGINT) END""",
              s"""CASE WHEN value IS NOT NULL
                    THEN (is_int AND value_l IS NOT NULL)
                  WHEN $both THEN $pint
                  ELSE CAST(NULL AS BOOLEAN) END""")
          }
          ctes += s"""iv AS (
            SELECT $g, ts, $ivalCol, $lv AS lval, $ifl AS iflag FROM w)"""
          s"""SELECT $g, ts,
               CASE WHEN bool_and(iflag)
                 THEN ${longAggSql(c.agg, "lval", "ts")}
                 ELSE ${aggSql(c.agg, "ival", "ts")} END AS value
             FROM iv WHERE $clip GROUP BY $g, ts"""
        }
      }
    s"WITH ${ctes.mkString(",\n")}\n$body"
  }

  // ---- compare --------------------------------------------------------

  private def approxEq(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <=
        1e-8 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def collect(df: DataFrame,
                      keys: Seq[String]): Map[String, Double] =
    df.collect().map { r =>
      val k = (Seq(r.getAs[String]("metric")) ++
        keys.map(t => String.valueOf(r.getAs[Any](s"tag_$t"))) :+
        r.getAs[Long]("ts").toString).mkString("|")
      val v = r.getAs[Any]("value") match {
        case null => Double.NaN
        case n: Number => n.doubleValue()
      }
      k -> v
    }.toMap

  private def check(c: Cfg): Option[String] = {
    val keys = TagFilters.groupByKeys(c.filters)
    val sub = SubQuery(c.agg, "fm", filters = c.filters,
      downsample = c.ds, rate = c.rate)
    val eng = collect(
      Engine.run(datasets(c.view)._1,
        TsQuery(c.startMs, c.endMs, Seq(sub)), sub), keys)
    val orc = collect(spark.sql(renderSql(c)), keys)
    if (eng.keySet != orc.keySet) {
      val miss = (orc.keySet -- eng.keySet).take(3)
      val extra = (eng.keySet -- orc.keySet).take(3)
      Some(s"$c: key sets differ (engine ${eng.size} vs oracle " +
        s"${orc.size}; missing=$miss extra=$extra)")
    } else {
      val bad = eng.keys.filterNot(k => approxEq(eng(k), orc(k)))
      if (bad.isEmpty) None
      else Some(s"$c: ${bad.size} value mismatches, e.g. " +
        bad.take(3).map(k => s"$k engine=${eng(k)} oracle=${orc(k)}")
          .mkString("; "))
    }
  }

  private def runBatch(seed: Int, n: Int): Unit = {
    val rnd = new Random(seed)
    val fails = (0 until n).flatMap(i => check(drawCfg(rnd, i)))
    assert(fails.isEmpty, s"\n${fails.mkString("\n")}")
  }

  test("fuzz batch 1: 30 random query configs vs SQL oracle") {
    runBatch(0xA11CE, 30)
  }
  test("fuzz batch 2: 30 random query configs vs SQL oracle") {
    runBatch(0xB0B, 30)
  }
  test("fuzz batch 3: 30 random query configs vs SQL oracle") {
    runBatch(0xCAFE, 30)
  }
  test("fuzz batch 4: 30 random query configs vs SQL oracle") {
    runBatch(0xD00D, 30)
  }
}
