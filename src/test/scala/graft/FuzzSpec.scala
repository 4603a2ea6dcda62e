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
abstract class FuzzSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  protected val T0 = 1356998400000L // 2013-01-01T00:00:00Z
  protected val NAN = "CAST('NaN' AS DOUBLE)"

  // ---- datasets -------------------------------------------------------

  /** 5 series over a 40-slot 10s grid with ~28% dropout; `jitter` adds
    * per-point sub-slot offsets (misaligned stamps force lerp), `style`
    * types the values: f = floats (eighths, exact in binary), i = longs
    * (signed, exercising truncation toward zero), m = mixed per series
    * (demotes the long path only where float series contribute). */
  protected def genRows(seed: Int, jitter: Boolean,
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
  protected def mkDataset(name: String, seed: Int, jitter: Boolean,
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

  protected lazy val datasets: Map[String, (DataFrame, Boolean)] = Map(
    // name -> (engine df, typed: value_l/is_int carry information)
    "fz_af" -> (mkDataset("fz_af", 101, jitter = false, "f"), false),
    "fz_jf" -> (mkDataset("fz_jf", 102, jitter = true,  "f"), false),
    "fz_ai" -> (mkDataset("fz_ai", 103, jitter = false, "i"), true),
    "fz_ji" -> (mkDataset("fz_ji", 104, jitter = true,  "i"), true),
    "fz_jm" -> (mkDataset("fz_jm", 105, jitter = true,  "m"), true))

  // ---- config drawing -------------------------------------------------

  protected case class Cfg(id: Int, view: String, agg: String,
                         ds: Option[DownsampleSpec],
                         rate: Option[RateOptions],
                         filters: Seq[TagFilter],
                         startMs: Long, endMs: Long,
                         emitFlag: Boolean = false,
                         rowClip: Boolean = false) {
    def typed: Boolean = datasets(view)._2
    def hasDual: Boolean = typed && ds.isEmpty && rate.isEmpty
    override def toString: String =
      s"cfg#$id[$view ${ds.map(_.spec + ":").getOrElse("")}" +
        s"${rate.map(o => s"rate{${o.counter},${o.counterMax}," +
          s"${o.resetValue},${o.dropResets}}:").getOrElse("")}$agg " +
        s"filters=$filters range=[$startMs,$endMs]" +
        s"${if (emitFlag) " +oi" else ""}${if (rowClip) " +rowClip" else ""}]"
  }

  protected val crossAggs = Seq("sum", "avg", "min", "max", "dev", "count",
    "median", "zimsum", "pfsum", "mimmin", "mimmax", "p50", "p90")
  protected val dsAggs = Seq("sum", "avg", "min", "max", "count",
    "first", "last")

  protected def pick[A](rnd: Random, xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

  protected def drawCfg(rnd: Random, id: Int): Cfg = {
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
    // round-10 axes: the exactIntDps flag (typed, undownsampled,
    // unrated configs — where the dual path is live) and the
    // storage-row compat clip (meaningful only without downsample)
    val c0 = Cfg(id, view, agg, ds, rate, filter.toSeq ++ group.toSeq,
      start, end)
    c0.copy(
      emitFlag = c0.hasDual && rnd.nextDouble() < 0.5,
      rowClip = ds.isEmpty && rnd.nextDouble() < 0.3)
  }

  // ---- SQL renderer (independent transcription) ----------------------

  /** Mirror of the aggregator registry's double-path semantics (NaN
    * inputs skipped; empty group yields NaN, count yields 0). */
  protected def aggSql(name: String, v: String, ts: String): String = {
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
  protected def longAggSql(name: String, lv: String, ts: String): String =
    name match {
      case "avg" => s"CAST(CAST(sum($lv) / count($lv) AS BIGINT) AS DOUBLE)"
      case other =>
        s"CAST(CAST(${aggSql(other, s"CAST($lv AS DOUBLE)", ts)} " +
          "AS BIGINT) AS DOUBLE)"
    }

  /** Reference glob → Java regex; fuzz patterns are [a-z0-9*] so no
    * quoting is needed (the engine quotes; same matches on this
    * alphabet). */
  protected def glob(pat: String): String =
    pat.split("\\*", -1).mkString(".*")

  protected def filterSql(f: TagFilter): String = f match {
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
  protected def renderSql(c: Cfg): String = {
    val keys = TagFilters.groupByKeys(c.filters)
    val g = ("metric" +: keys.map(k => s"tag_$k")).mkString(", ")
    val needsNeighbors = c.rate.isDefined ||
      Interpolate.policyOf(c.agg) == Interpolate.Lerp
    val pad = math.max(
      c.ds.map(d => math.max(d.intervalMs, 1L)).getOrElse(0L),
      if (needsNeighbors) Engine.RATE_LERP_PAD_MS else 0L)
    val fcond = c.filters.map(filterSql).map(f => s" AND $f").mkString
    // rowClip widens the output bounds to the enclosing 1h storage
    // rows (scan floor / EXCLUSIVE next-hour stop row, Engine.run)
    val (clipLo, clipHi) =
      if (c.rowClip && c.ds.isEmpty) {
        val loSec = (c.startMs / 1000L) / 3600L * 3600L
        val endSec = c.endMs / 1000L
        (loSec * 1000L, (endSec + (3600L - endSec % 3600L)) * 1000L - 1L)
      } else (c.startMs, c.endMs)

    val ctes = scala.collection.mutable.ArrayBuffer[String]()
    val dualSel = if (c.hasDual) ", value_l, is_int" else ""
    ctes += s"""scan AS (
      SELECT sid, metric, tag_host, tag_dc, ts, value$dualSel
      FROM ${c.view}
      WHERE metric = 'fm' AND ts >= ${clipLo - pad}
        AND ts <= ${clipHi + pad}$fcond)"""
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
    val clip = s"ts >= $clipLo AND ts <= $clipHi"
    // exactIntDps mirror: the per-timestamp long-path flag, then the
    // GROUP-wide demotion (one float series demotes every dp —
    // AggregationIterator.isInteger) — computed over the PADDED
    // aggregation output, windowed BEFORE the range clip, exactly as
    // the engine demotes inside Interpolate.aggregate and clips after
    def withOi(aggBody: String, oi0: String): String = {
      ctes += s"""agg0 AS (
        SELECT $g, ts, $aggBody AS value, $oi0 AS oi0
        FROM $prev GROUP BY $g, ts)"""
      ctes += s"""agg1 AS (
        SELECT *, bool_and(oi0) OVER (PARTITION BY $g) AS out_int
        FROM agg0)"""
      s"SELECT $g, ts, value, out_int FROM agg1 WHERE $clip"
    }
    val body =
      if (policy == Interpolate.Zim || policy == Interpolate.Ignore) {
        // zero-fill cannot change a sum and nulls are skipped by
        // min/max — the engine short-circuits, and so does the oracle
        if (c.emitFlag)
          withOi(aggSql(c.agg, "value", "ts"),
            "coalesce(bool_and(coalesce(is_int AND value_l IS NOT NULL," +
              " false)), false)")
        else
          s"""SELECT $g, ts, ${aggSql(c.agg, "value", "ts")} AS value
             FROM $prev WHERE $clip GROUP BY $g, ts"""
      }
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
          val valueExpr =
            s"""CASE WHEN bool_and(iflag)
                 THEN ${longAggSql(c.agg, "lval", "ts")}
                 ELSE ${aggSql(c.agg, "ival", "ts")} END"""
          if (c.emitFlag) {
            prev = "iv"
            withOi(valueExpr, "coalesce(bool_and(iflag), false)")
          } else
            s"""SELECT $g, ts, $valueExpr AS value
               FROM iv WHERE $clip GROUP BY $g, ts"""
        }
      }
    s"WITH ${ctes.mkString(",\n")}\n$body"
  }

  // ---- compare --------------------------------------------------------

  protected def approxEq(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <=
        1e-8 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  protected def collect(df: DataFrame, keys: Seq[String],
                      withOi: Boolean = false): Map[String, Double] =
    df.collect().flatMap { r =>
      val k = (Seq(r.getAs[String]("metric")) ++
        keys.map(t => String.valueOf(r.getAs[Any](s"tag_$t"))) :+
        r.getAs[Long]("ts").toString).mkString("|")
      val v = r.getAs[Any]("value") match {
        case null => Double.NaN
        case n: Number => n.doubleValue()
      }
      val oi =
        if (!withOi) Seq.empty
        else Seq(s"$k|oi" ->
          (if (r.getAs[Boolean]("out_int")) 1.0 else 0.0))
      (k -> v) +: oi
    }.toMap

  protected def check(c: Cfg): Option[String] = {
    val keys = TagFilters.groupByKeys(c.filters)
    val sub = SubQuery(c.agg, "fm", filters = c.filters,
      downsample = c.ds, rate = c.rate)
    val eng = collect(
      Engine.run(datasets(c.view)._1,
        TsQuery(c.startMs, c.endMs, Seq(sub)), sub,
        emitTypeFlag = c.emitFlag, rowClip = c.rowClip),
      keys, withOi = c.emitFlag)
    val orc = collect(spark.sql(renderSql(c)), keys, withOi = c.emitFlag)
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

  protected def runBatch(seed: Int, n: Int): Unit = {
    val rnd = new Random(seed)
    val cfgs = (0 until n).map(i => drawCfg(rnd, i))
    // the round-10 axes must actually fire in every batch
    assert(cfgs.exists(_.emitFlag), "no config drew exactIntDps")
    assert(cfgs.exists(_.rowClip), "no config drew rowClip")
    // ...and rowClip must be OBSERVABLE: a start off the hour boundary
    // widens the scan, so the clipped key set must differ for at least
    // one drawn config (guards against both sides ignoring the flag)
    val rc = cfgs.filter(c => c.rowClip && c.startMs % 3600000L != 0)
    if (rc.nonEmpty) {
      val c = rc.head
      val sub = SubQuery(c.agg, "fm", filters = c.filters,
        downsample = c.ds, rate = c.rate)
      val q = TsQuery(c.startMs, c.endMs, Seq(sub))
      val on = Engine.run(datasets(c.view)._1, q, sub, rowClip = true)
        .count()
      val off = Engine.run(datasets(c.view)._1, q, sub).count()
      assert(on > off, s"rowClip had no observable effect on $c")
    }
    val fails = cfgs.flatMap(check)
    assert(fails.isEmpty, s"\n${fails.mkString("\n")}")
  }


  // ---- round-10 axis: calendar downsampling under random tz/count ----

  /** Independent driver-side reimplementation of the reference's
    * DateTime.previousInterval (base calendar boundary + count-unit
    * stepping, src/utils/DateTime.java:450-611) in java.time,
    * cross-checking Downsample.bucket's Column formulation. Week
    * counts are ignored (reference interval_override = 7); week start
    * is Monday, pinned by the q36 golden. */
  protected def calOracle(tsMs: Long, unit: Char, count: Int,
                        tz: String): Long = {
    import java.time._
    import java.time.temporal.{ChronoUnit, TemporalAdjusters}
    val zone = ZoneId.of(tz)
    val zdt = Instant.ofEpochMilli(tsMs).atZone(zone)
    def ms(z: ZonedDateTime): Long = z.toInstant.toEpochMilli
    def day(z: ZonedDateTime): ZonedDateTime =
      z.toLocalDate.atStartOfDay(zone)
    def monthStart: ZonedDateTime =
      zdt.toLocalDate.withDayOfMonth(1).atStartOfDay(zone)
    def yearDate: LocalDate = zdt.toLocalDate.withDayOfYear(1)
    def step(base: ZonedDateTime, stepMs: Long): Long = {
      val b = ms(base)
      b + (tsMs - b) / stepMs * stepMs
    }
    unit match {
      case 's' =>
        if (60 % count == 0)
          step(zdt.truncatedTo(ChronoUnit.MINUTES), count * 1000L)
        else step(zdt.truncatedTo(ChronoUnit.HOURS), count * 1000L)
      case 'm' =>
        if (60 % count == 0)
          step(zdt.truncatedTo(ChronoUnit.HOURS), count * 60000L)
        else step(day(zdt), count * 60000L)
      case 'h' =>
        if (24 % count == 0) step(day(zdt), count * 3600000L)
        else step(monthStart, count * 3600000L)
      case 'd' =>
        if (count == 1) ms(day(zdt))
        else {
          val off = (zdt.toLocalDate.toEpochDay - yearDate.toEpochDay) /
            count * count
          ms(yearDate.plusDays(off).atStartOfDay(zone))
        }
      case 'w' => ms(zdt.toLocalDate
        .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        .atStartOfDay(zone))
      case 'n' =>
        if (count == 1) ms(monthStart)
        else ms(LocalDate.of(zdt.getYear,
          (zdt.getMonthValue - 1) / count * count + 1, 1)
          .atStartOfDay(zone))
      case 'y' => ms(yearDate.atStartOfDay(zone))
    }
  }


  // ---- round-10 axis: rollup routing with randomly-missing
  // aggregation-id series --------------------------------------------

  /** A 1m rollup of the typed dataset with per-aggregation-id columns
    * independently and deterministically knocked out (the reference
    * stores each aggregation id as its own cell — a never-written
    * "max" series must contribute nothing to a max query, and avg
    * requires the sum/count PAIR). Registered as a temp view so the
    * engine and the SQL oracle read the SAME corruption. */
  protected lazy val corruptedRollup: DataFrame = {
    val base = Rollups.materialize(datasets("fz_ai")._1, 60000L)
    def knock(c: String, salt: Int) =
      when(pmod(hash(col("series_id"), col("ts"), lit(salt)), lit(10)) < 3,
        lit(null)).otherwise(col(c)).as(c)
    val r = base.select(col("metric"), col("tags"), col("series_id"),
      col("ts"), knock("sum", 1), knock("count", 2), knock("min", 3),
      knock("max", 4))
    r.select(col("metric"), col("ts"), col("sum"), col("count"),
        col("min"), col("max"),
        col("tags").getItem("host").as("tag_host"),
        col("tags").getItem("dc").as("tag_dc"),
        concat_ws("|", col("tags").getItem("host"),
          col("tags").getItem("dc")).as("sid"))
      .createOrReplaceTempView("fz_rollup")
    r
  }

  protected def checkRollup(rnd: Random, id: Int): Option[String] = {
    val ivl = pick(rnd, Seq(60L, 120L, 300L, 600L)) * 1000L
    val dsAgg = pick(rnd, Seq("sum", "avg", "count", "min", "max"))
    val crossAgg = pick(rnd, Seq("zimsum", "mimmin", "mimmax"))
    val group: Seq[TagFilter] = rnd.nextInt(3) match {
      case 0 => Seq.empty
      case 1 => Seq(GroupByAll("host"))
      case 2 => Seq(GroupByAll("dc"))
    }
    val start = T0 + rnd.nextInt(10) * 10000L
    val end = start + (10 + rnd.nextInt(30)) * 10000L
    // horizon: unlimited, or a mid-range split exercising the stitch
    val horizon = if (rnd.nextBoolean()) Long.MaxValue
      else start + rnd.nextInt(20) * 10000L
    val spec = DownsampleSpec.parse(s"${ivl / 1000}s-$dsAgg")
    val sub = SubQuery(crossAgg, "fm", filters = group,
      downsample = Some(spec))
    val keys = TagFilters.groupByKeys(group)
    val eng = collect(Engine.run(datasets("fz_ai")._1,
      TsQuery(start, end, Seq(sub)), sub,
      rollups = Seq(Engine.RollupTable(60000L, corruptedRollup, horizon))),
      keys)
    // oracle: rollup rows (same corrupted view) strictly below the
    // bucket-aligned horizon, fresh raw at/after it; each aggregation
    // id reads ITS stored column and a null column row does not exist
    // for the query (avg needs the pair)
    val g = ("metric" +: keys.map(k => s"tag_$k")).mkString(", ")
    val fcond = group.map(filterSql).map(f => s" AND $f").mkString
    val hz = if (horizon == Long.MaxValue) Long.MaxValue
      else horizon - horizon % ivl
    val need = dsAgg match {
      case "avg" => "sum IS NOT NULL AND count IS NOT NULL"
      case "sum" => "sum IS NOT NULL"
      case "count" => "count IS NOT NULL"
      case "min" => "min IS NOT NULL"
      case "max" => "max IS NOT NULL"
    }
    val rAgg = dsAgg match {
      case "avg" => "sum(sum) / sum(count)"
      case "sum" => "sum(sum)"
      case "count" => "CAST(sum(count) AS DOUBLE)"
      case "min" => "min(min)"
      case "max" => "max(max)"
    }
    val hzRoll = if (hz == Long.MaxValue) "" else s" AND ts < ${hz}L"
    val fresh = if (hz == Long.MaxValue) ""
      else s"""UNION ALL
        SELECT sid, metric, tag_host, tag_dc, ts - ts % $ivl AS ts,
          ${aggSql(dsAgg, "value", "ts")} AS value
        FROM fz_ai
        WHERE metric = 'fm' AND ts >= GREATEST(${start - ivl}L, ${hz}L)
          AND ts <= ${end + ivl}L$fcond
        GROUP BY sid, metric, tag_host, tag_dc, ts - ts % $ivl"""
    val sql = s"""WITH ds0 AS (
        SELECT sid, metric, tag_host, tag_dc, ts - ts % $ivl AS ts,
          $rAgg AS value
        FROM fz_rollup
        WHERE metric = 'fm' AND $need AND ts >= ${start - ivl}L
          AND ts <= ${end + ivl}L$fcond$hzRoll
        GROUP BY sid, metric, tag_host, tag_dc, ts - ts % $ivl
        $fresh)
      SELECT $g, ts, ${aggSql(crossAgg, "value", "ts")} AS value
      FROM ds0 WHERE ts >= ${start}L AND ts <= ${end}L GROUP BY $g, ts"""
    val orc = collect(spark.sql(sql), keys)
    val label = s"rollup#$id[${ivl / 1000}s-$dsAgg:$crossAgg " +
      s"group=$group range=[$start,$end] hz=$horizon]"
    if (eng.keySet != orc.keySet)
      Some(s"$label: key sets differ (engine ${eng.size} vs " +
        s"oracle ${orc.size})")
    else {
      val bad = eng.keys.filterNot(k => approxEq(eng(k), orc(k)))
      if (bad.isEmpty) None
      else Some(s"$label: ${bad.size} mismatches, e.g. " +
        bad.take(3).map(k => s"$k engine=${eng(k)} oracle=${orc(k)}")
          .mkString("; "))
    }
  }


  // ---- expression-join fuzz ---------------------------------------------
  // Random variable sets through ExpressionJoin.union/intersection vs a
  // from-scratch Scala transcription of the reference algorithm
  // (UnionIterator.computeUnion / IntersectionIterator.computeIntersection
  // + flattenTags + the lock-step grid), sharing no code with the
  // operator. Axes: operator × useQueryTags × includeAggTags × variable
  // count × per-variable queryTagKs × series tag/agg shapes (incl. empty
  // tags and flat-key collisions) × missing points × fill policies.

  protected case class FSeries(tags: Map[String, String],
                             aggTags: Seq[String], points: Map[Long, Double])
  protected case class FVar(name: String, series: Seq[FSeries],
                          queryTagKs: Set[String], tsFill: Double)

  protected val ET0 = 1431561600000L

  protected def drawExpCfg(rnd: Random)
      : (Seq[FVar], String, Boolean, Boolean) = {
    val keys = Seq("D", "E", "Z")
    val nVars = 1 + rnd.nextInt(3)
    val vars = (0 until nVars).map { vi =>
      val nSeries = rnd.nextInt(5) // 0 = an empty variable
      val series = (0 until nSeries).map { _ =>
        val tagKeys = keys.filter(_ => rnd.nextDouble() < 0.7)
        val tags = tagKeys.map(k => k -> s"v${rnd.nextInt(3)}").toMap
        val agg = keys.filterNot(tags.contains).filter(_ => rnd.nextBoolean())
        val pts = (0 until 4).filter(_ => rnd.nextDouble() < 0.75)
          .map(i => (ET0 + i * 60000L) -> (rnd.nextInt(100) + 1).toDouble)
          .toMap
        FSeries(tags, agg, pts)
      }
        // the engine invariant: one series per result identity (a
        // SpanGroup per group key) and a series exists iff it has rows
        .filter(_.points.nonEmpty)
        .groupBy(_.tags).map(_._2.head).toSeq
      val qks = keys.filter(_ => rnd.nextBoolean()).toSet
      val fill = pick(rnd, Seq(0.0, -1.0, Double.NaN))
      FVar(s"v$vi", series, qks, fill)
    }
    (vars, if (rnd.nextBoolean()) "union" else "intersection",
      rnd.nextBoolean(), rnd.nextBoolean())
  }

  /** flattenTags (UnionIterator.java:259-309): empty result tags →
    * empty key before any flag applies; else query-tag-filtered pairs,
    * then agg tag keys when included. */
  protected def expFlatKey(s: FSeries, qks: Set[String],
                         uqt: Boolean, iat: Boolean): String = {
    if (s.tags.isEmpty) return ""
    val pairs = (if (uqt) s.tags.filter(p => qks.contains(p._1))
                 else s.tags).toSeq.sortBy(_._1)
    pairs.map(p => "\u0001" + p._1 + "\u0000" + p._2).mkString +
      (if (iat) s.aggTags.sorted.map("\u0002" + _).mkString else "")
  }

  /** Spark's array<struct<string,string>> ordering over sorted tag
    * entries — the documented deterministic winner rule. */
  protected def cmpEntries(a: Seq[(String, String)],
                         b: Seq[(String, String)]): Int = {
    val n = math.min(a.size, b.size)
    var i = 0
    while (i < n) {
      val c1 = a(i)._1.compareTo(b(i)._1)
      if (c1 != 0) return c1
      val c2 = a(i)._2.compareTo(b(i)._2)
      if (c2 != 0) return c2
      i += 1
    }
    a.size - b.size
  }

  /** The from-scratch oracle: per-variable winner maps, key set, grid,
    * slot values and per-series meta. Left(msg) when the reference
    * would throw at intersection construction. */
  protected def oracleJoin(vars: Seq[FVar], op: String, uqt: Boolean,
                         iat: Boolean)
      : Either[String, (Map[(String, Long), Seq[Double]],
                        Map[String, (Map[String, String], Seq[String])])] = {
    val perVar: Seq[Map[String, FSeries]] = vars.map { v =>
      v.series.groupBy(s => expFlatKey(s, v.queryTagKs, uqt, iat))
        .map { case (k, ss) =>
          // winner = max (tag entries, agg-tag keys) identity
          val win = ss.maxBy(s => (s.tags.toSeq.sortBy(_._1),
            s.aggTags))(Ordering.Tuple2(
            Ordering.fromLessThan((x: Seq[(String, String)],
                                   y: Seq[(String, String)]) =>
              cmpEntries(x, y) < 0),
            Ordering.Implicits.seqOrdering[Seq, String]))
          // series with IDENTICAL full identity (equal tags AND agg
          // tags — possible for nested outputs whose meta is the
          // empty fill_dp) merge POINTWISE-max: the frame carries no
          // series id to keep one wholesale, a documented
          // deterministic divergence from the reference's arbitrary
          // last-in-ByteMap survivor
          val winSet = ss.filter(s =>
            s.tags == win.tags && s.aggTags == win.aggTags)
          k -> (if (winSet.size == 1) win
            else FSeries(win.tags, win.aggTags,
              winSet.flatMap(_.points.keys).distinct.map(t =>
                t -> winSet.flatMap(_.points.get(t)).max).toMap))
        }
    }
    val expectThrow = op == "intersection" && {
      val total = perVar.flatMap(_.keySet).distinct.size
      val hits = if (perVar.isEmpty) 0
        else perVar.map(_.keySet).reduce(_ intersect _).size
      total > 0 && hits == 0
    }
    if (expectThrow) return Left("No intersections found")
    val keys =
      if (op == "intersection") {
        if (perVar.forall(_.isEmpty)) Set.empty[String]
        else perVar.map(_.keySet).reduce(_ intersect _)
      } else perVar.flatMap(_.keySet).toSet
    val grid = perVar.flatMap(pv => keys.toSeq.flatMap(k =>
      pv.get(k).toSeq.flatMap(_.points.keys))).distinct.sorted
    val rows: Map[(String, Long), Seq[Double]] =
      (for (k <- keys.toSeq; t <- grid) yield (k, t) ->
        vars.zip(perVar).map { case (v, pv) =>
          pv.get(k) match {
            case None => 0.0 // union missingSeriesFill default
            case Some(s) => s.points.getOrElse(t, v.tsFill)
          }
        }).toMap
    val meta: Map[String, (Map[String, String], Seq[String])] =
      keys.map { k =>
        val mtags = perVar.head.get(k).map(_.tags)
          .getOrElse(Map.empty[String, String])
        val at = perVar.flatMap(_.get(k)).flatMap(_.aggTags)
          .distinct.sorted
        k -> (mtags, at)
      }.toMap
    Right((rows, meta))
  }

  protected def varSetsOf(vars: Seq[FVar]): Seq[ExpressionJoin.VarSet] = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("tags", MapType(StringType, StringType)),
      StructField("agg_tags", ArrayType(StringType)),
      StructField("ts", LongType), StructField("value", DoubleType)))
    vars.map { v =>
      val rows = v.series.flatMap(s => s.points.toSeq.map { case (t, x) =>
        Row(s.tags, s.aggTags, java.lang.Long.valueOf(t),
          java.lang.Double.valueOf(x))
      })
      ExpressionJoin.VarSet(v.name,
        spark.createDataFrame(rows.asJava, schema),
        queryTagKs = v.queryTagKs, tsFill = v.tsFill)
    }
  }

  protected def eqv(a: Seq[Double], b: Seq[Double]): Boolean =
    a.size == b.size && a.zip(b).forall { case (x, y) =>
      (x.isNaN && y.isNaN) || x == y }

  protected def compareJoin(cfgStr: String,
                          actual: Either[IllegalArgumentException,
                                         Array[org.apache.spark.sql.Row]],
                          vars: Seq[FVar], op: String, uqt: Boolean,
                          iat: Boolean): Option[String] =
    (oracleJoin(vars, op, uqt, iat), actual) match {
      case (Left(_), Left(_)) => None
      case (Left(_), Right(_)) => Some(s"$cfgStr: expected throw, got rows")
      case (Right(_), Left(e)) =>
        Some(s"$cfgStr: unexpected ${e.getMessage}")
      case (Right((expRows, expMeta)), Right(rows)) =>
        val gotRows = rows.map { r =>
          (r.getAs[String]("__skey"), r.getAs[Long]("ts")) ->
            vars.map(v => r.getAs[Double](s"__v_${v.name}"))
        }.toMap
        val gotMeta = rows.map { r =>
          r.getAs[String]("__skey") ->
            (r.getAs[Map[String, String]]("__mtags").toMap,
              r.getAs[scala.collection.Seq[String]]("__aggtags").toSeq)
        }.toMap
        if (gotRows.keySet != expRows.keySet)
          Some(s"$cfgStr: slots ${gotRows.keySet.size} vs " +
            s"${expRows.keySet.size} expected")
        else expRows.collectFirst {
          case (k, v) if !eqv(gotRows(k), v) =>
            s"$cfgStr: $k got ${gotRows(k)} want $v"
        }.orElse(expMeta.collectFirst {
          case (k, m) if gotMeta(k) != m =>
            s"$cfgStr: meta $k got ${gotMeta(k)} want $m"
        })
    }

  protected def checkExpJoin(rnd: Random, id: Int): Option[String] = {
    val (vars, op, uqt, iat) = drawExpCfg(rnd)
    val sets = varSetsOf(vars)
    val cfgStr = s"cfg#$id op=$op uqt=$uqt iat=$iat " +
      vars.map(v => s"${v.name}(qks=${v.queryTagKs.toSeq.sorted
        .mkString("")},fill=${v.tsFill},series=${v.series.size})")
        .mkString(" ")
    def run(ss: Seq[ExpressionJoin.VarSet], o: String, u: Boolean,
            i: Boolean) =
      try Right(
        (if (o == "intersection") ExpressionJoin.intersection("f", ss, u, i)
         else ExpressionJoin.union("f", ss, u, i)).collect())
      catch { case e: IllegalArgumentException => Left(e) }
    val inner = compareJoin(cfgStr, run(sets, op, uqt, iat),
      vars, op, uqt, iat)
    if (inner.isDefined) return inner

    // ---- nested phase: the expression's output feeds an OUTER join
    // as a variable whose identity is the merged EDP meta (__mtags or
    // empty, merged __aggtags) — exactly what Engine.runExpJson feeds
    // back for referenced expressions. Value = sum of the variables.
    oracleJoin(vars, op, uqt, iat) match {
      case Left(_) => None // inner threw consistently; nothing to nest
      case Right((expRows, expMeta)) if expRows.nonEmpty =>
        val grid = expRows.keys.map(_._2).toSeq.distinct.sorted
        val nestedSeries = expMeta.keys.toSeq.map { k =>
          FSeries(expMeta(k)._1, expMeta(k)._2,
            grid.map(t => t -> expRows((k, t)).sum).toMap)
        }
        val qks2 = vars.flatMap(_.queryTagKs).toSet
        val f2 = pick(rnd, Seq(0.0, -2.0))
        val (ouqt, oiat) = (rnd.nextBoolean(), rnd.nextBoolean())
        val outerVars = Seq(FVar("e", nestedSeries, qks2, f2))
        // actual: joined frame -> sum value -> nested VarSet, as the
        // engine builds it
        val joined =
          if (op == "intersection")
            ExpressionJoin.intersection("f", sets, uqt, iat)
          else ExpressionJoin.union("f", sets, uqt, iat)
        val valueCol = vars.map(v => col(s"__v_${v.name}"))
          .reduce(_ + _)
        val nestedDf = joined.select(col("__mtags").as("tags"),
          col("__aggtags").as("agg_tags"), col("ts"),
          valueCol.as("value"))
        val nestedSets = Seq(ExpressionJoin.VarSet("e", nestedDf,
          queryTagKs = qks2, tsFill = f2))
        compareJoin(s"$cfgStr NESTED(uqt=$ouqt,iat=$oiat)",
          run(nestedSets, "union", ouqt, oiat),
          outerVars, "union", ouqt, oiat)
      case _ => None
    }
  }


  // ---- round-12 axis: lookup pair grammar + /api/query/last ---------
  //
  // Random series corpora and random TimeSeriesLookup pair grammars /
  // LastPointSpecs vs an independent SQL transcription of the
  // reference's doc rules (TimeSeriesLookup.java:49-80; TSUIDQuery
  // meta-vs-scan split). The SQL reads exploded (sid, k, v) tag rows —
  // a different data layout than the engine's map column, so the
  // combination rules must be independently re-derived to agree.
  // (Mutation-checked: off-by-one-hour oracle window → 3 failures;
  // bare-tagv OR weakened to AND → 4 failures.)

  /** Series set registered as temp views (fz_lk_series / fz_lk_tags /
    * fz_lk_pts for the SQL oracle, fz_lk_raw for the engine); sid is
    * metric + canonical sorted-tag rendering, shared by engine row →
    * sid mapping and the SQL oracle. */
  protected lazy val lookupCorpus: Seq[(String, Map[String, String])] = {
    val rnd = new Random(0x100C)
    val metrics = Seq("m1", "m2", "m3")
    val keys = Seq("host", "dc", "rack")
    val vals = Seq("a", "b", "web01", "lga")
    val series = (0 until 24).map { _ =>
      val m = pick(rnd, metrics)
      val nk = 1 + rnd.nextInt(3)
      val tags = rnd.shuffle(keys).take(nk)
        .map(k => k -> pick(rnd, vals)).toMap
      (m, tags)
    }.distinct
    val spark0 = spark
    import spark0.implicits._
    series.map { case (m, t) => (sidOf(m, t), m) }
      .toDF("sid", "metric").createOrReplaceTempView("fz_lk_series")
    series.flatMap { case (m, t) =>
      t.map { case (k, v) => (sidOf(m, t), k, v) } }
      .toDF("sid", "k", "v").createOrReplaceTempView("fz_lk_tags")
    // points: unique hour-spread timestamps per series (no ts ties →
    // a deterministic arg_max oracle), integer/double mixed
    val base = 1356998400000L
    val ptRows = series.zipWithIndex.flatMap { case ((m, t), si) =>
      (0 until 2 + rnd.nextInt(4)).map { pi =>
        val ts = base + rnd.nextInt(72) * 3600000L + pi * 60000L + si * 7000L
        val isInt = rnd.nextBoolean()
        val v = if (isInt) rnd.nextInt(100).toDouble
          else rnd.nextInt(1000) / 8.0
        (sidOf(m, t), m, t, ts, v, isInt)
      }
    }
    ptRows.map { case (sid, _, _, ts, v, i) => (sid, ts, v, i) }
      .toDF("sid", "ts", "v", "is_int")
      .createOrReplaceTempView("fz_lk_pts")
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(ptRows.map { case (_, m, t, ts, v, i) =>
      Row(m, ts, v, if (i) java.lang.Long.valueOf(v.toLong) else null,
        i, t)
    }.toList.asJava, Points.schema).createOrReplaceTempView("fz_lk_raw")
    series
  }

  protected def sidOf(m: String, tags: Map[String, String]): String =
    m + "|" + tags.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString(",")

  protected def checkLookup(rnd: Random, id: Int): Option[String] = {
    lookupCorpus
    val metric = pick(rnd, Seq("", "m1", "m2", "m3", "nope"))
    val keys = Seq("host", "dc", "rack")
    val vals = Seq("a", "b", "web01", "lga", "nope")
    val pairs = (0 until rnd.nextInt(4)).map { _ =>
      rnd.nextInt(3) match {
        case 0 => (pick(rnd, keys), "")              // bare tagk
        case 1 => ("", pick(rnd, vals))              // bare tagv
        case _ => (pick(rnd, keys), pick(rnd, vals)) // exact pair
      }
    }
    val got = graft.meta.Introspect.lookupPairs(
        spark.table("fz_lk_raw"), metric, pairs)
      .select("metric", "tags").collect()
      .map(r => sidOf(r.getString(0), r.getAs[Map[String, String]]("tags")))
      .toSet
    fuzzHits += got.size
    // independent SQL over the exploded layout, straight from the doc:
    // bare tagks AND (overriding pairs on the same key), remaining
    // pairs AND, bare tagvs OR among themselves AND'd with the rest
    val bareKs = pairs.collect { case (k, "") if k.nonEmpty => k }.distinct
    val kvs = pairs.filter { case (k, v) =>
      k.nonEmpty && v.nonEmpty && !bareKs.contains(k) }.distinct
    val bareVs = pairs.collect { case ("", v) => v }.distinct
    val conds = Seq(
      if (metric.isEmpty) None else Some(s"s.metric = '$metric'"),
      if (bareVs.isEmpty) None
      else Some(s"""EXISTS(SELECT 1 FROM fz_lk_tags t
        WHERE t.sid = s.sid AND t.v IN (${
          bareVs.map("'" + _ + "'").mkString(",")}))""")).flatten ++
      bareKs.map(k => s"""EXISTS(SELECT 1 FROM fz_lk_tags t
        WHERE t.sid = s.sid AND t.k = '$k')""") ++
      kvs.map { case (k, v) => s"""EXISTS(SELECT 1 FROM fz_lk_tags t
        WHERE t.sid = s.sid AND t.k = '$k' AND t.v = '$v')""" }
    val where = if (conds.isEmpty) "true" else conds.mkString(" AND ")
    val want = spark.sql(
        s"SELECT sid FROM fz_lk_series s WHERE $where")
      .collect().map(_.getString(0)).toSet
    if (got == want) None
    else Some(s"lookup#$id metric=$metric pairs=$pairs: " +
      s"engine=${got.size} oracle=${want.size} " +
      s"diff=${(got diff want) ++ (want diff got)}")
  }

  protected def checkLast(rnd: Random, id: Int): Option[String] = {
    val series = lookupCorpus
    val (m, tags) = pick(rnd, series)
    val metaEnabled = rnd.nextBoolean()
    val backScan = pick(rnd, Seq(0, 0, 1, 3, 24, 80))
    val scanPath = backScan > 0 || !metaEnabled
    // address by: full tags / subset / none — subset+scan finds nothing
    val qtags = rnd.nextInt(3) match {
      case 0 => tags
      case 1 => tags.take(1)
      case _ => Map.empty[String, String]
    }
    if (scanPath && qtags.isEmpty) return None // error path, unit-tested
    val base = 1356998400000L
    // half the draws pin `now` to a window EDGE around a real point of
    // the addressed series (the ManyBackscanInRange/OutOfRange
    // boundary: found at backScan hour rows back, missed at one fewer)
    // so the hour-row arithmetic is probed tightly, not just sampled
    val now =
      if (rnd.nextBoolean())
        base + rnd.nextInt(80) * 3600000L + rnd.nextInt(3600000)
      else {
        val ptTs = spark.sql(
            s"""SELECT p.ts FROM fz_lk_pts p
               WHERE p.sid = '${sidOf(m, tags)}'
               ORDER BY p.ts LIMIT 1""")
          .head.getLong(0)
        ptTs / 3600000L * 3600000L +
          (backScan + rnd.nextInt(3) - 1) * 3600000L + rnd.nextInt(3600000)
      }
    val useStored = !scanPath && rnd.nextBoolean()
    val raw = spark.table("fz_lk_raw")
    val got = graft.meta.Introspect.queryLast(raw,
        Seq(graft.meta.Introspect.LastPointSpec(m, qtags)),
        backScan = backScan, resolve = true, now = now,
        lastMeta = if (useStored)
          Some(graft.meta.Introspect.lastWriteMeta(raw)) else None,
        metaEnabled = metaEnabled)
      .select("metric", "tags", "timestamp", "value").collect()
      .map(r => sidOf(r.getString(0),
          r.getAs[Map[String, String]]("tags")) ->
        (r.getLong(2), r.getString(3).toDouble))
      .toMap
    fuzzHits += got.size
    // oracle: SUBSET match on the meta path, EXACT tag set + hour-row
    // window [base − backScan h, base + 1h) on the scan path
    val subsetCond = qtags.map { case (k, v) =>
      s"""EXISTS(SELECT 1 FROM fz_lk_tags t
        WHERE t.sid = s.sid AND t.k = '$k' AND t.v = '$v')""" }
    val exactCond =
      if (!scanPath) Nil
      else Seq(s"""(SELECT count(*) FROM fz_lk_tags t
        WHERE t.sid = s.sid) = ${qtags.size}""")
    val nowBase = now / 3600000L * 3600000L
    val range =
      if (!scanPath) "true"
      else s"p.ts >= ${nowBase - backScan * 3600000L} AND " +
        s"p.ts < ${nowBase + 3600000L}"
    val where = (Seq(s"s.metric = '$m'", range) ++ subsetCond ++
      exactCond).mkString(" AND ")
    val want = spark.sql(
        s"""SELECT s.sid, max(p.ts), max_by(p.v, p.ts)
           FROM fz_lk_series s JOIN fz_lk_pts p ON p.sid = s.sid
           WHERE $where GROUP BY s.sid""")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    if (got == want) None
    else Some(s"last#$id m=$m qtags=$qtags backScan=$backScan " +
      s"metaEnabled=$metaEnabled stored=$useStored now=$now: " +
      s"engine=$got oracle=$want")
  }

  protected var fuzzHits = 0


  // ---- gexp surface fuzz (VERDICT r13: the r12 surface without an
  // axis): random nested trees round-trip through the grammar and the
  // URI form, and the per-function param contracts are drawn against
  // an INDEPENDENT transcription of the reference's evaluate guards
  // (Scale.java:39-55, MovingAverage.java:47-175, HighestCurrent/
  // HighestMax.java:48-72, TimeShift.java:39-108, SumSeries.java:47-51
  // and siblings) — expected messages are DATA here, never computed by
  // the code under test. --------------------------------------------

  protected def renderGexp(n: Gexp.Node): String = n match {
    case Gexp.MetricNode(spec) => spec
    case Gexp.FuncNode(name, args, params) =>
      name + "(" + (args.map(renderGexp) ++ params).mkString(",,") + ")"
  }

  protected def drawGexpTree(rnd: Random, depth: Int): Gexp.Node = {
    def leaf() = Gexp.MetricNode(
      pick(rnd, Seq("sum", "zimsum", "max")) + ":" +
        pick(rnd, Seq("click", "view", "signup")) + "{user=*}")
    if (depth == 0 || rnd.nextInt(3) == 0) leaf()
    else pick(rnd, Seq[() => Gexp.Node](
      () => Gexp.FuncNode("absolute", Seq(drawGexpTree(rnd, depth - 1)), Nil),
      () => Gexp.FuncNode("firstDiff", Seq(drawGexpTree(rnd, depth - 1)), Nil),
      () => Gexp.FuncNode("scale", Seq(drawGexpTree(rnd, depth - 1)),
        Seq(pick(rnd, Seq("2", "0.5", "-3", "1.25")))),
      () => Gexp.FuncNode("alias", Seq(drawGexpTree(rnd, depth - 1)),
        Seq(pick(rnd, Seq("renamed", "user.@user.v", "a b")))),
      () => Gexp.FuncNode("movingAverage", Seq(drawGexpTree(rnd, depth - 1)),
        Seq(pick(rnd, Seq("5", "'10min'", "'2h'", "'1day'", "'30sec'")))),
      () => Gexp.FuncNode(pick(rnd, Seq("highestCurrent", "highestMax")),
        Seq(drawGexpTree(rnd, depth - 1)),
        Seq(pick(rnd, Seq("1", "2", "7")))),
      () => Gexp.FuncNode("timeShift", Seq(drawGexpTree(rnd, depth - 1)),
        Seq(pick(rnd, Seq("'1hr'", "'2min'", "'1week'", "'10sec'")))),
      () => Gexp.FuncNode(
        pick(rnd, Seq("sumSeries", "difference", "multiplySeries",
          "divideSeries")),
        (0 until 2 + rnd.nextInt(2)).map(_ => drawGexpTree(rnd, depth - 1)),
        Nil)))()
  }

  protected def checkGexpRoundTrip(rnd: Random, id: Int): Option[String] = {
    val t = drawGexpTree(rnd, 1 + rnd.nextInt(2)) match {
      case m: Gexp.MetricNode => Gexp.FuncNode("absolute", Seq(m), Nil)
      case f => f
    }
    val rendered = renderGexp(t)
    val reparsed = Gexp.parse(rendered)
    if (reparsed != t)
      return Some(s"[$id] round-trip: $rendered -> $reparsed != $t")
    // the URI form splices each distinct metric leaf into the TSQuery
    def leaves(n: Gexp.Node): Seq[String] = n match {
      case Gexp.MetricNode(spec) => Seq(spec)
      case Gexp.FuncNode(_, args, _) => args.flatMap(leaves)
    }
    val (q, _, exps) = QueryParser.parseUriGexp(
      "?start=1425440315306&end=1425440436006&exp=" +
        java.net.URLEncoder.encode(rendered, "UTF-8"), T0)
    if (exps != Seq(t))
      return Some(s"[$id] URI parse: $rendered -> ${exps.head} != $t")
    val want = leaves(t).distinct.map(QueryParser.parseSubQuery)
    if (q.queries != want)
      return Some(s"[$id] URI subs: ${q.queries} != $want")
    None
  }

  /** (function, rendered params, expected error message or None=ok) —
    * the reference contracts transcribed as data. `missing` renders
    * the function with NO param list entry at all. */
  protected val gexpParamContract: Seq[(String, Option[String], Option[String])] = Seq(
    ("scale", Some("2"), None),
    ("scale", Some("2.5"), None),
    ("scale", Some("-1.5"), None),
    ("scale", None, Some("Missing scaling factor")),
    ("scale", Some("abc"), Some("Unparseable scale factor value: 0.0")),
    ("scale", Some("1a"), Some("Unparseable scale factor value: 0.0")),
    ("scale", Some("--2"),
      Some("Invalid parameter, must be an integer or floating point")),
    ("scale", Some("1.2.3"),
      Some("Invalid parameter, must be an integer or floating point")),
    ("movingAverage", Some("5"), None),
    ("movingAverage", Some("'10min'"), None),
    ("movingAverage", Some("'2h'"), None),
    ("movingAverage", Some("'1day'"), None),
    ("movingAverage", Some("'30sec'"), None),
    ("movingAverage", Some("'3hr'"), None),
    ("movingAverage", None, Some("Missing moving average window size")),
    ("movingAverage", Some("0"),
      Some("Moving average window must be an integer greater than zero")),
    ("movingAverage", Some("'0m'"),
      Some("Moving average window must be an integer greater than zero")),
    ("movingAverage", Some("xx"), Some("Unparseable window size: xx")),
    ("movingAverage", Some("'10xyz'"),
      Some("Unknown time unit=xyz in window='10xyz'")),
    ("movingAverage", Some("'min'"),
      Some("Invalid moving window parameter: 'min'")),
    ("highestCurrent", Some("2"), None),
    ("highestMax", Some("1"), None),
    ("highestCurrent", None,
      Some("Need aggregation window for moving average")),
    ("highestMax", Some(""),
      Some("Missing top n value (number of series to return)")),
    ("highestCurrent", Some("abc"), Some("Unparseable top n value: abc")),
    ("highestMax", Some("0"),
      Some("Top n value must be greater than zero: 0")),
    ("highestCurrent", Some("-1"), Some("Unparseable top n value: -1")),
    ("timeShift", Some("'1hr'"), None),
    ("timeShift", Some("'2min'"), None),
    ("timeShift", Some("'1week'"), None),
    ("timeShift", Some("'3day'"), None),
    ("timeShift", Some("'10sec'"), None),
    ("timeShift", None,
      Some("Need amount of timeshift to perform timeshift")),
    ("timeShift", Some("1hr"),
      Some("Invalid timeshift parameter: eg '10min'")),
    ("timeShift", Some("'1xyz'"), Some("unknown time unit=xyz")),
    ("timeShift", Some("'0min'"), Some("timeshift <= 0")),
    ("timeShift", Some("'xmin'"), Some("Invalid Parameter: 'xmin")))

  protected lazy val gexpTinyDf: DataFrame = {
    import spark.implicits._
    Seq(("click", "1", T0, 1.0), ("click", "1", T0 + 60000L, -2.0),
      ("click", "2", T0, 3.0), ("view", "1", T0, 4.0))
      .toDF("metric", "tag_user", "ts", "value")
  }

  protected def checkGexpParam(fn: String, param: Option[String],
                             expect: Option[String]): Option[String] = {
    val rendered = fn + "(sum:click{user=*}" +
      param.map(",," + _).getOrElse("") + ")"
    val got =
      try { Gexp.eval(Gexp.parse(rendered), _ => gexpTinyDf); None }
      catch { case e: Throwable => Some(e.getMessage) }
    if (got != expect) Some(s"$rendered: got $got want $expect") else None
  }


  // ---- URL canonicalization fuzz (t31) -------------------------------

  /** Independent driver-side transcription of the canonicalUrl
    * contract: plain string walking, no regexes shared with the
    * engine implementation. */
  protected def canonRef(url: String): String = {
    val noFrag = url.takeWhile(_ != '#')
    val schemeEnd = url.indexOf("://")
    val scheme = url.substring(0, schemeEnd).toLowerCase
    val rest = url.substring(schemeEnd + 3)
    val hostEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
      match { case -1 => rest.length; case i => i }
    val hostport = rest.substring(0, hostEnd).toLowerCase
    val colon = hostport.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && hostport.drop(colon + 1).forall(_.isDigit))
        (hostport.take(colon), hostport.drop(colon + 1))
      else (hostport, "")
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443")
    val portPart = if (port.isEmpty || defaultPort) "" else ":" + port
    val afterHost = rest.drop(hostEnd)
    val rawPath = afterHost.takeWhile(c => c != '?' && c != '#')
    val collapsed = rawPath.foldLeft(new StringBuilder) { (sb, c) =>
      if (c == '/' && sb.nonEmpty && sb.last == '/') sb else sb.append(c)
    }.toString
    val strippedP = collapsed.reverse.dropWhile(_ == '/').reverse
    val path = if (strippedP.isEmpty) "/" else strippedP
    val qIdx = noFrag.indexOf('?')
    val qstr = if (qIdx < 0) "" else noFrag.drop(qIdx + 1)
    def tracked(p: String): Boolean = {
      val key = p.takeWhile(_ != '=')
      key == "gclid" || key == "fbclid" || key.startsWith("utm_")
    }
    val params = qstr.split("&", -1).toSeq
      .filter(p => p.nonEmpty && !tracked(p)).sorted
    val qs = params.mkString("&")
    scheme + "://" + host + portPart + path +
      (if (qs.isEmpty) "" else "?" + qs)
  }

  protected def drawUrl(rnd: Random): String = {
    def pickS(xs: String*) = xs(rnd.nextInt(xs.size))
    def mixCase(s: String) = s.map(c =>
      if (rnd.nextBoolean()) c.toUpper else c)
    val scheme = pickS("http", "https", "HTTP", "HTTPS", "HttpS")
    val labels = (1 to 1 + rnd.nextInt(3)).map(_ =>
      mixCase(pickS("alpha", "bravo9", "x", "data7")))
    val suffix = rnd.nextInt(3) match {
      case 0 => Seq(pickS("com", "org", "io"))
      case 1 => Seq(pickS("co", "ac"), pickS("uk", "jp"))
      case _ => Seq()
    }
    val host = mixCase((labels ++ suffix).mkString("."))
    val port = pickS("", ":80", ":443", ":8080", ":9")
    val path = (0 to rnd.nextInt(3)).map(_ =>
      "/" * (1 + rnd.nextInt(3)) + mixCase(pickS("Docs", "a", "B2", "")))
      .mkString + "/" * rnd.nextInt(3)
    val qp = (0 until rnd.nextInt(5)).map(_ => pickS(
      "a=1", "B=2", "a=1", "z", "k=", "utm_source=f", "utm_=x",
      "gclid=1", "gclid", "gclidx=1", "fbclid=2", ""))
    val query = if (qp.isEmpty && rnd.nextBoolean()) ""
      else "?" + qp.mkString("&")
    val frag = pickS("", "#sec", "#a?b=1")
    s"$scheme://$host$port$path$query$frag"
  }

  // ---- HTML extraction fuzz (t30) ------------------------------------

  /** Independent driver-side transcription of the htmlExtract
    * contract: indexOf-based scanning, no regexes. Models the regex
    * chain's semantics pass for pass: lazy comment/script/style
    * block removal (an element with no valid close stays for the
    * generic tag pass), generic `<...>` strip (a stray `<` swallows
    * up to the NEXT `>` wherever it is), entity decode with `&amp;`
    * last, and single-space collapse of the explicit class. */
  protected def htmlRef(html: String): String = {
    def dropBlocks(s: String, openTok: String,
                   closeTok: String): String = {
      val sb = new StringBuilder(s)
      var from = 0
      var done = false
      while (!done) {
        val low = sb.toString.toLowerCase
        val i = low.indexOf(openTok, from)
        if (i < 0) done = true
        else {
          val after = i + openTok.length
          val boundaryOk = after >= low.length ||
            !(low(after).isLetterOrDigit || low(after) == '_')
          if (!boundaryOk) { from = after }
          else {
            val openEnd = low.indexOf('>', after)
            if (openEnd < 0) done = true // no open tag end -> no match
            else {
              // first VALID close: closeTok + [ \t\n\r]* + '>'
              var c = low.indexOf(closeTok, openEnd + 1)
              var closeEnd = -1
              while (c >= 0 && closeEnd < 0) {
                var j = c + closeTok.length
                while (j < low.length && " \t\n\r".indexOf(low(j)) >= 0) j += 1
                if (j < low.length && low(j) == '>') closeEnd = j
                else c = low.indexOf(closeTok, c + 1)
              }
              if (closeEnd < 0) done = true // lazy body finds no close
              else { sb.replace(i, closeEnd + 1, " "); from = i + 1 }
            }
          }
        }
      }
      sb.toString
    }
    def dropComments(s: String): String = {
      val sb = new StringBuilder(s)
      var from = 0
      var done = false
      while (!done) {
        val i = sb.indexOf("<!--", from)
        val j = if (i < 0) -1 else sb.indexOf("-->", i + 4)
        if (i < 0 || j < 0) done = true
        else { sb.replace(i, j + 3, " "); from = i + 1 }
      }
      sb.toString
    }
    def dropTags(s: String): String = {
      val sb = new StringBuilder(s)
      var from = 0
      var done = false
      while (!done) {
        val i = sb.indexOf("<", from)
        val j = if (i < 0) -1 else sb.indexOf(">", i + 1)
        if (i < 0 || j < 0) done = true
        else { sb.replace(i, j + 1, " "); from = i + 1 }
      }
      sb.toString
    }
    var s = dropTags(dropBlocks(dropBlocks(dropComments(html),
      "<script", "</script"), "<style", "</style"))
    for ((e, r) <- Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ",
        "&amp;" -> "&"))
      s = s.replace(e, r)
    val collapsed = s.foldLeft(new StringBuilder) { (sb, c) =>
      val ws = " \t\n\r\f".indexOf(c) >= 0
      if (ws && sb.nonEmpty && sb.last == ' ') sb
      else sb.append(if (ws) ' ' else c)
    }.toString
    collapsed.stripPrefix(" ").stripSuffix(" ")
  }

  protected def drawHtml(rnd: Random): String = {
    def pickS(xs: String*) = xs(rnd.nextInt(xs.size))
    val bits = (0 until 4 + rnd.nextInt(8)).map { _ =>
      rnd.nextInt(10) match {
        case 0 => pickS("<p>", "<div class=\"x\">", "<br/>", "</div>",
          "<ScRiPtS>")                       // fake: \b fails on ScRiPtS
        case 1 => pickS("<!-- c -->", "<!-- multi\nline -->", "<!--")
        case 2 => pickS(
          "<script>if(1<2 && a>0){s=\"<b>\";}</script>",
          "<SCRIPT a=1>x</ScRiPt \n>",
          "<script>no close here",            // unterminated block
          "<script></scriptx></script>")      // invalid then valid close
        case 3 => pickS("<style>p{a:1}</style>", "<STYLE>x</style\t>",
          "<style>open")
        case 4 => pickS("&amp;", "&amp;lt;", "&lt;tag&gt;", "&nbsp;",
          "&#39;", "&quot;")
        case 5 => pickS("< stray", "stray >", "a < b")
        case _ => pickS("alpha", "Beta9", "text text", "x\ty",
          "line\nbreak")
      }
    }
    bits.mkString(pickS(" ", "", "\n"))
  }




  protected def pslFuzzRound(
      rules: Seq[graft.pipeline.TextAnalysis.PslRule]): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.pipeline.TextAnalysis
    // driver-side PSL from scratch: exceptions beat everything, else
    // the longest matching rule (wildcards count one label longer) is
    // the public suffix, regdom = suffix + 1 label, host == suffix →
    // null, no rule → the heuristic
    def heurRef(host: String): String = {
      val l = host.split("\\."); val n = l.length
      if (n >= 3 && Set("co", "com", "net", "org", "gov", "ac",
          "edu")(l(n - 2)) && l(n - 1).length == 2)
        l.takeRight(3).mkString(".")
      else if (n >= 2) l.takeRight(2).mkString(".")
      else host
    }
    def pslRef(host: String): String = {
      val l = host.split("\\."); val n = l.length
      def tail(k: Int) = l.takeRight(k).mkString(".")
      def lbl(s: String) = s.count(_ == '.') + 1
      val exc = rules.filter(_.kind == "exception")
        .filter(r => lbl(r.suffix) <= n && tail(lbl(r.suffix)) == r.suffix)
        .sortBy(r => -lbl(r.suffix)).headOption
      exc match {
        case Some(e) => tail(lbl(e.suffix))
        case None =>
          val normLens = rules.filter(_.kind == "rule")
            .filter(r => lbl(r.suffix) <= n &&
              tail(lbl(r.suffix)) == r.suffix).map(r => lbl(r.suffix))
          val wildLens = rules.filter(_.kind == "wildcard")
            .filter(r => lbl(r.suffix) + 1 <= n &&
              tail(lbl(r.suffix)) == r.suffix).map(r => lbl(r.suffix) + 1)
          (normLens ++ wildLens).maxOption match {
            case None => heurRef(host)
            case Some(sl) if n >= sl + 1 => tail(sl + 1)
            case Some(_) => null
          }
      }
    }
    val rnd = new Random(20260816)
    val prefixPool = Seq("www", "a", "b7", "foo", "site", "deep")
    val tails = rules.map(_.suffix) ++
      Seq("www.ck", "x.ck", "zz", "co.zz", "weird.unknown", "localhost")
    val hosts = (1 to 300).map { _ =>
      val prefix = (0 until rnd.nextInt(4))
        .map(_ => prefixPool(rnd.nextInt(prefixPool.size)))
      (prefix :+ tails(rnd.nextInt(tails.size))).mkString(".")
    }.distinct
    val got = TextAnalysis.withRegisteredDomainPsl(
        hosts.toDF("host"), col("host"), rules = rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val errs = hosts.flatMap { h =>
      val want = pslRef(h)
      if (got(h) != want) Seq(s"$h: got ${got(h)} want $want") else Nil
    }
    assert(errs.isEmpty, errs.take(5).mkString("\n"))
  }




}

class FuzzSpec extends FuzzSpecBase {

  test("fuzz batch 1: 30 random query configs vs SQL oracle") {
    runBatch(0xA11CE, 30)
  }

  test("fuzz batch 2: 30 random query configs vs SQL oracle") {
    runBatch(0xB0B, 30)
  }

  test("fuzz calendar buckets: random tz × unit × count vs a java.time " +
       "reimplementation of previousInterval") {
    val rnd = new Random(0x0CA1)
    val zones = Seq("UTC", "America/New_York", "America/Denver",
      "Europe/London", "Asia/Kolkata", "Australia/Sydney")
    val unitCounts = Seq(
      ('s', Seq(10, 23, 30)), ('m', Seq(5, 7, 15, 90)),
      ('h', Seq(2, 5, 6)), ('d', Seq(1, 3)), ('w', Seq(1, 2)),
      ('n', Seq(1, 5)), ('y', Seq(1)))
    val lo = 1325376000000L // 2012-01-01
    val hi = 1451606400000L // 2016-01-01
    val fails = scala.collection.mutable.ArrayBuffer[String]()
    var checked = 0
    for (_ <- 0 until 50) {
      val tz = pick(rnd, zones)
      val (u, counts) = pick(rnd, unitCounts)
      val c = pick(rnd, counts)
      val zone = java.time.ZoneId.of(tz)
      val tss = (0 until 8)
        .map(_ => lo + math.abs(rnd.nextLong()) % (hi - lo))
        .filterNot { t =>
          // skip instants near a zone transition: Spark's
          // to_utc_timestamp and java.time disambiguate overlap hours
          // differently — a JVM-API artifact, not reference semantics
          val i = java.time.Instant.ofEpochMilli(t)
          Seq(Option(zone.getRules.nextTransition(i)),
            Option(zone.getRules.previousTransition(i))).flatten
            .exists(x =>
              math.abs(x.getInstant.toEpochMilli - t) < 5 * 3600000L)
        }
      if (tss.nonEmpty) {
        val spec = DownsampleSpec.parse(s"$c${u}c-sum")
        import spark.implicits._
        val got = tss.toDF("ts")
          .select(Downsample.bucket(col("ts"), spec, 0L, tz).as("b"))
          .collect().map(_.getLong(0))
        tss.zip(got).foreach { case (t, g) =>
          checked += 1
          val e = calOracle(t, u.toString.head, c, tz)
          if (g != e)
            fails += s"tz=$tz unit=$u count=$c ts=$t: engine=$g oracle=$e"
        }
      }
    }
    assert(checked > 200, s"transition filter ate the sample: $checked")
    assert(fails.isEmpty, s"\n${fails.take(10).mkString("\n")}")
  }

  test("fuzz rollup routing: per-aggregation-id absence + horizon " +
       "stitch vs SQL oracle") {
    val rnd = new Random(0x7011)
    val fails = (0 until 25).flatMap(i => checkRollup(rnd, i))
    assert(fails.isEmpty, s"\n${fails.mkString("\n")}")
  }
}

class FuzzBatchBSpec extends FuzzSpecBase {

  test("fuzz batch 3: 30 random query configs vs SQL oracle") {
    runBatch(0xCAFE, 30)
  }

  test("fuzz batch 4: 30 random query configs vs SQL oracle") {
    runBatch(0xD00D, 30)
  }
}

class FuzzJoinSpec extends FuzzSpecBase {

  test("fuzz expression join: random flags × variables × series shapes " +
       "vs a from-scratch flattenTags + lock-step grid oracle, inner " +
       "AND nested (merged-meta identity feedback)") {
    val rnd = new Random(0xE1)
    val fails = (0 until 40).flatMap(i => checkExpJoin(rnd, i))
    assert(fails.isEmpty, s"\n${fails.mkString("\n")}")
  }

  test("fuzz BM25: 20 random tiny corpora vs a from-scratch scalar " +
       "transcription (same fold order, so scores match to 1e-12; " +
       "ranks exact)") {
    import spark.implicits._
    val rnd = new Random(20260818)
    for (trial <- 1 to 20) {
      val vocab = (0 until (3 + rnd.nextInt(8)))
        .map(i => ('a' + i).toChar.toString)
      val nDocs = 4 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        val len = 1 + rnd.nextInt(12)
        (i.toLong,
          (0 until len).map(_ => vocab(rnd.nextInt(vocab.size)))
            .mkString(" "))
      }
      val qText = (0 until 1 + rnd.nextInt(3))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val exclude = rnd.nextBoolean()
      val k = 1 + rnd.nextInt(nDocs)
      val got = graft.pipeline.Similarity.bm25TopK(
          docs.toDF("doc_id", "text"),
          Seq((2L, qText)).toDF("q_id", "q_text"),
          k, excludeSelf = exclude)
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      // scalar transcription: same tokenize rule, BM25 from scratch,
      // per-term contributions summed in sorted term order
      def toks(t: String): Seq[String] =
        t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val tf = docs.map { case (id, t) =>
        id -> toks(t).groupBy(identity).map { case (w, o) => w -> o.size }
      }.toMap
      val dls = docs.map { case (id, t) => id -> toks(t).size }.toMap
      val avgdl = dls.values.sum.toDouble / nDocs
      val dfm = vocab.map(w =>
        w -> docs.count { case (id, _) => tf(id).contains(w) }).toMap
      val qTerms = toks(qText).distinct
      val expected = docs.flatMap { case (id, _) =>
        if (exclude && id == 2L) None
        else {
          val contribs = qTerms
            .filter(t => tf(id).contains(t) && dfm(t) > 0)
            .sorted
            .map { t =>
              val idf = math.log(1.0 + (nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5))
              idf * (tf(id)(t) * (1.2 + 1)) /
                (tf(id)(t) + 1.2 * ((1 - 0.75) + 0.75 * (dls(id) / avgdl)))
            }
          if (contribs.isEmpty) None
          else Some(id -> contribs.foldLeft(0.0)(_ + _))
        }
      }.sortBy { case (id, s) => (-s, id) }.take(k)
      assert(got.length == expected.length,
        s"trial $trial: got ${got.toSeq} expected $expected")
      got.zip(expected).zipWithIndex.foreach {
        case (((gid, gs, grk), (eid, es)), i) =>
          assert(gid == eid && grk == i + 1 && math.abs(gs - es) < 1e-12,
            s"trial $trial rank ${i + 1}: got ($gid, $gs) expected ($eid, $es)")
      }
    }
  }
}

class FuzzRpcSpec extends FuzzSpecBase {

  test("fuzz lookup pair grammar + query/last addressing vs an " +
       "independent SQL transcription over exploded tag rows") {
    val rnd = new Random(0x1A57)
    fuzzHits = 0
    val lookupFails = (0 until 40).flatMap(i => checkLookup(rnd, i))
    val lastFails = (0 until 40).flatMap(i => checkLast(rnd, i))
    assert(lookupFails.isEmpty && lastFails.isEmpty,
      s"\n${(lookupFails ++ lastFails).take(8).mkString("\n")}")
    // non-vacuity: the draws must actually address series, not compare
    // empty sets 80 times
    assert(fuzzHits > 60, s"fuzz axis nearly vacuous: $fuzzHits hits")
  }

  test("fuzz gexp: random nested trees round-trip the grammar and the " +
       "URI form; param contracts vs the transcribed reference guards") {
    val rnd = new Random(20260815)
    val errs = (1 to 40).flatMap(i => checkGexpRoundTrip(rnd, i)) ++
      gexpParamContract.flatMap { case (f, p, e) => checkGexpParam(f, p, e) } ++
      // combiner arity guard (SumSeries.evaluate:47-51, all four)
      checkGexpParam("sumSeries", None,
        Some("Must have 2 to 26 series, got 1 instead")) ++
      checkGexpParam("divideSeries", None,
        Some("Must have 2 to 26 series, got 1 instead"))
    assert(errs.isEmpty, errs.take(5).mkString("\n"))
  }

  test("fuzz HTML extraction: 300 random pages vs an independent " +
       "scanner transcription") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new Random(20260817)
    val pages = (1 to 300).map(_ => drawHtml(rnd))
    val got = pages.toDF("h")
      .select(col("h"),
        graft.pipeline.TextAnalysis.htmlExtract(col("h")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val errs = got.flatMap { case (h, t) =>
      val want = htmlRef(h)
      if (t != want) Seq(s"[$h]: got [$t] want [$want]") else Nil
    }
    assert(errs.isEmpty, errs.take(3).mkString("\n"))
  }

  test("fuzz URL canonicalization: 300 random messy URLs vs an " +
       "independent transcription; canonicalUrl is idempotent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.pipeline.TextAnalysis.canonicalUrl
    val rnd = new Random(20260816)
    val urls = (1 to 300).map(_ => drawUrl(rnd))
    val got = urls.toDF("url")
      .select(col("url"), canonicalUrl(col("url")).as("c"),
        canonicalUrl(canonicalUrl(col("url"))).as("cc"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val errs = got.flatMap { case (u, c, cc) =>
      val want = canonRef(u)
      (if (c != want) Seq(s"$u: got $c want $want") else Nil) ++
        (if (cc != c) Seq(s"$u: not idempotent, $c -> $cc") else Nil)
    }
    assert(errs.isEmpty, errs.take(5).mkString("\n"))
  }

  test("fuzz PSL registered domain: 300 random hosts vs an independent " +
       "string-walking transcription of the PSL algorithm — over the " +
       "curated slice AND the full bundled publicsuffix.org snapshot") {
    import graft.pipeline.TextAnalysis
    for (rules <- Seq(TextAnalysis.defaultPsl, TextAnalysis.fullPsl))
      pslFuzzRound(rules)
  }

  test("fuzz tracked-serve lifecycle: 60 random serve ops (full consume, " +
       "partial-only, abandon+reap, parse-fail) vs a driver-side model " +
       "of the stats ring — every op sequence converges to the model's " +
       "running/completed counts with zero leaked pendingServes") {
    import graft.query.QueryStatsLog
    import scala.jdk.CollectionConverters._
    QueryStatsLog.reset()
    Engine.clearPendingServes()
    // wait until only the model's deliberate pendings remain (the
    // listener bus is async — a full consume's completion lands
    // shortly AFTER count() returns)
    def settle(expectPending: Int): Unit = {
      val deadline = System.nanoTime() + 10000000000L
      while (Engine.pendingServeCount != expectPending &&
          System.nanoTime() < deadline) Thread.sleep(5)
      assert(Engine.pendingServeCount == expectPending,
        s"pending ${Engine.pendingServeCount}, want $expectPending")
    }
    val hb = 1356998400000L // hour-aligned base
    val pts = spark.createDataFrame(Seq(
      Row("cpu", hb, 1.0, java.lang.Long.valueOf(1L), true,
        Map("host" -> "a")),
      Row("cpu", hb + 60000L, 2.0, java.lang.Long.valueOf(2L), true,
        Map("host" -> "a"))).asJava, Points.schema)
    val q = TsQuery(hb - 1000L, hb + 3600000L,
      Seq(QueryParser.parseSubQuery("sum:cpu")))
    val rnd = new Random(20260816)
    val oldTtl = Engine.serveTtlMs
    // model counts
    var mOk = 0      // completed 200
    var mFail = 0    // completed 4xx/5xx (parse fails + reaped abandons)
    var mPending = 0 // consumed partially or not at all, not yet reaped
    try {
      Engine.serveTtlMs = 3600000L // reap only when the op says so
      (1 to 60).foreach { i =>
        rnd.nextInt(4) match {
          case 0 => // full consume → 200
            Engine.serveTracked("f:1", s"m=sum:cpu#$i")(
              Engine.run(pts, q, q.queries.head)).count()
            mOk += 1
          case 1 => // partial-only consume → stays running
            val df = Engine.serveTracked("f:1", s"m=sum:cpu#$i")(
              Engine.run(pts, q, q.queries.head))
            df.limit(1).collect(); df.show(1)
            mPending += 1
          case 2 => // abandoned frame, then an explicit reap → 500
            Engine.serveTracked("f:1", s"m=sum:cpu#$i")(
              Engine.run(pts, q, q.queries.head))
            // completed serves must drain off the listener bus first,
            // or the TTL=0 reap would steal them
            settle(mPending + 1)
            Engine.serveTtlMs = 0L
            Thread.sleep(2)
            // the reap takes THIS abandon plus every accumulated
            // partial/abandoned serve (all are older than 0ms)
            val reaped = Engine.reapExpiredServes()
            Engine.serveTtlMs = 3600000L
            assert(reaped == mPending + 1,
              s"op $i: reaped $reaped, model ${mPending + 1}")
            mFail += mPending + 1
            mPending = 0
          case 3 => // parse failure → immediate 400
            intercept[IllegalArgumentException] {
              Engine.serveTracked("f:1", s"m=bogus#$i")(
                Engine.runM(pts, q, "bogus:cpu"))
            }
            mFail += 1
        }
      }
      settle(mPending)
      if (mPending == 0)
        assert(Engine.awaitTrackedServes(30000),
          "barrier must report done when nothing is pending")
      assert(QueryStatsLog.numRunning == mPending,
        s"running ${QueryStatsLog.numRunning}, model $mPending")
      val doc = QueryStatsLog.getRunningAndCompleteStats(0L)
      val codes = """"code":(\d+)""".r.findAllMatchIn(doc)
        .map(_.group(1).toInt).toSeq
      assert(codes.count(_ == 200) == mOk,
        s"200s ${codes.count(_ == 200)}, model $mOk")
      assert(codes.count(c => c == 400 || c == 500) == mFail,
        s"fails ${codes.count(c => c >= 400)}, model $mFail")
    } finally {
      Engine.serveTtlMs = oldTtl
      Engine.clearPendingServes()
      QueryStatsLog.reset()
    }
  }

  test("fuzz branch addressing under hostile element names: every node " +
       "of a random 2-level tree (names drawing '/', '%', '.', unicode) " +
       "is hex-addressable by its RAW name hashes, docs render raw, " +
       "and no two distinct element tuples share an address") {
    import graft.meta.{TreeDefs, Trees}
    import spark.implicits._
    val rnd = new Random(20260816)
    val alphabet = "ab/%.日"
    def name(): String =
      (1 to (1 + rnd.nextInt(5))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    // 60 random (metric, route) series; names may BE "/" runs entirely.
    // A third constant level keeps (metric, route) nodes BRANCHES, so
    // 2-element hash chains resolve against real stored rows.
    val series0 = (1 to 60).map(_ => (name(), name())).distinct
    val series = series0
      .map { case (m, r) => (m, Map("route" -> r, "k" -> "x")) }
      .toDF("metric", "tags")
      .withColumn("ts", lit(0L)).withColumn("value", lit(1.0))
    val rules = Seq(
      Trees.Rule(1, 0, 0, "METRIC"),
      Trees.Rule(1, 1, 0, "TAGK", field = "route"),
      Trees.Rule(1, 2, 0, "TAGK", field = "k"))
      .foldLeft(Trees.emptyRules(spark))(Trees.upsertRule)
    val (branches, leaves) = Trees.buildBranchStore(series, rules, 1)
    val metrics = series0.map(_._1).distinct
    // depth-1: each metric node browsable by the hash of its WHOLE
    // raw name; children = exactly its routes (raw display names)
    val errs = metrics.flatMap { m =>
      val want = series0.filter(_._1 == m).map(_._2).distinct.sorted
      val got = TreeDefs.browseRows(branches, leaves,
          TreeDefs.branchIdHex(1, Seq(m)))
        .collect().map(_.getString(2)).sorted.toSeq
      if (got != want) Seq(s"[$m]: got $got want $want") else Nil
    }
    assert(errs.isEmpty, errs.take(3).mkString("\n"))
    // no cross-talk: a fabricated 2-element split of a metric that
    // contains "/" must NOT resolve unless that tuple really exists
    val withSlash = metrics.filter(_.contains("/"))
    withSlash.take(10).foreach { m =>
      val cut = m.indexOf('/')
      val (a, b) = (m.substring(0, cut), m.substring(cut + 1))
      val exists = metrics.contains(a) &&
        series0.exists(p => p._1 == a && p._2 == b)
      if (!exists && a.nonEmpty && b.nonEmpty) {
        intercept[NoSuchElementException] {
          TreeDefs.browseRows(branches, leaves,
            TreeDefs.branchIdHex(1, Seq(a, b))).collect()
        }
      }
    }
    // escape round-trip: unescapeElemStr(escape(s)) == s for every name
    val esc = series0.map(_._1).toDF("s")
      .select(col("s"), Trees.escapeElem(col("s")).as("e"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    esc.foreach { case (s, e) =>
      assert(Trees.unescapeElemStr(e) == s, s"round-trip [$s] via [$e]")
      assert(!e.split("/", -1).exists(_.contains("%2F")) || s.contains("/"))
    }
  }

  test("fuzz tree-definition CRUD: 100 random endpoint ops vs a " +
       "driver-side transcription of the fetch-copy-save semantics") {
    import graft.meta.{TreeDefs, Trees}
    import graft.meta.TreeDefs.{TreeDef, TreeStore}
    val rnd = new Random(20260816)
    val NOW = 1388534400L
    // driver-side model: plain maps + a from-scratch restatement of
    // Tree.copyChanges / TreeRule.copyChanges+validateRule (shares no
    // code with TreeDefs beyond the Rule case class as a record)
    var mTrees = Map.empty[Int, TreeDef]
    var mRules = Map.empty[(Int, Int, Int), Trees.Rule]
    var store = TreeStore.empty(spark)
    def word(): String = Seq("", "alpha", "beta", "gamma")(rnd.nextInt(4))
    def mValidate(r: Trees.Rule): Option[String] = {
      if (r.ruleType.isEmpty) Some("Missing rule type")
      else r.ruleType match {
        case "METRIC" => None
        case "TAGK" =>
          if (r.field.isEmpty) Some("Missing field name required for TAGK rule")
          else None
        case t =>
          if (r.field.isEmpty) Some(s"Missing field name required for $t rule")
          else if (r.customField.isEmpty)
            Some(s"Missing custom field name required for $t rule")
          else None
      }
    }
    sealed trait Want
    case object Ok extends Want
    case object NotModified extends Want
    case class Err(cls: String, msg: String) extends Want
    def attempt(want: Want)(run: => TreeDefs.RpcReply): Unit = want match {
      case Ok =>
        val r = run; assert(r.status == 200 || r.status == 204,
          s"expected ok, got ${r.status}")
        store = r.store
      case NotModified =>
        val r = run; assert(r.status == 304, s"expected 304, got ${r.status}")
      case Err(cls, msg) =>
        val e = intercept[Exception](run)
        assert(e.getClass.getSimpleName == cls && e.getMessage == msg,
          s"expected $cls($msg), got ${e.getClass.getSimpleName}(${e.getMessage})")
    }
    for (i <- 1 to 100) {
      rnd.nextInt(10) match {
        case 0 | 1 => // create
          val name = word()
          val desc = word()
          val qs = (if (rnd.nextBoolean()) Map("name" -> name)
            else Map.empty[String, String]) ++
            (if (desc.nonEmpty) Map("description" -> desc) else Map.empty)
          val want =
            if (!qs.contains("name") || name.isEmpty)
              Err("IllegalArgumentException", "Tree was missing the name")
            else Ok
          attempt(want)(TreeDefs.handleTree(store, "POST", qs, now = NOW))
          if (want == Ok) {
            val id = mTrees.keys.maxOption.getOrElse(0) + 1
            mTrees += id -> TreeDef(id, name,
              qs.getOrElse("description", ""), created = NOW)
          }
        case 2 | 3 => // modify POST/PUT
          val t = 1 + rnd.nextInt(5)
          val m = if (rnd.nextBoolean()) "POST" else "PUT"
          val fields = Seq("description" -> word(), "notes" -> word(),
            "strict_match" -> (if (rnd.nextBoolean()) "true" else "false"))
            .filter(_ => rnd.nextBoolean())
          val qs = Map("treeid" -> t.toString) ++ fields.toMap
          val want =
            if (!mTrees.contains(t))
              Err("NoSuchElementException", s"Unable to locate tree: $t")
            else if (fields.isEmpty) NotModified
            else Ok
          attempt(want)(TreeDefs.handleTree(store, m, qs, now = NOW))
          if (want == Ok) {
            val s0 = mTrees(t)
            val f = fields.toMap
            def pick(k: String, cur: String): String =
              if (m == "PUT") f.getOrElse(k, "") else f.getOrElse(k, cur)
            val strict =
              if (f.contains("strict_match")) f("strict_match") == "true"
              else if (m == "PUT") false else s0.strictMatch
            mTrees += t -> s0.copy(
              name = if (m == "PUT") "" else s0.name,
              description = pick("description", s0.description),
              notes = pick("notes", s0.notes),
              strictMatch = strict,
              enabled = if (m == "PUT") false else s0.enabled,
              storeFailures = if (m == "PUT") false else s0.storeFailures)
          }
        case 4 => // delete
          val t = 1 + rnd.nextInt(5)
          val definition = rnd.nextBoolean()
          val qs = Map("treeid" -> t.toString) ++
            (if (definition) Map("definition" -> "true") else Map.empty)
          val want =
            if (!mTrees.contains(t))
              Err("NoSuchElementException", s"Unable to locate tree: $t")
            else Ok
          attempt(want)(TreeDefs.handleTree(store, "DELETE", qs))
          if (want == Ok && definition) {
            mTrees -= t
            mRules = mRules.filterNot(_._1._1 == t)
          }
        case 5 | 6 | 7 => // rule sync POST/PUT
          val t = 1 + rnd.nextInt(5)
          val (level, order) = (rnd.nextInt(3), rnd.nextInt(2))
          val m = if (rnd.nextBoolean()) "POST" else "PUT"
          val typeP = rnd.nextInt(4) match {
            case 0 => None
            case 1 => Some("metric")
            case 2 => Some("tagk")
            case 3 => Some("metric_custom")
          }
          val fieldP = word(); val cfP = word()
          val descP = word(); val notesP = word()
          val qs = Map("treeid" -> t.toString, "level" -> level.toString,
            "order" -> order.toString) ++
            typeP.map("type" -> _).toMap ++
            (if (rnd.nextBoolean()) Map("field" -> fieldP) else Map.empty) ++
            (if (rnd.nextBoolean()) Map("custom_field" -> cfP)
             else Map.empty) ++
            (if (rnd.nextBoolean()) Map("description" -> descP)
             else Map.empty) ++
            (if (rnd.nextBoolean()) Map("notes" -> notesP) else Map.empty)
          // parse-equivalent local rule + changed set (parseRule's
          // setters only flag when the value differs from the default)
          var changed = Set.empty[String]
          if (level != 0) changed += "level"
          if (order != 0) changed += "order"
          typeP.foreach(_ => changed += "type")
          val local = Trees.Rule(t, level, order,
            typeP.map(Trees.stringToType).getOrElse(""),
            field = qs.getOrElse("field", ""),
            customField = qs.getOrElse("custom_field", ""),
            description = qs.getOrElse("description", ""),
            notes = qs.getOrElse("notes", ""))
          if (local.field.nonEmpty) changed += "field"
          if (local.customField.nonEmpty) changed += "custom_field"
          if (local.description.nonEmpty) changed += "description"
          if (local.notes.nonEmpty) changed += "notes"
          val stored = mRules.get((t, level, order))
          val (merged, any) = stored match {
            case None => (local, changed.nonEmpty)
            case Some(s) =>
              var a = false
              def pick(flag: String, sv: String, lv: String): String =
                if (m == "PUT" || (changed(flag) && sv != lv)) {
                  a = true; lv
                } else sv
              val mg = s.copy(
                ruleType = pick("type", s.ruleType, local.ruleType),
                field = pick("field", s.field, local.field),
                customField =
                  pick("custom_field", s.customField, local.customField),
                description =
                  pick("description", s.description, local.description),
                notes = pick("notes", s.notes, local.notes))
              (mg, if (m == "PUT") true else a)
          }
          val want =
            if (!mTrees.contains(t))
              Err("NoSuchElementException", s"Unable to locate tree: $t")
            else if (changed.isEmpty || !any) NotModified
            else mValidate(merged) match {
              case Some(msg) => Err("IllegalArgumentException", msg)
              case None => Ok
            }
          attempt(want)(TreeDefs.handleRule(store, m, qs))
          if (want == Ok) mRules += (t, level, order) -> merged
        case 8 => // rule delete
          val t = 1 + rnd.nextInt(5)
          val (level, order) = (rnd.nextInt(3), rnd.nextInt(2))
          val qs = Map("treeid" -> t.toString, "level" -> level.toString,
            "order" -> order.toString)
          val tag = "[" + t + ":" + level + ":" + order + ":null]"
          val want =
            if (!mTrees.contains(t))
              Err("NoSuchElementException", s"Unable to locate tree: $t")
            else if (!mRules.contains((t, level, order)))
              Err("NoSuchElementException", s"Unable to locate rule: $tag")
            else Ok
          attempt(want)(TreeDefs.handleRule(store, "DELETE", qs))
          if (want == Ok) mRules -= ((t, level, order))
        case 9 => // bulk rules delete
          val t = 1 + rnd.nextInt(5)
          val want =
            if (!mTrees.contains(t))
              Err("NoSuchElementException", s"Unable to locate tree: $t")
            else Ok
          attempt(want)(TreeDefs.handleRules(store, "DELETE",
            Map("treeid" -> t.toString)))
          if (want == Ok) mRules = mRules.filterNot(_._1._1 == t)
      }
      if (i % 25 == 0 || i == 100) {
        val gotTrees = TreeDefs.fetchAllTrees(store.trees)
          .map(t => t.treeId -> t).toMap
        assert(gotTrees == mTrees, s"op $i: trees diverged\n" +
          s"got  $gotTrees\nwant $mTrees")
        import spark.implicits._
        val gotRules = store.rules.as[Trees.Rule].collect()
          .map(r => (r.treeId, r.level, r.order) -> r).toMap
        assert(gotRules == mRules, s"op $i: rules diverged\n" +
          s"got  $gotRules\nwant $mRules")
      }
    }
  }
}
