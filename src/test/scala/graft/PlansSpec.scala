package graft

import graft.model.Points
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Catalyst extension spec: integral-division range predicates must
  * rewrite onto the raw column and reach the parquet scan as
  * PushedFilters, with unchanged results. */
class PlansSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("div-range rewrite is an exact equivalence on all longs") {
    import spark.implicits._
    // exhaustive around the truncation boundaries, negatives included
    val vals = (-25L to 25L) ++ Seq(Long.MaxValue, Long.MinValue + 7)
    val df = vals.toDF("a")
    val k = 7L
    for ((op, b) <- Seq((">=", 2L), (">", 1L), ("<=", 2L), ("<", 3L))) {
      val rewritten = df.filter(expr(s"(a div $k) $op $b")).collect().map(_.getLong(0)).toSet
      val control = vals.filter { a =>
        val t = a / k // Scala / on longs truncates toward zero like div
        op match {
          case ">=" => t >= b
          case ">"  => t > b
          case "<=" => t <= b
          case "<"  => t < b
        }
      }.toSet
      assert(rewritten == control, s"op $op $b")
    }
  }

  test("time filters on derived millis reach the parquet scan") {
    val sfDir = "/root/testdata/sf0.001"
    val df = Points.fromEvents(spark, sfDir)
      .filter(col("ts") >= 1704412800000L && col("ts") < 1705708800000L)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    // events.ts is TIMESTAMP(MICROS): the unix_millis range rewrite must
    // surface as timestamp bounds on the raw column —
    // 1704412800000 ms = 2024-01-05T00:00:00Z and the exclusive upper
    // 1705708800000 ms becomes <= 2024-01-19T23:59:59.999999
    assert(pushed.contains("GreaterThanOrEqual(ts,2024-01-05"),
      s"missing pushed lower bound in: $pushed")
    assert(pushed.contains("LessThanOrEqual(ts,2024-01-19") &&
      pushed.contains("59:59.999999"),
      s"missing pushed upper bound in: $pushed")
  }

  test("queryLast backScan hour-row window pushes to the parquet scan") {
    // the scan path's [base − backScan h, base + 1h) range must reach
    // the scan as pushed timestamp bounds — at 100 TB a backscan poll
    // reads only its hour rows, not the metric's history
    import graft.meta.Introspect
    import graft.meta.Introspect.LastPointSpec
    val p = Points.fromEvents(spark, "/root/testdata/sf0.001")
    val out = Introspect.queryLast(p,
      Seq(LastPointSpec("click", Map("user" -> "1"))),
      backScan = 2, now = 1704420000000L)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    // base 1704420000000 (2024-01-05T02:00Z): lower = base − 2h,
    // upper exclusive = base + 1h → ≤ 02:59:59.999999
    assert(pushed.contains("GreaterThanOrEqual(ts,2024-01-05 00:00"),
      s"missing pushed lower hour-row bound in: $pushed")
    assert(pushed.contains("LessThanOrEqual(ts,2024-01-05 02:59:59"),
      s"missing pushed upper hour-row bound in: $pushed")
  }

  test("date-partitioned layout prunes partitions for narrow time ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("datepart").toString
    val day = 86400000L
    // ten days of points, one per hour
    val pts = (0 until 10).flatMap(d => (0 until 24).map(hr =>
        ("cpu", d * day + hr * 3600000L, (d * 24 + hr).toDouble)))
      .toDF("metric", "ts", "value")
    Points.writeDatePartitioned(pts, dir)
    // a 2-day query must touch only the 2 matching date directories
    val scan = Points.scanDatePartitioned(spark, dir, 3 * day, 5 * day - 1)
    assert(scan.count() == 48)
    val scanExec = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    // the date bounds appear as PARTITION filters (plan-time directory
    // pruning), not just data filters
    assert(scanExec.metadata("PartitionFilters").contains("date"),
      scanExec.metadata("PartitionFilters"))
    // and the scan actually read 2 of the 10 date directories
    assert(scanExec.metrics("numFiles").value <
      spark.read.parquet(dir).inputFiles.length,
      "scan did not prune date partitions")
    assert(scanExec.relation.location
      .listFiles(scanExec.partitionFilters, Nil).length == 2,
      "expected exactly the 2 in-range date partitions")
    // ts clip still exact within the boundary dates
    assert(scan.agg(min(col("ts")), max(col("ts"))).head.toSeq ==
      Seq(3 * day, 3 * day + 47 * 3600000L))
  }

  test("plan hygiene: no cartesian products, global sorts, or unpartitioned windows") {
    // cross-section of the contract: scan, downsample+fill, group
    // interpolation, rate, top-k, union join, dedup postings, LSH,
    // embedding blocking, ANN, text stats, tf-idf, chunking, frame
    // sampling. Plans only — nothing executes.
    val names = Seq("q01_scan_filter", "q05_downsample_avg_fill",
      "q07_groupby_lerp_sum", "q08_rate", "q11_topk_highestmax",
      "q20_union_sum_series", "q26_groupby_tag", "q50_int_avg",
      "d01_exact_dedup", "d02_ngram_jaccard", "d05_embedding_neardup",
      "d10_keep_best", "s01_cosine_topk", "s03_rhp_ann", "s07_ivf_multiprobe",
      "t01_text_stats", "t06_tfidf", "t10_pii_scrub", "t11_chunks",
      "t12_bpe_merges", "t13_cdc_chunks", "q51_calendar_month",
      "q53_mimmax_group", "m04_frame_sample",
      "q60_put_json", "q61_export_roundtrip", "q62_mimmin_group",
      "s08_pq_adc_topk", "s09_ivf_pq_topk", "s10_ivf_pq_residual",
      "s11_ivf_pq_multiprobe", "s12_pq_index_topk",
      "d11_segment_dedup", "t14_sequence_packing", "t15_domain_mix",
      "t16_unigram_logprob", "t17_bigram_logprob", "t18_quality_sample",
      "d12_consensus_pairs", "d13_containment", "d14_semdedup",
      "t19_gopher_rules", "t20_split_assign", "t21_token_budget",
      "t22_bpe_segment", "m07_audio_stats", "m08_image_phash",
      "d15_dup_spans", "t23_shuffle_order", "s13_ann_recall",
      "s14_pq_refine", "t24_dsir_sample", "d16_boilerplate",
      "q72_query_delete", "q73_fsck_repair", "s15_sq8_topk",
      "s16_ivf_sq8", "q75_agg_none", "q76_tree_collisions",
      "q77_tree_notmatched", "q78_tree_test", "q79_meta_sync_uid",
      "q80_meta_sync_ts", "q81_calendar_90m", "q86_custom_agg",
      "q87_filter_plugin", "d17_winnow_pairs", "s17_filtered_topk",
      "m09_scene_cuts", "q88_write_filter", "d18_screen_snapshot",
      "t25_hll_distinct", "t26_cms_heavy", "d19_bloom_decontam",
      "t27_quantile_sketch", "e01_sessionize", "t28_kmv_overlap",
      "q96_hist_pct", "q99_startup_plugin", "q100_query_last_rpc",
      "q101_lookup_grammar", "q102_uid_whitelist")
    val sf = "/root/testdata/sf0.001"
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(!plan.contains("CartesianProduct"), s"$n: cartesian product")
      // a Window with no PARTITION BY funnels everything to one task
      assert(!plan.contains("Window ["), s"$n: unpartitioned window")
      // any true global Sort (the `, true` flag) outside
      // TakeOrderedAndProject is a single-point bottleneck at scale;
      // the contract queries' own output-presentation orderBy accounts
      // for exactly one — anything beyond that is an operator
      // regression
      val globalSorts = "\\bSort \\[[^\\]]*\\], true".r.findAllIn(plan).size
      assert(globalSorts <= 1, s"$n: $globalSorts global sorts")
    }
  }

  test("plan hygiene: expression-join queries — broadcast grid expansion, " +
       "cached variables, no cartesians or global sorts") {
    val sf = "/root/testdata/sf0.001"
    val names = Seq("q20_union_sum_series", "q21_intersect_divide",
      "q25_exp_infix", "q44_exp_union_fill", "q54_union_by_tag",
      "q55_intersect_by_tag", "q56_exp_json", "q59_exp_time_offset")
    try {
      names.foreach { n =>
        val plan = SparkEntry.queries(n)(spark, sf).queryExecution
          .explainString(org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert(!plan.contains("CartesianProduct"), s"$n: cartesian product")
        assert(!plan.contains("Window ["), s"$n: unpartitioned window")
        val globalSorts = "\\bSort \\[[^\\]]*\\], true".r.findAllIn(plan).size
        assert(globalSorts <= 1, s"$n: $globalSorts global sorts")
        if (Seq("q56_exp_json", "q59_exp_time_offset").contains(n)) {
          // the slot grid expands through a BROADCAST nested-loop join
          // (series dim × grid ts) — the intended bounded expansion;
          // a non-broadcast cartesian stays banned above
          assert(plan.contains("BroadcastNestedLoopJoin"),
            s"$n: slot grid not broadcast")
          // each persisted variable serves BOTH its reads (grid ts +
          // values) from the cache: 2 variables × 2 subtrees
          val imts = "InMemoryTableScan".r.findAllIn(plan).size
          assert(imts >= 4, s"$n: expected >=4 InMemoryTableScans, $imts")
        }
      }
    } finally Engine.clearExpCache()
  }

  test("plan hygiene: round-14 rows — PSL and ppl-threshold joins are " +
       "BROADCAST, branch browse carries no cartesian/global-sort debt") {
    val sf = "/root/testdata/sf0.001"
    for (n <- Seq("t34_psl_domain", "t37_psl_full", "t35_ppl_buckets",
        "t38_temperature_mix", "q109_tree_branch")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(!plan.contains("CartesianProduct"), s"$n: cartesian")
      assert(!plan.contains("Window ["), s"$n: unpartitioned window")
      val globalSorts = "\\bSort \\[[^\\]]*\\], true".r
        .findAllIn(plan).size
      assert(globalSorts <= 1, s"$n: $globalSorts global sorts")
      // every rule/threshold join must ride the broadcast side — a
      // SortMergeJoin here would shuffle the corpus for a wire-sized
      // dimension table
      if (n != "q109_tree_branch")
        assert(plan.contains("BroadcastHashJoin") &&
          !plan.contains("SortMergeJoin"),
          s"$n: dimension join not broadcast")
    }
  }

  test("parquet-backed branch browse is a point read: (tree_id, depth) " +
       "PartitionFilters prune to one directory, leaf path pushes down") {
    import spark.implicits._
    import graft.meta.TreeDefs
    val dir = java.nio.file.Files.createTempDirectory("branchstore")
      .toString
    // two trees, depths 1..3 — 6 branch partitions, 2 leaf partitions
    val branches = (for {
      t <- Seq(1, 2); d <- Seq(1, 2, 3); i <- 0 until 4
    } yield {
      val path = (1 to d).map(l => s"t${t}n$l$i").mkString("/")
      (t, d, path, s"t${t}n$d$i",
        path.split("/").dropRight(1).mkString("/"), 1L)
    }).toDF("tree_id", "depth", "path", "name", "parent", "leaves")
    val leaves = Seq(
      (1, "t1n10/t1n20", "leafA", "ts1", "m", Map("k" -> "v")),
      (2, "t2n10/t2n20", "leafB", "ts2", "m", Map("k" -> "v")))
      .toDF("tree_id", "branch_path", "display_name", "tsuid", "metric",
        "tags")
    TreeDefs.writeBranchStore(branches, leaves, dir)
    val (b, l) = TreeDefs.readBranchStore(spark, dir)
    // browse tree 1's node t1n10/t1n20 (depth 2): the target lookup
    // and the children filter each address exactly ONE (tree_id,
    // depth) directory
    val hex = TreeDefs.branchIdHex(1, Seq("t1n10", "t1n20"))
    // AQE wraps the union+sort plan and hides the scan leaves from a
    // static collect; the pruning property is plan-time either way.
    // executedPlan materializes lazily, so AQE stays off until the
    // scans are in hand.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (rows, scans) =
      try {
        val r = TreeDefs.browseRows(b, l, hex)
        (r, r.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        })
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.nonEmpty)
    val branchScans = scans.filter(
      _.metadata("Location").contains("branches"))
    assert(branchScans.nonEmpty)
    branchScans.foreach { s =>
      assert(s.metadata("PartitionFilters").contains("tree_id") &&
        s.metadata("PartitionFilters").contains("depth"),
        s.metadata("PartitionFilters"))
      assert(s.relation.location
        .listFiles(s.partitionFilters, Nil).length == 1,
        "branch scan did not prune to one (tree_id, depth) directory")
    }
    val leafScans = scans.filter(_.metadata("Location").contains("leaves"))
    assert(leafScans.nonEmpty)
    leafScans.foreach { s =>
      assert(s.metadata("PartitionFilters").contains("tree_id"),
        s.metadata("PartitionFilters"))
      assert(s.metadata("PushedFilters").contains("branch_path"),
        s.metadata("PushedFilters"))
    }
    // and the browse answers correctly off the stored layout
    val got = rows.collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.count(_._1 == "leaf") == 1 &&
      got.count(_._1 == "branch") == 1, got.toSeq.toString)
  }

  test("engine queries over float-only events skip the dual slot path") {
    // Points.fromEvents projects is_int as the literal false; the
    // statically-untyped guard must prove it through the real engine
    // chain (filter -> TagFilters -> withSeriesId -> slot join), so
    // the lerp/prev plans carry no dead long-path machinery (~10% on
    // the slot path). q50 builds its OWN typed columns and must keep
    // the dual aggregation.
    val sf = "/root/testdata/sf0.001"
    for (n <- Seq("q07_groupby_lerp_sum", "q26_groupby_tag",
        "q32_pfsum_group")) {
      val plan = SparkEntry.queries(n)(spark, sf)
        .queryExecution.analyzed.toString
      assert(!plan.contains("__lv"), s"$n: dual path not elided")
    }
    val q50 = SparkEntry.queries("q50_int_avg")(spark, sf)
      .queryExecution.analyzed.toString
    assert(q50.contains("__lv"), "q50: dual path missing")
  }

  test("similarity top-k reduces via bounded-heap aggregation, not a per-query window") {
    // the row_number window formulation ships every candidate of a
    // query to ONE task (O(corpus) rows/query for brute-force s01 and
    // full-corpus ADC s08); the TopKAgg formulation partial-aggregates
    // <=k pairs per query per partition. Assert the window never comes
    // back and the object-hash aggregate is actually in the plan.
    val sf = "/root/testdata/sf0.001"
    for (n <- Seq("s01_cosine_topk", "s02_ivf_topk", "s03_rhp_ann",
        "s05_ivf_trained", "s06_rhp_multiprobe", "s07_ivf_multiprobe",
        "s08_pq_adc_topk", "s09_ivf_pq_topk", "s10_ivf_pq_residual",
        "s11_ivf_pq_multiprobe", "s12_pq_index_topk",
        "s14_pq_refine", "s15_sq8_topk", "s16_ivf_sq8",
        "s17_filtered_topk")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(!plan.contains("Window"), s"$n: window over candidate set")
      assert(plan.contains("ObjectHashAggregate"),
        s"$n: expected bounded-heap ObjectHashAggregate reduction")
    }
  }

  test("sketch aggregations partial-aggregate: map-side combine before the shuffle") {
    // the sketch family's whole 100 TB claim is that the shuffled
    // payload is the SKETCH (256 B - 64 KB per partition), not the
    // row stream — which is only true if the typed aggregation runs
    // in partial mode below the exchange. Assert each sketch query's
    // physical plan carries a Partial ObjectHashAggregate.
    val sf = "/root/testdata/sf0.001"
    for (n <- Seq("t25_hll_distinct", "t27_quantile_sketch",
        "t28_kmv_overlap")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution
        .executedPlan.toString()
      assert(plan.contains("ObjectHashAggregate"),
        s"$n: expected ObjectHashAggregate for the typed sketch agg")
      assert("functions=\\[partial_".r.findFirstIn(plan).isDefined,
        s"$n: sketch aggregation is not partial (no map-side combine)")
    }
  }

  test("SQ8 decode stays below the query join: per-vector, never per-pair") {
    // sqTopK binds the decode (codes -> floats, the '/ 255.0' subtree)
    // to a column BEFORE the query cross join. If an optimizer rewrite
    // ever inlined it into the post-join score expression, the decode
    // would run once per (query, vector) PAIR — |Q|× the work at a
    // real query load. Assert every decode expression lives in a join
    // CHILD subtree of the optimized logical plan, for both the flat
    // (s15) and cell-pruned (s16) forms.
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    val sf = "/root/testdata/sf0.001"
    for (n <- Seq("s15_sq8_topk", "s16_ivf_sq8")) {
      val lp = SparkEntry.queries(n)(spark, sf).queryExecution.optimizedPlan
      val joinChildren = lp.collect { case j: Join => j }.flatMap(_.children)
      assert(joinChildren.nonEmpty, s"$n: expected a query join")
      val decodeNodes = lp.collect {
        case p: LogicalPlan
          if p.expressions.exists(_.toString.contains("/ 255.0")) => p
      }
      assert(decodeNodes.nonEmpty, s"$n: decode expression not found")
      decodeNodes.foreach { p =>
        assert(joinChildren.exists(c =>
          c.collect { case x if x eq p => x }.nonEmpty),
          s"$n: decode inlined ABOVE the query join (per-pair decode)")
      }
    }
  }

  test("queryLast backScan=0 with a stored meta table never touches " +
       "the points files") {
    // the round-11 weak: the meta path must be an O(series) read of
    // the maintained last-write table (reference TSUIDQuery
    // .getLastWriteTimes), never an aggregation over raw history. With
    // parquet-backed points and an in-memory stored meta, the executed
    // plan must contain NO file scan at all.
    import graft.meta.Introspect
    import graft.meta.Introspect.LastPointSpec
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("lastmeta")
      .toString + "/pts"
    val pts = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row("cpu", 3600000L, 1.0,
        java.lang.Long.valueOf(1L), true, Map("host" -> "a")),
      org.apache.spark.sql.Row("cpu", 7200000L, 2.0,
        java.lang.Long.valueOf(2L), true, Map("host" -> "b"))).asJava,
      Points.schema)
    pts.write.parquet(dir)
    val filePts = spark.read.parquet(dir)
    // the "stored" table: collected + recreated locally, as a serving
    // tier would hold/cache the maintained meta
    val storedMeta = spark.createDataFrame(
      Introspect.lastWriteMeta(filePts).collect().toSeq.asJava,
      Introspect.lastWriteMeta(filePts).schema).cache()
    val out = Introspect.queryLast(filePts,
      Seq(LastPointSpec("cpu")), backScan = 0, resolve = true,
      lastMeta = Some(storedMeta))
    assert(out.count() == 2) // correct answer first
    // AQE wraps shuffling plans in AdaptiveSparkPlanExec (a leaf until
    // executed), so assert on the formatted explain, which lists every
    // scan node either way
    def planOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val metaPlan = planOf(out)
    assert(!metaPlan.contains("Scan parquet"),
      s"meta path read the points files:\n$metaPlan")
    // and the fallback (no meta) DOES scan the files — the split is real
    val fb = Introspect.queryLast(filePts, Seq(LastPointSpec("cpu")),
      backScan = 0, resolve = true)
    assert(planOf(fb).contains("Scan parquet"),
      "fallback path should read points")
    // the discovery endpoints share the split: with a stored seriesMeta,
    // lookup and suggest never touch the points files either
    val storedSeries = spark.createDataFrame(
      Introspect.seriesMeta(filePts).collect().toSeq.asJava,
      Introspect.seriesMeta(filePts).schema)
    val lk = Introspect.lookupPairs(filePts, "cpu",
      Seq(("host", "")), meta = Some(storedSeries))
    assert(lk.count() == 2)
    assert(!planOf(lk).contains("Scan parquet"),
      "lookup meta path read the points files")
    val sg = Introspect.suggestRpc(filePts, Map("type" -> "tagv"),
      meta = Some(storedSeries))
    assert(sg.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(!planOf(sg).contains("Scan parquet"),
      "suggest meta path read the points files")
    assert(planOf(Introspect.lookupPairs(filePts, "cpu"))
      .contains("Scan parquet"), "lookup fallback should read points")
    storedMeta.unpersist()
  }

  test("bucketed meta fold rewrites ONLY touched buckets and " +
       "partition-prunes its read of the store") {
    // the O(batch) fold shape: a micro-batch that touches one series
    // must leave every other bucket's files byte-identical on disk,
    // and its read of the stored table must carry a PartitionFilter on
    // the bucket directory column so untouched buckets are never
    // opened. This is the relational equivalent of the reference's
    // per-write ts_counter increment (TSUIDQuery.java:239-316).
    import graft.meta.MetaStore
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("metastore")
      .toString + "/last"
    def pts(rows: (String, Long, Double, Map[String, String])*) =
      spark.createDataFrame(rows.map { case (m, ts, v, tg) =>
        org.apache.spark.sql.Row(m, ts, v,
          java.lang.Long.valueOf(v.toLong), true, tg) }.asJava,
        Points.schema)
    // seed: many series spread across the 8 buckets
    val seed = pts((0 until 40).map(i =>
      (s"m$i", 3600000L, i.toDouble, Map("host" -> s"h$i"))): _*)
    MetaStore.foldLastWrite(spark, dir, seed, buckets = 8)
    def listing(): Map[String, Set[(String, Long, Long)]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.isDirectory).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSet
      }.toMap
    }
    val before = listing()
    assert(before.size > 4, s"seed should span several buckets: $before")
    // fold a single-series batch: exactly one bucket is touched
    val touched = MetaStore.foldLastWrite(spark, dir,
      pts(("m7", 7200000L, 99.0, Map("host" -> "h7"))), buckets = 8)
    assert(touched.size == 1, s"one series must touch one bucket: $touched")
    val after = listing()
    val touchedDir = s"bucket=${touched.head}"
    assert(after.keySet == before.keySet)
    before.foreach { case (d, files) =>
      if (d == touchedDir)
        assert(after(d) != files, s"touched bucket $d was not rewritten")
      else
        assert(after(d) == files,
          s"untouched bucket $d was rewritten: ${files} -> ${after(d)}")
    }
    // and the merge is correct: the new write won, everything else kept
    val store = MetaStore.read(spark, dir)
    assert(store.count() == 40)
    assert(store.filter(col("metric") === "m7").head
      .getAs[String]("value") == "99")
    // read-side pruning: the store read filtered to touched buckets
    // plans with a PartitionFilter on the directory column
    val pruned = spark.read.parquet(dir)
      .filter(col("bucket").isin(touched.map(Int.box): _*))
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("bucket"),
      s"store read must prune on the bucket partition column:\n$plan")
    // the tsuid point-lookup read computes the bucket driver-side from
    // the request list and carries the same PartitionFilter
    val someTsuid = store.filter(col("metric") === "m3")
      .head.getAs[String]("tsuid")
    val byId = MetaStore.readLastWriteFor(spark, dir, Seq(someTsuid),
      buckets = 8)
    assert(byId.count() == 1 &&
      byId.head.getAs[String]("metric") == "m3")
    val idPlan = byId.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(idPlan.replaceAll(
        "(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("bucket"),
      s"tsuid lookup must prune on the bucket column:\n$idPlan")
  }

  test("md5_prefix60 is registered as a SQL function by the extension") {
    val r = spark.sql(
      "SELECT md5_prefix60('hello world') AS h").collect()(0).getLong(0)
    assert(r == graft.functions.Md5Prefix60.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
  }
}
