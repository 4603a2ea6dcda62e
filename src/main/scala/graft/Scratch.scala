package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc local profiling / plan auditing (not part of the driver
  * contract; run via `sbt "runMain graft.Scratch"`). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    def audit(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val nEx = "Exchange".r.findAllIn(plan).size
      val nReuse = "ReusedExchange".r.findAllIn(plan).size
      val nScan = "Scan parquet".r.findAllIn(plan).size
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
      val warn = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "GlobalSort" -> "\\bSort \\[[^\\]]*\\], true".r.findFirstIn(plan)
          .exists(_ => !plan.contains("TakeOrderedAndProject")),
        "UnpartitionedWindow" -> plan.contains("Window [")
      ).collect { case (w, true) => w }
      println(s"AUDIT $name exchanges=$nEx reused=$nReuse scans=$nScan " +
        s"pushedNonEmpty=${pushed.count(p => !p.contains("[]"))} " +
        (if (warn.nonEmpty) s"WARN=${warn.mkString(",")}" else "ok"))
    }

    if (args.headOption.contains("--dump")) {
      // write `.explain("formatted")` for the named queries to files —
      // the before/after plan evidence for optimization rounds.
      // Streaming contract rows EXECUTE inside their query fn, so only
      // batch rows should be dumped.
      if (args.length < 2) {
        System.err.println("usage: --dump <outDir> <query[:suffix]>...")
        sys.exit(2)
      }
      val outDir = args(1)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      args.drop(2).foreach { spec =>
        val (name, suffix) = spec.split(":", 2) match {
          case Array(n, sfx) => (n, sfx)
          case Array(n) => (n, "plan")
        }
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"DUMPED $name -> $outDir/${name}_$suffix.txt")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--audit-all")) {
      // static plan hygiene over EVERY contract query: cartesians,
      // unpartitioned windows, non-TakeOrdered global sorts, pushed
      // filters — the per-row WARN list should be empty
      var warned = 0
      SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
        try audit(n)
        catch { case e: Throwable =>
          warned += 1
          println(s"AUDIT $n ERROR ${e.getMessage.take(120)}")
        }
      }
      println(s"AUDIT-ALL done errors=$warned")
      spark.stop(); return
    }

    if (args.headOption.contains("--d03")) {
      import org.apache.spark.sql.functions._
      def stamp(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"STAGE $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(32)
      stamp("scan")(docs.count())
      val post = graft.pipeline.Dedup.hashedPostings(
        docs, "text", "doc_id", 3, portable = true)
      stamp("postings")(post.count())
      val postC = post.persist()
      stamp("postingsP")(postC.count())
      stamp("pairs")(graft.pipeline.Dedup
        .minhashLshFromPostings(postC, bands = 4, threshold = 0.5).count())
      spark.stop(); return
    }

    if (args.headOption.contains("--q58")) {
      // stage decomposition of the put-parse round trip: where do the
      // seconds go — render, parse, validate, or aggregate?
      import org.apache.spark.sql.functions._
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"Q58 $name%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
      val ev = graft.model.Points.fromEvents(spark, sfDir)
        .filter(col("tags").getItem("k").isNotNull)
      t("scan")(ev.count())
      val lines = ev.select(concat(
        lit("put "), col("metric"), lit(" "), col("ts").cast("string"),
        lit(" "), col("value").cast("string"),
        lit(" user="), col("tags").getItem("user"),
        lit(" k="), col("tags").getItem("k")).as("value"))
      t("render")(lines.count())
      val cached = lines.persist()
      t("renderP")(cached.count())
      t("parse")(graft.sources.Ingest.parsePutLines(cached).count())
      t("parse2")(graft.sources.Ingest.parsePutLines(cached).count())
      t("full")(SparkEntry.queries("q58_put_parse")(spark, sfDir).count())
      t("full2")(SparkEntry.queries("q58_put_parse")(spark, sfDir).count())
      spark.stop(); return
    }

    if (args.headOption.contains("--longdoc")) {
      // doc-LENGTH sweep at a FIXED total token budget (1.28M tokens):
      // the shingle scan and the char-window fingerprint must cost the
      // same per token at every document length — linear in corpus
      // bytes. Before the round-16 bindOnce/CharWindows fixes both
      // were quadratic in document length (the 20k row ran minutes).
      import org.apache.spark.sql.functions._
      for ((nDocs, tokPerDoc) <- Seq((1280, 1000), (256, 5000), (64, 20000))) {
        val docs = spark.range(nDocs).select(
            col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(tokPerDoc - 1)),
              i => concat(lit("w"), pmod(col("id") * 131 + i, lit(50000)))))
              .as("text"))
          .repartition(32).persist()
        docs.count() // materialize text OUTSIDE the timed region
        def t(f: => Long): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val tPost = t(graft.pipeline.Dedup.hashedPostings(
          docs, "text", "doc_id", 3, portable = true).count())
        val (fp, nsh) = graft.pipeline.TextAnalysis.fingerprint(col("text"), 8)
        val tFp = t(docs.select(fp.as("f"), nsh.as("n"))
          .agg(sum("n")).count())
        println(f"LONGDOC docs=$nDocs%5d tok/doc=$tokPerDoc%6d " +
          f"postings=$tPost%6.2f s fingerprint=$tFp%6.2f s")
        docs.unpersist()
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--t25")) {
      import org.apache.spark.sql.functions._
      def stamp(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"STAGE $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
      val hashed = docs.select(col("source"),
        explode(graft.pipeline.TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("source"),
          graft.pipeline.TextAnalysis.hash60(col("tok"), portable = true).as("h"))
      stamp("scan+md5")(hashed.count())
      stamp("hll")(graft.pipeline.Sketches.hllDistinct(hashed, "source", "h").count())
      stamp("exactCD")(hashed.groupBy("source")
        .agg(countDistinct("h").as("n")).count())
      stamp("fused")(hashed.groupBy("source")
        .agg(graft.pipeline.Sketches.hll(col("h")).as("s"),
          countDistinct("h").as("n")).count())
      spark.stop(); return
    }

    if (args.headOption.contains("--force")) {
      // full-evaluation timing: count() lets Catalyst prune every
      // projected expression (and eliminate a final unique-key left
      // join entirely), so for expression-heavy operators it measures
      // the scan, not the operator. Hashing the full row forces every
      // output column to materialize.
      import org.apache.spark.sql.functions._
      args.drop(1).foreach { name =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val chk = df.select((xxhash64(df.columns.map(col): _*)
            % 1000000007L).as("h"))
          .agg(coalesce(sum("h"), lit(0L))).head.getLong(0)
        println(f"FORCE $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  chk=$chk%x")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--stream")) {
      // A/B: streaming micro-batch fixed costs vs state/shuffle
      // partition count (VERDICT r16 next-round #8). Same q63 pipeline,
      // run in a session clone with shuffle.partitions = N.
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      for (n <- Seq("32", "8", "4", "1", "32", "8", "4", "1")) {
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", n)
        val t0 = System.nanoTime()
        val base = SparkEntry.pts(ss, sfDir).filter(col("metric") === "signup" &&
            col("tags").getItem("k").isNotNull)
          .groupBy(col("metric"), col("ts"),
            col("tags").getItem("user").as("u"), col("tags").getItem("k").as("k"))
          .agg(max(col("value")).as("value"))
          .select(col("metric"), col("ts"), col("value"),
            lit(null).cast("long").as("value_l"), lit(false).as("is_int"),
            map(lit("user"), col("u"), lit("k"), col("k")).as("tags"))
        val lines = graft.sources.Export.toPutLines(base)
        val tmp = java.nio.file.Files.createTempDirectory("graft_sx_")
        val src = tmp.resolve("src").toString
        val out = tmp.resolve("out").toString
        val cp = tmp.resolve("cp").toString
        lines.unionByName(lines).coalesce(1).write.text(src)
        val stream = ss.readStream.text(src)
        val q = graft.sources.Ingest
          .streamToParquet(ss, stream, out, cp, lateness = "36500 days")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val c = ss.read.parquet(out).count()
        println(f"STREAM parts=$n%3s ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$c")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--q79")) {
      // stage decomposition of the q79 meta-sync pipeline (run twice,
      // read the second block — JIT warmup)
      import org.apache.spark.sql.functions._
      import graft.meta.{Introspect, Uids}
      import spark.implicits._
      def stamp(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"STAGE $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
      (1 to 2).foreach { pass =>
        println(s"-- pass $pass")
        val p = SparkEntry.pts(spark, sfDir)
          .filter(col("metric").isin("click", "signup"))
        var reg0: org.apache.spark.sql.DataFrame = null
        stamp("uidRegistry") { reg0 = Introspect.uidRegistry(p); reg0.count() }
        var reg: org.apache.spark.sql.DataFrame = null
        stamp("assign+del") {
          val (regTmp, _) = Uids.assign(reg0, Map("metric" -> Seq("zz.tmp")))
          reg = Uids.delete(regTmp, "metric", "zz.tmp"); 0L
        }
        val stored = reg.filter(col("kind") === "metric")
          .withColumn("created", lit(9999999999999L))
          .unionByName(Seq(("metric", "ghost", 999L, 123L))
            .toDF("kind", "name", "uid", "created"))
        stamp("syncUidMeta") {
          Uids.syncUidMeta(p, reg, stored).count()
        }
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--q58")) {
      import org.apache.spark.sql.functions._
      def stamp(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"STAGE $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
      stamp("raw")(spark.read.parquet(s"$sfDir/events.parquet").count())
      val evAll = graft.model.Points.fromEvents(spark, sfDir)
      stamp("fromEvents")(evAll.count())
      stamp("fromEvents2")(evAll.count())
      stamp("tagsOnly")(evAll.select("tags").filter(
        col("tags").getItem("k").isNotNull).count())
      val ev = graft.model.Points.fromEvents(spark, sfDir)
        .filter(col("tags").getItem("k").isNotNull)
      stamp("scan")(ev.count())
      val lines = ev.select(concat(
        lit("put "), col("metric"), lit(" "), col("ts").cast("string"),
        lit(" "), col("value").cast("string"),
        lit(" user="), col("tags").getItem("user"),
        lit(" k="), col("tags").getItem("k")).as("value"))
      stamp("render")(lines.count())
      stamp("render2")(lines.count())
      val parsed = graft.sources.Ingest.parsePutLines(lines)
      stamp("parse")(parsed.count())
      stamp("parse2")(parsed.count())
      stamp("parseAgg")(parsed.filter(col("_error").isNull)
        .groupBy("metric").agg(sum("value")).count())
      stamp("parseAgg2")(parsed.filter(col("_error").isNull)
        .groupBy("metric").agg(sum("value")).count())
      stamp("valOnly")(parsed.groupBy("metric").agg(sum("value")).count())
      stamp("tagsAgg")(parsed.select("metric", "tags").groupBy("metric")
        .agg(count(col("tags"))).count())
      stamp("errOnly")(parsed.select("_error").filter(col("_error").isNull)
        .count())
      // piecewise _error cost: rebuild the parse front half and time
      // each predicate family separately
      val p2 = lines.withColumn("parts", split(trim(col("value")), " "))
      stamp("e_cmd")(p2.select((try_element_at(col("parts"), lit(1)) =!= "put" ||
        size(col("parts")) < 5).as("e")).filter(!col("e")).count())
      stamp("e_val")(p2.select(
        expr("try_cast(element_at(parts, 4) AS DOUBLE)").isNull.as("e"))
        .filter(!col("e")).count())
      stamp("e_ts")(p2.select(
        expr("try_cast(element_at(parts, 3) AS DECIMAL(20,3))").isNull.as("e"))
        .filter(!col("e")).count())
      stamp("e_rlike")(p2.select(
        try_element_at(col("parts"), lit(2)).rlike(graft.sources.Ingest.NAME_RE).as("e"))
        .filter(col("e")).count())
      val tagPairs2 = expr("slice(parts, 5, greatest(size(parts) - 4, 0))")
      stamp("e_tags")(p2.withColumn("tagkv",
          transform(tagPairs2, p => split(p, "=")))
        .select(exists(col("tagkv"), p =>
          size(p) =!= 2 || get(p, lit(0)) === "" || get(p, lit(1)) === "").as("e"))
        .filter(!col("e")).count())
      spark.stop(); return
    }

    if (args.headOption.contains("--sq8q")) {
      // large-|Q| SQ8 serving probe (the bench's s15 runs |Q|=20; the
      // decode-inlining question only shows at a real query load):
      // |Q|=1000 against the corpus at this sfDir, min of two warm
      // passes. The plan-level guarantee (decode below the join,
      // PlansSpec) makes per-pair decode impossible; this measures the
      // scan+score cost actually scaling in |corpus|×|Q| pairs.
      import org.apache.spark.sql.functions._
      import graft.pipeline.Similarity
      val nq = args.drop(1).headOption.map(_.toInt).getOrElse(1000)
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val dim = e.select(size(col("embedding"))).head.getInt(0)
      val bounds = Similarity.sqTrain(e, "embedding", dim)
      val codes = Similarity.sqEncode(e, "embedding", bounds)
        .select("vec_id", "codes").persist()
      println(s"corpus=${codes.count()} dim=$dim |Q|=$nq")
      val q = e.limit(nq)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .persist()
      q.count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Similarity.sqTopK(codes, q, 5, bounds).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SQ8Q sfDir=$sfDir |Q|=$nq min=${times.min}%.2f s passes=${times.map(t => f"$t%.2f").mkString(",")}")
      spark.stop(); return
    }

    if (args.headOption.contains("--recall")) {
      // mean recall@5 of IVF-PQ serving vs exact ground truth across
      // configs — evidence the s13 eval's knobs (cells, nprobe, m, k)
      // actually buy recall, not just different numbers
      import org.apache.spark.sql.functions._
      import graft.pipeline.Similarity
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val exact = Similarity.bruteForceTopK(e, q, 5)
        .select("q_id", "vec_id").persist()
      exact.count()
      def mean(approx: org.apache.spark.sql.DataFrame): Double =
        Similarity.annRecall(exact, approx)
          .agg(avg("recall")).head.getDouble(0)
      for ((cells, nprobe, m, k) <- Seq((4, 1, 2, 4), (4, 2, 2, 4),
          (8, 3, 8, 16), (8, 8, 8, 16), (8, 8, 16, 64))) {
        val cents = Similarity.kmeansCentroids(e, "embedding", "vec_id",
          cells, iters = 2)
        // residual encoding, as the multi-probe path expects (s11)
        val res = Similarity.assignWith(e, "embedding", cents)
          .withColumn("resid",
            Similarity.residual(col("embedding"), cents, col("cluster")))
        val books = Similarity.pqTrain(res, "resid", "vec_id", m, k,
          iters = 2)
        val enc = Similarity.pqEncode(res, "resid", books)
        val qp = Similarity.probesWith(
            e.filter(col("vec_id") < 20), "embedding", cents, nprobe)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("probes").as("q_probes"))
        val approx = Similarity.ivfPqTopKMultiProbe(
          enc.select("vec_id", "codes", "cluster"), qp, 5, books, cents)
        println(f"RECALL cells=$cells nprobe=$nprobe m=$m k=$k  " +
          f"recall@5=${mean(approx)}%.3f")
      }
      // SQ8 variant: zero-training scalar quantizer, full-corpus scan
      // (no cells) — distortion is range/255 per dim, so recall should
      // sit far above PQ at the same scan shape
      locally {
        val bounds = Similarity.sqTrain(e, "embedding", 64)
        val codes = Similarity.sqEncode(e, "embedding", bounds)
          .select("vec_id", "codes")
        val approx = Similarity.sqTopK(codes, q, 5, bounds)
        println(f"RECALL SQ8 full-scan  recall@5=${mean(approx)}%.3f")
      }
      // refine variant: the ADC scan proposes a DEEPER shortlist
      // (R > k), exact cosine re-ranks it (Similarity.refineTopK) —
      // recall bought per unit of full-precision work, the standard
      // production answer to PQ quantization error
      locally {
        val cents = Similarity.kmeansCentroids(e, "embedding", "vec_id",
          8, iters = 2)
        val res = Similarity.assignWith(e, "embedding", cents)
          .withColumn("resid",
            Similarity.residual(col("embedding"), cents, col("cluster")))
        val books = Similarity.pqTrain(res, "resid", "vec_id", 16, 64,
          iters = 2)
        val enc = Similarity.pqEncode(res, "resid", books)
        val qp = Similarity.probesWith(
            e.filter(col("vec_id") < 20), "embedding", cents, 8)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("probes").as("q_probes"))
        for (r <- Seq(10, 25, 50)) {
          val shortlist = Similarity.ivfPqTopKMultiProbe(
            enc.select("vec_id", "codes", "cluster"), qp, r, books, cents)
          val refined = Similarity.refineTopK(shortlist, e,
            qp.select(col("q_id"), col("q_vec")), 5)
          println(f"RECALL cells=8 nprobe=8 m=16 k=64 REFINE R=$r%-3d " +
            f"recall@5=${mean(refined)}%.3f")
        }
      }
      // normalized variant: on unit vectors L2 order == cosine order,
      // so the ADC-vs-cosine metric mismatch disappears
      locally {
        val en = e.withColumn("nvec",
          Similarity.l2Normalize(col("embedding")))
        val cents = Similarity.kmeansCentroids(en, "nvec", "vec_id", 8,
          iters = 2)
        val res = Similarity.assignWith(en, "nvec", cents)
          .withColumn("resid",
            Similarity.residual(col("nvec"), cents, col("cluster")))
        val books = Similarity.pqTrain(res, "resid", "vec_id", 16, 64,
          iters = 2)
        val enc = Similarity.pqEncode(res, "resid", books)
        val qp = Similarity.probesWith(
            en.filter(col("vec_id") < 20), "nvec", cents, 8)
          .select(col("vec_id").as("q_id"), col("nvec").as("q_vec"),
            col("probes").as("q_probes"))
        val approx = Similarity.ivfPqTopKMultiProbe(
          enc.select("vec_id", "codes", "cluster"), qp, 5, books, cents)
        println(f"RECALL cells=8 nprobe=8 m=16 k=64 NORMALIZED  " +
          f"recall@5=${mean(approx)}%.3f")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--d14")) {
      // SemDeDup at scale with the k knob: within-cell pair work is
      // sum over cells of |cell|^2/2, so k must grow with the corpus
      // (the paper runs 50k cells on LAION) to hold cell populations
      // — and with them the quadratic term — constant
      val k = args.lift(1).map(_.toInt).getOrElse(4)
      val t0 = System.nanoTime()
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val verdicts = graft.pipeline.Dedup.semDedup(
        e, "embedding", "vec_id", k = k, iters = 1, eps = 0.35)
      import org.apache.spark.sql.functions._
      val dropped = verdicts.filter(!col("keep")).count()
      println(f"d14 k=$k%-4d ${(System.nanoTime() - t0) / 1e9}%6.2f s  dropped=$dropped")
      spark.stop(); return
    }

    if (args.headOption.contains("--d05")) {
      // d05 at scale with the nBits knob: bucket population is
      // corpus / 2^nBits per table, so nBits must grow with the
      // corpus to hold per-bucket pair counts flat
      val nBits = args.lift(1).map(_.toInt).getOrElse(6)
      val threshold = args.lift(2).map(_.toDouble).getOrElse(0.35)
      def run(): Double = {
        val t0 = System.nanoTime()
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val n = graft.pipeline.Dedup.embeddingRhpPairs(
          e, "embedding", "vec_id", threshold = threshold,
          nBits = nBits, dim = 64, tables = 3).count()
        println(s"  pairs=$n")
        (System.nanoTime() - t0) / 1e9
      }
      if (args.contains("--diag")) {
        import org.apache.spark.sql.functions._
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        def bkt(off: Int) = graft.functions.VectorMath.rhpBucketCol(
          col("embedding"), nBits, 64, off)
        val b0 = e.select(bkt(0).as("b")).groupBy("b").count()
          .orderBy(desc("count"))
        val top = b0.limit(5).collect().map(_.getLong(1))
        val nb = b0.count()
        val sumSq = b0.agg(sum(col("count") * col("count"))).head.getLong(0)
        println(s"  diag nBits=$nBits buckets=$nb top5=${top.mkString(",")} " +
          s"pairsT0=${sumSq / 2}")
        spark.stop(); return
      }
      val cold = run(); spark.catalog.clearCache()
      val warm = run()
      println(f"TIME d05[nBits=$nBits,t=$threshold] $cold%8.2f $warm%8.2f")
      spark.stop(); return
    }

    if (args.headOption.contains("--lastmeta")) {
      // the round-12 meta-vs-scan split measured: a dashboard poll via
      // the stored last-write / series meta table vs the raw-history
      // recompute, at sf0.1
      import graft.meta.Introspect
      import graft.meta.Introspect.LastPointSpec
      import scala.jdk.CollectionConverters._
      val p = graft.model.Points.fromEvents(spark, sfDir)
      def stamp(name: String)(f: => Long): Double = {
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"STAGE $name%-22s $s%6.3f s  rows=$n"); s
      }
      // one-time maintenance cost (the foreachBatch fold pays this
      // incrementally in production; here the full build). The stored
      // tables are PARQUET, the production shape — not driver-local
      // lists, whose LocalTableScan re-serializes per action.
      val dir = java.nio.file.Files.createTempDirectory("lastmeta").toString
      val tBuild = stamp("meta_build") {
        Introspect.lastWriteMeta(p).write.parquet(s"$dir/last")
        Introspect.seriesMeta(p).write.parquet(s"$dir/series")
        0L
      }
      val lastMeta = spark.read.parquet(s"$dir/last")
      val seriesMeta = spark.read.parquet(s"$dir/series")
      stamp("meta_warm")(lastMeta.count() + seriesMeta.count())
      val specs = Seq(LastPointSpec("click", Map("user" -> "1")),
        LastPointSpec("view"))
      for (pass <- 1 to 3) {
        stamp(s"last_raw_$pass")(
          Introspect.queryLast(p, specs, resolve = true).count())
        stamp(s"last_meta_$pass")(Introspect.queryLast(p, specs,
          resolve = true, lastMeta = Some(lastMeta)).count())
        stamp(s"lookup_raw_$pass")(
          Introspect.lookupPairs(p, pairs = Seq(("k", ""))).count())
        stamp(s"lookup_meta_$pass")(Introspect.lookupPairs(p,
          pairs = Seq(("k", "")), meta = Some(seriesMeta)).count())
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--metafold")) {
      // fold cost vs series count (the r12 VERDICT's structural note):
      // the r12 fold union-and-reaggregated the WHOLE stored meta table
      // per micro-batch; the bucketed MetaStore fold reads and rewrites
      // only the series-hash buckets the batch touches. Measure both at
      // 1x/10x/100x series cardinality with a FIXED small batch (8
      // series): the naive fold's cost must track the store size, the
      // bucketed fold's the touched slice.
      import org.apache.spark.sql.functions._
      import graft.meta.{Introspect, MetaStore}
      def stamp(name: String)(f: => Long): Double = {
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"STAGE $name%-26s $s%7.3f s  rows=$n"); s
      }
      def mkPoints(series: Long, perSeries: Int): org.apache.spark.sql.DataFrame =
        spark.range(series * perSeries).select(
          concat(lit("m"), (col("id") % 100).cast("string")).as("metric"),
          (floor(col("id") / series).cast("long") * 60000L + 3600000L)
            .as("ts"),
          col("id").cast("double").as("value"),
          col("id").as("value_l"), lit(true).as("is_int"),
          map(lit("host"),
            concat(lit("h"), (col("id") % series).cast("string"))).as("tags"))
      val buckets = 256
      for (series <- Seq(100000L, 1000000L, 10000000L)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"metafold_$series").toString
        // seed both store shapes with the same S-series meta
        stamp(s"seed_bucketed_S=$series")(
          { MetaStore.foldLastWrite(spark, s"$dir/b", mkPoints(series, 1),
              buckets); 0L })
        stamp(s"seed_naive_S=$series")(
          { Introspect.lastWriteMeta(mkPoints(series, 1))
              .write.parquet(s"$dir/n"); 0L })
        // the fixed batch: 8 existing series get a newer write
        val batch = mkPoints(8, 1).withColumn("ts", col("ts") + 7200000L)
          .localCheckpoint(true)
        for (pass <- 1 to 3) {
          stamp(s"fold_bucketed_S=${series}_$pass")(
            MetaStore.foldLastWrite(spark, s"$dir/b", batch, buckets).size)
          stamp(s"fold_naive_S=${series}_$pass") {
            // the r12 shape: full read + union-reaggregate + full rewrite
            val stored = spark.read.parquet(s"$dir/n")
            Introspect.mergeLastWrite(stored, batch).localCheckpoint(true)
              .write.mode("overwrite").parquet(s"$dir/n")
            0L
          }
        }
        // the bucketed store still answers correctly after the folds
        stamp(s"probe_S=$series")(MetaStore.read(spark, s"$dir/b")
          .filter(col("tags").getItem("host") === "h3").count())
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--branchscale")) {
      // browse-latency-vs-store-size probe for the parquet-backed
      // branch store: the tree builds once (data-sized), then a hex
      // browse must be a POINT READ — (tree_id, depth)-pruned scan
      // plus the addressed node's bounded fan-out — so browse latency
      // must stay flat across 10× series growth.
      import org.apache.spark.sql.functions._
      import graft.meta.{TreeDefs, Trees}
      def stamp(name: String)(f: => Long): Double = {
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"STAGE $name%-28s $s%7.3f s  rows=$n"); s
      }
      val rules = Seq(
        Trees.Rule(1, 0, 0, "METRIC"),
        Trees.Rule(1, 1, 0, "TAGK", field = "g"),
        Trees.Rule(1, 2, 0, "TAGK", field = "host"))
        .foldLeft(Trees.emptyRules(spark))(Trees.upsertRule)
      for (series <- Seq(1000000L, 10000000L)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"branchscale_$series").toString
        val pts = spark.range(series).select(
          concat(lit("m"), (col("id") % 100).cast("string")).as("metric"),
          map(lit("g"),
            concat(lit("g"), (col("id") % 9973).cast("string")),
            lit("host"),
            concat(lit("h"), col("id").cast("string"))).as("tags"))
        stamp(s"build_S=$series") {
          val (b, l) = Trees.buildBranchStore(pts, rules, 1)
          TreeDefs.writeBranchStore(b, l, dir); 0L
        }
        val (b, l) = TreeDefs.readBranchStore(spark, dir)
        for (pass <- 1 to 3) {
          stamp(s"browse_d1_S=${series}_$pass")(TreeDefs.browseRows(b, l,
            TreeDefs.branchIdHex(1, Seq("m3"))).count())
          stamp(s"browse_d2_S=${series}_$pass")(TreeDefs.browseRows(b, l,
            TreeDefs.branchIdHex(1, Seq("m3", "g42"))).count())
        }
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--metafoldN")) {
      // bucket-count sensitivity of the bucketed meta fold at FIXED
      // 10M stored series (the r13 table fixed N=64/256; this sweep
      // pins the "size N with the table" guidance): per-fold cost =
      // touched-slice read/rewrite (shrinks as N grows — fewer series
      // per bucket) + fixed per-job overhead times touched-bucket
      // count (grows once the 8-series batch spreads over 8 distinct
      // buckets) + small-file pressure at high N. Also stamps the
      // point-lookup read (readLastWriteFor's partition-pruned scan).
      import org.apache.spark.sql.functions._
      import graft.meta.MetaStore
      def stamp(name: String)(f: => Long): Double = {
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"STAGE $name%-28s $s%7.3f s  rows=$n"); s
      }
      def mkPoints(series: Long): org.apache.spark.sql.DataFrame =
        spark.range(series).select(
          concat(lit("m"), (col("id") % 100).cast("string")).as("metric"),
          lit(3600000L).as("ts"),
          col("id").cast("double").as("value"),
          col("id").as("value_l"), lit(true).as("is_int"),
          map(lit("host"),
            concat(lit("h"), (col("id") % series).cast("string"))).as("tags"))
      val series = 10000000L
      for (buckets <- Seq(16, 64, 256, 1024)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"metafoldN_$buckets").toString
        stamp(s"seed_N=$buckets")(
          { MetaStore.foldLastWrite(spark, s"$dir/b", mkPoints(series),
              buckets); 0L })
        val batch = mkPoints(8).withColumn("ts", col("ts") + 7200000L)
          .localCheckpoint(true)
        for (pass <- 1 to 3)
          stamp(s"fold_N=${buckets}_$pass")(
            MetaStore.foldLastWrite(spark, s"$dir/b", batch, buckets).size)
        stamp(s"probe_N=$buckets")(MetaStore.read(spark, s"$dir/b")
          .filter(col("tags").getItem("host") === "h3").count())
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--t29scale")) {
      // t29 trainer cost decomposition vs corpus scale: the feature
      // build (tokenize + hash + persist) happens ONCE and tracks the
      // corpus; each GD iteration after it is one per-doc margin agg
      // + one bucket-keyed gradient agg over the persisted feature
      // table. If the design claim holds, (iters=6 − iters=2)/4 — the
      // marginal per-iteration cost — stays a small fraction of the
      // iters=2 total at every scale. min-of-2 per cell (first pass
      // absorbs JIT).
      import org.apache.spark.sql.functions._
      import graft.pipeline.TextAnalysis
      for (dir <- args.drop(1)) {
        val d = spark.read.parquet(s"$dir/documents.parquet")
        val n = d.count()
        for (iters <- Seq(2, 6)) {
          val s = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            TextAnalysis.trainHashedLogreg(d, "text", "doc_id",
              col("lang") === "en", buckets = 64, iters = iters,
              portable = true)
            (System.nanoTime() - t0) / 1e9
          }.min
          println(f"T29 docs=$n%-7d iters=$iters min2=$s%7.2f s")
        }
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--discovery100x")) {
      // 100x SERIES-CARDINALITY probe for the discovery endpoints
      // (VERDICT r12 Next #6): sf0.1 has 93.6k series; synthesize the
      // same shape at 1x/10x/100x series (fixed 5 points/series — the
      // raw path scales with POINTS, the meta path must scale with
      // SERIES) and measure lookup/suggest/queryLast raw vs the
      // parquet-backed meta path.
      import org.apache.spark.sql.functions._
      import graft.meta.Introspect
      import graft.meta.Introspect.LastPointSpec
      def stamp(name: String)(f: => Long): Double = {
        val t0 = System.nanoTime(); val n = f
        val s = (System.nanoTime() - t0) / 1e9
        println(f"STAGE $name%-28s $s%7.3f s  rows=$n"); s
      }
      val baseSeries = 93600L
      for (fx <- Seq(1, 10, 100)) {
        val series = baseSeries * fx
        val per = 5
        val dir = java.nio.file.Files
          .createTempDirectory(s"disc_$fx").toString
        val pts = spark.range(series * per).select(
          concat(lit("m"), (col("id") % 40).cast("string")).as("metric"),
          (floor(col("id") / series).cast("long") * 60000L + 3600000L)
            .as("ts"),
          col("id").cast("double").as("value"),
          col("id").as("value_l"), lit(true).as("is_int"),
          // user derives from the series index ABOVE the metric digits
          // so every (metric, user) pair is populated and the probe's
          // m7{user=1} addressing finds series at every scale
          map(lit("user"),
            (floor((col("id") % series) / 40) % 1000)
              .cast("long").cast("string"),
            lit("k"), concat(lit("k"),
              floor((col("id") % series) / 40000)
                .cast("long").cast("string"))).as("tags"))
        stamp(s"gen_${fx}x")({
          pts.write.parquet(s"$dir/pts"); 0L })
        val p = spark.read.parquet(s"$dir/pts")
        stamp(s"meta_build_${fx}x")({
          Introspect.seriesMeta(p).write.parquet(s"$dir/series")
          Introspect.lastWriteMeta(p).write.parquet(s"$dir/last"); 0L })
        val sm = spark.read.parquet(s"$dir/series")
        val lm = spark.read.parquet(s"$dir/last")
        val specs = Seq(LastPointSpec("m7", Map("user" -> "1")))
        for (pass <- 1 to 3) {
          stamp(s"lookup_raw_${fx}x_$pass")(
            Introspect.lookupPairs(p, "m7", Seq(("user", "1"))).count())
          stamp(s"lookup_meta_${fx}x_$pass")(
            Introspect.lookupPairs(p, "m7", Seq(("user", "1")),
              meta = Some(sm)).count())
          stamp(s"suggest_meta_${fx}x_$pass")(
            Introspect.suggestRpc(p, Map("type" -> "tagv", "q" -> "9"),
              meta = Some(sm)).count())
          stamp(s"last_raw_${fx}x_$pass")(
            Introspect.queryLast(p, specs, resolve = true).count())
          stamp(s"last_meta_${fx}x_$pass")(
            Introspect.queryLast(p, specs, resolve = true,
              lastMeta = Some(lm)).count())
        }
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--interp")) {
      // 100x SERIES-CARDINALITY probe for the lerp union-grid family
      // (q07/q11 shape): S series in ONE group over a shared bucket
      // grid, total point count held ~constant (~2M), so the only
      // axis moving is how many series the slot join and the final
      // (group, ts) aggregation must fan across — the skew axis for
      // metric-wide grouping, where the grid and members tables both
      // hash on the single group key. SCALING.md measures 30x DATA;
      // this isolates 100x CARDINALITY at fixed data.
      import org.apache.spark.sql.functions._
      val total = 2000000L
      for (s <- Seq(1000L, 10000L, 100000L)) {
        val grid = math.max((total / s / 0.7).toLong, 4L)
        val pts = spark.range(s).select(col("id").as("s"))
          .crossJoin(spark.range(grid).select(col("id").as("k")))
          .filter(pmod(hash(col("s"), col("k")), lit(10)) < 7)
          .select(lit("m").as("metric"),
            (lit(1356998400000L) + col("k") * 10000L).as("ts"),
            (col("s") + col("k")).cast("double").as("value"),
            lit(null).cast("long").as("value_l"),
            lit(false).as("is_int"),
            map(lit("host"), concat(lit("h"), col("s"))).as("tags"))
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val out = graft.operators.Interpolate.aggregate(pts, "sum")
          val n = out.select((xxhash64(out.columns.map(col): _*))
            .as("h")).agg(count("h")).head.getLong(0)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"INTERP series=$s%-7d grid=$grid%-5d " +
          f"warm=${times.last._1}%6.2f s cold=${times.head._1}%6.2f s " +
          f"rows=${times.last._2}")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--interp-jitter")) {
      // The DECLARED worst case of the cross-series slot join:
      // fully-jittered stamps (every point a unique timestamp) make
      // the union grid ≈ total points, so the slot table is
      // |series| × points. This measures exactly how bad that is at
      // 1x/3x/10x points — and how much the reference's own
      // mitigation (downsample BEFORE cross-series aggregation,
      // which collapses the grid to the bucket count) buys.
      import org.apache.spark.sql.functions._
      val series = 100L
      for (p <- Seq(100000L, 300000L, 1000000L)) {
        val perSeries = p / series
        // ts = base + (k*S + s)*7 — pairwise distinct by construction
        val pts = spark.range(series).select(col("id").as("s"))
          .crossJoin(spark.range(perSeries).select(col("id").as("k")))
          .select(lit("m").as("metric"),
            (lit(1356998400000L) + (col("k") * series + col("s")) * 7L)
              .as("ts"),
            (col("s") + col("k")).cast("double").as("value"),
            lit(null).cast("long").as("value_l"),
            lit(false).as("is_int"),
            map(lit("host"), concat(lit("h"), col("s"))).as("tags"))
        def run(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
          val t0 = System.nanoTime()
          val out = graft.operators.Interpolate.aggregate(df, "sum")
          val n = out.agg(count(lit(1))).head.getLong(0)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val raw = (1 to 2).map(_ => run(pts)).last
        val ds = (1 to 2).map(_ => run(graft.operators.Downsample(pts,
          graft.query.DownsampleSpec.parse("1m-avg")))).last
        println(f"JITTER pts=$p%-8d raw=${raw._1}%7.2f s (grid=${raw._2}) " +
          f"ds1m=${ds._1}%6.2f s (grid=${ds._2})")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--exp-jitter")) {
      // ExpressionJoin's slot grid under the SAME declared worst case
      // as --interp-jitter: fully-jittered stamps across TWO variables
      // (every point a unique timestamp), so the lock-step grid ≈
      // total points and the slot table is |series| × grid. Measures
      // the raw path at 1x/3x/10x total points and what the
      // reference's own mitigation (downsample each variable BEFORE
      // the expression joins them) buys.
      import org.apache.spark.sql.functions._
      import graft.operators.ExpressionJoin
      import graft.operators.ExpressionJoin.VarSet
      val series = 100L
      for (p <- Seq(100000L, 300000L, 1000000L)) {
        val perSeries = p / series / 2 // two variables share the budget
        def varFrame(off: Long) = spark.range(series)
          .select(col("id").as("s"))
          .crossJoin(spark.range(perSeries).select(col("id").as("k")))
          .select(
            map(lit("host"), concat(lit("h"), col("s"))).as("tags"),
            array().cast("array<string>").as("agg_tags"),
            (lit(1356998400000L) + (col("k") * series + col("s")) * 14L
              + off).as("ts"),
            (col("s") + col("k")).cast("double").as("value"))
        def bucket1m(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("tags"), col("agg_tags"),
              (col("ts") - col("ts") % 60000L).as("ts"))
            .agg(avg(col("value")).as("value"))
        def run(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame): (Double, Long) = {
          val t0 = System.nanoTime()
          val joined = ExpressionJoin.union("e",
            Seq(VarSet("a", a, tsFill = 0.0), VarSet("b", b, tsFill = 0.0)),
            useQueryTags = false, includeAggTags = true)
          val out = joined.withColumn("value",
            col("__v_a") + col("__v_b"))
          val n = out.agg(count(lit(1))).head.getLong(0)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val raw = (1 to 2).map(_ =>
          run(varFrame(0L), varFrame(7L))).last
        val ds = (1 to 2).map(_ =>
          run(bucket1m(varFrame(0L)), bucket1m(varFrame(7L)))).last
        println(f"EXPJITTER pts=$p%-8d raw=${raw._1}%7.2f s " +
          f"(slots=${raw._2}) ds1m=${ds._1}%6.2f s (slots=${ds._2})")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--exp-width")) {
      // ExpressionJoin's slot grid at WIDTH: many joined series over a
      // fixed 10k-slot grid with ALIGNED stamps, so the whole cost is
      // the |keys| × |grid| slot table plus the broadcast key dim —
      // the axis --exp-jitter (which widens the GRID) does not probe.
      // Also exercises the opt-in broadcastKeyCeiling fail-fast.
      import org.apache.spark.sql.functions._
      import graft.operators.ExpressionJoin
      import graft.operators.ExpressionJoin.VarSet
      val grid = 10000L
      def varFrame(series: Long, off: Long) = spark.range(series)
        .select(col("id").as("s"))
        .crossJoin(spark.range(grid).select(col("id").as("k")))
        .select(
          map(lit("host"), concat(lit("h"), col("s"))).as("tags"),
          array().cast("array<string>").as("agg_tags"),
          (lit(1356998400000L) + col("k") * 60000L).as("ts"),
          (col("s") + col("k") + off).cast("double").as("value"))
      for (series <- Seq(1000L, 3000L, 10000L)) {
        def run(): (Double, Long) = {
          val t0 = System.nanoTime()
          val joined = ExpressionJoin.union("e",
            Seq(VarSet("a", varFrame(series, 0L), tsFill = 0.0),
                VarSet("b", varFrame(series, 7L), tsFill = 0.0)),
            useQueryTags = false, includeAggTags = true)
          val n = joined.withColumn("value", col("__v_a") + col("__v_b"))
            .agg(count(lit(1))).head.getLong(0)
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (secs, slots) = (1 to 2).map(_ => run()).last
        println(f"EXPWIDTH series=$series%-6d grid=$grid " +
          f"slots=$slots%-10d ${secs}%7.2f s  " +
          f"${slots / secs / 1e6}%6.1f M slots/s")
      }
      // KEY-DIM axis: the broadcast key table alone at 100k/1M joined
      // series over a tiny grid (slots stay ~10x series) — validates
      // the "keys are cheap, slots are the cost" claim at the scale
      // the ceiling doc quotes (~40 B/series flattened)
      for (series <- Seq(100000L, 1000000L)) {
        val tinyGrid = 10L
        def vf(off: Long) = spark.range(series).select(col("id").as("s"))
          .crossJoin(spark.range(tinyGrid).select(col("id").as("k")))
          .select(
            map(lit("host"), concat(lit("h"), col("s"))).as("tags"),
            array().cast("array<string>").as("agg_tags"),
            (lit(1356998400000L) + col("k") * 60000L).as("ts"),
            (col("s") + col("k") + off).cast("double").as("value"))
        val t0 = System.nanoTime()
        val n = ExpressionJoin.union("e",
          Seq(VarSet("a", vf(0L), tsFill = 0.0),
              VarSet("b", vf(7L), tsFill = 0.0)),
          useQueryTags = false, includeAggTags = true)
          .agg(count(lit(1))).head.getLong(0)
        println(f"EXPKEYS  series=$series%-8d grid=$tinyGrid " +
          f"slots=$n%-9d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
      // fail-fast: ceiling below the key count must throw the 400
      ExpressionJoin.broadcastKeyCeiling = 500L
      try {
        ExpressionJoin.union("e",
          Seq(VarSet("a", varFrame(1000L, 0L), tsFill = 0.0),
              VarSet("b", varFrame(1000L, 7L), tsFill = 0.0)),
          useQueryTags = false, includeAggTags = true).count()
        println("CEILING missed (BUG)")
      } catch {
        case e: IllegalArgumentException =>
          println(s"CEILING enforced: ${e.getMessage}")
      } finally ExpressionJoin.broadcastKeyCeiling = 0L
      spark.stop(); return
    }

    if (args.headOption.contains("--exec")) {
      // post-execution (AQE-final) plan: shows runtime stage/exchange
      // reuse that the static explain cannot
      args.tail.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count()
        val p = df.queryExecution.executedPlan.toString
        println(s"EXEC $name reusedExchange=${"ReusedExchange".r.findAllIn(p).size} " +
          s"tableCache=${"InMemoryTableScan".r.findAllIn(p).size} " +
          s"exchanges=${"Exchange".r.findAllIn(p).size}")
      }
      spark.stop(); return
    }

    if (args.headOption.contains("--plans")) {
      val names = if (args.length > 1) args.tail.toSeq
        else SparkEntry.queries.keys.toSeq.sorted
      names.foreach(audit)
      spark.stop(); return
    }

    val names = args.toSeq match {
      case Seq() => SparkEntry.queries.keys.toSeq.sorted
      case xs => xs
    }
    // pass 1: warmup (JIT + codegen); pass 2: steady state
    val cold = names.map(n => n -> time(n)).toMap
    spark.catalog.clearCache()
    val warm = names.map(n => n -> time(n)).toMap
    println(f"${"query"}%-28s cold     warm")
    names.sortBy(-warm(_)).foreach { n =>
      println(f"TIME $n%-28s ${cold(n)}%6.2f ${warm(n)}%8.2f")
    }
    println(f"TIME total ${cold.values.sum}%6.2f ${warm.values.sum}%8.2f")
    spark.stop()
  }
}
