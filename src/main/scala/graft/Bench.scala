package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints one JSON line per completed query (append-only
  * progress — a killed run still yields a parseable prefix) and a final
  * aggregate line `{"metric":"total",...}` compatible with earlier rounds.
  *
  * Wall budget: `SPARK_GRAFT_BENCH_BUDGET_S` (seconds, default 480) bounds
  * the time spent *launching* queries. Once exceeded, no new query (or
  * second pass) starts; already-running work finishes, remaining queries
  * are recorded in `skipped`, and the total line is still printed. This
  * exists because the round-13 driver run was killed at its own timeout
  * (rc=124) with zero output — a harness that emits nothing when killed
  * turns an environment hiccup into a lost gate.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet footer caches, so the
    // first timed query measures the query rather than JVM startup.
    // One warm query per input family (events-scan path, document
    // tokenize/hash path, embeddings vector path) — cheap queries that
    // share no results with the timed runs
    try Seq("q01_scan_filter", "t03_fingerprint", "s02_ivf_topk")
      .flatMap(SparkEntry.queries.get)
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_BENCH_ONLY: comma-separated subset for local profiling
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    // per-query time = MIN over `passes` warm executions. Two rounds
    // running, the per-round environment has degraded single passes
    // 2-3x and masqueraded as regression; the min of two warm passes
    // is robust to transient GC/page-cache/co-tenant noise while still
    // measuring a full execution.
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .map(_.toInt).getOrElse(2)
    val budgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S")
      .map(_.toDouble).getOrElse(480.0)
    val benchStart = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - benchStart) / 1e9
    val trace = sys.env.contains("SPARK_GRAFT_BENCH_TRACE")
    val todo = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    todo.foreach { case (name, fn) =>
      if (elapsed() >= budgetS) skipped += name
      else {
        def onePass(): (Double, Boolean) = {
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              // a broken query must read as broken, not as a fast query
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
            }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        val (t1, ok1) = onePass()
        // extra passes are noise reduction, not coverage — they stop at
        // HALF the budget so the first pass always gets the rest of it
        // (a degraded box should lose per-query noise floors, never
        // whole tail queries)
        val secs = if (!ok1 || passes < 2 || elapsed() >= budgetS * 0.5) t1
          else math.min(t1, (2 to passes).map(_ => onePass()._1).min)
        if (trace) {
          val rt = Runtime.getRuntime
          System.err.println(f"[bench] $name%-28s $secs%7.2f s  heapUsed=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%5d MB")
        }
        results(name) = secs
        // progress line: a killed run yields one parseable line per
        // completed query, so the driver can still reconstruct timings
        println(f"""{"metric":"query","name":"$name","value":$secs%.4f,"unit":"sec","ok":${!errors.contains(name)}}""")
        System.out.flush()
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val skippedJson = skipped.map(s => s"\"$s\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_errors":${errors.size},"skipped":$skippedJson,"n_skipped":${skipped.size},"budget_s":$budgetS,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
