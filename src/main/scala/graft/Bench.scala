package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicBoolean

/** Benchmark main. Prints one JSON line per completed query (append-only
  * progress — a killed run still yields a parseable prefix; a query
  * improved by a noise-reduction pass re-emits its line, so per-name
  * reconstruction is LAST-WINS), a final
  * aggregate line `{"metric":"total",...}` compatible with earlier rounds,
  * and — as the very LAST line — an ultra-compact
  * `{"metric":"summary",...}` (&lt;300 bytes) so a harness that captures
  * only a small tail of stdout always lands the headline numbers.
  *
  * Wall budget: `SPARK_GRAFT_BENCH_BUDGET_S` (seconds, default 480) bounds
  * the time spent *launching* queries. Pass structure is COVERAGE-FIRST:
  * pass 1 runs every query once before ANY noise-reduction pass starts, so
  * a degraded box loses timing precision, never tail coverage (the
  * round-14 driver box ran ~8 s/query vs ~0.9 s on a healthy box and the
  * old interleaved min-of-2 policy burned the budget on re-runs of the
  * head while 136 tail queries were skipped). Extra passes then run
  * per-query only while `elapsed + 2 * observed_first_pass_cost` stays
  * inside the budget — the 2x halves the apparent headroom, so estimate
  * error degrades to a skipped re-run, never a blown budget.
  *
  * Pace-projected TIME-BOXING closes the r15 gap (pass 1 on a 15-60x
  * degraded box tripped the budget after 159/197 and — because launch
  * order is cheap-first — the untimed tail was exactly the most
  * expensive queries): each pass-1 iteration projects
  * `elapsed + degradation_factor * remaining_hint_cost` where the
  * factor is measured elapsed-vs-hints over the queries already run.
  * Once the projection exceeds the budget, every remaining query runs
  * under a time-box of `remaining_budget * hint_share` (its own hint's
  * share of the remaining hint mass; floor
  * 0.5 s), enforced by running the count on a worker thread and
  * cancelling its Spark job group at the deadline. A boxed-out query
  * records its elapsed-at-cancel as a LOWER-BOUND time with
  * `"truncated":true` on its progress line (and is counted in the
  * summary's `n_trunc`) — so a degraded box yields 197 numbers, the
  * heavy tail flagged as floors, instead of 38 missing rows. A healthy
  * box never trips the projection and behaves exactly as before. The
  * compact summary line is also re-emitted every 25 completed queries,
  * so even a SIGKILL mid-run leaves a recent snapshot in the tail.
  *
  * A JVM shutdown hook prints the summary line if the normal path did not
  * (rc=124-style SIGTERM kills still yield a parseable tail; SIGKILL is
  * unsurvivable by design).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE size-based partition coalescing (guide §2.2/§9): the
      // default parallelismFirst=true refuses to coalesce below the
      // core count, so every tiny post-shuffle stage launches |cores|
      // tasks — pure scheduling overhead at sf0.1 and exactly the
      // wrong call on an oversubscribed box. Size-based coalescing is
      // also the production recommendation (partitions sized by
      // bytes, not core count); results are unchanged — coalescing
      // concatenates whole reducer partitions, it never re-partitions
      // rows. Declared as a session-conf change in OPTIMIZATION_r17.md
      // (timed methodology untouched).
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT + codegen + parquet footer caches, so the
    // first timed query measures the query rather than JVM startup.
    // One warm query per input family (events-scan path, document
    // tokenize/hash path, embeddings vector path) — cheap queries that
    // share no results with the timed runs. Round 17 added one per
    // MACHINERY family (window exec, join/meta pipeline, wire-parse
    // codegen): the r17 baseline showed ~40 s of C2/codegen warmup
    // landing on whichever cheap queries ran first (q19_lookup 19.25 s
    // cold vs 0.66 s warm) — that is JVM state, not query cost, and on
    // the driver's 480 s budget it was the difference between a clean
    // pass 1 and spurious time-boxing. Guide §1: measure the query.
    try Seq("q01_scan_filter", "t03_fingerprint", "s02_ivf_topk",
        "q12_moving_avg", "q19_lookup", "q97_normalize_put")
      .flatMap(SparkEntry.queries.get)
      .foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // SPARK_GRAFT_BENCH_ONLY: comma-separated subset for local profiling
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    // per-query time = MIN over up to `passes` warm executions (budget
    // permitting). The min of two warm passes is robust to transient
    // GC/page-cache/co-tenant noise while still measuring a full
    // execution; on a degraded box the coverage-first structure degrades
    // this to a single pass per query instead of dropping tail queries.
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .map(_.toInt).getOrElse(2)
    val budgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S")
      .map(_.toDouble).getOrElse(480.0)
    val benchStart = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - benchStart) / 1e9
    val trace = sys.env.contains("SPARK_GRAFT_BENCH_TRACE")
    // CHEAP-FIRST launch order, from bundled static cost hints (a
    // single-pass sf0.1 measurement; values only order, never report):
    // under a tripped budget the skipped tail is then the few most
    // expensive queries instead of whatever sorted last alphabetically
    // — on a 4x-degraded box this times ~3x more queries before the
    // budget ends. Queries without a hint sort at the hint median;
    // name breaks ties so the order stays deterministic.
    val hints: Map[String, Double] = {
      val in = getClass.getResourceAsStream("/graft/bench_cost_hints.txt")
      if (in == null) Map.empty
      else {
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.getLines().flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => scala.util.Try(k -> v.toDouble).toOption
            case _ => None
          }
        }.toMap finally src.close()
      }
    }
    val hintMedian =
      if (hints.isEmpty) 1.0
      else { val s = hints.values.toSeq.sorted; s(s.size / 2) }
    val todo = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy { case (n, _) => (hints.getOrElse(n, hintMedian), n) }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    val truncated = scala.collection.mutable.LinkedHashSet[String]()
    // guards results/errors/skipped between the main thread and the
    // shutdown hook: a SIGTERM mid-rehash must not crash the hook with
    // a ConcurrentModificationException — losing the summary line is
    // exactly the failure the hook exists to prevent
    val stateLock = new Object

    val summaryPrinted = new AtomicBoolean(false)
    // <300 bytes regardless of query count: counts, total, median, top-5.
    // MUST stay the last stdout line of a healthy run — the driver's tail
    // capture is small and the total line grows with the query count.
    def summaryLine(): String = stateLock.synchronized {
      val ts = results.values.toSeq.sorted
      val median = if (ts.isEmpty) 0.0
        else if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      val slowest = results.toSeq.sortBy(-_._2).take(5)
        .map { case (n, s) => f"""["$n",${s}%.2f]""" }.mkString("[", ",", "]")
      f"""{"metric":"summary","n":${results.size},"n_err":${errors.size},"n_skip":${skipped.size},"n_trunc":${truncated.size},"total_s":${results.values.sum}%.1f,"median_s":$median%.3f,"elapsed_s":${elapsed()}%.1f,"slowest":$slowest}"""
    }
    def printSummaryOnce(): Unit =
      if (summaryPrinted.compareAndSet(false, true)) {
        println(summaryLine()); System.out.flush()
      }
    Runtime.getRuntime.addShutdownHook(new Thread(() => printSummaryOnce()))

    def recordError(name: String, e: Throwable): Unit = {
      // a broken query must read as broken, not as a fast query
      stateLock.synchronized {
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
      }
      System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
    }
    def onePass(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => recordError(name, e); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // time-boxed execution: the count runs on a daemon worker thread
    // under a dedicated Spark job group; at the deadline the job group
    // is cancelled (interruptOnCancel also interrupts driver-side
    // waits, e.g. a streaming awaitTermination inside a query fn) and
    // the elapsed-at-cancel time is recorded as a LOWER BOUND. A task
    // that ignores cancellation for >30 s abandons its (daemon) thread
    // and the pool is replaced, so one stuck query cannot wedge the
    // remaining tail.
    def newPool() = java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => { val t = new Thread(r, "bench-boxed"); t.setDaemon(true); t })
    var boxPool = newPool()
    def onePassBoxed(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        boxS: Double): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val group = s"bench-box-$name"
      val fut = boxPool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
          try fn(spark, sfDir).count() finally spark.sparkContext.clearJobGroup()
        }
      })
      try {
        fut.get((boxS * 1000).toLong, java.util.concurrent.TimeUnit.MILLISECONDS)
        ((System.nanoTime() - t0) / 1e9, true)
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          fut.cancel(true)
          val t = (System.nanoTime() - t0) / 1e9
          stateLock.synchronized { truncated += name }
          try fut.get(30, java.util.concurrent.TimeUnit.SECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              boxPool = newPool() // abandon the stuck daemon thread
            case _: Throwable => () // cancellation surfacing: expected
          }
          (t, true)
        case e: java.util.concurrent.ExecutionException =>
          recordError(name, Option(e.getCause).getOrElse(e))
          ((System.nanoTime() - t0) / 1e9, false)
      }
    }
    def progressLine(name: String, secs: Double): Unit = {
      val tr = stateLock.synchronized(truncated.contains(name))
      println(f"""{"metric":"query","name":"$name","value":$secs%.4f,"unit":"sec","ok":${!errors.contains(name)},"truncated":$tr}""")
      System.out.flush()
    }
    def hintOf(name: String): Double = hints.getOrElse(name, hintMedian)
    // PASS 1 — coverage: every query exactly once. Pace projection
    // switches to per-query time-boxing the moment the measured
    // degradation factor says the plain pass will not fit the budget;
    // the hard skip only remains as a last-resort backstop (floor-
    // boxed queries can overrun the budget by at most 0.5 s each).
    var timeboxMode = false
    var doneHintSum = 0.0
    var remainingHintSum = todo.map { case (n, _) => hintOf(n) }.sum
    var sinceSummary = 0
    // post-JIT baseline for the degradation factor: even with the
    // widened warmup, the first ~10 timed queries absorb residual
    // C2/codegen compilation of engine machinery — measured 6.7x
    // apparent "degradation" over the first 9 queries of a healthy
    // run whose post-JIT marginal factor was ~1.2. The factor is
    // therefore measured from query 10 onward (elapsed and hint mass
    // both offset), so it estimates the MARGINAL seconds-per-hint-
    // second — the quantity the projection actually extrapolates.
    // A genuinely degraded box still trips within a handful of
    // post-baseline queries: its floor and its marginal rate are both
    // inflated, and the hard budget skip (1.25x) remains the backstop.
    var elapsedAtBase = 0.0
    var hintAtBase = 0.0
    todo.foreach { case (name, fn) =>
      val remainingCount = (todo.size - results.size - skipped.size).max(1)
      if (elapsed() >= budgetS * 1.25) stateLock.synchronized { skipped += name }
      else {
        if (results.size == 10) {
          elapsedAtBase = elapsed(); hintAtBase = doneHintSum
        }
        // The marginal factor is only meaningful once enough POST-
        // BASELINE hint mass has been consumed: with cheap-first
        // ordering the early queries carry milliseconds of hint, so a
        // small denominator measures the fixed per-query floor
        // (scheduling), not proportional degradation (the r16 guard's
        // lesson, re-learned against the baseline offset this round).
        if (!timeboxMode && results.size >= 15 &&
            doneHintSum - hintAtBase >= 2.0) {
          val factor = (elapsed() - elapsedAtBase) /
            (doneHintSum - hintAtBase)
          if (elapsed() + factor * remainingHintSum > budgetS) {
            timeboxMode = true
            System.err.println(f"[bench] pace projection ${elapsed() + factor * remainingHintSum}%.0f s > budget $budgetS%.0f s after ${results.size} queries (marginal degradation ${factor}%.1fx) — time-boxing the remaining $remainingCount")
          }
        }
        val (t, _) =
          if (timeboxMode) {
            // box = the larger of the query's proportional share of
            // the remaining budget (hint share — so the expensive
            // tail that cheap-first ordering saves for last gets a
            // slice sized to its own cost; r16's uniform budget/count
            // slice floored 10 tail rows at 8.5 s that a proportional
            // slice completes) and the uniform slice (so a cheap
            // query's sub-second share never truncates it while it
            // pays the fixed floor). Boxes are ceilings, not spend:
            // queries that finish early return their slack to the
            // remaining-budget term of every later box.
            val remB = budgetS - elapsed()
            val box = math.max(0.5, math.max(
              remB * (hintOf(name) / math.max(remainingHintSum, 1e-9)),
              remB / remainingCount))
            onePassBoxed(name, fn, math.min(box, math.max(remB, 0.5)))
          } else onePass(name, fn)
        stateLock.synchronized { results(name) = t }
        if (trace) {
          val rt = Runtime.getRuntime
          System.err.println(f"[bench] $name%-28s $t%7.2f s  heapUsed=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%5d MB")
        }
        progressLine(name, t)
        sinceSummary += 1
        if (sinceSummary >= 25) {
          // periodic snapshot (NOT the final line): a SIGKILL tail
          // capture still lands a recent summary
          sinceSummary = 0
          println(summaryLine()); System.out.flush()
        }
      }
      doneHintSum += hintOf(name)
      remainingHintSum -= hintOf(name)
    }
    // PASSES 2..n — noise reduction, never at coverage's expense: only
    // after a complete first pass, and per-query only while the budget
    // holds twice the query's observed cost (conservative headroom; an
    // estimate that is off by <2x still cannot overrun).
    if (passes >= 2 && skipped.isEmpty) {
      (2 to passes).foreach { _ =>
        todo.foreach { case (name, fn) =>
          // a truncated time is a lower bound from a cancelled run —
          // an unboxed re-run would cost the query's FULL degraded
          // time, exactly the overrun time-boxing exists to prevent
          if (results.contains(name) && !errors.contains(name) &&
              !truncated.contains(name) &&
              elapsed() + 2 * results(name) < budgetS) {
            val (t, ok) = onePass(name, fn)
            if (ok && t < results(name)) {
              stateLock.synchronized { results(name) = t }
              // re-emitted line for an improved time: per-name
              // reconstruction is LAST-WINS (the total line is
              // authoritative for sums)
              progressLine(name, t)
            }
          }
        }
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val skippedJson = skipped.map(s => s"\"$s\"").mkString("[", ",", "]")
    val truncJson = truncated.map(s => s"\"$s\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_errors":${errors.size},"skipped":$skippedJson,"n_skipped":${skipped.size},"truncated":$truncJson,"n_truncated":${truncated.size},"budget_s":$budgetS,"sf":"$sfDir"}""")
    printSummaryOnce()
    spark.stop()
  }
}
