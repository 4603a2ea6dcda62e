package graft.query

/**
 * `/api/stats/query` — the daemon's running/completed query-stats ring
 * (reference QueryStats, src/stats/QueryStats.java:58-897, routed by
 * StatsRpc.printQueryStats, src/tsd/StatsRpc.java:90-91,326-340:
 * `formatQueryStatsV1(QueryStats.getRunningAndCompleteStats())`).
 *
 * Every served query registers a [[QueryStats]] on arrival (keyed by
 * remote endpoint + query) and moves into a size-capped
 * completed-queries cache when its response is serialized (keyed by
 * remote + query + response code; re-running the same completed query
 * increments its `executed` counter instead of adding a row —
 * QueryStats.java:363-373). The endpoint dumps both sets as one JSON
 * document.
 *
 * Scope note: the reference also aggregates per-SCANNER stats (one
 * HBase scanner per salt bucket) into the per-sub-query and overall
 * max/avg slots. Spark has no user-visible scanner layer — task-level
 * metrics live in the Spark UI/event log — so the scanner dimension is
 * subsumed and only the sub-query → overall rollup is modeled
 * (aggQueryStats' last loop, QueryStats.java:538-579). The AGG_MAP's
 * own slot bugs are kept verbatim where that rollup reads them (e.g.
 * UID_TO_STRING_TIME writes its max into BOTH pair slots,
 * QueryStats.java:216-218; QUERY_SCAN_TIME lists (max, avg) in the
 * (avg, max) pair order, :222-223 — so the avg lands in
 * `maxQueryScanTime` and the max in `avgQueryScanTime`).
 *
 * Clocks are injectable so the vectors from TestQueryStats.java pin
 * exact timestamps; production callers use the defaults.
 */
object QueryStatsLog {

  /** (wire name, is_time) port of the QueryStat enum
    * (QueryStats.java:132-190). Time stats are recorded in NANOS and
    * serialized as floating millis (DateTime.msFromNano). */
  val Stats: Seq[(String, Boolean)] = Seq(
    "stringToUidTime" -> true,
    "columnsFromStorage" -> false,
    "rowsFromStorage" -> false,
    "bytesFromStorage" -> false,
    "successfulScan" -> false,
    "dpsPreFilter" -> false,
    "rowsPreFilter" -> false,
    "dpsPostFilter" -> false,
    "rowsPostFilter" -> false,
    "scannerUidToStringTime" -> true,
    "compactionTime" -> true,
    "hbaseTime" -> true,
    "uidPairsResolved" -> false,
    "scannerTime" -> true,
    "saltScannerMergeTime" -> true,
    "queryScanTime" -> true,
    "groupByTime" -> true,
    "uidToStringTime" -> true,
    "emittedDPs" -> false,
    "nanDPs" -> false,
    "aggregationTime" -> true,
    "serializationTime" -> true,
    "processingPreWriteTime" -> true,
    "totalTime" -> true,
    "maxHBaseTime" -> true, "avgHBaseTime" -> true,
    "maxScannerTime" -> true, "avgScannerTime" -> true,
    "maxUidToStringTime" -> true, "avgUidToStringTime" -> true,
    "maxCompactionTime" -> true, "avgCompactionTime" -> true,
    "maxScannerUidToStringTime" -> true,
    "avgScannerUidToStringTime" -> true,
    "maxSaltScannerMergeTime" -> true, "avgSaltScannerMergeTime" -> true,
    "maxQueryScanTime" -> true, "avgQueryScanTime" -> true,
    "maxAggregationTime" -> true, "avgAggregationTime" -> true,
    "maxSerializationTime" -> true, "avgSerializationTime" -> true)

  private val isTime: Map[String, Boolean] = Stats.toMap

  /** AGG_MAP (QueryStats.java:210-230), slots verbatim INCLUDING the
    * reference's own mis-wirings: (first, second) receive (sum/size,
    * max) respectively. */
  private val aggMap: Map[String, (String, String)] = Map(
    "hbaseTime" -> (("avgHBaseTime", "maxHBaseTime")),
    "scannerTime" -> (("avgScannerTime", "maxHBaseTime")),
    "uidToStringTime" -> (("maxUidToStringTime", "maxUidToStringTime")),
    "scannerUidToStringTime" ->
      (("maxScannerUidToStringTime", "avgScannerUidToStringTime")),
    "queryScanTime" -> (("maxQueryScanTime", "avgQueryScanTime")),
    "aggregationTime" -> (("maxAggregationTime", "avgAggregationTime")),
    "serializationTime" ->
      (("maxSerializationTime", "avgSerializationTime")))

  /** Completed-queries ring size (COMPLETED_QUERY_CACHE_SIZE). */
  val CompletedCacheSize = 256

  @volatile private var enableDuplicates = true

  /** tsd.core.stats_with_port's sibling switch: whether a duplicate
    * in-flight (remote, query) warns (default) or throws
    * (QueryStats.setEnableDuplicates). */
  def setEnableDuplicates(b: Boolean): Unit = enableDuplicates = b

  private val running =
    new java.util.LinkedHashMap[Int, QueryStats]()
  private val completed =
    new java.util.LinkedHashMap[Int, QueryStats](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, QueryStats]): Boolean =
        size() > CompletedCacheSize
    }

  /** Test / dropcaches hook — the reference tests Whitebox-reset the
    * static maps before each vector. */
  def reset(): Unit = synchronized {
    running.clear(); completed.clear(); enableDuplicates = true
  }

  private[query] def register(qs: QueryStats): Unit = synchronized {
    if (running.containsKey(qs.identityHash)) {
      if (!enableDuplicates)
        throw new IllegalStateException(
          s"Query is already executing for endpoint: ${qs.remoteAddress}")
      // duplicates allowed: the reference logs a warning and the newer
      // registration replaces the map entry (putIfAbsent leaves the
      // OLD one; keep that)
    } else running.put(qs.identityHash, qs)
  }

  private[query] def complete(qs: QueryStats, cacheHash: Int): Unit =
    synchronized {
      running.remove(qs.identityHash)
      val old = completed.get(cacheHash)
      if (old == null) completed.put(cacheHash, qs)
      else old.bumpExecuted()
    }

  /** The number of currently running queries. */
  def numRunning: Int = synchronized(running.size())

  /**
   * The `/api/stats/query` document body
   * (QueryStats.getRunningAndCompleteStats, :398-430): running rows as
   * {query, remote, user, headers, queryStart, elapsed}, completed
   * rows as the full POJO serialization. TreeMap root → "completed"
   * sorts before "running".
   */
  def getRunningAndCompleteStats(
      nowNanos: Long = System.nanoTime()): String = synchronized {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    import scala.jdk.CollectionConverters._
    val comp = root.putArray("completed")
    completed.values().asScala.foreach(q => comp.add(q.toNode(mapper)))
    val run = root.putArray("running")
    running.values().asScala.foreach { q =>
      val o = run.addObject()
      o.put("query", q.queryText)
      o.put("remote", q.remoteAddress)
      o.put("user", q.user.orNull)
      val h = o.putObject("headers")
      q.headers.toSeq.sortBy(_._1).foreach { case (k, v) => h.put(k, v) }
      o.put("queryStart", q.queryStartMs)
      o.put("elapsed", (nowNanos - q.queryStartNs) / 1e6)
    }
    mapper.writeValueAsString(root)
  }

  /**
   * One served query's stats (reference QueryStats POJO). Identity =
   * (remote, query); the completed-cache key additionally folds in the
   * response code. `queryText` is the query's serialized form — the
   * reference keys on TSQuery.hashCode over its fields; any stable
   * rendering of the request is the same contract.
   */
  final class QueryStats(val remoteAddress: String, val queryText: String,
                         val headers: Map[String, String] = Map.empty,
                         val user: Option[String] = None,
                         nanoClock: () => Long = () => System.nanoTime(),
                         msClock: () => Long = () => System.currentTimeMillis()) {
    if (remoteAddress == null || remoteAddress.isEmpty)
      throw new IllegalArgumentException("Remote address was null or empty")
    if (queryText == null)
      throw new IllegalArgumentException("Query object was null")

    private[query] val queryStartNs: Long = nanoClock()
    private[query] val queryStartMs: Long = msClock()
    private var completedMs: Long = 0L
    private var responseCode: Int = 0
    private var responseReason: String = null
    private var exceptionText: Option[(String, String)] = None // (msg, frame)
    private var executed: Long = 1L
    private var sentToClient: Boolean = false
    private val overall =
      scala.collection.mutable.LinkedHashMap[String, Long]()
    private val subQueries =
      scala.collection.mutable.LinkedHashMap[Int,
        scala.collection.mutable.LinkedHashMap[String, Long]]()

    private[query] def identityHash: Int =
      remoteAddress.hashCode ^ queryText.hashCode
    private[query] def bumpExecuted(): Unit = executed += 1

    QueryStatsLog.register(this)

    /** Overall stat; time stats in nanos (QueryStats.addStat). */
    def addStat(name: String, value: Long): Unit = {
      require(isTime.contains(name), s"unknown stat: $name")
      overall(name) = value
    }

    /** Per-sub-query stat, replacing (QueryStats.addStat(idx, ...)). */
    def addStat(queryIndex: Int, name: String, value: Long): Unit = {
      require(isTime.contains(name), s"unknown stat: $name")
      subQueries.getOrElseUpdate(queryIndex,
        scala.collection.mutable.LinkedHashMap[String, Long]())(name) = value
    }

    /** Per-sub-query cumulative stat (QueryStats.updateStat). */
    def updateStat(queryIndex: Int, name: String, value: Long): Unit = {
      require(isTime.contains(name), s"unknown stat: $name")
      val qs = subQueries.getOrElseUpdate(queryIndex,
        scala.collection.mutable.LinkedHashMap[String, Long]())
      qs(name) = qs.getOrElse(name, 0L) + value
    }

    /** -1 when the stat was never recorded (QueryStats.getStat). */
    def getStat(name: String): Long = overall.getOrElse(name, -1L)

    /** Floating millis; NaN when absent; non-time stats are the
      * reference's IllegalArgumentException (getTimeStat:883-891). */
    def getTimeStat(name: String): Double = {
      if (!isTime.getOrElse(name, false))
        throw new IllegalArgumentException("The stat is not a time stat")
      overall.get(name).map(_ / 1e6).getOrElse(Double.NaN)
    }

    /** getException (:718-726): "null" when none, else the message
      * plus the first stack frame on a new line. */
    def getException: String = exceptionText match {
      case None => "null"
      case Some((msg, "")) => msg
      case Some((msg, frame)) => s"$msg\n$frame"
    }
    def getHttpResponseCode: Int = responseCode
    def getExecuted: Long = executed
    def getSentToClient: Boolean = sentToClient
    def getQueryStartTimestamp: Long = queryStartMs
    def getQueryCompletedTimestamp: Long = completedMs

    /** markSerializationSuccessful — OK/200, no exception. */
    def markSerializationSuccessful(): Unit = markSerialized(200, "OK", null)

    /** Completion: stamps processingPreWriteTime, rolls sub-query
      * stats up, moves running → completed (QueryStats.markSerialized
      * :337-374). */
    def markSerialized(code: Int, reason: String,
                       exception: Throwable): Unit = {
      this.responseCode = code
      this.responseReason = reason
      this.exceptionText = Option(exception).map { e =>
        (e.getMessage,
          e.getStackTrace.headOption.map(_.toString).getOrElse(""))
      }
      completedMs = msClock()
      overall("processingPreWriteTime") = nanoClock() - queryStartNs
      aggSubQueryStats()
      QueryStatsLog.complete(this,
        identityHash ^ s"$code $reason".hashCode)
    }

    /** markSent: total time + the sent flag (:377-383). */
    def markSent(): Unit = {
      sentToClient = true
      overall("totalTime") = nanoClock() - queryStartNs
    }

    /** markSendFailed: total time, sent flag stays false (:387-391). */
    def markSendFailed(): Unit =
      overall("totalTime") = nanoClock() - queryStartNs

    /** The sub-query → overall rollup (aggQueryStats' last loop,
      * QueryStats.java:538-579): counters sum into overall; AGG_MAP'd
      * time stats write (sum/numSubQueries, max) into their two slots
      * — mis-wired slots and all. */
    private def aggSubQueryStats(): Unit = {
      if (subQueries.isEmpty) return
      val cum = scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
      for (qs <- subQueries.values; (name, v) <- qs) {
        if (isTime(name)) {
          if (aggMap.contains(name)) {
            val (s, m) = cum.getOrElse(name, (0L, Long.MinValue))
            cum(name) = (s + v, math.max(m, v))
          }
        } else overall(name) = overall.getOrElse(name, 0L) + v
      }
      for ((name, (sum, max)) <- cum) {
        val (first, second) = aggMap(name)
        overall(first) = sum / subQueries.size
        overall(second) = max
      }
    }

    /** getStats (:769-793): TreeMap of overall stats, time stats as
      * floating ms, sub queries nested as queryIdx_%02d. */
    private[query] def toNode(
        mapper: com.fasterxml.jackson.databind.ObjectMapper)
        : com.fasterxml.jackson.databind.node.ObjectNode = {
      val o = mapper.createObjectNode()
      o.put("query", queryText)
      o.put("remote", remoteAddress)
      o.put("user", user.orNull)
      val h = o.putObject("requestHeaders")
      headers.toSeq.sortBy(_._1).foreach { case (k, v) => h.put(k, v) }
      o.put("executed", executed)
      o.put("queryStartTimestamp", queryStartMs)
      o.put("queryCompletedTimestamp", completedMs)
      val resp = o.putObject("httpResponse")
      resp.put("code", responseCode)
      resp.put("reasonPhrase", responseReason)
      o.put("exception", getException)
      o.put("sentToClient", sentToClient)
      val stats = o.putObject("stats")
      overall.toSeq.sortBy(_._1).foreach { case (name, v) =>
        if (isTime(name)) stats.put(name, v / 1e6) else stats.put(name, v)
      }
      subQueries.toSeq.sortBy(_._1).foreach { case (idx, qs) =>
        val q = stats.putObject(f"queryIdx_$idx%02d")
        q.put("queryIndex", idx)
        qs.toSeq.sortBy(_._1).foreach { case (name, v) =>
          if (isTime(name)) q.put(name, v / 1e6) else q.put(name, v)
        }
      }
      o
    }
  }
}
