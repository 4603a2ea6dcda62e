package graft.meta

import org.apache.spark.sql.DataFrame

/**
 * Search plugin surface — the indexing hooks an external search system
 * (the reference ships an Elasticsearch plugin) subscribes to
 * (reference: src/search/SearchPlugin.java:51-164 — indexTSMeta /
 * deleteTSMeta / indexUIDMeta / deleteUIDMeta / indexAnnotation /
 * deleteAnnotation / executeQuery).
 *
 * Spark-native shape: hooks receive DataFrames (the edit batch), not
 * single POJOs — an indexer that writes to an external system fans the
 * batch out with `foreachPartition` itself, so a 100 TB backfill of
 * meta rows indexes in parallel rather than one callback per row. The
 * lookup hook can serve a query from the external index by returning
 * a replacement DataFrame; `None` falls through to the engine's own
 * relational lookup ([[Introspect.seriesMeta]] joins), exactly the
 * reference's "plugin may resolve the query, else scan" split
 * (SearchPlugin.resolveTSQuery default returning null).
 *
 * Every mutation path notifies plugins with its edit batch:
 * [[Annotations.upsert]]/[[Annotations.delete]] and the
 * [[Uids]] UIDMeta/TSMeta upserts/deletes call the matching notify.
 */
trait SearchPlugin {
  def indexAnnotation(edits: DataFrame): Unit = ()
  def deleteAnnotation(ids: DataFrame): Unit = ()
  def indexUidMeta(edits: DataFrame): Unit = ()
  def deleteUidMeta(kind: String, uid: Long): Unit = ()
  def indexTsMeta(edits: DataFrame): Unit = ()
  def deleteTsMeta(tsuid: String): Unit = ()

  /** Serve a lookup (metric + tag filter semantics of
    * /api/search/lookup) from the external index; None = engine scan. */
  def executeLookup(metric: String, tags: Map[String, String])
      : Option[DataFrame] = None

  /** Serve a non-lookup `/api/search/<type>` query (reference
    * SearchPlugin.executeQuery): tsmeta / tsmeta_summary / tsuids /
    * uidmeta / annotation. None = this plugin doesn't serve it. */
  def executeSearch(searchType: String, query: String, limit: Int,
                    startIndex: Int): Option[DataFrame] = None
}

object SearchPlugins {

  private val plugins =
    new java.util.concurrent.CopyOnWriteArrayList[SearchPlugin]()

  /** Register a plugin (the reference's tsd.search.enable +
    * tsd.search.plugin config pair, done as a runtime call). */
  def register(p: SearchPlugin): Unit = plugins.add(p)

  /** Deregister (test hook / plugin shutdown). */
  def deregister(p: SearchPlugin): Unit = plugins.remove(p)

  private[meta] def each(f: SearchPlugin => Unit): Unit =
    plugins.forEach(p => f(p))

  /** First plugin that resolves the lookup wins; None = engine scan. */
  def lookup(metric: String, tags: Map[String, String])
      : Option[DataFrame] = {
    val it = plugins.iterator()
    while (it.hasNext) {
      val r = it.next().executeLookup(metric, tags)
      if (r.isDefined) return r
    }
    None
  }

  /** The `/api/search/<type>` set (reference SearchQuery
    * .parseSearchType, src/search/SearchQuery.java:156-176 — same
    * accepted names and error texts). */
  def parseSearchType(t: String): String = {
    require(t != null && t.nonEmpty, "Type provided was null or empty")
    val lc = t.toLowerCase
    require(Set("tsmeta", "tsmeta_summary", "tsuids", "uidmeta",
      "annotation", "lookup").contains(lc), s"Unknown type: $t")
    lc
  }

  /**
   * Dispatch a non-lookup search to the registered plugins (reference
   * SearchRpc → TSDB.executeSearch: every type except LOOKUP is
   * plugin-served; with no plugin configured the reference throws
   * IllegalStateException("Searching has not been enabled on this
   * TSD") — same contract here). Lookup never reaches this: it has a
   * native engine path (Introspect.lookup).
   */
  def search(searchType: String, query: String, limit: Int = 25,
             startIndex: Int = 0): DataFrame = {
    val st = parseSearchType(searchType)
    require(st != "lookup",
      "lookup is engine-served; use Introspect.lookup")
    val it = plugins.iterator()
    while (it.hasNext) {
      val r = it.next().executeSearch(st, query, limit, startIndex)
      if (r.isDefined) return r.get
    }
    throw new IllegalStateException(
      "Searching has not been enabled on this TSD")
  }

  /**
   * `metric{k=v,...}` for the LOOKUP form, either pair side optional
   * (reference Tags.parseWithMetric(List) overload, src/core/Tags
   * .java:175-209 + the pair-list parse :111-129): `k=` is a bare
   * tagk, `=v` a bare tagv, `{...}` alone means any metric. Returns
   * (metric — empty = absent, pairs with "" for the absent side);
   * error messages verbatim.
   */
  def parseLookupM(m: String): (String, Seq[(String, String)]) = {
    val curly = m.indexOf('{')
    if (curly < 0) {
      if (m.isEmpty)
        throw new IllegalArgumentException("Metric string was empty")
      return (m, Seq.empty)
    }
    if (m.last != '}')
      throw new IllegalArgumentException(s"Missing '}' at the end of: $m")
    if (curly == m.length - 2) { // "foo{}"
      if (m.head == '{')
        throw new IllegalArgumentException(s"Missing metric and tags: $m")
      return (m.substring(0, m.length - 2), Seq.empty)
    }
    val pairs = m.substring(curly + 1, m.length - 1).split(",", -1)
      .toSeq.map { tag =>
        def fail(msg: String) = throw new IllegalArgumentException(
          s"When parsing tag '$tag': $msg")
        if (tag.length < 2) fail("Missing tag pair")
        if (tag.head == '=') ("", tag.substring(1))
        else if (tag.last == '=') (tag.substring(0, tag.length - 1), "")
        else {
          val kv = tag.split("=", -1)
          if (kv.length != 2 || kv(0).isEmpty || kv(1).isEmpty)
            fail(s"invalid tag: $tag")
          (kv(0), kv(1))
        }
      }
    ((if (m.head == '{') "" else m.substring(0, curly)), pairs)
  }

  /**
   * The V1 search-results envelope (reference formatSearchResultsV1 →
   * Jackson over the SearchQuery POJO getters, src/search/SearchQuery
   * .java:181-231: type, query, metric?, tags?, limit, startIndex,
   * totalResults, time, results). `results` renders each row as a JSON
   * object of its columns (map columns → nested objects, key-sorted) —
   * the reference's results list carries whatever POJOs the plugin or
   * lookup produced. `time` is the elapsed millis the RPC measured;
   * the serving tier passes its own stopwatch.
   */
  def searchJson(searchType: String, query: String, results: DataFrame,
                 limit: Int = 25, startIndex: Int = 0,
                 timeMs: Double = 0.0): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("type", parseSearchType(searchType).toUpperCase)
    root.put("query", query)
    root.put("limit", limit)
    root.put("startIndex", startIndex)
    val rows = results.collect()
    root.put("totalResults", rows.length)
    root.put("time", timeMs)
    val arr = root.putArray("results")
    val schema = results.schema
    rows.foreach { r =>
      val o = arr.addObject()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!r.isNullAt(i)) f.dataType match {
          case _: org.apache.spark.sql.types.MapType =>
            val m = o.putObject(f.name)
            r.getAs[Map[String, String]](i).toSeq.sortBy(_._1)
              .foreach { case (k, v) => m.put(k, v) }
          case org.apache.spark.sql.types.LongType =>
            o.put(f.name, r.getLong(i))
          case org.apache.spark.sql.types.IntegerType =>
            o.put(f.name, r.getInt(i))
          case org.apache.spark.sql.types.DoubleType =>
            o.put(f.name, r.getDouble(i))
          case _ => o.put(f.name, String.valueOf(r.get(i)))
        }
      }
    }
    mapper.writeValueAsString(root)
  }

  /**
   * The `/api/search/<type>` HTTP endpoint (reference SearchRpc
   * .execute, src/tsd/SearchRpc.java:57-96): GET/POST only; the
   * sub-path picks the search type; `lookup` is engine-served from the
   * meta scan ([[Introspect.lookupPairs]] — the reference's
   * processLookup reads the tsdb-meta table directly, never the
   * plugin) while every other type dispatches to the configured search
   * plugin and is a clean error without one. Query-string form: `m=`
   * for lookup (Tags.parseWithMetric grammar), required `query=` plus
   * optional `limit=`/`start_index=` for the rest; a POST body
   * replaces the query string (parseSearchQueryV1's POJO:
   * query/limit/startIndex). All error messages verbatim from the
   * reference (BadRequestException texts).
   */
  def searchRpc(points: DataFrame, endpoint: String,
                params: Map[String, String] = Map.empty,
                method: String = "GET",
                body: Option[String] = None,
                meta: Option[DataFrame] = None): DataFrame = {
    method.toUpperCase match {
      case "GET" | "POST" =>
      case other => throw new IllegalArgumentException(
        s"The HTTP method [$other] is not permitted for this endpoint")
    }
    val st =
      try parseSearchType(endpoint)
      catch { case _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          "Invalid search query type supplied")
      }
    // POST content replaces the query string (SearchRpc:74-78)
    case class Parsed(query: String, limit: Int, startIndex: Int,
                      metric: String, pairs: Seq[(String, String)])
    val parsed = body match {
      case Some(json) =>
        require(json.nonEmpty, "Missing message content")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(json)
        val q = Option(node.get("query")).map(_.asText("")).getOrElse("")
        val (met, prs) =
          if (st == "lookup" && q.nonEmpty) parseLookupM(q) else ("", Nil)
        // SearchQuery's ctor sets limit = 25 (SearchQuery.java:91);
        // Jackson binding leaves it when the body omits the field, so
        // 25 is the default on BOTH parse paths. startIndex is a bare
        // int field → 0.
        Parsed(q,
          Option(node.get("limit")).map(_.asInt(25)).getOrElse(25),
          Option(node.get("startIndex")).map(_.asInt(0)).getOrElse(0),
          met, prs)
      case None =>
        def num(name: String, dflt: Int): Int =
          params.get(name).map { s =>
            try s.toInt catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"Unable to convert '$name' to a valid number")
            }
          }.getOrElse(dflt)
        if (st == "lookup") {
          val m = params.getOrElse("m", throw new IllegalArgumentException(
            "Missing parameter <code>m</code>"))
          val (met, prs) =
            try parseLookupM(m)
            catch { case _: IllegalArgumentException =>
              throw new IllegalArgumentException("Unable to parse query")
            }
          // parseQueryString starts from new SearchQuery() whose ctor
          // sets limit = 25 (SearchRpc.java:106, SearchQuery.java:91)
          Parsed(m, num("limit", 25), 0, met, prs)
        } else {
          val q = params.getOrElse("query",
            throw new IllegalArgumentException(
              "Missing parameter <code>query</code>"))
          Parsed(q, num("limit", 25), num("start_index", 0), "", Nil)
        }
    }
    if (st == "lookup") {
      if (parsed.metric.isEmpty && parsed.pairs.isEmpty)
        throw new IllegalArgumentException(
          "Missing metric and tags. Please supply at least one value.")
      val found = Introspect.lookupPairs(points, parsed.metric,
        parsed.pairs, meta)
      // the reference caps lookup by rows scanned per salt bucket
      // (TimeSeriesLookup.java:176-218, storage-order-dependent); the
      // deterministic counterpart is a canonical (metric, tags) order
      // under TakeOrderedAndProject
      if (parsed.limit > 0)
        found.orderBy(org.apache.spark.sql.functions.col("metric"),
          org.apache.spark.sql.functions.to_json(
            org.apache.spark.sql.functions.array_sort(
              org.apache.spark.sql.functions.map_entries(
                org.apache.spark.sql.functions.col("tags")))))
          .limit(parsed.limit)
      else found
    } else
      try search(st, parsed.query, parsed.limit, parsed.startIndex)
      catch { case _: IllegalStateException =>
        throw new IllegalArgumentException("Searching is not enabled")
      }
  }
}
