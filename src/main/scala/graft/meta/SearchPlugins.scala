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
}
