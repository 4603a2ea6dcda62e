package graft.query

import java.util.regex.Pattern

/**
 * Per-metric query limit overrides by regex match (reference
 * QueryLimitOverride, src/query/QueryLimitOverride.java:52-340): a set
 * of `{regex, byteLimit, dataPointsLimit}` items loaded from a JSON
 * config file, consulted per query to pick the scan-byte and
 * data-point budgets the engine guards enforce
 * ([[graft.Engine.withMaxScanBytes]] / `withMaxDataPoints`). The first
 * matching item wins; no match (or a null/empty metric) falls back to
 * the defaults. Matching is `Matcher.find`, not full-match
 * (QueryLimitOverrideItem.matches:318).
 *
 * Spark-native shape: the registry is driver-side state sized by the
 * override file (tens of rows), consulted once per query at plan-build
 * time — never shipped to executors. The reference reloads on a
 * HashedWheelTimer every `tsd.query.limits.overrides.interval`
 * seconds; the serving tier owns scheduling here and calls [[reload]]
 * — same diff-merge semantics (changed items replaced, absent items
 * removed, a missing/corrupt file keeps the current set, the ctor
 * never fails on a bad file).
 */
class QueryLimits(defaultByteLimit: Long = 0L,
                  defaultDataPointsLimit: Long = 0L,
                  fileLocation: Option[String] = None) {
  if (defaultByteLimit < 0) throw new IllegalArgumentException(
    "The default byte limit cannot be negative")
  if (defaultDataPointsLimit < 0) throw new IllegalArgumentException(
    "The default data points limit cannot be negative")

  /** One override row; the regex must compile (setRegex throws
    * PatternSyntaxException in the reference). */
  case class Item(regex: String, byteLimit: Long, dataPointsLimit: Long) {
    private[QueryLimits] val pattern = Pattern.compile(regex)
    def matches(s: String): Boolean =
      s != null && s.nonEmpty && regex.nonEmpty &&
        pattern.matcher(s).find()
  }

  // keyed on the raw regex, exactly the reference's update key
  private val overrides =
    new java.util.concurrent.ConcurrentHashMap[String, Item]()

  locally { if (fileLocation.exists(_.nonEmpty)) reload() }

  /** The current override set (reference getLimits). */
  def limits: Seq[Item] = {
    import scala.jdk.CollectionConverters._
    overrides.values().asScala.toSeq
  }

  def byteLimit(metric: String): Long =
    if (metric == null || metric.isEmpty) defaultByteLimit
    else limits.find(_.matches(metric)).map(_.byteLimit)
      .getOrElse(defaultByteLimit)

  def dataPointLimit(metric: String): Long =
    if (metric == null || metric.isEmpty) defaultDataPointsLimit
    else limits.find(_.matches(metric)).map(_.dataPointsLimit)
      .getOrElse(defaultDataPointsLimit)

  /**
   * Re-read the config file: items whose regex is new or whose limits
   * changed replace the stored item; stored items absent from the file
   * are removed (loadFromFile's two passes). A missing file, empty
   * body, unparsable JSON, or uncompilable regex leaves the current
   * set untouched — the reference logs and continues
   * (QueryLimitOverride.java:196-243).
   */
  def reload(): Unit = fileLocation.filter(_.nonEmpty).foreach { loc =>
    val f = new java.io.File(loc)
    if (f.exists()) {
      try {
        val raw = new String(
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        if (raw.nonEmpty) applyItems(parseItems(raw))
      } catch { case _: Exception => /* keep the current set */ }
    }
  }

  /** Parse the JSON array body (Jackson set-of-POJO binding:
    * `[{"regex":..,"byteLimit":..,"dataPointsLimit":..},..]`). */
  private[query] def parseItems(json: String): Seq[Item] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    if (node == null || !node.isArray)
      throw new IllegalArgumentException("expected a JSON array")
    import scala.jdk.CollectionConverters._
    node.elements().asScala.map { n =>
      Item(n.path("regex").asText(""),
        n.path("byteLimit").asLong(0L),
        n.path("dataPointsLimit").asLong(0L))
    }.toSeq
  }

  /** Test hook + the merge body: same visible semantics as a file
    * reload with this content. */
  private[query] def applyItems(items: Seq[Item]): Unit = {
    items.foreach { it =>
      val existing = overrides.get(it.regex)
      if (existing == null || existing != it) overrides.put(it.regex, it)
    }
    val keep = items.map(_.regex).toSet
    overrides.keySet().removeIf(k => !keep.contains(k))
  }
}
