package graft.query

import com.fasterxml.jackson.databind.ObjectMapper

/**
 * HTTP JSON serdes helpers — the parse/format semantics of the
 * reference's JSON serializer plugin (reference
 * src/tsd/HttpJsonSerializer.java:204-230 parseSuggestV1,
 * :245-258 parseUidRenameV1, :550-611 formatSuggestV1/
 * formatUidRenameV1, src/tsd/HttpQuery.java serializeJSON JSONP
 * wrapping). The transport itself (Netty) is out of scope; these are
 * the body-level contracts every endpoint shares: a missing/empty
 * body and unparsable JSON are distinct client errors, suggest/rename
 * bodies are flat string maps, and any response can be wrapped in a
 * JSONP callback.
 */
object Serdes {

  private val mapper = new ObjectMapper()

  /** Parse a flat JSON-object body into a string map (scalar values
    * coerced to strings, as Jackson's HashMap<String,String> binding
    * does). Reference parity: null/empty body → "Missing message
    * content"; non-object or malformed JSON → "Unable to parse the
    * given JSON". */
  def parseStringMap(body: String): Map[String, String] = {
    if (body == null || body.isEmpty)
      throw new IllegalArgumentException("Missing message content")
    val node =
      try mapper.readTree(body)
      catch { case _: Exception =>
        throw new IllegalArgumentException("Unable to parse the given JSON") }
    if (node == null || !node.isObject)
      throw new IllegalArgumentException("Unable to parse the given JSON")
    import scala.jdk.CollectionConverters._
    node.fields().asScala.map { e =>
      // a nested object/array value fails Jackson's binding to
      // HashMap<String,String> in the reference — same client error
      // here, never a silent "" coercion
      if (e.getValue.isContainerNode)
        throw new IllegalArgumentException("Unable to parse the given JSON")
      e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText)
    }.toMap
  }

  /** /api/suggest body: same string-map parse (type/q/max). */
  def parseSuggest(body: String): Map[String, String] = parseStringMap(body)

  /** /api/uid/rename body: same string-map parse (metric|tagk|tagv +
    * name). */
  def parseUidRename(body: String): Map[String, String] = parseStringMap(body)

  /** Optional JSONP wrap: `cb(<json>)` when a callback name is
    * present, bare JSON otherwise (reference HttpQuery.serializer
    * JSONP path). */
  def wrapJsonp(json: String, jsonp: Option[String]): String =
    jsonp.filter(_.nonEmpty).map(cb => s"$cb($json)").getOrElse(json)

  /** Suggest response: a bare JSON array of the suggestion strings. */
  def formatSuggest(suggestions: Seq[String],
                    jsonp: Option[String] = None): String = {
    val arr = mapper.createArrayNode()
    suggestions.foreach(arr.add)
    wrapJsonp(mapper.writeValueAsString(arr), jsonp)
  }

  /** Frame result documents as the V1 response array — an empty
    * result set serializes as the literal `[]`
    * (TestHttpJsonSerializer.formatQueryAsyncV1EmptyDPs:453-467). The
    * docs are already rendered JSON, so framing is pure
    * concatenation; jsonp wraps the whole array. */
  def frameArray(docs: Seq[String], jsonp: Option[String] = None): String =
    wrapJsonp(docs.mkString("[", ",", "]"), jsonp)

  /** UID rename response: `{"result":"true"}` on success,
    * `{"error":<msg>,"result":"false"}` on failure — insertion order
    * preserved like the reference's LinkedHashMap. */
  def formatUidRename(error: Option[String]): String = {
    val obj = mapper.createObjectNode()
    error match {
      case Some(msg) =>
        obj.put("error", msg); obj.put("result", "false")
      case None =>
        obj.put("result", "true")
    }
    mapper.writeValueAsString(obj)
  }
}
