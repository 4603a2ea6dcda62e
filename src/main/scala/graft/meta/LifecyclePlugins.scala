package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The last two reference plugin families: the startup hook that may
 * rewrite the parsed config before anything serves, and user RPC
 * handlers mounted under the `/plugin` base path.
 *
 * == StartupPlugins ==
 *
 * Reference contract (`src/tools/StartupPlugin.java:21-30`, loaded by
 * `src/tools/TSDMain.java:242-279`): when `tsd.startup.enable` is
 * true, the plugin named by `tsd.startup.plugin` is instantiated,
 * `initialize(config)` runs on the freshly-parsed config BEFORE the
 * TSD begins to use it (failures abort startup — missing plugin is an
 * `IllegalArgumentException("Unable to locate startup plugin: …")`,
 * an initialize failure wraps as `RuntimeException("Failed to
 * initialize startup plugin")`), and `setReady(tsdb)` fires once the
 * daemon is serving.
 *
 * Spark-native shape: config is an immutable `Map[String, String]`
 * and a plugin is a pure rewrite of it (the reference's Config is
 * mutated in place; an immutable rewrite is the same contract with
 * the data flow made explicit). `applyStartup` is called by the
 * deployment exactly once, between config parse and engine/ingest
 * init; whatever map it returns is what the engine sees.
 *
 * == HttpRpcPlugins ==
 *
 * Reference contract (`src/tsd/HttpRpcPlugin.java:40`, mounted by
 * `RpcManager.initializeHttpRpcPlugins:383-395`): each plugin
 * declares a path, validated (`validateHttpRpcPluginPath:398-416`:
 * non-empty, must NOT already contain the `plugin` base, parses as a
 * URI with a non-root path and no query string) and canonicalized
 * (leading/trailing slashes stripped, `canonicalizePluginPath:424-436`),
 * then served at `/plugin/<canonical>`. Mounting is NOT mode-gated —
 * the reference registers plugin RPCs in every `tsd.mode` (the mode
 * is passed to `initializeHttpRpcPlugins` but unused; the plugin
 * itself decides what verbs/modes it honors).
 *
 * Spark-native shape: a handler is `(SparkSession, params) =>
 * DataFrame` so the serialization layer stays uniform with built-in
 * endpoints, and the mounted rows surface in [[RpcModes.commands]]
 * (transport "http", command `plugin/<path>`) so a deployment's
 * routing table covers user RPCs exactly like built-ins.
 */
object StartupPlugins {

  /** A registered startup plugin: the config rewrite plus the
    * lifecycle callbacks the reference abstract class declares. */
  final case class Plugin(
      initialize: Map[String, String] => Map[String, String],
      setReady: () => Unit = () => (),
      shutdown: () => Unit = () => (),
      version: String = "2.0.1",
      getType: String = "startup")

  private val plugins =
    new java.util.concurrent.ConcurrentHashMap[String, Plugin]()

  def register(name: String, p: Plugin): Unit = plugins.put(name, p)
  def reset(): Unit = plugins.clear()

  /** TSDMain.loadStartupPlugins + the initialize call: returns the
    * (possibly rewritten) config. Disabled → the config passes
    * through untouched. Errors use the reference's exact text. */
  def applyStartup(config: Map[String, String]): Map[String, String] = {
    if (!config.get("tsd.startup.enable").exists(_.toBoolean)) return config
    val cls = config.getOrElse("tsd.startup.plugin", "")
    val p = Option(plugins.get(cls)).getOrElse(
      throw new IllegalArgumentException(
        "Unable to locate startup plugin: " + cls))
    try p.initialize(config)
    catch {
      case e: Exception =>
        throw new RuntimeException("Failed to initialize startup plugin", e)
    }
  }

  /** TSDMain:225-227 — fired once the engine is serving, for every
    * plugin the config selected. */
  def setReady(config: Map[String, String]): Unit =
    if (config.get("tsd.startup.enable").exists(_.toBoolean))
      config.get("tsd.startup.plugin")
        .flatMap(c => Option(plugins.get(c))).foreach(_.setReady())
}

object HttpRpcPlugins {

  /** RpcManager.PLUGIN_BASE_WEBPATH. */
  val BasePath = "plugin"

  type Handler = (SparkSession, Map[String, String]) => DataFrame

  private val mounts =
    new java.util.concurrent.ConcurrentHashMap[String, Handler]()

  /** RpcManager.validateHttpRpcPluginPath:398-416, with the
    * reference's precondition messages. */
  def validatePath(path: String): Unit = {
    require(path != null && path.nonEmpty,
      "Invalid HttpRpcPlugin path. Path is null or empty.")
    val t = path.trim
    // the reference matches the UNTRIMMED path, case-insensitively,
    // with DOTALL (RpcManager.java:98-100, :408)
    require(!path.matches(s"(?is)^/?$BasePath/?.*"),
      s"Invalid HttpRpcPlugin path $t. Path contains system's plugin base path.")
    val uri = java.net.URI.create(t)
    require(uri.getPath != null && uri.getPath.nonEmpty,
      s"Invalid HttpRpcPlugin path $t. Parsed path is null or empty.")
    require(uri.getPath != "/",
      s"Invalid HttpRpcPlugin path $t. Path is equal to root.")
    require(uri.getQuery == null || uri.getQuery.isEmpty,
      s"Invalid HttpRpcPlugin path $t. Path contains query parameters.")
  }

  /** RpcManager.canonicalizePluginPath:424-436. */
  def canonicalize(path: String): String = {
    require(path != null && path.nonEmpty && path != "/",
      s"Path $path is a root.")
    path.stripPrefix("/").stripSuffix("/")
  }

  /** initializeHttpRpcPlugins: validate, canonicalize, mount. */
  def mount(path: String, handler: Handler): String = {
    validatePath(path)
    val canonical = canonicalize(path.trim)
    mounts.put(canonical, handler)
    canonical
  }

  def reset(): Unit = mounts.clear()

  /** The mounted commands as routing-table rows — `plugin/<path>`,
    * registered in EVERY mode like the reference. Sorted for the
    * deterministic surface. */
  def commands: Seq[String] = {
    import scala.jdk.CollectionConverters._
    mounts.keySet.asScala.toSeq.sorted.map(p => s"$BasePath/$p")
  }

  /** RpcManager.isHttpRpcPluginPath:230-244: a URI is a plugin
    * request when its first path component (query string ignored) is
    * the plugin base and something follows it. */
  def isPluginPath(uri: String): Boolean = {
    if (uri == null || uri.length <= BasePath.length) false
    else {
      val path = uri.indexOf('?') match {
        case -1 => uri
        case q  => uri.substring(0, q)
      }
      val parts = path.split("/").filter(_.nonEmpty)
      parts.length > 1 && parts(0) == BasePath
    }
  }

  /** RpcManager.lookupHttpRpcPlugin:219 + RpcHandler dispatch: resolve
    * the handler for a request URI and execute it. Unknown mounts
    * return None (the reference 404s). */
  def execute(spark: SparkSession, uri: String,
              params: Map[String, String] = Map.empty): Option[DataFrame] = {
    if (!isPluginPath(uri)) return None
    val path = uri.indexOf('?') match {
      case -1 => uri
      case q  => uri.substring(0, q)
    }
    val canonical = path.split("/").filter(_.nonEmpty).drop(1).mkString("/")
    Option(mounts.get(canonical)).map(_(spark, params))
  }
}
