package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The reference TSD's operation-mode surface: which RPC commands exist
 * under `tsd.mode` = rw/ro/wo, crossed with the `tsd.core.enable_api`
 * / `tsd.core.enable_ui` / `tsd.no_diediedie` switches
 * (`/root/reference/src/tsd/RpcManager.java` initializeBuiltinRpcs,
 * mode parse at `/root/reference/src/core/TSDB.java:271-280`), plus
 * the per-endpoint read/write gates inside the UID RPC
 * (`/root/reference/src/tsd/UniqueIdRpc.java:96,174,194,244,287,343`).
 *
 * A deployment fronting this engine enforces exposure with this
 * registry: `commands` is the routing table, `requireUidAllowed` the
 * method-level gate for the endpoints whose availability depends on
 * BOTH mode and HTTP verb.
 */
object RpcModes {

  sealed abstract class Mode(val name: String,
                             val isRead: Boolean, val isWrite: Boolean)
  case object ReadOnly extends Mode("ro", true, false)
  case object WriteOnly extends Mode("wo", false, true)
  case object ReadWrite extends Mode("rw", true, true)

  /** `tsd.mode` parse: "ro"/"wo" case-insensitively, EVERYTHING else
    * (empty, null, unknown strings) falls back to rw — the reference
    * does not error on a bad mode string. */
  def parse(s: String): Mode =
    Option(s).map(_.toLowerCase) match {
      case Some("ro") => ReadOnly
      case Some("wo") => WriteOnly
      case _          => ReadWrite
    }

  /** The built-in command table for a mode + feature switches: rows of
    * (transport, command). Transcribed registration-for-registration
    * from initializeBuiltinRpcs; gnuplot/static/logs rows are listed
    * (the surface exists) even though their rendering is out of scope. */
  def commands(mode: Mode, enableApi: Boolean = true,
               enableUi: Boolean = true,
               noDieDieDie: Boolean = false): Seq[(String, String)] = {
    val b = Seq.newBuilder[(String, String)]
    // defaults common to every mode
    for (c <- Seq("stats", "dropcaches", "version", "status", "exit", "help"))
      b += ("telnet" -> c)
    if (enableUi)
      for (c <- Seq("aggregators", "logs", "stats", "version"))
        b += ("http" -> c)
    if (enableApi)
      for (c <- Seq("api/aggregators", "api/config", "api/dropcaches",
          "api/stats", "api/version", "api/status"))
        b += ("http" -> c)
    if (mode.isWrite)
      for (c <- Seq("put", "rollup", "histogram"))
        b += ("telnet" -> c)
    if (mode.isRead && enableUi)
      for (c <- Seq("", "s", "favicon.ico", "suggest", "q"))
        b += ("http" -> c)
    if (enableApi) {
      if (mode.isRead)
        for (c <- Seq("api/query", "api/search", "api/suggest"))
          b += ("http" -> c)
      if (mode.isWrite)
        for (c <- Seq("api/annotation", "api/annotations", "api/put",
            "api/rollup", "api/histogram", "api/tree"))
          b += ("http" -> c)
      // api/uid registers in every mode (its endpoints gate per-verb)
      b += ("http" -> "api/uid")
    }
    if (!noDieDieDie) {
      b += ("telnet" -> "diediedie")
      if (enableUi) b += ("http" -> "diediedie")
    }
    // user HttpRpcPlugins mount under /plugin in EVERY mode — the
    // reference registers them regardless of tsd.mode
    // (RpcManager.initializeHttpRpcPlugins:383-395 takes the mode but
    // does not gate on it; the plugin decides what it honors)
    for (c <- HttpRpcPlugins.commands) b += ("http" -> c)
    b.result()
  }

  /** Mode × verb gate for the /api/uid endpoints, with the reference's
    * exact error details: assign and rename are write-only verbs;
    * uidmeta/tsmeta gate GET on read and POST/PUT/DELETE on write. */
  def requireUidAllowed(endpoint: String, method: String, mode: Mode): Unit = {
    def needWrite(): Unit =
      if (!mode.isWrite)
        throw new IllegalArgumentException(
          "This operation is not allowed in ro mode.")
    def needRead(): Unit =
      if (!mode.isRead)
        throw new IllegalArgumentException(
          "This operation is not allowed in wo mode.")
    endpoint.toLowerCase match {
      case "assign" | "rename" =>
        // reference order: the mode gate fires BEFORE the verb check
        // (UniqueIdRpc.handleAssign:96-102, handleRename:524-530), so
        // DELETE-on-assign in ro mode reports the mode error, while in
        // a write mode the GET/POST-only restriction 405s it
        // (RpcUtil.allowedMethods:26-36).
        needWrite()
        method.toUpperCase match {
          case "GET" | "POST" =>
          case other => throw new IllegalArgumentException(
            s"The HTTP method [$other] is not permitted for this endpoint")
        }
      case "uidmeta" | "tsmeta" =>
        method.toUpperCase match {
          case "GET"                     => needRead()
          case "POST" | "PUT" | "DELETE" => needWrite()
          case other => throw new IllegalArgumentException(
            s"The HTTP method [$other] is not permitted for this endpoint")
        }
      case other => throw new IllegalArgumentException(
        "Other UID endpoints have not been implemented yet")
    }
  }

  /** The full surface as a DataFrame — three modes at default
    * switches, ordered for the contract compare. */
  def surface(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for {
      mode <- Seq(ReadOnly, WriteOnly, ReadWrite)
      (transport, command) <- commands(mode)
    } yield (mode.name, transport, command)
    rows.toDF("mode", "transport", "command")
      .orderBy("mode", "transport", "command")
  }
}
