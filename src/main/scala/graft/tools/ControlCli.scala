package graft.tools

import java.io.IOException
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** `graft-ctl` — the admin command line over the REST admin surface
  * (the reference's kyuubi-ctl, kyuubi-ctl/.../cli/ControlCli.scala:27,
  * whose verbs are list/get/delete over engines, sessions and
  * batches). Usage:
  *
  * {{{
  *   graft-ctl [--api http://host:port] <verb> <noun> [id] [--space s]
  *
  *   list session | batch                  all sessions / batches
  *   list engine --space <space>           discovery registrations
  *   get  session <id> | batch <id>        one resource as JSON
  *   log  batch <id>                       drain the batch operation log
  *   delete session <id>                   close a session
  *   delete batch <id>                     cancel a batch
  *   delete engine --space <space>         evict engine registrations
  *   metrics [--prometheus]                gateway counters
  * }}}
  *
  * Output is the server's JSON verbatim (one document per line) so the
  * command composes with jq and scripts; exit code 0 iff the server
  * replied 2xx. `--api` defaults to \$GRAFT_API or localhost:10099.
  */
object ControlCli {

  final case class Result(code: Int, out: String)

  /** Pure entry for tests: returns (exit code, output) instead of
    * printing and exiting.
    */
  def run(args: Array[String]): Result = {
    var api = sys.env.getOrElse("GRAFT_API", "http://localhost:10099")
    var space: Option[String] = None
    var discoveryUrl: Option[String] = sys.env.get("GRAFT_DISCOVERY")
    // Identity for the admin verbs (HTTP Basic): `--as user` or
    // `--as user:password`; $GRAFT_ADMIN_USER as the ambient default.
    var asUser: Option[String] = sys.env.get("GRAFT_ADMIN_USER")
    val positional = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--api" => api = args(i + 1); i += 2
        case "--space" => space = Some(args(i + 1)); i += 2
        case "--discovery" => discoveryUrl = Some(args(i + 1)); i += 2
        case "--as" => asUser = Some(args(i + 1)); i += 2
        case "--help" | "-h" => return Result(0, usage)
        case a => positional += a; i += 1
      }
    }

    def http(method: String, path: String, body: Option[String] = None): Result = {
      val url = URI.create(s"$api/api/v1$path").toURL
      val c = url.openConnection().asInstanceOf[HttpURLConnection]
      c.setRequestMethod(method)
      asUser.foreach { u =>
        val cred = if (u.contains(":")) u else s"$u:"
        c.setRequestProperty("Authorization", "Basic " +
          java.util.Base64.getEncoder.encodeToString(
            cred.getBytes(StandardCharsets.UTF_8)))
      }
      body.foreach { b =>
        c.setDoOutput(true)
        c.setRequestProperty("Content-Type", "application/json")
        val os = c.getOutputStream
        try os.write(b.getBytes(StandardCharsets.UTF_8)) finally os.close()
      }
      try {
        val code = c.getResponseCode
        val stream = if (code >= 400) c.getErrorStream else c.getInputStream
        val body = if (stream == null) "" else
          new String(stream.readAllBytes(), StandardCharsets.UTF_8)
        Result(if (code >= 200 && code < 300) 0 else 1, body)
      } catch {
        case e: IOException => Result(1, s"""{"error": "cannot reach $api: ${e.getMessage}"}""")
      } finally c.disconnect()
    }

    def enc(s: String): String =
      java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

    positional.toList match {
      case "list" :: "session" :: Nil => http("GET", "/sessions")
      case "list" :: "batch" :: Nil => http("GET", "/batches")
      case "list" :: "engine" :: Nil => space match {
        case Some(sp) => http("GET", s"/admin/engine?space=${enc(sp)}")
        case None => Result(1, "list engine requires --space <discovery space>")
      }
      case "get" :: "session" :: id :: Nil => http("GET", s"/sessions/${enc(id)}")
      case "get" :: "batch" :: id :: Nil => http("GET", s"/batches/${enc(id)}")
      case "log" :: "batch" :: id :: Nil => http("GET", s"/batches/${enc(id)}/localLog")
      case "delete" :: "session" :: id :: Nil => http("DELETE", s"/sessions/${enc(id)}")
      case "delete" :: "batch" :: id :: Nil => http("DELETE", s"/batches/${enc(id)}")
      case "delete" :: "engine" :: Nil => space match {
        case Some(sp) => http("DELETE", s"/admin/engine?space=${enc(sp)}")
        case None => Result(1, "delete engine requires --space <discovery space>")
      }
      case "metrics" :: Nil => http("GET", "/metrics")
      case "metrics" :: "--prometheus" :: Nil => http("GET", "/metrics/prometheus")
      // every materialized share space with its registrations (the
      // /ui/engines data, machine-readable)
      case "list" :: "engines" :: Nil => http("GET", "/admin/engines")
      // recent lifecycle/audit events, newest first
      case "events" :: Nil => http("GET", "/events")
      case "events" :: limit :: Nil => http("GET", s"/events?limit=${enc(limit)}")
      // gateway HA resolution straight from the discovery registry —
      // no REST endpoint needed (there may be no live gateway to ask);
      // this IS how a client finds one of N gateways
      case "resolve" :: "gateway" :: Nil => discoveryUrl match {
        case Some(u) =>
          graft.server.GatewayServer.resolveGateway(
              graft.core.DiscoveryClients.fromUrl(u)) match {
            case Some(addr) => Result(0, addr)
            case None => Result(1, """{"error": "no live gateway registered"}""")
          }
        case None =>
          Result(1, "resolve gateway requires --discovery <url|dir> (or $GRAFT_DISCOVERY)")
      }
      // Operator-triggered hot refresh (reference kyuubi-ctl's admin
      // verbs over AdminResource): enforce a policy/profile/deny-list
      // file edit NOW instead of at the next reload tick.
      case "refresh" :: target :: Nil =>
        http("POST", s"/admin/refresh/${enc(target)}")
      // Admin views across all users (reference AdminResource):
      // listings with an optional user filter, force-close/cancel by
      // handle, the registered gateway list, live-batch count.
      case "admin" :: "list" :: "session" :: Nil => http("GET", "/admin/sessions")
      case "admin" :: "list" :: "session" :: users :: Nil =>
        http("GET", s"/admin/sessions?users=${enc(users)}")
      case "admin" :: "list" :: "operation" :: Nil => http("GET", "/admin/operations")
      case "admin" :: "close" :: "session" :: id :: Nil =>
        http("DELETE", s"/admin/sessions/${enc(id)}")
      case "admin" :: "cancel" :: "operation" :: id :: Nil =>
        http("DELETE", s"/admin/operations/${enc(id)}")
      case "admin" :: "list" :: "server" :: Nil => http("GET", "/admin/server")
      case "admin" :: "count" :: "batch" :: Nil => http("GET", "/admin/batch/count")
      // move a DEAD gateway's unfinished batches onto the target
      // gateway (refused with 409 while the source still answers)
      case "admin" :: "reassign" :: "batch" :: from :: Nil =>
        http("POST", "/admin/batch/reassign",
          body = Some(s"""{"from": "$from"}"""))
      case Nil => Result(1, usage)
      case other => Result(1, s"unknown command: ${other.mkString(" ")}\n$usage")
    }
  }

  private val usage: String =
    """graft-ctl [--api http://host:port] <verb> <noun> [id] [--space s]
      |  list session|batch          list sessions / batches
      |  list engine --space <s>     list discovery registrations
      |  get session|batch <id>      one resource
      |  log batch <id>              drain batch operation log
      |  delete session|batch <id>   close / cancel
      |  delete engine --space <s>   evict engine registrations
      |  metrics [--prometheus]      gateway counters (JSON / exposition)
      |  list engines                every share space + registrations
      |  events [limit]              recent lifecycle/audit events
      |  resolve gateway --discovery <url|dir>   pick a live HA gateway
      |  refresh <target> --as <admin[:pass]>    hot-reload authz_policies |
      |                                          session_conf_profiles | deny_users
      |  admin list session [users] --as <admin>   all users' sessions
      |  admin list operation --as <admin>         all live operations
      |  admin close session <id> --as <admin>     force-close any session
      |  admin cancel operation <id> --as <admin>  cancel any operation
      |  admin list server --as <admin>            registered HA gateways
      |  admin count batch --as <admin>            live+stored batch count
      |  admin reassign batch <fromUrl> --as <admin>  take a dead gateway's batches""".stripMargin

  def main(args: Array[String]): Unit = {
    val r = run(args)
    println(r.out)
    sys.exit(r.code)
  }
}
