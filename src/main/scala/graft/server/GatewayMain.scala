package graft.server

import java.nio.file.Paths

import graft.core.ShareLevel

/** Standalone gateway process — the deployable server half of the
  * server↔engine split (the reference's KyuubiServer main).
  *
  * Usage: GatewayMain <discoveryDir> [port]
  *
  * Environment:
  *   GRAFT_AUTH_METHOD      NONE (default) | CUSTOM | JDBC | LDAP — SASL PLAIN
  *                          provider selection (AuthenticationProvider.forMethod);
  *                          method-specific keys come from GRAFT_AUTH_* vars
  *                          lower-cased into the provider conf
  *   GRAFT_ENGINE_SECRET    enables engine-token security on every
  *                          launched engine
  *   GRAFT_SHARE_LEVEL      USER (default) | SERVER | CONNECTION
  *   GRAFT_ENGINE_IDLE_TIMEOUT_MS  forwarded to launched engines
  *   GRAFT_METRICS_JSON     path for the periodic atomic metrics.json
  *                          dump (reference kyuubi.metrics JSON
  *                          reporter); interval via
  *                          GRAFT_METRICS_JSON_INTERVAL_MS (5000)
  */
object GatewayMain {
  def main(args: Array[String]): Unit = {
    val discoveryDir = args.headOption.getOrElse {
      System.err.println("usage: GatewayMain <discoveryDir> [port]")
      sys.exit(2)
    }
    val port = args.lift(1).map(_.toInt).getOrElse(0)

    val authConf = sys.env.collect {
      case (k, v) if k.startsWith("GRAFT_AUTH_") && k != "GRAFT_AUTH_METHOD" =>
        k.stripPrefix("GRAFT_AUTH_").toLowerCase.replace('_', '.') -> v
    }.map { case (k, v) => s"authentication.$k" -> v }
    val auth = sys.env.get("GRAFT_AUTH_METHOD").filter(_.toUpperCase != "NONE")
      .map(m => AuthenticationProvider.forMethod(m, authConf))

    val shareLevel = sys.env.getOrElse("GRAFT_SHARE_LEVEL", "USER").toUpperCase match {
      case "SERVER" => ShareLevel.Server
      case "CONNECTION" => ShareLevel.Connection
      case _ => ShareLevel.User
    }

    val engineEnv = sys.env.get("GRAFT_ENGINE_IDLE_TIMEOUT_MS")
      .map(v => Map("GRAFT_ENGINE_IDLE_TIMEOUT_MS" -> v)).getOrElse(Map.empty)
    val builder = new EngineProcBuilder(Paths.get(discoveryDir),
      engineSecret = sys.env.get("GRAFT_ENGINE_SECRET"),
      engineEnv = engineEnv)

    // optional metrics-to-file reporter (reference
    // kyuubi.metrics.reporters=JSON + json.location): counters from
    // the lifecycle event bus, dumped atomically on an interval
    sys.env.get("GRAFT_METRICS_JSON").foreach { p =>
      val collector = new graft.core.Metrics.Collector
      graft.core.Events.register(collector)
      val interval = sys.env.get("GRAFT_METRICS_JSON_INTERVAL_MS")
        .map(_.toLong).getOrElse(5000L)
      new graft.core.Metrics.JsonFileReporter(collector, Paths.get(p), interval)
    }

    val gw = new GatewayServer(builder, port, auth, shareLevel).start()
    println(s"GATEWAY READY localhost:${gw.boundPort}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => gw.stop()))

    // serve until the operator drops stdin (same contract as EngineMain)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var line = in.readLine()
    while (line != null && line.trim != "SHUTDOWN") line = in.readLine()
    gw.stop()
    System.exit(0)
  }
}
