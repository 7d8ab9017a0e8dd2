package graft.server

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}
import javax.security.auth.callback.{Callback, CallbackHandler, NameCallback, PasswordCallback}

import org.apache.hive.service.rpc.thrift._
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.transport.{TSaslClientTransport, TSocket, TTransport}

/** Hung-engine detection for the gateway's engine pool (reference
  * kyuubi-server/.../client/KyuubiSyncThriftClient.scala:48-150: the
  * `engine-alive-probe-` thread keeps a dedicated probe SESSION per
  * engine connection and pings `GetInfo(CLI_DBMS_VER)` on an interval;
  * consecutive failures past the alive timeout mark the engine broken
  * and close the client so callers fail fast instead of hanging).
  *
  * Process-death is already covered by [[EnginePool]]'s alive check at
  * `getOrLaunch`; what that misses is a WEDGED engine — a JVM that
  * still accepts TCP (the kernel serves the backlog even for a
  * SIGSTOP'd process) but never answers a Thrift call. This prober:
  *
  *   1. keeps one probe connection + open session per pooled engine
  *      slot, established with the same engine-token auth the gateway's
  *      forwards use, on a socket with a hard read timeout;
  *   2. each tick calls `GetInfo(CLI_DBMS_VER)` on the probe session —
  *      a wedged engine times out, a dead one refuses/resets;
  *   3. after `maxFailures` CONSECUTIVE failures evicts the slot:
  *      SIGKILL (graceful stop is ignored by a stopped process), drop
  *      from the pool, reap the stale discovery node, and eagerly
  *      relaunch so the next session doesn't pay the launch latency.
  *
  * In-flight forwards to the wedged engine fail with the gateway's
  * engine-socket read timeout and surface as clean ERROR_STATUS
  * replies (see GatewayServer's forward wrapper) — never an
  * indefinite hang.
  */
final class EngineAliveProber(
    pool: EnginePool,
    builder: EngineProcBuilder,
    intervalMs: Long = 10000,
    probeTimeoutMs: Int = 5000,
    maxFailures: Int = 3,
    relaunch: Boolean = true,
    onEvict: String => Unit = _ => ()) {

  private final class ProbeConn(val transport: TTransport,
      val client: TCLIService.Client, val session: TSessionHandle, val address: String) {
    def close(): Unit = {
      try {
        val req = new TCloseSessionReq(session)
        client.CloseSession(req)
      } catch { case _: Throwable => }
      try transport.close() catch { case _: Throwable => }
    }
  }

  private val conns = new ConcurrentHashMap[String, ProbeConn]()
  private val failures = new ConcurrentHashMap[String, Integer]()

  /** Slots with live probe state (tests assert the prune). */
  private[server] def trackedSlots: Set[String] = {
    import scala.jdk.CollectionConverters._
    conns.keySet.asScala.toSet ++ failures.keySet.asScala.toSet
  }
  @volatile private var scheduler: ScheduledExecutorService = _

  private def openProbe(address: String): ProbeConn = {
    val Array(host, port) = address.split(":")
    val sock = new TSocket(host, port.toInt, probeTimeoutMs)
    val transport: TTransport = builder.issueToken() match {
      case Some(token) =>
        new TSaslClientTransport(
          "PLAIN", null, null, null, new java.util.HashMap[String, String](),
          new CallbackHandler {
            override def handle(callbacks: Array[Callback]): Unit = callbacks.foreach {
              case nc: NameCallback => nc.setName("graft-probe")
              case pc: PasswordCallback => pc.setPassword(token.toCharArray)
              case _ =>
            }
          },
          sock)
      case None => sock
    }
    transport.open()
    val client = new TCLIService.Client(new TBinaryProtocol(transport))
    val openReq = new TOpenSessionReq()
    openReq.setUsername("graft-probe")
    val resp = client.OpenSession(openReq)
    if (resp.getStatus.getStatusCode != TStatusCode.SUCCESS_STATUS ||
        resp.getSessionHandle == null)
      throw new IllegalStateException(
        s"probe session rejected: ${resp.getStatus.getErrorMessage}")
    new ProbeConn(transport, client, resp.getSessionHandle, address)
  }

  /** One probe pass over every pooled engine. Public so tests can
    * drive the detection deterministically without the scheduler.
    */
  def probeOnce(): Unit = {
    val live = pool.snapshot
    live.foreach { case (slot, proc) =>
      val healthy =
        try {
          // get → validate → putIfAbsent, never blocking network I/O
          // under the CHM bin lock (openProbe can take probeTimeoutMs;
          // inside a compute it would serialize a future parallel
          // prober and stall unrelated map access)
          val cached = conns.get(slot)
          val conn =
            if (cached != null && cached.address == proc.address) cached
            else {
              if (cached != null && conns.remove(slot, cached))
                cached.close() // slot was replaced: re-probe the new engine
              val fresh = openProbe(proc.address)
              val raced = conns.putIfAbsent(slot, fresh)
              if (raced != null) { fresh.close(); raced } else fresh
            }
          val req = new TGetInfoReq(conn.session, TGetInfoType.CLI_DBMS_VER)
          val resp = conn.client.GetInfo(req)
          resp.getStatus.getStatusCode == TStatusCode.SUCCESS_STATUS
        } catch {
          case _: Throwable =>
            // a failed call can leave the probe transport desynced —
            // drop it so the next tick reconnects from scratch
            Option(conns.remove(slot)).foreach(c => try c.transport.close() catch { case _: Throwable => })
            false
        }
      if (healthy) failures.remove(slot)
      else {
        val n = failures.merge(slot, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        if (n >= maxFailures) {
          failures.remove(slot)
          Option(conns.remove(slot)).foreach(_.close())
          if (pool.evict(slot, proc)) {
            onEvict(s"engine $slot at ${proc.address} (pid ${proc.pid}) evicted " +
              s"after $n consecutive probe failures")
            if (relaunch) {
              try pool.getOrLaunchSlot(slot)
              catch { case _: Throwable => () } // next session attempt retries
            }
          }
        }
      }
    }
    // Prune state for slots no longer pooled (CONNECTION-level engines
    // stopped at session close, pool.stop): without this, probe
    // sockets/sessions for dead slots accumulate unboundedly on a
    // long-lived gateway.
    conns.keySet.forEach { slot =>
      if (!live.contains(slot))
        Option(conns.remove(slot)).foreach(_.close())
    }
    failures.keySet.forEach { slot =>
      if (!live.contains(slot)) failures.remove(slot)
    }
  }

  def start(): Unit = {
    val s = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-engine-alive-probe")
      t.setDaemon(true)
      t
    })
    s.scheduleWithFixedDelay(() =>
      try probeOnce() catch { case _: Throwable => () },
      intervalMs, intervalMs, TimeUnit.MILLISECONDS)
    scheduler = s
  }

  def stop(): Unit = {
    Option(scheduler).foreach(_.shutdownNow())
    conns.values.forEach(_.close())
    conns.clear()
    failures.clear()
  }
}
