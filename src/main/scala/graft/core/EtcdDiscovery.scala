package graft.core

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}

import scala.jdk.CollectionConverters._

/** etcd-backed engine discovery — the third production backend behind
  * the same [[DiscoveryClient]] trait as the file and ZooKeeper
  * registries (reference
  * kyuubi-ha/.../client/etcd/EtcdDiscoveryClient.scala:58).
  *
  * etcd has no ephemeral nodes; the reference substitutes a LEASE:
  * each registration key is attached to a TTL lease and a keep-alive
  * refreshes it while the engine lives (EtcdDiscoveryClient
  * `createPersistentNode` grants the lease and starts
  * `Lease.keepAlive`; `deregisterService` revokes it). We do the
  * same:
  *
  *   - `register` grants a lease of `leaseTtlSec`, PUTs
  *     `<ns>/<space>/node-<uuid>` → address bound to that lease, and
  *     a daemon scheduler sends keep-alives every ttl/3;
  *   - a crashed engine stops keep-aliving, the lease expires, etcd
  *     deletes the key — same liveness story as a dropped ZK session;
  *   - `get` returns the OLDEST live registration: etcd's
  *     `create_revision` is a cluster-wide monotone counter, so
  *     ordering by it is exactly the ZK sequential-node
  *     created-order-first pick (DiscoveryClient.getServerHost);
  *   - `unregister` revokes this client's leases, which atomically
  *     deletes every key bound to them.
  *
  * Transport is etcd's own gRPC-gateway JSON API (enabled by default
  * on every etcd ≥3.0 endpoint: POST /v3/kv/range, /v3/kv/put,
  * /v3/lease/grant, /v3/lease/revoke, /v3/lease/keepalive with
  * base64-encoded key/value bytes and int64s as JSON strings), spoken
  * over `java.net.http` — no client library needed, and the wire
  * contract is pinned by EtcdDiscoverySpec against an in-process
  * gateway that implements the same semantics (leases expire, revoke
  * cascades to keys, create_revision is monotone).
  */
final class EtcdDiscoveryClient(
    endpoint: String,
    namespace: String = "graft",
    leaseTtlSec: Long = 10L) extends DiscoveryClient with AutoCloseable {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5))
    .build()

  // space → lease ids THIS client granted (unregister revokes them)
  private val mine = new ConcurrentHashMap[String, java.util.List[java.lang.Long]]()

  // keep-alive pump: one daemon thread refreshes every live lease
  private val keeper: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "etcd-lease-keepalive")
      t.setDaemon(true)
      t
    }
  private val keepEveryMs = math.max(1000L, leaseTtlSec * 1000L / 3)
  keeper.scheduleWithFixedDelay(
    () => keepAliveAll(),
    keepEveryMs,
    keepEveryMs,
    TimeUnit.MILLISECONDS)

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  private def post(path: String, json: String): String = {
    val req = HttpRequest.newBuilder(URI.create(s"$endpoint$path"))
      .timeout(Duration.ofSeconds(10))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"etcd $path -> HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  // gRPC-gateway int64s arrive as JSON strings ("ID":"7587861231285")
  // but some gateways emit bare numbers; accept both.
  private def longField(json: String, key: String): Option[Long] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*\"?(-?\\d+)\"?").matcher(json)
    if (m.find()) Some(m.group(1).toLong) else None
  }

  private def strField(obj: String, key: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").matcher(obj)
    if (m.find()) Some(m.group(1)) else None
  }

  private def keyPrefix(space: String): String = {
    require(!space.split("/").contains(".."), s"bad space: $space")
    s"$namespace/$space/node-"
  }

  /** Lexicographic successor of the prefix — etcd's half-open range
    * [key, range_end) convention for prefix scans.
    */
  private def prefixEnd(prefix: String): String = {
    val bytes = prefix.getBytes(StandardCharsets.UTF_8)
    val out = bytes.clone()
    out(out.length - 1) = (out(out.length - 1) + 1).toByte
    new String(out, StandardCharsets.UTF_8)
  }

  override def register(space: String, address: String): Unit = {
    val grant = post("/v3/lease/grant", s"""{"TTL":"$leaseTtlSec"}""")
    val leaseId = longField(grant, "ID").getOrElse(
      throw new IllegalStateException(s"no lease ID in grant response: ${grant.take(200)}"))
    val key = keyPrefix(space) + java.util.UUID.randomUUID().toString.take(8)
    post(
      "/v3/kv/put",
      s"""{"key":"${b64(key)}","value":"${b64(address)}","lease":"$leaseId"}""")
    mine.computeIfAbsent(space, _ =>
      java.util.Collections.synchronizedList(new java.util.ArrayList[java.lang.Long]()))
      .add(leaseId)
  }

  /** Live registrations in creation order (create_revision asc — the
    * ZK sequence-node equivalent; etcd revisions are cluster-monotone).
    */
  override def getAll(space: String): Seq[String] = {
    val prefix = keyPrefix(space)
    val body = post(
      "/v3/kv/range",
      s"""{"key":"${b64(prefix)}","range_end":"${b64(prefixEnd(prefix))}"}""")
    // kvs: [{"key":..., "create_revision":"7", "value":...}, ...]
    val kv = java.util.regex.Pattern
      .compile("\\{[^{}]*\"create_revision\"[^{}]*\\}").matcher(body)
    val nodes = Iterator.continually(kv)
      .takeWhile(_.find())
      .map(_.group(0))
      .flatMap { obj =>
        for {
          rev <- longField(obj, "create_revision")
          value <- strField(obj, "value")
        } yield (rev, unb64(value))
      }
      .toSeq
    nodes.sortBy(_._1).map(_._2).filter(_.nonEmpty)
  }

  override def get(space: String): Option[String] = getAll(space).headOption

  /** Revoking a lease atomically deletes every key bound to it —
    * the etcd analogue of deleting ZK ephemeral nodes.
    */
  override def unregister(space: String): Unit =
    Option(mine.remove(space)).foreach(_.forEach { id =>
      try post("/v3/lease/revoke", s"""{"ID":"$id"}""")
      catch { case _: Exception => () } // already expired/revoked
    })

  /** One keep-alive round over every lease this client owns (also
    * called by the scheduler; public so tests can pump deterministically).
    */
  def keepAliveAll(): Unit =
    mine.values().asScala.foreach(_.asScala.foreach { id =>
      try post("/v3/lease/keepalive", s"""{"ID":"$id"}""")
      catch { case _: Exception => () } // transient; next round retries
    })

  /** Stops keep-alives WITHOUT revoking: leases lapse after the TTL,
    * mirroring a crashed engine (ZK session-timeout liveness).
    */
  override def close(): Unit = keeper.shutdownNow()
}
