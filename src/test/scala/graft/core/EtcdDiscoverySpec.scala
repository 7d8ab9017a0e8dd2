package graft.core

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The etcd discovery backend against an in-process fake of etcd's
  * gRPC-gateway JSON API (no etcd binary ships in this sandbox; the
  * fake implements the real gateway contract — base64 key/value
  * bytes, int64s as strings, half-open [key, range_end) prefix
  * scans, monotone create_revision, and TTL leases whose revocation
  * or expiry deletes the keys bound to them — so the client under
  * test speaks the exact wire protocol a real endpoint serves).
  * Reference semantics: kyuubi-ha/.../etcd/EtcdDiscoveryClient.scala
  * (lease grant + keepAlive in createPersistentNode, revoke in
  * deregisterService).
  */
class EtcdDiscoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  // ---- fake etcd v3 JSON gateway ----
  private case class Kv(value: String, createRev: Long, lease: Long)
  private case class Lease(ttlMs: Long, var expiresAt: Long)

  private val kvs = TrieMap.empty[String, Kv]
  private val leases = TrieMap.empty[Long, Lease]
  private val rev = new AtomicLong(0L)
  private val leaseSeq = new AtomicLong(1000L)
  // test hook: freeze "now" so expiry is deterministic
  @volatile private var clockSkewMs = 0L
  private def now(): Long = System.currentTimeMillis() + clockSkewMs

  private var server: HttpServer = _
  private var endpoint: String = _

  private def b64d(s: String) = new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)
  private def b64e(s: String) = Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def field(json: String, key: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*\"?([^\",}]+)\"?").matcher(json)
    if (m.find()) Some(m.group(1)) else None
  }

  private def reapExpired(): Unit = {
    val dead = leases.filter { case (_, l) => l.expiresAt <= now() }.keySet
    dead.foreach { id =>
      leases.remove(id)
      kvs.filterInPlace((_, kv) => kv.lease != id)
    }
  }

  private def handle(path: String, body: String): String = {
    reapExpired()
    path match {
      case "/v3/lease/grant" =>
        val ttlSec = field(body, "TTL").get.toLong
        val id = leaseSeq.incrementAndGet()
        leases.put(id, Lease(ttlSec * 1000, now() + ttlSec * 1000))
        s"""{"header":{"revision":"${rev.get()}"},"ID":"$id","TTL":"$ttlSec"}"""
      case "/v3/lease/revoke" =>
        val id = field(body, "ID").get.toLong
        leases.remove(id)
        kvs.filterInPlace((_, kv) => kv.lease != id)
        s"""{"header":{"revision":"${rev.incrementAndGet()}"}}"""
      case "/v3/lease/keepalive" =>
        val id = field(body, "ID").get.toLong
        leases.get(id) match {
          case Some(l) =>
            l.expiresAt = now() + l.ttlMs
            s"""{"result":{"ID":"$id","TTL":"${l.ttlMs / 1000}"}}"""
          case None => s"""{"result":{"ID":"$id","TTL":"0"}}"""
        }
      case "/v3/kv/put" =>
        val key = b64d(field(body, "key").get)
        val value = b64d(field(body, "value").get)
        val lease = field(body, "lease").map(_.toLong).getOrElse(0L)
        if (lease != 0L && !leases.contains(lease))
          throw new IllegalArgumentException("etcdserver: requested lease not found")
        val r = rev.incrementAndGet()
        kvs.put(key, Kv(value, kvs.get(key).map(_.createRev).getOrElse(r), lease))
        s"""{"header":{"revision":"$r"}}"""
      case "/v3/kv/range" =>
        val key = b64d(field(body, "key").get)
        val end = field(body, "range_end").map(b64d)
        val hits = kvs.toSeq
          .filter { case (k, _) => k >= key && end.forall(k < _) }
          .sortBy(_._1)
        val kvJson = hits.map { case (k, kv) =>
          s"""{"key":"${b64e(k)}","create_revision":"${kv.createRev}","mod_revision":"${kv.createRev}","value":"${b64e(kv.value)}","lease":"${kv.lease}"}"""
        }
        s"""{"header":{"revision":"${rev.get()}"},"kvs":[${kvJson.mkString(",")}],"count":"${hits.size}"}"""
      case other => throw new IllegalArgumentException(s"unhandled $other")
    }
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 16)
    server.createContext("/v3", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val (code, resp) =
        try (200, handle(ex.getRequestURI.getPath, body))
        catch { case e: IllegalArgumentException => (400, s"""{"error":"${e.getMessage}"}""") }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("engines register leased keys and discover oldest-first by create_revision") {
    val a = new EtcdDiscoveryClient(endpoint, namespace = "t1")
    val b = new EtcdDiscoveryClient(endpoint, namespace = "t1")
    try {
      a.register("user/alice", "engine-a:10001")
      b.register("user/alice", "engine-b:10002")
      assert(a.getAll("user/alice") == Seq("engine-a:10001", "engine-b:10002"))
      assert(b.get("user/alice").contains("engine-a:10001"))
      // revoking a's lease cascades to its key; lookup fails over
      a.unregister("user/alice")
      assert(b.get("user/alice").contains("engine-b:10002"))
      assert(a.get("user/missing").isEmpty)
    } finally { a.close(); b.close() }
  }

  test("namespaces and spaces are prefix-isolated") {
    val c = new EtcdDiscoveryClient(endpoint, namespace = "t2")
    val other = new EtcdDiscoveryClient(endpoint, namespace = "t2-other")
    try {
      c.register("user/alice", "alice:1")
      c.register("user/aliceX", "alicex:1") // sibling space sharing a name prefix
      other.register("user/alice", "other:1")
      assert(c.getAll("user/alice") == Seq("alice:1"))
      assert(c.getAll("user/aliceX") == Seq("alicex:1"))
      assert(other.getAll("user/alice") == Seq("other:1"))
    } finally { c.close(); other.close() }
  }

  test("a crashed engine's registration lapses with its lease; keep-alive sustains a live one") {
    val dying = new EtcdDiscoveryClient(endpoint, namespace = "t3", leaseTtlSec = 2)
    val living = new EtcdDiscoveryClient(endpoint, namespace = "t3", leaseTtlSec = 4)
    val observer = new EtcdDiscoveryClient(endpoint, namespace = "t3")
    try {
      dying.register("user/bob", "dying:1")
      living.register("user/carol", "living:1")
      assert(observer.get("user/bob").contains("dying:1"))
      // crash: stop keep-alives without revoking
      dying.close()
      // skew past dying's 2 s TTL but inside living's 4 s; refresh
      // living against the skewed clock, then skew past where living's
      // ORIGINAL grant would have lapsed — only the keep-alive keeps it
      clockSkewMs = 3000L
      living.keepAliveAll()
      clockSkewMs = 6000L
      assert(observer.get("user/bob").isEmpty, "lease should have lapsed")
      assert(observer.get("user/carol").contains("living:1"), "keep-alive should sustain")
    } finally { living.close(); observer.close(); clockSkewMs = 0L }
  }
}
