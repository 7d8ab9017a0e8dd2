package graft.core

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The etcd discovery backend against [[FakeEtcdGateway]] (etcd's
  * gRPC-gateway JSON wire contract; no etcd binary in this sandbox).
  * Reference semantics: kyuubi-ha/.../etcd/EtcdDiscoveryClient.scala
  * (lease grant + keepAlive in createPersistentNode, revoke in
  * deregisterService).
  */
class EtcdDiscoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var gw: FakeEtcdGateway = _
  private def endpoint = gw.endpoint

  override def beforeAll(): Unit = gw = new FakeEtcdGateway

  override def afterAll(): Unit = if (gw != null) gw.close()

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
      gw.clockSkewMs = 3000L
      living.keepAliveAll()
      gw.clockSkewMs = 6000L
      assert(observer.get("user/bob").isEmpty, "lease should have lapsed")
      assert(observer.get("user/carol").contains("living:1"), "keep-alive should sustain")
    } finally { living.close(); observer.close(); gw.clockSkewMs = 0L }
  }

  test("DiscoveryClients.fromUrl picks the backend by URL scheme") {
    val viaUrl = DiscoveryClients.fromUrl(s"etcd://${gw.hostPort}/t4")
    val direct = new EtcdDiscoveryClient(endpoint, namespace = "t4")
    try {
      viaUrl.register("user/dave", "dave:1")
      assert(direct.get("user/dave").contains("dave:1"),
        "etcd:// URL must land on the same namespace")
      // default namespace when the URL has no path segment
      val bare = DiscoveryClients.fromUrl(s"etcd://${gw.hostPort}")
      try {
        bare.register("user/erin", "erin:1")
        assert(new EtcdDiscoveryClient(endpoint).get("user/erin").contains("erin:1"))
      } finally bare.asInstanceOf[AutoCloseable].close()
      // a plain path falls back to the file registry
      val dir = java.nio.file.Files.createTempDirectory("graft-disc").toString
      val file = DiscoveryClients.fromUrl(dir)
      assert(file.isInstanceOf[FileDiscoveryClient])
      file.register("user/frank", "frank:1")
      assert(file.get("user/frank").contains("frank:1"))
    } finally { viaUrl.asInstanceOf[AutoCloseable].close(); direct.close() }
  }
}
