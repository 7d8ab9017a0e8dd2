package graft.core

import java.net.InetSocketAddress
import java.nio.file.Files

import org.apache.zookeeper.server.{ServerCnxnFactory, ZooKeeperServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The ZK discovery backend against an EMBEDDED ZooKeeper server
  * (ZooKeeperServer + NIOServerCnxnFactory — the same in-process
  * pattern curator-test's TestingServer wraps; the reference tests its
  * client the same way, ZookeeperShareLevelSparkEngineSuite).
  */
class ZookeeperDiscoverySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var cnxnFactory: ServerCnxnFactory = _
  private var connect: String = _

  override def beforeAll(): Unit = {
    val dir = Files.createTempDirectory("graft-zk").toFile
    val zk = new ZooKeeperServer(dir, dir, 2000)
    cnxnFactory = ServerCnxnFactory.createFactory(new InetSocketAddress("localhost", 0), 64)
    cnxnFactory.startup(zk)
    connect = s"localhost:${cnxnFactory.getLocalPort}"
  }

  override def afterAll(): Unit = if (cnxnFactory != null) cnxnFactory.shutdown()

  test("engines register ephemeral-sequential nodes and discover oldest-first") {
    val a = new ZookeeperDiscoveryClient(connect)
    val b = new ZookeeperDiscoveryClient(connect)
    try {
      a.register("user/alice", "engine-a:10001")
      b.register("user/alice", "engine-b:10002")
      // both clients see both registrations, sequence (creation) order
      assert(a.getAll("user/alice") == Seq("engine-a:10001", "engine-b:10002"))
      assert(b.get("user/alice").contains("engine-a:10001"))
      // explicit unregister fails lookups over to the next engine
      a.unregister("user/alice")
      assert(b.get("user/alice").contains("engine-b:10002"))
      assert(a.get("user/does-not-exist").isEmpty)
    } finally { a.close(); b.close() }
  }

  test("an engine's nodes disappear when its ZK session closes") {
    val dying = new ZookeeperDiscoveryClient(connect)
    val observer = new ZookeeperDiscoveryClient(connect)
    try {
      dying.register("user/bob", "doomed:9999")
      assert(observer.get("user/bob").contains("doomed:9999"))
      dying.close() // no unregister — the SESSION ends (crash semantics)
      // ephemeral nodes are dropped by the ensemble at session close
      val deadline = System.currentTimeMillis() + 10000
      while (observer.get("user/bob").nonEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(observer.get("user/bob").isEmpty,
        "ephemeral registration must vanish with its session")
    } finally observer.close()
  }

  test("a full Engine registers through the ZK backend and unregisters on close") {
    val disc = new ZookeeperDiscoveryClient(connect)
    val probe = new ZookeeperDiscoveryClient(connect)
    try {
      val engine = new Engine(SparkFixture.spark, discovery = disc)
      engine.openSession("carol")
      assert(probe.get("user/carol").contains(engine.engineId),
        "engine must be discoverable through ZK after opening a session")
      engine.close()
      assert(probe.get("user/carol").isEmpty,
        "engine close must remove its ZK registration")
    } finally { disc.close(); probe.close() }
  }
}
