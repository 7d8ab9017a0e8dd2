package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class DiscoverySpec extends AnyFunSuite {

  test("two engines register and discover each other through the file registry") {
    val dir = Files.createTempDirectory("graft-disc")
    val reg1 = new FileDiscoveryClient(dir)
    val reg2 = new FileDiscoveryClient(dir)
    val spark = SparkFixture.spark
    val e1 = new Engine(spark, discovery = reg1)
    val e2 = new Engine(spark, discovery = reg2)

    // engine 1 serves alice → its share space is registered
    e1.openSession("alice")
    assert(reg2.get("user/alice").contains(e1.engineId),
      "second engine must discover the first's registration")

    // engine 2 also serves alice → both registrations visible, oldest first
    e2.openSession("alice")
    assert(reg1.getAll("user/alice") == Seq(e1.engineId, e2.engineId))
    assert(reg1.get("user/alice").contains(e1.engineId))

    // engine 1 leaves → lookups fail over to engine 2
    reg1.unregister("user/alice")
    assert(reg2.get("user/alice").contains(e2.engineId))
    reg2.unregister("user/alice")
    assert(reg2.get("user/alice").isEmpty)
  }

  test("concurrent same-JVM registrations never collide or throw") {
    // FileChannel.lock() is JVM-wide: without the in-process monitor,
    // two threads locking the same seq file get
    // OverlappingFileLockException instead of queueing.
    val dir = Files.createTempDirectory("graft-disc-conc")
    val client = new FileDiscoveryClient(dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val errors = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val tasks = (1 to 32).map { i =>
      pool.submit(new Runnable {
        override def run(): Unit =
          try client.register("user/conc", s"addr-$i")
          catch { case t: Throwable => errors.compareAndSet(null, t) }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(errors.get() == null, s"register threw under concurrency: ${errors.get()}")
    val all = client.getAll("user/conc")
    assert(all.size == 32, "every concurrent registration must land")
    assert(all.distinct.size == 32, "sequence numbers must not collide")
  }

  test("a registration from a separate JVM process is discovered") {
    val dir = Files.createTempDirectory("graft-disc-jvm")
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val proc = new ProcessBuilder(java, "-cp", cp,
      "graft.core.DiscoveryRegisterMain", dir.toString, "user/bob", "engine-other-jvm")
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"child JVM failed: $out")
    val reg = new FileDiscoveryClient(dir)
    assert(reg.get("user/bob").contains("engine-other-jvm"), out)
  }

  test("TTL expires silent registrations; heartbeat keeps them alive") {
    val dir = Files.createTempDirectory("graft-disc-ttl")
    val reg = new FileDiscoveryClient(dir, ttlMs = 200)
    reg.register("server", "addr-1")
    assert(reg.get("server").contains("addr-1"))
    Thread.sleep(350)
    assert(reg.get("server").isEmpty, "stale node must expire after the TTL")
    reg.register("server", "addr-2")
    (1 to 3).foreach { _ => Thread.sleep(120); reg.heartbeat() }
    assert(reg.get("server").contains("addr-2"),
      "heartbeaten node must stay live past the raw TTL")
  }
}
