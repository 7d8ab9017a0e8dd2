package graft.server

import java.nio.file.Files

import org.apache.hive.service.rpc.thrift._
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.transport.TSocket
import org.scalatest.funsuite.AnyFunSuite

/** Process-level engine lifecycle: a REAL second JVM with its own
  * SparkSession, discovered through the file registry and spoken to
  * over its Thrift port.
  */
class EngineProcSpec extends AnyFunSuite {

  private def query42(address: String): Int = {
    val Array(host, port) = address.split(":")
    val sock = new TSocket(host, port.toInt)
    sock.open()
    try {
      val client = new TCLIService.Client(new TBinaryProtocol(sock))
      val sess = client.OpenSession(new TOpenSessionReq())
      assert(sess.getStatus.getStatusCode == TStatusCode.SUCCESS_STATUS)
      val exec = client.ExecuteStatement(
        new TExecuteStatementReq(sess.getSessionHandle, "SELECT 40 + 2 AS answer"))
      assert(exec.getStatus.getStatusCode == TStatusCode.SUCCESS_STATUS,
        String.valueOf(exec.getStatus.getErrorMessage))
      val page = client.FetchResults(new TFetchResultsReq(
        exec.getOperationHandle, TFetchOrientation.FETCH_NEXT, 10))
      val v = page.getResults.getColumns.get(0).getI32Val.getValues.get(0)
      client.CloseSession(new TCloseSessionReq(sess.getSessionHandle))
      v
    } finally sock.close()
  }

  test("engine pool spawns an isolated engine JVM, discovers it, reuses it, stops it") {
    val dir = Files.createTempDirectory("graft-engine-pool")
    val builder = new EngineProcBuilder(dir)
    val pool = new EnginePool(builder)
    try {
      val e1 = pool.getOrLaunch("user/alice")
      assert(e1.alive, "engine process must be running after launch")
      assert(query42(e1.address) == 42,
        "the spawned engine must answer SQL over its own Thrift port")

      // pooling: same share key → same process, no second launch
      val e2 = pool.getOrLaunch("user/alice")
      assert(e2 eq e1, "same share key must reuse the pooled engine")

      // the registry agrees with the pool
      val reg = new graft.core.FileDiscoveryClient(dir)
      assert(reg.get("user/alice").contains(e1.address))

      pool.close()
      assert(!e1.alive, "pool close must stop the engine process")
      // clean shutdown unregisters
      val deadline = System.nanoTime() + 10e9.toLong
      while (reg.get("user/alice").nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(reg.get("user/alice").isEmpty,
        "a cleanly-stopped engine must leave the registry")
    } finally pool.close()
  }
}
