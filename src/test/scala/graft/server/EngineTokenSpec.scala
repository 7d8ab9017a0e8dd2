package graft.server

import java.nio.file.Files
import javax.security.auth.callback.{Callback, CallbackHandler, NameCallback, PasswordCallback}

import org.apache.hive.service.rpc.thrift._
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.transport.{TSaslClientTransport, TSocket}
import org.scalatest.funsuite.AnyFunSuite

/** Engine security: server↔engine trust via shared-secret tokens (the
  * reference's InternalSecurityAccessor +
  * EngineSecureAuthenticationProviderImpl contract), proven both at
  * the unit level and against a REAL secured engine JVM.
  */
class EngineTokenSpec extends AnyFunSuite {

  test("a token issued under the secret validates; tampered and foreign tokens do not") {
    val mgr = new EngineTokenManager("s3cret")
    val token = mgr.issueToken()
    mgr.validate(token) // no throw
    // fresh IV per token: two tokens differ but both validate
    val token2 = mgr.issueToken()
    assert(token != token2)
    mgr.validate(token2)
    // flip one hex digit → decrypt garbage → rejected
    val tampered = (if (token.head == '0') '1' else '0') + token.tail
    intercept[SecurityException] { mgr.validate(tampered) }
    // a different secret cannot mint acceptable tokens
    val other = new EngineTokenManager("different")
    intercept[SecurityException] { mgr.validate(other.issueToken()) }
    intercept[SecurityException] { mgr.validate("not-even-hex") }
    intercept[SecurityException] { mgr.validate("") }
  }

  test("an expired token is rejected") {
    val mgr = new EngineTokenManager("s3cret", tokenMaxLifetimeMs = 1L)
    val token = mgr.issueToken()
    Thread.sleep(20)
    val e = intercept[SecurityException] { mgr.validate(token) }
    assert(e.getMessage.contains("expired"))
    // same token under a generous lifetime manager still decrypts but
    // carries its own (short) lifetime → still expired
    intercept[SecurityException] { new EngineTokenManager("s3cret").validate(token) }
  }

  test("the provider accepts a live token as the password and keeps the caller's user") {
    val mgr = new EngineTokenManager("s3cret")
    val p = new EngineTokenAuthenticationProvider(mgr)
    assert(p.authenticate("alice", mgr.issueToken()) == "alice")
    assert(p.authenticate("", mgr.issueToken()) == "anonymous")
    intercept[SecurityException] { p.authenticate("alice", "guessed-password") }
  }

  private def plainSasl(sock: TSocket, user: String, password: String): TSaslClientTransport =
    new TSaslClientTransport(
      "PLAIN", null, null, null, new java.util.HashMap[String, String](),
      new CallbackHandler {
        override def handle(callbacks: Array[Callback]): Unit = callbacks.foreach {
          case nc: NameCallback => nc.setName(user)
          case pc: PasswordCallback => pc.setPassword(password.toCharArray)
          case _ =>
        }
      },
      sock)

  test("a secured engine JVM accepts the launcher's token and rejects everything else") {
    val dir = Files.createTempDirectory("graft-engine-secure")
    val builder = new EngineProcBuilder(dir, engineSecret = Some("pool-secret"))
    val pool = new EnginePool(builder)
    try {
      val eng = pool.getOrLaunch("user/secure")
      val Array(host, port) = eng.address.split(":")

      def query42(user: String, password: String): Int = {
        val sasl = plainSasl(new TSocket(host, port.toInt), user, password)
        sasl.open()
        try {
          val client = new TCLIService.Client(new TBinaryProtocol(sasl))
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
        } finally sasl.close()
      }

      val token = builder.issueToken().get
      assert(query42("alice", token) == 42,
        "the launcher-minted token must open the secured engine")

      // no secret → no service: a guessed password fails in the SASL
      // handshake, before any TCLIService call is processed
      intercept[Exception] { query42("alice", "guessed") }

      // a token minted under a different secret is just as dead
      val foreign = new EngineTokenManager("other-secret").issueToken()
      intercept[Exception] { query42("alice", foreign) }
    } finally pool.close()
  }
}
