package graft.server

import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Engine

/** SASL PLAIN end-to-end: the stock HiveServer2 JDBC driver negotiates
  * PLAIN (its default when the URL has no `auth=noSasl`) against
  * [[ThriftFrontend]] running a [[StaticAuthenticationProvider]] —
  * good credentials connect and query, bad credentials are rejected
  * before any TCLIService call runs (the reference's
  * AuthenticationProviderFactory + PlainSASLHelper contract).
  */
class AuthenticationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val engine = new Engine(SparkFixture.spark)
  private var frontend: ThriftFrontend = _
  private def url = s"jdbc:hive2://localhost:${frontend.boundPort}/"

  override def beforeAll(): Unit = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    frontend = new ThriftFrontend(engine,
      auth = Some(new StaticAuthenticationProvider(Map(
        "alice" -> "secret", "bob" -> "hunter2")))).start()
  }

  override def afterAll(): Unit = if (frontend != null) frontend.stop()

  test("PLAIN client with valid credentials connects and queries") {
    val conn = DriverManager.getConnection(url, "alice", "secret")
    try {
      val rs = conn.createStatement().executeQuery("SELECT 40 + 2 AS v")
      assert(rs.next() && rs.getInt("v") == 42)
    } finally conn.close()
  }

  test("the session user is the SASL-proven identity") {
    val conn = DriverManager.getConnection(url, "bob", "hunter2")
    try {
      val rs = conn.createStatement().executeQuery("SELECT session_user() AS u")
      assert(rs.next() && rs.getString("u") == "bob")
    } finally conn.close()
  }

  test("bad password is rejected at connect time") {
    val e = intercept[java.sql.SQLException] {
      DriverManager.getConnection(url, "alice", "wrong")
    }
    assert(e.getMessage != null)
  }

  test("unknown user is rejected at connect time") {
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(url, "mallory", "secret")
    }
  }

  test("empty user is rejected by the provider") {
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(url, "", "")
    }
  }

  test("provider factory: NONE accepts anyone, CUSTOM loads a class, bad method throws") {
    val anon = AuthenticationProvider.forMethod("none")
    assert(anon.authenticate("", "") == "anonymous")
    assert(anon.authenticate("zoe", "pw") == "zoe")
    val custom = AuthenticationProvider.forMethod("CUSTOM",
      Map("authentication.custom.class" -> classOf[RejectAllProvider].getName))
    intercept[SecurityException] { custom.authenticate("any", "pw") }
    intercept[IllegalArgumentException] { AuthenticationProvider.forMethod("KERBEROS") }
  }
}

/** CUSTOM-method fixture: loaded reflectively by the factory. */
class RejectAllProvider extends AuthenticationProvider {
  override def authenticate(user: String, password: String): String =
    throw new SecurityException("nope")
}
