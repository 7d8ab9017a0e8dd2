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

  test("JDBC provider authenticates against a credential table (embedded Derby)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-authdb").toString
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val url = s"jdbc:derby:$dir/authdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE users (name VARCHAR(64), passwd VARCHAR(64))")
      st.execute("INSERT INTO users VALUES ('carol', 'pw1'), ('dave', 'pw2')")
      st.close()
    } finally conn.close()

    val p = AuthenticationProvider.forMethod("jdbc", Map(
      "authentication.jdbc.url" -> url,
      "authentication.jdbc.query" ->
        "SELECT 1 FROM users WHERE name = ${user} AND passwd = ${password}"))
    assert(p.authenticate("carol", "pw1") == "carol")
    assert(p.authenticate("dave", "pw2") == "dave")
    intercept[SecurityException] { p.authenticate("carol", "pw2") }
    intercept[SecurityException] { p.authenticate("mallory", "pw1") }
    intercept[SecurityException] { p.authenticate("", "pw1") }
    // injection attempt arrives as a bind value, not SQL
    intercept[SecurityException] { p.authenticate("carol' OR '1'='1", "x") }

    // end to end: the same provider behind the Thrift SASL frontend
    val engine2 = new graft.core.Engine(SparkFixture.spark)
    val front2 = new ThriftFrontend(engine2, auth = Some(p)).start()
    try {
      val conn2 = DriverManager.getConnection(
        s"jdbc:hive2://localhost:${front2.boundPort}/", "carol", "pw1")
      try {
        val rs = conn2.createStatement().executeQuery("SELECT session_user() AS u")
        assert(rs.next() && rs.getString("u") == "carol")
      } finally conn2.close()
      intercept[java.sql.SQLException] {
        DriverManager.getConnection(
          s"jdbc:hive2://localhost:${front2.boundPort}/", "carol", "wrong")
      }
    } finally front2.stop()
  }

  test("JDBC provider rejects a query without placeholders at construction") {
    intercept[IllegalArgumentException] {
      new JdbcAuthenticationProvider("jdbc:derby:memory:x", "SELECT 1 FROM users")
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
