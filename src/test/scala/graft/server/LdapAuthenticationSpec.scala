package graft.server

import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Engine

/** LDAP authentication end-to-end against a live (in-memory) directory
  * speaking real LDAPv3 simple bind over TCP: the provider's JNDI
  * client binds as the derived principal, good binds let the stock
  * Hive JDBC driver open a session, bad binds are rejected at
  * OpenSession — the reference LdapAuthenticationProviderImpl's
  * contract.
  */
class LdapAuthenticationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var ldap: InMemoryLdapServer = _

  override def beforeAll(): Unit = {
    ldap = new InMemoryLdapServer(Map(
      "uid=alice,ou=people,dc=graft,dc=test" -> "secret",
      "uid=bob,ou=people,dc=graft,dc=test" -> "hunter2",
      "carol@graft.test" -> "pw3")).start()
  }

  override def afterAll(): Unit = if (ldap != null) ldap.stop()

  private def provider(extra: Map[String, String] = Map.empty) =
    AuthenticationProvider.forMethod("LDAP", Map(
      "authentication.ldap.url" -> ldap.url,
      "authentication.ldap.baseDn" -> "ou=people,dc=graft,dc=test") ++ extra)

  test("good bind authenticates; short username is the effective user") {
    assert(provider().authenticate("alice", "secret") == "alice")
  }

  test("bad password is a SecurityException (directory said no)") {
    intercept[SecurityException] { provider().authenticate("alice", "wrong") }
  }

  test("unknown user is rejected") {
    intercept[SecurityException] { provider().authenticate("mallory", "secret") }
  }

  test("empty password never reaches the directory (anonymous-bind guard)") {
    // The server deliberately ACCEPTS anonymous/unauthenticated binds
    // (worst-case directory, RFC 4513 §5.1) — the provider must refuse
    // client-side, before any network call.
    val before = ldap.binds
    intercept[SecurityException] { provider().authenticate("alice", "") }
    intercept[SecurityException] { provider().authenticate("", "x") }
    assert(ldap.binds == before, "empty credentials must not produce a bind")
  }

  test("a full DN binds verbatim") {
    assert(provider().authenticate(
      "uid=bob,ou=people,dc=graft,dc=test", "hunter2") == "bob")
  }

  test("domain config produces user@domain principals") {
    val p = AuthenticationProvider.forMethod("LDAP", Map(
      "authentication.ldap.url" -> ldap.url,
      "authentication.ldap.domain" -> "graft.test"))
    assert(p.authenticate("carol", "pw3") == "carol")
  }

  test("conf keys are case-insensitive (env-derived keys arrive lower-cased)") {
    val p = AuthenticationProvider.forMethod("LDAP", Map(
      "AUTHENTICATION.LDAP.URL" -> ldap.url,
      "authentication.ldap.basedn" -> "ou=people,dc=graft,dc=test"))
    assert(p.authenticate("alice", "secret") == "alice")
  }

  test("userDnPatterns are tried in order") {
    val p = AuthenticationProvider.forMethod("LDAP", Map(
      "authentication.ldap.url" -> ldap.url,
      "authentication.ldap.userDnPatterns" ->
        "cn=%s,ou=ghosts,dc=graft,dc=test:uid=%s,ou=people,dc=graft,dc=test"))
    assert(p.authenticate("alice", "secret") == "alice")
  }

  test("user filter rejects locally even with valid directory credentials") {
    val p = provider(Map("authentication.ldap.userFilter" -> "bob"))
    intercept[SecurityException] { p.authenticate("alice", "secret") }
    assert(p.authenticate("bob", "hunter2") == "bob")
  }

  test("directory outage propagates as an outage, not a credential rejection") {
    val dead = new LdapAuthenticationProvider(
      url = "ldap://localhost:1", // nothing listens on port 1
      baseDn = Some("ou=people,dc=graft,dc=test"))
    val e = intercept[Exception] { dead.authenticate("alice", "secret") }
    assert(!e.isInstanceOf[SecurityException],
      s"outage must not be a rejection: $e")
  }

  test("stock Hive JDBC opens a session through LDAP auth (and bad bind is refused)") {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val engine = new Engine(SparkFixture.spark)
    val fe = new ThriftFrontend(engine, auth = Some(provider())).start()
    try {
      val conn = DriverManager.getConnection(
        s"jdbc:hive2://localhost:${fe.boundPort}/", "alice", "secret")
      try {
        val rs = conn.createStatement().executeQuery("SELECT session_user() AS u")
        assert(rs.next() && rs.getString("u") == "alice")
      } finally conn.close()
      intercept[java.sql.SQLException] {
        DriverManager.getConnection(
          s"jdbc:hive2://localhost:${fe.boundPort}/", "alice", "wrong")
      }
    } finally fe.stop()
  }
}
