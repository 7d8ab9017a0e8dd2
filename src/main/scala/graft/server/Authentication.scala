package graft.server

import java.nio.charset.StandardCharsets
import java.security.{Provider, Security}
import javax.security.auth.callback.{Callback, CallbackHandler, NameCallback, PasswordCallback}
import javax.security.sasl.{AuthorizeCallback, Sasl, SaslException, SaslServer, SaslServerFactory}

import org.apache.thrift.transport.{TSaslServerTransport, TTransportFactory}

/** Frontend authentication seam (the reference's pluggable stack:
  * kyuubi-common/.../service/authentication/AuthenticationProviderFactory.scala
  * selects a provider per AuthMethods.scala method — NONE, LDAP,
  * CUSTOM, JDBC — and PlainSASLHelper wires it into the Thrift
  * transport). `authenticate` returns the effective user on success
  * and throws on failure; the SASL layer maps the throw to a rejected
  * OpenSession.
  */
trait AuthenticationProvider {
  @throws[SecurityException]
  def authenticate(user: String, password: String): String
}

/** NONE: every identity accepted (the reference's
  * AnonymousAuthenticationProviderImpl).
  */
object AnonymousAuthenticationProvider extends AuthenticationProvider {
  override def authenticate(user: String, password: String): String =
    if (user == null || user.isEmpty) "anonymous" else user
}

/** In-memory username→password table — the deterministic stand-in for
  * directory-backed providers (LDAP/JDBC) that need a live external
  * service; same seam, same failure contract.
  */
final class StaticAuthenticationProvider(creds: Map[String, String])
  extends AuthenticationProvider {
  override def authenticate(user: String, password: String): String = {
    if (user == null || user.isEmpty)
      throw new SecurityException("user must not be empty")
    if (!creds.get(user).contains(password))
      throw new SecurityException(s"bad credentials for '$user'")
    user
  }
}

/** JDBC-backed authentication (the reference's
  * JdbcAuthenticationProviderImpl, kyuubi-common/.../authentication/
  * JdbcAuthenticationProviderImpl.scala): `query` carries `${user}` /
  * `${password}` placeholders, rewritten positionally into a
  * PreparedStatement (never string-spliced — injection-safe);
  * authentication succeeds iff the query returns at least one row.
  * Works against any JDBC database reachable from the gateway.
  */
final class JdbcAuthenticationProvider(
    url: String, query: String,
    dbUser: Option[String] = None, dbPassword: Option[String] = None)
  extends AuthenticationProvider {

  private val Placeholder = """\$\{(user|password)}""".r
  private val order = Placeholder.findAllMatchIn(query).map(_.group(1)).toSeq
  private val prepared = Placeholder.replaceAllIn(query, "?")
  require(order.nonEmpty,
    "auth query must reference ${user} and/or ${password} placeholders")

  override def authenticate(user: String, password: String): String = {
    if (user == null || user.trim.isEmpty)
      throw new SecurityException("user must not be empty")
    val conn = dbUser match {
      case Some(u) =>
        java.sql.DriverManager.getConnection(url, u, dbPassword.getOrElse(""))
      case None => java.sql.DriverManager.getConnection(url)
    }
    try {
      val ps = conn.prepareStatement(prepared)
      try {
        order.zipWithIndex.foreach {
          case ("user", i) => ps.setString(i + 1, user)
          case ("password", i) => ps.setString(i + 1, password)
          case _ => ()
        }
        ps.setMaxRows(1)
        val rs = ps.executeQuery()
        try {
          if (!rs.next()) throw new SecurityException(s"bad credentials for '$user'")
        } finally rs.close()
      } finally ps.close()
    } finally conn.close()
    user
  }
}

object AuthenticationProvider {
  /** Method-name dispatch, the reference's AuthenticationProviderFactory
    * contract: NONE → anonymous, CUSTOM → reflectively-loaded user
    * class (must implement [[AuthenticationProvider]] with a no-arg
    * constructor), JDBC → credential query against a JDBC database,
    * LDAP → bind-as-user against a directory
    * ([[LdapAuthenticationProvider]]). KERBEROS needs a live KDC and
    * stays out of scope — the seam is where it would plug in.
    */
  def forMethod(method: String, conf: Map[String, String] = Map.empty): AuthenticationProvider =
    method.toUpperCase match {
      case "NONE" => AnonymousAuthenticationProvider
      case "LDAP" => LdapAuthenticationProvider.fromConf(conf)
      case "CUSTOM" =>
        val cls = conf.getOrElse("authentication.custom.class",
          throw new IllegalArgumentException("authentication.custom.class not set"))
        Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[AuthenticationProvider]
      case "JDBC" =>
        new JdbcAuthenticationProvider(
          conf.getOrElse("authentication.jdbc.url",
            throw new IllegalArgumentException("authentication.jdbc.url not set")),
          conf.getOrElse("authentication.jdbc.query",
            throw new IllegalArgumentException("authentication.jdbc.query not set")),
          conf.get("authentication.jdbc.user"),
          conf.get("authentication.jdbc.password"))
      case other =>
        throw new IllegalArgumentException(s"unsupported auth method: $other")
    }
}

/** Server-side SASL PLAIN (RFC 4616) for the Thrift frontend. The JDK
  * ships only the PLAIN *client*; the server mechanism must be
  * registered through JCA — the same shape as Hive's public
  * PlainSaslServer/PlainSaslHelper pair (reference wires it via
  * KyuubiAuthenticationFactory + PlainSASLHelper).
  *
  * Message: `[authzid] NUL authcid NUL passwd`. No security layer
  * (QOP auth) — wrap/unwrap are illegal after negotiation, matching
  * the mechanism.
  */
object PlainSasl {

  /** The SASL-authenticated user for the current connection's worker
    * thread. TThreadPoolServer runs the handshake and every subsequent
    * request of a connection on one thread, so OpenSession reads the
    * identity the transport proved rather than trusting the request
    * body (Hive's TSetIpAddressProcessor uses the same thread-local
    * pattern).
    */
  private val currentUser = new ThreadLocal[String]()
  def authenticatedUser: Option[String] = Option(currentUser.get())

  /** Set/clear the transport-proven identity for the current thread —
    * the HTTP transport authenticates per REQUEST (stateless wire), so
    * its handler installs the Basic-auth identity around each
    * processor call the way the SASL handshake does per connection.
    */
  private[server] def setAuthenticatedUser(user: String): Unit = currentUser.set(user)
  private[server] def clearAuthenticatedUser(): Unit = currentUser.remove()

  final class PlainServerCallbackHandler(provider: AuthenticationProvider)
    extends CallbackHandler {
    override def handle(callbacks: Array[Callback]): Unit = {
      var user: String = null
      var pass: String = null
      var authorize: AuthorizeCallback = null
      callbacks.foreach {
        case nc: NameCallback => user = nc.getName
        case pc: PasswordCallback => pass = new String(pc.getPassword)
        case ac: AuthorizeCallback => authorize = ac
        case other => throw new SaslException(s"unsupported callback: $other")
      }
      val effective =
        try provider.authenticate(user, pass)
        catch { case e: Exception => throw new SaslException(String.valueOf(e.getMessage), e) }
      if (authorize != null) {
        authorize.setAuthorized(true)
        authorize.setAuthorizedID(effective)
      }
      currentUser.set(effective)
    }
  }

  final class PlainSaslServer(cbh: CallbackHandler) extends SaslServer {
    private var complete = false
    private var authzId: String = _

    override def getMechanismName: String = "PLAIN"

    override def evaluateResponse(response: Array[Byte]): Array[Byte] = {
      if (response == null || response.isEmpty)
        throw new SaslException("empty PLAIN response")
      val parts = new String(response, StandardCharsets.UTF_8).split("\u0000", -1)
      if (parts.length != 3)
        throw new SaslException(s"malformed PLAIN message: ${parts.length} fields")
      val Array(authzid, authcid, passwd) = parts
      if (authcid.isEmpty) throw new SaslException("no authentication id")
      val nc = new NameCallback("User", authcid)
      nc.setName(authcid)
      val pc = new PasswordCallback("Password", false)
      pc.setPassword(passwd.toCharArray)
      val ac = new AuthorizeCallback(authcid, if (authzid.isEmpty) authcid else authzid)
      cbh.handle(Array[Callback](nc, pc, ac))
      if (!ac.isAuthorized) throw new SaslException("PLAIN auth failed")
      authzId = ac.getAuthorizedID
      complete = true
      null // single round trip, no challenge
    }

    override def isComplete: Boolean = complete
    override def getAuthorizationID: String = {
      require(complete, "PLAIN negotiation not complete")
      authzId
    }
    // QOP is auth-only: no integrity/confidentiality layer exists.
    override def unwrap(incoming: Array[Byte], offset: Int, len: Int): Array[Byte] =
      throw new IllegalStateException("PLAIN has no security layer")
    override def wrap(outgoing: Array[Byte], offset: Int, len: Int): Array[Byte] =
      throw new IllegalStateException("PLAIN has no security layer")
    override def getNegotiatedProperty(propName: String): AnyRef =
      if (complete && propName == Sasl.QOP) "auth" else null
    override def dispose(): Unit = ()
  }

  final class PlainSaslServerFactory extends SaslServerFactory {
    override def createSaslServer(mechanism: String, protocol: String, serverName: String,
        props: java.util.Map[String, _], cbh: CallbackHandler): SaslServer =
      if ("PLAIN" == mechanism) new PlainSaslServer(cbh) else null
    override def getMechanismNames(props: java.util.Map[String, _]): Array[String] =
      Array("PLAIN")
  }

  final class PlainSaslProvider extends Provider(
      "GraftSaslPlain", "1.0", "graft PLAIN SASL server") {
    put("SaslServerFactory.PLAIN", classOf[PlainSaslServerFactory].getName)
  }

  private lazy val registered: Unit = {
    Security.addProvider(new PlainSaslProvider)
  }

  /** Thrift transport factory negotiating PLAIN against `provider`.
    * A failed authenticate() surfaces to the client as a rejected
    * connection before any TCLIService call is processed.
    */
  def serverTransportFactory(provider: AuthenticationProvider): TTransportFactory = {
    registered
    val factory = new TSaslServerTransport.Factory()
    factory.addServerDefinition("PLAIN", "NONE", null,
      new java.util.HashMap[String, String](), new PlainServerCallbackHandler(provider))
    factory
  }
}
