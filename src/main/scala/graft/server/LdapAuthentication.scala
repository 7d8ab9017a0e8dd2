package graft.server

import javax.naming.{AuthenticationException, Context, NamingException}
import javax.naming.directory.InitialDirContext

/** LDAP authentication behind the [[AuthenticationProvider]] seam —
  * the reference's directory-backed method (kyuubi-common/.../
  * authentication/LdapAuthenticationProviderImpl.scala:32 with the
  * principal-derivation rules of ldap/LdapUtils.scala). The shape is
  * **bind-as-user**: the gateway never stores directory credentials;
  * it derives one or more candidate principals for the presented
  * username and attempts an LDAP simple bind with the presented
  * password — the directory itself is the password oracle.
  *
  * Candidate principals, in order (mirrors the reference's
  * `createCandidatePrincipals`):
  *   1. a username that already looks like a DN (`uid=a,dc=x`) or
  *      carries a domain (`a@corp`) is used verbatim;
  *   2. each configured `userDnPattern` with `%s` replaced by the user;
  *   3. `guidKey=user,baseDn` when `baseDn` is configured;
  *   4. `user@domain` when `domain` is configured.
  * The first bind that succeeds authenticates; the last failure's
  * rejection surfaces if none do.
  *
  * Guard rails shared with the reference: blank user and blank/NUL
  * password are rejected *before* any directory call — RFC 4513 §5.1
  * treats an empty password as an anonymous bind, which would
  * otherwise "succeed" and let anyone in. An optional `allowedUsers`
  * allow-list replays the reference's UserFilter (a local check on the
  * short username, no directory search needed).
  *
  * Failure contract: a directory "no" (invalid credentials / unknown
  * DN) throws SecurityException — the seam's rejection type. A
  * directory *outage* (connection refused, timeouts) propagates as the
  * NamingException it is, so callers distinguish "wrong password"
  * (401) from "auth backend down" (500) — see ThriftHttpFrontend.
  */
final class LdapAuthenticationProvider(
    url: String,
    baseDn: Option[String] = None,
    guidKey: String = "uid",
    domain: Option[String] = None,
    userDnPatterns: Seq[String] = Nil,
    allowedUsers: Option[Set[String]] = None)
  extends AuthenticationProvider {

  private def looksLikeDn(u: String): Boolean = u.contains("=")
  private def hasDomain(u: String): Boolean = u.contains("@")

  /** `uid=alice,ou=people,...` → `alice`; `alice@corp` → `alice`. */
  private[server] def shortUserName(u: String): String =
    if (looksLikeDn(u)) {
      val rdn = u.split(",", 2).head
      rdn.split("=", 2) match {
        case Array(_, v) => v.trim
        case _ => u
      }
    } else if (hasDomain(u)) u.split("@", 2).head
    else u

  private[server] def candidatePrincipals(user: String): Seq[String] = {
    if (looksLikeDn(user) || hasDomain(user)) Seq(user)
    else {
      val fromPatterns = userDnPatterns.map(_.replace("%s", user))
      val fromBase = baseDn.map(b => s"$guidKey=$user,$b").toSeq
      val fromDomain = domain.map(d => s"$user@$d").toSeq
      val all = fromPatterns ++ fromBase ++ fromDomain
      if (all.nonEmpty) all else Seq(user)
    }
  }

  private def bind(principal: String, password: String): Unit = {
    val env = new java.util.Hashtable[String, String]()
    env.put(Context.INITIAL_CONTEXT_FACTORY, "com.sun.jndi.ldap.LdapCtxFactory")
    env.put(Context.PROVIDER_URL, url)
    env.put(Context.SECURITY_AUTHENTICATION, "simple")
    env.put(Context.SECURITY_PRINCIPAL, principal)
    env.put(Context.SECURITY_CREDENTIALS, password)
    val ctx = new InitialDirContext(env)
    ctx.close()
  }

  override def authenticate(user: String, password: String): String = {
    if (user == null || user.trim.isEmpty)
      throw new SecurityException("LDAP: user must not be empty")
    if (password == null || password.isEmpty || password.getBytes()(0) == 0)
      throw new SecurityException(
        "LDAP: empty password would be an anonymous bind — rejected")
    val short = shortUserName(user)
    allowedUsers.foreach { allowed =>
      if (!allowed.contains(short))
        throw new SecurityException(s"LDAP: user '$short' not permitted by user filter")
    }
    val candidates = candidatePrincipals(user)
    var lastReject: AuthenticationException = null
    candidates.foreach { principal =>
      try {
        bind(principal, password)
        return short
      } catch {
        case e: AuthenticationException => lastReject = e // try next candidate
      }
      // any other NamingException (CommunicationException, …) is an
      // outage, not a rejection — let it propagate
    }
    throw new SecurityException(
      s"LDAP: bad credentials for '$user'" +
        Option(lastReject).map(e => s": ${e.getMessage}").getOrElse(""))
  }
}

object LdapAuthenticationProvider {
  /** Build from the flat conf map `AuthenticationProvider.forMethod`
    * receives (keys mirror the reference's
    * `kyuubi.authentication.ldap.*` family). Lookup is
    * case-insensitive: GatewayMain derives these keys from environment
    * variables, which arrive lower-cased (`...ldap.basedn`).
    */
  def fromConf(conf: Map[String, String]): LdapAuthenticationProvider = {
    val lower = conf.map { case (k, v) => k.toLowerCase -> v }
    def get(key: String): Option[String] = lower.get(key.toLowerCase)
    new LdapAuthenticationProvider(
      url = get("authentication.ldap.url").getOrElse(
        throw new IllegalArgumentException("authentication.ldap.url not set")),
      baseDn = get("authentication.ldap.baseDn"),
      guidKey = get("authentication.ldap.guidKey").getOrElse("uid"),
      domain = get("authentication.ldap.domain"),
      userDnPatterns = get("authentication.ldap.userDnPatterns")
        .map(_.split(":").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil),
      allowedUsers = get("authentication.ldap.userFilter")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet))
  }
}
