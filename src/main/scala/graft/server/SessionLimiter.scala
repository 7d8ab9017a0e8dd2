package graft.server

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Connection admission control for the Thrift frontend — the complete
  * reference limiter family (kyuubi-server/.../session/SessionLimiter
  * .scala:34-145 + KyuubiConf.scala:3487-3529):
  *
  *   - per-user, per-ipaddress, and per-user:ipaddress live-connection
  *     caps, each enforced with an atomic increment-then-check (never
  *     scan-then-act);
  *   - a `deny` user list rejected unconditionally (outranks
  *     `unlimited` — reference doc: "the priority of the latter is
  *     higher") — the operator's kill switch for a misbehaving account
  *     without a restart;
  *   - a `denyIps` list for blocking a misbehaving HOST rather than an
  *     account (reference SessionLimiter.scala:111-124);
  *   - an `unlimited` user list that bypasses every cap (service
  *     accounts, admin tooling).
  *
  * Deny/unlimited lists are hot-settable (the admin refresh endpoint's
  * target); caps are construction-time like the reference's
  * `.immutable` conf entries. Unlike the reference, a multi-key
  * admission (user + ip + user:ip) rolls back the keys it already
  * incremented when a later key rejects, so a refused open leaks no
  * counts — and `increment` returns an [[SessionLimiter.Admission]]
  * recording the keys it ACTUALLY took, which `release` decrements
  * exactly. Deriving the release keys from the current unlimited list
  * instead (what the reference does) desyncs counters when the list is
  * hot-swapped mid-connection: a user added after admission would
  * never release their keys, one removed after admission would release
  * sibling counts they never took.
  */
final class SessionLimiter(
    userLimit: Int = 0,
    ipLimit: Int = 0,
    userIpLimit: Int = 0,
    initialUnlimitedUsers: Set[String] = Set.empty,
    initialDenyUsers: Set[String] = Set.empty,
    initialDenyIps: Set[String] = Set.empty) {

  @volatile private var unlimitedUsers: Set[String] = initialUnlimitedUsers
  @volatile private var denyUsers: Set[String] = initialDenyUsers
  @volatile private var denyIps: Set[String] = initialDenyIps

  private val counters = new ConcurrentHashMap[String, AtomicInteger]()

  /** Hot-swap the deny list (admin refresh). */
  def setDenyUsers(users: Set[String]): Unit = denyUsers = users
  def getDenyUsers: Set[String] = denyUsers

  /** Hot-swap the denied client IPs (admin refresh). */
  def setDenyIps(ips: Set[String]): Unit = denyIps = ips
  def getDenyIps: Set[String] = denyIps

  /** Hot-swap the unlimited list (admin refresh). */
  def setUnlimitedUsers(users: Set[String]): Unit = unlimitedUsers = users
  def getUnlimitedUsers: Set[String] = unlimitedUsers

  private def keysFor(user: String, ip: String): Seq[(String, Int, String)] = {
    val ks = Seq.newBuilder[(String, Int, String)]
    if (userIpLimit > 0 && user.nonEmpty && ip.nonEmpty)
      ks += ((s"$user:$ip", userIpLimit,
        s"Connection limit per user:ipaddress reached (user:ipaddress: $user:$ip limit: $userIpLimit)"))
    if (userLimit > 0 && user.nonEmpty)
      ks += ((user, userLimit,
        s"Connection limit per user reached (user: $user limit: $userLimit)"))
    if (ipLimit > 0 && ip.nonEmpty)
      ks += ((ip, ipLimit,
        s"Connection limit per ipaddress reached (ipaddress: $ip limit: $ipLimit)"))
    ks.result()
  }

  /** Admit one connection or throw. Deny lists first (unconditional,
    * even for unlimited users), then the three caps unless the user is
    * on the unlimited list. The returned admission records the keys
    * this call incremented — hand it back to [[release]] on close.
    */
  def increment(user: String, ip: String): SessionLimiter.Admission = {
    if (user.nonEmpty && denyUsers.contains(user))
      throw new IllegalStateException(
        s"Connection denied because the user is in the deny user list. (user: $user)")
    if (ip.nonEmpty && denyIps.contains(ip))
      throw new IllegalStateException(
        s"Connection denied because the client ip is in the deny ip list. (ipAddress: $ip)")
    if (unlimitedUsers.contains(user)) return SessionLimiter.Admission(Nil)
    val keys = keysFor(user, ip)
    var taken = List.empty[String]
    keys.foreach { case (key, limit, msg) =>
      val c = counters.computeIfAbsent(key, _ => new AtomicInteger())
      if (c.incrementAndGet() > limit) {
        c.decrementAndGet()
        // roll back the keys already taken for THIS admission, or a
        // refused open would permanently eat sibling-cap headroom
        taken.foreach(k => Option(counters.get(k)).foreach(_.decrementAndGet()))
        throw new IllegalStateException(msg)
      }
      taken ::= key
    }
    SessionLimiter.Admission(taken)
  }

  /** Release exactly the keys one admission took — immune to
    * unlimited-list hot swaps between admit and close.
    */
  def release(admission: SessionLimiter.Admission): Unit =
    admission.keys.foreach { key =>
      Option(counters.get(key)).foreach(
        _.accumulateAndGet(1, (cur, d) => if (cur > 0) cur - d else cur))
    }

  /** Live count for one key (tests / metrics). */
  def count(key: String): Int =
    Option(counters.get(key)).map(_.get()).getOrElse(0)
}

object SessionLimiter {
  /** The counter keys one `increment` actually took (empty for an
    * unlimited-user bypass). Opaque to callers: store it with the
    * session, return it to `release` on close.
    */
  final case class Admission(keys: List[String])
}

/** Per-connection client IP, captured by the Thrift server event
  * handler on the worker thread before each request is processed (the
  * same thread-confinement contract PlainSasl.authenticatedUser rides:
  * TThreadPoolServer handles one connection's messages on one thread).
  * Hive's TSetIpAddressProcessor is the reference pattern.
  */
object ClientIp {
  private val cur = new ThreadLocal[String]()
  def current: Option[String] = Option(cur.get()).filter(_.nonEmpty)
  private[server] def set(ip: String): Unit = cur.set(ip)
  private[server] def clear(): Unit = cur.remove()

  /** Remote address of a (possibly SASL-wrapped) transport. */
  private[server] def remoteIp(t: org.apache.thrift.transport.TTransport): String = t match {
    case s: org.apache.thrift.transport.TSocket =>
      Option(s.getSocket.getInetAddress).map(_.getHostAddress).getOrElse("")
    case sasl: org.apache.thrift.transport.TSaslServerTransport =>
      remoteIp(sasl.getUnderlyingTransport)
    case sasl: org.apache.thrift.transport.TSaslClientTransport =>
      remoteIp(sasl.getUnderlyingTransport)
    case _ => ""
  }
}
