package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, ScheduledFuture, TimeUnit}

import scala.jdk.CollectionConverters._

/** Delegation-token plumbing — the reference's credentials stack
  * (kyuubi-server/.../credentials/HadoopCredentialsManager.scala:
  * per-user CredentialsRef with an epoch, a single renewal thread, a
  * session-epoch map driving sendCredentialsIfNeeded, and an idle
  * checker purging unused refs; HadoopDelegationTokenProvider.scala is
  * the provider SPI) re-expressed without Hadoop security classes:
  *
  *  - [[DelegationTokenProvider]] is the pluggable SPI: discovered via
  *    `ServiceLoader` plus programmatic registration; providers that
  *    report `delegationTokensRequired() == false` are closed and
  *    dropped at initialize, exactly like the reference.
  *  - [[TokenBundle]] is the Credentials analogue: alias → (token
  *    bytes, expiry hint). It serializes to a single base64 string so
  *    it can ride an env var / conf value to an engine child.
  *  - [[CredentialsManager]] renews per-user bundles on a schedule
  *    that is EXPIRY-AWARE: when the obtained tokens carry an expiry,
  *    the next renewal fires at `expiry - renewalLeadMs` if that is
  *    sooner than the fixed interval — a token that outlives the
  *    interval is not re-obtained early, and one that expires sooner
  *    is re-obtained in time. Failures retry after `renewalRetryWaitMs`
  *    without advancing the epoch.
  *
  * Real Kerberos (the Hadoop `Credentials`/KDC path the reference
  * drives) is unexercisable in this sandbox — no KDC, and MiniKdc is
  * not resolvable offline — the same env-block the SPNEGO stack
  * documents; the provider SPI, renewal scheduling, epoch/session
  * bookkeeping, and engine-launch handoff are the portable 90% and
  * are fully exercised against fake providers.
  */
trait DelegationTokenProvider {
  /** Unique service name (differentiates providers in the registry). */
  def serviceName: String

  /** Called once at manager initialize with the manager's conf map. */
  def initialize(conf: Map[String, String]): Unit = ()

  /** False drops (and closes) the provider at initialize — the
    * "security disabled" path.
    */
  def delegationTokensRequired(): Boolean

  /** Obtain fresh tokens for `owner` into `creds`. Throwing marks the
    * renewal attempt failed (retried after the retry wait).
    */
  def obtainDelegationTokens(owner: String, creds: TokenBundle): Unit

  def close(): Unit = ()
}

/** Alias → (opaque token bytes, expiry epoch ms or -1). */
final class TokenBundle {
  private val tokens = new ConcurrentHashMap[String, (Array[Byte], Long)]()

  def add(alias: String, token: Array[Byte], expiryMs: Long = -1L): Unit =
    tokens.put(alias, (token, expiryMs))

  def get(alias: String): Option[Array[Byte]] = Option(tokens.get(alias)).map(_._1)
  def aliases: Set[String] = tokens.keySet().asScala.toSet
  def isEmpty: Boolean = tokens.isEmpty

  /** Earliest expiry across tokens that declare one; -1 if none do. */
  def minExpiryMs: Long = {
    val es = tokens.values().asScala.map(_._2).filter(_ > 0)
    if (es.isEmpty) -1L else es.min
  }

  /** One base64 blob: `b64(alias):expiry:b64(token)` lines — env-var
    * safe. The alias is base64'd too (it is a provider-chosen string,
    * so it may contain any character — an unescaped alias with the
    * separator in it would silently shift the fields).
    */
  def encoded: String = {
    val b64 = java.util.Base64.getEncoder
    val body = tokens.asScala.toSeq.sortBy(_._1).map { case (a, (t, e)) =>
      s"${b64.encodeToString(a.getBytes(UTF_8))}:$e:${b64.encodeToString(t)}"
    }.mkString("\n")
    b64.encodeToString(body.getBytes(UTF_8))
  }
}

object TokenBundle {
  def decode(encoded: String): TokenBundle = {
    val b = new TokenBundle
    val body = new String(java.util.Base64.getDecoder.decode(encoded), UTF_8)
    body.linesIterator.filter(_.nonEmpty).foreach { line =>
      line.split(":", 3) match {
        case Array(alias, expiry, tok) =>
          b.add(new String(java.util.Base64.getDecoder.decode(alias), UTF_8),
            java.util.Base64.getDecoder.decode(tok), expiry.toLong)
        case _ =>
          throw new IllegalArgumentException(
            s"malformed TokenBundle line (expected b64(alias):expiry:b64(token)): '$line'")
      }
    }
    b
  }
}

final class CredentialsManager(
    conf: Map[String, String] = Map.empty,
    // fixed renewal cadence (reference CREDENTIALS_RENEWAL_INTERVAL)
    renewalIntervalMs: Long = 60 * 60 * 1000L,
    // retry backoff after a failed obtain (CREDENTIALS_RENEWAL_RETRY_WAIT)
    renewalRetryWaitMs: Long = 60 * 1000L,
    // re-obtain this long BEFORE a declared token expiry
    renewalLeadMs: Long = 10 * 60 * 1000L,
    // purge user refs idle longer than this (CREDENTIALS_IDLE_TIMEOUT)
    idleTimeoutMs: Long = 6 * 60 * 60 * 1000L,
    idleCheckIntervalMs: Long = 60 * 60 * 1000L,
    extraProviders: Seq[DelegationTokenProvider] = Nil) extends AutoCloseable {

  final class CredentialsRef(val appUser: String) {
    @volatile private[CredentialsManager] var epoch: Long = -1L
    @volatile private[CredentialsManager] var encodedCreds: String = ""
    @volatile private[CredentialsManager] var expiryMs: Long = -1L
    @volatile private[CredentialsManager] var lastAccess: Long = System.currentTimeMillis()
    @volatile private[CredentialsManager] var task: ScheduledFuture[_] = null
    @volatile private[CredentialsManager] var lastError: Throwable = null
    private[CredentialsManager] val ready = new java.util.concurrent.CountDownLatch(1)

    def getEpoch: Long = epoch
    def getEncoded: String = encodedCreds
    def touch(): Unit = lastAccess = System.currentTimeMillis()
  }

  // ServiceLoader + programmatic registration, filtered by
  // delegationTokensRequired (the dropped ones are closed)
  private val providers: Map[String, DelegationTokenProvider] = {
    val loaded = java.util.ServiceLoader.load(classOf[DelegationTokenProvider])
      .iterator().asScala.toSeq
    (loaded ++ extraProviders).map { p => p.initialize(conf); p }
      .filter { p =>
        val req = p.delegationTokensRequired()
        if (!req) p.close()
        req
      }
      .map(p => p.serviceName -> p).toMap
  }

  def providerNames: Set[String] = providers.keySet

  private val userRefs = new ConcurrentHashMap[String, CredentialsRef]()
  private val sessionEpochs = new ConcurrentHashMap[String, Long]()

  private val scheduler: Option[ScheduledExecutorService] =
    if (providers.isEmpty) None
    else Some(Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-credentials-renewal"); t.setDaemon(true); t
    }))

  scheduler.foreach(_.scheduleWithFixedDelay(
    () => purgeIdle(), idleCheckIntervalMs, idleCheckIntervalMs, TimeUnit.MILLISECONDS))

  /** Obtain-or-return the user's credentials, waiting up to
    * `waitMs` for the first obtain to land. Empty string when no
    * provider is active (the reference's "no token required" path).
    * When the first obtain never succeeded AND a provider error was
    * recorded, the error is rethrown — a misconfigured provider must
    * surface at engine launch, not silently at the first secured read.
    */
  def credentialsFor(appUser: String, waitMs: Long = 15000L): String = {
    if (scheduler.isEmpty) return ""
    val ref = getOrCreateRef(appUser)
    ref.ready.await(waitMs, TimeUnit.MILLISECONDS)
    val creds = ref.getEncoded
    if (creds.isEmpty && ref.lastError != null) {
      throw new IllegalStateException(
        s"delegation-token obtain failed for '$appUser' " +
          s"(no credentials after ${waitMs}ms): ${ref.lastError.getMessage}",
        ref.lastError)
    }
    creds
  }

  /** Epoch-compared push to an engine (reference
    * sendCredentialsIfNeeded): `send` runs only when the user's
    * credentials are newer than what this session last delivered, and
    * the session epoch advances only when `send` succeeds.
    */
  def sendCredentialsIfNeeded(sessionId: String, appUser: String)(
      send: String => Unit): Unit = {
    if (scheduler.isEmpty) return
    val ref = getOrCreateRef(appUser)
    val sessionEpoch = sessionEpochs.getOrDefault(sessionId, -1L)
    val (epoch, creds) = (ref.getEpoch, ref.getEncoded)
    if (epoch > sessionEpoch) {
      try {
        send(creds)
        sessionEpochs.put(sessionId, epoch)
      } catch { case _: Exception => () } // unchanged epoch → retried next call
    }
  }

  def removeSessionCredentialsEpoch(sessionId: String): Unit =
    sessionEpochs.remove(sessionId)

  def sessionEpoch(sessionId: String): Long =
    sessionEpochs.getOrDefault(sessionId, -1L)

  // test seam: the full session-epoch map (specs that only hold a JDBC
  // connection, not the Thrift handle, assert delivery through this)
  private[server] def sessionEpochsSnapshot: Map[String, Long] =
    sessionEpochs.asScala.toMap

  def userEpoch(appUser: String): Long =
    Option(userRefs.get(appUser)).map(_.getEpoch).getOrElse(-1L)

  private def getOrCreateRef(appUser: String): CredentialsRef = {
    val ref = userRefs.computeIfAbsent(appUser, u => {
      val r = new CredentialsRef(u)
      r.task = scheduler.get.schedule(renewalTask(r), 0, TimeUnit.MILLISECONDS)
      r
    })
    ref.touch()
    ref
  }

  private def renewalTask(ref: CredentialsRef): Runnable = () => {
    val delay =
      try {
        val bundle = new TokenBundle
        providers.values.foreach(_.obtainDelegationTokens(ref.appUser, bundle))
        ref.encodedCreds = bundle.encoded
        ref.expiryMs = bundle.minExpiryMs
        ref.epoch += 1
        ref.lastError = null
        ref.ready.countDown()
        // expiry-aware: renew at expiry - lead when that is sooner
        // than the fixed interval (never sooner than the retry wait)
        if (ref.expiryMs > 0) {
          val untilLead = ref.expiryMs - renewalLeadMs - System.currentTimeMillis()
          math.max(renewalRetryWaitMs min renewalIntervalMs,
            math.min(renewalIntervalMs, untilLead))
        } else renewalIntervalMs
      } catch {
        case e: Exception =>
          ref.lastError = e // epoch unchanged; surfaced by credentialsFor
          renewalRetryWaitMs
      }
    val s = scheduler.get
    // reschedule only while THIS ref is still the live one for the user
    // (an identity check, not containsKey: a purge + recreate for the
    // same user must not leave the orphaned ref's chain running forever)
    if (!s.isShutdown && (userRefs.get(ref.appUser) eq ref)) {
      ref.task = s.schedule(renewalTask(ref), delay, TimeUnit.MILLISECONDS)
    }
  }

  private def purgeIdle(): Unit = {
    val cutoff = System.currentTimeMillis() - idleTimeoutMs
    userRefs.asScala.foreach { case (u, ref) =>
      if (ref.lastAccess < cutoff) {
        userRefs.remove(u)
        Option(ref.task).foreach(_.cancel(false))
      }
    }
  }

  // test seam: run one purge pass now
  private[server] def purgeIdleNow(): Unit = purgeIdle()

  override def close(): Unit = {
    providers.values.foreach(p => try p.close() catch { case _: Exception => () })
    scheduler.foreach { s =>
      s.shutdownNow()
      s.awaitTermination(10, TimeUnit.SECONDS)
    }
  }
}
