package graft.server

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.scalatest.funsuite.AnyFunSuite

/** The credentials seam end to end against fake providers: provider
  * registry (ServiceLoader + programmatic, required=false dropped and
  * closed), scheduled renewal with expiry-aware re-obtain and failure
  * retry, epoch-compared session delivery, idle purge, and the
  * engine-launch handoff. Real Kerberos is env-blocked (no KDC
  * offline) — documented in CredentialsManager's scaladoc.
  */
class CredentialsManagerSpec extends AnyFunSuite {

  private final class FakeProvider(name: String,
      expiryAhead: Long = -1L) extends DelegationTokenProvider {
    val obtains = new AtomicInteger(0)
    val failing = new AtomicBoolean(false)
    val closed = new AtomicBoolean(false)
    @volatile var required = true
    override def serviceName: String = name
    override def delegationTokensRequired(): Boolean = required
    override def obtainDelegationTokens(owner: String, creds: TokenBundle): Unit = {
      if (failing.get()) throw new RuntimeException("kdc down")
      val n = obtains.incrementAndGet()
      val exp = if (expiryAhead > 0) System.currentTimeMillis() + expiryAhead else -1L
      creds.add(name, s"$name-token-$owner-$n".getBytes("UTF-8"), exp)
    }
    override def close(): Unit = closed.set(true)
  }

  private def await(timeoutMs: Long = 10000)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(20)
    cond
  }

  test("a provider reporting tokens-not-required is dropped and closed at initialize") {
    val active = new FakeProvider("hive")
    val inactive = new FakeProvider("hbase")
    inactive.required = false
    val mgr = new CredentialsManager(extraProviders = Seq(active, inactive))
    try {
      // the test classpath's SPI provider rides along in every manager
      assert(mgr.providerNames == Set("hive", "spi-fake"))
      assert(inactive.closed.get(), "dropped provider must be closed")
    } finally mgr.close()
  }

  test("ServiceLoader-registered providers join the registry") {
    val mgr = new CredentialsManager()
    try assert(mgr.providerNames.contains("spi-fake"),
      s"META-INF/services provider must load: ${mgr.providerNames}")
    finally mgr.close()
  }

  test("first obtain lands synchronously via credentialsFor; renewal advances the epoch on the fixed interval") {
    val p = new FakeProvider("hdfs")
    val mgr = new CredentialsManager(renewalIntervalMs = 200,
      renewalRetryWaitMs = 100, extraProviders = Seq(p))
    try {
      val creds = mgr.credentialsFor("alice")
      assert(creds.nonEmpty)
      val bundle = TokenBundle.decode(creds)
      assert(bundle.get("hdfs").exists(t =>
        new String(t, "UTF-8").startsWith("hdfs-token-alice")))
      assert(mgr.userEpoch("alice") == 0)
      assert(await()(mgr.userEpoch("alice") >= 2), "renewals must keep firing")
      assert(p.obtains.get() >= 3)
    } finally mgr.close()
  }

  test("expiry-aware: a token expiring before the interval is re-obtained ahead of its expiry") {
    // fixed interval is an hour; the token lives 600 ms with a 300 ms
    // lead → the SECOND obtain must fire within seconds, long before
    // the interval
    val p = new FakeProvider("s3", expiryAhead = 600)
    val mgr = new CredentialsManager(renewalIntervalMs = 60 * 60 * 1000L,
      renewalRetryWaitMs = 50, renewalLeadMs = 300, extraProviders = Seq(p))
    try {
      mgr.credentialsFor("bob")
      assert(await(5000)(p.obtains.get() >= 2),
        s"expiry must drive the re-obtain, not the hour interval (obtains=${p.obtains.get()})")
    } finally mgr.close()
  }

  test("a failed obtain retries after the retry wait without advancing the epoch") {
    val p = new FakeProvider("hive")
    p.failing.set(true)
    val mgr = new CredentialsManager(renewalIntervalMs = 60 * 60 * 1000L,
      renewalRetryWaitMs = 50, extraProviders = Seq(p))
    try {
      // a permanently failing provider SURFACES at the launch path —
      // the wait elapsing with nothing obtained rethrows the provider
      // error instead of silently returning empty credentials
      val ex = intercept[IllegalStateException] {
        mgr.credentialsFor("carol", waitMs = 300)
      }
      assert(ex.getMessage.contains("carol") && ex.getMessage.contains("kdc down"),
        s"launch failure must name the user and the provider error: ${ex.getMessage}")
      assert(mgr.userEpoch("carol") == -1)
      p.failing.set(false)
      assert(await()(mgr.userEpoch("carol") >= 0), "retry must recover")
      assert(mgr.credentialsFor("carol").nonEmpty)
    } finally mgr.close()
  }

  test("TokenBundle aliases survive separator characters; malformed lines fail descriptively") {
    val b = new TokenBundle
    // provider-chosen aliases may contain anything — '=' and ':' used
    // to shift the encoded fields (r16 ADVICE)
    b.add("svc=prod:region=eu", "tok-1".getBytes("UTF-8"), 123L)
    b.add("plain", "tok-2".getBytes("UTF-8"))
    val rt = TokenBundle.decode(b.encoded)
    assert(rt.aliases == Set("svc=prod:region=eu", "plain"))
    assert(rt.get("svc=prod:region=eu").exists(new String(_, "UTF-8") == "tok-1"))
    assert(rt.minExpiryMs == 123L)
    val bad = java.util.Base64.getEncoder.encodeToString(
      "just-one-field".getBytes("UTF-8"))
    val ex = intercept[IllegalArgumentException](TokenBundle.decode(bad))
    assert(ex.getMessage.contains("malformed TokenBundle line"))
  }

  test("sendCredentialsIfNeeded delivers once per epoch; a failing send leaves the epoch undelivered") {
    val p = new FakeProvider("hive")
    val mgr = new CredentialsManager(renewalIntervalMs = 60 * 60 * 1000L,
      extraProviders = Seq(p))
    try {
      mgr.credentialsFor("dave")
      val sent = new AtomicInteger(0)
      mgr.sendCredentialsIfNeeded("sess1", "dave")(_ => sent.incrementAndGet())
      assert(sent.get() == 1 && mgr.sessionEpoch("sess1") == 0)
      // same epoch → no resend
      mgr.sendCredentialsIfNeeded("sess1", "dave")(_ => sent.incrementAndGet())
      assert(sent.get() == 1)
      // failing send: epoch stays undelivered, retried next call
      mgr.sendCredentialsIfNeeded("sess2", "dave")(_ => throw new RuntimeException("engine gone"))
      assert(mgr.sessionEpoch("sess2") == -1)
      mgr.sendCredentialsIfNeeded("sess2", "dave")(_ => sent.incrementAndGet())
      assert(sent.get() == 2 && mgr.sessionEpoch("sess2") == 0)
      // session close removes the epoch
      mgr.removeSessionCredentialsEpoch("sess1")
      assert(mgr.sessionEpoch("sess1") == -1)
    } finally mgr.close()
  }

  test("idle refs are purged and their renewal stops") {
    val p = new FakeProvider("hive")
    val mgr = new CredentialsManager(renewalIntervalMs = 60 * 60 * 1000L,
      idleTimeoutMs = 1, extraProviders = Seq(p))
    try {
      mgr.credentialsFor("erin")
      assert(mgr.userEpoch("erin") == 0)
      Thread.sleep(10)
      mgr.purgeIdleNow()
      assert(mgr.userEpoch("erin") == -1, "idle ref must be purged")
      val before = p.obtains.get()
      Thread.sleep(150)
      assert(p.obtains.get() == before, "a purged ref must not keep renewing")
    } finally mgr.close()
  }

  test("engine launch env carries the obtained tokens for the space's user") {
    val p = new FakeProvider("hdfs")
    val mgr = new CredentialsManager(renewalIntervalMs = 60 * 60 * 1000L,
      extraProviders = Seq(p))
    val dir = java.nio.file.Files.createTempDirectory("graft-creds-launch")
    try {
      val b = new EngineProcBuilder(dir, credentialsManager = Some(mgr))
      val env = b.launchEnv("user/alice")
      val enc = env.getOrElse("GRAFT_ENGINE_CREDENTIALS",
        fail(s"launch env must carry credentials: $env"))
      val bundle = TokenBundle.decode(enc)
      assert(bundle.get("hdfs").exists(t =>
        new String(t, "UTF-8").startsWith("hdfs-token-alice")),
        "tokens must be obtained for the space's owner")
      // impersonation wins over the space segment
      val bProxy = new EngineProcBuilder(dir, proxyUser = Some("zoe"),
        credentialsManager = Some(mgr))
      val encProxy = bProxy.launchEnv("user/alice")("GRAFT_ENGINE_CREDENTIALS")
      assert(new String(TokenBundle.decode(encProxy).get("hdfs").get, "UTF-8")
        .startsWith("hdfs-token-zoe"))
      // without a manager the key is absent
      assert(!new EngineProcBuilder(dir).launchEnv("user/alice")
        .contains("GRAFT_ENGINE_CREDENTIALS"))
    } finally {
      mgr.close()
    }
  }
}

/** Loaded via META-INF/services — proves the ServiceLoader seam. */
final class SpiFakeTokenProvider extends DelegationTokenProvider {
  override def serviceName: String = "spi-fake"
  override def delegationTokensRequired(): Boolean = true
  override def obtainDelegationTokens(owner: String, creds: TokenBundle): Unit =
    creds.add("spi-fake", s"spi-$owner".getBytes("UTF-8"))
}
