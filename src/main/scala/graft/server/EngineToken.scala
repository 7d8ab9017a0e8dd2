package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{MessageDigest, SecureRandom}
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Server↔engine mutual trust from a shared secret — the reference's
  * engine-security stack (kyuubi-common/.../service/authentication/
  * InternalSecurityAccessor.scala:51-66 issues/validates encrypted
  * short-lived tokens from an EngineSecuritySecretProvider secret;
  * EngineSecureAuthenticationProviderImpl.scala accepts the token as
  * the SASL PLAIN password on engine connections).
  *
  * Mechanics: the token is `hex(iv ++ AES-CBC(key, "issuedMs:lifeMs"))`
  * with a fresh random IV per token and `key = SHA-256(secret)[0,16)`
  * (so any secret length works). Validation decrypts under the same
  * secret and rejects expiry. A client that can reach an engine's
  * Thrift port but lacks the gateway's secret cannot mint a token, so
  * one tenant cannot attach to another tenant's engine JVM.
  */
final class EngineTokenManager(secret: String, val tokenMaxLifetimeMs: Long = 10 * 60 * 1000L) {
  require(secret != null && secret.nonEmpty, "engine secret must not be empty")

  private val key = new SecretKeySpec(
    MessageDigest.getInstance("SHA-256").digest(secret.getBytes(UTF_8)).take(16), "AES")
  private val random = new SecureRandom()

  def issueToken(): String = {
    val iv = new Array[Byte](16)
    random.nextBytes(iv)
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.ENCRYPT_MODE, key, new IvParameterSpec(iv))
    val payload = s"${System.currentTimeMillis()}:$tokenMaxLifetimeMs"
    hex(iv ++ c.doFinal(payload.getBytes(UTF_8)))
  }

  /** Throws [[SecurityException]] unless `token` decrypts under the
    * shared secret and is within its lifetime.
    */
  @throws[SecurityException]
  def validate(token: String): Unit = {
    val (issuedMs, lifeMs) =
      try {
        val bytes = unhex(token)
        require(bytes.length > 16, "token shorter than the IV")
        val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(Cipher.DECRYPT_MODE, key, new IvParameterSpec(bytes.take(16)))
        val parts = new String(c.doFinal(bytes.drop(16)), UTF_8).split(":")
        (parts(0).toLong, parts(1).toLong)
      } catch {
        case _: Exception => throw new SecurityException("invalid engine access token")
      }
    if (issuedMs + lifeMs < System.currentTimeMillis())
      throw new SecurityException("engine access token expired")
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  private def unhex(s: String): Array[Byte] = {
    require(s.length % 2 == 0, "odd-length hex")
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }
}

/** SASL PLAIN provider for engine frontends under engine security: the
  * password must be a live token minted by [[EngineTokenManager]] with
  * the same secret; the user is taken as-is (the gateway already
  * authenticated the human and connects as them or their proxy).
  */
final class EngineTokenAuthenticationProvider(tokens: EngineTokenManager)
  extends AuthenticationProvider {
  override def authenticate(user: String, password: String): String = {
    tokens.validate(password)
    if (user == null || user.isEmpty) "anonymous" else user
  }
}
