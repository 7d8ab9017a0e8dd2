package graft.server

import java.io.{EOFException, InputStream, OutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

/** Minimal in-memory LDAPv3 server for authentication tests: speaks
  * just enough BER to serve **simple bind** (RFC 4511 §4.2) — parse
  * `LDAPMessage { messageID, BindRequest { version, name, simple
  * password } }`, answer `BindResponse` success(0) /
  * invalidCredentials(49), and treat Unbind as connection close. No
  * search, no TLS — the JDK's JNDI client performs exactly one bind
  * when an InitialDirContext is created with simple auth, which is all
  * [[LdapAuthenticationProvider]] needs.
  *
  * Deliberate (and RFC-permitted) laxness for test value: anonymous
  * binds (empty name+password) and unauthenticated binds (name, empty
  * password) are ACCEPTED, modeling the worst-case directory — the
  * provider must refuse empty passwords client-side or anyone could
  * log in as anyone (RFC 4513 §5.1 / §6.3.1).
  */
final class InMemoryLdapServer(entries: Map[String, String]) {

  private val serverSocket = new ServerSocket(0)
  val port: Int = serverSocket.getLocalPort
  def url: String = s"ldap://localhost:$port"

  private val running = new AtomicBoolean(true)
  @volatile private var bindCount = 0
  /** Number of bind attempts served — lets tests assert the provider
    * never reached the directory (e.g. empty-password guard).
    */
  def binds: Int = bindCount

  // ---- BER primitives ----

  private def readByte(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException
    b
  }

  private def readLength(in: InputStream): Int = {
    val first = readByte(in)
    if ((first & 0x80) == 0) first
    else {
      val n = first & 0x7f
      require(n >= 1 && n <= 4, s"unsupported BER length-of-length $n")
      (0 until n).foldLeft(0)((acc, _) => (acc << 8) | readByte(in))
    }
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException
      off += r
    }
    buf
  }

  /** (tag, value) of the next TLV inside `buf` starting at `pos`;
    * returns (tag, value, nextPos).
    */
  private def readTlv(buf: Array[Byte], pos: Int): (Int, Array[Byte], Int) = {
    val tag = buf(pos) & 0xff
    var p = pos + 1
    var len = buf(p) & 0xff
    p += 1
    if ((len & 0x80) != 0) {
      val n = len & 0x7f
      len = 0
      (0 until n).foreach { _ => len = (len << 8) | (buf(p) & 0xff); p += 1 }
    }
    (tag, java.util.Arrays.copyOfRange(buf, p, p + len), p + len)
  }

  private def berInt(v: Array[Byte]): Int =
    v.foldLeft(0)((acc, b) => (acc << 8) | (b & 0xff))

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] = {
    val len =
      if (content.length < 128) Array(content.length.toByte)
      else if (content.length < 256) Array(0x81.toByte, content.length.toByte)
      else Array(0x82.toByte, (content.length >> 8).toByte, content.length.toByte)
    Array(tag.toByte) ++ len ++ content
  }

  private def bindResponse(msgId: Array[Byte], resultCode: Int): Array[Byte] = {
    val op = tlv(0x61, // [APPLICATION 1] BindResponse
      tlv(0x0a, Array(resultCode.toByte)) ++ // ENUMERATED resultCode
        tlv(0x04, Array.emptyByteArray) ++   // matchedDN ""
        tlv(0x04, Array.emptyByteArray))     // diagnosticMessage ""
    tlv(0x30, tlv(0x02, msgId) ++ op)
  }

  private def serve(sock: Socket): Unit = {
    val in = sock.getInputStream
    val out: OutputStream = sock.getOutputStream
    try {
      while (running.get()) {
        val tag = in.read()
        if (tag < 0) return
        require((tag & 0xff) == 0x30, f"expected LDAPMessage SEQUENCE, got 0x$tag%02x")
        val msg = readFully(in, readLength(in))
        val (idTag, msgId, p1) = readTlv(msg, 0)
        require(idTag == 0x02, "expected messageID INTEGER")
        val (opTag, opVal, _) = readTlv(msg, p1)
        opTag match {
          case 0x60 => // BindRequest
            bindCount += 1
            val (_, _, pv) = readTlv(opVal, 0) // version INTEGER
            val (_, nameB, pn) = readTlv(opVal, pv) // name OCTET STRING
            val (authTag, pwB, _) = readTlv(opVal, pn)
            val name = new String(nameB, StandardCharsets.UTF_8)
            val pw = new String(pwB, StandardCharsets.UTF_8)
            val rc =
              if (authTag != 0x80) 7 // authMethodNotSupported (no SASL here)
              else if (pw.isEmpty) 0 // anonymous/unauthenticated bind: accept!
              else if (entries.get(name).contains(pw)) 0
              else 49 // invalidCredentials
            out.write(bindResponse(msgId, rc))
            out.flush()
          case 0x42 => return // UnbindRequest: close without response
          case other =>
            // protocolError for anything else (no search support)
            out.write(bindResponse(msgId, 2))
            out.flush()
        }
      }
    } catch {
      case _: EOFException | _: SocketException => ()
    } finally sock.close()
  }

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = serverSocket.accept()
        val t = new Thread(() => serve(sock), "ldap-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: SocketException => () /* closed */ }
    }
  }, "ldap-accept")
  acceptor.setDaemon(true)

  def start(): InMemoryLdapServer = { acceptor.start(); this }

  def stop(): Unit = {
    running.set(false)
    serverSocket.close()
  }
}
