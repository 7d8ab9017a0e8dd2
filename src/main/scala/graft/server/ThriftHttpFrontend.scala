package graft.server

import java.io.ByteArrayInputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.transport.TIOStreamTransport

/** Thrift-over-HTTP transport for the TCLIService frontend — the
  * reference's `kyuubi.frontend.protocols=THRIFT_HTTP` /
  * HiveServer2 `hive.server2.transport.mode=http` wire (reference
  * kyuubi-server/.../KyuubiTHttpFrontendService.scala, which mounts
  * Thrift's TServlet pattern on a web server). Stock Hive JDBC
  * connects with `;transportMode=http;httpPath=cliservice`.
  *
  * Each POST body is one Thrift binary message: it is fed through the
  * SAME `TCLIService.Processor` the binary frontend uses (session and
  * operation state are shared — a handle opened over HTTP pages over
  * HTTP or binary alike), and the serialized response is the reply
  * body. The wire is stateless, so authentication is per request:
  * with a provider configured, the `Authorization: Basic` credentials
  * (what Hive JDBC sends in HTTP mode without Kerberos) must pass the
  * same [[AuthenticationProvider]] seam as SASL PLAIN, and the proven
  * identity is installed for the processor call so OpenSession trusts
  * the transport, not the request body.
  */
final class ThriftHttpFrontend(frontend: ThriftFrontend, requestedPort: Int = 0,
    httpPath: String = "cliservice", auth: Option[AuthenticationProvider] = None) {

  private val processor = frontend.processor

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(requestedPort), 0)
  val boundPort: Int = server.getAddress.getPort

  private def basicCredentials(ex: HttpExchange): Option[(String, String)] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.regionMatches(true, 0, "Basic ", 0, 6))
      .flatMap { h =>
        try {
          val dec = new String(Base64.getDecoder.decode(h.substring(6).trim),
            StandardCharsets.UTF_8)
          dec.split(":", 2) match {
            case Array(u, p) => Some((u, p))
            case _ => None
          }
        } catch { case _: IllegalArgumentException => None }
      }

  server.createContext(s"/$httpPath", (ex: HttpExchange) => {
    try {
      if (ex.getRequestMethod != "POST") {
        ex.sendResponseHeaders(405, -1)
      } else {
        val authedUser = auth match {
          case None => None
          case Some(p) =>
            basicCredentials(ex) match {
              case Some((u, pw)) =>
                try Some(p.authenticate(u, pw))
                catch { case _: Exception => Some(null) } // marker: reject
              case None => Some(null)
            }
        }
        if (authedUser.contains(null)) {
          ex.getResponseHeaders.set("WWW-Authenticate", "Basic realm=\"graft\"")
          ex.sendResponseHeaders(401, -1)
        } else {
          val body = ex.getRequestBody.readAllBytes()
          val outBytes = new java.io.ByteArrayOutputStream(4096)
          val transport = new TIOStreamTransport(new ByteArrayInputStream(body), outBytes)
          val proto = new TBinaryProtocol(transport)
          authedUser.foreach(PlainSasl.setAuthenticatedUser)
          try processor.process(proto, proto)
          finally PlainSasl.clearAuthenticatedUser()
          val resp = outBytes.toByteArray
          ex.getResponseHeaders.set("Content-Type", "application/x-thrift")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
        }
      }
    } catch {
      case _: Throwable => try ex.sendResponseHeaders(500, -1) catch { case _: Throwable => }
    } finally ex.close()
  })
  server.setExecutor(Executors.newFixedThreadPool(16, r => {
    val t = new Thread(r, "graft-thrift-http")
    t.setDaemon(true)
    t
  }))

  def start(): ThriftHttpFrontend = { server.start(); this }

  def stop(): Unit = server.stop(0)
}
