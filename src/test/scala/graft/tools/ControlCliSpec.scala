package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Engine
import graft.server.RestFrontend

/** graft-ctl driven against a live gateway: every verb/noun the CLI
  * offers round-trips through the REST admin surface (the reference's
  * kyuubi-ctl contract).
  */
class ControlCliSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def withServer(f: (HttpClient, String, String) => Unit): Unit = {
    val engine = new Engine(spark)
    val front = new RestFrontend(engine, port = 0)
    val port = front.start()
    try f(HttpClient.newHttpClient(), s"http://localhost:$port",
      s"http://localhost:$port/api/v1")
    finally front.stop()
  }

  private def post(c: HttpClient, url: String, body: String): String =
    c.send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  private def extract(json: String, key: String): String = {
    val m = java.util.regex.Pattern.compile("\"" + key + "\"\\s*:\\s*\"([^\"]*)\"").matcher(json)
    assert(m.find(), s"$key not in $json"); m.group(1)
  }

  private def ctl(api: String, args: String*): ControlCli.Result =
    ControlCli.run((Seq("--api", api) ++ args).toArray)

  test("admin verbs: list/close sessions, list server, count batch — gated on --as") {
    val engine = new Engine(spark)
    val front = new RestFrontend(engine, port = 0,
      adminUsers = Set("root"),
      restAuth = Some(new graft.server.StaticAuthenticationProvider(Map("root" -> "pw"))))
    val port = front.start()
    try {
      val api = s"http://localhost:$port"
      val c = HttpClient.newHttpClient()
      val sid = extract(post(c, s"$api/api/v1/sessions", """{"user": "tenant"}"""),
        "sessionId")
      // no identity → exit 1 with the 401 body
      val denied = ctl(api, "admin", "list", "session")
      assert(denied.code == 1 && denied.out.contains("authenticated"), denied.out)
      val listed = ctl(api, "admin", "list", "session", "--as", "root:pw")
      assert(listed.code == 0 && listed.out.contains(sid), listed.out)
      val filtered = ctl(api, "admin", "list", "session", "nobody", "--as", "root:pw")
      assert(filtered.code == 0 && !filtered.out.contains(sid), filtered.out)
      val closed = ctl(api, "admin", "close", "session", sid, "--as", "root:pw")
      assert(closed.code == 0, closed.out)
      assert(!ctl(api, "admin", "list", "session", "--as", "root:pw").out.contains(sid))
      val servers = ctl(api, "admin", "list", "server", "--as", "root:pw")
      assert(servers.code == 0 && servers.out.contains("servers"), servers.out)
      val count = ctl(api, "admin", "count", "batch", "--as", "root:pw")
      assert(count.code == 0 && count.out.contains("count"), count.out)
    } finally front.stop()
  }

  test("list/get/delete session") {
    withServer { (c, api, base) =>
      val sid = extract(post(c, s"$base/sessions", """{"user": "ctl-user"}"""), "sessionId")
      val listed = ctl(api, "list", "session")
      assert(listed.code == 0 && listed.out.contains(sid), listed.out)
      val got = ctl(api, "get", "session", sid)
      assert(got.code == 0 && got.out.contains("ctl-user"), got.out)
      val del = ctl(api, "delete", "session", sid)
      assert(del.code == 0, del.out)
      assert(!ctl(api, "list", "session").out.contains(sid))
      // a closed session is gone: get exits non-zero with the 404 body
      val gone = ctl(api, "get", "session", sid)
      assert(gone.code == 1 && gone.out.contains("error"), gone.out)
    }
  }

  test("list/get/log/delete batch") {
    withServer { (c, api, base) =>
      val id = extract(
        post(c, s"$base/batches", """{"sql": "SELECT count(*) FROM range(100000)"}"""), "id")
      val deadline = System.nanoTime() + 30e9.toLong
      var got = ctl(api, "get", "batch", id)
      while (!got.out.contains("FINISHED") && System.nanoTime() < deadline) {
        Thread.sleep(100); got = ctl(api, "get", "batch", id)
      }
      assert(got.code == 0 && got.out.contains("FINISHED"), got.out)
      assert(got.out.contains("appState"), got.out)
      val listed = ctl(api, "list", "batch")
      assert(listed.code == 0 && listed.out.contains(id), listed.out)
      val log = ctl(api, "log", "batch", id)
      assert(log.code == 0 && log.out.contains("FINISHED"), log.out)
      val del = ctl(api, "delete", "batch", id)
      assert(del.code == 0, del.out)
    }
  }

  test("list/delete engine registrations by discovery space") {
    withServer { (c, api, base) =>
      // a session registers nothing by itself here; exercise the admin
      // space listing against an empty space and the eviction verb
      val listed = ctl(api, "--space", "graft/test-space", "list", "engine")
      assert(listed.code == 0 && listed.out.contains("engines"), listed.out)
      val del = ctl(api, "--space", "graft/test-space", "delete", "engine")
      assert(del.code == 0 && del.out.contains("deleted"), del.out)
      // space flag is required
      assert(ctl(api, "list", "engine").code == 1)
    }
  }

  test("metrics verb returns counters as JSON and Prometheus exposition") {
    withServer { (c, api, base) =>
      val json = ctl(api, "metrics")
      // counters appear lazily on first event; the process gauges are
      // always present
      assert(json.code == 0 && json.out.contains("uptime_ms"), json.out)
      val prom = ctl(api, "metrics", "--prometheus")
      assert(prom.code == 0 && prom.out.contains("# TYPE graft_"), prom.out)
    }
  }

  test("engines listing and events feed verbs") {
    withServer { (c, api, base) =>
      // a session materializes a share space and posts events
      val sbody = post(c, s"$base/sessions", """{"user": "cliuser"}""")
      assert(sbody.contains("sessionId"), sbody)
      val engines = ctl(api, "list", "engines")
      assert(engines.code == 0 && engines.out.contains("user/cliuser"), engines.out)
      val events = ctl(api, "events")
      assert(events.code == 0 && events.out.contains(""""event":"session""""), events.out)
      val one = ctl(api, "events", "1")
      assert(one.code == 0 &&
        "\"event\":".r.findAllIn(one.out).size == 1, one.out)
    }
  }

  /** A real runnable artifact for the submit-verb tests: prints a
    * marker (and its args), or exits 7 when asked to fail.
    */
  private lazy val submitJar: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ctl-submit-src")
    val src = dir.resolve("GraftCtlApp.java")
    java.nio.file.Files.write(src,
      """public class GraftCtlApp {
        |  public static void main(String[] a) {
        |    if (a.length > 0 && a[0].equals("fail")) System.exit(7);
        |    System.out.println("ctl-submit-ran " + String.join(",", a));
        |  }
        |}
        |""".stripMargin.getBytes("UTF-8"))
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(javac.run(null, null, null, src.toString) == 0, "javac must succeed")
    val jar = dir.resolve("graft-ctl-app.jar")
    val jos = new java.util.jar.JarOutputStream(java.nio.file.Files.newOutputStream(jar))
    try {
      jos.putNextEntry(new java.util.zip.ZipEntry("GraftCtlApp.class"))
      jos.write(java.nio.file.Files.readAllBytes(dir.resolve("GraftCtlApp.class")))
      jos.closeEntry()
    } finally jos.close()
    jar
  }

  test("submit batch -f drives an uploaded jar to FINISHED; a failing batch exits non-zero") {
    withServer { (c, api, base) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-ctl-spec")
      java.nio.file.Files.copy(submitJar, dir.resolve("app.jar"))
      // resource is RELATIVE to the spec file — the kyuubi-ctl yaml shape
      val okSpec = dir.resolve("ok.json")
      java.nio.file.Files.write(okSpec,
        """{"batchType": "SPARK", "className": "GraftCtlApp",
          | "resource": "app.jar", "args": ["a1", "a2"],
          | "user": "ctl-submitter"}""".stripMargin.getBytes("UTF-8"))
      val tailed = scala.collection.mutable.ArrayBuffer.empty[String]
      val ok = ControlCli.run(
        Array("--api", api, "submit", "batch", "-f", okSpec.toString,
          "--wait-timeout", "120"), sink = tailed += _)
      assert(ok.code == 0, s"submit must exit 0 on FINISHED:\n${tailed.mkString("\n")}")
      val all = tailed.mkString("\n")
      assert(all.contains("ctl-submit-ran a1,a2"),
        s"the child's stdout must stream through the CLI tail:\n$all")
      assert(all.contains("\"state\": \"FINISHED\""), all)
      // the created batch is visible through the ordinary verbs
      val id = extract(tailed.head, "id")
      assert(ctl(api, "get", "batch", id).out.contains("FINISHED"))

      // a failing batch: non-zero exit code, terminal state ERROR
      val failSpec = dir.resolve("fail.json")
      java.nio.file.Files.write(failSpec,
        """{"batchType": "SPARK", "className": "GraftCtlApp",
          | "resource": "app.jar", "args": ["fail"]}""".stripMargin.getBytes("UTF-8"))
      val bad = ControlCli.run(
        Array("--api", api, "submit", "batch", "-f", failSpec.toString,
          "--wait-timeout", "120"))
      assert(bad.code == 1, s"a failing batch must exit non-zero: ${bad.out}")
      assert(bad.out.contains("\"state\": \"ERROR\""), bad.out)

      // create (no tail) returns the handle immediately
      val created = ctl(api, "create", "batch", "-f", okSpec.toString)
      assert(created.code == 0 && created.out.contains("\"id\""), created.out)

      // spec hygiene: missing -f, missing spec, missing resource
      assert(ctl(api, "create", "batch").code == 1)
      assert(ctl(api, "create", "batch", "-f", "/nope/missing.json").code == 1)
      val noRes = dir.resolve("nores.json")
      java.nio.file.Files.write(noRes,
        """{"batchType": "SPARK", "className": "X"}""".getBytes("UTF-8"))
      val nr = ctl(api, "create", "batch", "-f", noRes.toString)
      assert(nr.code == 1 && nr.out.contains("resource"), nr.out)

      // sidecar names the comma wire-shape can't carry fail CLEANLY at
      // the client (r16 VERDICT #2): a comma-named sidecar would split
      // wrong server-side, duplicate basenames collide as part names
      java.nio.file.Files.copy(submitJar, dir.resolve("side,car.jar"))
      val commaSpec = dir.resolve("comma.json")
      java.nio.file.Files.write(commaSpec,
        """{"batchType": "SPARK", "className": "GraftCtlApp",
          | "resource": "app.jar", "extraResources": ["side,car.jar"]}"""
          .stripMargin.getBytes("UTF-8"))
      val cm = ctl(api, "create", "batch", "-f", commaSpec.toString)
      assert(cm.code == 1 && cm.out.contains("basename contains ','"), cm.out)
      val sub = java.nio.file.Files.createDirectory(dir.resolve("sub"))
      java.nio.file.Files.copy(submitJar, sub.resolve("dup.jar"))
      java.nio.file.Files.copy(submitJar, dir.resolve("dup.jar"))
      val dupSpec = dir.resolve("dup.json")
      java.nio.file.Files.write(dupSpec,
        """{"batchType": "SPARK", "className": "GraftCtlApp",
          | "resource": "app.jar", "extraResources": ["dup.jar", "sub/dup.jar"]}"""
          .stripMargin.getBytes("UTF-8"))
      val dp = ctl(api, "create", "batch", "-f", dupSpec.toString)
      assert(dp.code == 1 && dp.out.contains("duplicate extra resource basenames"), dp.out)
    }
  }

  test("bad commands and unreachable servers exit non-zero") {
    assert(ControlCli.run(Array("frobnicate")).code == 1)
    assert(ControlCli.run(Array("--help")).code == 0)
    val dead = ControlCli.run(Array("--api", "http://localhost:1", "list", "session"))
    assert(dead.code == 1 && dead.out.contains("cannot reach"), dead.out)
  }

  test("refresh verb triggers the admin hot-reload with the --as identity") {
    import java.nio.file.Files
    import graft.plans.AuthzPolicies
    val policyFile = Files.createTempFile("ctl_refresh_authz", ".json")
    Files.write(policyFile,
      """{"accessPolicies": [{"table": "ctl_refresh_t", "allowed": ["carol"]}]}"""
        .getBytes("UTF-8"))
    val engine = new Engine(spark)
    val front = new RestFrontend(engine, port = 0,
      adminUsers = Set("root"),
      restAuth = Some(new graft.server.StaticAuthenticationProvider(
        Map("root" -> "", "mallory" -> ""))), // `--as user` sends an empty password
      authzPolicyFile = Some(policyFile))
    val port = front.start()
    try {
      val api = s"http://localhost:$port"
      // missing identity → 401 exit 1; non-admin → 403 exit 1
      assert(ctl(api, "refresh", "authz_policies").code == 1)
      val denied = ctl(api, "--as", "mallory", "refresh", "authz_policies")
      assert(denied.code == 1 && denied.out.contains("administrator"), denied.out)
      // admin identity → the policy edit is enforced NOW
      val ok = ctl(api, "--as", "root", "refresh", "authz_policies")
      assert(ok.code == 0 && ok.out.contains("authz_policies"), ok.out)
      assert(AuthzPolicies.decideAccess("carol", Set.empty, "ctl_refresh_t"))
      val unknown = ctl(api, "--as", "root", "refresh", "nonsense")
      assert(unknown.code == 1, unknown.out)
    } finally {
      front.stop()
      AuthzPolicies.loadJson("{}")
      Files.deleteIfExists(policyFile)
    }
  }
}
