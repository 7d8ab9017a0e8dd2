package graft.core

import java.sql.DriverManager

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.server.ThriftFrontend

/** The server plugin seams (reference kyuubi-server-plugin:
  * SessionConfAdvisor, GroupProvider): conf overlays applied at
  * OpenSession, group resolution driving the GROUP share level, and
  * both exercised end-to-end over a real hive-jdbc connection.
  */

// zero-arg classes for the reflective loaders
class PinningAdvisor extends SessionConfAdvisor {
  override def confOverlay(user: String, conf: Map[String, String]): Map[String, String] =
    Map("set:hiveconf:spark.graft.test.pinned" -> "policy",
      "set:hiveconf:spark.graft.test.who" -> user)
}
class SecondAdvisor extends SessionConfAdvisor {
  override def confOverlay(user: String, conf: Map[String, String]): Map[String, String] =
    Map("set:hiveconf:spark.graft.test.who" -> s"second:${conf("set:hiveconf:spark.graft.test.who")}")
}

class PluginSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkFixture.spark

  test("advisedConf: overlays overwrite the client conf, later advisors see earlier results") {
    val engine = new Engine(spark,
      confAdvisors = SessionConfAdvisor.load(
        Seq(classOf[PinningAdvisor].getName, classOf[SecondAdvisor].getName)))
    val out = engine.advisedConf("alice",
      Map("set:hiveconf:spark.graft.test.pinned" -> "client-says",
        "set:hiveconf:spark.other" -> "kept"))
    assert(out("set:hiveconf:spark.graft.test.pinned") == "policy") // client overridden
    assert(out("set:hiveconf:spark.graft.test.who") == "second:alice") // chained
    assert(out("set:hiveconf:spark.other") == "kept")
  }

  test("GroupProvider drives the GROUP share level namespace") {
    val engine = new Engine(spark, shareLevel = ShareLevel.Group,
      singleSession = true, groupProvider = GroupProvider.load(classOf[ConfGroupProvider].getName))
    // graft.server.* = the advisor-pinned (server-trusted) namespace
    val team = Map("graft.server.session.group" -> "data-eng")
    val a = engine.openSession("alice@corp", team)
    val b = engine.openSession("bob@corp", team)
    val c = engine.openSession("eve@corp", Map("graft.server.session.group" -> "other-team"))
    try {
      // same declared group + singleSession → the SAME SparkSession:
      // a temp view created by alice is visible to bob, not to eve
      a.spark.sql("CREATE OR REPLACE TEMP VIEW plugin_spec_tv AS SELECT 7 AS x")
      assert(b.spark.sql("SELECT x FROM plugin_spec_tv").collect().head.getInt(0) == 7)
      assert(c.spark.catalog.tableExists("plugin_spec_tv") == false)
      // and the discovery registration is keyed by the group namespace
      assert(engine.discovery.get("group/data-eng").nonEmpty)
      assert(engine.discovery.get("group/other-team").nonEmpty)
    } finally Seq(a, b, c).foreach(s => engine.closeSession(s.id))
  }

  test("file advisor overlays named profiles, later profiles win, typos contribute nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_profiles")
    java.nio.file.Files.writeString(dir.resolve("etl.conf"),
      "spark.sql.shuffle.partitions=64\nspark.graft.test.tier=etl\n")
    java.nio.file.Files.writeString(dir.resolve("adhoc.conf"),
      "spark.graft.test.tier=adhoc\n")
    val advisor = new FileSessionConfAdvisor(Some(dir.toString), reloadIntervalMs = 50)
    // one profile
    val one = advisor.confOverlay("u", Map("graft.session.conf.profile" -> "etl"))
    assert(one == Map("spark.sql.shuffle.partitions" -> "64", "spark.graft.test.tier" -> "etl"))
    // two profiles: later wins conflicts, union otherwise
    val two = advisor.confOverlay("u", Map("graft.session.conf.profile" -> "etl, adhoc"))
    assert(two("spark.graft.test.tier") == "adhoc" && two("spark.sql.shuffle.partitions") == "64")
    // missing profile / no profile conf → empty (a typo must not fail the session)
    assert(advisor.confOverlay("u", Map("graft.session.conf.profile" -> "ghost")).isEmpty)
    assert(advisor.confOverlay("u", Map.empty).isEmpty)
    // reload: an edited profile is visible after the interval passes
    java.nio.file.Files.writeString(dir.resolve("etl.conf"),
      "spark.graft.test.tier=etl2\n")
    Thread.sleep(80)
    assert(advisor.confOverlay("u",
      Map("graft.session.conf.profile" -> "etl"))("spark.graft.test.tier") == "etl2")
    // and it rides the normal advisor chain at OpenSession
    val engine = new Engine(spark, confAdvisors = Seq(advisor))
    val out = engine.advisedConf("alice", Map("graft.session.conf.profile" -> "adhoc"))
    assert(out("spark.graft.test.tier") == "adhoc")
  }

  test("client-asserted groups are ignored unless the server opts in") {
    val p = new ConfGroupProvider
    // bare client keys: no trust flag → fall back to the user prefix
    assert(p.groups("eve@corp", Map("graft.session.group" -> "admins")) == Seq("eve"))
    // advisor-pinned membership always wins
    assert(p.groups("eve@corp", Map(
      "graft.server.session.groups" -> "data-eng,oncall",
      "graft.session.group" -> "admins")) == Seq("data-eng", "oncall"))
    // explicit server opt-in honors the client declaration
    assert(p.groups("eve@corp", Map(
      "graft.server.trust.client.groups" -> "true",
      "graft.session.group" -> "admins")) == Seq("admins"))
    // and a client cannot smuggle graft.server.* past advisedConf
    val engine = new Engine(spark)
    val out = engine.advisedConf("eve",
      Map("graft.server.session.group" -> "admins",
        "set:hiveconf:graft.server.trust.client.groups" -> "true",
        "spark.other" -> "kept"))
    assert(!out.contains("graft.server.session.group"))
    assert(!out.contains("set:hiveconf:graft.server.trust.client.groups"))
    assert(out("spark.other") == "kept")
  }

  test("in-session SET of the authz identity namespace is denied") {
    val s = spark.newSession()
    s.conf.set("spark.graft.authz.user", "mallory")
    val e = intercept[Exception] {
      s.sql("SET spark.graft.authz.groups=admins").collect()
    }
    def rootChain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: rootChain(t.getCause)
    assert(rootChain(e).exists(_.isInstanceOf[SecurityException]),
      s"expected SecurityException, got $e")
    // plain confs still settable
    s.sql("SET spark.graft.other=ok").collect()
  }

  test("initialize SQL runs once per engine scope and per session") {
    val engine = new Engine(spark,
      engineInitSql = Seq(
        // GLOBAL temp: session clones have isolated temp catalogs, so
        // engine-scope init shares through global_temp (the reference's
        // kyuubi.engine.initialize.sql pattern)
        "CREATE OR REPLACE GLOBAL TEMPORARY VIEW plugin_init_engine AS SELECT 1 AS one"),
      sessionInitSql = Seq("SET graft.init.session=ran"))
    val a = engine.openSession("alice")
    val b = engine.openSession("alice",
      Map("graft.session.initialize.sql" ->
        "SET graft.init.conn=also-ran; SET graft.init.conn2=twice"))
    try {
      // engine-scope statement ran once, visible to every session of the scope
      assert(a.spark.sql("SELECT one FROM global_temp.plugin_init_engine").head.getInt(0) == 1)
      assert(b.spark.sql("SELECT one FROM global_temp.plugin_init_engine").head.getInt(0) == 1)
      // per-session statements ran on each open; client-carried ones split on ';'
      assert(a.spark.conf.get("graft.init.session") == "ran")
      assert(b.spark.conf.get("graft.init.conn") == "also-ran")
      assert(b.spark.conf.get("graft.init.conn2") == "twice")
      assert(a.spark.conf.getOption("graft.init.conn").isEmpty,
        "connection-carried init must not leak into other sessions")
    } finally {
      Seq(a, b).foreach(s => engine.closeSession(s.id))
      spark.sql("DROP VIEW IF EXISTS global_temp.plugin_init_engine")
    }
  }

  test("advisor overlay reaches a real JDBC session's Spark conf") {
    val engine = new Engine(spark,
      confAdvisors = Seq(new PinningAdvisor))
    val frontend = new ThriftFrontend(engine).start()
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = DriverManager.getConnection(
        s"jdbc:hive2://localhost:${frontend.boundPort}/;auth=noSasl" +
          "?spark.graft.test.pinned=client-says",
        "alice", "")
      try {
        val rs = conn.createStatement().executeQuery("SET spark.graft.test.pinned")
        rs.next()
        // SET returns (key, value); the advisor's value must beat the
        // client's URL conf
        assert(rs.getString(2) == "policy")
      } finally conn.close()
    } finally frontend.stop()
  }
}
