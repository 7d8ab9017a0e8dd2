package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Engine

class AuthzSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def withTable(f: => Unit): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_authz_t")
    spark.sql("CREATE TABLE graft_authz_t (id INT, name STRING, region STRING) USING parquet")
    spark.sql("""INSERT INTO graft_authz_t VALUES
      (1, 'alice', 'eu'), (2, 'bob', 'us'), (3, 'carol', 'eu'), (4, 'dave', 'us')""")
    try f
    finally {
      spark.sql("DROP TABLE IF EXISTS graft_authz_t")
      AuthzPolicies.clear()
    }
  }

  test("row filter restricts per-user visibility; masking rewrites columns") {
    withTable {
      AuthzPolicies.setPolicy("restricted", AuthzPolicies.Policy(
        rowFilters = Map("graft_authz_t" -> "region = 'eu'"),
        masks = Map(("graft_authz_t", "name") ->
          MaskType.Custom("concat(substring(name, 1, 1), '***')"))))

      val engine = new Engine(spark)
      val restricted = engine.openSession("restricted")
      val rows = restricted.spark.sql(
        "SELECT id, name FROM graft_authz_t ORDER BY id").collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3), "row filter must keep only eu rows")
      assert(rows.map(_.getString(1)).toSeq == Seq("a***", "c***"), "mask must rewrite name")

      // a user with no policy sees everything unmasked
      val open = engine.openSession("open")
      assert(open.spark.sql("SELECT count(*) FROM graft_authz_t").head().getLong(0) == 4)
      assert(open.spark.sql("SELECT name FROM graft_authz_t WHERE id = 2").head().getString(0) == "bob")
    }
  }

  test("masked columns stay joinable/aggregable (exprIds preserved)") {
    withTable {
      AuthzPolicies.setPolicy("masked2", AuthzPolicies.Policy(
        masks = Map(("graft_authz_t", "name") -> MaskType.Custom("'x'"))))
      val sess = new Engine(spark).openSession("masked2")
      val agg = sess.spark.sql(
        """SELECT name, count(*) AS n FROM graft_authz_t GROUP BY name""").collect()
      assert(agg.length == 1 && agg.head.getString(0) == "x" && agg.head.getLong(1) == 4)
    }
  }

  test("row filter sees true values even when the filtered column is masked") {
    withTable {
      AuthzPolicies.setPolicy("both", AuthzPolicies.Policy(
        rowFilters = Map("graft_authz_t" -> "name = 'bob'"),
        masks = Map(("graft_authz_t", "name") -> MaskType.Custom("'hidden'"))))
      val sess = new Engine(spark).openSession("both")
      val rows = sess.spark.sql("SELECT id, name FROM graft_authz_t").collect()
      assert(rows.length == 1 && rows.head.getInt(0) == 2 && rows.head.getString(1) == "hidden")
    }
  }

  test("every Ranger masking type renders its documented shape") {
    spark.sql("DROP TABLE IF EXISTS graft_mask_t")
    spark.sql("CREATE TABLE graft_mask_t (card STRING, note STRING, d DATE) USING parquet")
    spark.sql("INSERT INTO graft_mask_t VALUES ('Ab12-9876', 'Secret99', DATE '2021-07-15')")
    try {
      def maskedRow(user: String, masks: Map[(String, String), MaskType]) = {
        AuthzPolicies.clear()
        AuthzPolicies.setPolicy(user, AuthzPolicies.Policy(masks = masks))
        new Engine(spark).openSession(user)
          .spark.sql("SELECT card, note, d FROM graft_mask_t").head()
      }
      val full = maskedRow("u1", Map(("graft_mask_t", "card") -> MaskType.Full))
      assert(full.getString(0) == "Xxnn-nnnn") // upper→X lower→x digit→n, punct kept
      val last4 = maskedRow("u2", Map(("graft_mask_t", "card") -> MaskType.ShowLast4))
      assert(last4.getString(0) == "Xxnn-9876") // punct kept, last 4 clear
      val first4 = maskedRow("u3", Map(("graft_mask_t", "card") -> MaskType.ShowFirst4))
      assert(first4.getString(0) == "Ab12-nnnn")
      val hashed = maskedRow("u4", Map(("graft_mask_t", "note") -> MaskType.Hash))
      assert(hashed.getString(1).matches("[0-9a-f]{64}"), "sha-256 hex digest")
      assert(hashed.getString(0) == "Ab12-9876", "unmasked columns untouched")
      val nulled = maskedRow("u5", Map(("graft_mask_t", "note") -> MaskType.Nullify))
      assert(nulled.isNullAt(1))
      val year = maskedRow("u6", Map(("graft_mask_t", "d") -> MaskType.DateShowYear))
      assert(year.getDate(2).toString == "2021-01-01")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_mask_t")
      AuthzPolicies.clear()
    }
  }

  test("deny overrides allow; deny-exceptions escape; priority decides first") {
    withTable {
      import AuthzPolicies.AccessPolicy
      // one policy: alice+bob allowed, bob ALSO denied (deny wins),
      // carol denied but excepted (escape hatch)
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowed = Set("alice", "bob", "carol"),
        denied = Set("bob", "carol"),
        denyExceptions = Set("carol")))
      val engine = new Engine(spark)
      def visible(user: String): Boolean =
        try { engine.openSession(user).spark.sql("SELECT count(*) FROM graft_authz_t").collect(); true }
        catch { case e: Throwable =>
          assert(exists(e, _.isInstanceOf[SecurityException]), s"wrong failure: $e")
          false
        }
      assert(visible("alice"), "allowed user reads")
      assert(!visible("bob"), "deny must override allow")
      assert(visible("carol"), "deny-exception escapes the deny list")
      assert(!visible("mallory"), "no matching allow item → denied once policies exist")

      // a higher-priority override policy flips bob's decision
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowed = Set("bob"), priority = 10))
      assert(visible("bob"), "higher-priority allow is consulted first")
      // ... and a top-priority wildcard deny beats everything
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        denied = Set("*"), priority = 99))
      assert(!visible("alice") && !visible("bob"), "wildcard deny at top priority")
    }
  }

  test("group subjects: access, masks and row filters follow GroupProvider membership") {
    withTable {
      import AuthzPolicies.AccessPolicy
      import graft.core.ConfGroupProvider
      // access by group: analysts allowed, interns denied even if allowed
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowedGroups = Set("analysts", "interns"),
        deniedGroups = Set("interns")))
      // group-level mask; the user-specific policy must win on conflict
      AuthzPolicies.setGroupPolicy("analysts", AuthzPolicies.Policy(
        rowFilters = Map("graft_authz_t" -> "region = 'eu'"),
        masks = Map(("graft_authz_t", "name") -> MaskType.Nullify)))
      AuthzPolicies.setPolicy("lead", AuthzPolicies.Policy(
        masks = Map(("graft_authz_t", "name") ->
          MaskType.Custom("concat(substring(name, 1, 1), '***')"))))

      val engine = new Engine(spark, groupProvider = new ConfGroupProvider)
      // graft.server.* = advisor-pinned (client-supplied copies are
      // stripped by Engine.advisedConf; see PluginSpec)
      def open(user: String, group: String) =
        engine.openSession(user, Map("graft.server.session.group" -> group))

      // analyst: group row filter + group mask
      val analystRows = open("ann", "analysts").spark
        .sql("SELECT id, name FROM graft_authz_t ORDER BY id").collect()
      assert(analystRows.map(_.getInt(0)).toSeq == Seq(1, 3), "group row filter applies")
      assert(analystRows.forall(_.isNullAt(1)), "group mask applies")

      // lead in analysts: user mask overrides the group mask, group row filter still applies
      val leadRows = open("lead", "analysts").spark
        .sql("SELECT id, name FROM graft_authz_t ORDER BY id").collect()
      assert(leadRows.map(_.getInt(0)).toSeq == Seq(1, 3))
      assert(leadRows.map(_.getString(1)).toSeq == Seq("a***", "c***"),
        "user-specific mask wins over the group mask")

      // intern group is denied despite the allow item (deny-overrides-allow)
      val denied =
        try { open("ivy", "interns").spark.sql("SELECT 1 FROM graft_authz_t").collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
      assert(denied, "denied group must fail the read")
      // and a user with no policy-relevant group has no matching allow item
      val unknown =
        try { open("zed", "strangers").spark.sql("SELECT 1 FROM graft_authz_t").collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
      assert(unknown, "no matching allow item once policies exist")
    }
  }

  test("column-level privileges: only referenced denied columns fail; star covered") {
    withTable {
      import AuthzPolicies.AccessPolicy
      // table-wide allow, plus a column-scoped deny on `name`
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t", allowed = Set("*")))
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        denied = Set("curious"), columns = Set("name"), priority = 1))
      val engine = new Engine(spark)
      val sess = engine.openSession("curious")

      // columns outside the deny scope stay readable
      assert(sess.spark.sql("SELECT id, region FROM graft_authz_t ORDER BY id")
        .collect().length == 4)
      // selecting the denied column fails at analysis
      def denied(sql: String): Boolean =
        try { sess.spark.sql(sql).collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
      assert(denied("SELECT name FROM graft_authz_t"), "direct select must fail")
      assert(denied("SELECT * FROM graft_authz_t"), "star expansion must cover the denied column")
      assert(denied("SELECT count(*) FROM graft_authz_t WHERE name = 'bob'"),
        "a predicate reference is a reference")
      assert(denied("SELECT upper(name) AS n FROM graft_authz_t"),
        "derived expressions count as references")

      // another user without the deny reads everything
      val open = engine.openSession("observer")
      assert(open.spark.sql("SELECT name FROM graft_authz_t").collect().length == 4)
    }
  }

  test("column-scoped allow grants only its columns; masked-but-allowed stays readable") {
    withTable {
      import AuthzPolicies.AccessPolicy
      // alice's only allow item is column-scoped: id+name only
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowed = Set("alice"), columns = Set("id", "name")))
      AuthzPolicies.setPolicy("alice", AuthzPolicies.Policy(
        masks = Map(("graft_authz_t", "name") -> MaskType.Custom("'x'"))))
      val engine = new Engine(spark)
      val sess = engine.openSession("alice")

      // in-scope columns readable; the masked one comes back masked
      val rows = sess.spark.sql("SELECT id, name FROM graft_authz_t ORDER BY id").collect()
      assert(rows.length == 4 && rows.forall(_.getString(1) == "x"),
        "masked-but-allowed column must stay readable (masked)")
      // out-of-scope column: no allow item covers it → deny
      val out =
        try { sess.spark.sql("SELECT region FROM graft_authz_t").collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
      assert(out, "column outside the allow scope must fail")
      // and the table itself stays enterable (the column allow grants entry)
      assert(sess.spark.sql("SELECT count(id) AS n FROM graft_authz_t").head().getLong(0) == 4)
    }
  }

  test("write privileges: read grants do not imply insert; drop is its own verb") {
    withTable {
      import AuthzPolicies.AccessPolicy
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t", allowed = Set("*")))
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowed = Set("writer"), privilege = "insert"))
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowed = Set("owner"), privilege = "drop"))
      val engine = new Engine(spark)

      def denied(user: String, sql: String): Boolean = {
        val sess = engine.openSession(user)
        try { sess.spark.sql(sql).collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
        finally engine.closeSession(sess.id)
      }
      // reader: select fine, insert denied (no insert allow item)
      assert(!denied("reader", "SELECT count(*) FROM graft_authz_t"))
      assert(denied("reader", "INSERT INTO graft_authz_t VALUES (9, 'x', 'eu')"),
        "a select grant must not imply insert")
      // writer: insert passes, lands a row
      assert(!denied("writer", "INSERT INTO graft_authz_t VALUES (9, 'x', 'eu')"))
      assert(spark.sql("SELECT count(*) FROM graft_authz_t").head().getLong(0) == 5)
      // drop is a separate verb: writer denied, owner allowed
      assert(denied("writer", "DROP TABLE graft_authz_t"))
      assert(!denied("owner", "DROP TABLE graft_authz_t"))
      assert(!spark.catalog.tableExists("graft_authz_t"))
    }
  }

  test("SHOW TABLES and GetTables hide tables the user cannot select") {
    withTable {
      import AuthzPolicies.AccessPolicy
      spark.sql("DROP TABLE IF EXISTS graft_open_t")
      spark.sql("CREATE TABLE graft_open_t (x INT) USING parquet")
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t", allowed = Set("insider")))
      val engine = new Engine(spark)
      try {
        def shown(user: String): Set[String] = {
          val sess = engine.openSession(user)
          try sess.spark.sql("SHOW TABLES").collect()
            .map(_.getString(1)).toSet
          finally engine.closeSession(sess.id)
        }
        val outsider = shown("outsider")
        assert(!outsider.contains("graft_authz_t"),
          s"denied table leaked into SHOW TABLES: $outsider")
        assert(outsider.contains("graft_open_t"), "unpolicied tables stay visible")
        val insider = shown("insider")
        assert(insider.contains("graft_authz_t") && insider.contains("graft_open_t"))

        // JDBC metadata path filters the same way
        def jdbcTables(user: String): Set[String] = {
          val sess = engine.openSession(user)
          try graft.core.MetadataOps.getTables(sess.spark)
            .collect().map(_.getString(2)).toSet
          finally engine.closeSession(sess.id)
        }
        assert(!jdbcTables("outsider").contains("graft_authz_t"))
        assert(jdbcTables("insider").contains("graft_authz_t"))

        // SHOW COLUMNS honors column-scoped privileges: a column-deny
        // hides that column from the listing, the rest stay visible
        AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
          denied = Set("insider"), columns = Set("name"), priority = 1))
        val cols = {
          val sess = engine.openSession("insider")
          try sess.spark.sql("SHOW COLUMNS IN graft_authz_t").collect()
            .map(_.getString(0)).toSet
          finally engine.closeSession(sess.id)
        }
        assert(cols == Set("id", "region"), s"denied column leaked: $cols")
        // JDBC GetColumns filters identically
        val jdbcCols = {
          val sess = engine.openSession("insider")
          try graft.core.MetadataOps.getColumns(sess.spark, "graft_authz_t")
            .collect().map(_.getString(1)).toSet
          finally engine.closeSession(sess.id)
        }
        assert(jdbcCols == Set("id", "region"), s"GetColumns leaked: $jdbcCols")
      } finally spark.sql("DROP TABLE IF EXISTS graft_open_t")
    }
  }

  test("every deny decision lands on the audit event bus") {
    withTable {
      import AuthzPolicies.AccessPolicy
      import graft.core.Events
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t", allowed = Set("someone")))
      val seen = new java.util.concurrent.CopyOnWriteArrayList[Events.AuthzAuditEvent]()
      val collector = new Events.Handler {
        override def onEvent(e: Events.Event): Unit = e match {
          case a: Events.AuthzAuditEvent => seen.add(a)
          case _ => ()
        }
      }
      Events.register(collector)
      val engine = new Engine(spark)
      try {
        val sess = engine.openSession("snoop")
        def attempt(sql: String): Unit =
          try { sess.spark.sql(sql).collect(); () } catch { case _: Throwable => () }
        attempt("SELECT * FROM graft_authz_t") // object/select deny
        attempt("INSERT INTO graft_authz_t VALUES (9, 'x', 'eu')") // insert deny
        attempt("SET spark.graft.authz.user=admin") // identity-conf deny
        engine.closeSession(sess.id)
        import scala.jdk.CollectionConverters._
        val verbs = seen.asScala.map(a => (a.user, a.verb)).toSet
        assert(verbs.contains(("snoop", "select")), s"select deny unaudited: $verbs")
        assert(verbs.contains(("snoop", "insert")), s"insert deny unaudited: $verbs")
        assert(verbs.contains(("snoop", "set")), s"identity SET deny unaudited: $verbs")
        val sel = seen.asScala.find(_.verb == "select").get
        // resources are audited db-qualified since r11
        assert(sel.resource == "default.graft_authz_t", sel.resource)
        assert(sel.asJson.contains(""""event":"authz"""") &&
          sel.asJson.contains(""""allowed":false"""), sel.asJson)
      } finally Events.unregister(collector)
    }
  }

  test("create/alter/truncate are their own verbs; CTAS cannot launder an allowed select") {
    withTable {
      import AuthzPolicies.AccessPolicy
      // select open to all; create/alter/update each granted to one user
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t", allowed = Set("*")))
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_ctas_out",
        allowed = Set("builder"), privilege = "create"))
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowed = Set("dba"), privilege = "alter"))
      AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t",
        allowed = Set("gc"), privilege = "update"))
      val engine = new Engine(spark)
      def denied(user: String, sql: String): Boolean = {
        val sess = engine.openSession(user)
        try { sess.spark.sql(sql).collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
        finally engine.closeSession(sess.id)
      }
      spark.sql("DROP TABLE IF EXISTS graft_ctas_out")
      try {
        // the CTAS bypass: select on the source is allowed, but the
        // create verb on the (new, policy-less) target is not
        assert(denied("reader",
          "CREATE TABLE graft_ctas_out USING parquet AS SELECT * FROM graft_authz_t"),
          "allowed SELECT must not launder into an unprivileged CTAS target")
        assert(!spark.catalog.tableExists("graft_ctas_out"),
          "denied CTAS must not materialize the target")
        // plain CREATE TABLE under the same verb (policied target;
        // policy-less tables stay open — the store is opt-in)
        assert(denied("reader", "CREATE TABLE graft_ctas_out (x INT) USING parquet"))
        assert(!denied("builder",
          "CREATE TABLE graft_ctas_out USING parquet AS SELECT * FROM graft_authz_t"))
        assert(spark.sql("SELECT count(*) FROM graft_ctas_out").head().getLong(0) == 4)
        // ALTER family: add columns / set properties gated by "alter"
        assert(denied("reader",
          "ALTER TABLE graft_authz_t ADD COLUMNS (extra STRING)"))
        assert(denied("reader",
          "ALTER TABLE graft_authz_t SET TBLPROPERTIES ('k'='v')"))
        assert(!denied("dba",
          "ALTER TABLE graft_authz_t SET TBLPROPERTIES ('k'='v')"))
        // TRUNCATE is the "update" verb
        assert(denied("reader", "TRUNCATE TABLE graft_authz_t"))
        assert(!denied("gc", "TRUNCATE TABLE graft_authz_t"))
        assert(spark.sql("SELECT count(*) FROM graft_authz_t").head().getLong(0) == 0)
      } finally {
        spark.sql("DROP TABLE IF EXISTS graft_ctas_out")
      }
    }
  }

  test("db-qualified policies: same-named tables in two databases decide independently") {
    spark.sql("CREATE DATABASE IF NOT EXISTS authz_db1")
    spark.sql("CREATE DATABASE IF NOT EXISTS authz_db2")
    spark.sql("DROP TABLE IF EXISTS authz_db1.twin")
    spark.sql("DROP TABLE IF EXISTS authz_db2.twin")
    spark.sql("CREATE TABLE authz_db1.twin (id INT, secret STRING) USING parquet")
    spark.sql("CREATE TABLE authz_db2.twin (id INT, secret STRING) USING parquet")
    spark.sql("INSERT INTO authz_db1.twin VALUES (1, 'alpha')")
    spark.sql("INSERT INTO authz_db2.twin VALUES (2, 'beta')")
    try {
      import AuthzPolicies.AccessPolicy
      // access: db1's twin is restricted, db2's stays open (no policy
      // names it — db-qualified policies never leak across databases)
      AuthzPolicies.addAccessPolicy(AccessPolicy("authz_db1.twin",
        allowed = Set("insider", "eve")))
      // masks: each database's twin gets a DIFFERENT mask for `eve`
      AuthzPolicies.setPolicy("eve", AuthzPolicies.Policy(
        masks = Map(
          ("authz_db1.twin", "secret") -> MaskType.Custom("'ONE'"),
          ("authz_db2.twin", "secret") -> MaskType.Custom("'TWO'"))))
      val engine = new Engine(spark)
      val eve = engine.openSession("eve")
      def denied(user: String, sql: String): Boolean = {
        val sess = engine.openSession(user)
        try { sess.spark.sql(sql).collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
        finally engine.closeSession(sess.id)
      }
      assert(denied("outsider", "SELECT * FROM authz_db1.twin"),
        "db1.twin policy must deny non-members")
      assert(!denied("outsider", "SELECT * FROM authz_db2.twin"),
        "a db1-qualified policy must not shadow db2's same-named table")
      assert(!denied("insider", "SELECT * FROM authz_db1.twin"))
      // per-database masks: the same bare table name, different rewrite
      assert(eve.spark.sql("SELECT secret FROM authz_db1.twin").head().getString(0) == "ONE")
      assert(eve.spark.sql("SELECT secret FROM authz_db2.twin").head().getString(0) == "TWO")
      // decide API agrees
      assert(!AuthzPolicies.decideAccess("outsider", Set.empty, "authz_db1.twin"))
      assert(AuthzPolicies.decideAccess("outsider", Set.empty, "authz_db2.twin"))
    } finally {
      AuthzPolicies.clear()
      spark.sql("DROP TABLE IF EXISTS authz_db1.twin")
      spark.sql("DROP TABLE IF EXISTS authz_db2.twin")
      spark.sql("DROP DATABASE IF EXISTS authz_db1")
      spark.sql("DROP DATABASE IF EXISTS authz_db2")
    }
  }

  test("function policies: denied function fails the query and hides from SHOW FUNCTIONS") {
    withTable {
      import AuthzPolicies.AccessPolicy
      AuthzPolicies.addFunctionPolicy(AccessPolicy("upper", allowed = Set("shouter")))
      val engine = new Engine(spark)
      def denied(user: String, sql: String): Boolean = {
        val sess = engine.openSession(user)
        try { sess.spark.sql(sql).collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
        finally engine.closeSession(sess.id)
      }
      assert(denied("mute", "SELECT upper(name) FROM graft_authz_t"),
        "function policy must deny invocation")
      assert(!denied("shouter", "SELECT upper(name) FROM graft_authz_t"))
      // unpolicied functions stay open to everyone
      assert(!denied("mute", "SELECT lower(name) FROM graft_authz_t"))
      // SHOW FUNCTIONS hides what the user cannot invoke
      val mute = engine.openSession("mute")
      val fns = mute.spark.sql("SHOW FUNCTIONS LIKE '*er'").collect()
        .map(_.getString(0).split('.').last).toSet
      assert(!fns.contains("upper"), s"denied function leaked into listing: $fns")
      assert(fns.contains("lower"), s"allowed function missing from listing: $fns")
      val shouter = engine.openSession("shouter")
      val fns2 = shouter.spark.sql("SHOW FUNCTIONS LIKE 'upper'").collect()
        .map(_.getString(0).split('.').last).toSet
      assert(fns2.contains("upper"))
    }
  }

  test("file-backed policy sync: full-set replace, mtime reload, malformed keeps last good") {
    withTable {
      import java.nio.file.{Files, Paths}
      val f = Files.createTempFile("authz_policies", ".json")
      try {
        Files.write(f, """
          {"accessPolicies": [
             {"table": "graft_authz_t", "allowed": ["alice"]}],
           "functionPolicies": [
             {"table": "upper", "allowed": ["alice"]}],
           "rowFilters": [
             {"subject": "user:alice", "table": "graft_authz_t", "filter": "region = 'eu'"}],
           "masks": [
             {"subject": "user:alice", "table": "graft_authz_t", "column": "name",
              "mask": "CUSTOM:'[hidden]'"}]}
          """.getBytes("UTF-8"))
        assert(AuthzPolicies.syncFile(f), "first sync must load")
        assert(AuthzPolicies.decideAccess("alice", Set.empty, "graft_authz_t"))
        assert(!AuthzPolicies.decideAccess("mallory", Set.empty, "graft_authz_t"),
          "no-matching-allow once the file names the table")
        assert(!AuthzPolicies.decideFunctionAccess("mallory", Set.empty, "upper"))
        // masks and row filters from the file are live in a session
        val sess = new Engine(spark).openSession("alice")
        val rows = sess.spark.sql("SELECT id, name FROM graft_authz_t ORDER BY id").collect()
        assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3), "file row filter applies")
        assert(rows.forall(_.getString(1) == "[hidden]"), "file mask applies")
        // unchanged mtime → no reload
        assert(!AuthzPolicies.syncFile(f))
        // full-set REPLACE: the next version drops alice, adds bob
        Files.write(f, """
          {"accessPolicies": [{"table": "graft_authz_t", "allowed": ["bob"]}]}
          """.getBytes("UTF-8"))
        Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
        assert(AuthzPolicies.syncFile(f), "mtime change must reload")
        assert(AuthzPolicies.decideAccess("bob", Set.empty, "graft_authz_t"))
        assert(!AuthzPolicies.decideAccess("alice", Set.empty, "graft_authz_t"),
          "replaced set must revoke the old allow")
        assert(AuthzPolicies.decideFunctionAccess("mallory", Set.empty, "upper"),
          "dropped function policy must be revoked by the full-set sync")
        // malformed update: previous (bob) set stays in force
        Files.write(f, "{not json".getBytes("UTF-8"))
        Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 4000))
        assert(!AuthzPolicies.syncFile(f), "malformed must not report a reload")
        assert(AuthzPolicies.decideAccess("bob", Set.empty, "graft_authz_t"),
          "last good policy set stays in force")
      } finally Files.deleteIfExists(f)
    }
  }

  test("policies reach through views: masks, row filters and denies follow the base table") {
    withTable {
      import AuthzPolicies.AccessPolicy
      spark.sql("CREATE OR REPLACE VIEW graft_authz_v AS SELECT id, name FROM graft_authz_t")
      try {
        AuthzPolicies.setPolicy("viewer", AuthzPolicies.Policy(
          rowFilters = Map("graft_authz_t" -> "region = 'eu'"),
          masks = Map(("graft_authz_t", "name") -> MaskType.Custom("'[m]'"))))
        AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t", allowed = Set("viewer")))
        val engine = new Engine(spark)
        // a view is just a named subquery: by analysis time the scan is
        // the BASE relation, so base-table policies apply unchanged
        val rows = engine.openSession("viewer").spark
          .sql("SELECT id, name FROM graft_authz_v ORDER BY id").collect()
        assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3), "row filter through the view")
        assert(rows.forall(_.getString(1) == "[m]"), "mask through the view")
        // and a denied user cannot launder access through the view
        val sess = engine.openSession("outsider")
        val denied =
          try { sess.spark.sql("SELECT * FROM graft_authz_v").collect(); false }
          catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
        assert(denied, "base-table deny must hold through the view")
      } finally spark.sql("DROP VIEW IF EXISTS graft_authz_v")
    }
  }

  test("USE cannot strip the database off a db-qualified create/drop policy") {
    withTable {
      import AuthzPolicies.AccessPolicy
      spark.sql("CREATE DATABASE IF NOT EXISTS authz_dbq")
      spark.sql("DROP TABLE IF EXISTS authz_dbq.t")
      try {
        // create/drop on authz_dbq.t granted only to builder
        AuthzPolicies.addAccessPolicy(AccessPolicy("authz_dbq.t",
          allowed = Set("builder"), privilege = "create"))
        AuthzPolicies.addAccessPolicy(AccessPolicy("authz_dbq.t",
          allowed = Set("builder"), privilege = "drop"))
        val engine = new Engine(spark)
        def denied(user: String, sqls: String*): Boolean = {
          val sess = engine.openSession(user)
          try { sqls.foreach(sess.spark.sql(_).collect()); false }
          catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
          finally engine.closeSession(sess.id)
        }
        // the bypass the policy must close: an UNQUALIFIED identifier
        // after USE resolves in that database — the check must see
        // `authz_dbq.t`, not a bare `t` that no qualified policy matches
        assert(denied("sneak", "USE authz_dbq",
          "CREATE TABLE t USING parquet AS SELECT * FROM default.graft_authz_t"),
          "USE db + unqualified CTAS must not bypass the db-qualified create policy")
        assert(!spark.catalog.tableExists("authz_dbq.t"))
        assert(denied("sneak", "USE authz_dbq", "CREATE TABLE t (x INT) USING parquet"),
          "plain unqualified CREATE must qualify with the current database too")
        assert(!denied("builder", "USE authz_dbq",
          "CREATE TABLE t USING parquet AS SELECT * FROM default.graft_authz_t"))
        assert(spark.catalog.tableExists("authz_dbq.t"))
        assert(denied("sneak", "USE authz_dbq", "DROP TABLE t"),
          "unqualified DROP must qualify with the current database")
        assert(!denied("builder", "USE authz_dbq", "DROP TABLE t"))
      } finally {
        spark.sql("DROP TABLE IF EXISTS authz_dbq.t")
        spark.sql("DROP DATABASE IF EXISTS authz_dbq")
      }
    }
  }

  test("namespace and persisted-view DDL are gated; temp views stay session-local") {
    withTable {
      import AuthzPolicies.AccessPolicy
      spark.sql("DROP VIEW IF EXISTS graft_authz_v2")
      spark.sql("DROP DATABASE IF EXISTS authz_ns_new")
      try {
        // select on the base table open to all — the laundering setup
        AuthzPolicies.addAccessPolicy(AccessPolicy("graft_authz_t", allowed = Set("*")))
        AuthzPolicies.addAccessPolicy(AccessPolicy("authz_ns_new",
          allowed = Set("dba"), privilege = "create"))
        AuthzPolicies.addAccessPolicy(AccessPolicy("authz_ns_new",
          allowed = Set("dba"), privilege = "drop"))
        AuthzPolicies.addAccessPolicy(AccessPolicy("default.graft_authz_v2",
          allowed = Set("builder"), privilege = "create"))
        AuthzPolicies.addAccessPolicy(AccessPolicy("default.graft_authz_v2",
          allowed = Set("builder"), privilege = "drop"))
        val engine = new Engine(spark)
        def denied(user: String, sql: String): Boolean = {
          val sess = engine.openSession(user)
          try { sess.spark.sql(sql).collect(); false }
          catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
          finally engine.closeSession(sess.id)
        }
        // namespace DDL (reference database_command_spec.json:13,56)
        assert(denied("reader", "CREATE DATABASE authz_ns_new"),
          "CREATE DATABASE must be gated by the database create policy")
        assert(!spark.catalog.databaseExists("authz_ns_new"))
        assert(!denied("dba", "CREATE DATABASE authz_ns_new"))
        assert(denied("reader", "DROP DATABASE authz_ns_new"))
        assert(!denied("dba", "DROP DATABASE authz_ns_new"))
        // persisted CREATE VIEW: allowed SELECT must not launder into
        // catalog-visible DDL (reference table_command_spec.json:1334)
        assert(denied("reader",
          "CREATE VIEW graft_authz_v2 AS SELECT id FROM graft_authz_t"),
          "an allowed SELECT must not launder into CREATE VIEW")
        assert(!spark.catalog.tableExists("graft_authz_v2"))
        assert(!denied("builder",
          "CREATE VIEW graft_authz_v2 AS SELECT id FROM graft_authz_t"))
        assert(denied("reader", "DROP VIEW graft_authz_v2"),
          "DROP VIEW is the drop verb on the view resource")
        assert(!denied("builder", "DROP VIEW graft_authz_v2"))
        // temp views are session-local, not catalog resources — open
        assert(!denied("reader",
          "CREATE TEMPORARY VIEW authz_tmpv AS SELECT id FROM graft_authz_t"))
      } finally {
        spark.sql("DROP VIEW IF EXISTS graft_authz_v2")
        spark.sql("DROP DATABASE IF EXISTS authz_ns_new")
      }
    }
  }

  test("SHOW DATABASES hides databases the user cannot use") {
    import AuthzPolicies.AccessPolicy
    spark.sql("CREATE DATABASE IF NOT EXISTS authz_hidden_db")
    try {
      // the reference's USE accessType on the DATABASE resource
      AuthzPolicies.addAccessPolicy(AccessPolicy("authz_hidden_db",
        allowed = Set("dbuser"), privilege = "use"))
      val engine = new Engine(spark)
      def listed(user: String): Set[String] = {
        val sess = engine.openSession(user)
        try sess.spark.sql("SHOW DATABASES").collect().map(_.getString(0)).toSet
        finally engine.closeSession(sess.id)
      }
      assert(!listed("outsider").contains("authz_hidden_db"),
        "a db the user cannot use must not appear in SHOW DATABASES")
      assert(listed("dbuser").contains("authz_hidden_db"))
      assert(listed("outsider").contains("default"), "unpolicied dbs stay visible")
    } finally {
      AuthzPolicies.clear()
      spark.sql("DROP DATABASE IF EXISTS authz_hidden_db")
    }
  }

  test("function policy names match case-insensitively") {
    withTable {
      import AuthzPolicies.AccessPolicy
      // a policy registered with uppercase letters must still enforce:
      // SQL function names are case-insensitive and the probe side is
      // lowercased, so the store normalizes the policy side too
      AuthzPolicies.addFunctionPolicy(AccessPolicy("UPPER", allowed = Set("shouter")))
      val engine = new Engine(spark)
      def denied(user: String, sql: String): Boolean = {
        val sess = engine.openSession(user)
        try { sess.spark.sql(sql).collect(); false }
        catch { case e: Throwable => exists(e, _.isInstanceOf[SecurityException]) }
        finally engine.closeSession(sess.id)
      }
      assert(denied("mute", "SELECT upper(name) FROM graft_authz_t"),
        "an uppercase-registered function policy must still enforce")
      assert(!denied("shouter", "SELECT UPPER(name) FROM graft_authz_t"))
    }
  }

  test("startFileSync refuses to start on a malformed initial policy file") {
    import java.nio.file.Files
    val f = Files.createTempFile("authz_bad", ".json")
    try {
      Files.write(f, "{not json".getBytes("UTF-8"))
      // fail-OPEN guard: an empty store means everything is allowed, so
      // a server told to enforce an unparsable file must refuse to start
      intercept[Exception] { AuthzPolicies.startFileSync(f) }
      // ...while a failed RELOAD (good set already in force) is audited
      Files.write(f, """{"accessPolicies":[{"table":"sync_t","allowed":["a"]}]}"""
        .getBytes("UTF-8"))
      assert(AuthzPolicies.syncFile(f))
      val seen = new java.util.concurrent.atomic.AtomicReference[String](null)
      val h = new graft.core.Events.Handler {
        override def onEvent(e: graft.core.Events.Event): Unit = e match {
          case a: graft.core.Events.AuthzAuditEvent if a.verb == "policy-sync-failed" =>
            seen.set(a.resource)
          case _ => ()
        }
      }
      graft.core.Events.register(h)
      try {
        Files.write(f, "{still not json".getBytes("UTF-8"))
        Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 2000))
        assert(!AuthzPolicies.syncFile(f))
        assert(seen.get != null && seen.get.contains(f.toString),
          "a failed reload must land on the audit bus, not vanish")
        assert(AuthzPolicies.decideAccess("a", Set.empty, "sync_t"),
          "last good set stays in force after the audited failure")
      } finally {
        graft.core.Events.unregister(h)
        AuthzPolicies.clear()
      }
    } finally Files.deleteIfExists(f)
  }

  private def exists(e: Throwable, p: Throwable => Boolean): Boolean =
    if (e == null) false else p(e) || exists(e.getCause, p)
}
