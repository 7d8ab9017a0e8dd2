package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** Pluggable metadata store: dialect inference from JDBC URLs, the
  * per-dialect DDL, and the full store lifecycle over an explicit
  * JDBC URL (Derby — the only driver on the sandbox classpath; the
  * MySQL/PostgreSQL/SQLite dialects are pinned at the DDL level,
  * the reference DatabaseType.scala:23 plug-point).
  */
class BatchMetadataStoreSpec extends AnyFunSuite {
  import MetadataStoreDialect._

  test("dialect inference from JDBC URL") {
    assert(forUrl("jdbc:derby:/tmp/x;create=true") == Derby)
    assert(forUrl("jdbc:mysql://db:3306/kyuubi") == MySQL)
    assert(forUrl("jdbc:mariadb://db:3306/kyuubi") == MySQL)
    assert(forUrl("jdbc:postgresql://db:5432/kyuubi") == PostgreSQL)
    assert(forUrl("jdbc:sqlite:/tmp/meta.db") == SQLite)
    assert(forUrl("jdbc:h2:mem:test") == Generic)
    assert(forUrl("not-a-jdbc-url") == Generic)
  }

  test("per-dialect DDL: large-text type and limit syntax") {
    assert(Derby.createTableDdl.contains("VARCHAR(32000)"))
    assert(Derby.limitClause == "FETCH FIRST ? ROWS ONLY")
    assert(MySQL.createTableDdl.contains("MEDIUMTEXT"))
    assert(MySQL.limitClause == "LIMIT ?")
    assert(PostgreSQL.createTableDdl.contains("TEXT"))
    assert(PostgreSQL.limitClause == "LIMIT ?")
    assert(SQLite.createTableDdl.contains("TEXT"))
    // every dialect's DDL declares the same 7 columns
    Seq(Derby, MySQL, PostgreSQL, SQLite, Generic).foreach { d =>
      Seq("id", "usr", "sqltext", "state", "created_at", "ended_at", "error")
        .foreach(c => assert(d.createTableDdl.contains(c), s"${d.name} missing $c"))
    }
  }

  test("full lifecycle through an explicit JDBC URL (not the directory shorthand)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-metastore").toString
    val store = new BatchMetadataStore(s"jdbc:derby:$dir/db;create=true")
    try {
      assert(store.dialect == Derby)
      store.insert("b-1", "alice", "SELECT 1", "PENDING")
      store.insert("b-2", "bob", "SELECT 2", "RUNNING")
      store.updateState("b-1", "FINISHED", None)
      assert(store.get("b-1").exists(_.state == "FINISHED"))
      assert(store.get("b-1").exists(_.endedAt > 0))
      assert(store.unfinished().map(_.id) == Seq("b-2"))
      assert(store.list().map(_.id).toSet == Set("b-1", "b-2"))
      assert(store.list(limit = 1).size == 1)
      store.updateState("b-2", "ERROR", Some("boom"))
      assert(store.get("b-2").exists(_.error.contains("boom")))
      assert(store.unfinished().isEmpty)
    } finally store.close()
    // reopenable after close (the Derby shutdown handshake worked)
    val again = new BatchMetadataStore(s"jdbc:derby:$dir/db;create=true")
    try assert(again.list().size == 2) finally again.close()
  }

  test("cleaner purges aged terminal records; live/unfinished kept; recovery unaffected") {
    // reference MetadataManager.scala:243-253: scheduled purge of
    // terminal records whose end_time is past the max age
    val dir = java.nio.file.Files.createTempDirectory("graft-metastore-cleaner").toString
    val store = new BatchMetadataStore(dir)
    try {
      store.insert("old-done", "alice", "SELECT 1", "PENDING")
      store.updateState("old-done", "FINISHED", None)
      store.insert("old-err", "alice", "SELECT 2", "PENDING")
      store.updateState("old-err", "ERROR", Some("boom"))
      store.insert("still-running", "bob", "SELECT 3", "RUNNING")
      // a generous max age keeps everything (nothing is old enough)
      assert(store.purgeTerminal(maxAgeMs = 3600000L) == 0)
      assert(store.list().size == 3)
      // let the terminal end times age past a tiny max age
      Thread.sleep(20)
      assert(store.purgeTerminal(maxAgeMs = 1L) == 2)
      // terminal records gone, the live one untouched and still
      // recoverable (ended_at = 0 rows are never candidates)
      assert(store.list().map(_.id) == Seq("still-running"))
      assert(store.unfinished().map(_.id) == Seq("still-running"))
      // the pass-size bound holds: re-create aged records, purge with
      // limit 1 → one per pass, oldest first
      store.updateState("still-running", "FINISHED", None)
      store.insert("old-2", "carol", "SELECT 4", "PENDING")
      store.updateState("old-2", "CANCELED", None)
      Thread.sleep(20)
      assert(store.purgeTerminal(maxAgeMs = 1L, limit = 1) == 1)
      assert(store.list().size == 1)
      assert(store.purgeTerminal(maxAgeMs = 1L, limit = 1) == 1)
      assert(store.list().isEmpty)
    } finally store.close()
  }

  test("RestFrontend wires the cleaner: a tick purges through the running frontend") {
    val spark = graft.SparkFixture.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-rest-cleaner").toString
    // seed a pre-existing terminal record from a "previous incarnation"
    locally {
      val seed = new BatchMetadataStore(dir)
      try {
        seed.insert("ancient", "alice", "SELECT 1", "PENDING")
        seed.updateState("ancient", "FINISHED", None)
      } finally seed.close()
    }
    Thread.sleep(20)
    // the purged batch's staged artifacts must expire WITH its record
    val staged = java.nio.file.Paths.get(dir, "uploads", "ancient")
    java.nio.file.Files.createDirectories(staged)
    java.nio.file.Files.write(staged.resolve("app.jar"), Array[Byte](1, 2, 3))
    val exitRec = java.nio.file.Paths.get(dir, "uploads", "ancient.exit")
    java.nio.file.Files.write(exitRec, "0".getBytes)
    val front = new RestFrontend(new graft.core.Engine(spark), port = 0,
      batchStoreDir = Some(dir), metadataMaxAgeMs = 1L,
      metadataCleanerIntervalMs = 3600000L) // interval irrelevant: tick driven
    try {
      assert(front.runMetadataCleanerOnce() == 1)
      assert(!java.nio.file.Files.exists(staged),
        "staging dir must expire with the purged record")
      assert(!java.nio.file.Files.exists(exitRec),
        "exit record must expire with the purged record")
    } finally front.stop()
  }

  test("ownership column: insert with owner, re-own, and pre-owner store migration") {
    val dir = java.nio.file.Files.createTempDirectory("graft-owner").toString
    val store = new BatchMetadataStore(dir)
    try {
      store.insert("b-own", "alice", "SELECT 1", "RUNNING",
        owner = Some("http://gw-a:1"))
      assert(store.get("b-own").flatMap(_.owner).contains("http://gw-a:1"))
      store.updateOwner("b-own", "http://gw-b:2")
      assert(store.get("b-own").flatMap(_.owner).contains("http://gw-b:2"))
      // ownerless inserts stay None (pre-HA callers)
      store.insert("b-free", "bob", "SELECT 2", "RUNNING")
      assert(store.get("b-free").exists(_.owner.isEmpty))
    } finally store.close()
    // a table created WITHOUT the owner column is migrated on open
    val legacyDir = java.nio.file.Files.createTempDirectory("graft-legacy").toString
    locally {
      val conn = java.sql.DriverManager.getConnection(
        s"jdbc:derby:$legacyDir/db;create=true")
      try {
        val st = conn.createStatement()
        st.executeUpdate(
          """CREATE TABLE batches (
            |  id VARCHAR(64) PRIMARY KEY, usr VARCHAR(256),
            |  sqltext VARCHAR(32000), state VARCHAR(32),
            |  created_at BIGINT, ended_at BIGINT, error VARCHAR(32000))""".stripMargin)
        st.executeUpdate(
          "INSERT INTO batches VALUES ('legacy', 'u', 'SELECT 1', 'RUNNING', 1, 0, NULL)")
        st.close()
      } finally conn.close()
    }
    val migrated = new BatchMetadataStore(legacyDir)
    try {
      assert(migrated.get("legacy").exists(_.owner.isEmpty))
      migrated.updateOwner("legacy", "http://gw-c:3")
      assert(migrated.get("legacy").flatMap(_.owner).contains("http://gw-c:3"))
    } finally migrated.close()
  }

  test("listing search window bounds the scan by create time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-window").toString
    val store = new BatchMetadataStore(dir)
    try {
      store.insert("early", "alice", "SELECT 1", "FINISHED")
      Thread.sleep(30)
      val cutoff = System.currentTimeMillis()
      Thread.sleep(30)
      store.insert("late", "bob", "SELECT 2", "RUNNING")
      assert(store.list().map(_.id).toSet == Set("early", "late"))
      assert(store.list(createdAfter = cutoff).map(_.id) == Seq("late"))
      // a point GET is never windowed — old batches stay addressable
      assert(store.get("early").isDefined)
    } finally store.close()
  }
}
