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
}
