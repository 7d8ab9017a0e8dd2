package graft.server

import java.sql.{Connection, DriverManager}

/** SQL dialect for the batch metadata store — the reference supports
  * pluggable backing databases for exactly this store
  * (kyuubi-server/.../metadata/jdbc/DatabaseType.scala:23 —
  * SQLITE/MYSQL/POSTGRESQL/custom, each with its own DDL init script).
  * The store's SQL is dialect-neutral except for two spots: the large-
  * text column type and the result-limiting clause; each dialect pins
  * those.
  */
sealed trait MetadataStoreDialect {
  def name: String
  /** Column type for SQL text / error payloads. */
  def textType: String
  /** `SELECT … ORDER BY … <limit clause with one ? parameter>`. */
  def limitClause: String
  def createTableDdl: String =
    s"""CREATE TABLE batches (
       |  id VARCHAR(64) PRIMARY KEY,
       |  usr VARCHAR(256),
       |  sqltext $textType,
       |  state VARCHAR(32),
       |  created_at BIGINT,
       |  ended_at BIGINT,
       |  error $textType,
       |  owner VARCHAR(256)
       |)""".stripMargin
}

object MetadataStoreDialect {
  /** Embedded default (in Spark's classpath already). Derby has no
    * unbounded TEXT; 32000 is its VARCHAR ceiling.
    */
  case object Derby extends MetadataStoreDialect {
    val name = "derby"
    val textType = "VARCHAR(32000)"
    val limitClause = "FETCH FIRST ? ROWS ONLY"
  }
  case object MySQL extends MetadataStoreDialect {
    val name = "mysql"
    val textType = "MEDIUMTEXT"
    val limitClause = "LIMIT ?"
  }
  case object PostgreSQL extends MetadataStoreDialect {
    val name = "postgresql"
    val textType = "TEXT"
    val limitClause = "LIMIT ?"
  }
  case object SQLite extends MetadataStoreDialect {
    val name = "sqlite"
    val textType = "TEXT"
    val limitClause = "LIMIT ?"
  }
  /** Unknown backends get ANSI-ish defaults (TEXT + LIMIT). */
  case object Generic extends MetadataStoreDialect {
    val name = "generic"
    val textType = "TEXT"
    val limitClause = "LIMIT ?"
  }

  def forUrl(url: String): MetadataStoreDialect =
    url.split(":").toList match {
      case "jdbc" :: sub :: _ => sub.toLowerCase match {
        case "derby" => Derby
        case "mysql" | "mariadb" => MySQL
        case "postgresql" => PostgreSQL
        case "sqlite" => SQLite
        case _ => Generic
      }
      case _ => Generic
    }
}

/** JDBC-backed batch metadata store: batch jobs survive server
  * restarts, and unfinished ones are found again at startup for
  * recovery — the reference persists batches the same way
  * (kyuubi-server/.../metadata/jdbc/JDBCMetadataStore.scala,
  * BatchJobSubmission recovery).
  *
  * `target` is either a plain directory (embedded Derby database under
  * it — the zero-dependency default, Derby ships with Spark) or any
  * JDBC URL (`jdbc:mysql://…`, `jdbc:postgresql://…`), with the SQL
  * dialect inferred from the URL — the reference's DatabaseType
  * plug-point. Only Derby is exercisable in-sandbox (no other drivers
  * on the classpath); the MySQL/PostgreSQL/SQLite DDL ships tested at
  * the dialect level.
  *
  * All access goes through one connection guarded by this store's
  * monitor: batch submits/updates are rare control-plane writes, not a
  * data path.
  */
final class BatchMetadataStore(target: String,
    dbUser: Option[String] = None, dbPassword: Option[String] = None)
  extends AutoCloseable {

  final case class BatchRecord(
      id: String, user: String, sql: String, state: String,
      createdAt: Long, endedAt: Long, error: Option[String],
      // The gateway that OWNS the live side of this batch (its child
      // process / operation) — the reference's `kyuubi_instance`
      // column. A non-owning HA gateway forwards GET/DELETE here.
      owner: Option[String] = None)

  private val url: String =
    if (target.startsWith("jdbc:")) target
    else {
      // keep Derby's log out of the CWD
      System.setProperty("derby.stream.error.file", s"$target/derby.log")
      s"jdbc:derby:$target/db;create=true"
    }

  val dialect: MetadataStoreDialect = MetadataStoreDialect.forUrl(url)

  private val conn: Connection = dbUser match {
    case Some(u) => DriverManager.getConnection(url, u, dbPassword.getOrElse(""))
    case None => DriverManager.getConnection(url)
  }

  locally {
    // identifier case folding differs per backend (Derby upper-cases,
    // PostgreSQL lower-cases) — probe both
    def exists(name: String): Boolean = {
      val meta = conn.getMetaData.getTables(null, null, name, null)
      try meta.next() finally meta.close()
    }
    if (!exists("BATCHES") && !exists("batches")) {
      val st = conn.createStatement()
      try st.executeUpdate(dialect.createTableDdl) finally st.close()
    } else {
      // pre-owner stores (earlier incarnations of this schema) migrate
      // in place; Derby upper-cases unquoted identifiers
      def hasColumn(table: String, col: String): Boolean = {
        val rs = conn.getMetaData.getColumns(null, null, table, col)
        try rs.next() finally rs.close()
      }
      if (!hasColumn("BATCHES", "OWNER") && !hasColumn("batches", "owner")) {
        val st = conn.createStatement()
        try st.executeUpdate("ALTER TABLE batches ADD COLUMN owner VARCHAR(256)")
        finally st.close()
      }
    }
  }

  def insert(id: String, user: String, sql: String, state: String,
      owner: Option[String] = None): Unit = synchronized {
    val ps = conn.prepareStatement(
      "INSERT INTO batches (id, usr, sqltext, state, created_at, ended_at, error, owner) VALUES (?,?,?,?,?,0,NULL,?)")
    try {
      ps.setString(1, id); ps.setString(2, user); ps.setString(3, sql)
      ps.setString(4, state); ps.setLong(5, System.currentTimeMillis())
      owner match {
        case Some(o) => ps.setString(6, o)
        case None => ps.setNull(6, java.sql.Types.VARCHAR)
      }
      ps.executeUpdate()
    } finally ps.close()
  }

  /** Re-own a batch (recovery/adoption by a new incarnation, or the
    * reference's admin reassign verb).
    */
  def updateOwner(id: String, owner: String): Unit = synchronized {
    val ps = conn.prepareStatement("UPDATE batches SET owner = ? WHERE id = ?")
    try { ps.setString(1, owner); ps.setString(2, id); ps.executeUpdate() }
    finally ps.close()
  }

  // engine OperationState vocabulary (OperationState.scala)
  private val terminalStates = Set("FINISHED", "TIMEOUT", "CANCELED", "CLOSED", "ERROR")

  def updateState(id: String, state: String, error: Option[String]): Unit = synchronized {
    val terminal = terminalStates.contains(state)
    val ps = conn.prepareStatement(
      "UPDATE batches SET state = ?, error = ?, ended_at = ? WHERE id = ?")
    try {
      ps.setString(1, state)
      error match {
        case Some(e) => ps.setString(2, e.take(32000))
        case None => ps.setNull(2, java.sql.Types.VARCHAR)
      }
      ps.setLong(3, if (terminal) System.currentTimeMillis() else 0L)
      ps.setString(4, id)
      ps.executeUpdate()
    } finally ps.close()
  }

  def get(id: String): Option[BatchRecord] = synchronized {
    val ps = conn.prepareStatement("SELECT * FROM batches WHERE id = ?")
    try {
      ps.setString(1, id)
      val rs = ps.executeQuery()
      val out = if (rs.next()) Some(record(rs)) else None
      rs.close()
      out
    } finally ps.close()
  }

  /** Persisted batches, newest first (admin listing — reference
    * BatchesResource GET /batches pagination source). `createdAfter`
    * bounds the scan by create time (the reference's
    * METADATA_SEARCH_WINDOW, BatchesResource.scala:70): on a years-old
    * store the listing reads only the recent window instead of the
    * whole table. 0 = unbounded.
    */
  def list(limit: Int = 100, createdAfter: Long = 0L): Seq[BatchRecord] = synchronized {
    val ps = conn.prepareStatement(
      s"SELECT * FROM batches WHERE created_at >= ? " +
        s"ORDER BY created_at DESC ${dialect.limitClause}")
    try {
      ps.setLong(1, createdAfter)
      ps.setInt(2, limit)
      val rs = ps.executeQuery()
      val buf = scala.collection.mutable.ArrayBuffer.empty[BatchRecord]
      while (rs.next()) buf += record(rs)
      rs.close()
      buf.toSeq
    } finally ps.close()
  }

  /** Batches to recover at startup: anything not in a terminal state. */
  def unfinished(): Seq[BatchRecord] = synchronized {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        "SELECT * FROM batches WHERE state NOT IN ('FINISHED','TIMEOUT','CANCELED','CLOSED','ERROR') ORDER BY created_at")
      val buf = scala.collection.mutable.ArrayBuffer.empty[BatchRecord]
      while (rs.next()) buf += record(rs)
      rs.close()
      buf.toSeq
    } finally st.close()
  }

  /** Purge TERMINAL batch records whose end time is older than
    * `maxAgeMs` — the reference's scheduled metadata cleaner
    * (kyuubi-server/.../metadata/MetadataManager.scala:243-253 +
    * JDBCMetadataStore.cleanupMetadataByAge: `end_time > 0 AND
    * end_time < now - maxAge`). Without this the store grows forever
    * on a busy gateway. `limit` bounds one pass (the reference's
    * cleaner batch size) so a years-old backlog doesn't turn the first
    * tick into one giant transaction; selected-then-deleted by id
    * because Derby has no LIMIT on DELETE. Unfinished records
    * (ended_at = 0) are never touched — recovery still finds them.
    * Returns the number of records purged.
    */
  def purgeTerminal(maxAgeMs: Long, limit: Int = 1000): Int =
    purgeTerminalIds(maxAgeMs, limit).size

  /** [[purgeTerminal]] returning the purged ids, so the caller can
    * expire the per-batch artifacts keyed by them (staging dirs, exit
    * records — the reference's TempFileService ties uploaded-file
    * lifetime to the session the same way).
    */
  def purgeTerminalIds(maxAgeMs: Long, limit: Int = 1000): Seq[String] = synchronized {
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val sel = conn.prepareStatement(
      s"SELECT id FROM batches WHERE ended_at > 0 AND ended_at < ? " +
        s"ORDER BY ended_at ${dialect.limitClause}")
    val ids = try {
      sel.setLong(1, cutoff)
      sel.setInt(2, limit)
      val rs = sel.executeQuery()
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (rs.next()) buf += rs.getString(1)
      rs.close()
      buf.toSeq
    } finally sel.close()
    if (ids.nonEmpty) {
      val del = conn.prepareStatement("DELETE FROM batches WHERE id = ?")
      try ids.foreach { id => del.setString(1, id); del.addBatch() }
      finally { try del.executeBatch() finally del.close() }
    }
    ids
  }

  private def record(rs: java.sql.ResultSet): BatchRecord =
    BatchRecord(rs.getString("id"), rs.getString("usr"), rs.getString("sqltext"),
      rs.getString("state"), rs.getLong("created_at"), rs.getLong("ended_at"),
      Option(rs.getString("error")), Option(rs.getString("owner")))

  // count this store against the shared embedded engine (see close())
  BatchMetadataStore.retain(url)

  override def close(): Unit = synchronized {
    try conn.close() catch { case _: Throwable => }
    // embedded Derby: shut down just this database so another store (a
    // restarted frontend) can reopen it — but ONLY when this was the
    // last open store on the URL. Two HA gateways in one JVM share one
    // booted Derby database; the first to stop must not yank it from
    // under the survivor. Server-backed URLs need no handshake.
    if (dialect == MetadataStoreDialect.Derby &&
        BatchMetadataStore.release(url)) {
      val base = url.takeWhile(_ != ';')
      try DriverManager.getConnection(s"$base;shutdown=true")
      catch { case _: java.sql.SQLException => } // XJ015/08006: normal shutdown
    }
  }
}

object BatchMetadataStore {
  private val openCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  private def retain(url: String): Unit =
    openCounts.computeIfAbsent(url,
      _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()

  /** True when the caller was the LAST open store on `url`. */
  private def release(url: String): Boolean =
    Option(openCounts.get(url)).forall(_.decrementAndGet() <= 0)
}
