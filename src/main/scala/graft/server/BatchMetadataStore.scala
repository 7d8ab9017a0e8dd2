package graft.server

import java.sql.{Connection, DriverManager}

/** JDBC-backed batch metadata store: batch jobs survive server
  * restarts, and unfinished ones are found again at startup for
  * recovery — the reference persists batches the same way
  * (kyuubi-server/.../metadata/jdbc/JDBCMetadataStore.scala,
  * BatchJobSubmission recovery). Embedded Derby, which Spark already
  * ships, so there is no new dependency.
  *
  * All access goes through one connection guarded by this store's
  * monitor: batch submits/updates are rare control-plane writes, not a
  * data path, and Derby embedded is in-process anyway.
  */
final class BatchMetadataStore(dir: String) extends AutoCloseable {

  final case class BatchRecord(
      id: String, user: String, sql: String, state: String,
      createdAt: Long, endedAt: Long, error: Option[String])

  // keep Derby's log out of the CWD
  System.setProperty("derby.stream.error.file", s"$dir/derby.log")

  private val conn: Connection =
    DriverManager.getConnection(s"jdbc:derby:$dir/db;create=true")

  locally {
    val meta = conn.getMetaData.getTables(null, null, "BATCHES", null)
    val exists = meta.next()
    meta.close()
    if (!exists) {
      val st = conn.createStatement()
      try st.executeUpdate(
        """CREATE TABLE batches (
          |  id VARCHAR(64) PRIMARY KEY,
          |  usr VARCHAR(256),
          |  sqltext VARCHAR(32000),
          |  state VARCHAR(32),
          |  created_at BIGINT,
          |  ended_at BIGINT,
          |  error VARCHAR(32000)
          |)""".stripMargin)
      finally st.close()
    }
  }

  def insert(id: String, user: String, sql: String, state: String): Unit = synchronized {
    val ps = conn.prepareStatement(
      "INSERT INTO batches (id, usr, sqltext, state, created_at, ended_at, error) VALUES (?,?,?,?,?,0,NULL)")
    try {
      ps.setString(1, id); ps.setString(2, user); ps.setString(3, sql)
      ps.setString(4, state); ps.setLong(5, System.currentTimeMillis())
      ps.executeUpdate()
    } finally ps.close()
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

  /** All persisted batches, newest first (admin listing —
    * reference BatchesResource GET /batches pagination source).
    */
  def list(limit: Int = 100): Seq[BatchRecord] = synchronized {
    val ps = conn.prepareStatement(
      "SELECT * FROM batches ORDER BY created_at DESC FETCH FIRST ? ROWS ONLY")
    try {
      ps.setInt(1, limit)
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

  private def record(rs: java.sql.ResultSet): BatchRecord =
    BatchRecord(rs.getString("id"), rs.getString("usr"), rs.getString("sqltext"),
      rs.getString("state"), rs.getLong("created_at"), rs.getLong("ended_at"),
      Option(rs.getString("error")))

  override def close(): Unit = synchronized {
    try conn.close() catch { case _: Throwable => }
    // shut down just this database so another store (a restarted
    // frontend) can reopen it
    try DriverManager.getConnection(s"jdbc:derby:$dir/db;shutdown=true")
    catch { case _: java.sql.SQLException => } // XJ015/08006: normal shutdown
  }
}
