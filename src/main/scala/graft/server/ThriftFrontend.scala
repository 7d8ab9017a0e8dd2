package graft.server

import java.nio.ByteBuffer
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import scala.concurrent.ExecutionContext
import scala.jdk.CollectionConverters._

import org.apache.hive.service.rpc.thrift._
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.server.TThreadPoolServer
import org.apache.thrift.transport.TServerSocket
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core._

/** HiveServer2-protocol (Thrift binary / JDBC) frontend over the graft
  * engine — the reference's primary wire entry point
  * (kyuubi-server/.../KyuubiTBinaryFrontendService.scala and the
  * engine's SparkTBinaryFrontendService). Speaks the TCLIService
  * contract from the hive-service-rpc classes Spark already ships, so
  * any HiveServer2 JDBC/beeline client connects with
  * `jdbc:hive2://host:port/;auth=noSasl`.
  *
  * Result sets are column-based `TColumn` pages (protocol V6+) with
  * null bitmasks; clients that negotiate below V6 (old Hive JDBC
  * drivers) get row-based `TRow`/`TColumnValue` pages instead
  * (reference kyuubi-common TRowSetGenerator.toRowBasedSet).
  * DECIMAL/DATE/TIMESTAMP/complex values travel as strings per the
  * HiveServer2 convention (the JDBC client re-parses them by column
  * type). Operation lifecycle maps 1:1 onto
  * [[graft.core.Operation]]: async execute + GetOperationStatus
  * polling, cancel via Spark job groups, fetch paging via
  * [[FetchIterator]] (NEXT/PRIOR/FIRST orientations).
  */
final class ThriftFrontend(engine: Engine, requestedPort: Int = 0,
    auth: Option[AuthenticationProvider] = None,
    // Users allowed to impersonate others via hive.server2.proxy.user
    // (reference KyuubiSessionManager proxy-privilege validation over
    // hadoop proxyuser rules; here an explicit allow-list — empty means
    // impersonation is off).
    proxyPrivileged: Set[String] = Set.empty,
    // Per-user live-connection cap (reference
    // kyuubi.server.limit.connections.per.user); 0 = unlimited.
    maxConnectionsPerUser: Int = 0,
    // The rest of the reference limiter family
    // (KyuubiConf.scala:3487-3529): per client IP, per user:IP pair,
    // plus the unlimited (bypass caps) and deny (reject always, beats
    // unlimited) user lists. Deny/unlimited hot-swap via `limiter`.
    maxConnectionsPerIp: Int = 0,
    maxConnectionsPerUserIp: Int = 0,
    unlimitedUsers: Set[String] = Set.empty,
    denyUsers: Set[String] = Set.empty,
    // Denied client IPs (reference SessionLimiter.scala:111-124) —
    // the operator's lever against a misbehaving HOST, not account.
    denyIps: Set[String] = Set.empty) {

  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** One server-side operation: either a SQL statement or a prebuilt
    * metadata DataFrame, with a uniform schema/iterator view.
    */
  private final class DfOperation(session: EngineSession, build: SparkSession => DataFrame)
    extends Operation(session) {
    @volatile var resultSchema: StructType = new StructType()
    @volatile var iter: FetchIterator[Row] = _
    override protected def runInternal(): Unit = {
      val df = build(session.spark)
      resultSchema = df.schema
      iter = new ArrayFetchIterator(df.collect())
    }
  }

  private case class OpBox(session: EngineSession, schema: () => StructType,
      rows: () => FetchIterator[Row], op: Operation)

  private val sessions = new ConcurrentHashMap[String, EngineSession]()
  private val ops = new ConcurrentHashMap[String, OpBox]()
  // Sessions that requested arrow result pages (operation.result.format=arrow).
  private val arrowSessions = ConcurrentHashMap.newKeySet[String]()
  // Per-session bounded-collect cap (operation.result.max.rows).
  private val maxRowsBySession = new ConcurrentHashMap[String, Integer]()
  // Per-session server-side query-timeout cap in ms (reference
  // kyuubi.operation.query.timeout): when set, the client's
  // Statement.setQueryTimeout is capped at this value; when the client
  // sends none, the cap alone arms the timeout.
  private val timeoutCapBySession = new ConcurrentHashMap[String, java.lang.Long]()
  // The limiter admission each session's open took (the keys ACTUALLY
  // incremented), released exactly on close/reap. The limiter counts
  // the identity the transport PROVED, not the impersonated session
  // user — otherwise a proxy-privileged account could dodge its own
  // quota by spreading sessions across impersonation targets. Storing
  // the admission (not the user/ip pair) keeps release correct across
  // unlimited-list hot swaps mid-connection.
  private val admissionBySession =
    new ConcurrentHashMap[String, SessionLimiter.Admission]()

  /** The connection limiter — exposed so the admin surface can
    * hot-refresh its deny/unlimited lists without a restart.
    */
  val limiter: SessionLimiter = new SessionLimiter(
    userLimit = maxConnectionsPerUser, ipLimit = maxConnectionsPerIp,
    userIpLimit = maxConnectionsPerUserIp,
    initialUnlimitedUsers = unlimitedUsers, initialDenyUsers = denyUsers,
    initialDenyIps = denyIps)

  private def releaseConnection(sid: String): Unit =
    Option(admissionBySession.remove(sid)).foreach(limiter.release)
  // Negotiated protocol per session: clients below V6 (old Hive JDBC
  // drivers) must get row-based TRowSets, not TColumn pages
  // (reference TRowSetGenerator.toRowBasedSet).
  private val protoBySession = new ConcurrentHashMap[String, TProtocolVersion]()

  // Purge this frontend's per-session state when the ENGINE closes a
  // session (the idle reaper, or any other engine-side close): without
  // this, OpBoxes keep collected result arrays alive for abandoned
  // clients forever, and a reaped session's stale map entry would keep
  // serving statements as if nothing happened.
  private val sessionCloseListener: Events.Handler = new Events.Handler {
    override def onEvent(e: Events.Event): Unit = e match {
      case Events.SessionEvent(sid, _, "CLOSED", _) =>
        sessions.remove(sid)
        arrowSessions.remove(sid)
        maxRowsBySession.remove(sid)
        timeoutCapBySession.remove(sid)
        releaseConnection(sid)
        protoBySession.remove(sid)
        ops.forEach { (opId, box) =>
          if (box.session.id == sid) {
            try box.op.close() catch { case _: Throwable => }
            ops.remove(opId)
          }
        }
      case _ => ()
    }
  }
  Events.register(sessionCloseListener)

  // --- handle plumbing ------------------------------------------------------
  private def handleId(id: String): THandleIdentifier = {
    val u = UUID.fromString(id)
    val guid = ByteBuffer.allocate(16)
    guid.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    guid.flip()
    new THandleIdentifier(guid, ByteBuffer.allocate(16))
  }
  private def idOf(h: THandleIdentifier): String = {
    val bb = ByteBuffer.wrap(h.getGuid)
    new UUID(bb.getLong, bb.getLong).toString
  }
  private def ok: TStatus = new TStatus(TStatusCode.SUCCESS_STATUS)
  private def err(e: Throwable): TStatus = {
    val st = new TStatus(TStatusCode.ERROR_STATUS)
    st.setErrorMessage(String.valueOf(e.getMessage))
    st.setSqlState("42000")
    st
  }

  // --- Hive JDBC search-pattern translation ---------------------------------
  /** HiveServer2 metadata patterns: '%' = any string, '_' = any single
    * char, backslash escapes both (reference:
    * MetadataOperation.convertSchemaPattern). Spark's catalog APIs only
    * understand '*' globs, so the walk is pruned with a widened glob
    * (every wildcard → '*', an upper bound) and rows are then re-filtered
    * with the exact anchored regex.
    */
  private[server] def hivePattern(p: String): (String, String) = {
    val glob = new StringBuilder
    val regex = new StringBuilder("^")
    var i = 0
    while (i < p.length) {
      p.charAt(i) match {
        case '\\' if i + 1 < p.length =>
          val c = p.charAt(i + 1)
          glob.append(c)
          regex.append(java.util.regex.Pattern.quote(c.toString))
          i += 1
        case '%' | '*' => glob.append('*'); regex.append(".*")
        case '_' => glob.append('*'); regex.append('.')
        case c =>
          glob.append(c)
          regex.append(java.util.regex.Pattern.quote(c.toString))
      }
      i += 1
    }
    regex.append('$')
    // '|' separates alternatives in Spark's filterPattern — a literal one
    // would silently change glob semantics, so widen to match-all and let
    // the regex do the work.
    val g = if (glob.toString.contains("|")) "*" else glob.toString
    (g, regex.toString)
  }

  private def rlikeFilter(df: DataFrame, colName: String, regex: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    // null-safe: temp views surface a null schema, which must still
    // match a match-all pattern
    df.filter(coalesce(col(colName), lit("")).rlike(regex))
  }

  private def opHandle(id: String, hasResult: Boolean): TOperationHandle = {
    val h = new TOperationHandle(handleId(id), TOperationType.EXECUTE_STATEMENT, hasResult)
    h
  }

  private def startDfOp(session: EngineSession, sync: Boolean = true)(
      build: SparkSession => DataFrame): TOperationHandle = {
    session.touch() // metadata traffic is session activity for the idle reaper
    val op = new DfOperation(session, build)
    ops.put(op.handle, OpBox(session, () => op.resultSchema, () => op.iter, op))
    op.run()
    if (sync) op.awaitTermination()
    opHandle(op.handle, hasResult = true)
  }

  // --- type mapping ---------------------------------------------------------
  private def typeId(dt: DataType): TTypeId = dt match {
    case BooleanType => TTypeId.BOOLEAN_TYPE
    case ByteType => TTypeId.TINYINT_TYPE
    case ShortType => TTypeId.SMALLINT_TYPE
    case IntegerType => TTypeId.INT_TYPE
    case LongType => TTypeId.BIGINT_TYPE
    case FloatType => TTypeId.FLOAT_TYPE
    case DoubleType => TTypeId.DOUBLE_TYPE
    case _: DecimalType => TTypeId.DECIMAL_TYPE
    case DateType => TTypeId.DATE_TYPE
    case TimestampType | TimestampNTZType => TTypeId.TIMESTAMP_TYPE
    case BinaryType => TTypeId.BINARY_TYPE
    case _: ArrayType => TTypeId.ARRAY_TYPE
    case _: MapType => TTypeId.MAP_TYPE
    case _: StructType => TTypeId.STRUCT_TYPE
    case NullType => TTypeId.NULL_TYPE
    case _ => TTypeId.STRING_TYPE
  }

  private def tableSchema(schema: StructType): TTableSchema = {
    // columns is a required thrift field: initialize it so a zero-column
    // schema (USE/SET-style statements) still serializes
    val ts = new TTableSchema(new java.util.ArrayList[TColumnDesc]())
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val entry = new TPrimitiveTypeEntry(typeId(f.dataType))
      f.dataType match {
        case d: DecimalType =>
          val q = new TTypeQualifiers()
          q.setQualifiers(Map(
            TCLIServiceConstants.PRECISION ->
              TTypeQualifierValue.i32Value(d.precision),
            TCLIServiceConstants.CHARACTER_MAXIMUM_LENGTH ->
              TTypeQualifierValue.i32Value(d.precision),
            TCLIServiceConstants.SCALE -> TTypeQualifierValue.i32Value(d.scale)).asJava)
          entry.setTypeQualifiers(q)
        case _ =>
      }
      val td = new TTypeDesc()
      td.addToTypes(TTypeEntry.primitiveEntry(entry))
      val cd = new TColumnDesc(f.name, td, i + 1)
      ts.addToColumns(cd)
    }
    ts
  }

  // --- row-set encoding (column-based, V6+) ---------------------------------
  private def nullMask(nulls: Array[Boolean]): ByteBuffer = {
    val bytes = new Array[Byte]((nulls.length + 7) / 8 max 1)
    nulls.zipWithIndex.foreach { case (n, i) =>
      if (n) bytes(i / 8) = (bytes(i / 8) | (1 << (i % 8))).toByte
    }
    ByteBuffer.wrap(bytes)
  }

  private def stringify(v: Any): String = v match {
    case null => ""
    case s: String => s
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case t: java.sql.Timestamp => t.toString
    case d: java.sql.Date => d.toString
    case t: java.time.Instant => java.sql.Timestamp.from(t).toString
    case d: java.time.LocalDate => d.toString
    case t: java.time.LocalDateTime => java.sql.Timestamp.valueOf(t).toString
    case other => String.valueOf(other)
  }

  private def column(dt: DataType, vals: Array[Any]): TColumn = {
    val nulls = vals.map(_ == null)
    val mask = nullMask(nulls)
    dt match {
      case BooleanType => TColumn.boolVal(new TBoolColumn(
        vals.map(v => java.lang.Boolean.valueOf(v != null && v.asInstanceOf[Boolean])).toSeq.asJava, mask))
      case ByteType => TColumn.byteVal(new TByteColumn(
        vals.map(v => java.lang.Byte.valueOf(if (v == null) 0.toByte else v.asInstanceOf[Byte])).toSeq.asJava, mask))
      case ShortType => TColumn.i16Val(new TI16Column(
        vals.map(v => java.lang.Short.valueOf(if (v == null) 0.toShort else v.asInstanceOf[Short])).toSeq.asJava, mask))
      case IntegerType | DateType => TColumn.i32Val(new TI32Column(
        vals.map {
          case null => java.lang.Integer.valueOf(0)
          case d: java.sql.Date => java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
          case d: java.time.LocalDate => java.lang.Integer.valueOf(d.toEpochDay.toInt)
          case v => java.lang.Integer.valueOf(v.asInstanceOf[Int])
        }.toSeq.asJava, mask))
      case LongType => TColumn.i64Val(new TI64Column(
        vals.map(v => java.lang.Long.valueOf(if (v == null) 0L else v.asInstanceOf[Long])).toSeq.asJava, mask))
      case FloatType => TColumn.doubleVal(new TDoubleColumn(
        vals.map(v => java.lang.Double.valueOf(if (v == null) 0.0 else v.asInstanceOf[Float].toDouble)).toSeq.asJava, mask))
      case DoubleType => TColumn.doubleVal(new TDoubleColumn(
        vals.map(v => java.lang.Double.valueOf(if (v == null) 0.0 else v.asInstanceOf[Double])).toSeq.asJava, mask))
      case BinaryType => TColumn.binaryVal(new TBinaryColumn(
        vals.map(v => ByteBuffer.wrap(if (v == null) Array.empty[Byte]
          else v.asInstanceOf[Array[Byte]])).toSeq.asJava, mask))
      case _ =>
        // DECIMAL / DATE-as-string fallback / TIMESTAMP / STRING /
        // complex types: HiveServer2 string convention
        TColumn.stringVal(new TStringColumn(vals.map(stringify).toSeq.asJava, mask))
    }
  }

  // DATE over the wire: HiveServer2 sends DATE as STRING columns, not
  // epoch ints — the JDBC client parses "yyyy-MM-dd".
  private def wireColumn(dt: DataType, vals: Array[Any]): TColumn = dt match {
    case DateType => TColumn.stringVal(new TStringColumn(
      vals.map(stringify).toSeq.asJava, nullMask(vals.map(_ == null))))
    case _ => column(dt, vals)
  }

  // Row-based wire value (protocol < V6). Row mode has no binary value
  // type, so BINARY — like DECIMAL/DATE/TIMESTAMP/complex — travels as
  // a string, matching old-driver HiveServer2 behavior. Nulls are
  // values with the optional field unset.
  private def columnValue(dt: DataType, v: Any): TColumnValue = dt match {
    case BooleanType =>
      val x = new TBoolValue(); if (v != null) x.setValue(v.asInstanceOf[Boolean])
      TColumnValue.boolVal(x)
    case ByteType =>
      val x = new TByteValue(); if (v != null) x.setValue(v.asInstanceOf[Byte])
      TColumnValue.byteVal(x)
    case ShortType =>
      val x = new TI16Value(); if (v != null) x.setValue(v.asInstanceOf[Short])
      TColumnValue.i16Val(x)
    case IntegerType =>
      val x = new TI32Value(); if (v != null) x.setValue(v.asInstanceOf[Int])
      TColumnValue.i32Val(x)
    case LongType =>
      val x = new TI64Value(); if (v != null) x.setValue(v.asInstanceOf[Long])
      TColumnValue.i64Val(x)
    case FloatType =>
      val x = new TDoubleValue(); if (v != null) x.setValue(v.asInstanceOf[Float].toDouble)
      TColumnValue.doubleVal(x)
    case DoubleType =>
      val x = new TDoubleValue(); if (v != null) x.setValue(v.asInstanceOf[Double])
      TColumnValue.doubleVal(x)
    case _ =>
      val x = new TStringValue(); if (v != null) x.setValue(stringify(v))
      TColumnValue.stringVal(x)
  }

  private def toRowBasedSet(schema: StructType, rows: Array[Row]): TRowSet = {
    val trows = new java.util.ArrayList[TRow](rows.length)
    rows.foreach { r =>
      val tr = new TRow()
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        tr.addToColVals(columnValue(f.dataType, r.get(i)))
      }
      trows.add(tr)
    }
    new TRowSet(0, trows)
  }

  private def rowSet(schema: StructType, rows: Array[Row],
      proto: TProtocolVersion): TRowSet = {
    if (proto != null &&
        proto.getValue < TProtocolVersion.HIVE_CLI_SERVICE_PROTOCOL_V6.getValue)
      return toRowBasedSet(schema, rows)
    val rs = new TRowSet(0, new java.util.ArrayList[TRow]())
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rs.addToColumns(wireColumn(f.dataType, rows.map(r => r.get(i))))
    }
    rs
  }

  // --- the TCLIService implementation ---------------------------------------
  private val iface: TCLIService.Iface = new TCLIService.Iface {

    override def OpenSession(req: TOpenSessionReq): TOpenSessionResp = {
      val resp = new TOpenSessionResp()
      // set once the limiter slot is taken but no session owns it yet —
      // a failure in between must give the slot back
      var unownedSlot: Option[SessionLimiter.Admission] = None
      try {
        // With SASL, the identity the transport PROVED wins over the
        // request body's username (reference KyuubiTBinaryFrontendService
        // getUserName: SASL authorization id first).
        val realUser = PlainSasl.authenticatedUser
          .orElse(Option(req.getUsername).filter(_.nonEmpty))
          .getOrElse("anonymous")
        // Connection limits on the PROVED identity + the socket's
        // remote address (reference SessionLimiter over
        // kyuubi.server.limit.connections.{per.user, per.ipaddress,
        // per.user.ipaddress} + unlimited/deny lists): the (N+1)th
        // concurrent open — or any open by a denied user — is rejected
        // before any engine work, atomically (increment-then-check).
        val clientIp = ClientIp.current.getOrElse("")
        val admission = limiter.increment(realUser, clientIp)
        unownedSlot = Some(admission)
        // Client conf in arrival order, then SessionConfAdvisor
        // overlays (overwrite-in-place, new keys append — reference
        // KyuubiSession applies kyuubi.session.conf.advisor overlays
        // over the client conf before any of it takes effect).
        val clientConf = scala.collection.mutable.LinkedHashMap.empty[String, String]
        Option(req.getConfiguration).foreach(_.forEach { (k, v) => clientConf.put(k, v) })
        // Drop client-asserted graft.server.* BEFORE the advisor
        // overlay merges back in: advisedConf strips them from the map
        // it returns, but a put-only merge into the raw client map
        // would resurrect a self-asserted graft.server.session.group
        // and ConfGroupProvider would treat it as server-pinned.
        clientConf.filterInPlace { case (k, _) => !Engine.isReservedClientKey(k) }
        // Impersonation (Hive JDBC forwards the ;hive.server2.proxy.user
        // session var into the open-request conf verbatim — reference
        // KyuubiSessionManager getProxyUser): the SESSION user becomes the
        // proxy target, so authz policies, session_user() and events all
        // see the impersonated identity — but only accounts on the
        // explicit proxy-privilege allow-list may switch.
        val proxyTarget = clientConf.collectFirst {
          case (k, v)
            if k.stripPrefix("set:hiveconf:").stripPrefix("set:hivevar:") ==
              "hive.server2.proxy.user" && v != null && v.nonEmpty => v
        }
        val user = proxyTarget match {
          case Some(p) if p != realUser && !proxyPrivileged.contains(realUser) =>
            throw new SecurityException(
              s"user [$realUser] is not allowed to impersonate [$p]")
          case Some(p) => p
          case None => realUser
        }
        // The advisor runs for the EFFECTIVE (session) user — its
        // overlays are per-tenant policy, and the tenant here is the
        // impersonated identity (reference: advisor sees session user).
        engine.advisedConf(user, clientConf.toMap).foreach { case (k, v) =>
          if (!clientConf.get(k).contains(v)) clientConf.put(k, v)
        }
        val sess = engine.openSession(user, clientConf.toMap)
        sessions.put(sess.id, sess)
        admissionBySession.put(sess.id, admission)
        unownedSlot = None // the close/reap paths release it from here on
        // Impersonation leaves an audit trail: the session's OPENED
        // event carries the proxy TARGET, this one records WHO invoked
        // the privilege (reference audit logging of real vs session user).
        if (user != realUser)
          Events.post(Events.SessionEvent(
            sess.id, realUser, "IMPERSONATED", System.currentTimeMillis()))
        // Apply the session configuration (the Hive JDBC URL's
        // /db, ?conf and #var segments arrive here as use:database,
        // set:hiveconf:* and set:hivevar:* — reference
        // SparkSQLSessionManager.openSession conf processing).
        clientConf.foreach { case (k, v) =>
          val key = k.stripPrefix("set:hiveconf:").stripPrefix("set:hivevar:")
          if (k == "use:database") {
            // A bad database name must FAIL the connection (stock
            // HiveServer2 semantics) — silently staying on 'default'
            // would serve wrong-table results to every later query.
            if (v != null && v.nonEmpty && v != "default") {
              // escape backticks: a name like ev`il must parse as one
              // identifier, not inject past the quoting
              try sess.spark.sql(s"USE `${v.replace("`", "``")}`")
              catch { case e: Throwable =>
                engine.closeSession(sess.id)
                sessions.remove(sess.id)
                throw new IllegalArgumentException(s"database '$v' not found", e)
              }
            }
          } else {
            try {
              if (key.endsWith("operation.result.format")) {
                // arrow result pages (reference ArrowBasedExecuteStatement,
                // selected by kyuubi.operation.result.format=arrow)
                if ("arrow".equalsIgnoreCase(v)) arrowSessions.add(sess.id)
              } else if (key.endsWith("operation.result.max.rows")) {
                // bounded collect (ref kyuubi.operation.result.max.rows)
                val n = v.toInt
                if (n > 0) maxRowsBySession.put(sess.id, n)
              } else if (key.endsWith("operation.query.timeout")) {
                // server-side query timeout cap in ms (reference
                // kyuubi.operation.query.timeout, checkValue >= 1s):
                // caps the client's Statement.setQueryTimeout, or arms
                // the timeout alone when the client sends none
                val ms = v.toLong
                if (ms >= 1000L) timeoutCapBySession.put(sess.id, ms)
              } else if (key.endsWith("operation.scheduler.pool")) {
                // per-operation FAIR scheduler pool (reference
                // kyuubi.operation.scheduler.pool): stored in session
                // conf; Operation.withJobGroup applies it as the
                // spark.scheduler.pool local property per statement
                sess.spark.conf.set("spark.graft.operation.scheduler.pool", v)
              } else if (key.startsWith("spark.graft.authz.")) {
                // server-only identity namespace: Engine.openSession
                // publishes user/groups there for ApplyAuthzPolicies,
                // so a client write would be self-asserted identity
                () // dropped (in-session SET is blocked by the rule too)
              } else if (key.startsWith("spark.")) {
                sess.spark.conf.set(key, v)
              }
            } catch { case _: Throwable => } // bad conf must not kill the session
          }
        }
        val negotiated =
          if (req.getClient_protocol == null) TProtocolVersion.HIVE_CLI_SERVICE_PROTOCOL_V10
          else if (req.getClient_protocol.getValue <= TProtocolVersion.HIVE_CLI_SERVICE_PROTOCOL_V10.getValue)
            req.getClient_protocol
          else TProtocolVersion.HIVE_CLI_SERVICE_PROTOCOL_V10
        resp.setServerProtocolVersion(negotiated)
        protoBySession.put(sess.id, negotiated)
        resp.setSessionHandle(new TSessionHandle(handleId(sess.id)))
        resp.setConfiguration(Map.empty[String, String].asJava)
        resp.setStatus(ok)
      } catch { case e: Throwable =>
        // give back a limiter slot no session came to own (failures
        // after openSession release through the close/reap paths)
        unownedSlot.foreach(limiter.release)
        resp.setStatus(err(e))
      }
      resp
    }

    override def CloseSession(req: TCloseSessionReq): TCloseSessionResp = {
      try {
        val id = idOf(req.getSessionHandle.getSessionId)
        sessions.remove(id)
        arrowSessions.remove(id)
        maxRowsBySession.remove(id)
        timeoutCapBySession.remove(id)
        releaseConnection(id)
        protoBySession.remove(id)
        // Reap this session's operations: clients that drop without
        // CloseOperation would otherwise leak collected result arrays
        // for the life of the server.
        ops.forEach { (opId, box) =>
          if (box.session.id == id) {
            try box.op.close() catch { case _: Throwable => }
            ops.remove(opId)
          }
        }
        engine.closeSession(id)
        new TCloseSessionResp(ok)
      } catch { case e: Throwable =>
        e.printStackTrace()
        new TCloseSessionResp(err(e))
      }
    }

    override def GetInfo(req: TGetInfoReq): TGetInfoResp = {
      val v = req.getInfoType match {
        case TGetInfoType.CLI_SERVER_NAME | TGetInfoType.CLI_DBMS_NAME =>
          TGetInfoValue.stringValue("graft")
        case TGetInfoType.CLI_DBMS_VER => TGetInfoValue.stringValue(Kdf.version)
        case TGetInfoType.CLI_MAX_COLUMN_NAME_LEN => TGetInfoValue.lenValue(128)
        case _ => TGetInfoValue.stringValue("")
      }
      val resp = new TGetInfoResp(ok, v)
      resp
    }

    override def ExecuteStatement(req: TExecuteStatementReq): TExecuteStatementResp = {
      val resp = new TExecuteStatementResp()
      try {
        val sess = sessions.get(idOf(req.getSessionHandle.getSessionId))
        require(sess != null, "no such session")
        // Query timeout (HIVE-4924 Statement.setQueryTimeout, seconds on
        // the wire) combined with the server-side cap the reference way
        // (KyuubiOperationManager.getQueryTimeout): min of the two when
        // both are set, the cap alone when the client sends none, and a
        // timed-out op lands in TIMEOUT (cancelled job group).
        val clientTimeoutMs = math.max(0L, req.getQueryTimeout) * 1000L
        val timeoutMs = Option(timeoutCapBySession.get(sess.id)) match {
          case Some(cap) if clientTimeoutMs > 0 => math.min(cap.longValue, clientTimeoutMs)
          case Some(cap) => cap.longValue
          case None => clientTimeoutMs
        }
        val op =
          if (arrowSessions.contains(sess.id)) {
            sess.executeStatement(req.getStatement, ResultMode.Arrow(), timeoutMs)
          } else Option(maxRowsBySession.get(sess.id)) match {
            case Some(n) => sess.executeStatement(req.getStatement, ResultMode.Bounded(n), timeoutMs)
            case None => sess.executeStatement(req.getStatement, timeoutMs = timeoutMs)
          }
        ops.put(op.handle, OpBox(sess, () => op.result.schema, () => op.fetchIterator, op))
        // Async clients get the handle immediately and discover
        // completion/errors via GetOperationStatus polling; only the
        // sync path blocks the worker thread (matches the reference's
        // runAsync contract in ExecuteStatement).
        if (!req.isRunAsync) {
          op.awaitTermination()
          op.exception.foreach(throw _)
        }
        // Async: the statement hasn't compiled yet, so the schema is
        // unknown — advertise a result set and let GetResultSetMetadata /
        // FetchResults (which both await termination) sort it out.
        resp.setOperationHandle(opHandle(op.handle,
          hasResult = req.isRunAsync || op.result.schema.nonEmpty))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetOperationStatus(req: TGetOperationStatusReq): TGetOperationStatusResp = {
      val resp = new TGetOperationStatusResp()
      val box = ops.get(idOf(req.getOperationHandle.getOperationId))
      if (box == null) { resp.setStatus(err(new NoSuchElementException("no such operation"))); return resp }
      // Status polling is client activity: without this, a statement
      // running longer than the idle timeout finishes and is then
      // reaped before its first FetchResults (reference touches the
      // session on every access).
      box.session.touch()
      val st = box.op.currentState match {
        case OperationState.Initialized => TOperationState.INITIALIZED_STATE
        case OperationState.Pending => TOperationState.PENDING_STATE
        case OperationState.Running | OperationState.Compiled => TOperationState.RUNNING_STATE
        case OperationState.Finished => TOperationState.FINISHED_STATE
        case OperationState.Canceled => TOperationState.CANCELED_STATE
        case OperationState.Closed => TOperationState.CLOSED_STATE
        case OperationState.Error => TOperationState.ERROR_STATE
        case OperationState.Timeout =>
          // Clients below HIVE-4924 (protocol <= V8, Hive < 2.1) have no
          // TIMEDOUT status and would poll forever — report CANCELED to
          // them (reference AbstractOperation.addTimeoutMonitor).
          val proto = protoBySession.get(box.session.id)
          if (proto != null &&
            proto.getValue <= TProtocolVersion.HIVE_CLI_SERVICE_PROTOCOL_V8.getValue)
            TOperationState.CANCELED_STATE
          else TOperationState.TIMEDOUT_STATE
      }
      resp.setOperationState(st)
      box.op.exception.foreach { e =>
        resp.setErrorMessage(String.valueOf(e.getMessage))
        resp.setSqlState("42000")
      }
      // In-place progress (beeline's progress bar): stage-level task
      // counts for this operation's job group from the status tracker.
      // Best-effort: a tracker failure (e.g. context stopping) must
      // degrade to a response without progress, not kill the connection.
      if (req.isGetProgressUpdate) try {
        val tracker = box.session.spark.sparkContext.statusTracker
        val stages = tracker.getJobIdsForGroup(box.op.jobGroup).toSeq
          .flatMap(id => tracker.getJobInfo(id).toSeq.flatMap(_.stageIds().toSeq))
          .distinct.flatMap(sid => tracker.getStageInfo(sid).toSeq)
        val total = stages.map(_.numTasks).sum
        val done = stages.map(_.numCompletedTasks).sum
        val prog = new TProgressUpdateResp()
        prog.setHeaderNames(Seq("STAGE", "TASKS", "COMPLETED", "ACTIVE").asJava)
        prog.setRows(stages.map(s => Seq(s.stageId.toString, s.numTasks.toString,
          s.numCompletedTasks.toString, s.numActiveTasks.toString).asJava).asJava)
        prog.setProgressedPercentage(
          if (box.op.currentState.terminal) 1.0
          else if (total > 0) done.toDouble / total else 0.0)
        prog.setStatus(
          if (box.op.currentState.terminal) TJobExecutionStatus.COMPLETE
          else TJobExecutionStatus.IN_PROGRESS)
        prog.setFooterSummary("")
        prog.setStartTime(0L)
        resp.setProgressUpdateResponse(prog)
      } catch { case _: Throwable => }
      resp.setStatus(ok)
      resp
    }

    override def CancelOperation(req: TCancelOperationReq): TCancelOperationResp = {
      Option(ops.get(idOf(req.getOperationHandle.getOperationId))).foreach { box =>
        box.session.touch() // cancel is session activity for the idle reaper
        box.op.cancel()
      }
      new TCancelOperationResp(ok)
    }

    override def CloseOperation(req: TCloseOperationReq): TCloseOperationResp = {
      Option(ops.remove(idOf(req.getOperationHandle.getOperationId))).foreach(_.op.close())
      new TCloseOperationResp(ok)
    }

    override def GetResultSetMetadata(req: TGetResultSetMetadataReq): TGetResultSetMetadataResp = {
      val resp = new TGetResultSetMetadataResp()
      try {
        val box = ops.get(idOf(req.getOperationHandle.getOperationId))
        require(box != null, "no such operation")
        box.op.awaitTermination()
        resp.setSchema(tableSchema(box.schema()))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def FetchResults(req: TFetchResultsReq): TFetchResultsResp = {
      val resp = new TFetchResultsResp()
      try {
        val box = ops.get(idOf(req.getOperationHandle.getOperationId))
        require(box != null, "no such operation")
        box.session.touch() // paging is session activity for the idle reaper
        // fetchType 1 = operation LOG (HiveServer2 convention): a
        // single-string-column page of pending log lines, available
        // WHILE the op runs — no awaitTermination.
        if (req.getFetchType == 1) {
          val max = math.max(1L, math.min(req.getMaxRows, 10000L)).toInt
          val lines = box.op.fetchLog(max)
          val logSchema = StructType(Seq(StructField("operation_log", StringType)))
          resp.setResults(rowSet(logSchema, lines.map(Row(_)).toArray,
            protoBySession.get(box.session.id)))
          resp.setHasMoreRows(false)
          resp.setStatus(ok)
          return resp
        }
        box.op.awaitTermination()
        box.op.exception.foreach(throw _)
        // Clamp before narrowing: Long.MaxValue ("all rows") must not
        // overflow toInt into a 1-row-per-round-trip fetch.
        val max = math.max(1L, math.min(req.getMaxRows, Int.MaxValue.toLong)).toInt
        // Arrow result pages: one binary column whose values are
        // IPC-serialized record batches (maxRows counts batches); the
        // schema stays available via GetResultSetMetadata for decoding.
        box.op match {
          case es: ExecuteStatement if es.arrowIterator != null =>
            val ait = es.arrowIterator
            req.getOrientation match {
              case TFetchOrientation.FETCH_FIRST => ait.fetchAbsolute(0)
              case TFetchOrientation.FETCH_PRIOR => ait.fetchPrior(max)
              case _ => ait.fetchNext()
            }
            val page = ait.take(max).toArray
            val rs = new TRowSet(0, new java.util.ArrayList[TRow]())
            rs.addToColumns(TColumn.binaryVal(new TBinaryColumn(
              page.map(ByteBuffer.wrap(_): ByteBuffer).toSeq.asJava,
              ByteBuffer.wrap(Array.fill((page.length + 7) / 8)(0.toByte)))))
            resp.setResults(rs)
            resp.setHasMoreRows(ait.hasNext)
            resp.setStatus(ok)
            return resp
          case _ =>
        }
        val it = box.rows()
        req.getOrientation match {
          case TFetchOrientation.FETCH_FIRST => it.fetchAbsolute(0)
          case TFetchOrientation.FETCH_PRIOR => it.fetchPrior(max)
          case _ => it.fetchNext()
        }
        val page = it.take(max).toArray
        val rs = rowSet(box.schema(), page, protoBySession.get(box.session.id))
        resp.setResults(rs)
        resp.setHasMoreRows(it.hasNext)
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    // --- metadata operations ------------------------------------------------
    private def sessionOf(h: TSessionHandle): EngineSession = {
      val s = sessions.get(idOf(h.getSessionId))
      require(s != null, "no such session")
      s
    }

    override def GetCatalogs(req: TGetCatalogsReq): TGetCatalogsResp = {
      val resp = new TGetCatalogsResp()
      try {
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(MetadataOps.getCatalogs))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetSchemas(req: TGetSchemasReq): TGetSchemasResp = {
      val resp = new TGetSchemasResp()
      try {
        val (glob, regex) = hivePattern(
          Option(req.getSchemaName).filter(_.nonEmpty).getOrElse("%"))
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(
          s => rlikeFilter(MetadataOps.getSchemas(s, glob), "TABLE_SCHEM", regex)))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetTables(req: TGetTablesReq): TGetTablesResp = {
      val resp = new TGetTablesResp()
      try {
        val (dbGlob, dbRegex) = hivePattern(
          Option(req.getSchemaName).filter(_.nonEmpty).getOrElse("%"))
        val (tblGlob, tblRegex) = hivePattern(
          Option(req.getTableName).filter(_.nonEmpty).getOrElse("%"))
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(
          s => rlikeFilter(rlikeFilter(MetadataOps.getTables(s, dbGlob, tblGlob),
            "TABLE_SCHEM", dbRegex), "TABLE_NAME", tblRegex)))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetTableTypes(req: TGetTableTypesReq): TGetTableTypesResp = {
      val resp = new TGetTableTypesResp()
      try {
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(MetadataOps.getTableTypes))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetColumns(req: TGetColumnsReq): TGetColumnsResp = {
      val resp = new TGetColumnsResp()
      try {
        // getColumns resolves an exact table; JDBC clients send the name
        // they got from GetTables. A wildcard pattern walks the matching
        // tables of the current database and unions their columns.
        val tblArg = Option(req.getTableName).filter(_.nonEmpty).getOrElse("%")
        val (glob, regex) = hivePattern(tblArg)
        val build: SparkSession => DataFrame =
          if (!tblArg.exists(c => c == '%' || c == '_' || c == '*')) {
            MetadataOps.getColumns(_, tblArg.replace("\\", ""))
          } else { s =>
            val names = rlikeFilter(
              MetadataOps.getTables(s, "*", glob), "TABLE_NAME", regex)
              .select("TABLE_SCHEM", "TABLE_NAME").collect()
            names.map { r =>
              // temp views have no schema: resolve by bare name
              val qualified = Option(r.getString(0)).filter(_.nonEmpty)
                .map(db => s"$db.${r.getString(1)}").getOrElse(r.getString(1))
              MetadataOps.getColumns(s, qualified)
            }
              .reduceOption(_ unionAll _)
              .getOrElse(MetadataOps.noColumns(s))
          }
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(build))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetFunctions(req: TGetFunctionsReq): TGetFunctionsResp = {
      val resp = new TGetFunctionsResp()
      try {
        val (glob, regex) = hivePattern(
          Option(req.getFunctionName).filter(_.nonEmpty).getOrElse("%"))
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(
          s => rlikeFilter(MetadataOps.getFunctions(s, glob), "FUNCTION_NAME", regex)))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetTypeInfo(req: TGetTypeInfoReq): TGetTypeInfoResp = {
      val resp = new TGetTypeInfoResp()
      try {
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(MetadataOps.getTypeInfo))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetPrimaryKeys(req: TGetPrimaryKeysReq): TGetPrimaryKeysResp = {
      val resp = new TGetPrimaryKeysResp()
      try {
        def s(v: String) = Option(v).getOrElse("")
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(
          MetadataOps.getPrimaryKeys(_, s(req.getCatalogName), s(req.getSchemaName),
            s(req.getTableName))))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetCrossReference(req: TGetCrossReferenceReq): TGetCrossReferenceResp = {
      val resp = new TGetCrossReferenceResp()
      try {
        def s(v: String) = Option(v).getOrElse("")
        resp.setOperationHandle(startDfOp(sessionOf(req.getSessionHandle))(
          MetadataOps.getCrossReference(_,
            s(req.getParentCatalogName), s(req.getParentSchemaName), s(req.getParentTableName),
            s(req.getForeignCatalogName), s(req.getForeignSchemaName), s(req.getForeignTableName))))
        resp.setStatus(ok)
      } catch { case e: Throwable => resp.setStatus(err(e)) }
      resp
    }

    override def GetQueryId(req: TGetQueryIdReq): TGetQueryIdResp =
      new TGetQueryIdResp(idOf(req.getOperationHandle.getOperationId))

    override def GetDelegationToken(req: TGetDelegationTokenReq): TGetDelegationTokenResp = {
      val resp = new TGetDelegationTokenResp()
      resp.setStatus(err(new UnsupportedOperationException("delegation tokens unsupported")))
      resp
    }
    override def CancelDelegationToken(req: TCancelDelegationTokenReq): TCancelDelegationTokenResp =
      new TCancelDelegationTokenResp(err(new UnsupportedOperationException("delegation tokens unsupported")))
    /** Engine-side credential receiver (reference
      * SparkTBinaryFrontendService.RenewDelegationToken decodes the
      * pushed Hadoop credentials and updates the process tokens): the
      * gateway's sendCredentialsIfNeeded delivers a renewed
      * [[TokenBundle]] here, and the engine's live store replaces its
      * launch-time tokens — what closes the renewal loop for
      * long-lived engines. Requires a live session; a malformed bundle
      * is an error (the gateway's session epoch then stays unadvanced
      * and the push retries on the next statement).
      */
    override def RenewDelegationToken(req: TRenewDelegationTokenReq): TRenewDelegationTokenResp =
      try {
        sessionOf(req.getSessionHandle)
        val bundle = TokenBundle.decode(req.getDelegationToken)
        val b64 = java.util.Base64.getEncoder
        engine.updateCredentials(bundle.aliases.toSeq.map { a =>
          a -> b64.encodeToString(bundle.get(a).get)
        }.toMap)
        new TRenewDelegationTokenResp(ok)
      } catch { case e: Throwable => new TRenewDelegationTokenResp(err(e)) }
    override def SetClientInfo(req: TSetClientInfoReq): TSetClientInfoResp =
      new TSetClientInfoResp(ok)
    override def UploadData(req: TUploadDataReq): TUploadDataResp = {
      val resp = new TUploadDataResp()
      resp.setStatus(err(new UnsupportedOperationException("UploadData unsupported")))
      resp
    }
    override def DownloadData(req: TDownloadDataReq): TDownloadDataResp = {
      val resp = new TDownloadDataResp()
      resp.setStatus(err(new UnsupportedOperationException("DownloadData unsupported")))
      resp
    }
  }

  /** The TCLIService processor over this frontend's session state —
    * shared with [[ThriftHttpFrontend]], which serves the same engine
    * over the HTTP transport (processors are stateless wrappers; the
    * iface is already called concurrently by the thread-pool server).
    */
  private[server] def processor: TCLIService.Processor[_] =
    new TCLIService.Processor(iface)

  // --- server lifecycle -----------------------------------------------------
  private val serverSocket = new TServerSocket(requestedPort)
  val boundPort: Int = serverSocket.getServerSocket.getLocalPort

  // auth=None keeps the historical noSasl wire; a provider switches the
  // whole socket to SASL PLAIN (credentials checked BEFORE any
  // TCLIService call reaches the processor).
  private val transportFactory = auth match {
    case Some(p) => PlainSasl.serverTransportFactory(p)
    case None => new org.apache.thrift.transport.TTransportFactory()
  }

  private val server = new TThreadPoolServer(
    new TThreadPoolServer.Args(serverSocket)
      .processor(new TCLIService.Processor(iface))
      .transportFactory(transportFactory)
      .protocolFactory(new TBinaryProtocol.Factory())
      .minWorkerThreads(2)
      .maxWorkerThreads(32))

  // Capture each connection's remote address on its worker thread
  // before requests are processed (Hive's TSetIpAddressProcessor
  // pattern) — feeds the per-IP / per-user:IP connection limits.
  server.setServerEventHandler(new org.apache.thrift.server.TServerEventHandler {
    override def preServe(): Unit = ()
    override def createContext(input: org.apache.thrift.protocol.TProtocol,
        output: org.apache.thrift.protocol.TProtocol): org.apache.thrift.server.ServerContext = null
    override def deleteContext(ctx: org.apache.thrift.server.ServerContext,
        input: org.apache.thrift.protocol.TProtocol,
        output: org.apache.thrift.protocol.TProtocol): Unit = ClientIp.clear()
    override def processContext(ctx: org.apache.thrift.server.ServerContext,
        in: org.apache.thrift.transport.TTransport,
        out: org.apache.thrift.transport.TTransport): Unit =
      ClientIp.set(ClientIp.remoteIp(in))
  })

  private val serverThread = new Thread(() => server.serve(), s"graft-thrift-$boundPort")
  serverThread.setDaemon(true)

  def start(): ThriftFrontend = { serverThread.start(); this }

  def stop(): Unit = {
    server.stop()
    serverSocket.close()
    Events.unregister(sessionCloseListener)
  }
}
