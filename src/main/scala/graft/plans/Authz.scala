package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Policy-driven row filtering and column masking, the reference's
  * Ranger authz surface re-expressed as plain Catalyst resolution rules
  * (RangerSparkExtension.scala:44-71, RuleApplyRowFilter,
  * RuleApplyDataMaskingStage0): relations matching a policy get wrapped
  * with a Filter (row-level) and a Project of masked output columns
  * (column-level). Masked aliases keep the original exprIds so every
  * upstream reference — joins, aggregates, ORDER BY — resolves
  * unchanged; the query author cannot tell masking happened except by
  * the values.
  *
  * Policies live in [[AuthzPolicies]] (programmatic store standing in
  * for the Ranger REST sync); the acting user comes from the session
  * conf `spark.graft.authz.user` (set by Engine.openSession).
  */
/** Ranger's public data-masking type vocabulary
  * (kyuubi-spark-authz/.../rule/datamasking/: MASK, MASK_SHOW_LAST_4,
  * MASK_SHOW_FIRST_4, MASK_HASH, MASK_NULL, MASK_DATE_SHOW_YEAR,
  * CUSTOM), each rendered to a SQL expression over the column. The
  * redact transform is Hive's mask() convention: upper→X, lower→x,
  * digit→n, other characters kept.
  */
sealed trait MaskType {
  def toSql(col: String, dataType: org.apache.spark.sql.types.DataType): String
}

object MaskType {
  import org.apache.spark.sql.types.StringType

  private def redact(inner: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($inner, '[A-Z]', 'X'), '[a-z]', 'x'), '[0-9]', 'n')"

  /** Full redaction; non-string columns have no character structure to
    * redact and nullify instead (Ranger's non-string MASK default).
    */
  case object Full extends MaskType {
    def toSql(col: String, dt: org.apache.spark.sql.types.DataType): String =
      if (dt == StringType) redact(col) else "NULL"
  }

  /** Redact all but the last 4 characters. */
  case object ShowLast4 extends MaskType {
    def toSql(col: String, dt: org.apache.spark.sql.types.DataType): String =
      s"concat(${redact(s"left($col, greatest(length($col) - 4, 0))")}, right($col, 4))"
  }

  /** Redact all but the first 4 characters. */
  case object ShowFirst4 extends MaskType {
    def toSql(col: String, dt: org.apache.spark.sql.types.DataType): String =
      s"concat(left($col, 4), ${redact(s"substring($col, 5)")})"
  }

  /** One-way hash; equality joins on the masked column still work.
    * String columns only (a hex digest cannot keep a non-string
    * column's type) — others nullify, keeping the schema stable.
    */
  case object Hash extends MaskType {
    def toSql(col: String, dt: org.apache.spark.sql.types.DataType): String =
      if (dt == StringType) s"sha2(cast($col AS string), 256)" else "NULL"
  }

  /** Replace with NULL of the column's type. */
  case object Nullify extends MaskType {
    def toSql(col: String, dt: org.apache.spark.sql.types.DataType): String = "NULL"
  }

  /** Keep the year, zero the month/day (Ranger MASK_DATE_SHOW_YEAR). */
  case object DateShowYear extends MaskType {
    def toSql(col: String, dt: org.apache.spark.sql.types.DataType): String =
      s"trunc($col, 'YEAR')"
  }

  /** Arbitrary SQL over the row (Ranger CUSTOM). */
  final case class Custom(sql: String) extends MaskType {
    def toSql(col: String, dt: org.apache.spark.sql.types.DataType): String = sql
  }
}

object AuthzPolicies {

  /** @param rowFilters table name → SQL predicate kept rows must satisfy
    * @param masks (table, column) → masking type applied to the column
    */
  final case class Policy(
      rowFilters: Map[String, String] = Map.empty,
      masks: Map[(String, String), MaskType] = Map.empty) {
    // Db-qualified lookups with bare-name back-compat: an exact
    // (possibly `db.table`-keyed) entry wins; a legacy bare-keyed
    // entry applies to that table name in ANY database. Two tables
    // with the same name in different databases can therefore carry
    // different masks/filters (Ranger db/table/column resources).
    private def bare(resource: String): String =
      resource.substring(resource.lastIndexOf('.') + 1)
    def rowFilterFor(resource: String): Option[String] =
      rowFilters.get(resource).orElse(rowFilters.get(bare(resource)))
    def maskFor(resource: String, column: String): Option[MaskType] =
      masks.get((resource, column)).orElse(masks.get((bare(resource), column)))
    def touches(resource: String): Boolean =
      rowFilterFor(resource).isDefined ||
        masks.keys.exists(k => k._1 == resource || k._1 == bare(resource))
  }

  /** Table access policy, Ranger's resource-policy item model: allow
    * users/groups, deny users/groups, deny-exceptions (excludes from
    * the deny list), and an override priority. Evaluation in
    * [[decideAccess]]: policies for the table are consulted in
    * priority order (highest first); within a policy DENY overrides
    * ALLOW, and a user (or one of their groups) in the deny-exception
    * sets escapes that policy's deny list. `"*"` matches any user.
    * Group membership comes from the session's GroupProvider
    * resolution (Engine.openSession publishes it as
    * `spark.graft.authz.groups`) — the Ranger policy-item model where
    * users and groups are separate subject lists.
    * Once ANY access policy exists for a table, the default flips to
    * deny — Ranger's no-matching-allow-item semantics.
    */
  /** `columns` scopes the policy: empty = the whole table (every
    * column); non-empty = only those columns, the Ranger column-
    * resource model (`"*"` = any column). A column-scoped ALLOW also
    * grants table-level entry — the per-column check then decides
    * which referenced columns are actually readable; a column-scoped
    * DENY never blocks queries that do not touch its columns.
    */
  /** `privilege` scopes the policy to one access verb — Ranger's
    * accessType vocabulary ("select", "insert", "drop", ...); a policy
    * grants/denies only its own verb, and once ANY policy names a
    * table, a verb with no matching allow item is denied
    * (no-matching-allow-item semantics per privilege).
    */
  final case class AccessPolicy(
      table: String,
      allowed: Set[String] = Set.empty,
      denied: Set[String] = Set.empty,
      denyExceptions: Set[String] = Set.empty,
      priority: Int = 0,
      allowedGroups: Set[String] = Set.empty,
      deniedGroups: Set[String] = Set.empty,
      denyExceptionGroups: Set[String] = Set.empty,
      columns: Set[String] = Set.empty,
      privilege: String = "select")

  @volatile private var byUser: Map[String, Policy] = Map.empty
  @volatile private var byGroup: Map[String, Policy] = Map.empty
  @volatile private var accessPolicies: List[AccessPolicy] = Nil
  // function-resource policies (reference function_command_spec.json:
  // Ranger gates udf/function usage like table access); reuses the
  // AccessPolicy item model with `table` holding the FUNCTION name
  @volatile private var functionPolicies: List[AccessPolicy] = Nil

  def setPolicy(user: String, policy: Policy): Unit = synchronized {
    byUser = byUser + (user -> policy)
  }
  /** Row-filter/mask policy for every member of `group` (Ranger
    * mask/row-filter policy items carry group subjects too).
    */
  def setGroupPolicy(group: String, policy: Policy): Unit = synchronized {
    byGroup = byGroup + (group -> policy)
  }
  def addAccessPolicy(p: AccessPolicy): Unit = synchronized {
    accessPolicies = p :: accessPolicies
  }
  /** Function names are case-insensitive in SQL; the probe side
    * ([[decideFunctionAccess]]) lowercases, so the policy side must be
    * normalized too or a policy named `MySecretUdf` silently never
    * enforces.
    */
  private def normalizeFn(p: AccessPolicy): AccessPolicy =
    p.copy(table = p.table.toLowerCase(java.util.Locale.ROOT))

  def addFunctionPolicy(p: AccessPolicy): Unit = synchronized {
    functionPolicies = normalizeFn(p) :: functionPolicies
  }
  def clear(): Unit = synchronized {
    byUser = Map.empty; byGroup = Map.empty
    accessPolicies = Nil; functionPolicies = Nil
  }

  // ---- file-backed policy sync -------------------------------------
  //
  // The reference's Ranger plugin polls the Ranger admin for the full
  // policy set and swaps it in atomically; ours polls a JSON file —
  // same operational contract (policies change without a server
  // restart, a sync REPLACES the whole store so deletes propagate).
  //
  // Document shape (all sections optional):
  //   {"accessPolicies":   [{"table": "db.t", "privilege": "select",
  //                          "allowed": ["u"], "denied": [], "denyExceptions": [],
  //                          "allowedGroups": [], "deniedGroups": [],
  //                          "denyExceptionGroups": [], "columns": [], "priority": 0}],
  //    "functionPolicies": [{"table": "fn", "allowed": ["u"]}],
  //    "rowFilters":       [{"subject": "user:u" | "group:g", "table": "t",
  //                          "filter": "region = 'eu'"}],
  //    "masks":            [{"subject": "user:u", "table": "t", "column": "c",
  //                          "mask": "MASK|SHOW_LAST_4|SHOW_FIRST_4|HASH|NULLIFY|
  //                                   DATE_SHOW_YEAR|CUSTOM:<sql>"}]}

  private def parseMask(s: String): MaskType = s match {
    case "MASK" => MaskType.Full
    case "SHOW_LAST_4" | "MASK_SHOW_LAST_4" => MaskType.ShowLast4
    case "SHOW_FIRST_4" | "MASK_SHOW_FIRST_4" => MaskType.ShowFirst4
    case "HASH" | "MASK_HASH" => MaskType.Hash
    case "NULLIFY" | "MASK_NULL" => MaskType.Nullify
    case "DATE_SHOW_YEAR" | "MASK_DATE_SHOW_YEAR" => MaskType.DateShowYear
    case c if c.startsWith("CUSTOM:") => MaskType.Custom(c.stripPrefix("CUSTOM:"))
    case other => throw new IllegalArgumentException(s"unknown mask type [$other]")
  }

  /** Parse a policy document and atomically REPLACE the store with it
    * (full-set sync — absent policies are thereby revoked).
    */
  def loadJson(json: String): Unit = {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    def strs(n: com.fasterxml.jackson.databind.JsonNode, f: String): Set[String] =
      Option(n.get(f)).map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty)
    def items(section: String): Seq[com.fasterxml.jackson.databind.JsonNode] =
      Option(root.get(section)).map(_.elements().asScala.toSeq).getOrElse(Nil)
    def accessOf(n: com.fasterxml.jackson.databind.JsonNode): AccessPolicy =
      AccessPolicy(
        table = n.get("table").asText(),
        allowed = strs(n, "allowed"),
        denied = strs(n, "denied"),
        denyExceptions = strs(n, "denyExceptions"),
        priority = Option(n.get("priority")).map(_.asInt()).getOrElse(0),
        allowedGroups = strs(n, "allowedGroups"),
        deniedGroups = strs(n, "deniedGroups"),
        denyExceptionGroups = strs(n, "denyExceptionGroups"),
        columns = strs(n, "columns"),
        privilege = Option(n.get("privilege")).map(_.asText()).getOrElse("select"))
    val access = items("accessPolicies").map(accessOf).toList
    val fns = items("functionPolicies").map(accessOf).map(normalizeFn).toList
    // row filters / masks fold into per-subject Policy layers
    var users = Map.empty[String, Policy]
    var groups = Map.empty[String, Policy]
    def merge(subject: String, add: Policy): Unit = {
      val (isGroup, name) = subject.split(":", 2) match {
        case Array("group", g) => (true, g)
        case Array("user", u) => (false, u)
        case _ => throw new IllegalArgumentException(
          s"subject must be user:<name> or group:<name>, got [$subject]")
      }
      if (isGroup) {
        val prev = groups.getOrElse(name, Policy())
        groups += name -> Policy(prev.rowFilters ++ add.rowFilters, prev.masks ++ add.masks)
      } else {
        val prev = users.getOrElse(name, Policy())
        users += name -> Policy(prev.rowFilters ++ add.rowFilters, prev.masks ++ add.masks)
      }
    }
    items("rowFilters").foreach { n =>
      merge(n.get("subject").asText(),
        Policy(rowFilters = Map(n.get("table").asText() -> n.get("filter").asText())))
    }
    items("masks").foreach { n =>
      merge(n.get("subject").asText(),
        Policy(masks = Map((n.get("table").asText(), n.get("column").asText()) ->
          parseMask(n.get("mask").asText()))))
    }
    synchronized {
      byUser = users
      byGroup = groups
      accessPolicies = access
      functionPolicies = fns
    }
  }

  @volatile private var syncedMtime = -1L

  /** Reload `path` if its mtime changed since the last sync; returns
    * true when a reload happened. A malformed document leaves the
    * PREVIOUS policy set in force (fail-closed to the last good set —
    * the Ranger plugin's stale-policies-on-admin-outage behavior).
    */
  def syncFile(path: java.nio.file.Path): Boolean = {
    if (!java.nio.file.Files.isReadable(path)) return false
    val mtime = java.nio.file.Files.getLastModifiedTime(path).toMillis
    if (mtime == syncedMtime) return false
    try {
      loadJson(new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8))
      syncedMtime = mtime
      true
    } catch {
      case e: Exception =>
        // a failed reload is never silent: operators must see that the
        // store is running on the LAST GOOD set, not the file's content
        graft.core.Events.post(graft.core.Events.AuthzAuditEvent(
          "system", "policy-sync-failed", s"$path: ${e.getMessage}",
          System.currentTimeMillis()))
        System.err.println(s"[graft] authz policy sync of $path failed, " +
          s"keeping last good set: ${e.getMessage}")
        false
    }
  }

  /** Operator-triggered reload regardless of mtime (the admin refresh
    * endpoint): an edit landing within the mtime granularity — or an
    * operator who cannot wait out the sync interval — still gets a
    * definite reload. Same fail-closed-to-last-good contract as
    * [[syncFile]].
    */
  def forceSyncFile(path: java.nio.file.Path): Boolean = {
    syncedMtime = -1L
    syncFile(path)
  }

  /** Arm a periodic file sync on the shared scheduler. The initial sync
    * runs inline so policies are in force before any session opens — and
    * it THROWS on a malformed document: starting with an empty store is
    * fail-OPEN (no policies = everything allowed), so a server told to
    * enforce a policy file it cannot parse must refuse to start rather
    * than silently enforce nothing. Only once a good set has loaded do
    * later failed reloads degrade to fail-closed-to-last-good (audited
    * in [[syncFile]]).
    */
  def startFileSync(path: java.nio.file.Path, intervalMs: Long = 30000L): Unit = {
    syncedMtime = -1L
    if (java.nio.file.Files.isReadable(path)) {
      loadJson(new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)) // throws on malformed
      syncedMtime = java.nio.file.Files.getLastModifiedTime(path).toMillis
    }
    graft.core.Operation.timeoutScheduler.scheduleAtFixedRate(
      () => try syncFile(path) catch { case _: Throwable => },
      intervalMs, intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)
  }
  def policyFor(user: String): Option[Policy] = policyFor(user, Set.empty)

  /** Effective policy: group policies merged in group-name order, the
    * user's own policy layered last (user-specific wins conflicts on
    * the same table/column key).
    */
  def policyFor(user: String, groups: Set[String]): Option[Policy] = {
    val layers = groups.toSeq.sorted.flatMap(byGroup.get) ++ byUser.get(user).toSeq
    if (layers.isEmpty) None
    else Some(layers.reduce { (a, b) =>
      Policy(a.rowFilters ++ b.rowFilters, a.masks ++ b.masks)
    })
  }

  def decideAccess(user: String, table: String): Boolean =
    decideAccess(user, Set.empty, table)

  /** Table names the user may NOT select among the policied set —
    * finite by construction (policies are opt-in per table), so
    * catalog listings can be filtered with one IN-list instead of a
    * per-row policy evaluation at execution time.
    */
  def deniedTablesFor(user: String, groups: Set[String]): Set[String] =
    accessPolicies.map(_.table).toSet
      .filterNot(t => decideAccess(user, groups, t))

  /** Databases the user may NOT "use" among the use-policied set —
    * finite by construction, so SHOW DATABASES filters with one
    * IN-list (reference FilteredShowNamespaceExec's per-row USE check,
    * pre-evaluated). Only policies carrying the explicit "use" verb
    * participate: a table policy must not hide a same-named database,
    * and a database gated only for create/drop DDL stays listed.
    */
  def deniedNamespacesFor(user: String, groups: Set[String]): Set[String] =
    accessPolicies.filter(_.privilege == "use")
      .map(_.table).filterNot(_.contains('.')).toSet
      .filterNot(db => decidePrivilege(user, groups, db, "use"))

  /** True when `user` (with `groups`) may read `table` under the
    * registered access policies; tables with no policy stay open (the
    * programmatic store is opt-in; a Ranger deployment would sync a
    * full policy set).
    */
  /** Fast guard for the per-query plan walks: true when any access
    * policy is registered at all.
    */
  def hasAccessPolicies: Boolean = accessPolicies.nonEmpty

  def hasFunctionPolicies: Boolean = functionPolicies.nonEmpty

  /** True when `user` may invoke function `fn` (the "select" verb on a
    * function resource — reference function_command_spec.json's
    * QUERY/function privilege objects). Functions with no policy stay
    * open; once any policy names a function, no-matching-allow-item
    * denies.
    */
  def decideFunctionAccess(user: String, groups: Set[String], fn: String): Boolean =
    decideOver(functionPolicies, user, groups, fn.toLowerCase(java.util.Locale.ROOT),
      None, "select")

  def decideAccess(user: String, groups: Set[String], table: String): Boolean =
    decide(user, groups, table, None)

  /** True when `user` may read `table`.`column` — the reference's
    * per-referenced-column SELECT privilege granularity
    * (kyuubi-spark-authz/.../PrivilegesBuilder.scala builds one
    * PrivilegeObject per referenced column; Ranger evaluates each).
    * Only policies covering the column participate; once any policy
    * exists for the table, an uncovered/unallowed column defaults to
    * deny (no-matching-allow-item semantics).
    */
  def decideColumnAccess(user: String, groups: Set[String],
      table: String, column: String): Boolean =
    decide(user, groups, table, Some(column))

  /** True when `user` may exercise `privilege` ("insert", "drop", …)
    * on `table` — the write-side verbs of the reference's
    * PrivilegesBuilder (output privilege objects for
    * InsertIntoStatement / DropTable / CTAS).
    */
  def decidePrivilege(user: String, groups: Set[String],
      table: String, privilege: String): Boolean =
    decide(user, groups, table, None, privilege)

  /** A policy resource matches a (possibly `db.table`-qualified)
    * plan resource on exact equality, or — back-compat — a legacy
    * BARE policy name matches that table name in any database. A
    * db-qualified policy never matches a bare resource or another
    * database's same-named table.
    */
  def tableMatches(policyTable: String, resource: String): Boolean =
    policyTable == resource ||
      (!policyTable.contains('.') &&
        policyTable == resource.substring(resource.lastIndexOf('.') + 1))

  private def decide(user: String, groups: Set[String], table: String,
      column: Option[String], privilege: String = "select"): Boolean =
    decideOver(accessPolicies, user, groups, table, column, privilege)

  private def decideOver(policies: List[AccessPolicy], user: String,
      groups: Set[String], table: String,
      column: Option[String], privilege: String): Boolean = {
    val all0 = policies.filter(p => tableMatches(p.table, table))
    if (all0.isEmpty) return true
    // per-verb policy scope: only this privilege's items participate;
    // a table under any policy default-denies verbs nobody allowed
    val all = all0.filter(_.privilege == privilege)
    // Column question: only policies whose resource covers the column.
    // Table question: any allow grants entry (a column-scoped allow
    // means the user may touch the table — the per-column checks then
    // police which referenced columns are readable), but only a
    // TABLE-scoped deny blocks the table outright.
    val ps = column match {
      case Some(c) => all.filter(p =>
        p.columns.isEmpty || p.columns.contains(c) || p.columns.contains("*"))
      case None => all
    }
    def in(s: Set[String]): Boolean = s.contains(user) || s.contains("*")
    def inG(s: Set[String]): Boolean = s.contains("*") || groups.exists(s.contains)
    // highest priority first (Ranger override policies), deny first
    // within each policy (deny-overrides-allow)
    ps.sortBy(-_.priority).foreach { p =>
      val denyApplies = column.isDefined || p.columns.isEmpty
      val denied = denyApplies && (in(p.denied) || inG(p.deniedGroups))
      val excepted = p.denyExceptions.contains(user) || groups.exists(p.denyExceptionGroups.contains)
      if (denied && !excepted) return false
      if (in(p.allowed) || inG(p.allowedGroups)) return true
    }
    false // policies exist, none allowed this user/group set
  }
}

class ApplyAuthzPolicies(session: SparkSession) extends Rule[LogicalPlan] {

  /** Every DENY decision lands on the Events bus before it throws —
    * the audit half of the reference's Ranger plugin (denied requests
    * are always audited; allows are not audited here, the standard
    * audit-filter cut for the hot path).
    */
  private def denyAudited(user: String, verb: String, resource: String): Nothing = {
    graft.core.Events.post(graft.core.Events.AuthzAuditEvent(
      user, verb, resource, System.currentTimeMillis()))
    throw new SecurityException(
      s"Permission denied: user [$user] does not have [$verb] privilege on [$resource]")
  }

  private val APPLIED = TreeNodeTag[Boolean]("graft.authz.applied")
  private val MASK_PROJECT = TreeNodeTag[Boolean]("graft.authz.maskProject")
  // policy-injected nodes (row-filter Filters): their expressions are
  // system usage, exempt from the per-column privilege walk
  private val INJECTED = TreeNodeTag[Boolean]("graft.authz.injected")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val user = session.conf.getOption("spark.graft.authz.user")
    // The identity namespace is server-only: once an authz user is
    // bound, an in-session `SET spark.graft.authz.*` is a privilege-
    // escalation attempt (self-asserted identity/groups), not a conf
    // tweak. Engine/tests set identity via the conf API directly,
    // which does not produce a SetCommand, so this only fires on SQL.
    if (user.isDefined) plan.foreach {
      case sc: org.apache.spark.sql.execution.command.SetCommand =>
        sc.kv.foreach { case (k, _) =>
          if (k.startsWith("spark.graft.authz.")) {
            graft.core.Events.post(graft.core.Events.AuthzAuditEvent(
              user.get, "set", k, System.currentTimeMillis()))
            throw new SecurityException(
              s"Permission denied: [$k] is a server-managed identity conf")
          }
        }
      case _ => ()
    }
    // group membership resolved at session open (GroupProvider) and
    // published alongside the user identity
    val groups = session.conf.getOption("spark.graft.authz.groups")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // Object-level check first (reference RuleAuthorization): a denied
    // relation fails the query before any rewrite happens.
    user.foreach { u =>
      plan.foreach {
        case rel: LogicalRelation =>
          tableName(rel).foreach { t =>
            if (!AuthzPolicies.decideAccess(u, groups, t))
              denyAudited(u, "select", t)
          }
        case _ => ()
      }
      checkColumnPrivileges(u, groups, plan)
      checkWritePrivileges(u, groups, plan)
      checkFunctionPrivileges(u, groups, plan)
    }
    // Catalog-listing filtering (reference RuleReplaceShowObjectCommands):
    // SHOW TABLES must not reveal tables the user cannot select. The
    // denied set is finite (policies are opt-in per table), so the v2
    // ShowTables node gets a plain Filter on tableName and the v1
    // command a filtering wrapper — both cheaper than per-row policy
    // evaluation at execution time.
    val planShowFiltered = user match {
      case Some(u) if AuthzPolicies.hasAccessPolicies ||
          AuthzPolicies.hasFunctionPolicies =>
        filterShowObjects(u, groups, plan)
      case _ => plan
    }
    if (!(planShowFiltered eq plan)) return planShowFiltered

    val policy = user.flatMap(AuthzPolicies.policyFor(_, groups))
    if (policy.isEmpty) return plan
    val p = policy.get

    // masked columns get FRESH exprIds (reusing the relation's id makes
    // the projection look like a no-op to the optimizer, which deletes
    // it); references already resolved to the old ids are rewritten
    // below, references still unresolved bind to the new project.
    val mapping = scala.collection.mutable.Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId,
      org.apache.spark.sql.catalyst.expressions.AttributeReference]

    val withPolicies = plan.transformUp {
      case rel: LogicalRelation if rel.getTagValue(APPLIED).isEmpty &&
          tableName(rel).exists(p.touches) =>
        rel.setTagValue(APPLIED, true)
        val table = tableName(rel).get
        val parser = session.sessionState.sqlParser

        val masked: LogicalPlan = {
          val maskedCols: Seq[NamedExpression] = rel.output.map { a =>
            p.maskFor(table, a.name) match {
              case Some(maskType) =>
                val maskSql = maskType.toSql(s"`${a.name}`", a.dataType)
                // cast pins the masked value to the column's type so the
                // relation's schema is stable under any policy expression
                val alias = Alias(org.apache.spark.sql.catalyst.expressions.Cast(
                  parser.parseExpression(maskSql), a.dataType,
                  Some(session.sessionState.conf.sessionLocalTimeZone)), a.name)()
                mapping(a.exprId) = org.apache.spark.sql.catalyst.expressions.AttributeReference(
                  a.name, a.dataType, nullable = true)(alias.exprId, a.qualifier)
                alias
              case None => a
            }
          }
          if (maskedCols.exists(_.isInstanceOf[Alias])) {
            val proj = Project(maskedCols, rel)
            proj.setTagValue(MASK_PROJECT, true)
            proj
          } else rel
        }

        p.rowFilterFor(table) match {
          // filter evaluates on the UNMASKED relation (reference stage-0
          // ordering: row policy sees true values, output sees masks)
          case Some(pred) => masked match {
            case proj @ Project(cols, child) =>
              val f = Filter(parser.parseExpression(pred), child)
              f.setTagValue(INJECTED, true)
              val wrapped = Project(cols, f)
              wrapped.setTagValue(MASK_PROJECT, true)
              wrapped
            case other =>
              val f = Filter(parser.parseExpression(pred), other)
              f.setTagValue(INJECTED, true)
              f
          }
          case None => masked
        }
    }

    if (mapping.isEmpty) withPolicies else rewriteAbove(withPolicies, mapping.toMap)
  }

  /** Replace references to masked columns' old ids everywhere ABOVE the
    * injected mask projects (their subtrees keep the relation's ids).
    */
  private def rewriteAbove(
      node: LogicalPlan,
      mapping: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
        org.apache.spark.sql.catalyst.expressions.AttributeReference]): LogicalPlan = {
    if (node.getTagValue(MASK_PROJECT).isDefined) node
    else {
      val newNode = node.withNewChildren(node.children.map(rewriteAbove(_, mapping)))
      newNode.transformExpressions {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if mapping.contains(a.exprId) => mapping(a.exprId)
      }
    }
  }

  /** Db-qualified resource name (`db.table`) when the catalog knows
    * the database; bare otherwise. Policy lookups fall back to bare
    * policy keys via [[AuthzPolicies.tableMatches]] /
    * [[AuthzPolicies.Policy.rowFilterFor]].
    */
  private def tableName(rel: LogicalRelation): Option[String] =
    rel.catalogTable.map { ct =>
      ct.identifier.database match {
        case Some(db) => s"$db.${ct.identifier.table}"
        case None => ct.identifier.table
      }
    }

  /** SHOW TABLES filtering: v2 `ShowTables` nodes get a
    * `Filter(tableName NOT IN denied)` wrap (tagged to stay
    * idempotent across analyzer iterations); the v1
    * `ShowTablesCommand` (RunnableCommand, executes eagerly — a plan
    * Filter above it would not apply) is replaced by
    * [[FilteredShowTablesCommand]]. Temporary views are never
    * filtered (no table policies can name them meaningfully).
    */
  private def filterShowObjects(user: String, groups: Set[String],
      plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{In, Literal, Not}
    lazy val denied = AuthzPolicies.deniedTablesFor(user, groups)
    plan match {
      case st if st.nodeName == "ShowTables" && st.resolved &&
          st.getTagValue(APPLIED).isEmpty =>
        st.setTagValue(APPLIED, true)
        if (denied.isEmpty) plan
        else st.output.find(_.name == "tableName") match {
          case Some(attr) =>
            // the v2 listing column carries BARE names; a db-qualified
            // denied policy hides that bare name conservatively (the
            // v1 command path below matches the namespace exactly)
            Filter(Not(In(attr,
              denied.map(_.split('.').last).toSeq.sorted.map(Literal(_)))), st)
          case None => plan
        }
      case cmd: org.apache.spark.sql.execution.command.ShowTablesCommand =>
        if (denied.isEmpty) plan
        else FilteredShowTablesCommand(cmd, user, groups)
      // SHOW COLUMNS hides columns the user cannot select (reference
      // FilteredShowColumnsCommand — column-privilege granularity)
      case cmd: org.apache.spark.sql.execution.command.ShowColumnsCommand =>
        FilteredShowColumnsCommand(cmd, user, groups)
      // SHOW FUNCTIONS must not reveal functions the user cannot
      // invoke (reference FilteredShowFunctionsCommand)
      case cmd: org.apache.spark.sql.execution.command.ShowFunctionsCommand
          if AuthzPolicies.hasFunctionPolicies =>
        FilteredShowFunctionsCommand(cmd, user, groups)
      // SHOW DATABASES must not reveal databases the user cannot USE
      // (reference FilteredShowNamespaceExec — the USE accessType per
      // DATABASE resource, rule/rowfilter/FilteredShowObjectsExec.scala:43-57).
      // Spark 4 runs SHOW DATABASES as the v1 ShowNamespacesCommand;
      // it cannot be REPLACED (Catalog.listDatabases collects the node
      // from the analyzed plan, and a command child would be eagerly
      // executed), so the rows are filtered by a plain Filter above it
      // with the pre-evaluated denied IN-list — finite because only
      // explicit "use" policies participate (a table policy must not
      // hide a same-named database).
      case cmd: org.apache.spark.sql.execution.command.ShowNamespacesCommand
          if cmd.resolved && cmd.getTagValue(APPLIED).isEmpty =>
        cmd.setTagValue(APPLIED, true)
        val deniedNs = AuthzPolicies.deniedNamespacesFor(user, groups)
        if (deniedNs.isEmpty) plan
        else Filter(Not(In(cmd.output.head,
          deniedNs.toSeq.sorted.map(Literal(_)))), cmd)
      case _ => plan
    }
  }

  /** Write-side privileges — the reference PrivilegesBuilder's OUTPUT
    * privilege objects (table_command_spec.json:81,168,223,801):
    * INSERT INTO / INSERT OVERWRITE (v1 statement and v2
    * AppendData/Overwrite nodes) require "insert" on the target;
    * DROP TABLE "drop"; CREATE TABLE and CTAS "create" on the TARGET
    * (the CTAS read side is checked separately by the select rules —
    * without the create verb an allow-select user could exfiltrate
    * into a fresh, policy-less table); the ALTER TABLE family "alter";
    * TRUNCATE TABLE "update". Once any policy names a table, a verb
    * nobody allowed is denied — a read-only grant does not imply
    * write access.
    */
  private def checkWritePrivileges(user: String, groups: Set[String],
      plan: LogicalPlan): Unit = {
    if (!AuthzPolicies.hasAccessPolicies) return
    import org.apache.spark.sql.catalyst.plans.logical.{AppendData, DropTable, InsertIntoStatement, OverwriteByExpression, OverwritePartitionsDynamic}
    // An unqualified statement identifier carries NO database until
    // execution (CreateTableCommand/CreateDataSourceTable* tableDesc
    // identifiers, UnresolvedIdentifier nameParts) — it resolves
    // against the session's CURRENT database, so the checked resource
    // must be qualified with it or `USE db1; CREATE TABLE t ...`
    // bypasses a db-qualified `db1.t` create policy. Bare-named
    // legacy policies still match via tableMatches back-compat.
    lazy val currentDb = session.sessionState.catalog.getCurrentDatabase
    def qualify(parts: Seq[String]): String =
      if (parts.length >= 2) parts.takeRight(2).mkString(".")
      else s"$currentDb.${parts.last}"
    def targetName(p: LogicalPlan): Option[String] = p match {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        Some(qualify(u.multipartIdentifier))
      case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        targetName(s.child)
      case rel: LogicalRelation => tableName(rel)
      // v2 Identifier.name drops the namespace — rebuild the
      // db-qualified resource from namespace ++ name
      case r: org.apache.spark.sql.catalyst.analysis.ResolvedTable =>
        Some(qualify(r.identifier.namespace.toSeq :+ r.identifier.name))
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
        Some(qualify(u.multipartIdentifier))
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier =>
        Some(qualify(u.nameParts))
      case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier =>
        Some(qualify(r.identifier.namespace.toSeq :+ r.identifier.name))
      case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        Some(qualify(d.table.name().split('.').toSeq))
      case _ => None
    }
    def qualifyId(id: org.apache.spark.sql.catalyst.TableIdentifier): String =
      s"${id.database.getOrElse(currentDb)}.${id.table}"
    // a namespace resource is the database name itself (unqualified)
    def nsName(p: LogicalPlan): Option[String] = p match {
      case n: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace =>
        n.multipartIdentifier.lastOption
      case n: org.apache.spark.sql.catalyst.analysis.ResolvedNamespace =>
        n.namespace.lastOption
      case _ => None
    }
    def deny(t: String, verb: String): Unit = denyAudited(user, verb, t)
    def checkName(t: String, verb: String): Unit =
      if (!AuthzPolicies.decidePrivilege(user, groups, t, verb)) deny(t, verb)
    def check(target: LogicalPlan, verb: String): Unit =
      targetName(target).foreach(checkName(_, verb))
    plan.foreach {
      case ins: InsertIntoStatement => check(ins.table, "insert")
      case a: AppendData => check(a.table, "insert")
      case o: OverwriteByExpression => check(o.table, "insert")
      case o: OverwritePartitionsDynamic => check(o.table, "insert")
      case d: DropTable => check(d.child, "drop")
      // ResolveSessionCatalog rewrites session-catalog DDL to v1
      // commands before extension rules run — match both forms
      case d: org.apache.spark.sql.execution.command.DropTableCommand =>
        checkName(qualifyId(d.tableName), "drop")
      case c: org.apache.spark.sql.catalyst.plans.logical.CreateTable =>
        check(c.name, "create")
      case c: org.apache.spark.sql.catalyst.plans.logical.CreateTableAsSelect =>
        check(c.name, "create")
      // ResolveSessionCatalog rewrites session-catalog CREATE/CTAS to
      // the LEGACY v1 node (execution.datasources.CreateTable) inside
      // the resolution batch; its conversion to the v1 command happens
      // post-hoc where resolution rules never look — so this node IS
      // the session-catalog create's visible form
      case c: org.apache.spark.sql.execution.datasources.CreateTable =>
        checkName(qualifyId(c.tableDesc.identifier), "create")
      case c: org.apache.spark.sql.execution.command.CreateTableCommand =>
        checkName(qualifyId(c.table.identifier), "create")
      case c: org.apache.spark.sql.execution.command.CreateDataSourceTableCommand =>
        checkName(qualifyId(c.table.identifier), "create")
      case c: org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand =>
        checkName(qualifyId(c.table.identifier), "create")
      // namespace DDL (reference database_command_spec.json:13,56 —
      // CreateNamespace/DropNamespace privilege objects): the resource
      // is the DATABASE name itself, "create"/"drop" verbs. Matched in
      // both lifecycle forms: the catalyst v2 node while resolving and
      // the v1 command ResolveSessionCatalog rewrites it to.
      case c: org.apache.spark.sql.catalyst.plans.logical.CreateNamespace =>
        nsName(c.name).foreach(checkName(_, "create"))
      case d: org.apache.spark.sql.catalyst.plans.logical.DropNamespace =>
        nsName(d.namespace).foreach(checkName(_, "drop"))
      case c: org.apache.spark.sql.execution.command.CreateDatabaseCommand =>
        checkName(c.databaseName, "create")
      case d: org.apache.spark.sql.execution.command.DropDatabaseCommand =>
        checkName(d.databaseName, "drop")
      // view DDL (reference table_command_spec.json:1334
      // CreateViewCommand): persisted CREATE VIEW needs "create" on the
      // db-qualified view identifier — an allowed SELECT on the base
      // tables must not launder into catalog-visible DDL. TEMP views
      // are session-local, not catalog resources, and stay open (their
      // reads still expand to base-table checks). DROP VIEW is "drop"
      // (the v1 rewrite lands on DropTableCommand, covered above).
      case v: org.apache.spark.sql.execution.command.CreateViewCommand
          if v.viewType == org.apache.spark.sql.catalyst.analysis.PersistedView =>
        checkName(qualifyId(v.name), "create")
      case v: org.apache.spark.sql.catalyst.plans.logical.CreateView =>
        check(v.child, "create")
      case d: org.apache.spark.sql.catalyst.plans.logical.DropView =>
        check(d.child, "drop")
      // v2 column/property DDL shares one parent trait with a `table`
      // child — AddColumns, DropColumns, RenameColumn, AlterColumns,
      // SetTableProperties, UnsetTableProperties, ...
      case a: org.apache.spark.sql.catalyst.plans.logical.AlterTableCommand =>
        check(a.table, "alter")
      case a: org.apache.spark.sql.execution.command.AlterTableAddColumnsCommand =>
        checkName(qualifyId(a.table), "alter")
      case a: org.apache.spark.sql.execution.command.AlterTableSetPropertiesCommand =>
        checkName(qualifyId(a.tableName), "alter")
      case a: org.apache.spark.sql.execution.command.AlterTableUnsetPropertiesCommand =>
        checkName(qualifyId(a.tableName), "alter")
      case a: org.apache.spark.sql.execution.command.AlterTableRenameCommand =>
        checkName(qualifyId(a.oldName), "alter")
      case t: org.apache.spark.sql.catalyst.plans.logical.TruncateTable =>
        check(t.table, "update")
      case t: org.apache.spark.sql.execution.command.TruncateTableCommand =>
        checkName(qualifyId(t.tableName), "update")
      case _ => ()
    }
  }

  /** Function-level privilege (reference function_command_spec.json —
    * Ranger gates udf invocation like table access): every function
    * the query references must pass
    * [[AuthzPolicies.decideFunctionAccess]]. Functions are checked in
    * BOTH lifecycle states — by name while still
    * `UnresolvedFunction` (early analyzer fixpoint iterations) and by
    * `prettyName` once resolved to a concrete expression — because an
    * extension rule can meet either form depending on iteration
    * order. Policy-injected nodes (masks, row filters) are exempt: a
    * mask may legitimately call a function the user cannot.
    */
  private def checkFunctionPrivileges(user: String, groups: Set[String],
      plan: LogicalPlan): Unit = {
    if (!AuthzPolicies.hasFunctionPolicies) return
    def checkFn(name: String): Unit =
      if (!AuthzPolicies.decideFunctionAccess(user, groups, name))
        denyAudited(user, "select", s"function/$name")
    plan.foreach { node =>
      val exempt = node.getTagValue(MASK_PROJECT).isDefined ||
        node.getTagValue(INJECTED).isDefined
      if (!exempt) node.expressions.foreach(_.foreach {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
          checkFn(f.nameParts.last)
        case f: org.apache.spark.sql.catalyst.expressions.ScalaUDF =>
          f.udfName.foreach(checkFn)
        case e: org.apache.spark.sql.catalyst.expressions.Expression
            if e.resolved && !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] &&
              !e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute] =>
          checkFn(e.prettyName)
        case _ => ()
      })
    }
  }

  /** Column-granular SELECT privilege: every column of every relation
    * that the query actually REFERENCES (the reference's
    * PrivilegesBuilder plan walk — one privilege object per referenced
    * column) must pass [[AuthzPolicies.decideColumnAccess]]. Star
    * expansion is covered for free: by the time this rule sees the
    * plan the analyzer has expanded `*` into explicit attribute
    * references. Expressions the AUTHZ rewrite itself injected (mask
    * expressions, row-filter predicates — tagged nodes) are exempt:
    * a row filter may legitimately consult a column the user cannot
    * select, Ranger's filter-evaluates-on-true-values semantics.
    */
  private def checkColumnPrivileges(user: String, groups: Set[String],
      plan: LogicalPlan): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, ExprId}
    if (!AuthzPolicies.hasAccessPolicies) return // no policies: nothing can deny
    val tables = scala.collection.mutable.Map.empty[ExprId, (String, String)]
    plan.foreach {
      case rel: LogicalRelation =>
        tableName(rel).foreach { t =>
          rel.output.foreach(a => tables(a.exprId) = (t, a.name))
        }
      case _ => ()
    }
    if (tables.isEmpty) return
    val used = scala.collection.mutable.Set.empty[ExprId]
    plan.foreach { node =>
      // leaf scans carry their own output attribute list as
      // `expressions` — producing a column is not referencing it
      val injected = node.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode] ||
        node.getTagValue(MASK_PROJECT).isDefined ||
        node.getTagValue(INJECTED).isDefined
      if (!injected) node.expressions.foreach(_.foreach {
        case a: AttributeReference => used += a.exprId
        case _ => ()
      })
    }
    // a bare `SELECT * FROM t`-shaped plan may surface columns only
    // through its output (no referencing expression above the scan);
    // output is only well-defined once resolved — the analyzer's final
    // fixpoint pass re-runs this rule on the fully-resolved plan
    if (plan.resolved) plan.output.foreach(a => used += a.exprId)
    used.foreach { id =>
      tables.get(id).foreach { case (t, c) =>
        if (!AuthzPolicies.decideColumnAccess(user, groups, t, c))
          denyAudited(user, "select", s"$t.$c")
      }
    }
  }
}

/** The v1 SHOW TABLES command with denied tables filtered out of its
  * result rows (reference FilteredShowTablesCommand,
  * kyuubi-spark-authz/.../rule/rowfilter/RuleReplaceShowObjectCommands.scala:48-64
  * — same outcome, our policy store instead of the Ranger plugin).
  * Row layout: (namespace, tableName, isTemporary[, information]).
  */
/** SHOW COLUMNS with per-column SELECT privilege filtering (reference
  * FilteredShowColumnsCommand — a denied column must not appear in
  * the listing any more than in a star expansion).
  */
final case class FilteredShowColumnsCommand(
    delegated: org.apache.spark.sql.execution.command.ShowColumnsCommand,
    user: String,
    groups: Set[String])
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    delegated.output

  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] = {
    val id = delegated.tableName
    val table = id.database.map(d => s"$d.${id.table}").getOrElse(id.table)
    delegated.run(spark).filter(r =>
      AuthzPolicies.decideColumnAccess(user, groups, table, r.getString(0)))
  }
}

/** SHOW FUNCTIONS with function-privilege filtering (reference
  * FilteredShowFunctionsCommand): a function the user cannot invoke
  * does not appear in the listing. Row layout: (function).
  */
final case class FilteredShowFunctionsCommand(
    delegated: org.apache.spark.sql.execution.command.RunnableCommand,
    user: String,
    groups: Set[String])
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    delegated.output

  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] =
    delegated.run(spark).filter { r =>
      val fn = r.getString(0).split('.').last
      AuthzPolicies.decideFunctionAccess(user, groups, fn)
    }
}

final case class FilteredShowTablesCommand(
    delegated: org.apache.spark.sql.execution.command.RunnableCommand,
    user: String,
    groups: Set[String])
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {

  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    delegated.output

  override def run(spark: SparkSession): Seq[org.apache.spark.sql.Row] =
    delegated.run(spark).filter { r =>
      val ns = r.getString(0)
      val table = r.getString(1)
      val isTemp = r.getBoolean(2)
      // db-qualified resource when the listing knows the namespace, so
      // a `db1.t` policy hides db1's t but not db2's
      val resource = if (ns != null && ns.nonEmpty) s"$ns.$table" else table
      isTemp || AuthzPolicies.decideAccess(user, groups, resource)
    }
}
