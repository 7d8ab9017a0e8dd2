package graft.agent

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.util.matching.Regex

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

import graft.core.EngineSession

/** A data-agent runtime over the graft engine — the Spark-first
  * re-expression of the reference's LLM data-agent engine
  * (externals/kyuubi-data-agent-engine: runtime/ReactAgent.java:57-170,
  * tool/sql/RunSelectQueryTool.java, SqlReadOnlyChecker, and the
  * Read/GrepToolOutput tools).
  *
  * The ReAct loop, tool registry, read-only enforcement and
  * tool-output paging are deterministic engine code; the model is a
  * pluggable [[AgentPolicy]] (the reference calls an LLM chat API
  * there — in-repo tests script it, production wires a real client).
  *
  * Read-only enforcement is PLAN-based, not regex-based: the statement
  * is parsed by Spark's own parser and rejected if any node is a
  * `Command`/`InsertIntoStatement` — comments or string literals can't
  * smuggle a mutation past it, and new DDL forms are covered by
  * construction.
  */
object DataAgent {

  // --- policy (the model seam) ----------------------------------------------
  sealed trait AgentAction
  /** Invoke `tool` with `args`; the observation is appended to history. */
  final case class UseTool(tool: String, args: Map[String, String]) extends AgentAction
  /** Terminate with an answer. */
  final case class FinalAnswer(text: String) extends AgentAction

  final case class AgentEvent(thought: String, action: AgentAction, observation: String)

  trait AgentPolicy {
    /** Decide the next action given the task and the events so far. */
    def next(task: String, history: Seq[AgentEvent]): (String, AgentAction)
  }

  // --- tools ----------------------------------------------------------------
  trait Tool {
    def name: String
    def description: String
    def invoke(ctx: AgentContext, args: Map[String, String]): String
  }

  /** Shared run state: the session to execute against plus the
    * tool-output store (large results are referenced by handle and
    * paged/grepped, never inlined into the transcript — the
    * reference's ToolOutput design).
    */
  final class AgentContext(val session: EngineSession) {
    private val outputs = new ConcurrentHashMap[String, Array[String]]()
    private val counter = new AtomicInteger()

    def store(lines: Array[String]): String = {
      val handle = s"out-${counter.incrementAndGet()}"
      outputs.put(handle, lines)
      handle
    }
    def fetch(handle: String): Option[Array[String]] = Option(outputs.get(handle))
  }

  /** Plan-based read-only check (ref tool/sql/SqlReadOnlyChecker). */
  object SqlReadOnlyChecker {
    def isReadOnly(spark: SparkSession, statement: String): Boolean = {
      val plan: LogicalPlan = spark.sessionState.sqlParser.parsePlan(statement)
      !plan.exists {
        case _: Command => true
        case _: InsertIntoStatement => true
        case _ => false
      }
    }
  }

  private val previewRows = 20

  /** SELECT-only SQL: refuses mutations, returns a preview + an output
    * handle for paging (ref RunSelectQueryTool).
    */
  object RunSelectQuery extends Tool {
    val name = "run_select_query"
    val description = "Run a read-only SQL query; returns row preview and an output handle"
    def invoke(ctx: AgentContext, args: Map[String, String]): String = {
      val sql = args.getOrElse("sql", return "error: missing 'sql' argument")
      if (!SqlReadOnlyChecker.isReadOnly(ctx.session.spark, sql))
        return s"error: statement is not read-only (rejected by plan check)"
      val df = ctx.session.spark.sql(sql)
      val header = df.columns.mkString("\t")
      val rows = df.collect().map(_.toSeq.map(String.valueOf).mkString("\t"))
      val handle = ctx.store(header +: rows)
      val preview = (header +: rows.take(previewRows)).mkString("\n")
      s"handle=$handle rows=${rows.length}\n$preview" +
        (if (rows.length > previewRows) s"\n... (${rows.length - previewRows} more rows; read_tool_output)" else "")
    }
  }

  /** Mutating SQL, only when the agent was constructed with
    * `allowMutation = true` (ref RunMutationQueryTool).
    */
  final class RunMutationQuery(allow: Boolean) extends Tool {
    val name = "run_mutation_query"
    val description = "Run a mutating SQL statement (disabled unless the agent allows writes)"
    def invoke(ctx: AgentContext, args: Map[String, String]): String = {
      if (!allow) return "error: mutation tool disabled for this agent"
      val sql = args.getOrElse("sql", return "error: missing 'sql' argument")
      ctx.session.spark.sql(sql)
      "ok"
    }
  }

  /** Page through a stored tool output (ref ReadToolOutputTool). */
  object ReadToolOutput extends Tool {
    val name = "read_tool_output"
    val description = "Read lines [offset, offset+limit) of a stored tool output"
    def invoke(ctx: AgentContext, args: Map[String, String]): String = {
      val handle = args.getOrElse("handle", return "error: missing 'handle'")
      val offset = args.getOrElse("offset", "0").toInt
      val limit = args.getOrElse("limit", "100").toInt
      ctx.fetch(handle) match {
        case Some(lines) => lines.slice(offset, offset + limit).mkString("\n")
        case None => s"error: no such output $handle"
      }
    }
  }

  /** Regex-filter a stored tool output (ref GrepToolOutputTool). */
  object GrepToolOutput extends Tool {
    val name = "grep_tool_output"
    val description = "Filter a stored tool output's lines by regex"
    def invoke(ctx: AgentContext, args: Map[String, String]): String = {
      val handle = args.getOrElse("handle", return "error: missing 'handle'")
      val pattern = args.getOrElse("pattern", return "error: missing 'pattern'")
      val re = new Regex(pattern)
      ctx.fetch(handle) match {
        case Some(lines) => lines.filter(l => re.findFirstIn(l).isDefined).mkString("\n")
        case None => s"error: no such output $handle"
      }
    }
  }

  /** Schema discovery tools backed by the session catalog. */
  object ListTables extends Tool {
    val name = "list_tables"
    val description = "List tables and temp views visible to this session"
    def invoke(ctx: AgentContext, args: Map[String, String]): String =
      ctx.session.spark.catalog.listTables()
        .collect().map(t => s"${t.name}\t${t.tableType}").sorted.mkString("\n")
  }

  object DescribeTable extends Tool {
    val name = "describe_table"
    val description = "Describe a table's columns and types"
    def invoke(ctx: AgentContext, args: Map[String, String]): String = {
      val table = args.getOrElse("table", return "error: missing 'table'")
      ctx.session.spark.table(table).schema.fields
        .map(f => s"${f.name}\t${f.dataType.simpleString}").mkString("\n")
    }
  }

  final case class AgentResult(answer: Option[String], events: Seq[AgentEvent]) {
    def finished: Boolean = answer.isDefined
  }
}

/** The ReAct loop (ref runtime/ReactAgent.java:57-170): policy decides
  * an action, tools observe, until FinalAnswer or `maxIterations`
  * (:137 — the runaway guard).
  */
final class ReactAgent(
    session: EngineSession,
    policy: DataAgent.AgentPolicy,
    maxIterations: Int = 10,
    allowMutation: Boolean = false) {

  import DataAgent._

  private val ctx = new AgentContext(session)
  private val tools: Map[String, Tool] =
    Seq(RunSelectQuery, new RunMutationQuery(allowMutation), ReadToolOutput,
      GrepToolOutput, ListTables, DescribeTable).map(t => t.name -> t).toMap

  def toolNames: Set[String] = tools.keySet

  def run(task: String): AgentResult = {
    var history = Vector.empty[AgentEvent]
    var i = 0
    while (i < maxIterations) {
      val (thought, action) = policy.next(task, history)
      action match {
        case FinalAnswer(text) =>
          return AgentResult(Some(text), history :+ AgentEvent(thought, action, ""))
        case UseTool(name, args) =>
          val obs = tools.get(name) match {
            case Some(tool) =>
              try tool.invoke(ctx, args)
              catch { case e: Throwable => s"error: ${e.getMessage}" }
            case None => s"error: unknown tool $name (have: ${tools.keys.mkString(", ")})"
          }
          history = history :+ AgentEvent(thought, action, obs)
      }
      i += 1
    }
    AgentResult(None, history) // iteration cap hit without an answer
  }
}
