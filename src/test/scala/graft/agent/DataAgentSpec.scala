package graft.agent

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Engine

class DataAgentSpec extends AnyFunSuite {
  import DataAgent._

  private lazy val engine = new Engine(SparkFixture.spark)

  private def newSession() = {
    val sess = engine.openSession("agent-user")
    sess.spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW agent_nation AS " +
        s"SELECT * FROM parquet.`${SparkFixture.sfDir}/nation.parquet`")
    sess
  }

  /** A scripted policy: plays a fixed action list, then answers with
    * the last observation.
    */
  private final class Scripted(steps: List[AgentAction]) extends AgentPolicy {
    override def next(task: String, history: Seq[AgentEvent]): (String, AgentAction) =
      steps.drop(history.size) match {
        case a :: _ => (s"step ${history.size}", a)
        case Nil => ("done", FinalAnswer(history.lastOption.map(_.observation).getOrElse("")))
      }
  }

  test("ReAct loop: discover schema, query, grep, answer") {
    val agent = new ReactAgent(newSession(), new Scripted(List(
      UseTool("list_tables", Map.empty),
      UseTool("describe_table", Map("table" -> "agent_nation")),
      UseTool("run_select_query", Map("sql" ->
        "SELECT n_name, n_regionkey FROM agent_nation ORDER BY n_name")),
      UseTool("grep_tool_output", Map("handle" -> "out-1", "pattern" -> "NATION_1\\t")))))
    val result = agent.run("which region is NATION_1 in?")
    assert(result.finished)
    val events = result.events
    assert(events(0).observation.contains("agent_nation"))
    assert(events(1).observation.contains("n_name\tstring"))
    assert(events(2).observation.startsWith("handle=out-1 rows=25"))
    assert(result.answer.get.trim.matches("NATION_1\\t\\d+"))
  }

  test("read-only checker rejects mutations by plan shape, not regex") {
    val spark = newSession().spark
    assert(SqlReadOnlyChecker.isReadOnly(spark, "SELECT 1"))
    assert(SqlReadOnlyChecker.isReadOnly(spark,
      "SELECT '  DROP TABLE x  ' AS s")) // mutation text in a literal is fine
    assert(!SqlReadOnlyChecker.isReadOnly(spark, "DROP TABLE agent_nation"))
    assert(!SqlReadOnlyChecker.isReadOnly(spark,
      "INSERT INTO t SELECT * FROM agent_nation"))
    assert(!SqlReadOnlyChecker.isReadOnly(spark, "CREATE TABLE t (x INT) USING parquet"))
  }

  test("select tool refuses a mutation; mutation tool is gated") {
    val agent = new ReactAgent(newSession(), new Scripted(List(
      UseTool("run_select_query", Map("sql" -> "DROP TABLE agent_nation")),
      UseTool("run_mutation_query", Map("sql" -> "DROP VIEW agent_nation")))))
    val result = agent.run("try to drop things")
    assert(result.events(0).observation.contains("not read-only"))
    assert(result.events(1).observation.contains("mutation tool disabled"))
    // the view survived both attempts
    assert(result.answer.isDefined)
  }

  test("tool-output paging reads beyond the preview") {
    val agent = new ReactAgent(newSession(), new Scripted(List(
      UseTool("run_select_query", Map("sql" ->
        "SELECT id FROM range(100) ORDER BY id")),
      // line 0 of a stored query output is the header row
      UseTool("read_tool_output", Map("handle" -> "out-1", "offset" -> "91", "limit" -> "5")))))
    val result = agent.run("page")
    assert(result.events(0).observation.contains("rows=100"))
    assert(result.events(0).observation.contains("more rows"))
    assert(result.answer.get.linesIterator.toSeq == Seq("90", "91", "92", "93", "94"))
  }

  test("iteration cap stops a non-terminating policy") {
    val looping = new AgentPolicy {
      override def next(task: String, history: Seq[AgentEvent]): (String, AgentAction) =
        ("again", UseTool("list_tables", Map.empty))
    }
    val result = new ReactAgent(newSession(), looping, maxIterations = 3).run("loop")
    assert(!result.finished && result.events.size == 3)
  }

  test("unknown tools observe an error instead of crashing the loop") {
    val agent = new ReactAgent(newSession(), new Scripted(List(
      UseTool("no_such_tool", Map.empty))))
    val result = agent.run("x")
    assert(result.events(0).observation.contains("unknown tool"))
    assert(result.finished)
  }
}
