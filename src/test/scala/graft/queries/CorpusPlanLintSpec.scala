package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Plan lint over the ENTIRE TPC-H + TPC-DS corpus: the 100 TB
  * guardrails that hold regardless of scale factor.
  *
  *  - No `CartesianProductExec` anywhere, and broadcast nested-loop
  *    joins only in the four queries that cross single-row aggregate
  *    subqueries (q28/q61/q88/q90). A nested-loop between real tables
  *    is a scale disaster a tiny-sf golden test can't see.
  *  - Every query's plan must contain at least one pushed generator
  *    scan — confirming the corpus actually runs against the DSv2
  *    catalogs, not an accidental local relation.
  */
class CorpusPlanLintSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkFixture.spark
    s.conf.set("spark.sql.catalog.tpch", classOf[graft.sources.tpch.TpchCatalog].getName)
    s.conf.set("spark.sql.catalog.tpcds", classOf[graft.sources.tpcds.TpcdsCatalog].getName)
    s
  }

  /** Queries whose spec SQL intentionally multiplies SINGLE-ROW
    * aggregate subqueries — the only shapes where a nested-loop cross
    * is scale-safe. Everything else must plan hash/sort-merge joins.
    */
  private val nestedLoopAllowed: Set[String] = Set(
    "tpcds_q61", // promotional_sales x all_sales (both single-row aggregates)
    "tpcds_q90", // am x pm single-row counts
    "tpcds_q28", // six single-row bucket aggregates
    "tpcds_q88"  // eight single-row time-slot counts
  )

  private def collectAll(plan: SparkPlan): Seq[SparkPlan] = {
    val self = plan match {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case p => Seq(p)
    }
    self ++ plan.children.flatMap(collectAll) ++
      plan.subqueries.flatMap(collectAll)
  }

  private def lint(name: String, sql: String): Option[String] = {
    val plan = spark.sql(sql).queryExecution.executedPlan
    val nodes = collectAll(plan)
    if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
      return Some(s"$name: CartesianProductExec in plan")
    val bnlj = nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])
    if (bnlj && !nestedLoopAllowed(name))
      return Some(s"$name: BroadcastNestedLoopJoinExec in plan (not allowlisted)")
    val scans = nodes.count(n => n.nodeName.contains("BatchScan"))
    if (scans == 0)
      return Some(s"$name: no DSv2 BatchScan in plan")
    None
  }

  test("TPC-H corpus plans: no unexpected cartesian products, DSv2 scans present") {
    val problems = TpchCorpusSql.queries("tpch.tiny").flatMap { case (n, sql) =>
      lint(s"tpch_$n", sql)
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("TPC-DS corpus plans: no unexpected cartesian products, DSv2 scans present") {
    val problems = TpcdsCorpusSql.queries("tpcds.tiny").flatMap { case (n, sql) =>
      lint(s"tpcds_$n", sql)
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
