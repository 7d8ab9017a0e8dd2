package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class DebugWritePlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("debug: print executed plan of a v1 parquet write under AQE") {
    @volatile var captured: List[(String, QueryExecution)] = Nil
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, d: Long): Unit =
        captured ::= (funcName, qe)
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val dir = Files.createTempDirectory("graft_dbg").toString + "/t"
      spark.conf.set("spark.graft.removeRebalanceShuffle", "true")
      spark.range(0, 1000).repartition(8).write.parquet(dir)
      Thread.sleep(3000)
      captured.foreach { case (fn, qe) =>
        println(s"=== funcName=$fn")
        println("--- optimizedPlan:\n" + qe.optimizedPlan.treeString.take(3000))
        println("--- executedPlan:\n" + qe.executedPlan.treeString.take(5000))
      }
    } finally {
      spark.conf.unset("spark.graft.removeRebalanceShuffle")
      spark.listenerManager.unregister(l)
    }
  }
}
