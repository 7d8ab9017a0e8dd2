package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("attaches the latest right row at-or-before each left time, per key") {
    val left = Seq(
      ("u1", 5L, "l_a"), ("u1", 15L, "l_b"), ("u1", 2L, "l_early"),
      ("u2", 10L, "l_c")).toDF("k", "t", "lv")
    val right = Seq(
      ("u1", 3L, "r1"), ("u1", 10L, "r2"),
      ("u2", 99L, "r_late")).toDF("k", "t", "rv")
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("rv"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> Option(r.getString(3))).toMap
    assert(got(("u1", 5L)) == Some("r1"))   // 3 <= 5 < 10
    assert(got(("u1", 15L)) == Some("r2"))  // latest before 15 is 10
    assert(got(("u1", 2L)) == None)         // nothing at-or-before 2
    assert(got(("u2", 10L)) == None)        // u2's right row is later
  }

  test("equal timestamps match inclusively") {
    val left = Seq(("k", 10L, "l")).toDF("k", "t", "lv")
    val right = Seq(("k", 10L, "same_t")).toDF("k", "t", "rv")
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("rv")).collect()
    assert(got.head.getString(3) == "same_t")
  }

  test("keys never leak across partitions and multiple right cols attach") {
    val left = Seq(("a", 5L), ("b", 5L)).toDF("k", "t")
    val right = Seq(("a", 1L, 100L, "x")).toDF("k", "t", "id", "tag")
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got("a") == ((Some(100L), Some("x"))))
    assert(got("b") == ((None, None)))
  }

  test("plan is a single window walk, not a range join") {
    val left = Seq(("k", 5L, "l")).toDF("k", "t", "lv")
    val right = Seq(("k", 3L, "r")).toDF("k", "t", "rv")
    val plan = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join must not plan a product join:\n${plan.take(500)}")
    assert(plan.contains("Window"), "expected the window-walk plan")
  }
}
