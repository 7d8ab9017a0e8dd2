package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class ExecLangSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val engine = new Engine(spark)

  test("ExecuteScala: DataFrame-valued snippets become results, state persists") {
    val sess = engine.openSession("scala-user")
    val interp = new ScalaInterpreter(sess)
    try {
      val r1 = interp.interpret("val n = 21")
      assert(r1.isLeft)
      val r2 = interp.interpret("spark.range(n * 2).toDF")
      assert(r2.isRight, s"expected DataFrame result, got $r2")
      assert(r2.toOption.get.count() == 42)
      intercept[RuntimeException] { interp.interpret("this does not compile") }
      // interpreter survives an error
      assert(interp.interpret("spark.range(1).toDF").isRight)
    } finally interp.close()
  }

  test("ExecutePython: cells run, sql() calls back into the engine") {
    assume(PythonWorker.available(), "python3 not on PATH")
    val sess = engine.openSession("py-user")
    val worker = new PythonWorker(sess)
    try {
      assert(worker.run("print(2 + 3)").trim == "5")
      worker.run("x = [i * i for i in range(5)]")
      assert(worker.run("print(sum(x))").trim == "30")
      val out = worker.run(
        "rows = sql('SELECT 7 AS seven')\nprint(rows[0]['seven'])")
      assert(out.trim == "7", s"sql() round-trip output: '$out'")
      intercept[RuntimeException] { worker.run("raise ValueError('boom')") }
      assert(worker.run("print('alive')").trim == "alive")
    } finally worker.close()
  }
}
