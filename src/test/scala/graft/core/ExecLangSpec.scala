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

  test("ExecutePython: DataFrame proxy runs real Dataset ops from Python") {
    assume(PythonWorker.available(), "python3 not on PATH")
    val sess = engine.openSession("py-df-user")
    sess.spark.range(0, 20).createOrReplaceTempView("py_nums")
    sess.spark.sql(
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS par FROM range(20)")
      .createOrReplaceTempView("py_tags")
    val worker = new PythonWorker(sess)
    try {
      // lazy chain built in Python, executed by the JVM Dataset API
      worker.run("df = table('py_nums').filter('id >= 10').select('id')")
      assert(worker.run("print(df.count())").trim == "10")
      // join + groupBy().agg + orderBy + collect round-trip
      val out = worker.run(
        """joined = table('py_nums').join(table('py_tags'), 'id')
          |agged = joined.groupBy('par').agg('count(*) AS n', 'sum(id) AS total')
          |for r in agged.orderBy('par').collect():
          |    print(r['par'], r['n'], r['total'])""".stripMargin)
      assert(out.trim.linesIterator.toSeq == Seq("even 10 90", "odd 10 100"), out)
      // withColumn + limit
      val out2 = worker.run(
        """small = table('py_nums').withColumn('sq', 'id * id').orderBy('id').limit(3)
          |print([r['sq'] for r in small.collect()])""".stripMargin)
      assert(out2.trim == "[0, 1, 4]", out2)
      // plan errors surface as Python exceptions, worker stays alive
      intercept[RuntimeException] { worker.run("table('no_such_table_xyz').count()") }
      assert(worker.run("print(df.count())").trim == "10")
    } finally worker.close()
  }

  test("ExecutePython: a REAL pyspark session attaches over the py4j gateway") {
    assume(PythonWorker.available(), "python3 not on PATH")
    assume(PythonWorker.pysparkUsable, "pyspark/py4j not importable by python3")
    val sess = engine.openSession("py-real-user")
    sess.spark.sql("SELECT 123 AS marker").createOrReplaceTempView("py_real_view")
    val worker = new PythonWorker(sess)
    try {
      // the prelude must have attached a real pyspark SparkSession
      assert(worker.run("print(type(spark).__name__)").trim == "SparkSession")
      // full pyspark DataFrame API against the ENGINE's JVM context
      val out = worker.run(
        """from pyspark.sql import functions as F
          |print(spark.range(10).agg(F.sum('id').alias('t')).collect()[0]['t'])""".stripMargin)
      assert(out.trim == "45", out)
      // python sees THIS session's temp views (session-scoped wrap)
      val out2 = worker.run("print(spark.table('py_real_view').collect()[0]['marker'])")
      assert(out2.trim == "123", out2)
      // pyspark errors surface and the worker survives them
      intercept[RuntimeException] {
        worker.run("spark.table('definitely_missing_xyz').collect()")
      }
      assert(worker.run("print(spark.range(3).count())").trim == "3")
    } finally worker.close()
  }
}
