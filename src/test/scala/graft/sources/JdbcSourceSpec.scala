package graft.sources

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** External-RDBMS access through Spark's JDBC source — the capability
  * the reference ships a whole JDBC engine for
  * (externals/kyuubi-jdbc-engine), covered Spark-first: `spark.read
  * .format("jdbc")` handles dialects, predicate pushdown and partitioned
  * reads, and the result is a plain DataFrame inside the same session —
  * joinable against parquet/hive/generator tables. Embedded Derby plays
  * the external database.
  */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val url: String = {
    val dir = Files.createTempDirectory("graft-jdbc").toAbsolutePath
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val u = s"jdbc:derby:$dir/extdb;create=true"
    val c = DriverManager.getConnection(u)
    val st = c.createStatement()
    st.execute("CREATE TABLE ext_dim (id INT PRIMARY KEY, name VARCHAR(32), score DOUBLE)")
    st.execute("INSERT INTO ext_dim VALUES (1,'alpha',1.5),(2,'beta',2.5),(3,'gamma',3.5)")
    st.close(); c.close()
    u
  }

  private def extDim = spark.read.format("jdbc")
    .option("url", url)
    .option("dbtable", "ext_dim")
    .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    .load()

  test("reads an external RDBMS table with the right schema") {
    val got = extDim.orderBy(col("ID")).collect()
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(got.map(_.getString(1)).toSeq == Seq("alpha", "beta", "gamma"))
  }

  test("filters push down to the database") {
    val q = extDim.filter(col("ID") > 1)
    assert(q.count() == 2)
    // PushedFilters must reach the JDBC scan node.
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"filter not pushed to JDBC scan:\n${plan.take(400)}")
  }

  test("external table joins against an engine-native table") {
    import spark.implicits._
    val local = Seq((1, 10L), (2, 20L), (9, 90L)).toDF("id", "v")
    val ext = extDim
    val got = local.join(ext, local("id") === ext("ID"))
      .select(local("id"), col("name"), col("v"))
      .orderBy(local("id")).collect()
    assert(got.length == 2)
    assert(got.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "alpha"), (2, "beta")))
  }

  test("engine sessions can query the external source via SQL") {
    extDim.createOrReplaceTempView("ext_dim_v")
    val rows = spark.sql("SELECT count(*) AS n, sum(score) AS s FROM ext_dim_v").head()
    assert(rows.getLong(0) == 3L && math.abs(rows.getDouble(1) - 7.5) < 1e-9)
  }
}
