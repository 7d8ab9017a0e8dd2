package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Engine

class AuthzSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def withTable(f: => Unit): Unit = {
    spark.sql("DROP TABLE IF EXISTS graft_authz_t")
    spark.sql("CREATE TABLE graft_authz_t (id INT, name STRING, region STRING) USING parquet")
    spark.sql("""INSERT INTO graft_authz_t VALUES
      (1, 'alice', 'eu'), (2, 'bob', 'us'), (3, 'carol', 'eu'), (4, 'dave', 'us')""")
    try f
    finally {
      spark.sql("DROP TABLE IF EXISTS graft_authz_t")
      AuthzPolicies.clear()
    }
  }

  test("row filter restricts per-user visibility; masking rewrites columns") {
    withTable {
      AuthzPolicies.setPolicy("restricted", AuthzPolicies.Policy(
        rowFilters = Map("graft_authz_t" -> "region = 'eu'"),
        masks = Map(("graft_authz_t", "name") -> "concat(substring(name, 1, 1), '***')")))

      val engine = new Engine(spark)
      val restricted = engine.openSession("restricted")
      val rows = restricted.spark.sql(
        "SELECT id, name FROM graft_authz_t ORDER BY id").collect()
      assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3), "row filter must keep only eu rows")
      assert(rows.map(_.getString(1)).toSeq == Seq("a***", "c***"), "mask must rewrite name")

      // a user with no policy sees everything unmasked
      val open = engine.openSession("open")
      assert(open.spark.sql("SELECT count(*) FROM graft_authz_t").head().getLong(0) == 4)
      assert(open.spark.sql("SELECT name FROM graft_authz_t WHERE id = 2").head().getString(0) == "bob")
    }
  }

  test("masked columns stay joinable/aggregable (exprIds preserved)") {
    withTable {
      AuthzPolicies.setPolicy("masked2", AuthzPolicies.Policy(
        masks = Map(("graft_authz_t", "name") -> "'x'")))
      val sess = new Engine(spark).openSession("masked2")
      val agg = sess.spark.sql(
        """SELECT name, count(*) AS n FROM graft_authz_t GROUP BY name""").collect()
      assert(agg.length == 1 && agg.head.getString(0) == "x" && agg.head.getLong(1) == 4)
    }
  }

  test("row filter sees true values even when the filtered column is masked") {
    withTable {
      AuthzPolicies.setPolicy("both", AuthzPolicies.Policy(
        rowFilters = Map("graft_authz_t" -> "name = 'bob'"),
        masks = Map(("graft_authz_t", "name") -> "'hidden'")))
      val sess = new Engine(spark).openSession("both")
      val rows = sess.spark.sql("SELECT id, name FROM graft_authz_t").collect()
      assert(rows.length == 1 && rows.head.getInt(0) == 2 && rows.head.getString(1) == "hidden")
    }
  }
}
