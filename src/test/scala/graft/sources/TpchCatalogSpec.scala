package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.queries.TpchCatalogQueries
import graft.sources.tpch.{TpchCatalog, TpchGen}

/** Generator-catalog correctness: spec row counts, key integrity,
  * determinism (two scans of generated data hash identically — the
  * property the reference asserts for its connector via golden hashes,
  * TPCDSQuerySuite.scala:44-80), statistics reporting, column pruning,
  * and the 8 catalog-only TPC-H corpus queries.
  */
class TpchCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    s.conf.set("spark.sql.catalog.tpch", classOf[TpchCatalog].getName)
    s
  }

  test("fixed tables have spec row counts and values") {
    assert(spark.sql("SELECT count(*) FROM tpch.tiny.region").head().getLong(0) == 5)
    assert(spark.sql("SELECT count(*) FROM tpch.tiny.nation").head().getLong(0) == 25)
    val brazil = spark.sql("SELECT n_regionkey FROM tpch.tiny.nation WHERE n_name = 'BRAZIL'").head().getInt(0)
    assert(brazil == 1) // AMERICA
  }

  test("scaled tables have spec-proportional row counts") {
    assert(spark.sql("SELECT count(*) FROM tpch.tiny.supplier").head().getLong(0) == 100)
    assert(spark.sql("SELECT count(*) FROM tpch.tiny.part").head().getLong(0) == 2000)
    assert(spark.sql("SELECT count(*) FROM tpch.tiny.partsupp").head().getLong(0) == 8000)
    assert(spark.sql("SELECT count(*) FROM tpch.tiny.customer").head().getLong(0) == 1500)
    assert(spark.sql("SELECT count(*) FROM tpch.tiny.orders").head().getLong(0) == 15000)
    val li = spark.sql("SELECT count(*) FROM tpch.tiny.lineitem").head().getLong(0)
    assert(li > 15000 * 2 && li < 15000 * 8, s"lineitem count $li out of 1-7 lines/order range")
  }

  test("key integrity: FKs land in range, partsupp suppliers distinct per part") {
    val badLines = spark.sql(
      """SELECT count(*) FROM tpch.tiny.lineitem
         WHERE l_partkey < 1 OR l_partkey > 2000 OR l_suppkey < 1 OR l_suppkey > 100""").head().getLong(0)
    assert(badLines == 0)
    val noCust3 = spark.sql(
      "SELECT count(*) FROM tpch.tiny.orders WHERE o_custkey % 3 = 0").head().getLong(0)
    assert(noCust3 == 0, "spec: custkey never ≡ 0 (mod 3)")
    val dupSupp = spark.sql(
      """SELECT count(*) FROM (
           SELECT ps_partkey FROM tpch.tiny.partsupp
           GROUP BY ps_partkey HAVING count(DISTINCT ps_suppkey) < 4)""").head().getLong(0)
    assert(dupSupp == 0, "each part must have 4 distinct suppliers")
  }

  test("orders/lineitem are mutually consistent (totalprice from its lines)") {
    val mismatches = spark.sql(
      """SELECT count(*) FROM tpch.tiny.orders o
         JOIN (SELECT l_orderkey,
                 sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,2))) AS recomputed
               FROM tpch.tiny.lineitem GROUP BY l_orderkey) l
           ON o_orderkey = l_orderkey
         WHERE abs(o_totalprice - recomputed) > 0.5""").head().getLong(0)
    // per-line half-up cent rounding vs decimal arithmetic: within a few cents
    assert(mismatches == 0, s"$mismatches orders disagree with their lines")
  }

  test("generation is deterministic across scans") {
    val h1 = spark.sql("SELECT sum(hash(*)) FROM tpch.tiny.lineitem").head().getLong(0)
    val h2 = spark.sql("SELECT sum(hash(*)) FROM tpch.tiny.lineitem").head().getLong(0)
    assert(h1 == h2)
  }

  test("scan reports statistics and prunes columns") {
    val df = spark.sql("SELECT l_orderkey FROM tpch.tiny.lineitem")
    val scan = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(scan.isDefined)
    val stats = scan.get.computeStats()
    assert(stats.sizeInBytes > 0)
    assert(scan.get.scan.readSchema().fieldNames.toSeq == Seq("l_orderkey"),
      "projection must prune generated columns")
  }

  test("namespace listing exposes scales and tables") {
    val cat = new TpchCatalog
    cat.initialize("tpch", new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
    assert(graft.sources.tpch.TpchCatalog.scaleOf("sf1").contains(1.0))
    assert(graft.sources.tpch.TpchCatalog.scaleOf("sf0_1").contains(0.1))
    assert(graft.sources.tpch.TpchCatalog.scaleOf("tiny").contains(0.01))
    assert(graft.sources.tpch.TpchCatalog.scaleOf("bogus").isEmpty)
    assert(cat.listTables(Array("tiny")).map(_.name()).sorted.toSeq ==
      TpchGen.schemas.keys.toSeq.sorted)
  }

  test("the 8 catalog-only TPC-H corpus queries run and are deterministic") {
    TpchCatalogQueries.queries.foreach { case (name, fn) =>
      val df1 = fn(spark, "")
      val rows1 = df1.collect()
      val rows2 = fn(spark, "").collect()
      assert(rows1.sameElements(rows2), s"$name not deterministic")
    }
  }

  test("q4-style predicate selects a real subset (commit < receipt varies)") {
    val frac = spark.sql(
      """SELECT avg(CASE WHEN l_commitdate < l_receiptdate THEN 1.0 ELSE 0.0 END)
         FROM tpch.tiny.lineitem""").head().getDecimal(0).doubleValue()
    assert(frac > 0.1 && frac < 0.9, s"commit<receipt fraction $frac degenerate")
  }
}
