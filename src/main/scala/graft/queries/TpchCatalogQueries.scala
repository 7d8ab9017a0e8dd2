package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.tpch.TpchCatalog

/** The 8 TPC-H queries that need columns the slim testdata lacks
  * (partsupp, commit/receipt dates, containers): spec SQL from
  * [[TpchCorpusSql]] run against the graft TPC-H generator catalog at
  * `tiny` scale. Driver-gate entries are rows-only — generated data has
  * no external oracle; determinism and shape are asserted in
  * TpchCatalogSpec. Together with TpchQueries (14 oracle-checked over
  * testdata) this completes the 22-query corpus the reference tests
  * against (kyuubi-spark-connector-tpch/src/main/resources/kyuubi/tpch/).
  */
object TpchCatalogQueries {

  def register(s: SparkSession): Unit =
    s.conf.set("spark.sql.catalog.tpch", classOf[TpchCatalog].getName)

  private val corpus: Map[String, String] = TpchCorpusSql.queries("tpch.tiny").toMap

  private def q(name: String): (SparkSession, String) => DataFrame =
    (s, _) => { register(s); s.sql(corpus(name)) }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h02_min_cost_supplier" -> q("q2"),
    "h04_order_priority" -> q("q4"),
    "h09_product_profit" -> q("q9"),
    "h11_important_stock" -> q("q11"),
    "h12_ship_modes" -> q("q12"),
    "h16_parts_supplier" -> q("q16"),
    "h20_part_promotion" -> q("q20"),
    "h21_waiting_suppliers" -> q("q21"))
}
