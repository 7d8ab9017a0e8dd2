package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

import graft.sources.tpch.TpchCatalog

/** The 8 TPC-H queries that need columns the slim testdata lacks
  * (partsupp, commit/receipt dates, containers): spec SQL from
  * [[TpchCorpusSql]] run against the graft TPC-H generator catalog at
  * `sf0_1` scale (tiny leaves q18/q20 with empty results — a
  * trivially-matching oracle). Together with TpchQueries (14
  * oracle-checked over
  * testdata) this completes the 22-query corpus the reference tests
  * against (kyuubi-spark-connector-tpch/src/main/resources/kyuubi/tpch/).
  *
  * Oracle strategy: graft.Verify dumps the `tpch.sf0_1` generator
  * tables to parquet next to the results (`__AUX__` in the oracle SQL
  * below is replaced with that directory's absolute path), and DuckDB
  * re-computes each query over the SAME inputs independently. The
  * generator itself is verified separately (TpchCatalogSpec: spec
  * formulas, row counts, determinism) — what the oracle checks here is
  * the query semantics: joins, correlated subqueries, HAVING, LIMIT.
  *
  * Output discipline: decimal columns are cast to DOUBLE on both sides
  * (exact decimal accumulation inside, one correctly-rounded cast out;
  * DECIMAL outputs trip the driver hash on trailing-zero formatting),
  * integer sums pinned to BIGINT, year() to INT.
  */
object TpchCatalogQueries {

  def register(s: SparkSession): Unit =
    s.conf.set("spark.sql.catalog.tpch", classOf[TpchCatalog].getName)

  /** The catalog namespace the driver-gate h-entries (and the aux
    * oracle dump) run against. */
  val gateNamespace = "sf0_1"

  private val corpus: Map[String, String] =
    TpchCorpusSql.queries(s"tpch.$gateNamespace").toMap

  /** Cast every decimal output column to double (driver-gate policy). */
  private def dblDecimals(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _ => col(f.name)
      }
    }: _*)

  private def q(name: String): (SparkSession, String) => DataFrame =
    (s, _) => { register(s); dblDecimals(s.sql(corpus(name))) }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h02_min_cost_supplier" -> q("q2"),
    "h04_order_priority" -> q("q4"),
    "h09_product_profit" -> q("q9"),
    "h11_important_stock" -> q("q11"),
    "h12_ship_modes" -> q("q12"),
    "h16_parts_supplier" -> q("q16"),
    "h20_part_promotion" -> q("q20"),
    "h21_waiting_suppliers" -> q("q21"))

  /** Generator tables Verify must dump for the oracles below. */
  val auxTables: Seq[String] =
    Seq("region", "nation", "supplier", "part", "partsupp", "customer",
      "orders", "lineitem")

  private def aux(t: String): String = s"'__AUX__/$t.parquet/*.parquet' $t"

  val oracles: Map[String, String] = Map(
    "h02_min_cost_supplier" ->
      s"""SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey,
          p_mfgr, s_address, s_phone, s_comment
          FROM ${aux("part")}, ${aux("supplier")}, ${aux("partsupp")}, ${aux("nation")}, ${aux("region")}
          WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
            AND p_size = 15 AND p_type LIKE '%BRASS'
            AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
            AND r_name = 'EUROPE'
            AND ps_supplycost = (
              SELECT min(ps2.ps_supplycost)
              FROM '__AUX__/partsupp.parquet/*.parquet' ps2, '__AUX__/supplier.parquet/*.parquet' s2,
                   '__AUX__/nation.parquet/*.parquet' n2, '__AUX__/region.parquet/*.parquet' r2
              WHERE p_partkey = ps2.ps_partkey AND s2.s_suppkey = ps2.ps_suppkey
                AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
                AND r2.r_name = 'EUROPE')
          ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          LIMIT 100""",
    "h04_order_priority" ->
      s"""SELECT o_orderpriority, count(*) AS order_count
          FROM ${aux("orders")}
          WHERE o_orderdate >= DATE '1993-07-01' AND o_orderdate < DATE '1993-10-01'
            AND EXISTS (SELECT 1 FROM ${aux("lineitem")}
                        WHERE l_orderkey = o_orderkey AND l_commitdate < l_receiptdate)
          GROUP BY o_orderpriority""",
    "h09_product_profit" ->
      s"""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit FROM (
            SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
              l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity AS amount
            FROM ${aux("part")}, ${aux("supplier")}, ${aux("lineitem")}, ${aux("partsupp")},
                 ${aux("orders")}, ${aux("nation")}
            WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
              AND p_partkey = l_partkey AND o_orderkey = l_orderkey
              AND s_nationkey = n_nationkey AND p_name LIKE '%green%') profit
          GROUP BY nation, o_year""",
    "h11_important_stock" ->
      s"""SELECT ps_partkey, CAST(sum(ps_supplycost * ps_availqty) AS DOUBLE) AS value
          FROM ${aux("partsupp")}, ${aux("supplier")}, ${aux("nation")}
          WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'GERMANY'
          GROUP BY ps_partkey
          HAVING sum(ps_supplycost * ps_availqty) > (
            SELECT sum(ps2.ps_supplycost * ps2.ps_availqty) * 0.0001
            FROM '__AUX__/partsupp.parquet/*.parquet' ps2, '__AUX__/supplier.parquet/*.parquet' s2,
                 '__AUX__/nation.parquet/*.parquet' n2
            WHERE ps2.ps_suppkey = s2.s_suppkey AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_name = 'GERMANY')
          ORDER BY value DESC
          LIMIT 100""",
    "h12_ship_modes" ->
      s"""SELECT l_shipmode,
            CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
            CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          FROM ${aux("orders")}, ${aux("lineitem")}
          WHERE o_orderkey = l_orderkey AND l_shipmode IN ('MAIL', 'SHIP')
            AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
            AND l_receiptdate >= DATE '1994-01-01' AND l_receiptdate < DATE '1995-01-01'
          GROUP BY l_shipmode""",
    "h16_parts_supplier" ->
      s"""SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
          FROM ${aux("partsupp")}, ${aux("part")}
          WHERE p_partkey = ps_partkey
            AND p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM POLISHED%'
            AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
            AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM ${aux("supplier")} WHERE s_comment LIKE '%furiously%')
          GROUP BY p_brand, p_type, p_size
          ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
          LIMIT 100""",
    "h20_part_promotion" ->
      s"""SELECT s_name, s_address
          FROM ${aux("supplier")}, ${aux("nation")}
          WHERE s_suppkey IN (
              SELECT ps_suppkey FROM ${aux("partsupp")}
              WHERE ps_partkey IN (SELECT p_partkey FROM ${aux("part")} WHERE p_name LIKE 'forest%')
                AND ps_availqty > (
                  SELECT 0.5 * sum(l_quantity) FROM ${aux("lineitem")}
                  WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                    AND l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'))
            AND s_nationkey = n_nationkey AND n_name = 'CANADA'
          ORDER BY s_name""",
    "h21_waiting_suppliers" ->
      s"""SELECT s_name, count(*) AS numwait
          FROM ${aux("supplier")}, '__AUX__/lineitem.parquet/*.parquet' l1, ${aux("orders")}, ${aux("nation")}
          WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
            AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
            AND EXISTS (SELECT 1 FROM '__AUX__/lineitem.parquet/*.parquet' l2
                        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM '__AUX__/lineitem.parquet/*.parquet' l3
                            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                              AND l3.l_receiptdate > l3.l_commitdate)
            AND s_nationkey = n_nationkey AND n_name = 'SAUDI ARABIA'
          GROUP BY s_name
          ORDER BY numwait DESC, s_name
          LIMIT 100""")
}
