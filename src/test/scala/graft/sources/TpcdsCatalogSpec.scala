package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.queries.TpcdsCorpusSql
import graft.sources.tpcds.{TpcdsCatalog, TpcdsGen}

/** TPC-DS generator-catalog correctness at tiny scale: calendar
  * integrity, key relationships (returns derive from sales), and the
  * corpus queries run + deterministic + non-degenerate (golden hashes
  * are pinned separately in CorpusGoldenSpec).
  */
class TpcdsCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    s.conf.set("spark.sql.catalog.tpcds", classOf[TpcdsCatalog].getName)
    s
  }

  test("date_dim is the spec calendar: consecutive seqs, correct fields") {
    assert(spark.sql("SELECT count(*) FROM tpcds.tiny.date_dim").head().getLong(0) ==
      TpcdsGen.dateDimRows)
    val r = spark.sql(
      """SELECT d_date_sk, d_year, d_moy, d_dom, d_month_seq, d_day_name
         FROM tpcds.tiny.date_dim WHERE d_date = DATE '2000-01-01'""").head()
    assert(r.getInt(1) == 2000 && r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(r.getInt(4) == 1200, "d_month_seq of 2000-01 must be 1200 (spec numbering)")
    assert(r.getString(5) == "Saturday")
    // month_seq is consecutive across month boundaries
    val seqs = spark.sql(
      """SELECT DISTINCT d_month_seq FROM tpcds.tiny.date_dim
         WHERE d_year = 2001 ORDER BY d_month_seq""").collect().map(_.getInt(0))
    assert(seqs.toSeq == (1212 to 1223))
  }

  test("returns join back to their sales") {
    val orphans = spark.sql(
      """SELECT count(*) FROM tpcds.tiny.store_returns sr
         LEFT ANTI JOIN tpcds.tiny.store_sales ss ON sr.sr_ticket_number = ss.ss_ticket_number
           AND sr.sr_item_sk = ss.ss_item_sk""").head().getLong(0)
    assert(orphans == 0, s"$orphans store_returns without a matching sale")
    val wrOrphans = spark.sql(
      """SELECT count(*) FROM tpcds.tiny.web_returns wr
         LEFT ANTI JOIN tpcds.tiny.web_sales ws ON wr.wr_order_number = ws.ws_order_number
           AND wr.wr_item_sk = ws.ws_item_sk""").head().getLong(0)
    assert(wrOrphans == 0)
  }

  test("sales dates land in date_dim's activity window") {
    val bad = spark.sql(
      """SELECT count(*) FROM tpcds.tiny.store_sales
         LEFT ANTI JOIN tpcds.tiny.date_dim ON ss_sold_date_sk = d_date_sk""").head().getLong(0)
    assert(bad == 0)
  }

  test("the corpus queries run, return rows, and are deterministic") {
    TpcdsCorpusSql.queries("tpcds.tiny").foreach { case (name, sql) =>
      val r1 = spark.sql(sql).collect()
      val r2 = spark.sql(sql).collect()
      assert(r1.sameElements(r2), s"$name not deterministic")
      // q1 (above-1.2x-avg returners in TN) and q3 (single manufact id
      // out of 1000 over ~570 tiny items) are legitimately selective at
      // tiny scale; the rest must produce rows
      assert(Set("q1", "q3")(name) || r1.nonEmpty,
        s"$name returned zero rows — degenerate data")
    }
  }
}
