package graft.queries

/** The TPC-DS queries with published reference latencies (BASELINE.md:
  * q1, q2, q3, q5, q6, q99 at sf10 — dev/kyuubi-tpcds/README.md:80-105),
  * spec text over the generator catalog namespace `p`.
  */
object TpcdsCorpusSql {

  def queries(p: String): Seq[(String, String)] = Seq(
    "q1" ->
      s"""WITH customer_total_return AS (
            SELECT sr_customer_sk AS ctr_customer_sk, sr_store_sk AS ctr_store_sk,
                   sum(sr_return_amt) AS ctr_total_return
            FROM $p.store_returns, $p.date_dim
            WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
            GROUP BY sr_customer_sk, sr_store_sk)
          SELECT c_customer_id
          FROM customer_total_return ctr1, $p.store, $p.customer
          WHERE ctr1.ctr_total_return > (
              SELECT avg(ctr_total_return) * 1.2 FROM customer_total_return ctr2
              WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
            AND s_store_sk = ctr1.ctr_store_sk AND s_state = 'TN'
            AND ctr1.ctr_customer_sk = c_customer_sk
          ORDER BY c_customer_id LIMIT 100""",
    "q2" ->
      s"""WITH wscs AS (
            SELECT ws_sold_date_sk AS sold_date_sk, ws_ext_sales_price AS sales_price
            FROM $p.web_sales
            UNION ALL
            SELECT cs_sold_date_sk, cs_ext_sales_price FROM $p.catalog_sales),
          wswscs AS (
            SELECT d_week_seq,
              sum(CASE WHEN d_day_name = 'Sunday' THEN sales_price END) AS sun_sales,
              sum(CASE WHEN d_day_name = 'Monday' THEN sales_price END) AS mon_sales,
              sum(CASE WHEN d_day_name = 'Tuesday' THEN sales_price END) AS tue_sales,
              sum(CASE WHEN d_day_name = 'Wednesday' THEN sales_price END) AS wed_sales,
              sum(CASE WHEN d_day_name = 'Thursday' THEN sales_price END) AS thu_sales,
              sum(CASE WHEN d_day_name = 'Friday' THEN sales_price END) AS fri_sales,
              sum(CASE WHEN d_day_name = 'Saturday' THEN sales_price END) AS sat_sales
            FROM wscs, $p.date_dim WHERE d_date_sk = sold_date_sk
            GROUP BY d_week_seq)
          SELECT d_week_seq1,
            round(sun_sales1 / sun_sales2, 2), round(mon_sales1 / mon_sales2, 2),
            round(tue_sales1 / tue_sales2, 2), round(wed_sales1 / wed_sales2, 2),
            round(thu_sales1 / thu_sales2, 2), round(fri_sales1 / fri_sales2, 2),
            round(sat_sales1 / sat_sales2, 2)
          FROM (SELECT w.d_week_seq AS d_week_seq1, sun_sales AS sun_sales1,
                  mon_sales AS mon_sales1, tue_sales AS tue_sales1, wed_sales AS wed_sales1,
                  thu_sales AS thu_sales1, fri_sales AS fri_sales1, sat_sales AS sat_sales1
                FROM wswscs w, $p.date_dim d
                WHERE d.d_week_seq = w.d_week_seq AND d_year = 2001) y,
               (SELECT w.d_week_seq AS d_week_seq2, sun_sales AS sun_sales2,
                  mon_sales AS mon_sales2, tue_sales AS tue_sales2, wed_sales AS wed_sales2,
                  thu_sales AS thu_sales2, fri_sales AS fri_sales2, sat_sales AS sat_sales2
                FROM wswscs w, $p.date_dim d
                WHERE d.d_week_seq = w.d_week_seq AND d_year = 2002) z
          WHERE d_week_seq1 = d_week_seq2 - 53
          ORDER BY d_week_seq1""",
    "q3" ->
      s"""SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
            sum(ss_ext_sales_price) AS sum_agg
          FROM $p.date_dim dt, $p.store_sales, $p.item
          WHERE dt.d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
            AND i_manufact_id = 128 AND dt.d_moy = 11
          GROUP BY dt.d_year, i_brand, i_brand_id
          ORDER BY dt.d_year, sum_agg DESC, brand_id LIMIT 100""",
    "q5" ->
      s"""WITH ssr AS (
            SELECT s_store_id, sum(sales_price) AS sales, sum(profit) AS profit,
                   sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
            FROM (SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
                    ss_ext_sales_price AS sales_price, ss_net_profit AS profit,
                    CAST(0 AS DECIMAL(7,2)) AS return_amt, CAST(0 AS DECIMAL(7,2)) AS net_loss
                  FROM $p.store_sales
                  UNION ALL
                  SELECT sr_store_sk, sr_returned_date_sk, CAST(0 AS DECIMAL(7,2)),
                    CAST(0 AS DECIMAL(7,2)), sr_return_amt, sr_net_loss
                  FROM $p.store_returns) salesreturns, $p.date_dim, $p.store
            WHERE date_sk = d_date_sk
              AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
              AND store_sk = s_store_sk
            GROUP BY s_store_id),
          csr AS (
            SELECT cp_catalog_page_id, sum(sales_price) AS sales, sum(profit) AS profit,
                   sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
            FROM (SELECT cs_catalog_page_sk AS page_sk, cs_sold_date_sk AS date_sk,
                    cs_ext_sales_price AS sales_price, cs_net_profit AS profit,
                    CAST(0 AS DECIMAL(7,2)) AS return_amt, CAST(0 AS DECIMAL(7,2)) AS net_loss
                  FROM $p.catalog_sales
                  UNION ALL
                  SELECT cr_catalog_page_sk, cr_returned_date_sk, CAST(0 AS DECIMAL(7,2)),
                    CAST(0 AS DECIMAL(7,2)), cr_return_amount, cr_net_loss
                  FROM $p.catalog_returns) salesreturns, $p.date_dim, $p.catalog_page
            WHERE date_sk = d_date_sk
              AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
              AND page_sk = cp_catalog_page_sk
            GROUP BY cp_catalog_page_id),
          wsr AS (
            SELECT web_site_id, sum(sales_price) AS sales, sum(profit) AS profit,
                   sum(return_amt) AS returns_amt, sum(net_loss) AS profit_loss
            FROM (SELECT ws_web_site_sk AS wsr_web_site_sk, ws_sold_date_sk AS date_sk,
                    ws_ext_sales_price AS sales_price, ws_net_profit AS profit,
                    CAST(0 AS DECIMAL(7,2)) AS return_amt, CAST(0 AS DECIMAL(7,2)) AS net_loss
                  FROM $p.web_sales
                  UNION ALL
                  SELECT ws.ws_web_site_sk, wr_returned_date_sk, CAST(0 AS DECIMAL(7,2)),
                    CAST(0 AS DECIMAL(7,2)), wr_return_amt, wr_net_loss
                  FROM $p.web_returns wr LEFT OUTER JOIN $p.web_sales ws
                    ON wr.wr_item_sk = ws.ws_item_sk AND wr.wr_order_number = ws.ws_order_number)
                  salesreturns, $p.date_dim, $p.web_site
            WHERE date_sk = d_date_sk
              AND d_date BETWEEN CAST('2000-08-23' AS DATE) AND CAST('2000-09-06' AS DATE)
              AND wsr_web_site_sk = web_site_sk
            GROUP BY web_site_id)
          SELECT channel, id, sum(sales) AS sales, sum(returns_amt) AS returns_amt,
                 sum(profit) AS profit
          FROM (SELECT 'store channel' AS channel, concat('store', s_store_id) AS id,
                  sales, returns_amt, profit - profit_loss AS profit FROM ssr
                UNION ALL
                SELECT 'catalog channel', concat('catalog_page', cp_catalog_page_id),
                  sales, returns_amt, profit - profit_loss FROM csr
                UNION ALL
                SELECT 'web channel', concat('web_site', web_site_id),
                  sales, returns_amt, profit - profit_loss FROM wsr) x
          GROUP BY ROLLUP (channel, id)
          ORDER BY channel, id LIMIT 100""",
    "q6" ->
      s"""SELECT a.ca_state AS state, count(*) AS cnt
          FROM $p.customer_address a, $p.customer c, $p.store_sales s, $p.date_dim d, $p.item i
          WHERE a.ca_address_sk = c.c_current_addr_sk AND c.c_customer_sk = s.ss_customer_sk
            AND s.ss_sold_date_sk = d.d_date_sk AND s.ss_item_sk = i.i_item_sk
            AND d.d_month_seq = (
              SELECT DISTINCT d_month_seq FROM $p.date_dim WHERE d_year = 2001 AND d_moy = 1)
            AND i.i_current_price > 1.2 * (
              SELECT avg(j.i_current_price) FROM $p.item j WHERE j.i_category = i.i_category)
          GROUP BY a.ca_state HAVING count(*) >= 10
          ORDER BY cnt, a.ca_state LIMIT 100""",
    "q99" ->
      s"""SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type, cc_name,
            sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk <= 30 THEN 1 ELSE 0 END) AS days_30,
            sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 30
                      AND cs_ship_date_sk - cs_sold_date_sk <= 60 THEN 1 ELSE 0 END) AS days_60,
            sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 60
                      AND cs_ship_date_sk - cs_sold_date_sk <= 90 THEN 1 ELSE 0 END) AS days_90,
            sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 90
                      AND cs_ship_date_sk - cs_sold_date_sk <= 120 THEN 1 ELSE 0 END) AS days_120,
            sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 120 THEN 1 ELSE 0 END) AS days_more
          FROM $p.catalog_sales, $p.warehouse, $p.ship_mode, $p.call_center, $p.date_dim
          WHERE d_month_seq BETWEEN 1200 AND 1211
            AND cs_ship_date_sk = d_date_sk AND cs_warehouse_sk = w_warehouse_sk
            AND cs_ship_mode_sk = sm_ship_mode_sk AND cs_call_center_sk = cc_call_center_sk
          GROUP BY substr(w_warehouse_name, 1, 20), sm_type, cc_name
          ORDER BY wh, sm_type, cc_name LIMIT 100""")
}
