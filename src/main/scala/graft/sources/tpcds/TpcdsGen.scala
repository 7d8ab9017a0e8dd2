package graft.sources.tpcds

import java.time.LocalDate

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.tpch.TpchGen.{bounded, boundedL, mix}

/** Deterministic TPC-DS-shaped row generation: 24 tables (all facts,
  * the date/time/demographic/address/promotion dimensions, and weekly
  * inventory) covering the 45-query corpus in TpcdsCorpusSql, incl.
  * every query with published reference numbers (q1, q2, q3, q5, q6,
  * q99 — BASELINE.md / dev/kyuubi-tpcds/README.md:80-105), with the
  * spec's key relationships: a 1900-2100 date_dim with consecutive
  * d_month_seq/d_week_seq, surrogate-key joins sales→date/item/
  * customer/store, and returns derived from every 10th sale so
  * sale↔return joins land. Column sets cover the full benchmark query
  * corpus for these tables (the framework extends per-column).
  *
  * Same executor-parallel property as the TPC-H generator: every field
  * is a pure function of (table, rowIndex) — any executor generates any
  * row range (reference seeks trino-tpcds generators to chunk offsets,
  * TPCDSBatchScan.scala:28-103).
  */
object TpcdsGen {

  // --- date_dim: fixed 1900-01-01 .. 2099-12-31, spec julian-ish SKs ---
  val dateSkBase = 2415022L // spec d_date_sk of 1900-01-01
  val epoch1900: Long = LocalDate.of(1900, 1, 1).toEpochDay
  val dateDimRows: Long = LocalDate.of(2100, 1, 1).toEpochDay - epoch1900

  // sales activity window: 1998-01-01 .. 2002-12-31
  private val saleLo = LocalDate.of(1998, 1, 1).toEpochDay - epoch1900
  private val saleHi = LocalDate.of(2003, 1, 1).toEpochDay - epoch1900
  val saleLoPub: Long = saleLo
  val saleHiPub: Long = saleHi

  val dayNames = Array("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday")
  val states = Array("TN", "CA", "TX", "NY", "OH", "GA", "WA", "IL", "MI", "NC")
  val categories = Array("Sports", "Books", "Home", "Electronics", "Jewelry",
    "Music", "Women", "Men", "Children", "Shoes")
  val shipModeTypes = Array("EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY")

  def str(s: String): UTF8String = UTF8String.fromString(s)
  def money(cents: Long): Decimal = Decimal(BigDecimal(cents, 2), 7, 2)

  // --- scaling (spec-calibrated: sf1 and sf10 match published counts) ---
  def storeSalesCount(sf: Double): Long = math.max(100L, (2880000L * sf).toLong)
  def catalogSalesCount(sf: Double): Long = math.max(50L, (1440000L * sf).toLong)
  def webSalesCount(sf: Double): Long = math.max(25L, (720000L * sf).toLong)
  def storeReturnsCount(sf: Double): Long = storeSalesCount(sf) / 10
  def catalogReturnsCount(sf: Double): Long = catalogSalesCount(sf) / 10
  def webReturnsCount(sf: Double): Long = webSalesCount(sf) / 10
  def customerCount(sf: Double): Long = math.max(100L, (100000 * math.pow(sf, 0.7)).toLong)
  def customerAddressCount(sf: Double): Long = math.max(50L, (50000 * math.pow(sf, 0.7)).toLong)
  def itemCount(sf: Double): Long = math.max(100L, (18000 * math.pow(sf, 0.75)).toLong)
  def storeCount(sf: Double): Long = math.max(2L, (12 * math.pow(sf, 0.93)).toLong)
  def warehouseCount(sf: Double): Long = math.max(3L, (5 * math.pow(sf, 0.3)).toLong) // floor 3: multi-warehouse EXISTS probes (q94/q95/q16) need >1 even at tiny
  def callCenterCount(sf: Double): Long = math.max(2L, (6 * math.pow(sf, 0.6)).toLong)
  def catalogPageCount(sf: Double): Long = 11718L
  def webSiteCount(sf: Double): Long = math.max(2L, (30 * math.pow(sf, 0.15)).toLong)
  def shipModeCount(sf: Double): Long = shipModeTypes.length.toLong * 4
  def promotionCount(sf: Double): Long = math.max(50L, (300 * math.pow(sf, 0.25)).toLong)
  val customerDemographicsCount: Long = 1920800L   // spec: fixed cross product
  val householdDemographicsCount: Long = 7200L     // spec: fixed
  val timeDimCount: Long = 86400L                  // one row per second of day
  val incomeBandCount: Long = 20L
  def reasonCount(sf: Double): Long = math.max(10L, (35 * math.pow(sf, 0.11)).toLong)
  /** weekly stock positions: items x warehouses x ~261 Mondays of the window */
  def inventoryWeeks: Long = (saleHiPub - saleLoPub) / 7
  def inventoryCount(sf: Double): Long = itemCount(sf) * warehouseCount(sf) * inventoryWeeks
  def webPageCount(sf: Double): Long = math.max(10L, (60 * math.pow(sf, 0.52)).toLong)

  def rowCount(table: String, sf: Double): Long = table match {
    case "date_dim" => dateDimRows
    case "store_sales" => storeSalesCount(sf)
    case "store_returns" => storeReturnsCount(sf)
    case "catalog_sales" => catalogSalesCount(sf)
    case "catalog_returns" => catalogReturnsCount(sf)
    case "web_sales" => webSalesCount(sf)
    case "web_returns" => webReturnsCount(sf)
    case "customer" => customerCount(sf)
    case "customer_address" => customerAddressCount(sf)
    case "item" => itemCount(sf)
    case "store" => storeCount(sf)
    case "warehouse" => warehouseCount(sf)
    case "call_center" => callCenterCount(sf)
    case "catalog_page" => catalogPageCount(sf)
    case "web_site" => webSiteCount(sf)
    case "ship_mode" => shipModeCount(sf)
    case "promotion" => promotionCount(sf)
    case "customer_demographics" => customerDemographicsCount
    case "household_demographics" => householdDemographicsCount
    case "time_dim" => timeDimCount
    case "income_band" => incomeBandCount
    case "reason" => reasonCount(sf)
    case "web_page" => webPageCount(sf)
    case "inventory" => inventoryCount(sf)
  }

  val avgRowBytes: Map[String, Int] = Map(
    "date_dim" -> 140, "store_sales" -> 110, "store_returns" -> 90,
    "catalog_sales" -> 140, "catalog_returns" -> 110, "web_sales" -> 140,
    "web_returns" -> 100, "customer" -> 130, "customer_address" -> 90,
    "item" -> 150, "store" -> 120, "warehouse" -> 80, "call_center" -> 90,
    "catalog_page" -> 80, "web_site" -> 80, "ship_mode" -> 60,
    "promotion" -> 80, "customer_demographics" -> 90, "household_demographics" -> 60,
    "time_dim" -> 80, "income_band" -> 30, "reason" -> 60, "web_page" -> 50,
    "inventory" -> 40)

  val colors: Array[String] = Array(
    "almond", "azure", "beige", "black", "blue", "brown", "coral", "cream",
    "cyan", "gold", "green", "grey", "ivory", "khaki", "lime", "magenta",
    "maroon", "navy", "olive", "orange")
  val sizes: Array[String] =
    Array("small", "medium", "large", "extra large", "economy", "N/A", "petite")
  val unitsPool: Array[String] =
    Array("Each", "Dozen", "Case", "Pallet", "Gross", "Box", "Bundle", "Carton")
  val containers: Array[String] = Array("Unknown", "Standard")
  val birthCountries: Array[String] = Array(
    "UNITED STATES", "CANADA", "MEXICO", "BRAZIL", "GERMANY", "FRANCE",
    "JAPAN", "CHINA", "INDIA", "AUSTRALIA")

  private def dec72 = DecimalType(7, 2)

  val schemas: Map[String, StructType] = Map(
    "date_dim" -> StructType(Seq(
      StructField("d_date_sk", LongType, nullable = false),
      StructField("d_date_id", StringType, nullable = false),
      StructField("d_date", DateType, nullable = false),
      StructField("d_month_seq", IntegerType, nullable = false),
      StructField("d_week_seq", IntegerType, nullable = false),
      StructField("d_quarter_seq", IntegerType, nullable = false),
      StructField("d_year", IntegerType, nullable = false),
      StructField("d_dow", IntegerType, nullable = false),
      StructField("d_moy", IntegerType, nullable = false),
      StructField("d_dom", IntegerType, nullable = false),
      StructField("d_qoy", IntegerType, nullable = false),
      StructField("d_day_name", StringType, nullable = false),
      StructField("d_holiday", StringType, nullable = false),
      StructField("d_weekend", StringType, nullable = false))),
    "store_sales" -> StructType(Seq(
      StructField("ss_sold_date_sk", LongType, nullable = false),
      StructField("ss_sold_time_sk", LongType, nullable = false),
      StructField("ss_item_sk", LongType, nullable = false),
      StructField("ss_customer_sk", LongType, nullable = false),
      StructField("ss_cdemo_sk", LongType, nullable = false),
      StructField("ss_hdemo_sk", LongType, nullable = false),
      StructField("ss_addr_sk", LongType, nullable = false),
      StructField("ss_store_sk", LongType, nullable = false),
      StructField("ss_promo_sk", LongType, nullable = false),
      StructField("ss_ticket_number", LongType, nullable = false),
      StructField("ss_quantity", IntegerType, nullable = false),
      StructField("ss_list_price", dec72, nullable = false),
      StructField("ss_sales_price", dec72, nullable = false),
      StructField("ss_coupon_amt", dec72, nullable = false),
      StructField("ss_ext_sales_price", dec72, nullable = false),
      StructField("ss_net_paid", dec72, nullable = false),
      StructField("ss_net_profit", dec72, nullable = false),
      StructField("ss_ext_discount_amt", dec72, nullable = false),
      StructField("ss_wholesale_cost", dec72, nullable = false))),
    "store_returns" -> StructType(Seq(
      StructField("sr_returned_date_sk", LongType, nullable = false),
      StructField("sr_item_sk", LongType, nullable = false),
      StructField("sr_customer_sk", LongType, nullable = false),
      StructField("sr_store_sk", LongType, nullable = false),
      StructField("sr_ticket_number", LongType, nullable = false),
      StructField("sr_return_quantity", IntegerType, nullable = false),
      StructField("sr_return_amt", dec72, nullable = false),
      StructField("sr_net_loss", dec72, nullable = false),
      StructField("sr_reason_sk", LongType, nullable = false),
      StructField("sr_cdemo_sk", LongType, nullable = false))),
    "catalog_sales" -> StructType(Seq(
      StructField("cs_sold_date_sk", LongType, nullable = false),
      StructField("cs_ship_date_sk", LongType, nullable = false),
      StructField("cs_bill_customer_sk", LongType, nullable = false),
      StructField("cs_call_center_sk", LongType, nullable = false),
      StructField("cs_catalog_page_sk", LongType, nullable = false),
      StructField("cs_ship_mode_sk", LongType, nullable = false),
      StructField("cs_warehouse_sk", LongType, nullable = false),
      StructField("cs_item_sk", LongType, nullable = false),
      StructField("cs_bill_cdemo_sk", LongType, nullable = false),
      StructField("cs_bill_addr_sk", LongType, nullable = false),
      StructField("cs_promo_sk", LongType, nullable = false),
      StructField("cs_order_number", LongType, nullable = false),
      StructField("cs_quantity", IntegerType, nullable = false),
      StructField("cs_list_price", dec72, nullable = false),
      StructField("cs_coupon_amt", dec72, nullable = false),
      StructField("cs_sales_price", dec72, nullable = false),
      StructField("cs_ext_sales_price", dec72, nullable = false),
      StructField("cs_ext_discount_amt", dec72, nullable = false),
      StructField("cs_net_profit", dec72, nullable = false),
      StructField("cs_sold_time_sk", LongType, nullable = false))),
    "catalog_returns" -> StructType(Seq(
      StructField("cr_returned_date_sk", LongType, nullable = false),
      StructField("cr_item_sk", LongType, nullable = false),
      StructField("cr_catalog_page_sk", LongType, nullable = false),
      StructField("cr_order_number", LongType, nullable = false),
      StructField("cr_return_quantity", IntegerType, nullable = false),
      StructField("cr_return_amount", dec72, nullable = false),
      StructField("cr_net_loss", dec72, nullable = false),
      StructField("cr_call_center_sk", LongType, nullable = false),
      StructField("cr_returning_customer_sk", LongType, nullable = false),
      StructField("cr_returning_addr_sk", LongType, nullable = false),
      StructField("cr_reason_sk", LongType, nullable = false))),
    "web_sales" -> StructType(Seq(
      StructField("ws_sold_date_sk", LongType, nullable = false),
      StructField("ws_ship_date_sk", LongType, nullable = false),
      StructField("ws_item_sk", LongType, nullable = false),
      StructField("ws_bill_customer_sk", LongType, nullable = false),
      StructField("ws_bill_addr_sk", LongType, nullable = false),
      StructField("ws_web_site_sk", LongType, nullable = false),
      StructField("ws_sold_time_sk", LongType, nullable = false),
      StructField("ws_ship_hdemo_sk", LongType, nullable = false),
      StructField("ws_web_page_sk", LongType, nullable = false),
      StructField("ws_ship_mode_sk", LongType, nullable = false),
      StructField("ws_warehouse_sk", LongType, nullable = false),
      StructField("ws_order_number", LongType, nullable = false),
      StructField("ws_quantity", IntegerType, nullable = false),
      StructField("ws_sales_price", dec72, nullable = false),
      StructField("ws_ext_sales_price", dec72, nullable = false),
      StructField("ws_ext_discount_amt", dec72, nullable = false),
      StructField("ws_net_paid", dec72, nullable = false),
      StructField("ws_net_profit", dec72, nullable = false),
      StructField("ws_promo_sk", LongType, nullable = false))),
    "web_returns" -> StructType(Seq(
      StructField("wr_returned_date_sk", LongType, nullable = false),
      StructField("wr_item_sk", LongType, nullable = false),
      StructField("wr_order_number", LongType, nullable = false),
      StructField("wr_return_quantity", IntegerType, nullable = false),
      StructField("wr_return_amt", dec72, nullable = false),
      StructField("wr_net_loss", dec72, nullable = false),
      StructField("wr_returning_customer_sk", LongType, nullable = false),
      StructField("wr_returning_addr_sk", LongType, nullable = false),
      StructField("wr_reason_sk", LongType, nullable = false),
      StructField("wr_refunded_cash", dec72, nullable = false))),
    "customer" -> StructType(Seq(
      StructField("c_customer_sk", LongType, nullable = false),
      StructField("c_customer_id", StringType, nullable = false),
      StructField("c_current_addr_sk", LongType, nullable = false),
      StructField("c_first_name", StringType, nullable = false),
      StructField("c_last_name", StringType, nullable = false),
      StructField("c_current_cdemo_sk", LongType, nullable = false),
      StructField("c_current_hdemo_sk", LongType, nullable = false),
      StructField("c_preferred_cust_flag", StringType, nullable = false),
      StructField("c_birth_year", IntegerType, nullable = false),
      StructField("c_birth_month", IntegerType, nullable = false),
      StructField("c_birth_country", StringType, nullable = false))),
    "customer_address" -> StructType(Seq(
      StructField("ca_address_sk", LongType, nullable = false),
      StructField("ca_address_id", StringType, nullable = false),
      StructField("ca_city", StringType, nullable = false),
      StructField("ca_state", StringType, nullable = false),
      StructField("ca_zip", StringType, nullable = false),
      StructField("ca_gmt_offset", DecimalType(5, 2), nullable = false))),
    "item" -> StructType(Seq(
      StructField("i_item_sk", LongType, nullable = false),
      StructField("i_item_id", StringType, nullable = false),
      StructField("i_item_desc", StringType, nullable = false),
      StructField("i_brand_id", IntegerType, nullable = false),
      StructField("i_brand", StringType, nullable = false),
      StructField("i_class", StringType, nullable = false),
      StructField("i_category_id", IntegerType, nullable = false),
      StructField("i_category", StringType, nullable = false),
      StructField("i_manufact_id", IntegerType, nullable = false),
      StructField("i_manufact", StringType, nullable = false),
      StructField("i_manager_id", IntegerType, nullable = false),
      StructField("i_current_price", dec72, nullable = false),
      StructField("i_color", StringType, nullable = false),
      StructField("i_product_name", StringType, nullable = false),
      StructField("i_size", StringType, nullable = false),
      StructField("i_units", StringType, nullable = false),
      StructField("i_container", StringType, nullable = false))),
    "store" -> StructType(Seq(
      StructField("s_store_sk", LongType, nullable = false),
      StructField("s_store_id", StringType, nullable = false),
      StructField("s_store_name", StringType, nullable = false),
      StructField("s_county", StringType, nullable = false),
      StructField("s_state", StringType, nullable = false),
      StructField("s_zip", StringType, nullable = false),
      StructField("s_city", StringType, nullable = false),
      StructField("s_gmt_offset", DecimalType(5, 2), nullable = false))),
    "warehouse" -> StructType(Seq(
      StructField("w_warehouse_sk", LongType, nullable = false),
      StructField("w_warehouse_name", StringType, nullable = false),
      StructField("w_state", StringType, nullable = false))),
    "call_center" -> StructType(Seq(
      StructField("cc_call_center_sk", LongType, nullable = false),
      StructField("cc_call_center_id", StringType, nullable = false),
      StructField("cc_name", StringType, nullable = false),
      StructField("cc_county", StringType, nullable = false))),
    "catalog_page" -> StructType(Seq(
      StructField("cp_catalog_page_sk", LongType, nullable = false),
      StructField("cp_catalog_page_id", StringType, nullable = false))),
    "web_site" -> StructType(Seq(
      StructField("web_site_sk", LongType, nullable = false),
      StructField("web_site_id", StringType, nullable = false),
      StructField("web_name", StringType, nullable = false))),
    "ship_mode" -> StructType(Seq(
      StructField("sm_ship_mode_sk", LongType, nullable = false),
      StructField("sm_ship_mode_id", StringType, nullable = false),
      StructField("sm_type", StringType, nullable = false))),
    "promotion" -> StructType(Seq(
      StructField("p_promo_sk", LongType, nullable = false),
      StructField("p_promo_id", StringType, nullable = false),
      StructField("p_channel_dmail", StringType, nullable = false),
      StructField("p_channel_email", StringType, nullable = false),
      StructField("p_channel_event", StringType, nullable = false),
      StructField("p_channel_tv", StringType, nullable = false))),
    "customer_demographics" -> StructType(Seq(
      StructField("cd_demo_sk", LongType, nullable = false),
      StructField("cd_gender", StringType, nullable = false),
      StructField("cd_marital_status", StringType, nullable = false),
      StructField("cd_education_status", StringType, nullable = false),
      StructField("cd_purchase_estimate", IntegerType, nullable = false),
      StructField("cd_credit_rating", StringType, nullable = false),
      StructField("cd_dep_count", IntegerType, nullable = false),
      StructField("cd_dep_employed_count", IntegerType, nullable = false),
      StructField("cd_dep_college_count", IntegerType, nullable = false))),
    "household_demographics" -> StructType(Seq(
      StructField("hd_demo_sk", LongType, nullable = false),
      StructField("hd_income_band_sk", LongType, nullable = false),
      StructField("hd_buy_potential", StringType, nullable = false),
      StructField("hd_dep_count", IntegerType, nullable = false),
      StructField("hd_vehicle_count", IntegerType, nullable = false))),
    "time_dim" -> StructType(Seq(
      StructField("t_time_sk", LongType, nullable = false),
      StructField("t_time_id", StringType, nullable = false),
      StructField("t_time", IntegerType, nullable = false),
      StructField("t_hour", IntegerType, nullable = false),
      StructField("t_minute", IntegerType, nullable = false),
      StructField("t_second", IntegerType, nullable = false),
      StructField("t_meal_time", StringType, nullable = true))),
    "income_band" -> StructType(Seq(
      StructField("ib_income_band_sk", LongType, nullable = false),
      StructField("ib_lower_bound", IntegerType, nullable = false),
      StructField("ib_upper_bound", IntegerType, nullable = false))),
    "reason" -> StructType(Seq(
      StructField("r_reason_sk", LongType, nullable = false),
      StructField("r_reason_id", StringType, nullable = false),
      StructField("r_reason_desc", StringType, nullable = false))),
    "web_page" -> StructType(Seq(
      StructField("wp_web_page_sk", LongType, nullable = false),
      StructField("wp_web_page_id", StringType, nullable = false),
      StructField("wp_char_count", IntegerType, nullable = false))),
    "inventory" -> StructType(Seq(
      StructField("inv_date_sk", LongType, nullable = false),
      StructField("inv_item_sk", LongType, nullable = false),
      StructField("inv_warehouse_sk", LongType, nullable = false),
      StructField("inv_quantity_on_hand", IntegerType, nullable = false))))

  /** day offset (0-based from 1900-01-01) → d_date_sk. */
  def dateSk(day: Long): Long = dateSkBase + day
  private def saleDay(h: Long): Long = saleLo + boundedL(h, saleHi - saleLo)

  def row(table: String, sf: Double, idx: Long): Array[Any] = table match {
    case "date_dim" =>
      val d = LocalDate.ofEpochDay(epoch1900 + idx)
      val dow = d.getDayOfWeek.getValue % 7 // Sunday=0
      Array(dateSk(idx), str(f"D${idx}%010d"), (epoch1900 + idx).toInt,
        (d.getYear - 1900) * 12 + d.getMonthValue - 1,
        (idx / 7).toInt,
        (d.getYear - 1900) * 4 + (d.getMonthValue - 1) / 3,
        d.getYear, dow, d.getMonthValue, d.getDayOfMonth,
        (d.getMonthValue - 1) / 3 + 1,
        str(dayNames(dow)),
        str(if (d.getDayOfYear <= 7) "Y" else "N"),
        str(if (dow == 0 || dow == 6) "Y" else "N"))

    case "store_sales" =>
      val h = mix(11, idx)
      val qty = 1 + bounded(mix(h, 1), 100)
      val price = 100 + boundedL(mix(h, 2), 19900)    // 1.00 .. 200.00
      val ext = qty * price
      Array(dateSk(saleDay(mix(h, 3))),
        boundedL(mix(h, 8), timeDimCount),
        boundedL(mix(h, 4), itemCount(sf)) + 1,
        boundedL(mix(h, 5), customerCount(sf)) + 1,
        boundedL(mix(h, 9), customerDemographicsCount) + 1,
        boundedL(mix(h, 10), householdDemographicsCount) + 1,
        boundedL(mix(h, 11), customerAddressCount(sf)) + 1,
        boundedL(mix(h, 6), storeCount(sf)) + 1,
        boundedL(mix(h, 12), promotionCount(sf)) + 1,
        idx + 1, qty, money(price + price / 4), money(price),
        money(boundedL(mix(h, 13), price / 2 + 1)),
        money(ext), money(ext),
        money(ext / 5 - boundedL(mix(h, 7), ext / 2)),
        money(boundedL(mix(h, 14), ext / 10 + 1)),
        money(price / 2 + boundedL(mix(h, 15), price / 4 + 1)))

    case "store_returns" =>
      // every 10th store sale is returned, 1-30 days later
      val saleIdx = idx * 10
      val sale = row("store_sales", sf, saleIdx)
      val h = mix(12, idx)
      val qty = 1 + bounded(mix(h, 1), sale(10).asInstanceOf[Int])
      val amt = qty * (sale(12).asInstanceOf[Decimal].toBigDecimal * 100).toLong
      Array(sale(0).asInstanceOf[Long] + 1 + bounded(mix(h, 2), 30),
        sale(2), sale(3), sale(7), sale(9), qty, money(amt), money(amt / 2),
        boundedL(mix(h, 4), reasonCount(sf)) + 1, sale(4))

    case "catalog_sales" =>
      val h = mix(13, idx)
      val qty = 1 + bounded(mix(h, 1), 100)
      val price = 100 + boundedL(mix(h, 2), 29900)
      val sold = saleDay(mix(h, 3))
      Array(dateSk(sold), dateSk(sold + 1 + bounded(mix(h, 4), 120)),
        boundedL(mix(h, 5), customerCount(sf)) + 1,
        boundedL(mix(h, 6), callCenterCount(sf)) + 1,
        boundedL(mix(h, 7), catalogPageCount(sf)) + 1,
        boundedL(mix(h, 8), shipModeCount(sf)) + 1,
        boundedL(mix(h, 9), warehouseCount(sf)) + 1,
        boundedL(mix(h, 10), itemCount(sf)) + 1,
        boundedL(mix(h, 13), customerDemographicsCount) + 1,
        boundedL(mix(h, 16), customerAddressCount(sf)) + 1,
        boundedL(mix(h, 14), promotionCount(sf)) + 1,
        idx + 1, qty, money(price + price / 4),
        money(boundedL(mix(h, 15), price / 2 + 1)),
        money(price), money(qty * price),
        money(boundedL(mix(h, 12), qty * price / 10 + 1)),
        money(qty * price / 5 - boundedL(mix(h, 11), qty * price / 2)),
        boundedL(mix(h, 17), timeDimCount))

    case "catalog_returns" =>
      val sale = row("catalog_sales", sf, idx * 10)
      val h = mix(14, idx)
      val qty = 1 + bounded(mix(h, 1), sale(12).asInstanceOf[Int])
      val amt = 100L * qty + boundedL(mix(h, 2), 10000)
      Array(sale(0).asInstanceOf[Long] + 1 + bounded(mix(h, 3), 30),
        sale(7), sale(4), sale(11), qty, money(amt), money(amt / 2), sale(3),
        sale(2), sale(9), boundedL(mix(h, 4), reasonCount(sf)) + 1)

    case "web_sales" =>
      val h = mix(15, idx)
      val qty = 1 + bounded(mix(h, 1), 100)
      val price = 100 + boundedL(mix(h, 2), 29900)
      val sold = saleDay(mix(h, 3))
      Array(dateSk(sold), dateSk(sold + 1 + bounded(mix(h, 4), 120)),
        boundedL(mix(h, 5), itemCount(sf)) + 1,
        boundedL(mix(h, 6), customerCount(sf)) + 1,
        boundedL(mix(h, 16), customerAddressCount(sf)) + 1,
        boundedL(mix(h, 7), webSiteCount(sf)) + 1,
        boundedL(mix(h, 12), timeDimCount),
        boundedL(mix(h, 13), householdDemographicsCount) + 1,
        boundedL(mix(h, 14), webPageCount(sf)) + 1,
        boundedL(mix(h, 9), shipModeCount(sf)) + 1,
        boundedL(mix(h, 10), warehouseCount(sf)) + 1,
        idx + 1, qty, money(price), money(qty * price),
        money(boundedL(mix(h, 11), qty * price / 10 + 1)),
        money(qty * price),
        money(qty * price / 5 - boundedL(mix(h, 8), qty * price / 2)),
        boundedL(mix(h, 17), promotionCount(sf)) + 1)

    case "web_returns" =>
      val sale = row("web_sales", sf, idx * 10)
      val h = mix(16, idx)
      val qty = 1 + bounded(mix(h, 1), sale(12).asInstanceOf[Int])
      val amt = 100L * qty + boundedL(mix(h, 2), 10000)
      Array(sale(0).asInstanceOf[Long] + 1 + bounded(mix(h, 3), 30),
        sale(2), sale(11), qty, money(amt), money(amt / 2),
        sale(3), sale(4), boundedL(mix(h, 4), reasonCount(sf)) + 1,
        money(amt * 3 / 4))

    case "customer" =>
      val k = idx + 1
      val h = mix(17, k)
      Array(k, str(f"AAAAAAAA$k%08d"),
        boundedL(mix(h, 1), customerAddressCount(sf)) + 1,
        str(s"First${bounded(mix(h, 2), 1000)}"),
        str(s"Last${bounded(mix(h, 3), 1000)}"),
        boundedL(mix(h, 4), customerDemographicsCount) + 1,
        boundedL(mix(h, 5), householdDemographicsCount) + 1,
        str(if ((mix(h, 6) & 1) == 0) "Y" else "N"),
        1920 + bounded(mix(h, 7), 73),
        1 + bounded(mix(h, 8), 12),
        str(birthCountries(bounded(mix(h, 9), birthCountries.length))))

    case "customer_address" =>
      val k = idx + 1
      val h = mix(18, k)
      Array(k, str(f"CA$k%010d"), str(s"City${bounded(mix(h, 3), 500)}"),
        str(states(bounded(mix(h, 1), states.length))),
        str(f"${10000 + bounded(mix(h, 2), 89999)}%05d"),
        Decimal(BigDecimal(-500 - 100L * bounded(mix(h, 4), 4), 2), 5, 2))

    case "item" =>
      val k = idx + 1
      val h = mix(19, k)
      val brandId = 1 + bounded(mix(h, 1), 1000)
      val manufactId = 1 + bounded(mix(h, 2), 1000)
      val categoryId = 1 + bounded(mix(h, 3), categories.length)
      Array(k, str(f"I$k%012d"), str(s"Description of item $k"), brandId,
        str(s"brand#${brandId % 100}"),
        str(s"class${bounded(mix(h, 5), 16)}"),
        categoryId,
        str(categories(categoryId - 1)),
        manufactId,
        str(f"manufact#$manufactId%04d"),
        1 + bounded(mix(h, 6), 100),
        money(100 + boundedL(mix(h, 4), 9900)),
        str(colors(bounded(mix(h, 7), colors.length))),
        str(f"product#$k%010d"),
        str(sizes(bounded(mix(h, 9), sizes.length))),
        str(unitsPool(bounded(mix(h, 10), unitsPool.length))),
        str(containers(bounded(mix(h, 11), containers.length))))

    case "store" =>
      val k = idx + 1
      Array(k, str(f"S$k%08d"), str(s"Store $k"),
        str(s"County ${bounded(mix(22, k), 30)}"),
        str(states(bounded(mix(20, k), states.length))),
        str(f"${10000 + bounded(mix(21, k), 89999)}%05d"),
        str(s"City${bounded(mix(29, k), 500)}"),
        Decimal(BigDecimal(-500 - 100L * bounded(mix(30, k), 4), 2), 5, 2))

    case "warehouse" =>
      val k = idx + 1
      Array(k, str(s"Warehouse $k"),
        str(states(bounded(mix(31, k), states.length))))

    case "call_center" =>
      val k = idx + 1
      Array(k, str(f"CC$k%06d"), str(s"Center $k"),
        str(s"County ${bounded(mix(32, k), 30)}"))

    case "catalog_page" =>
      val k = idx + 1
      Array(k, str(f"CP$k%010d"))

    case "web_site" =>
      val k = idx + 1
      Array(k, str(f"WS$k%06d"), str(s"site_$k"))

    case "ship_mode" =>
      val k = idx + 1
      Array(k, str(f"SM$k%04d"), str(shipModeTypes(idx.toInt % shipModeTypes.length)))

    case "promotion" =>
      val k = idx + 1
      def yn(h: Long): UTF8String = str(if ((h & 1) == 0) "Y" else "N")
      Array(k, str(f"P$k%08d"), yn(mix(23, k)), yn(mix(24, k)), yn(mix(25, k)), yn(mix(26, k)))

    case "customer_demographics" =>
      // spec layout: the sk ENCODES the demographic cross product
      val k = idx + 1
      val maritals = Array("M", "S", "D", "W", "U")
      val educations = Array("Primary", "Secondary", "College", "2 yr Degree",
        "4 yr Degree", "Advanced Degree", "Unknown")
      val credits = Array("Low Risk", "Good", "High Risk", "Unknown")
      Array(k, str(if (idx % 2 == 0) "M" else "F"),
        str(maritals(((idx / 2) % 5).toInt)),
        str(educations(((idx / 10) % 7).toInt)),
        (500 * (1 + (idx / 70) % 20)).toInt,
        str(credits(((idx / 1400) % 4).toInt)),
        ((idx / 5600) % 7).toInt, ((idx / 39200) % 7).toInt, ((idx / 274400) % 7).toInt)

    case "household_demographics" =>
      val k = idx + 1
      val potentials = Array(">10000", "5001-10000", "1001-5000", "501-1000", "0-500", "Unknown")
      Array(k, (idx % incomeBandCount) + 1,
        str(potentials(((idx / 20) % 6).toInt)),
        ((idx / 120) % 10).toInt, ((idx / 1200) % 6).toInt)

    case "time_dim" =>
      val sec = idx
      val hour = (sec / 3600).toInt
      val meal =
        if (hour >= 6 && hour <= 8) str("breakfast")
        else if (hour >= 18 && hour <= 20) str("dinner")
        else null
      Array(sec, str(f"T$sec%06d"), sec.toInt, hour,
        ((sec / 60) % 60).toInt, (sec % 60).toInt, meal)

    case "income_band" =>
      val k = idx + 1
      Array(k, (idx * 10000).toInt, (idx * 10000 + 9999).toInt)

    case "reason" =>
      val k = idx + 1
      Array(k, str(f"R$k%04d"), str(s"reason $k"))

    case "web_page" =>
      val k = idx + 1
      Array(k, str(f"WP$k%06d"), (100 + bounded(mix(27, k), 7000)).toInt)

    case "inventory" =>
      // idx enumerates (week, item, warehouse) lexicographically
      val nItems = itemCount(sf)
      val nWh = warehouseCount(sf)
      val week = idx / (nItems * nWh)
      val rem = idx % (nItems * nWh)
      val item = rem / nWh + 1
      val wh = rem % nWh + 1
      Array(dateSk(saleLoPub + week * 7), item, wh,
        bounded(mix(mix(28, idx), 1), 1000))
  }
}
