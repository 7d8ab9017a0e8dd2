package graft.sources.tpch

import java.time.LocalDate

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.Decimal

/** Deterministic TPC-H-shaped row generation.
  *
  * Unlike dbgen (sequential RNG state per stream), every field is a pure
  * function of (table, rowIndex) via splitmix64 chains, so any executor
  * can generate any row range independently — the property that makes
  * the connector embarrassingly parallel at any scale factor. The
  * reference connector gets the same property by seeking trino-tpch
  * generators to a chunk offset (TPCHBatchScan pattern,
  * kyuubi-spark-connector-tpch/src/main/scala/org/apache/kyuubi/spark/connector/tpch/TPCHBatchScan.scala).
  *
  * Schemas are the full TPC-H spec column sets (incl. partsupp and the
  * comment/date columns the slim testdata lacks); money is DECIMAL(12,2)
  * generated in exact cents, dates are DateType.
  */
object TpchGen {

  // --- deterministic hashing -------------------------------------------------
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def mix(a: Long, b: Long): Long = mix(mix(a) ^ b)
  /** Uniform in [0, n). */
  def bounded(h: Long, n: Int): Int = (((h >>> 1) % n).toInt)
  def boundedL(h: Long, n: Long): Long = ((h >>> 1) % n)

  // --- vocabulary ------------------------------------------------------------
  val regions: Array[String] = Array("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  /** Spec nation list with its region mapping (TPC-H spec table 4.2.3). */
  val nations: Array[(String, Int)] = Array(
    "ALGERIA" -> 0, "ARGENTINA" -> 1, "BRAZIL" -> 1, "CANADA" -> 1, "EGYPT" -> 4,
    "ETHIOPIA" -> 0, "FRANCE" -> 3, "GERMANY" -> 3, "INDIA" -> 2, "INDONESIA" -> 2,
    "IRAN" -> 4, "IRAQ" -> 4, "JAPAN" -> 2, "JORDAN" -> 4, "KENYA" -> 0,
    "MOROCCO" -> 0, "MOZAMBIQUE" -> 0, "PERU" -> 1, "CHINA" -> 2, "ROMANIA" -> 3,
    "SAUDI ARABIA" -> 4, "VIETNAM" -> 2, "RUSSIA" -> 3, "UNITED KINGDOM" -> 3,
    "UNITED STATES" -> 1)

  val segments: Array[String] =
    Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  val priorities: Array[String] =
    Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  val shipModes: Array[String] =
    Array("AIR", "FOB", "MAIL", "RAIL", "REG AIR", "SHIP", "TRUCK")
  val shipInstructs: Array[String] =
    Array("COLLECT COD", "DELIVER IN PERSON", "NONE", "TAKE BACK RETURN")
  val typeSyllable1: Array[String] = Array("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
  val typeSyllable2: Array[String] = Array("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
  val typeSyllable3: Array[String] = Array("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
  val containerSyllable1: Array[String] = Array("SM", "LG", "MED", "JUMBO", "WRAP")
  val containerSyllable2: Array[String] = Array("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")
  val nameWords: Array[String] = Array(
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black", "blanched",
    "blue", "blush", "brown", "burlywood", "burnished", "chartreuse", "chiffon", "chocolate",
    "coral", "cornflower", "cornsilk", "cream", "cyan", "dark", "deep", "dim",
    "dodger", "drab", "firebrick", "floral", "forest", "frosted", "gainsboro", "ghost",
    "goldenrod", "green", "grey", "honeydew", "hot", "indian", "ivory", "khaki")
  val commentWords: Array[String] = Array(
    "carefully", "quickly", "slyly", "furiously", "blithely", "final", "regular", "express",
    "special", "pending", "ironic", "even", "bold", "silent", "unusual", "daring",
    "accounts", "packages", "deposits", "requests", "instructions", "foxes", "pinto", "beans",
    "theodolites", "dependencies", "platelets", "excuses", "asymptotes", "courts", "ideas", "sleep",
    "among", "across", "against", "above", "along", "around", "atop", "beyond",
    "wake", "nag", "haggle", "cajole", "integrate", "detect", "engage", "maintain")

  val epochStart: Int = LocalDate.of(1992, 1, 1).toEpochDay.toInt
  val epochEnd: Int = LocalDate.of(1998, 8, 2).toEpochDay.toInt   // ENDDATE - 151 days
  val currentDate: Int = LocalDate.of(1995, 6, 17).toEpochDay.toInt
  val orderDateRange: Int = epochEnd - epochStart

  def words(h0: Long, n: Int, pool: Array[String]): UTF8String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(pool(bounded(mix(h0, i), pool.length)))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
  def comment(h: Long): UTF8String = words(h, 5 + bounded(mix(h, 99), 8), commentWords)
  def phone(nation: Int, h: Long): UTF8String = UTF8String.fromString(
    f"${10 + nation}%02d-${100 + bounded(mix(h, 1), 900)}%03d-${100 + bounded(mix(h, 2), 900)}%03d-${1000 + bounded(mix(h, 3), 9000)}%04d")
  def money(cents: Long): Decimal = Decimal(BigDecimal(cents, 2), 12, 2)
  def str(s: String): UTF8String = UTF8String.fromString(s)

  // --- scale ----------------------------------------------------------------
  def supplierCount(sf: Double): Long = math.max(1L, (10000 * sf).toLong)
  def partCount(sf: Double): Long = math.max(1L, (200000 * sf).toLong)
  def customerCount(sf: Double): Long = math.max(1L, (150000 * sf).toLong)
  def orderCount(sf: Double): Long = math.max(1L, (1500000 * sf).toLong)
  def partsuppCount(sf: Double): Long = partCount(sf) * 4

  /** p_retailprice in cents — the spec formula. */
  def partPriceCents(pk: Long): Long =
    90000 + ((pk / 10) % 20001) + 100 * (pk % 1000)

  // --- orders/lineitem shared derivations -----------------------------------
  final case class Line(
      lineNumber: Int, partKey: Long, suppKey: Long, quantity: Int,
      extendedPriceCents: Long, discountPct: Int, taxPct: Int,
      shipDate: Int, commitDate: Int, receiptDate: Int)

  def lineCountOf(orderKey: Long): Int = 1 + bounded(mix(orderKey, 7001), 7)

  def orderDateOf(orderKey: Long): Int =
    epochStart + bounded(mix(orderKey, 7002), orderDateRange)

  def custKeyOf(orderKey: Long, sf: Double): Long = {
    val n = customerCount(sf)
    var c = boundedL(mix(orderKey, 7003), n) + 1
    while (c % 3 == 0) c = (c % n) + 1   // spec: custkey never ≡ 0 (mod 3)
    c
  }

  def lineOf(orderKey: Long, ln: Int, sf: Double): Line = {
    val h = mix(mix(orderKey, 7100), ln)
    val pk = boundedL(mix(h, 1), partCount(sf)) + 1
    val sk = boundedL(mix(h, 2), supplierCount(sf)) + 1
    val qty = 1 + bounded(mix(h, 3), 50)
    val ext = qty * partPriceCents(pk)
    val disc = bounded(mix(h, 4), 11)          // 0..10 percent
    val tax = bounded(mix(h, 5), 9)            // 0..8 percent
    val od = orderDateOf(orderKey)
    val ship = od + 1 + bounded(mix(h, 6), 121)
    val commit = od + 30 + bounded(mix(h, 7), 61)
    val receipt = ship + 1 + bounded(mix(h, 8), 30)
    Line(ln + 1, pk, sk, qty, ext, disc, tax, ship, commit, receipt)
  }

  /** o_totalprice cents: sum of ext*(1-disc)*(1+tax), rounded half-up. */
  def orderTotalCents(orderKey: Long, sf: Double): Long = {
    var total = 0L
    val n = lineCountOf(orderKey)
    var i = 0
    while (i < n) {
      val l = lineOf(orderKey, i, sf)
      total += (l.extendedPriceCents * (100 - l.discountPct) * (100 + l.taxPct) + 5000) / 10000
      i += 1
    }
    total
  }

  def returnFlagOf(receiptDate: Int, h: Long): String =
    if (receiptDate <= currentDate) { if ((mix(h, 9) & 1) == 0) "R" else "A" } else "N"
  def lineStatusOf(shipDate: Int): String = if (shipDate > currentDate) "O" else "F"

  // --- schemas ---------------------------------------------------------------
  private def dec122 = DecimalType(12, 2)

  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType, nullable = false),
      StructField("r_name", StringType, nullable = false),
      StructField("r_comment", StringType, nullable = false))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType, nullable = false),
      StructField("n_name", StringType, nullable = false),
      StructField("n_regionkey", IntegerType, nullable = false),
      StructField("n_comment", StringType, nullable = false))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType, nullable = false),
      StructField("s_name", StringType, nullable = false),
      StructField("s_address", StringType, nullable = false),
      StructField("s_nationkey", IntegerType, nullable = false),
      StructField("s_phone", StringType, nullable = false),
      StructField("s_acctbal", dec122, nullable = false),
      StructField("s_comment", StringType, nullable = false))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType, nullable = false),
      StructField("p_name", StringType, nullable = false),
      StructField("p_mfgr", StringType, nullable = false),
      StructField("p_brand", StringType, nullable = false),
      StructField("p_type", StringType, nullable = false),
      StructField("p_size", IntegerType, nullable = false),
      StructField("p_container", StringType, nullable = false),
      StructField("p_retailprice", dec122, nullable = false),
      StructField("p_comment", StringType, nullable = false))),
    "partsupp" -> StructType(Seq(
      StructField("ps_partkey", LongType, nullable = false),
      StructField("ps_suppkey", LongType, nullable = false),
      StructField("ps_availqty", IntegerType, nullable = false),
      StructField("ps_supplycost", dec122, nullable = false),
      StructField("ps_comment", StringType, nullable = false))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType, nullable = false),
      StructField("c_name", StringType, nullable = false),
      StructField("c_address", StringType, nullable = false),
      StructField("c_nationkey", IntegerType, nullable = false),
      StructField("c_phone", StringType, nullable = false),
      StructField("c_acctbal", dec122, nullable = false),
      StructField("c_mktsegment", StringType, nullable = false),
      StructField("c_comment", StringType, nullable = false))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_custkey", LongType, nullable = false),
      StructField("o_orderstatus", StringType, nullable = false),
      StructField("o_totalprice", dec122, nullable = false),
      StructField("o_orderdate", DateType, nullable = false),
      StructField("o_orderpriority", StringType, nullable = false),
      StructField("o_clerk", StringType, nullable = false),
      StructField("o_shippriority", IntegerType, nullable = false),
      StructField("o_comment", StringType, nullable = false))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType, nullable = false),
      StructField("l_partkey", LongType, nullable = false),
      StructField("l_suppkey", LongType, nullable = false),
      StructField("l_linenumber", IntegerType, nullable = false),
      StructField("l_quantity", dec122, nullable = false),
      StructField("l_extendedprice", dec122, nullable = false),
      StructField("l_discount", dec122, nullable = false),
      StructField("l_tax", dec122, nullable = false),
      StructField("l_returnflag", StringType, nullable = false),
      StructField("l_linestatus", StringType, nullable = false),
      StructField("l_shipdate", DateType, nullable = false),
      StructField("l_commitdate", DateType, nullable = false),
      StructField("l_receiptdate", DateType, nullable = false),
      StructField("l_shipinstruct", StringType, nullable = false),
      StructField("l_shipmode", StringType, nullable = false),
      StructField("l_comment", StringType, nullable = false))))

  val avgRowBytes: Map[String, Int] = Map(
    "region" -> 80, "nation" -> 90, "supplier" -> 140, "part" -> 150,
    "partsupp" -> 100, "customer" -> 160, "orders" -> 120, "lineitem" -> 130)

  /** Base row count for planning (lineitem is per-order expanded). */
  def baseRowCount(table: String, sf: Double): Long = table match {
    case "region" => regions.length.toLong
    case "nation" => nations.length.toLong
    case "supplier" => supplierCount(sf)
    case "part" => partCount(sf)
    case "partsupp" => partsuppCount(sf)
    case "customer" => customerCount(sf)
    case "orders" => orderCount(sf)
    case "lineitem" => orderCount(sf)   // split unit = order; ~4 lines each
  }

  /** Estimated output rows (for statistics). */
  def estimatedRows(table: String, sf: Double): Long =
    if (table == "lineitem") orderCount(sf) * 4 else baseRowCount(table, sf)

  // --- full-row generators (values in schema order, Catalyst types) ---------
  def regionRow(idx: Long): Array[Any] = {
    val i = idx.toInt
    Array(i, str(regions(i)), comment(mix(1, idx)))
  }

  def nationRow(idx: Long): Array[Any] = {
    val i = idx.toInt
    val (name, region) = nations(i)
    Array(i, str(name), region, comment(mix(2, idx)))
  }

  def supplierRow(idx: Long): Array[Any] = {
    val k = idx + 1
    val h = mix(3, k)
    val nation = bounded(mix(h, 1), nations.length)
    Array(k, str(f"Supplier#$k%09d"), words(mix(h, 2), 3, commentWords), nation,
      phone(nation, h), money(boundedL(mix(h, 3), 1099999) - 99999), comment(mix(h, 4)))
  }

  def partRow(idx: Long): Array[Any] = {
    val k = idx + 1
    val h = mix(4, k)
    val m = 1 + bounded(mix(h, 1), 5)
    val n = 1 + bounded(mix(h, 2), 5)
    val ptype = s"${typeSyllable1(bounded(mix(h, 3), 6))} ${typeSyllable2(bounded(mix(h, 4), 5))} ${typeSyllable3(bounded(mix(h, 5), 5))}"
    val container = s"${containerSyllable1(bounded(mix(h, 6), 5))} ${containerSyllable2(bounded(mix(h, 7), 8))}"
    Array(k, words(mix(h, 8), 5, nameWords), str(s"Manufacturer#$m"), str(s"Brand#$m$n"),
      str(ptype), 1 + bounded(mix(h, 9), 50), str(container),
      money(partPriceCents(k)), comment(mix(h, 10)))
  }

  def partsuppRow(idx: Long, sf: Double): Array[Any] = {
    val pk = idx / 4 + 1
    val i = (idx % 4).toInt
    val s = supplierCount(sf)
    // spec formula: the 4 suppliers of a part are spread across the key space
    val sk = (pk + i * (s / 4 + (pk - 1) / s)) % s + 1
    val h = mix(5, idx)
    Array(pk, sk, 1 + bounded(mix(h, 1), 9999),
      money(100 + boundedL(mix(h, 2), 99901)), comment(mix(h, 3)))
  }

  def customerRow(idx: Long): Array[Any] = {
    val k = idx + 1
    val h = mix(6, k)
    val nation = bounded(mix(h, 1), nations.length)
    Array(k, str(f"Customer#$k%09d"), words(mix(h, 2), 3, commentWords), nation,
      phone(nation, h), money(boundedL(mix(h, 3), 1099999) - 99999),
      str(segments(bounded(mix(h, 4), 5))), comment(mix(h, 5)))
  }

  def ordersRow(idx: Long, sf: Double): Array[Any] = {
    val k = idx + 1
    val h = mix(7, k)
    val od = orderDateOf(k)
    // order status derived from its lines: all shipped -> F, none -> O, else P
    val n = lineCountOf(k)
    var shipped = 0
    var i = 0
    while (i < n) { if (lineOf(k, i, sf).shipDate <= currentDate) shipped += 1; i += 1 }
    val status = if (shipped == n) "F" else if (shipped == 0) "O" else "P"
    Array(k, custKeyOf(k, sf), str(status), money(orderTotalCents(k, sf)), od,
      str(priorities(bounded(mix(h, 2), 5))),
      str(f"Clerk#${1 + boundedL(mix(h, 3), math.max(1L, (1000 * sf).toLong))}%09d"),
      0, comment(mix(h, 4)))
  }

  def lineitemRows(orderIdx: Long, sf: Double): Seq[Array[Any]] = {
    val ok = orderIdx + 1
    val n = lineCountOf(ok)
    (0 until n).map { i =>
      val l = lineOf(ok, i, sf)
      val h = mix(mix(ok, 7200), i.toLong)
      Array[Any](ok, l.partKey, l.suppKey, l.lineNumber,
        money(l.quantity * 100L), money(l.extendedPriceCents),
        money(l.discountPct.toLong), money(l.taxPct.toLong),
        str(returnFlagOf(l.receiptDate, h)), str(lineStatusOf(l.shipDate)),
        l.shipDate, l.commitDate, l.receiptDate,
        str(shipInstructs(bounded(mix(h, 1), 4))), str(shipModes(bounded(mix(h, 2), 7))),
        comment(mix(h, 3)))
    }
  }
}
