package graft.sources.tpch

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 TPC-H generator catalog: `spark.sql.catalog.tpch =
  * graft.sources.tpch.TpchCatalog`, then `SELECT * FROM
  * tpch.sf1.lineitem`. Namespaces are scale factors (`tiny` = 0.01,
  * `sf1`, `sf10`, `sf0_1`, ...); rows are generated on executors in
  * chunked input partitions, so a `tpch.sf1000` scan is 1000-way-
  * parallel data generation with no driver materialization.
  *
  * Matches the reference connector's surface (TableCatalog +
  * SupportsNamespaces, `SupportsReportStatistics` scans so CBO and the
  * broadcast threshold see generated-table sizes, chunked
  * `PartitionReader[InternalRow]`): reference
  * kyuubi-spark-connector-tpch/src/main/scala/org/apache/kyuubi/spark/connector/tpch/TPCHCatalog.scala
  * and TPCHBatchScan.scala:28-103.
  */
class TpchCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "tpch"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listNamespaces(): Array[Array[String]] =
    TpchCatalog.namedScales.keys.map(Array(_)).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && TpchCatalog.scaleOf(namespace(0)).isDefined
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("tpch catalog is read-only")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("tpch catalog is read-only")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("tpch catalog is read-only")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    TpchGen.schemas.keys.map(Identifier.of(namespace, _)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val sf = if (ident.namespace().length == 1) TpchCatalog.scaleOf(ident.namespace()(0)) else None
    sf match {
      case Some(scale) if TpchGen.schemas.contains(ident.name().toLowerCase) =>
        new TpchTable(ident.name().toLowerCase, scale, ident.namespace())
      case _ => throw new NoSuchTableException(ident)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("tpch catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("tpch catalog is read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("tpch catalog is read-only")
}

object TpchCatalog {
  val namedScales: Map[String, Double] = Map("tiny" -> 0.01)

  /** `tiny`, or `sfN` / `sfN_M` (underscore = decimal point, since dots
    * delimit namespaces): sf1 -> 1.0, sf0_1 -> 0.1.
    */
  def scaleOf(ns: String): Option[Double] = {
    val n = ns.toLowerCase
    namedScales.get(n).orElse {
      if (n.startsWith("sf"))
        scala.util.Try(n.stripPrefix("sf").replace('_', '.').toDouble).toOption.filter(_ > 0)
      else None
    }
  }
}

class TpchTable(table: String, sf: Double, namespace: Array[String] = Array.empty)
    extends Table with SupportsRead {
  override def name(): String = s"tpch.$table(sf=$sf)"
  override def schema(): StructType = TpchGen.schemas(table)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TpchScanBuilder(table, sf)

  /** The TPC-H spec's informational key constraints (spec §1.4.2),
    * surfaced through Spark 4's DSv2 constraint API so JDBC
    * GetPrimaryKeys/GetCrossReference return real metadata.
    */
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    TpchTable.constraintsFor(table, namespace)
}

object TpchTable {
  import org.apache.spark.sql.connector.catalog.constraints.Constraint
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}

  private def cols(names: String*): Array[NamedReference] =
    names.map(Expressions.column).toArray

  /** (pk columns, fks: (fk cols, referenced table, referenced cols)). */
  private val keys: Map[String, (Seq[String], Seq[(Seq[String], String, Seq[String])])] = Map(
    "region" -> (Seq("r_regionkey") -> Seq.empty),
    "nation" -> (Seq("n_nationkey") ->
      Seq((Seq("n_regionkey"), "region", Seq("r_regionkey")))),
    "part" -> (Seq("p_partkey") -> Seq.empty),
    "supplier" -> (Seq("s_suppkey") ->
      Seq((Seq("s_nationkey"), "nation", Seq("n_nationkey")))),
    "partsupp" -> (Seq("ps_partkey", "ps_suppkey") -> Seq(
      (Seq("ps_partkey"), "part", Seq("p_partkey")),
      (Seq("ps_suppkey"), "supplier", Seq("s_suppkey")))),
    "customer" -> (Seq("c_custkey") ->
      Seq((Seq("c_nationkey"), "nation", Seq("n_nationkey")))),
    "orders" -> (Seq("o_orderkey") ->
      Seq((Seq("o_custkey"), "customer", Seq("c_custkey")))),
    "lineitem" -> (Seq("l_orderkey", "l_linenumber") -> Seq(
      (Seq("l_orderkey"), "orders", Seq("o_orderkey")),
      (Seq("l_partkey", "l_suppkey"), "partsupp", Seq("ps_partkey", "ps_suppkey")))))

  def constraintsFor(table: String, namespace: Array[String]): Array[Constraint] =
    keys.get(table).map { case (pk, fks) =>
      val pkC: Constraint = Constraint.primaryKey(s"${table}_pk", cols(pk: _*)).build()
      val fkCs: Seq[Constraint] = fks.map { case (from, refTable, to) =>
        Constraint.foreignKey(s"${table}_${refTable}_fk", cols(from: _*),
          Identifier.of(namespace, refTable), cols(to: _*)).build()
      }
      (pkC +: fkCs).toArray
    }.getOrElse(Array.empty)
}

/** Column pruning is pushed into generation: un-projected columns are
  * never generated (string/comment synthesis dominates row cost).
  */
class TpchScanBuilder(table: String, sf: Double)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TpchGen.schemas(table)
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TpchScan(table, sf, required)
}

class TpchScan(table: String, sf: Double, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  private val fullSchema = TpchGen.schemas(table)
  private val projection: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"TpchScan($table, sf=$sf)"

  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = TpchGen.estimatedRows(table, sf)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(rows * TpchGen.avgRowBytes(table))
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val total = TpchGen.baseRowCount(table, sf)
    // target ~64 MB of generated data per split
    val rowsPerSplit = math.max(1L, (64L << 20) / TpchGen.avgRowBytes(table))
    val nSplits = ((total + rowsPerSplit - 1) / rowsPerSplit).toInt
    (0 until nSplits).map { i =>
      val start = i * rowsPerSplit
      TpchInputPartition(table, sf, start, math.min(start + rowsPerSplit, total))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val proj = projection
    val t = table
    val scale = sf
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[TpchInputPartition]
        new TpchPartitionReader(p, proj)
      }
    }
  }
}

case class TpchInputPartition(table: String, sf: Double, start: Long, end: Long)
    extends InputPartition

/** Generates `[start, end)` base rows (orders expand to their lineitems
  * for the lineitem table); projects to the pruned column set.
  */
class TpchPartitionReader(p: TpchInputPartition, projection: Array[Int])
    extends PartitionReader[InternalRow] {

  private var idx: Long = p.start
  private var pending: Iterator[Array[Any]] = Iterator.empty
  private var current: InternalRow = _

  private def fullRow(i: Long): Array[Any] = p.table match {
    case "region" => TpchGen.regionRow(i)
    case "nation" => TpchGen.nationRow(i)
    case "supplier" => TpchGen.supplierRow(i)
    case "part" => TpchGen.partRow(i)
    case "partsupp" => TpchGen.partsuppRow(i, p.sf)
    case "customer" => TpchGen.customerRow(i)
    case "orders" => TpchGen.ordersRow(i, p.sf)
  }

  private def project(values: Array[Any]): InternalRow = {
    val out = new Array[Any](projection.length)
    var i = 0
    while (i < projection.length) { out(i) = values(projection(i)); i += 1 }
    new GenericInternalRow(out)
  }

  override def next(): Boolean = {
    if (pending.hasNext) { current = project(pending.next()); true }
    else if (idx >= p.end) false
    else if (p.table == "lineitem") {
      pending = TpchGen.lineitemRows(idx, p.sf).iterator
      idx += 1
      next()
    } else {
      current = project(fullRow(idx))
      idx += 1
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
