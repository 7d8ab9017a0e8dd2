package graft.sources.tpcds

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

import graft.sources.tpch.TpchCatalog.scaleOf

/** DataSourceV2 TPC-DS generator catalog (benchmark-slice schema):
  * `spark.sql.catalog.tpcds = graft.sources.tpcds.TpcdsCatalog`, then
  * `SELECT ... FROM tpcds.sf10.store_sales`. Same chunked,
  * statistics-reporting, column-pruning scan machinery as the TPC-H
  * catalog (reference: TPCDSCatalog.scala:32-90,
  * TPCDSBatchScan.scala:28-103).
  */
class TpcdsCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = "tpcds"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listNamespaces(): Array[Array[String]] = Array(Array("tiny"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && scaleOf(namespace(0)).isDefined
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("tpcds catalog is read-only")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("tpcds catalog is read-only")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("tpcds catalog is read-only")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    TpcdsGen.schemas.keys.map(Identifier.of(namespace, _)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val sf = if (ident.namespace().length == 1) scaleOf(ident.namespace()(0)) else None
    sf match {
      case Some(scale) if TpcdsGen.schemas.contains(ident.name().toLowerCase) =>
        new TpcdsTable(ident.name().toLowerCase, scale)
      case _ => throw new NoSuchTableException(ident)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("tpcds catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("tpcds catalog is read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("tpcds catalog is read-only")
}

class TpcdsTable(table: String, sf: Double) extends Table with SupportsRead {
  override def name(): String = s"tpcds.$table(sf=$sf)"
  override def schema(): StructType = TpcdsGen.schemas(table)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TpcdsScanBuilder(table, sf)
}

class TpcdsScanBuilder(table: String, sf: Double)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TpcdsGen.schemas(table)
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TpcdsScan(table, sf, required)
}

class TpcdsScan(table: String, sf: Double, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {

  private val fullSchema = TpcdsGen.schemas(table)
  private val projection: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"TpcdsScan($table, sf=$sf)"

  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = TpcdsGen.rowCount(table, sf)
    override def sizeInBytes(): util.OptionalLong =
      util.OptionalLong.of(rows * TpcdsGen.avgRowBytes(table))
    override def numRows(): util.OptionalLong = util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val total = TpcdsGen.rowCount(table, sf)
    val rowsPerSplit = math.max(1L, (64L << 20) / TpcdsGen.avgRowBytes(table))
    val nSplits = ((total + rowsPerSplit - 1) / rowsPerSplit).toInt
    (0 until nSplits).map { i =>
      val start = i * rowsPerSplit
      TpcdsInputPartition(table, sf, start, math.min(start + rowsPerSplit, total))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val proj = projection
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new TpcdsPartitionReader(partition.asInstanceOf[TpcdsInputPartition], proj)
    }
  }
}

case class TpcdsInputPartition(table: String, sf: Double, start: Long, end: Long)
    extends InputPartition

class TpcdsPartitionReader(p: TpcdsInputPartition, projection: Array[Int])
    extends PartitionReader[InternalRow] {
  private var idx: Long = p.start
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (idx >= p.end) return false
    val values = TpcdsGen.row(p.table, p.sf, idx)
    val out = new Array[Any](projection.length)
    var i = 0
    while (i < projection.length) { out(i) = values(projection(i)); i += 1 }
    current = new GenericInternalRow(out)
    idx += 1
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
