package graft.core

import org.apache.spark.sql.types._

/** Spark type → wire (HiveServer2-style) type mapping, reproducing the
  * reference's matrix (engine/spark/schema/SchemaHelper.scala:40-65,
  * 107-174): wire name, java.sql.Types id, column size, decimal
  * digits, and numeric radix per type.
  */
object SchemaMapper {

  def toWireType(dt: DataType): String = dt match {
    case NullType => "NULL"
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "STRING"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BINARY"
    case CalendarIntervalType => "STRING"
    case _: DayTimeIntervalType => "INTERVAL_DAY_TIME"
    case _: YearMonthIntervalType => "INTERVAL_YEAR_MONTH"
    case _: ArrayType => "ARRAY"
    case _: MapType => "MAP"
    case _: StructType => "STRUCT"
    case v if v.typeName == "variant" => "STRING"
    case udt: DataType => "USER_DEFINED"
  }

  def toJavaSQLType(dt: DataType): Int = dt match {
    case NullType => java.sql.Types.NULL
    case BooleanType => java.sql.Types.BOOLEAN
    case ByteType => java.sql.Types.TINYINT
    case ShortType => java.sql.Types.SMALLINT
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case FloatType => java.sql.Types.FLOAT
    case DoubleType => java.sql.Types.DOUBLE
    case StringType => java.sql.Types.VARCHAR
    case _: DecimalType => java.sql.Types.DECIMAL
    case DateType => java.sql.Types.DATE
    case TimestampType | TimestampNTZType => java.sql.Types.TIMESTAMP
    case BinaryType => java.sql.Types.BINARY
    case _: ArrayType => java.sql.Types.ARRAY
    case _: MapType => java.sql.Types.JAVA_OBJECT
    case _: StructType => java.sql.Types.STRUCT
    case _ => java.sql.Types.OTHER
  }

  /** Display/column size per type; fixed-size summation for structs
    * (ref SchemaHelper.getColumnSize:135-151).
    */
  def getColumnSize(dt: DataType): Option[Int] = dt match {
    // DecimalType IS a NumericType: this case must precede the numeric
    // catch-all or precision degrades to defaultSize (ref
    // SchemaHelper.getColumnSize:138-142 orders it the same way)
    case d: DecimalType => Some(d.precision)
    case dt @ (BooleanType | _: NumericType | DateType | TimestampType | TimestampNTZType |
        CalendarIntervalType | NullType) =>
      Some(dt.defaultSize)
    case StructType(fields) =>
      val sizes = fields.map(f => getColumnSize(f.dataType))
      if (sizes.forall(_.isDefined)) Some(sizes.flatten.sum) else None
    case _ => None
  }

  /** Decimal digits: scale for decimals, 0 for integral types, 7/15
    * for float/double, 6 (micros) for timestamps
    * (ref SchemaHelper.getDecimalDigits:161-169).
    */
  def getDecimalDigits(dt: DataType): Option[Int] = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType => Some(0)
    case FloatType => Some(7)
    case DoubleType => Some(15)
    case d: DecimalType => Some(d.scale)
    case TimestampType | TimestampNTZType => Some(6)
    case _ => None
  }

  def getNumPrecRadix(dt: DataType): Option[Int] = dt match {
    case _: NumericType => Some(10)
    case _ => None
  }
}
