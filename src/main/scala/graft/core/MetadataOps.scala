package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC-style metadata operations over the Spark catalog, covering the
  * reference's Get* operation family (engine/spark/operation/
  * {GetCatalogs,GetSchemas,GetTables,GetColumns,GetFunctions,
  * GetTableTypes,GetTypeInfo}.scala, catalog walk GetTables.scala:75).
  * Results are DataFrames in the JDBC result-set column layout.
  */
object MetadataOps {
  import org.apache.spark.sql.functions._

  def getCatalogs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sessionState.catalogManager.listCatalogs(None)
      .toDF("TABLE_CAT")
  }

  def getSchemas(spark: SparkSession, pattern: String = "*"): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases(pattern)
      .select(col("name").as("TABLE_SCHEM"), col("catalog").as("TABLE_CATALOG"))
  }

  def getTables(spark: SparkSession, dbPattern: String = "*", tablePattern: String = "*"): DataFrame = {
    spark.catalog.listTables(spark.catalog.currentDatabase, tablePattern)
      .select(
        col("catalog").as("TABLE_CAT"),
        col("namespace").cast("string").as("TABLE_SCHEM"),
        col("name").as("TABLE_NAME"),
        col("tableType").as("TABLE_TYPE"),
        col("description").as("REMARKS"))
  }

  def getColumns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val df = spark.table(table)
    val rows = df.schema.fields.zipWithIndex.map { case (f, i) =>
      (table, f.name, SchemaMapper.toWireType(f.dataType),
        SchemaMapper.toJavaSQLType(f.dataType),
        SchemaMapper.getColumnSize(f.dataType).getOrElse(0),
        SchemaMapper.getDecimalDigits(f.dataType).getOrElse(0),
        SchemaMapper.getNumPrecRadix(f.dataType).getOrElse(0),
        f.nullable, i + 1)
    }.toSeq
    rows.toDF("TABLE_NAME", "COLUMN_NAME", "TYPE_NAME", "DATA_TYPE",
      "COLUMN_SIZE", "DECIMAL_DIGITS", "NUM_PREC_RADIX", "IS_NULLABLE",
      "ORDINAL_POSITION")
  }

  def getFunctions(spark: SparkSession, pattern: String = "*"): DataFrame = {
    spark.catalog.listFunctions()
      .select(col("name").as("FUNCTION_NAME"),
        col("className").as("SPECIFIC_NAME"),
        col("description").as("REMARKS"),
        col("isTemporary").as("IS_TEMP"))
  }

  def getTableTypes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("TABLE", "VIEW").toDF("TABLE_TYPE")
  }

  def getTypeInfo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val types: Seq[DataType] = Seq(NullType, BooleanType, ByteType, ShortType,
      IntegerType, LongType, FloatType, DoubleType, StringType,
      DecimalType.SYSTEM_DEFAULT, DateType, TimestampType, BinaryType)
    types.map { t =>
      (SchemaMapper.toWireType(t), SchemaMapper.toJavaSQLType(t),
        SchemaMapper.getColumnSize(t).getOrElse(0),
        SchemaMapper.getDecimalDigits(t).getOrElse(0),
        SchemaMapper.getNumPrecRadix(t).getOrElse(0))
    }.toDF("TYPE_NAME", "DATA_TYPE", "PRECISION", "DECIMAL_DIGITS", "NUM_PREC_RADIX")
  }

  def getCurrentCatalog(spark: SparkSession): String =
    spark.catalog.currentCatalog()

  def getCurrentDatabase(spark: SparkSession): String =
    spark.catalog.currentDatabase

  def setCurrentDatabase(spark: SparkSession, db: String): Unit =
    spark.catalog.setCurrentDatabase(db)
}

/** EXPLAIN-as-operation: the reference's plan-only modes
  * (engine/spark/operation/PlanOnlyStatement.scala:100-161) — return
  * a chosen compilation phase of the statement instead of executing it.
  */
object PlanOnly {
  sealed trait Mode
  case object Parse extends Mode
  case object Analyze extends Mode
  case object Optimize extends Mode
  case object Physical extends Mode
  case object Execution extends Mode

  def run(spark: SparkSession, statement: String, mode: Mode): String = {
    val parsed = spark.sessionState.sqlParser.parsePlan(statement)
    mode match {
      case Parse => parsed.toString
      case Analyze =>
        spark.sessionState.analyzer.execute(parsed).toString
      case Optimize =>
        val analyzed = spark.sessionState.analyzer.execute(parsed)
        spark.sessionState.analyzer.checkAnalysis(analyzed)
        spark.sessionState.optimizer.execute(analyzed).toString
      case Physical =>
        spark.sql(statement).queryExecution.sparkPlan.toString
      case Execution =>
        spark.sql(statement).queryExecution.executedPlan.toString
    }
  }
}
