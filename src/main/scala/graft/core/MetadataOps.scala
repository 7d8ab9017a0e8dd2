package graft.core

import scala.jdk.CollectionConverters._

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

  /** DSv2-aware walk: namespaces of every registered catalog plugin
    * (ref GetSchemas + SparkCatalogUtils: the reference enumerates all
    * catalogs, not just the session catalog).
    */
  def getSchemasAllCatalogs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.connector.catalog.SupportsNamespaces
    val mgr = spark.sessionState.catalogManager
    // conf-registered plugins are loaded lazily: enumerate
    // spark.sql.catalog.<name> keys rather than only-loaded catalogs
    val CatalogKey = "^spark\\.sql\\.catalog\\.([^.]+)$".r
    val confCatalogs = spark.conf.getAll.keys.collect { case CatalogKey(n) => n }
    val rows = (mgr.listCatalogs(None) ++ confCatalogs).distinct.flatMap { cat =>
      try mgr.catalog(cat) match {
        case ns: SupportsNamespaces =>
          ns.listNamespaces().map(n => (n.mkString("."), cat)).toSeq
        case _ => Seq.empty
      } catch { case _: Throwable => Seq.empty }
    }
    rows.toDF("TABLE_SCHEM", "TABLE_CATALOG")
  }

  /** DSv2-aware table walk over one catalog plugin's namespaces. */
  def getTablesForCatalog(spark: SparkSession, catalogName: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.connector.catalog.{SupportsNamespaces, TableCatalog}
    val mgr = spark.sessionState.catalogManager
    val rows = mgr.catalog(catalogName) match {
      case tc: TableCatalog with SupportsNamespaces =>
        tc.listNamespaces().flatMap(ns =>
          tc.listTables(ns).map(id =>
            (catalogName, id.namespace().mkString("."), id.name(), "TABLE", ""))).toSeq
      case _ => Seq.empty
    }
    rows.toDF("TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "TABLE_TYPE", "REMARKS")
  }

  /** Walks every database matching `dbPattern` (ref GetTables.scala:75
    * walks catalogs/namespaces; Spark's session catalog is the scope
    * here, with `listDatabases(pattern)` doing the namespace match).
    */
  def getTables(spark: SparkSession, dbPattern: String = "*", tablePattern: String = "*"): DataFrame = {
    import spark.implicits._
    val dbs = spark.catalog.listDatabases(dbPattern).collect().map(_.name)
    val perDb = dbs.toSeq.map(db => spark.catalog.listTables(db, tablePattern).toDF())
    val all = perDb match {
      case Nil =>
        // no database matched: empty frame in the same layout
        spark.catalog.listTables(spark.catalog.currentDatabase, "__graft_no_match__").toDF()
      case head +: tail => tail.foldLeft(head)(_ unionAll _)
    }
    val layout = all.select(
      col("catalog").as("TABLE_CAT"),
      // JDBC layout wants the plain dotted schema name, not the
      // array-cast rendering "[db]"
      array_join(col("namespace"), ".").as("TABLE_SCHEM"),
      col("name").as("TABLE_NAME"),
      col("tableType").as("TABLE_TYPE"),
      col("description").as("REMARKS"))
    // JDBC metadata must not reveal tables the session's user cannot
    // select (the reference filters SHOW/metadata listings through the
    // same privilege checks as queries — RuleReplaceShowObjectCommands
    // for SQL, this for the GetTables op). The denied set is finite
    // (policies are opt-in per table), one IN-list filter.
    spark.conf.getOption("spark.graft.authz.user")
      .filter(_ => graft.plans.AuthzPolicies.hasAccessPolicies) match {
      case Some(u) =>
        val groups = spark.conf.getOption("spark.graft.authz.groups")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
          .getOrElse(Set.empty[String])
        // db-qualified denied policies fold to bare names here: the
        // wire column carries bare names, conservative hiding
        val denied = graft.plans.AuthzPolicies.deniedTablesFor(u, groups)
          .map(_.split('.').last)
        if (denied.isEmpty) layout
        else layout.filter(!col("TABLE_NAME").isin(denied.toSeq.sorted: _*))
      case None => layout
    }
  }

  def getColumns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    // schema from catalog METADATA, not from analyzing `SELECT *`
    // (resolving a full-width frame would itself trip the per-column
    // privilege check for a user allowed only a subset — metadata
    // listing must filter, not fail)
    val schema =
      try {
        val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
        spark.sessionState.catalog.getTempViewOrPermanentTableMetadata(ident).schema
      } catch {
        // 3-part V2 identifiers (catalog.ns.table) live outside the
        // session catalog — resolve through the analyzer (no policies
        // can name V2 tables in our table-keyed store, so the
        // privilege rule stays inert on this path)
        case _: Exception => spark.table(table).schema
      }
    // like SHOW COLUMNS / GetTables: JDBC metadata must not reveal
    // columns the session's user cannot select
    val colAllowed: String => Boolean =
      spark.conf.getOption("spark.graft.authz.user")
        .filter(_ => graft.plans.AuthzPolicies.hasAccessPolicies) match {
        case Some(u) =>
          val groups = spark.conf.getOption("spark.graft.authz.groups")
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
            .getOrElse(Set.empty[String])
          // db.table resource (bare-policy fallback handled inside);
          // a 3-part V2 name folds to its trailing db.table pair
          val resource = {
            val parts = table.split('.')
            if (parts.length >= 2) parts.takeRight(2).mkString(".") else table
          }
          c => graft.plans.AuthzPolicies.decideColumnAccess(u, groups, resource, c)
        case None => _ => true
      }
    val rows = schema.fields.zipWithIndex
      .filter { case (f, _) => colAllowed(f.name) }
      .map { case (f, i) =>
      (table, f.name, SchemaMapper.toWireType(f.dataType),
        SchemaMapper.toJavaSQLType(f.dataType),
        SchemaMapper.getColumnSize(f.dataType).getOrElse(0),
        SchemaMapper.getDecimalDigits(f.dataType).getOrElse(0),
        SchemaMapper.getNumPrecRadix(f.dataType).getOrElse(0),
        // JDBC layout: NULLABLE is the integer DatabaseMetaData code,
        // IS_NULLABLE the 'YES'/'NO' string (ref GetColumns)
        if (f.nullable) java.sql.DatabaseMetaData.columnNullable
        else java.sql.DatabaseMetaData.columnNoNulls,
        if (f.nullable) "YES" else "NO",
        i + 1)
    }.toSeq
    rows.toDF("TABLE_NAME", "COLUMN_NAME", "TYPE_NAME", "DATA_TYPE",
      "COLUMN_SIZE", "DECIMAL_DIGITS", "NUM_PREC_RADIX", "NULLABLE",
      "IS_NULLABLE", "ORDINAL_POSITION")
  }

  /** Empty frame in the getColumns layout (wildcard walk, no match). */
  def noColumns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String, Int, Int, Int, Int, Int, String, Int)]
      .toDF("TABLE_NAME", "COLUMN_NAME", "TYPE_NAME", "DATA_TYPE",
        "COLUMN_SIZE", "DECIMAL_DIGITS", "NUM_PREC_RADIX", "NULLABLE",
        "IS_NULLABLE", "ORDINAL_POSITION")
  }

  /** Constraint metadata where Spark exposes it: DSv2 tables carry
    * informational constraints through `Table.constraints()` (Spark 4's
    * constraint API), which is walked here. V1 session-catalog tables
    * (parquet/hive) have NO constraint metadata in Spark's catalog —
    * for those the result is empty with the JDBC layout, exactly the
    * reference's behavior (kyuubi-server/.../operation/
    * {GetPrimaryKeys,GetCrossReference} forward to the engine, which
    * serves what the catalog knows).
    */
  private def v2Constraints(spark: SparkSession, catalog: String, schema: String,
      table: String): Seq[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    // CatalogManager resolves catalog confs through SQLConf.get — the
    // THREAD-ACTIVE session — so the gateway session must be active
    // here or its spark.sql.catalog.* settings are invisible (restored
    // after, per the shared-context discipline).
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(spark)
    try {
      spark.sessionState.catalogManager.catalog(catalog) match {
        case tc: TableCatalog =>
          tc.loadTable(Identifier.of(Array(schema), table)).constraints().toSeq
        case _ => Seq.empty
      }
    } catch { case _: Throwable => Seq.empty } // unknown catalog/table → empty
    finally {
      prev match {
        case Some(p) => SparkSession.setActiveSession(p)
        case None => SparkSession.clearActiveSession()
      }
    }
  }

  def getPrimaryKeys(spark: SparkSession, catalog: String = "",
      schema: String = "", table: String = ""): DataFrame = {
    import org.apache.spark.sql.connector.catalog.constraints.PrimaryKey
    val rows = v2Constraints(spark, catalog, schema, table).collect {
      case pk: PrimaryKey =>
        pk.columns().zipWithIndex.map { case (c, i) =>
          org.apache.spark.sql.Row(catalog, schema, table, c.fieldNames.mkString("."),
            i + 1, pk.name())
        }.toSeq
    }.flatten
    spark.createDataFrame(rows.asJava, pkSchema)
  }

  private val pkSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("TABLE_CAT", StringType), StructField("TABLE_SCHEM", StringType),
      StructField("TABLE_NAME", StringType), StructField("COLUMN_NAME", StringType),
      StructField("KEY_SEQ", IntegerType), StructField("PK_NAME", StringType)))
  }

  /** Foreign keys of `fTable` that reference `pTable` (JDBC
    * getCrossReference contract); empty parent names match any.
    */
  def getCrossReference(spark: SparkSession,
      pCatalog: String = "", pSchema: String = "", pTable: String = "",
      fCatalog: String = "", fSchema: String = "", fTable: String = ""): DataFrame = {
    import org.apache.spark.sql.connector.catalog.constraints.ForeignKey
    val rows = v2Constraints(spark, fCatalog, fSchema, fTable).collect {
      case fk: ForeignKey
          if pTable.isEmpty || fk.referencedTable().name().equalsIgnoreCase(pTable) =>
        fk.columns().zip(fk.referencedColumns()).zipWithIndex.map {
          case ((from, to), i) =>
            org.apache.spark.sql.Row(
              pCatalog, fk.referencedTable().namespace().mkString("."),
              fk.referencedTable().name(), to.fieldNames.mkString("."),
              fCatalog, fSchema, fTable, from.fieldNames.mkString("."),
              i + 1,
              // importedKeyNoAction: informational constraints declare
              // no referential action
              3, 3, fk.name(), null)
        }.toSeq
    }.flatten
    spark.createDataFrame(rows.asJava, crossRefSchema)
  }

  private val crossRefSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("PKTABLE_CAT", StringType), StructField("PKTABLE_SCHEM", StringType),
      StructField("PKTABLE_NAME", StringType), StructField("PKCOLUMN_NAME", StringType),
      StructField("FKTABLE_CAT", StringType), StructField("FKTABLE_SCHEM", StringType),
      StructField("FKTABLE_NAME", StringType), StructField("FKCOLUMN_NAME", StringType),
      StructField("KEY_SEQ", IntegerType), StructField("UPDATE_RULE", IntegerType),
      StructField("DELETE_RULE", IntegerType), StructField("FK_NAME", StringType),
      StructField("PK_NAME", StringType)))
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
  /** Optimized plan with per-node Statistics forced (ref mode
    * optimize_with_stats, PlanOnlyStatement.scala:113-118). */
  case object OptimizeWithStats extends Mode
  case object Physical extends Mode
  case object Execution extends Mode
  /** Output-column → source-column map (ref lineage mode +
    * SparkSQLLineageParseHelper). */
  case object Lineage extends Mode

  sealed trait Style
  case object Plain extends Style
  case object Json extends Style

  def run(spark: SparkSession, statement: String, mode: Mode, style: Style = Plain): String = {
    val parsed = spark.sessionState.sqlParser.parsePlan(statement)
    def analyzed = {
      val a = spark.sessionState.analyzer.execute(parsed)
      spark.sessionState.analyzer.checkAnalysis(a)
      a
    }
    def render(plan: org.apache.spark.sql.catalyst.trees.TreeNode[_]): String = style match {
      case Plain => plan.toString
      case Json => plan.prettyJson
    }
    mode match {
      case Parse => render(parsed)
      case Analyze => render(analyzed)
      case Optimize => render(spark.sessionState.optimizer.execute(analyzed))
      case OptimizeWithStats =>
        val optimized = spark.sessionState.optimizer.execute(analyzed)
        optimized.foreach(_.stats) // force statistics on every node
        optimized.treeString(verbose = true, addSuffix = true)
      case Physical => render(spark.sql(statement).queryExecution.sparkPlan)
      case Execution => render(spark.sql(statement).queryExecution.executedPlan)
      case Lineage =>
        val lin = graft.plans.ColumnLineage.of(
          spark.sessionState.optimizer.execute(analyzed))
        lin.toSeq.sortBy(_._1).map { case (out, srcs) =>
          s"$out <- ${srcs.toSeq.sorted.mkString(", ")}"
        }.mkString("\n")
    }
  }
}
