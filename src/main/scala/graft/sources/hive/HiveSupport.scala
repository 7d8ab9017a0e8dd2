package graft.sources.hive

import org.apache.spark.sql.SparkSession

/** Hive-metastore access for the gateway.
  *
  * The reference ships a DSv2 Hive connector
  * (extensions/spark/kyuubi-spark-connector-hive/.../HiveTableCatalog.scala)
  * whose value is reaching Hive-metastore tables from the engine.
  * Spark itself already provides that capability end-to-end
  * (`enableHiveSupport()` → `HiveExternalCatalog` + Hive SerDe
  * read/write paths), which is why SURVEY.md scopes the connector to
  * "Spark built-in covers parity". This helper is the engine-side glue
  * that turns the built-in support on deliberately — and documents the
  * knobs a deployment needs — rather than re-implementing the scan and
  * write planning the reference duplicates from Spark.
  *
  * `newHiveSession` builds a SparkSession whose session catalog is
  * backed by a Hive metastore:
  *   - `metastoreDir`: the embedded-Derby metastore location (a real
  *     deployment passes `hive.metastore.uris` instead via `extra`).
  *   - `warehouseDir`: where managed-table data lands.
  *
  * Cluster note: the metastore client lives on the driver only;
  * executors never talk to the metastore (they read file splits), so
  * this scales to any cluster size exactly like stock Spark-on-Hive.
  */
object HiveSupport {

  /** True when Spark's Hive classes are on the classpath. */
  def hiveAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.hive.HiveExternalCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  /** A SparkSession with Hive catalog support on an embedded (Derby)
    * metastore. Must be the process' first/only Hive session per
    * metastore dir (Derby allows a single writer); callers in tests
    * clear the default session first so the static
    * `spark.sql.catalogImplementation=hive` takes effect in a fresh
    * SharedState.
    */
  def newHiveSession(master: String, metastoreDir: String, warehouseDir: String,
      extra: Map[String, String] = Map.empty): SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.catalogImplementation", "hive")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDir;create=true")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    // Restore the previous default AND thread-active session: anything
    // in this JVM resolving SparkSession.active / SQLConf.get (rules,
    // UDF registration) must keep seeing its original session — the
    // Hive session is addressed explicitly by its handle.
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }
}
