package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.TpcdsCorpusSql

/** Dev tool: time one TPC-DS corpus query against a materialized
  * parquet database directory (as laid out by graft.Bench under
  * `target/bench_mat/<db>/<table>`), printing per-run wall times.
  *
  * Usage: runMain graft.tools.QTime <queryName> <dbDir> [runs]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val qn = args(0)
    val dbDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.plans.GraftSparkExtension].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/qtime_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val db = "qtime"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    new java.io.File(dbDir).listFiles().filter(_.isDirectory).foreach { d =>
      spark.sql(s"DROP TABLE IF EXISTS $db.${d.getName}")
      spark.sql(s"CREATE TABLE $db.${d.getName} USING parquet LOCATION '${d.getAbsolutePath}'")
    }
    val sql = TpcdsCorpusSql.queries(db).toMap.apply(qn)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      spark.sql(sql).foreach(_ => ())
      println(f"QTIME $qn run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.contains("QTIME_EXPLAIN")) spark.sql(sql).explain("formatted")
    spark.stop()
  }
}
