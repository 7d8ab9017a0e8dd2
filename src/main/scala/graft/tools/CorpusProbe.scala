package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the TPC-DS / TPC-H corpus sections of the bench:
  * runs named corpus queries against the bench's materialized parquet
  * databases (target/bench_mat + the Derby metastore a prior full
  * graft.Bench run created) under optional conf overrides, printing
  * min/all timings. Dev-only; the driver never runs this.
  *
  * Usage:
  *   SPARK_GRAFT_PROFILE_CONF="k=v;k=v" \
  *   sbt "runMain graft.tools.CorpusProbe tpcds_sf10 q23b,q4,q14 3"
  *   sbt "runMain graft.tools.CorpusProbe tpch_sf1 q9,q21 3"
  */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val db = args(0)
    val names = args(1).split(",").toSeq
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.plans.GraftSparkExtension].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/bench_warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("javax.jdo.option.ConnectionURL",
        "jdbc:derby:;databaseName=target/bench_metastore;create=true")
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b.config(k, v)
    })
    val spark = b.enableHiveSupport().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sqls: Map[String, String] =
      if (db.startsWith("tpch")) graft.queries.TpchCorpusSql.queries(db).toMap
      else graft.queries.TpcdsCorpusSql.queries(db).toMap
    names.foreach { qn =>
      val sql = sqls(qn)
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $db.$qn min=${runs.min}%.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
