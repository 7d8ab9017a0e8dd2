package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one SparkEntry query against a testdata dir,
  * printing per-run wall times (cold + warm).
  *
  * Usage: runMain graft.tools.OpTime <queryName> <sfDir> [runs]
  */
object OpTime {
  def main(args: Array[String]): Unit = {
    val qn = args(0)
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.plans.GraftSparkExtension].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(qn)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).foreach(_ => ())
      graft.operators.SketchRegistry.releaseAll()
      println(f"[optime] $qn run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
