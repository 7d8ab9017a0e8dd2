package graft

import org.apache.spark.sql.SparkSession

import graft.queries.{TpcdsCorpusSql, TpchCatalogQueries, TpchCorpusSql}

/** Driver-run benchmark: every SparkEntry query on the driver-provided
  * parquet fixtures, plus the full 22-query TPC-H corpus against the
  * generator catalog (default sf1; SPARK_GRAFT_TPCH_SF overrides, e.g.
  * `sf10`). One JSON line on stdout.
  *
  * The action is `foreach(_ => ())` — a full materialization of every
  * result row with no driver collect — matching the reference's
  * RunBenchmark `foreach` execution mode (dev/kyuubi-tpcds/README.md:48-60).
  * `count()` would let Catalyst prune projections and under-measure the
  * scan. Query failures are reported in the JSON and fail the process.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val tpchNs = sys.env.getOrElse("SPARK_GRAFT_TPCH_SF", "sf1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.plans.GraftSparkExtension].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var errors = List.empty[String]
    def timed(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable =>
        errors ::= s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val suite = SparkEntry.queries.map { case (name, fn) =>
      timed(name)(fn(spark, sfDir).foreach(_ => ()))
    }
    TpchCatalogQueries.register(spark)
    val tpch = TpchCorpusSql.queries(s"tpch.$tpchNs").map { case (qn, sql) =>
      timed(s"tpch_${tpchNs}_$qn")(spark.sql(sql).foreach(_ => ()))
    }

    // TPC-DS benchmark slice at the BASELINE's scale (sf10): these 6
    // queries are the reference's only published latencies
    val tpcdsNs = sys.env.getOrElse("SPARK_GRAFT_TPCDS_SF", "sf10")
    spark.conf.set("spark.sql.catalog.tpcds",
      classOf[graft.sources.tpcds.TpcdsCatalog].getName)
    val tpcds = TpcdsCorpusSql.queries(s"tpcds.$tpcdsNs").map { case (qn, sql) =>
      timed(s"tpcds_${tpcdsNs}_$qn")(spark.sql(sql).foreach(_ => ()))
    }

    val results = suite ++ tpch ++ tpcds
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.reverse.map(e => "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","tpch_sf":"$tpchNs"}""")
    spark.stop()
    if (errors.nonEmpty) {
      System.err.println(s"[bench] ${errors.size} queries failed: " + errors.reverse.mkString("; "))
      sys.exit(1)
    }
  }
}
