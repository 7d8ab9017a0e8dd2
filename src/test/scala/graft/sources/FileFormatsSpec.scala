package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** File source/sink round-trips (SURVEY §2.B "Scans: files" — the
  * reference delegates these to Spark's file sources; we prove the
  * engine-visible behavior: schema fidelity, value round-trip,
  * predicate pushdown into the scan per format).
  */
class FileFormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val src = spark.read.parquet(s"${SparkFixture.sfDir}/nation.parquet")

  private def roundTrip(fmt: String, opts: Map[String, String] = Map.empty): Unit = {
    val dir = Files.createTempDirectory(s"graft-$fmt").toString + "/out"
    src.write.format(fmt).options(opts).mode("overwrite").save(dir)
    val back = {
      val r = spark.read.format(fmt).options(opts)
      // text-based formats need the schema re-imposed
      if (fmt == "csv" || fmt == "json") r.schema(src.schema).load(dir) else r.load(dir)
    }
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)), s"$fmt schema drift")
    val a = src.orderBy("n_nationkey").collect().map(_.toSeq)
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq)
    assert(a.sameElements(b), s"$fmt value drift")
  }

  test("parquet round-trip") { roundTrip("parquet") }
  test("orc round-trip (zstd)") { roundTrip("orc", Map("compression" -> "zstd")) }
  test("csv round-trip") { roundTrip("csv", Map("header" -> "true")) }
  test("json round-trip") { roundTrip("json") }

  test("parquet scans push filters and prune columns") {
    val dir = Files.createTempDirectory("graft-pushdown").toString + "/out"
    src.write.parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("n_regionkey") === 2)
      .select("n_name")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,2)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<n_name:string,n_regionkey:int>"),
      s"columns not pruned:\n$plan")
  }
}
