package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet fixtures
  * (see TESTDATA.md). One method per table; every query module goes
  * through here so that scan-level options (pushdown, schema) stay
  * uniform.
  *
  * At 100 TB these reads become distributed parquet scans; nothing here
  * materializes on the driver. Filters/projections applied by callers
  * are pushed into the scan by Catalyst.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = load("region")
  def nation: DataFrame = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame = load("part")
  def orders: DataFrame = load("orders")
  def lineitem: DataFrame = load("lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader refuses. Read nanos as long (legacy conf) and truncate to
    * micros — the same truncation DuckDB applies — keeping the public
    * schema (ts: timestamp) identical for every consumer.
    */
  def events: DataFrame = {
    // builders (Verify/Bench/Engine fixtures) set this at session
    // construction; the guarded set here covers externally-built
    // sessions without re-writing shared conf on every call
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    load("events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")
}
