package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-maintained aggregate artifact: a persisted
  * (group keys → summed measures) rollup table kept current by
  * idempotent micro-batch merges — the relational twin of the
  * band-index / IVF-PQ maintenance loop, reusing its exact durability
  * contract: versioned `agg_vN` dirs with a one-row meta pointer
  * (visible-atomic swap, previous version survives one cycle for
  * racing readers), and per-batch replay markers owned by the caller
  * (graft.streaming.Streams.applyRollupBatch).
  *
  * Scale shape: the rollup is DIMENSION-bounded (distinct key tuples),
  * not history-bounded, so each merge rewrites a bounded artifact in
  * O(|rollup| + |batch|) — the raw event history never needs to exist
  * anywhere; only its rollup does. Reference behavior: continuous-ETL
  * aggregate maintenance (the "streaming upsert into a summary table"
  * every warehouse runs); measures must be associative sums for the
  * merge to be order- and replay-insensitive (counts, integer sums).
  */
object RollupIndex {

  private val BASE = "agg"

  /** Create the artifact from an initial (possibly empty) rollup frame:
    * key columns first, then bigint measure columns, all summed on
    * merge.
    */
  def build(rollup: DataFrame, path: String, keyCols: Seq[String]): Unit = {
    val measures = rollup.columns.filterNot(keyCols.contains)
    rollup.write.mode("overwrite").parquet(s"$path/$BASE")
    writeMeta(rollup.sparkSession, path, keyCols, measures, BASE)
  }

  /** The current rollup as a lazy distributed scan (one driver-side
    * one-row meta read; one re-read if a concurrent merge pruned the
    * resolved version under us).
    */
  def open(spark: SparkSession, path: String): DataFrame = {
    val dir = resolveDir(spark, path)
    try spark.read.parquet(s"$path/$dir")
    catch {
      case _: Throwable =>
        spark.read.parquet(s"$path/${resolveDir(spark, path)}")
    }
  }

  /** Merge one increment frame (same schema as the rollup) into the
    * artifact: union + re-aggregate into the next `agg_vN`, flip the
    * meta pointer, prune all but the previous version. Idempotency is
    * the CALLER's marker contract — this merge itself is not replay-
    * safe, exactly like Dedup.appendToBandIndex.
    */
  def merge(increments: DataFrame, path: String): Unit = {
    val spark = increments.sparkSession
    val metaDf = spark.read.parquet(s"$path/meta")
    val meta = metaDf.head()
    val keyCols = meta.getSeq[String](metaDf.columns.indexOf("key_cols"))
    val measures = meta.getSeq[String](metaDf.columns.indexOf("measure_cols"))
    val curDir = meta.getString(metaDf.columns.indexOf("agg_dir"))
    val cur = spark.read.parquet(s"$path/$curDir")
    val nextDir = Dedup.nextVersionedDir(BASE, curDir)
    cur.unionByName(increments.select(cur.columns.map(col).toSeq: _*))
      .groupBy(keyCols.map(col).toSeq: _*)
      .agg(measures.map(m => sum(col(m)).as(m)).head,
        measures.map(m => sum(col(m)).as(m)).tail: _*)
      .write.mode("overwrite").parquet(s"$path/$nextDir")
    writeMeta(spark, path, keyCols, measures, nextDir)
    Dedup.pruneVersionedDirs(spark, path, BASE, keep = Set(curDir, nextDir))
  }

  private def writeMeta(spark: SparkSession, path: String,
      keyCols: Seq[String], measures: Seq[String], aggDir: String): Unit = {
    import spark.implicits._
    Seq((keyCols, measures, aggDir))
      .toDF("key_cols", "measure_cols", "agg_dir")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def resolveDir(spark: SparkSession, path: String): String = {
    val metaDf = spark.read.parquet(s"$path/meta")
    metaDf.head().getString(metaDf.columns.indexOf("agg_dir"))
  }
}
