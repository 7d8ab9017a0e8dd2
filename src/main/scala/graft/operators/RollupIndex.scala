package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-maintained aggregate artifact: a persisted
  * (group keys → summed measures) rollup table kept current by
  * idempotent micro-batch merges — the relational twin of the
  * band-index / IVF-PQ maintenance loop, reusing its exact durability
  * contract: versioned `agg_vN` dirs with a one-row meta pointer
  * (previous version survives one cycle for racing readers).
  *
  * Exactly-once replays: unlike the band index (whose duplicate rows a
  * compact pass can drop) a SUM rollup has no downstream dedup, so the
  * last-applied micro-batch id per stream is folded INTO the meta row
  * itself — the same single write that flips `agg_dir` commits the
  * replay marker, leaving no crash window between "merged" and
  * "marked". A restart that replays the last micro-batch reads the
  * meta, sees its id already applied, and skips; a crash BEFORE the
  * meta flip leaves the old agg_dir and the old applied id, so the
  * replay re-merges into the old state — never double-counts.
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
    writeMeta(rollup.sparkSession, path, keyCols, measures, BASE, Map.empty)
  }

  /** The current rollup as a lazy distributed scan (one driver-side
    * one-row meta read; one re-read if a concurrent merge pruned the
    * resolved version under us).
    */
  def open(spark: SparkSession, path: String): DataFrame = {
    val dir = readMeta(spark, path).getString(AGG_DIR_IDX)
    try spark.read.parquet(s"$path/$dir")
    catch {
      case _: Throwable =>
        spark.read.parquet(
          s"$path/${readMeta(spark, path).getString(AGG_DIR_IDX)}")
    }
  }

  /** The last micro-batch id merged for `streamId`, if any — the
    * replay marker the meta flip commits atomically with the data.
    */
  def lastApplied(spark: SparkSession, path: String,
      streamId: String): Option[Long] =
    appliedMap(readMeta(spark, path)).get(streamId)

  /** Merge one increment frame (same schema as the rollup) into the
    * artifact: union + re-aggregate into the next `agg_vN`, flip the
    * meta pointer, prune all but the previous version. When `applied`
    * carries the (streamId, batchId) being merged, the marker commits
    * in the SAME meta write that publishes the new agg_dir — a crash
    * anywhere leaves marker and data consistent. Without it the merge
    * is not replay-safe (the caller owns idempotency, exactly like
    * Dedup.appendToBandIndex).
    */
  def merge(increments: DataFrame, path: String,
      applied: Option[(String, Long)] = None): Unit = {
    val spark = increments.sparkSession
    val meta = readMeta(spark, path)
    val keyCols = meta.getSeq[String](KEY_COLS_IDX)
    val measures = meta.getSeq[String](MEASURE_COLS_IDX)
    val curDir = meta.getString(AGG_DIR_IDX)
    val cur = spark.read.parquet(s"$path/$curDir")
    val nextDir = Dedup.nextVersionedDir(BASE, curDir)
    cur.unionByName(increments.select(cur.columns.map(col).toSeq: _*))
      .groupBy(keyCols.map(col).toSeq: _*)
      .agg(measures.map(m => sum(col(m)).as(m)).head,
        measures.map(m => sum(col(m)).as(m)).tail: _*)
      .write.mode("overwrite").parquet(s"$path/$nextDir")
    writeMeta(spark, path, keyCols, measures, nextDir,
      appliedMap(meta) ++ applied)
    Dedup.pruneVersionedDirs(spark, path, BASE, keep = Set(curDir, nextDir))
  }

  // meta row layout is fixed so readers index by position
  private val KEY_COLS_IDX = 0
  private val MEASURE_COLS_IDX = 1
  private val AGG_DIR_IDX = 2
  private val APPLIED_IDX = 3

  private def appliedMap(meta: Row): Map[String, Long] =
    if (meta.isNullAt(APPLIED_IDX)) Map.empty
    else meta.getMap[String, Long](APPLIED_IDX).toMap

  /** The meta pointer is published by writing to `meta_tmp` and
    * renaming over `meta` — the delete+rename window is two FS
    * metadata ops instead of a whole Spark overwrite job; a reader
    * racing even that narrow gap retries briefly.
    */
  private def writeMeta(spark: SparkSession, path: String,
      keyCols: Seq[String], measures: Seq[String], aggDir: String,
      applied: Map[String, Long]): Unit = {
    import spark.implicits._
    Seq((keyCols, measures, aggDir, applied))
      .toDF("key_cols", "measure_cols", "agg_dir", "applied")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta_tmp")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = new Path(s"$path/meta")
    fs.delete(meta, true)
    fs.rename(new Path(s"$path/meta_tmp"), meta)
  }

  private def readMeta(spark: SparkSession, path: String): Row = {
    var last: Throwable = null
    var i = 0
    while (i < 5) {
      try {
        val raw = spark.read.parquet(s"$path/meta")
        // pre-applied-marker artifacts lack the column
        val df = if (raw.columns.contains("applied")) raw
          else raw.withColumn("applied",
            lit(null).cast("map<string,bigint>"))
        return df.select(col("key_cols"), col("measure_cols"),
          col("agg_dir"), col("applied")).head()
      } catch {
        case t: Throwable => last = t; Thread.sleep(20L << i); i += 1
      }
    }
    throw last
  }
}
