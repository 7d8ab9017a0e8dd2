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
    * resolved version under us). Only the missing-file race retries —
    * a genuinely corrupt artifact surfaces on the first read.
    */
  def open(spark: SparkSession, path: String): DataFrame = {
    val dir = readMeta(spark, path).getString(AGG_DIR_IDX)
    try spark.read.parquet(s"$path/$dir")
    catch {
      case t: Throwable if isMissingFile(t) =>
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

  /** Each meta generation is its OWN versioned dir (`meta_vN`, the
    * agg_vN pattern): write to `meta_tmp`, rename to the fresh
    * `meta_vN` (rename into a non-existent target — no preceding
    * delete, so a valid older generation always exists), then prune
    * all but the latest two. A crash at ANY point leaves at least one
    * complete meta generation for readers; a rename that fails is
    * surfaced loudly instead of silently bricking the artifact.
    * Legacy single-`meta` artifacts are read as version 0 and upgraded
    * on their next write.
    */
  private def writeMeta(spark: SparkSession, path: String,
      keyCols: Seq[String], measures: Seq[String], aggDir: String,
      applied: Map[String, Long]): Unit = {
    import spark.implicits._
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$path/meta_tmp")
    fs.delete(tmp, true) // leftover from a crashed prior attempt
    Seq((keyCols, measures, aggDir, applied))
      .toDF("key_cols", "measure_cols", "agg_dir", "applied")
      .coalesce(1).write.parquet(tmp.toString)
    val next = metaVersions(fs, path).headOption.map(_._1 + 1).getOrElse(1L)
    val target = new Path(s"$path/meta_v$next")
    if (!fs.rename(tmp, target)) {
      throw new java.io.IOException(
        s"RollupIndex: failed to publish meta generation $target")
    }
    // prune: keep the latest two generations; drop the legacy dir only
    // once a versioned generation exists (it does — we just wrote it)
    metaVersions(fs, path).drop(2).foreach { case (_, p) =>
      try fs.delete(p, true) catch { case _: java.io.IOException => }
    }
    val legacy = new Path(s"$path/meta")
    if (fs.exists(legacy)) {
      try fs.delete(legacy, true) catch { case _: java.io.IOException => }
    }
  }

  /** `meta_vN` dirs under `path`, newest first. */
  private def metaVersions(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[(Long, Path)] = {
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("meta_v") &&
        st.getPath.getName.stripPrefix("meta_v").forall(_.isDigit) &&
        st.getPath.getName.length > "meta_v".length)
      .map(st => (st.getPath.getName.stripPrefix("meta_v").toLong, st.getPath))
      .sortBy(-_._1)
  }

  /** True for the transient "file was pruned/renamed under us" race
    * family; everything else (corrupt footer, schema mismatch, perm
    * denied) is a genuine failure and must surface immediately.
    */
  private def isMissingFile(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      c match {
        case _: java.io.FileNotFoundException => return true
        case e: org.apache.spark.sql.AnalysisException if
            e.getMessage != null &&
            (e.getMessage.contains("PATH_NOT_FOUND") ||
             e.getMessage.contains("Path does not exist") ||
             e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")) => return true
        case _ =>
      }
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  private def readMeta(spark: SparkSession, path: String): Row = {
    var last: Throwable = null
    var i = 0
    while (i < 5) {
      // newest generation first, surviving older generation as the
      // crash-window fallback, legacy unversioned `meta` last
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val candidates =
        metaVersions(fs, path).take(2).map(_._2.toString) :+ s"$path/meta"
      for (cand <- candidates) {
        try {
          val raw = spark.read.parquet(cand)
          // pre-applied-marker artifacts lack the column
          val df = if (raw.columns.contains("applied")) raw
            else raw.withColumn("applied",
              lit(null).cast("map<string,bigint>"))
          return df.select(col("key_cols"), col("measure_cols"),
            col("agg_dir"), col("applied")).head()
        } catch {
          case t: Throwable if isMissingFile(t) => last = t
          // corrupt meta (not a missing-file race): fail on first read
        }
      }
      Thread.sleep(20L << i); i += 1
    }
    throw last
  }
}
