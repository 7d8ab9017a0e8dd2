package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, SparkSession}

/** Ledger for intermediate frames the pipeline operators persist
  * (MinHash signatures, SimHash fingerprints, LSH buckets, shingle
  * explosions, connected-component labels).
  *
  * Those frames must outlive the operator call — the returned
  * DataFrame's plan reads them — so the operator cannot unpersist
  * them itself. Without an owner they leak for the life of the
  * SparkSession: in a long-lived gateway session (or the 93-query
  * bench JVM) the accumulated cache squeezes executor storage and
  * every later query pays the eviction.
  *
  * Ownership is the frame's OWN SparkSession: every gateway session
  * runs on its own session clone, so `release(spark)` at statement
  * close frees exactly the caller's frames — one tenant's close can
  * never unpersist another tenant's in-flight sketches (which Spark
  * would silently recompute: correct results, surprise recompute
  * storms). Single-session consumers (Bench, Verify) use
  * `releaseAll()`.
  */
object SketchRegistry {
  private val tracked = mutable.Map.empty[SparkSession, mutable.ArrayBuffer[Dataset[_]]]

  /** Record a persisted frame for later release; returns it unchanged.
    * The owner is the frame's SparkSession.
    */
  def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked.getOrElseUpdate(ds.sparkSession, mutable.ArrayBuffer.empty) += ds
    ds
  }

  private def releaseFrames(frames: Seq[Dataset[_]]): Unit =
    frames.foreach { ds =>
      try ds.unpersist()
      catch { case _: Throwable => }
      freeLocalCheckpoint(ds) // no-op unless the frame is checkpointed
    }

  /** Unpersist only the frames owned by `spark` — the statement-close
    * hook for a multi-tenant gateway.
    */
  def release(spark: SparkSession): Unit = {
    val mine = synchronized(tracked.remove(spark)).map(_.toSeq).getOrElse(Seq.empty)
    releaseFrames(mine)
  }

  /** Unpersist every tracked frame regardless of owner (blocking=false;
    * errors ignored — a frame may already be unpersisted or its
    * session stopped).
    */
  def releaseAll(): Unit = {
    val all = synchronized {
      val frames = tracked.values.flatten.toSeq
      tracked.clear()
      frames
    }
    releaseFrames(all)
  }

  /** Number of currently tracked frames (test hook). */
  def size: Int = synchronized(tracked.values.map(_.size).sum)

  /** Frames owned by one session (test hook). */
  def size(spark: SparkSession): Int = synchronized(tracked.get(spark).map(_.size).getOrElse(0))

  /** Free the block storage behind a `localCheckpoint()`ed frame.
    * `Dataset.unpersist` only releases CacheManager-tracked caches;
    * checkpoint RDD blocks otherwise live until the RDD is GC'd.
    */
  def freeLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        try lr.rdd.unpersist(blocking = false)
        catch { case _: Throwable => }
      case _ =>
    }
}
