package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** RollupIndex durability contract: versioned meta generations (a
  * crash between publish steps always leaves a readable generation),
  * legacy single-`meta` artifacts upgraded in place, legacy
  * `_applied` marker-file replays honored across the upgrade, and a
  * corrupt meta surfacing on the FIRST read instead of being chewed
  * through the missing-file retry loop.
  */
class RollupIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  private def freshArtifact(): String = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_ri").toString
    RollupIndex.build(
      Seq(("click", ts(1), 2L), ("view", ts(1), 1L))
        .toDF("event_type", "hour", "n"),
      path, keyCols = Seq("event_type", "hour"))
    path
  }

  private def mergeOne(path: String, t: String, h: Int, n: Long,
      applied: Option[(String, Long)] = None): Unit = {
    import spark.implicits._
    RollupIndex.merge(Seq((t, ts(h), n)).toDF("event_type", "hour", "n"),
      path, applied)
  }

  private def total(path: String): Long =
    RollupIndex.open(spark, path).agg(sum(col("n"))).head().getLong(0)

  test("meta publishes as versioned generations; an older generation survives one cycle") {
    val path = freshArtifact()
    mergeOne(path, "click", 2, 5L)
    val metas = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("meta_v")).sorted
    assert(metas.length == 2, s"latest two generations kept: ${metas.mkString(",")}")
    assert(!new java.io.File(path, "meta").exists,
      "legacy unversioned meta dir must not linger")
    assert(total(path) == 8L)

    // crash window: the newest generation vanishes mid-publish — the
    // surviving previous generation still serves readers (its agg dir
    // is retained one prune cycle for exactly this race)
    val newest = metas.max
    assert(deleteRec(new java.io.File(path, newest)))
    assert(total(path) == 3L, "reader falls back to the surviving generation")
  }

  test("legacy single-`meta` artifact opens, merges, and upgrades in place") {
    val path = freshArtifact()
    // rewrite the layout to the pre-versioned shape: meta_vN -> meta
    val dir = new java.io.File(path)
    val metas = dir.listFiles().filter(_.getName.startsWith("meta_v"))
    assert(metas.nonEmpty)
    val newest = metas.maxBy(_.getName)
    metas.filter(_ ne newest).foreach(deleteRec)
    assert(newest.renameTo(new java.io.File(dir, "meta")))

    assert(total(path) == 3L, "legacy layout must stay readable")
    mergeOne(path, "view", 3, 4L, applied = Some("s1" -> 7L))
    assert(total(path) == 7L)
    assert(RollupIndex.lastApplied(spark, path, "s1").contains(7L))
    assert(!new java.io.File(path, "meta").exists,
      "first write after the upgrade retires the legacy dir")
    assert(dir.listFiles().exists(_.getName.startsWith("meta_v")))
  }

  test("a corrupt meta throws on the first read — not after the missing-file retry loop") {
    val path = freshArtifact()
    total(path) // warm the read path so timing below is parse cost only
    // corrupt every parquet part of the newest generation, leaving the
    // files PRESENT (not a missing-file race — a genuine failure)
    val dir = new java.io.File(path)
    dir.listFiles().filter(_.getName.startsWith("meta_v")).foreach { g =>
      g.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.write(f.toPath, "not a parquet file".getBytes)
      }
      // also drop older generations so the fallback can't mask the corruption
    }
    dir.listFiles().filter(_.getName.startsWith("meta_v")).sortBy(_.getName)
      .dropRight(1).foreach(deleteRec)
    val t0 = System.nanoTime()
    val e = intercept[Throwable](RollupIndex.open(spark, path))
    val ms = (System.nanoTime() - t0) / 1000000
    assert(!isFnf(e), s"corruption must not be misread as a missing file: $e")
    assert(ms < 1500,
      s"corrupt meta took ${ms}ms — smells like the retry/backoff loop ran")
  }

  test("replays recorded by legacy _applied marker files are honored after the upgrade") {
    import spark.implicits._
    val path = freshArtifact()
    // the pre-in-meta-marker code recorded applied batches as files
    val markerDir = new java.io.File(s"$path/_applied/legacy-stream")
    assert(markerDir.mkdirs())
    java.nio.file.Files.createFile(
      new java.io.File(markerDir, f"batch-${3L}%020d").toPath)

    def deliver(id: Long): Unit = graft.streaming.Streams.applyRollupBatch(
      Seq(("click", ts(4), 1.0)).toDF("event_type", "ts", "v"),
      batchId = id, path, streamId = "legacy-stream") { b =>
      b.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
    }
    val before = total(path)
    deliver(3L) // replay of a legacy-marked batch: must be a no-op
    assert(total(path) == before,
      "a batch the legacy marker recorded must not re-merge")
    deliver(4L) // genuinely new batch merges, and marks IN the meta
    assert(total(path) == before + 1)
    assert(RollupIndex.lastApplied(spark, path, "legacy-stream").contains(4L))
  }

  private def isFnf(t: Throwable): Boolean = {
    var c: Throwable = t
    while (c != null) {
      if (c.isInstanceOf[java.io.FileNotFoundException]) return true
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  private def deleteRec(f: java.io.File): Boolean = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }
}
