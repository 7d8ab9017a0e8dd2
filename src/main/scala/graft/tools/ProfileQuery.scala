package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): run named
  * SparkEntry queries in the Bench session shape and attribute wall
  * time to Spark stages — jobs, stages, tasks, shuffle bytes — so
  * "5 s on 5 000 rows" can be decomposed into scheduling overhead vs
  * real work before anything is changed.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileQuery d10_jaccard_pairs[,d08_...]"
  * Env:
  *   SPARK_GRAFT_PROFILE_ITERS  iterations per query (default 2; last
  *                              iteration's stage table is printed —
  *                              steady state, codegen warm)
  *   SPARK_GRAFT_PROFILE_CONF   extra "k=v;k=v" session confs for A/B
  *
  * Dev-only: the driver never runs this; it exists so optimization
  * claims are measured, not guessed.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ITERS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.plans.GraftSparkExtension].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageRow(jobId: Int, stageId: Int, name: String,
      tasks: Int, ms: Long, shufRead: Long, shufWrite: Long, input: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        jobs += 1
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += StageRow(stageToJob.getOrElse(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n'), si.numTasks, ms,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.inputMetrics.bytesRead)
      }
    })

    // absorb session-boot one-time costs so iteration 1 isn't charged them
    spark.sql("SELECT sum(id) FROM range(1000000)").foreach(_ => ())

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to iters).foreach { it =>
        stages.clear(); stageToJob.clear(); jobs = 0
        val t0 = System.nanoTime()
        fn(spark, sfDir).foreach(_ => ())
        val wallMs = (System.nanoTime() - t0) / 1e6
        graft.operators.SketchRegistry.releaseAll()
        val stageMs = stages.map(_.ms).sum
        println(f"[profile] $name iter=$it wall=${wallMs / 1000}%.3fs jobs=$jobs " +
          f"stages=${stages.size} tasks=${stages.map(_.tasks).sum} " +
          f"sum_stage=${stageMs / 1000.0}%.3fs gap=${(wallMs - stageMs) / 1000.0}%.3fs")
        if (it == iters) {
          stages.sortBy(-_.ms).take(30).foreach { s =>
            println(f"[profile]   job=${s.jobId}%3d stage=${s.stageId}%4d ${s.ms}%6dms " +
              f"tasks=${s.tasks}%4d in=${s.input}%9d sr=${s.shufRead}%9d sw=${s.shufWrite}%9d ${s.name.take(80)}")
          }
        }
      }
    }
    spark.stop()
  }
}
