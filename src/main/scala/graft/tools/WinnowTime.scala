package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time the bench's winnow cap comparable (w01/w02) in
  * isolation — the same adversarial corpus, caps and action as
  * graft.Bench's winnowCap section, without the other 300 queries.
  *
  * Usage: runMain graft.tools.WinnowTime [runsCapped] [runsUncapped]
  */
object WinnowTime {
  def main(args: Array[String]): Unit = {
    val runsCapped = if (args.length > 0) args(0).toInt else 2
    val runsUncapped = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", classOf[graft.plans.GraftSparkExtension].getName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class StageRow(stageId: Int, name: String, tasks: Int,
      ms: Long, shufRead: Long, shufWrite: Long, outRows: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks, ms,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    })

    val boiler = "the quick brown fox jumps over the lazy dog again and again today"
    val wdir = "target/bench_winnow"
    spark.range(16000).select(col("id").as("doc_id"),
        concat(lit("d"), col("id").cast("string"), lit(" " + boiler + " "),
          concat_ws(" ",
            substring(md5(concat(lit("a"), col("id").cast("string"))), 1, 8),
            substring(md5(concat(lit("b"), col("id").cast("string"))), 1, 8),
            substring(md5(concat(lit("c"), col("id").cast("string"))), 1, 8),
            substring(md5(concat(lit("d"), col("id").cast("string"))), 1, 8))).as("text"))
      .write.mode("overwrite").parquet(wdir)
    val adv = spark.read.parquet(wdir)
    def run(tag: String, cap: Int, runs: Int): Unit = (1 to runs).foreach { i =>
      stages.clear()
      val t0 = System.nanoTime()
      graft.operators.Dedup.winnowCandidatePairs(
        adv, "doc_id", "text", minShared = 1, maxFpDf = cap).foreach(_ => ())
      graft.operators.SketchRegistry.releaseAll()
      println(f"[winnowtime] $tag run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (i == runs) stages.sortBy(-_.ms).take(12).foreach { s =>
        println(f"[winnowtime]   stage=${s.stageId}%4d ${s.ms}%7dms tasks=${s.tasks}%4d " +
          f"sr=${s.shufRead}%11d sw=${s.shufWrite}%11d rows=${s.outRows}%11d ${s.name.take(60)}")
      }
    }
    run("w01_capped", 100, runsCapped)
    run("w02_uncapped", Int.MaxValue, runsUncapped)
    spark.stop()
  }
}
