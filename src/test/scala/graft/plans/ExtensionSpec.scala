package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The extension bundle, end-to-end through a session built with
  * spark.sql.extensions=GraftSparkExtension (SparkFixture).
  */
class ExtensionSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("delegate parser: ordinary SQL still parses and runs") {
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
  }

  test("OPTIMIZE 'path' ZORDER BY rewrites a parquet directory in z-order") {
    val dir = Files.createTempDirectory("graft_zorder").toString + "/t"
    spark.range(0, 4096)
      .select((col("id") % 64).cast("int").as("x"), (col("id") / 64).cast("int").as("y"))
      .write.parquet(dir)
    spark.sql(s"OPTIMIZE '$dir' ZORDER BY x, y")
    val back = spark.read.parquet(dir)
    assert(back.count() == 4096)
    // z-layout: consecutive rows in file order stay close in BOTH dims
    val rows = back.limit(256).select("x", "y").collect()
    val xs = rows.map(_.getInt(0)); val ys = rows.map(_.getInt(1))
    assert(xs.max - xs.min < 64, "x not clustered after OPTIMIZE")
    assert(ys.max - ys.min < 64, "y not clustered after OPTIMIZE")
  }

  test("OPTIMIZE with WHERE preserves all rows") {
    val dir = Files.createTempDirectory("graft_zorder_w").toString + "/t"
    spark.range(0, 1000)
      .select(col("id").cast("int").as("x"), (col("id") % 10).cast("int").as("y"))
      .write.parquet(dir)
    spark.sql(s"OPTIMIZE '$dir' WHERE x < 500 ZORDER BY x, y")
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("rebalance-before-write coalesces small-file inserts") {
    val dir = Files.createTempDirectory("graft_rebalance").toString + "/t"
    // A near-empty 4-split scan would produce 4 tiny files without the
    // injected RebalancePartitions + AQE coalescing. (No explicit
    // repartition here — a user repartition is an explicit layout and
    // suppresses the insurance rebalance by design.)
    spark.range(0, 1000, 1, 4).write.parquet(dir)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= 2, s"$files parquet files written — rebalance did not coalesce")
  }

  test("rebalance respects user-requested sort layouts") {
    import org.apache.spark.sql.catalyst.plans.logical.RebalancePartitions
    val df = spark.range(0, 100).toDF("id").orderBy("id")
    // rule must not wrap a Sort (explicit layout wins): apply directly
    val cmd = org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand(
      outputPath = new org.apache.hadoop.fs.Path("/tmp/never-written"),
      staticPartitions = Map.empty,
      ifPartitionNotExists = false,
      partitionColumns = Nil,
      bucketSpec = None,
      fileFormat = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty,
      query = df.queryExecution.analyzed,
      mode = org.apache.spark.sql.SaveMode.Overwrite,
      catalogTable = None,
      fileIndex = None,
      outputColumnNames = df.queryExecution.analyzed.output.map(_.name))
    val out = RebalanceBeforeWriting(cmd)
    assert(!out.asInstanceOf[org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand]
      .query.isInstanceOf[RebalancePartitions])
  }

  test("watchdog: over-limit scans throw, pruned/unlimited pass") {
    val dir = Files.createTempDirectory("graft_watchdog").toString + "/t"
    spark.range(0, 100000).select(col("id"), (col("id") % 7).as("v")).write.parquet(dir)
    try {
      spark.conf.set("spark.graft.watchdog.maxScanBytes", "10")
      val e = intercept[Exception] { spark.read.parquet(dir).count() }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.isInstanceOf[MaxScanExceededException]),
        s"expected MaxScanExceededException, got $e")
      spark.conf.set("spark.graft.watchdog.maxScanBytes", (100L << 30).toString)
      assert(spark.read.parquet(dir).count() == 100000)
    } finally spark.conf.unset("spark.graft.watchdog.maxScanBytes")
  }

  test("inserts into zorder-configured tables are clustered automatically") {
    spark.sql("DROP TABLE IF EXISTS graft_zw")
    spark.sql("CREATE TABLE graft_zw (x INT, y INT) USING parquet")
    try {
      spark.conf.set("spark.graft.zorder.cols.graft_zw", "x, y")
      spark.range(0, 4096)
        .selectExpr("CAST(id % 64 AS INT) AS x", "CAST(id DIV 64 AS INT) AS y")
        .write.mode("append").insertInto("graft_zw")
      val rows = spark.table("graft_zw").limit(256).collect()
      val xs = rows.map(_.getInt(0)); val ys = rows.map(_.getInt(1))
      assert(xs.max - xs.min < 64 && ys.max - ys.min < 64,
        s"insert not z-clustered: x range ${xs.max - xs.min}, y range ${ys.max - ys.min}")
    } finally {
      spark.conf.unset("spark.graft.zorder.cols.graft_zw")
      spark.sql("DROP TABLE IF EXISTS graft_zw")
    }
  }

  test("dynamic shuffle partitions scale with scan volume") {
    try {
      spark.conf.set("spark.graft.dynamicShufflePartitions", "true")
      spark.conf.set("spark.sql.catalog.tpch", classOf[graft.sources.tpch.TpchCatalog].getName)
      // sf1 lineitem reports ~780 MB of stats; advisory 64 MB → >4 initial partitions
      spark.sql(
        """SELECT l_orderkey, count(*) FROM tpch.sf1.lineitem
           GROUP BY l_orderkey LIMIT 1""").foreach(_ => ())
      val initial = spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      assert(initial.toInt > 4, s"initialPartitionNum $initial not derived from scan size")
    } finally {
      spark.conf.unset("spark.graft.dynamicShufflePartitions")
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    }
  }

  test("final-stage conf isolation applies spark.sql.finalStage.* overrides") {
    try {
      spark.conf.set("spark.sql.finalStage.adaptive.advisoryPartitionSizeInBytes", "256m")
      spark.range(0, 10000).groupBy((col("id") % 5).as("k")).count().foreach(_ => ())
      assert(spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") == "256m",
        "final-stage override not applied")
    } finally {
      spark.conf.unset("spark.sql.finalStage.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("final-stage resource manager computes the write stage's executor target") {
    // Pure policy first: target sizing and victim ordering.
    assert(FinalStageResourceManager.targetExecutors(
      targetCores = 40, coresPerExecutor = 4, factor = 1.2) == 12)
    assert(FinalStageResourceManager.targetExecutors(
      targetCores = 1, coresPerExecutor = 8, factor = 1.2) == 1)
    val active = Seq(("e1", 100L), ("e2", 400L), ("e3", 200L), ("e4", 300L), ("e5", 150L))
    val bytes = Map("e1" -> 900L, "e3" -> 50L, "e5" -> 500L)
    // kill 3 of 5: blockless first (newest registration first: e2 then
    // e4), then the smallest shuffle payload (e3)
    assert(FinalStageResourceManager.selectVictims(active, bytes, targetExecutors = 2)
      == Seq("e2", "e4", "e3"))
    assert(FinalStageResourceManager.selectVictims(active, bytes, targetExecutors = 5).isEmpty)

    // End-to-end: an insert whose injected rebalance materializes as
    // the final stage must produce exactly one kill decision through
    // the allocator seam, shaped by the fake cluster's 10 executors.
    val rec = new RecordingExecutorAllocator {
      override def activeExecutors(): Seq[(String, Long)] =
        (1 to 10).map(i => (s"exec-$i", i.toLong))
      override def shuffleBytesByExecutor(shuffleId: Int, numReduce: Int): Map[String, Long] =
        (1 to 6).map(i => s"exec-$i" -> (i * 1000L)).toMap
    }
    FinalStageResourceManager.allocatorOverride = Some(rec)
    spark.conf.set("spark.graft.finalWriteStage.eagerlyKillExecutors", "true")
    try {
      val dir = Files.createTempDirectory("graft_finalstage").toString + "/t"
      spark.range(0, 100000, 1, 8).select(col("id"), (col("id") % 7).as("k"))
        .write.parquet(dir)
      val req = rec.lastKillRequest
      assert(req.isDefined, "rule must fire on a write with a materialized final rebalance")
      val (victims, target) = req.get
      assert(target >= 1 && target < 10, s"target $target")
      assert(victims.nonEmpty && victims.size == 10 - target, s"victims $victims target $target")
      // blockless executors (7..10) go first, newest registration first
      assert(victims.take(4) == Seq("exec-10", "exec-9", "exec-8", "exec-7"), victims)
    } finally {
      FinalStageResourceManager.allocatorOverride = None
      spark.conf.unset("spark.graft.finalWriteStage.eagerlyKillExecutors")
    }
  }

  test("custom resource profile wraps the final write stage; profile arithmetic checked") {
    // exec-node resource arithmetic, cluster-free
    val exec = CustomResourceProfileExec(
      null, executorCores = 4, executorMemoryMiB = 8192, executorMemoryOverheadMiB = 1024)
    val prof = exec.buildProfile()
    val execReqs = prof.executorResources
    assert(execReqs("cores").amount == 4)
    assert(execReqs("memory").amount == 8192)
    assert(execReqs("memoryOverhead").amount == 1024)

    // end-to-end: the wrapper lands above the final rebalance stage of
    // a write (observed through the injection seam — the wrap happens
    // inside AQE stage prep), pass-through in local mode (the write
    // itself must still succeed)
    spark.conf.set("spark.graft.finalWriteStage.resourceIsolation.enabled", "true")
    spark.conf.set("spark.graft.finalWriteStage.executorCores", "4")
    spark.conf.set("spark.graft.finalWriteStage.executorMemory", "8g")
    InjectCustomResourceProfile.lastInjected = None
    try {
      val dir = Files.createTempDirectory("graft_resprof").toString + "/t"
      spark.range(0, 100000, 1, 8)
        .select(col("id"), (col("id") % 7).as("k"))
        .write.parquet(dir)
      assert(spark.read.parquet(dir).count() == 100000, "write must succeed locally")
      val injected = InjectCustomResourceProfile.lastInjected
      assert(injected.isDefined, "rule must wrap the write's final rebalance stage")
      val (_, cores, memMiB, _) = injected.get
      assert(cores == 4 && memMiB == 8192, s"conf must shape the profile: $injected")
    } finally {
      InjectCustomResourceProfile.lastInjected = None
      spark.conf.unset("spark.graft.finalWriteStage.resourceIsolation.enabled")
      spark.conf.unset("spark.graft.finalWriteStage.executorCores")
      spark.conf.unset("spark.graft.finalWriteStage.executorMemory")
    }
  }

  test("force-shuffle-before-join inserts an exchange under shuffle-free SMJ children") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // aggregate outputs are already hash-partitioned on k, so the join
      // plans SMJ with Sort directly over HashAggregate — no exchange for
      // OptimizeSkewedJoin to split
      val a = spark.range(0, 1000).selectExpr("id % 10 AS k", "id AS v")
        .groupBy("k").agg(sum("v").as("s"))
      val b = spark.range(0, 1000).selectExpr("id % 10 AS k")
        .groupBy("k").count()
      val plan = a.join(b, "k").queryExecution.sparkPlan
      val smj0 = plan.collectFirst { case j: SortMergeJoinExec => j }
      assume(smj0.isDefined, "planner did not pick SMJ; test premise gone")
      assert(!smj0.get.children.forall(c =>
        c.isInstanceOf[SortExec] && c.children.head.isInstanceOf[ShuffleExchangeExec]),
        "children already shuffled; test premise gone")

      spark.conf.set("spark.graft.forceShuffleBeforeJoin", "true")
      val forced = new InsertShuffleNodeBeforeJoin(spark)(plan)
      val smj = forced.collectFirst { case j: SortMergeJoinExec => j }.get
      smj.children.foreach { c =>
        assert(c.isInstanceOf[SortExec] && c.children.head.isInstanceOf[ShuffleExchangeExec],
          s"no shuffle inserted under SMJ child:\n$c")
      }
      // idempotent: a second application leaves the plan unchanged
      assert(new InsertShuffleNodeBeforeJoin(spark)(forced).fastEquals(forced))
    } finally {
      spark.conf.unset("spark.graft.forceShuffleBeforeJoin")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("user repartition(n) layout survives the write (no rebalance injected on top)") {
    // CollapseRepartition keeps the OUTER of two adjacent repartitions,
    // so injecting the insurance rebalance over an explicit
    // repartition(8) would silently delete the user's layout. The rule
    // must skip such plans: observable as exactly 8 output files.
    val dir = Files.createTempDirectory("graft_user_repart").toString + "/t"
    spark.range(0, 1000).repartition(8).write.parquet(dir)
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 8, s"$files files written — user repartition(8) was not preserved")
    // the layout also survives per-row operators between repartition and write
    val dir2 = Files.createTempDirectory("graft_user_repart2").toString + "/t"
    spark.range(0, 1000).repartition(8).withColumn("x", lit(1)).write.parquet(dir2)
    val files2 = new java.io.File(dir2).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files2 == 8, s"$files2 files written — layout lost through a Project")
  }

  test("remove-rebalance-shuffle cancels the write's insurance shuffle on tiny inputs") {
    // The remove rule fires at AQE re-optimization, once the input
    // stage (here: the aggregate's shuffle) is materialized and proves
    // tiny + non-expanding. Observable in the final adaptive plan: the
    // REBALANCE exchange is present with the rule off, gone with it on.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var captured: List[QueryExecution] = Nil
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, d: Long): Unit =
        captured ::= qe
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    def finalPlanHasRebalance(dir: String): Boolean = {
      captured = Nil
      spark.range(0, 1000).selectExpr("id % 8 AS k", "id AS v")
        .groupBy("k").sum("v").write.parquet(dir)
      val deadline = System.nanoTime() + 30e9.toLong
      var qe: Option[QueryExecution] = None
      while (qe.isEmpty && System.nanoTime() < deadline) {
        qe = captured.find(_.optimizedPlan.toString.contains("WriteFiles"))
        if (qe.isEmpty) Thread.sleep(50)
      }
      assert(qe.nonEmpty, "write QueryExecution not captured")
      qe.get.executedPlan.toString
        .split("== Initial Plan ==").head
        .contains("REBALANCE_PARTITIONS_BY_NONE")
    }
    val base = Files.createTempDirectory("graft_rm_rebalance").toString
    spark.listenerManager.register(l)
    try {
      assert(finalPlanHasRebalance(base + "/keep"),
        "premise gone: no insurance rebalance planned for an aggregate write")
      spark.conf.set("spark.graft.removeRebalanceShuffle", "true")
      assert(!finalPlanHasRebalance(base + "/removed"),
        "rebalance shuffle survived in the final adaptive plan")
    } finally {
      spark.conf.unset("spark.graft.removeRebalanceShuffle")
      spark.listenerManager.unregister(l)
    }
  }

  test("drop-ignore-nonexistent rewrites DROP TABLE to IF EXISTS") {
    try {
      spark.conf.set("spark.graft.dropIgnoreNonexistent", "true")
      spark.sql("DROP TABLE graft_no_such_table_xyz")   // must not throw
      spark.conf.set("spark.graft.dropIgnoreNonexistent", "false")
      intercept[Exception] { spark.sql("DROP TABLE graft_no_such_table_xyz") }
    } finally spark.conf.unset("spark.graft.dropIgnoreNonexistent")
  }
}
