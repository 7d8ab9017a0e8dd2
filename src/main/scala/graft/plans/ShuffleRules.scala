package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.plans.{Inner, LeftExistence}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Generate, GlobalLimit, Join, LocalLimit, LogicalPlan, Offset, Project, RebalancePartitions, Sample, Sort, UnaryNode, Union, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.Distribution
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{LogicalQueryStage, QueryStageExec, ShuffleQueryStageExec}
import org.apache.spark.sql.execution.datasources.WriteFiles
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.internal.SQLConf

/** Force a shuffle under every shuffled join so AQE's `OptimizeSkewedJoin`
  * has an exchange to split (reference InsertShuffleNodeBeforeJoin.scala:34
  * via KyuubiEnsureRequirements.scala:43).
  *
  * Why it matters at 100 TB: `OptimizeSkewedJoin` can only split a skewed
  * partition when the join side is fed by a shuffle stage it can re-read.
  * When a child's existing partitioning already satisfies the join
  * distribution (e.g. a bucketed scan, or an upstream aggregate on the
  * same keys), planning omits the exchange — and with it any chance of
  * runtime skew mitigation. On a multi-tenant gateway one hot key then
  * pins a single task for hours. Opt-in
  * (`spark.graft.forceShuffleBeforeJoin=true`) because the extra shuffle
  * is pure overhead when data is not skewed.
  *
  * Unlike the reference — which wraps the whole child (destroying sort
  * order) and then re-runs a forked EnsureRequirements to repair it — we
  * insert the shuffle *below* an existing SortExec and only add a local
  * sort when we broke an ordering the join requires, so no re-planning
  * pass is needed.
  */
class InsertShuffleNodeBeforeJoin(session: SparkSession) extends Rule[SparkPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.forceShuffleBeforeJoin", "false").toBoolean

  override def apply(plan: SparkPlan): SparkPlan = {
    // meaningless without AQE: the inserted shuffle exists only to give
    // OptimizeSkewedJoin a stage boundary to split
    if (!enabled || !conf.getConf(SQLConf.ADAPTIVE_EXECUTION_ENABLED)) return plan
    plan.transformUp {
      case smj: SortMergeJoinExec if !smj.isSkewJoin =>
        smj.withNewChildren(Seq(
          ensureShuffled(smj.requiredChildDistribution.head, smj.requiredChildOrdering.head, smj.left),
          ensureShuffled(smj.requiredChildDistribution(1), smj.requiredChildOrdering(1), smj.right)))
      case shj: ShuffledHashJoinExec if !shj.isSkewJoin =>
        shj.withNewChildren(Seq(
          ensureShuffled(shj.requiredChildDistribution.head, Nil, shj.left),
          ensureShuffled(shj.requiredChildDistribution(1), Nil, shj.right)))
    }
  }

  private def ensureShuffled(
      dist: Distribution,
      ordering: Seq[SortOrder],
      child: SparkPlan): SparkPlan = child match {
    // already fed by an exchange (or a materialized AQE stage): leave alone
    case _: Exchange | _: QueryStageExec => child
    case s: SortExec if s.child.isInstanceOf[Exchange] || s.child.isInstanceOf[QueryStageExec] => s
    // SMJ child sorted but not shuffled (e.g. partial-agg output already
    // clustered on the join keys): shuffle below the sort, order preserved
    case s: SortExec => s.withNewChildren(Seq(shuffle(dist, s.child)))
    // unsorted and unshuffled: shuffle, then restore any required ordering
    case other =>
      val shuffled = shuffle(dist, other)
      if (ordering.nonEmpty) SortExec(ordering, global = false, child = shuffled) else shuffled
  }

  private def shuffle(dist: Distribution, child: SparkPlan): SparkPlan =
    ShuffleExchangeExec(
      dist.createPartitioning(dist.requiredNumPartitions.getOrElse(conf.numShufflePartitions)),
      child)
}

/** AQE runtime-optimizer rule (injected via `injectRuntimeOptimizerRule`)
  * that drops the [[RebalancePartitions]] a write rule injected when the
  * now-materialized upstream stage sizes prove the extra shuffle
  * worthless (reference RemoveRebalanceShuffle.scala:70).
  *
  * [[RebalanceBeforeWriting]] inserts the rebalance *blind* — at
  * resolution time nothing is known about the result size. By the time
  * AQE re-optimizes, the input stages are materialized and their real
  * byte sizes known, so the insurance shuffle can be cancelled when:
  *
  *  - large data: the input has no data-reducing operator (filter/agg/
  *    limit/inner-or-semi join), so the write inherits the input's
  *    already-healthy partitioning — removal saves a full extra pass
  *    over the data (the case that matters at 100 TB: a straight
  *    `INSERT ... SELECT transform(...)` would otherwise shuffle every
  *    byte once more just to re-bucket it); or
  *  - small data: the input has no data-expanding operator (explode/
  *    rollup/join) and is so small that even unbalanced output yields a
  *    tolerable file count — the shuffle saves nothing.
  *
  * Scope guards, matching the reference: only writes whose partition
  * columns are all statically assigned (dynamic-partition inserts keep
  * the rebalance — there it clusters rows by partition value, which is
  * correctness-of-layout, not just balance); only a rebalance directly
  * feeding the write through at most Project/local-Sort; only when the
  * rebalance carries an advisory partition size larger than the
  * session's (a smaller-or-equal advisory means the user asked for
  * *finer* partitions on purpose).
  */
case class RemoveRebalanceShuffle(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.removeRebalanceShuffle", "false").toBoolean) return plan
    plan.transformDown {
      case write: WriteFiles if write.staticPartitions.size == write.partitionColumns.size =>
        write.withNewChildren(Seq(removeRebalance(write.child)))
    }
  }

  private def removeRebalance(plan: LogicalPlan): LogicalPlan = plan match {
    case p: Project => p.withNewChildren(Seq(removeRebalance(p.child)))
    case s: Sort if !s.global => s.withNewChildren(Seq(removeRebalance(s.child)))
    case RebalancePartitions(_, child, _, Some(advisory)) if shouldRemove(child, advisory) =>
      child
    case other => other
  }

  private def shouldRemove(child: LogicalPlan, rebalanceAdvisory: Long): Boolean = {
    val sessionAdvisory = conf.getConf(SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    if (rebalanceAdvisory <= sessionAdvisory) return false

    val groups = stageGroupSizes(child)
    if (groups.isEmpty || groups.exists(_.isEmpty)) return false

    val smallPartition = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      conf.getConfString("spark.graft.removeRebalanceShuffle.smallPartitionSize", "128m"))
    val tolerableFiles =
      conf.getConfString("spark.graft.removeRebalanceShuffle.tolerableSmallFileNum", "3").toInt
    val reducing = hasReducingOperator(child)
    val expanding = hasExpandingOperator(child)
    val coalesce = conf.getConf(SQLConf.COALESCE_PARTITIONS_ENABLED)

    groups.forall { sizes =>
      // representative size: the dominant stage, but at least half the
      // group total so many mid-size stages aren't mistaken for small data
      val rep = sizes.max.max(sizes.sum / 2)
      (!reducing && rep > conf.numShufflePartitions.toLong * smallPartition) ||
      (coalesce && !expanding && rep < sessionAdvisory * tolerableFiles)
    }
  }

  /** Runtime sizes of materialized stages below the rebalance, one group
    * per independent sub-plan (a Union's branches are judged separately).
    * A sub-plan only contributes when ALL its leaves are materialized
    * query stages — partial information would make the size test lie.
    */
  private def stageGroupSizes(plan: LogicalPlan): Seq[Seq[Long]] = plan match {
    case u: Union => u.children.flatMap(stageGroupSizes)
    case u: UnaryNode => stageGroupSizes(u.child)
    case p if p.collectLeaves().forall(_.isInstanceOf[LogicalQueryStage]) =>
      // A LogicalQueryStage's physicalPlan is not necessarily a
      // QueryStageExec itself — after a partial/final aggregate, the
      // stage-ified logical node carries HashAggregate ON TOP of its
      // input ShuffleQueryStage — so dig the stages out of the wrapped
      // physical tree (QueryStageExec is a physical leaf, so collect
      // finds each stage exactly once).
      val stages = p.collect { case s: LogicalQueryStage => s.physicalPlan }
        .flatMap(_.collect { case q: QueryStageExec => q })
      val allMaterialized = stages.nonEmpty && stages.forall {
        case s: ShuffleQueryStageExec => s.isMaterialized && s.mapStats.isDefined
        case s: QueryStageExec => s.isMaterialized
      }
      if (allMaterialized) {
        Seq(stages.map(s =>
          s.getRuntimeStatistics.sizeInBytes.min(BigInt(Long.MaxValue)).toLong))
      } else Seq.empty
    case _ => Seq.empty
  }

  /** All logical nodes of `plan`, INCLUDING those a LogicalQueryStage
    * swallowed (its `logicalPlan` is a member, not a child, so a plain
    * `exists` goes blind exactly when AQE has materialized the input —
    * the only time this rule runs).
    */
  private def logicalNodes(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collect { case x => x }.flatMap {
      case s: LogicalQueryStage => s +: logicalNodes(s.logicalPlan)
      case x => Seq(x)
    }

  private def hasReducingOperator(plan: LogicalPlan): Boolean = logicalNodes(plan).exists {
    case _: Aggregate | _: Filter | _: Sample | _: Offset | _: GlobalLimit | _: LocalLimit |
        _: WindowGroupLimit => true
    case Join(_, _, joinType, _, _) => joinType match {
      case LeftExistence(_) | Inner => true
      case _ => false
    }
    case _ => false
  }

  private def hasExpandingOperator(plan: LogicalPlan): Boolean = logicalNodes(plan).exists {
    case _: Generate | _: Expand => true
    case Join(_, _, LeftExistence(_), _, _) => false
    case _: Join => true
    case _ => false
  }
}
