package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** graft's Catalyst extension bundle, mirroring the reference's
  * injection list (KyuubiSparkSQLExtension.scala:33-62) re-expressed
  * for Spark 4:
  *
  *  - [[GraftSqlParser]]: `OPTIMIZE <target> [WHERE p] ZORDER BY cols`
  *  - [[RebalanceBeforeWriting]]: small-file prevention on inserts
  *  - [[DropIgnoreNonexistent]]: DROP → DROP IF EXISTS
  *  - [[MaxScanStrategy]]: scan watchdog (throws on over-limit scans)
  *
  * Activate with `spark.sql.extensions=graft.plans.GraftSparkExtension`
  * or `.withExtensions(new GraftSparkExtension)`.
  */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    ext.injectResolutionRule(session => new ApplyAuthzPolicies(session))
    ext.injectPostHocResolutionRule(_ => InsertZorderBeforeWriting)
    ext.injectPostHocResolutionRule(_ => RebalanceBeforeWriting)
    ext.injectPostHocResolutionRule(_ => DropIgnoreNonexistent)
    ext.injectCheckRule(_ => UnsupportedOperationsCheck)
    ext.injectPlannerStrategy(session => new MaxScanStrategy(session))
    ext.injectQueryStagePrepRule(session => new DynamicShufflePartitions(session))
    ext.injectQueryStagePrepRule(session => new FinalStageConfigIsolation(session))
    ext.injectQueryStagePrepRule(session => new InsertShuffleNodeBeforeJoin(session))
    ext.injectQueryStagePrepRule(session => new FinalStageResourceManager(session))
    ext.injectRuntimeOptimizerRule(session => RemoveRebalanceShuffle(session))
  }
}
