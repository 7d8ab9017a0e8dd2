package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.size
import org.apache.spark.sql.graft.Bridge

/** graft's Catalyst extension bundle, mirroring the reference's
  * injection list (KyuubiSparkSQLExtension.scala:33-62) re-expressed
  * for Spark 4:
  *
  *  - [[GraftSqlParser]]: `OPTIMIZE <target> [WHERE p] ZORDER BY cols`
  *  - [[RebalanceBeforeWriting]]: small-file prevention on inserts
  *  - [[DropIgnoreNonexistent]]: DROP → DROP IF EXISTS
  *  - [[MaxScanStrategy]]: scan watchdog (throws on over-limit scans)
  *  - SQL bindings for the text/vector pipeline kernels (below), so
  *    every `spark.sql` user — JDBC, Trino, batch scripts — can call
  *    the corpus primitives without the Scala API
  *
  * Activate with `spark.sql.extensions=graft.plans.GraftSparkExtension`
  * or `.withExtensions(new GraftSparkExtension)`.
  */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {

  import GraftSparkExtension.sqlFunctions

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
    ext.injectQueryStagePrepRule(session => new InjectCustomResourceProfile(session))
    ext.injectRuntimeOptimizerRule(session => RemoveRebalanceShuffle(session))
    sqlFunctions.foreach(ext.injectFunction)
  }
}

object GraftSparkExtension {
  import graft.functions.TextFunctions._
  import graft.functions.VectorFunctions.cosine

  private def c(e: Expression): Column = Bridge.column(e)

  /** A size/seed argument must be a foldable integer — these pick a
    * STRUCTURE (array widths, hash families), not a per-row value.
    */
  private def litInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got $other")
    }
  }

  private def fn(name: String, usage: String)(
      builder: Seq[Expression] => Column):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftSparkExtension].getName, null, name, usage, ""),
      args => Bridge.analyzableExpression(builder(args)))

  /** SQL bindings for the codegen'd pipeline kernels. All pure
    * map-side expressions — exposing them changes nothing about the
    * plans, only who can reach them.
    */
  val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_tokens", "graft_tokens(text) - whitespace tokens") {
      args => tokens(c(args.head))
    },
    fn("graft_token_count", "graft_token_count(text) - whitespace token count") {
      args => size(tokens(c(args.head)))
    },
    fn("graft_normalize_ws", "graft_normalize_ws(text) - collapse whitespace runs") {
      args => normalizeWs(c(args.head))
    },
    fn("graft_shingles", "graft_shingles(text, n) - n-token shingles") {
      args => shingles(c(args.head), litInt(args(1), "graft_shingles", "n"))
    },
    fn("graft_minhash", "graft_minhash(text, n, k) - k-wide MinHash signature of n-token shingles") {
      args => minhashSignature(
        shingles(c(args.head), litInt(args(1), "graft_minhash", "n")),
        litInt(args(2), "graft_minhash", "k"))
    },
    fn("graft_simhash", "graft_simhash(text) - 64-bit SimHash of the token set") {
      args => simhash64(tokens(c(args.head)))
    },
    fn("graft_hamming64", "graft_hamming64(a, b) - hamming distance of two 64-bit hashes") {
      args => hamming64(c(args.head), c(args(1)))
    },
    fn("graft_fingerprint", "graft_fingerprint(text) - rolling content fingerprint") {
      args => contentFingerprint(c(args.head))
    },
    fn("graft_lang_guess", "graft_lang_guess(text) - marker-token language guess") {
      args => langGuess(tokens(c(args.head)))
    },
    fn("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays") {
      args => cosine(c(args.head), c(args(1)))
    },
    fn("graft_nfc", "graft_nfc(text) - Unicode NFC canonical composition") {
      args => nfcNormalize(c(args.head))
    },
    fn("graft_winnow",
      "graft_winnow(hashes, window) - winnowing selection: each window's min hash (rightmost on ties), packed pos*2^32+fp") {
      args => org.apache.spark.sql.graft.WinnowExpr.of(
        c(args.head), litInt(args(1), "graft_winnow", "window"))
    })
}
