package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Production corpus sampling must be reproducible across reruns and
  * engines (re-materializing a 100 TB sample cannot depend on RNG
  * partition seeds the way `df.sample` does), so every sampler here
  * derives its randomness from a content hash of the row's id:
  *
  *  - [[bernoulli]]: keep rows whose 16-bit md5-derived uniform value
  *    clears the rate. Pure map-side predicate — no shuffle, no state,
  *    trivially pushed past column pruning; at 100 TB this is a scan
  *    filter, nothing more.
  *  - [[stratifiedFixedN]]: exactly n rows per stratum, chosen by
  *    hash order (a deterministic "random" total order). One shuffle
  *    on the stratum key. For heavily-skewed strata at extreme scale,
  *    pre-filter with [[bernoulli]] at a rate that over-samples ~2n
  *    per stratum before ranking, so the window never sees the full
  *    stratum.
  */
object Sampling {

  /** Uniform value in [0, 65536) from the first 4 hex digits of
    * md5(id) — engine-portable (any SQL engine with md5 + string ops
    * reproduces it bit-for-bit).
    */
  def hashBucket16(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("int")

  /** Deterministic Bernoulli sample at `rate` (0..1). */
  def bernoulli(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashBucket16(col(idCol)) < lit(math.round(rate * 65536).toInt))

  /** Leakage-safe train/test split: every row of a GROUP (exact-dup
    * fingerprint group, near-dup cluster id, URL domain, …) lands on
    * the same side, so duplicated or near-duplicated content can never
    * straddle the split — the contamination mode a per-ROW random
    * split reintroduces no matter how well the corpus was deduped
    * (any surviving duplicate pair has a 2·p·(1−p) chance of leaking
    * test text into training).
    *
    * Assignment is a pure function of the group key: seeded md5 →
    * 16-bit uniform, test iff u16 < floor(testPermille·65536/1000)
    * (integer cut, exact in any engine). 100 TB shape: MAP-SIDE ONLY —
    * no join, no shuffle, no collected group table; each row computes
    * its side from the key it already carries, and reruns and other
    * engines reproduce the split bit-for-bit.
    */
  def groupSplit(df: DataFrame, groupCol: String, testPermille: Int,
      seed: String): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille must be in [0, 1000], got $testPermille")
    val cut = testPermille * 65536 / 1000
    df.withColumn("split",
      when(hashBucket16(concat(lit(seed + "-"), col(groupCol).cast("string"))) < lit(cut),
        lit("test")).otherwise(lit("train")))
  }

  /** [[groupSplit]] keyed on the exact-dup content fingerprint
    * ([[graft.functions.TextFunctions.contentFingerprint]]): documents
    * equal after whitespace/case normalization always land on the same
    * side. For NEAR-dup-safe splits, feed the cluster ids from
    * [[Dedup.connectedComponents]] into [[groupSplit]] directly — the
    * assignment rule is identical, only the group key widens.
    */
  def leakageSafeSplit(df: DataFrame, textCol: String, testPermille: Int,
      seed: String): DataFrame =
    groupSplit(
      df.withColumn("fp",
        graft.functions.TextFunctions.contentFingerprint(col(textCol))),
      "fp", testPermille, seed)

  /** Deterministic stratified sample: the n lowest-hashed rows of each
    * stratum (ties broken by id, so the selection is a total order).
    */
  def stratifiedFixedN(df: DataFrame, stratumCol: String, idCol: String, n: Int): DataFrame =
    df.withColumn("__h", hashBucket16(col(idCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= n)
      .drop("__h", "__rn")

  /** The same selection as [[stratifiedFixedN]] — n lowest-hashed rows
    * per stratum, ties by id — via MAP-SIDE partial top-k aggregation
    * ([[TopKAggregator]]) instead of a per-stratum window.
    *
    * Why it exists: `row_number() over (partition by stratum)`
    * shuffles EVERY row of a stratum to one reducer, so one dominant
    * source (half a 100 TB corpus behind one stratum key) serializes
    * through a single task. The aggregator keeps ≤2n candidates per
    * map partition, so the stratum reducer sees O(partitions·n) rows
    * regardless of stratum size — the skew-safe twin, bit-identical
    * output (both rank by (hash asc, id asc)).
    */
  def stratifiedFixedNAgg(df: DataFrame, stratumCol: String, idCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = df.schema(idCol).dataType
    // sim = -hash: the aggregator keeps highest-sim first, ties by
    // id ascending — exactly (hash asc, id asc). Integral ids rank
    // numerically, string ids by binary order — both matching the
    // window twin's orderBy(__h, idCol). Other id types are rejected
    // loudly (a silent cast-to-null selected nothing; r10 ADVICE).
    val selected = idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val top = TopKAggregator.udaf(n)
        df.select(col(stratumCol), col(idCol).cast("long").as("__id"),
            hashBucket16(col(idCol)).as("__h"))
          .groupBy(col(stratumCol))
          .agg(top(col("__id"), -col("__h").cast("double")).as("__top"))
      case StringType =>
        val top = TopKStringAggregator.udaf(n)
        df.select(col(stratumCol), col(idCol).cast("string").as("__id"),
            hashBucket16(col(idCol)).as("__h"))
          .groupBy(col(stratumCol))
          .agg(top(col("__id"), -col("__h").cast("double")).as("__top"))
      case other => throw new IllegalArgumentException(
        s"stratifiedFixedNAgg needs an integral or string id column; " +
          s"'$idCol' is $other — use stratifiedFixedN for exotic id types")
    }
    selected
      .select(col(stratumCol), explode(col("__top")).as("__s"))
      .select(col("__s.neighbor_id").cast(idType).as(idCol), col(stratumCol))
  }

  /** Temperature-based source mixing: sample `totalN` docs with
    * per-stratum targets ∝ n_s^α — the standard recipe for rebalancing
    * dominant vs rare sources/languages when assembling a multi-domain
    * corpus (the multinomial p_l ∝ n_l^α of the multilingual-pretraining
    * literature). α is restricted to 1/2^k (`sqrtApplications` repeated
    * square roots) so the power is IEEE-correctly-rounded on every
    * engine, and the allocation is integer-exact end to end:
    * w_s = floor(sqrt^k(n_s)·1e6) is a per-stratum SCALAR (no
    * cross-row float sums anywhere), Σw is a bigint sum, and
    * target_s = totalN·w_s div Σw is bigint division. Selection is the
    * target_s lowest-md5-hash rows per stratum, same total order as
    * [[stratifiedFixedN]].
    *
    * Scale shape: one count shuffle (partial-agg), a stratum-
    * cardinality weights frame broadcast back, one per-stratum window.
    * Floor-division under-allocates by < #strata rows — by design
    * (deterministic beats exactly-totalN for reproducible pipelines).
    */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
      totalN: Long, sqrtApplications: Int = 1): DataFrame = {
    require(sqrtApplications >= 1, "alpha = 1/2^k needs k >= 1")
    val wExpr = (1 to sqrtApplications)
      .foldLeft(col("__n").cast("double"))((c, _) => sqrt(c))
    val weights = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w_micro", floor(wExpr * lit(1000000.0)).cast("long"))
    val total = weights.agg(sum(col("__w_micro")).as("__total_micro"))
    val targets = weights.crossJoin(broadcast(total))
      .withColumn("__target",
        expr(s"$totalN * __w_micro div __total_micro"))
      .select(col(stratumCol), col("__target"))
    df.withColumn("__h", hashBucket16(col(idCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))))
      .join(broadcast(targets), Seq(stratumCol))
      .filter(col("__rn") <= col("__target"))
      .drop("__h", "__rn", "__target")
  }

  /** Deterministic corpus shuffle + sharding: every row gets a shard
    * in [0, numShards) and a 1-based position within its shard, both
    * pure functions of (seed, id) — the reproducible "global shuffle
    * then split into training shards" step that precedes tokenization.
    * Re-running with the same seed reproduces the exact layout;
    * changing the seed is a fresh permutation.
    *
    * Scale shape: shard assignment is a map-side md5; the only shuffle
    * is the per-shard window, and shards are the parallelism unit — at
    * 100 TB you run numShards in the thousands, so each window
    * partition holds corpus/numShards rows and no reducer sees a
    * global order. (A global `row_number() over (order by hash)` —
    * the tempting one-liner — would funnel the corpus through one
    * reducer.)
    */
  def shuffleShard(df: DataFrame, idCol: String, numShards: Int,
      seed: String): DataFrame = {
    val h = md5(concat(lit(seed + "-"), col(idCol).cast("string")))
    df.withColumn("__h", h)
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("int") % numShards))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))))
      .drop("__h")
  }
}
