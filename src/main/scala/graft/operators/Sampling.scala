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

  /** Deterministic stratified sample: the n lowest-hashed rows of each
    * stratum (ties broken by id, so the selection is a total order).
    */
  def stratifiedFixedN(df: DataFrame, stratumCol: String, idCol: String, n: Int): DataFrame =
    df.withColumn("__h", hashBucket16(col(idCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= n)
      .drop("__h", "__rn")
}
