package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing for training-data pipelines: lay the
  * documents of each shard end-to-end in a canonical order (doc id) and
  * chop the concatenated token stream into fixed-budget packs — the
  * GPT-style concat-and-chunk batching step, expressed relationally so
  * the pack assignment is reproducible across reruns and engines.
  *
  * Each document gets its running `start_offset` (sum of prior docs'
  * token counts within its shard) and lands in
  * `pack_id = start_offset / budget` — the pack containing its first
  * token. The window is PARTITIONED BY the shard column: at 100 TB a
  * pack never crosses a shard, so shards pack independently in
  * parallel and no global ordering exists anywhere in the plan (a
  * global cumulative sum would serialize the corpus through one
  * reducer).
  */
object Packing {

  /** Per-doc pack assignment. `tokenCount` is any integer expression
    * (e.g. `size(tokens(col("text")))`).
    */
  def packByBudget(docs: DataFrame, shardCol: String, idCol: String,
      tokenCount: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol), col(idCol), tokenCount.cast("long").as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", (col("start_offset") / budget).cast("long"))
  }

  /** Pack-level summary: docs per pack and the pack's token fill
    * (the last pack of a shard may under-fill; everything else
    * over-fills by at most one straddling document).
    */
  def packStats(packed: DataFrame, shardCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
}
