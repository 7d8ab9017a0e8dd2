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

  /** Sliding-window document chunking — the RAG/embedding ingestion
    * shape: fixed `chunkTokens`-token windows advancing by `stride`
    * (< chunkTokens ⇒ overlap), the final window shortened to the doc
    * end. Pure map-side: chunk starts come from a `sequence`, the
    * chunk text from an array `slice` — one explode, no shuffle, no
    * state; at 100 TB chunking rides the scan.
    *
    * Returns (idCol, chunk_idx, chunk_start, n_chunk_tokens, chunk)
    * with `chunk` the space-rejoined token window.
    */
  def chunkWithOverlap(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    val toks = split(trim(col(textCol)), " +")
    docs
      .select(col(idCol), toks.as("__t"))
      .select(col(idCol), col("__t"),
        posexplode(sequence(lit(0), size(col("__t")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        slice(col("__t"), col("chunk_start") + 1, lit(chunkTokens)).as("__c"))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        size(col("__c")).as("n_chunk_tokens"),
        concat_ws(" ", col("__c")).as("chunk"))
  }
}
