package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** Maximal Marginal Relevance diversity re-ranking (Carbonell &
  * Goldstein, SIGIR 1998): greedily pick the candidate maximizing
  * `λ·rel(q, d) − (1−λ)·max_{s∈S} sim(d, s)` — relevance traded
  * against redundancy with what is already selected. The training-data
  * and retrieval use: a plain top-k feeds k near-copies of the same
  * passage; MMR's second term forces coverage (deduplicated few-shot
  * example selection, diverse RAG context packing, eval-set picking).
  *
  * Determinism contract: relevance and pairwise similarities are the
  * shared [[graft.functions.VectorFunctions.cosine]] fold, quantized
  * ONCE to integer micro-units; the greedy objective is pure BIGINT
  * arithmetic (`wRel·rel_micro − wDiv·maxSim_micro`, λ = wRel/(wRel+wDiv))
  * with ties broken by neighbor id — so the DuckDB oracle replays the
  * whole greedy selection bit-for-bit (v22).
  *
  * 100 TB shape: the corpus is scanned ONCE for the relevance
  * shortlist (map-side top-`shortlist` per query, [[TopKAggregator]])
  * and once more for a broadcast semi-join that fetches candidate
  * vectors — it never shuffles. Everything after is
  * corpus-size-independent: candidates are |queries|·shortlist rows,
  * pairwise sims |queries|·shortlist² (both persisted), and the k
  * greedy steps are k bounded plan fragments over those, each
  * localCheckpoint'ed so the composed plan stays linear in k.
  */
object Mmr {

  /** Greedy MMR top-k per query over a relevance shortlist.
    * Returns (query_id, neighbor_id, rnk) with rnk = selection order.
    */
  def mmrTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      shortlist: Int,
      k: Int,
      wRel: Int = 7,
      wDiv: Int = 3): DataFrame = {
    require(k <= shortlist, s"k=$k must not exceed shortlist=$shortlist")
    // stage 1: bounded relevance shortlist (exact cosine top-`shortlist`)
    val cands = SketchRegistry.track(
      SimilaritySearch.bruteForceTopK(corpus, queries, idCol, vecCol, shortlist)
        .select(col("query_id"), col("neighbor_id"),
          floor(col("sim") * 1000000.0).cast("long").as("rel_micro"))
        .persist())
    // candidate vectors ride a broadcast semi-join back over the corpus
    // scan; pairwise sims among a query's candidates are shortlist²
    // rows per query — bounded, persisted, reused by every greedy step
    val withVec = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(cands.select(col("query_id"), col("neighbor_id"))),
        Seq("neighbor_id"))
    val pairs = SketchRegistry.track(
      withVec.select(col("query_id"), col("neighbor_id").as("i"), col("cv").as("vi"))
        .join(withVec.select(col("query_id"), col("neighbor_id").as("j"),
          col("cv").as("vj")), Seq("query_id"))
        .filter(col("i") =!= col("j"))
        .select(col("query_id"), col("i"), col("j"),
          floor(cosine(col("vi"), col("vj")) * 1000000.0).cast("long").as("sim_micro"))
        .persist())
    // greedy selection: k bounded steps; the windows run over ≤shortlist
    // rows per query, never the corpus
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sc").desc, col("neighbor_id").asc)
    var sel = SketchRegistry.track(cands
      .withColumn("sc", col("rel_micro"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("query_id"), col("neighbor_id"), lit(1).cast("int").as("rnk"))
      .localCheckpoint(true))
    for (step <- 2 to k) {
      val selected = sel.select(col("query_id"), col("neighbor_id"))
      val maxSim = pairs
        .join(selected.withColumnRenamed("neighbor_id", "j"), Seq("query_id", "j"))
        .groupBy(col("query_id"), col("i"))
        .agg(max(col("sim_micro")).as("msim"))
        .withColumnRenamed("i", "neighbor_id")
      val next = cands
        .join(selected, Seq("query_id", "neighbor_id"), "left_anti")
        .join(maxSim, Seq("query_id", "neighbor_id"))
        .withColumn("sc",
          lit(wRel.toLong) * col("rel_micro") - lit(wDiv.toLong) * col("msim"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") === 1)
        .select(col("query_id"), col("neighbor_id"), lit(step).cast("int").as("rnk"))
      sel = SketchRegistry.track(sel.union(next).localCheckpoint(true))
    }
    sel
  }
}
