package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  * pairwise sims |queries|·shortlist², and the greedy selection is a
  * SINGLE query-keyed pass — each query's ≤shortlist candidates and
  * ≤shortlist² sims fold into one aggregation group, and the k greedy
  * steps run inside that bounded group. The old implementation ran
  * the k steps as k distributed plan fragments (join + window +
  * checkpoint each); since every step only reads data local to ONE
  * query, the distributed round-trips were pure overhead at any scale
  * (r17 optimization; guide §1.2 step 1 — the algorithm, not the
  * configuration).
  */
object Mmr {

  /** One greedy selection (fused pass output row). */
  final case class Pick(neighbor_id: Long, rnk: Int)

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
    // rows per query — bounded, consumed once by the fused greedy pass
    val withVec = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(cands.select(col("query_id"), col("neighbor_id"))),
        Seq("neighbor_id"))
    val pairs = withVec
      .select(col("query_id"), col("neighbor_id").as("i"), col("cv").as("vi"))
      .join(withVec.select(col("query_id"), col("neighbor_id").as("j"),
        col("cv").as("vj")), Seq("query_id"))
      .filter(col("i") =!= col("j"))
      .select(col("query_id"), col("i"), col("j"),
        floor(cosine(col("vi"), col("vj")) * 1000000.0).cast("long").as("sim_micro"))
    // Fused greedy: the EXACT selection the step-loop computed —
    // step 1 maximizes rel_micro, steps 2..k maximize
    // wRel·rel − wDiv·max_{s∈selected} sim(·, s); every comparison is
    // BIGINT and ties go to the lowest neighbor id (the old window's
    // `sc desc, neighbor_id asc` order). Selection stops when no
    // unselected candidate remains, matching the old inner-join/
    // anti-join fixpoint.
    val wRelL = wRel.toLong
    val wDivL = wDiv.toLong
    val kk = k
    val greedy = udf((cs: Seq[Row], sims: Seq[Row]) => {
      val n = cs.size
      val ids = new Array[Long](n)
      val rel = new Array[Long](n)
      var x = 0
      cs.foreach { r => ids(x) = r.getLong(0); rel(x) = r.getLong(1); x += 1 }
      // ascending-id visit order makes "strictly greater wins" break
      // ties toward the lowest id
      val order = Array.range(0, n).sortBy(ids)
      val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
      x = 0
      while (x < n) { idx.put(ids(x), x); x += 1 }
      val simM = Array.fill(n * n)(Long.MinValue)
      sims.foreach { r =>
        val ii = idx.get(r.getLong(0))
        val jj = idx.get(r.getLong(1))
        if (ii != null && jj != null) simM(ii * n + jj) = r.getLong(2)
      }
      val taken = new Array[Boolean](n)
      // running max-sim-to-selected; MinValue = "no sim row yet", the
      // state the old plan expressed by its INNER join with maxSim
      // (such a candidate is unpickable that step). Similarities are
      // signed micro-cosines, so the neutral element must be MinValue,
      // not 0 — an all-negative row (anti-correlated candidate) keeps
      // its true (negative) penalty.
      val ms = Array.fill(n)(Long.MinValue)
      val picks = new scala.collection.mutable.ArrayBuffer[Pick](kk)
      var step = 1
      var done = false
      while (step <= kk && !done) {
        var bi = -1
        var bsc = 0L
        order.foreach { c =>
          if (!taken(c) && (step == 1 || ms(c) != Long.MinValue)) {
            val sc = if (step == 1) rel(c) else wRelL * rel(c) - wDivL * ms(c)
            if (bi < 0 || sc > bsc) { bi = c; bsc = sc }
          }
        }
        if (bi < 0) done = true
        else {
          taken(bi) = true
          picks += Pick(ids(bi), step)
          var y = 0
          while (y < n) {
            if (!taken(y)) {
              val s = simM(y * n + bi)
              if (s > ms(y)) ms(y) = s
            }
            y += 1
          }
          step += 1
        }
      }
      picks.toSeq
    })
    val candsAgg = cands.groupBy(col("query_id"))
      .agg(collect_list(struct(col("neighbor_id"), col("rel_micro"))).as("cs"))
    val pairsAgg = pairs.groupBy(col("query_id"))
      .agg(collect_list(struct(col("i"), col("j"), col("sim_micro"))).as("sims"))
    candsAgg
      .join(pairsAgg, Seq("query_id"), "left") // a 1-candidate query has no pairs
      .select(col("query_id"),
        explode(greedy(col("cs"),
          coalesce(col("sims"),
            array().cast("array<struct<i:bigint,j:bigint,sim_micro:bigint>>"))))
          .as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.rnk").as("rnk"))
  }
}
