package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse independently-produced ranked lists (BM25
  * lexical, embedding ANN, ...) into one ranking with reciprocal-rank
  * fusion — the standard trick for combining retrievers whose raw
  * scores are incomparable (RRF, Cormack/Clarke/Buettcher, SIGIR'09;
  * the same fusion the reference's users run downstream of its search
  * surface).
  *
  * Integer-exact by construction: each list contributes
  * `1000000 div (k0 + rank)` micro-points (pure integral division,
  * no floats), so fused scores and tie-breaks (score desc, id asc)
  * reproduce bit-for-bit in any engine — oracle-checkable, and two
  * runs of a production pipeline can never disagree on the fused set.
  *
  * 100 TB shape: the inputs are ALREADY top-k lists (each retriever
  * bounded its own output — BM25 via TakeOrderedAndProject, ANN via
  * map-side TopKAggregator), so the fusion union is k·|lists| rows —
  * driver-safe, shuffle-trivial, independent of corpus size.
  */
object HybridRetrieval {

  /** Fuse `rankings` — frames carrying (`idCol`, `rankCol`), rank
    * 1-based — into (`idCol`, score_micro, n_lists), best first.
    */
  def rrf(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Int = 60, n: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val contribs = rankings.map(_.select(
      col(idCol),
      expr(s"1000000 div ($k0 + cast($rankCol as bigint))").as("__rrf")))
    contribs.reduce(_.unionAll(_))
      .groupBy(col(idCol))
      .agg(sum(col("__rrf")).as("score_micro"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(n)
  }
}
