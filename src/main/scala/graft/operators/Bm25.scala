package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Robertson/Sparck Jones probabilistic
  * weighting, the Okapi BM25 form) over the corpus — the curation
  * query "find the documents most about X" used for targeted corpus
  * audits and retrieval-based data selection.
  *
  * score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
  * with idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) — the
  * non-negative variant.
  *
  * Determinism across engines: idf is quantized ONCE to integer
  * micro-nats, each per-term score is floor-quantized after one
  * double expression written in the exact association order the
  * DuckDB oracle mirrors, and the final document score is an exact
  * 64-bit integer sum of ≤ |q| terms.
  *
  * 100 TB shape: the corpus explode FILTERS to the query's terms
  * before any shuffle, so the (doc, term) aggregation carries only
  * matching postings; document-frequency and corpus-length statistics
  * are query-sized / scalar and broadcast back; ranking is top-k
  * (TakeOrdered), never a global sort.
  */
object Bm25 {

  def topK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      n: Int = 20): DataFrame = {
    val docs = df.select(col(idCol), split(trim(col(textCol)), " +").as("__t"))
    val lens = docs.select(col(idCol), size(col("__t")).cast("long").as("__len"))
    val global = lens.agg(count(lit(1)).as("__n"), sum(col("__len")).as("__sumlen"))

    // postings for query terms only — the filter precedes the shuffle
    val tf = docs.select(col(idCol), explode(col("__t")).as("__term"))
      .filter(col("__term").isInCollection(queryTerms))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))

    val scored = tf
      .join(broadcast(dfreq), "__term")
      .join(lens, idCol)
      .crossJoin(broadcast(global))
      .withColumn("__idf_micro",
        floor(log((col("__n").cast("double") - col("__df").cast("double") + lit(0.5))
          / (col("__df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1000000.0))
          .cast("long"))
      .withColumn("__avg", col("__sumlen").cast("double") / col("__n").cast("double"))
      .withColumn("__ts",
        floor(col("__idf_micro").cast("double") *
          ((col("__tf").cast("double") * lit(k1 + 1.0)) /
            (col("__tf").cast("double") +
              lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("__len").cast("double") / col("__avg"))))))
          .cast("long"))

    scored.groupBy(col(idCol))
      .agg(sum(col("__ts")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(n)
  }
}
