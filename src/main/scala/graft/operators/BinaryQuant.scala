package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (1-bit) quantization for embedding search: each dimension
  * collapses to its sign bit against a per-dim threshold, vectors pack
  * into `ceil(dim/32)` BIGINT words, and similarity is the Hamming
  * distance between packed words — the classic sign-random-projection /
  * binary-embedding compression (Charikar, STOC 2002 similarity-
  * preserving sign hashes; the modern "binary quantization" serving
  * mode of vector stores).
  *
  * Why it scales: a 64-dim float32 vector is 256 bytes; its packed form
  * is 16 bytes (two words) — a 16-32× reduction in what the corpus scan
  * reads and what any shuffle would carry, and scoring is XOR+popcount
  * (`bit_count`, a codegen'd intrinsic) instead of `dim` float
  * multiplies. The thresholds derive from [[SqIndex.trainStats]]'s
  * exact per-dim (min, max) — `(mn+mx)/2` is a single IEEE add and a
  * halving (both exact-reproducible in any engine), so codes, Hamming
  * distances and ranks are INTEGER-exact end to end: the DuckDB oracle
  * recomputes all three bit-for-bit with no float-ordering caveats at
  * all (v19).
  *
  * Packing layout (mirrored exactly by the oracle): bit `b` of word `w`
  * covers dimension `w*32 + b` (0-based), i.e. word = Σ_b bit_b·2^b.
  * 32-bit words keep every intermediate nonnegative and far from BIGINT
  * overflow in both engines.
  */
object BinaryQuant {

  val BITS = 32

  /** Per-dim sign thresholds from exact (min, max) stats: (mn+mx)/2. */
  def thresholds(mins: Array[Double], maxs: Array[Double]): Array[Double] =
    mins.indices.map(i => (mins(i) + maxs(i)) / 2.0).toArray

  /** Pack a float-array column into ceil(dim/32) BIGINT sign-bit words.
    * Pure map-side, codegen'd HOFs: the descending fold `acc*2 + bit`
    * builds Σ bit_b·2^b without needing a column-valued shift.
    */
  def packExpr(vec: Column, thr: Array[Double], dim: Int): Column = {
    val nWords = (dim + BITS - 1) / BITS
    val thrCol = typedLit(thr.toSeq)
    transform(sequence(lit(0), lit(nWords - 1)), w =>
      aggregate(sequence(lit(BITS - 1), lit(0), lit(-1)), lit(0L), (acc, b) => {
        val idx = (w * lit(BITS) + b).cast("int") // 0-based dim index
        acc * 2 + when(
          idx < lit(dim) &&
            element_at(vec, idx + 1).cast("double") >= element_at(thrCol, idx + 1),
          lit(1L)).otherwise(lit(0L))
      }))
  }

  /** Hamming distance between two packed-word arrays: Σ popcount(xor). */
  def hammingExpr(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Top-k nearest corpus rows per query by Hamming distance over the
    * packed codes (distance ascending, neighbor id ascending on ties).
    * The corpus maps to its 16-byte codes in the scan and is never
    * shuffled; queries pack map-side and broadcast; ranking is the
    * map-side [[TopKAggregator]] (scored as -hamming so its
    * (sim desc, id asc) order IS (hamming asc, id asc)).
    *
    * Returns (query_id, neighbor_id, hamming, rnk).
    */
  def hammingTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      mins: Array[Double],
      maxs: Array[Double],
      dim: Int,
      k: Int): DataFrame = {
    val thr = thresholds(mins, maxs)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      packExpr(col(vecCol), thr, dim).as("cw"))
    val q = queries.select(col(idCol).as("query_id"),
      packExpr(col(vecCol), thr, dim).as("qw"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", -hammingExpr(col("qw"), col("cw")).cast("double"))
    SimilaritySearch.rankTopK(scored, k)
      .select(col("query_id"), col("neighbor_id"),
        (-col("sim")).cast("long").as("hamming"), col("rnk"))
  }

  /** Matryoshka (MRL) funnel search (Kusupati et al., NeurIPS 2022:
    * embeddings trained so every prefix is itself a usable embedding):
    * stage 1 shortlists `shortlist` candidates per query by cosine over
    * only the first `prefixDim` dims (prefixDim/dim of the flops and
    * bytes); stage 2 reranks the shortlist with full-dim cosine and
    * cuts to top-k. The funnel shape at 100 TB: the corpus is scanned
    * once against prefix slices, the candidate set (|queries|·shortlist
    * rows) broadcasts back for the rescore — the corpus never shuffles.
    *
    * Returns (query_id, neighbor_id, rnk).
    */
  def mrlFunnelTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      prefixDim: Int,
      shortlist: Int,
      k: Int): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val c = corpus.select(col(idCol).as("neighbor_id"),
      slice(col(vecCol), 1, prefixDim).as("cp"))
    val q = queries.select(col(idCol).as("query_id"),
      slice(col(vecCol), 1, prefixDim).as("qp"))
    val short = SimilaritySearch.rankTopK(
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", cosine(col("qp"), col("cp"))),
      shortlist)
    val rescored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(broadcast(short.select(col("query_id"), col("neighbor_id"))), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))),
        Seq("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    SimilaritySearch.rankTopK(rescored, k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }
}
