package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for approximate nearest neighbor: each
  * corpus vector is compressed to one byte-range code per dimension
  * against per-dimension (min, max) corpus statistics — 4× fewer
  * corpus bytes than raw float32, with none of PQ's codebook training.
  * The FAISS `ScalarQuantizer(QT_8bit)` layout, re-expressed as Spark
  * expressions.
  *
  * 100 TB shape: the (min, max) stats are a dim-sized aggregation (the
  * index artifact — 64 rows here; the only thing collected), encode is
  * a pure map-side expression over the corpus, queries stay raw float
  * and broadcast, scoring folds reconstruct-and-multiply per dimension
  * inside codegen, and ranking is the map-side [[TopKAggregator]].
  *
  * Determinism: codes are floor((v−min)·255/(max−min)) of identical
  * IEEE doubles, reconstruction is min + code·(max−min)/255 with the
  * same association order in the DuckDB oracle, and score folds run in
  * ascending dimension order seeded at 0.0 (= DuckDB's first-element
  * list_reduce seed, exactly, since 0.0 + x is exact).
  */
object SqIndex {

  /** Per-dimension (min, max) over the corpus — the index artifact. */
  def trainStats(corpus: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"), max(col("v").cast("double")).as("mx"))
      .collect()
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r =>
      val p = r.getInt(0)
      mins(p) = r.getDouble(1)
      maxs(p) = r.getDouble(2)
    }
    (mins, maxs)
  }

  /** SQ8 code array: floor((v−min)·255/(max−min)) clipped to [0, 255],
    * constant dims code to 0.
    */
  def encode(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = typedLit(mins.toSeq)
    val mx = typedLit(maxs.toSeq)
    transform(sequence(lit(1), lit(mins.length)), i => {
      val v = element_at(vec, i).cast("double")
      val lo = element_at(mn, i)
      val hi = element_at(mx, i)
      when(hi === lo, lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L), floor(((v - lo) * lit(255.0)) / (hi - lo)))))
    })
  }

  /** Asymmetric approximate dot product: raw query × reconstructed
    * corpus codes, folded in ascending dimension order.
    */
  def sqDot(qv: Column, codes: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = typedLit(mins.toSeq)
    val mx = typedLit(maxs.toSeq)
    aggregate(sequence(lit(1), lit(mins.length)), lit(0.0), (acc, i) => {
      val lo = element_at(mn, i)
      val hi = element_at(mx, i)
      acc + element_at(qv, i).cast("double") *
        (lo + (element_at(codes, i).cast("double") * (hi - lo)) / lit(255.0))
    })
  }

  /** Per-dimension reconstruction error of one vector, nano-quantized:
    * floor(|v − (min + code·(max−min)/255)| · 1e9) as a LONG per
    * dimension — the quantizer-health audit term (a dimension whose
    * corpus range is stretched by one outlier reconstructs everything
    * else badly; its mean error spikes long before any query's recall
    * visibly decays). Integer nanos make the corpus sum associative,
    * so the audit is cross-engine exact at any partitioning.
    */
  def reconErrorNano(vec: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = typedLit(mins.toSeq)
    val mx = typedLit(maxs.toSeq)
    transform(sequence(lit(1), lit(mins.length)), i => {
      val v = element_at(vec, i).cast("double")
      val lo = element_at(mn, i)
      val hi = element_at(mx, i)
      val code = when(hi === lo, lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L), floor(((v - lo) * lit(255.0)) / (hi - lo)))))
      val recon = lo + (code.cast("double") * (hi - lo)) / lit(255.0)
      floor(abs(v - recon) * lit(1000000000.0)).cast("long")
    })
  }

  /** SQ8 top-k by approximate dot product: corpus side carries only
    * codes, query side broadcasts raw vectors, ranking is map-side.
    */
  def sqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      mins: Array[Double], maxs: Array[Double], k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), mins, maxs).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", sqDot(col("qv"), col("codes"), mins, maxs))
    SimilaritySearch.rankTopK(scored, k)
  }
}
