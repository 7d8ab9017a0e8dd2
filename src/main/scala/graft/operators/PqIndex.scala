package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) for approximate nearest neighbor at
  * compression scale: each corpus vector is encoded as `m` small code
  * ids (one per subspace, argmin-L2 against a per-subspace codebook),
  * and queries score candidates with an asymmetric-distance lookup
  * table (ADC) — `m` table lookups per pair instead of a full
  * `dim`-length dot product.
  *
  * The 100 TB shape is the point: a 64-float embedding becomes `m`
  * byte-sized codes (16-64x less corpus bytes scanned/shuffled), the
  * codebooks and query LUTs are plan literals / broadcast rows, the
  * encode and score steps are pure map-side codegen'd expressions, and
  * ranking is the map-side [[TopKAggregator]] (no window skew). Only
  * the m×k×dsub codebook matrix — an index artifact like the IVF
  * centroids — ever lands on the driver.
  */
object PqIndex {

  /** Nearest code id in one subspace: argmin squared-L2 against the
    * codebook (expressed as max of (-dist, idx) structs, so ties take
    * the larger code id — mirrored by the oracle's ORDER BY).
    */
  def nearestCode(sub: Column, codebook: Array[Array[Double]]): Column = {
    val scored = codebook.zipWithIndex.map { case (c, i) =>
      struct((-l2Sq(sub, array(c.map(lit): _*))).as("nd"), lit(i).as("idx"))
    }
    array_max(array(scored: _*)).getField("idx")
  }

  /** Train `m` codebooks of `k` centroids each: per subspace, seed with
    * the `k` lowest-id subvectors, then `iterations` Lloyd steps
    * (argmin-L2 assign → per-code mean). Distributed jobs throughout;
    * only the codebook matrix is collected.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iterations: Int = 1): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    (0 until m).toArray.map { j =>
      val sub = corpus.select(col(idCol).as("id"),
        slice(col(vecCol), j * dsub + 1, dsub).as("sub"))
      var codebook = sub.orderBy(col("id")).limit(k)
        .select(col("sub")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      (0 until iterations).foreach { _ =>
        val means = sub
          .withColumn("code", nearestCode(col("sub"), codebook))
          .select(col("code"), posexplode(col("sub")).as(Seq("pos", "v")))
          .groupBy(col("code"), col("pos"))
          .agg(avg(col("v").cast("double")).as("mean"))
          .groupBy(col("code"))
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
            s => s.getField("mean")).as("centroid"))
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        codebook = codebook.indices.map(i => means.getOrElse(i, codebook(i))).toArray
      }
      codebook
    }
  }

  /** PQ code array for a vector: one code id per subspace. */
  def encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val dsub = codebooks(0)(0).length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      nearestCode(slice(vec, j * dsub + 1, dsub), cb)
    }: _*)
  }

  /** ADC lookup table for a query vector: `lut[j][code]` = dot of the
    * query's j-th subvector with codebook centroid `code`.
    */
  def lookupTable(qv: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val dsub = codebooks(0)(0).length
    array(codebooks.zipWithIndex.map { case (cb, j) =>
      array(cb.map(c =>
        dot(slice(qv, j * dsub + 1, dsub), array(c.map(lit): _*))): _*)
    }: _*)
  }

  /** Approximate dot product from codes + LUT: m lookups, folded in
    * subspace order (the oracle mirrors the fold order exactly —
    * double addition is not associative).
    */
  def adcDot(lut: Column, codes: Column, m: Int): Column =
    aggregate(sequence(lit(1), lit(m)), lit(0.0),
      (acc, j) => acc + element_at(element_at(lut, j), element_at(codes, j) + 1))

  /** PQ top-k by approximate dot product: corpus side carries only
    * codes, query side broadcasts id + LUT, ranking is map-side.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val m = codebooks.length
    val c = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), codebooks).as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      lookupTable(col(vecCol), codebooks).as("lt"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcDot(col("lt"), col("codes"), m))
    SimilaritySearch.rankTopK(scored, k, simAlias = "adc")
  }
}
