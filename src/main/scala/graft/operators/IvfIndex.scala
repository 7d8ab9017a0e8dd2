package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse
  * quantizer assigns every corpus vector to its nearest centroid
  * ("list"); a query scores only the vectors in its `nProbe` closest
  * lists. The 100 TB shape: assignment is a map-side expression
  * against broadcast-literal centroids, the probe join is equi on
  * list id (shuffle keyed by small ints), and ranking is the map-side
  * [[TopKAggregator]]. `nProbe = nLists` degenerates to exact brute
  * force — the recall knob is explicit.
  *
  * Centroid training is one distributed Lloyd iteration from
  * deterministic seeds (first `nLists` rows by id): argmin assignment
  * → per-list mean via posexplode — both full DataFrame jobs; only the
  * nLists×dim centroid matrix (an index artifact, like the LSH
  * hyperplanes) lands on the driver.
  */
object IvfIndex {

  /** Train centroids: seed with the `nLists` lowest-id vectors, then
    * `iterations` Lloyd steps (assign → mean).
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iterations: Int = 1): Array[Array[Double]] = {
    var centroids = corpus.orderBy(col(idCol)).limit(nLists)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (0 until iterations).foreach { _ =>
      val assigned = corpus.withColumn("list_id", nearestList(col(vecCol), centroids))
      val means = assigned
        .select(col("list_id"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("list_id"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("list_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Map-side nearest-centroid id: argmax cosine against literal
    * centroids (broadcast with the plan, never shuffled).
    */
  def nearestList(vec: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(vec, array(c.map(lit): _*)).as("sim"), lit(i).as("idx"))
    }
    array_max(array(scored: _*)).getField("idx")
  }

  /** The `nProbe` nearest list ids for a query vector. */
  def probeLists(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(vec, array(c.map(lit): _*)).as("sim"), lit(i).as("idx"))
    }
    transform(slice(reverse(array_sort(array(scored: _*))), 1, nProbe),
      s => s.getField("idx"))
  }

  /** IVF top-k: score each query only against its probed lists. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], k: Int, nProbe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      nearestList(col(vecCol), centroids).as("list_id"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probeLists(col(vecCol), centroids, nProbe)).as("list_id"))
    val scored = c.join(broadcast(q), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val topk = TopKAggregator.udaf(k)
    scored.groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("sim")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"),
        col("s.sim").as("sim"), (col("pos") + 1).cast("int").as("rnk"))
  }
}
