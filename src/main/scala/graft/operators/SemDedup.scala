package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Semantic deduplication over an embedding column — the SemDeDup
  * recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): cluster the corpus with
  * a k-means coarse quantizer, then search for near-duplicate pairs
  * ONLY within each cluster, so the pair space is Σ|cluster|² instead
  * of n² — the property that makes semantic dedup tractable at
  * 100 TB, where hyperplane-LSH bucketing ([[Dedup.embeddingNearDupPairs]])
  * can split true duplicates across buckets but k-means clusters keep
  * semantic neighborhoods together.
  *
  * Plan shape: assignment is a map-side argmax against the broadcast-
  * literal centroid matrix (no shuffle), the pair join is equi on the
  * cluster id (one shuffle keyed by small ints), and the keep decision
  * is a semi-join-free anti join on the dropped-id set. Cluster
  * training reuses [[IvfIndex.train]] — one Lloyd pass per iteration,
  * only the k×dim matrix on the driver.
  */
object SemDedup {

  /** The corpus with its cluster assignment, computed ONCE and cached
    * (tracked via [[SketchRegistry]] like the other index-backed
    * operators): the argmax-vs-k-centroids expression is the expensive
    * part of every downstream plan — evaluating it on both sides of
    * the pair join (and again for the keep projection) would triple
    * the work AND the generated-code size.
    */
  private def assign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    SketchRegistry.track(
      df.select(col(idCol).as("id"), col(vecCol).as("v"),
        IvfIndex.nearestList(col(vecCol), centroids).as("list_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Near-duplicate pairs within each cluster: (id_a < id_b, both in
    * the same cluster, cosine ≥ `minCosine`).
    */
  def clusterPairs(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], minCosine: Double): DataFrame =
    pairsOf(assign(df, idCol, vecCol, centroids), minCosine)

  private def pairsOf(assigned: DataFrame, minCosine: Double): DataFrame =
    assigned.as("a").join(assigned.as("b"),
        col("a.list_id") === col("b.list_id") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.list_id").as("list_id"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCosine)

  /** Rows surviving semantic dedup, with their cluster id. Keep rule:
    * a row is dropped iff some LOWER-id row in its cluster is within
    * `minCosine` — deterministic, engine-reproducible, and equal to
    * keeping each duplicate group's lowest id (SemDeDup keeps one
    * representative per group; which one is a free choice).
    */
  def keep(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], minCosine: Double): DataFrame = {
    val assigned = assign(df, idCol, vecCol, centroids)
    val dropped = pairsOf(assigned, minCosine)
      .select(col("id_b").as("id")).distinct()
    assigned.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("list_id"))
  }
}
