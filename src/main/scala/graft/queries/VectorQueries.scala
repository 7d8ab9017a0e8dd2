package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._
import graft.operators.SimilaritySearch

/** Similarity search / embedding analytics over the `embeddings` table
  * (vec_id, embedding array<float>, label).
  *
  * Ranking queries are rows-only checks (float accumulation order
  * differs across engines); the count/exact-arithmetic ones carry
  * DuckDB oracles.
  */
object VectorQueries {

  private val DIM = 64

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Exact brute-force cosine top-5 for 10 query vectors ---
    "v01_knn_brute" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val q = e.filter(col("vec_id") < 10)
      SimilaritySearch.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
    },

    // --- LSH-bucketed approximate top-5 (the scale path) ---
    "v02_knn_lsh" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val q = e.filter(col("vec_id") < 10)
      SimilaritySearch.lshTopK(e, q, "vec_id", "embedding", k = 5,
        dim = DIM, nPlanes = 8)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
    },

    // --- Per-label centroid vectors ---
    "v03_label_centroids" -> { (s, dir) =>
      SimilaritySearch.labelCentroids(Tables(s, dir).embeddings, "label", "embedding")
        .select(col("label"), col("n_vectors"))
    },

    // --- LSH bucket histogram (distribution sanity + skew check) ---
    "v04_bucket_histogram" -> { (s, dir) =>
      Tables(s, dir).embeddings
        .select(hyperplaneBucket(col("embedding"), DIM, 8, 42L).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
    },

    // --- Dimension / count facts (oracle-checked) ---
    "v05_embedding_stats" -> { (s, dir) =>
      Tables(s, dir).embeddings
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          countDistinct(size(col("embedding"))).as("n_dims_distinct"),
          min(col("vec_id")).as("min_id"),
          max(col("vec_id")).as("max_id"))
    }
  )

  val oracles: Map[String, String] = Map(
    "v05_embedding_stats" ->
      """SELECT label, count(*) AS n_vectors,
         count(DISTINCT len(embedding)) AS n_dims_distinct,
         min(vec_id) AS min_id, max(vec_id) AS max_id
         FROM embeddings GROUP BY label"""
  )
}
