package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

    // --- Per-label per-dimension centroid sums in integer micro-units:
    //     floor(v * 1e6) is the same IEEE double in every engine, so the
    //     long sums are reduction-order-free AND rounding-tie-free
    //     (decimal casts of floats tie-break differently across engines
    //     at the last digit). Divide by n for the centroid itself. ---
    "v03_label_centroids" -> { (s, dir) =>
      Tables(s, dir).embeddings
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * 1000000)).as("sum_v_micro"),
          count(lit(1)).as("n"))
    },

    // --- Recall@5 of the LSH path vs exact brute force (rows-only:
    //     hyperplane family is driver-side Gaussian, not SQL-portable) ---
    "v06_lsh_recall" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val q = e.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      val approx = SimilaritySearch.lshTopK(e, q, "vec_id", "embedding", k = 5,
        dim = DIM, nPlanes = 8)
      SimilaritySearch.recallAtK(approx, exact, k = 5)
    },

    // --- LSH bucket histogram (distribution sanity + skew check) ---
    "v04_bucket_histogram" -> { (s, dir) =>
      Tables(s, dir).embeddings
        .select(hyperplaneBucket(col("embedding"), DIM, 8, 42L).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
    },

    // --- IVF approximate top-5 (coarse-quantizer scale path; rows-only:
    //     centroids come from a distributed Lloyd iteration) ---
    "v07_knn_ivf" -> { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val q = e.filter(col("vec_id") < 10)
      val centroids = graft.operators.IvfIndex.train(e, "vec_id", "embedding", nLists = 8)
      graft.operators.IvfIndex.ivfTopK(e, q, "vec_id", "embedding",
        centroids, k = 5, nProbe = 3)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
    },

    // --- Embedding-cosine near-dup pairs (rows-only: LSH buckets) ---
    "v08_embedding_neardup" -> { (s, dir) =>
      graft.operators.Dedup.embeddingNearDupPairs(
        Tables(s, dir).embeddings, "vec_id", "embedding",
        dim = DIM, minCosine = 0.4, nPlanes = 8)
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

  // DuckDB double-precision cosine, matching VectorFunctions.cosine's
  // left-to-right fold exactly (0.0-seeded fold == first-element-seeded
  // reduce in IEEE double for these inputs).
  private def duckCosine(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)
        / (sqrt(list_reduce(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y))
         * sqrt(list_reduce(list_transform($b, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (x, y) -> x + y)))"""

  val oracles: Map[String, String] = Map(
    "v01_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
          c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          scored AS (
            SELECT query_id, neighbor_id, ${duckCosine("qv", "cv")} AS sim
            FROM c, q WHERE query_id <> neighbor_id)
          SELECT query_id, neighbor_id, CAST(rnk AS INT) AS rnk FROM (
            SELECT query_id, neighbor_id,
              row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
            FROM scored)
          WHERE rnk <= 5""",
    "v03_label_centroids" ->
      """SELECT label, CAST(pos AS INT) AS pos,
         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_v_micro,
         count(*) AS n
         FROM (SELECT label,
                 UNNEST(generate_series(0, len(embedding) - 1)) AS pos,
                 UNNEST(embedding) AS v
               FROM embeddings)
         GROUP BY 1, 2""",
    "v05_embedding_stats" ->
      """SELECT label, count(*) AS n_vectors,
         count(DISTINCT len(embedding)) AS n_dims_distinct,
         min(vec_id) AS min_id, max(vec_id) AS max_id
         FROM embeddings GROUP BY label"""
  )
}
