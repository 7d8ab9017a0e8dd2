package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** k-center greedy coreset selection (farthest-point traversal; the
  * data-selection construction of Sener & Savarese, "Active Learning
  * for Convolutional Neural Networks: A Core-Set Approach", ICLR 2018,
  * after Gonzalez 1985): start from a deterministic seed and repeatedly
  * add the point FARTHEST from everything already selected — the
  * 2-approximation of the k-center cover, and the standard "pick a
  * small maximally-diverse subset" primitive for embedding-space data
  * selection (seed sets, eval panels, diverse fine-tuning subsets).
  * The complement of [[Mmr]]: MMR re-ranks a per-query shortlist by
  * relevance × diversity; the coreset covers the WHOLE corpus with no
  * relevance side at all.
  *
  * Determinism contract: similarities are the shared
  * [[graft.functions.VectorFunctions.cosine]] fold quantized ONCE to
  * integer micro-units; each step's pick minimizes
  * (max-sim-to-selected, id) in exact BIGINT/tie order, and the seed
  * is the lowest id — so a SQL oracle replays the whole greedy
  * traversal bit-for-bit (v33 unrolls it).
  *
  * 100 TB shape: each of the k steps is ONE map-side corpus pass — the
  * ≤k selected vectors ride along as a broadcast one-row array, the
  * per-point max-sim fold is a codegen'd HOF, and the step's only
  * aggregation is a scalar min(struct) reduce (no corpus shuffle
  * anywhere). Selected frames are localCheckpoint'ed so the composed
  * plan stays linear in k. Cost is k corpus scans by construction —
  * the standard trade for farthest-point; `poolModulus` turns the
  * documented "pre-filter to a candidate pool when k is large" escape
  * into an actual knob.
  */
object Coreset {

  /** Greedy k-center selection over the whole frame.
    * Returns (idCol, rnk) with rnk = selection order (1 = seed).
    *
    * `poolModulus` restricts the traversal to the deterministic
    * candidate pool `id % poolModulus == 0` (the v34 sampling pattern),
    * so each of the k scans reads |corpus|/poolModulus rows instead of
    * the whole corpus — the knob that bounds the k-scan cost when k is
    * large. 1 (the default) is the exact unrestricted traversal; a pool
    * that covers the corpus is bit-identical to it (CoresetSpec pins
    * this), and any pool keeps the determinism contract since the
    * greedy order depends only on the rows in the pool.
    */
  def kcenterCoreset(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, poolModulus: Long = 1L): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    require(poolModulus >= 1, s"poolModulus=$poolModulus must be positive")
    val pool =
      if (poolModulus == 1L) corpus
      else corpus.filter(col(idCol) % poolModulus === 0)
    val pts = pool.select(col(idCol).as("id"), col(vecCol).as("v"))
    // seed: lowest id — deterministic and oracle-replayable (struct-min
    // never reaches the vector field because ids are unique)
    var sel = SketchRegistry.track(
      pts.select(min(struct(col("id"), col("v"))).as("s"))
        .select(col("s.id").as("id"), col("s.v").as("v"),
          lit(1).cast("int").as("rnk"))
        .localCheckpoint(true))
    for (step <- 2 to k) {
      // the selected set as ONE broadcast row; candidates fold their
      // max quantized similarity over it map-side
      val selArr = sel.agg(collect_list(struct(col("id"), col("v"))).as("sel"))
      val next = pts.crossJoin(broadcast(selArr))
        .filter(!array_contains(
          transform(col("sel"), s => s.getField("id")), col("id")))
        .select(col("id"), col("v"),
          aggregate(col("sel"), lit(Long.MinValue),
            (acc, s) => greatest(acc,
              floor(cosine(col("v"), s.getField("v")) * 1000000.0).cast("long")))
            .as("mc"))
        .agg(min(struct(col("mc"), col("id"), col("v"))).as("n"))
        .select(col("n.id").as("id"), col("n.v").as("v"),
          lit(step).cast("int").as("rnk"))
      sel = SketchRegistry.track(sel.union(next).localCheckpoint(true))
    }
    sel.select(col("id").as(idCol), col("rnk"))
  }
}
