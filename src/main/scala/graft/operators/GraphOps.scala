package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over plain edge-list DataFrames — the
  * pieces a similarity-graph audit needs without a graph framework.
  * [[Dedup.connectedComponents]] is the iterative member of this
  * family; triangle counting below is single-pass.
  */
object GraphOps {

  /** Per-node triangle counts over an undirected edge list. Edges are
    * symmetrized, deduplicated and ORIENTED low→high, so each triangle
    * materializes exactly once as (a < b < c): e(a,b) ⋈ e(b,c) ⋈
    * e(a,c). Two shuffled equi-joins; the orientation bounds the wedge
    * join by Σ deg(lo)² instead of Σ deg² (a production run over a
    * power-law graph would orient by DEGREE instead of id — same plan,
    * tighter bound; counting is exact either way). The per-node rollup
    * is one explode + key-partial aggregate. No pairwise scan exists:
    * every join is an equi-join on a node id.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val wedges = e.toDF("a", "b").join(e.toDF("b", "c"), Seq("b"))
    val tris = wedges.join(e.toDF("a", "c"), Seq("a", "c"))
    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
