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
    // eager checkpoint: the oriented edge list is referenced THREE times
    // (both wedge sides + the closing join), and each reference of a
    // lazy plan re-executes the upstream — for v39 that upstream is the
    // whole IVF kNN graph (r17; same fix as connectedComponents)
    val e = SketchRegistry.track(edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint(true))
    val wedges = e.toDF("a", "b").join(e.toDF("b", "c"), Seq("b"))
    val tris = wedges.join(e.toDF("a", "c"), Seq("a", "c"))
    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Integer-exact PageRank over a directed edge list — the influence/
    * centrality score a similarity-graph curation pass ranks documents
    * by (a near-dup cluster's "canonical" member, seed selection,
    * spam-mass audits). Ranks live in MICRO units (1.0 → 1,000,000)
    * and every step is integer arithmetic — contribution
    * `pr div outdeg`, damping `(dampingPct·Σin) div 100` — so a SQL
    * engine replays the traversal bit-for-bit (v41's oracle unrolls
    * it) and no float summation order can diverge.
    *
    * 100 TB shape: each of the `iters` rounds is ONE edge-keyed
    * equi-join (ranks meet edges on src) plus a dst-keyed partial
    * aggregate — the canonical distributed PageRank plan; nothing is
    * ever pairwise and nothing collects. Each round's ranks are
    * localCheckpoint'ed so the composed plan stays linear in `iters`
    * (the Coreset pattern). kNN graphs have uniform out-degree k, so
    * the contribution join is skew-free by construction; a power-law
    * web graph would salt the hot dst keys.
    *
    * Dangling nodes (in the node set, no out-edges) simply leak their
    * mass — the standard simplification; nodes with no IN-edges settle
    * at the base (1−d) term via the left join + coalesce.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    // materialize the edge list ONCE: every round joins it, and an
    // expensive upstream (the IVF kNN graph) must not replay per round.
    // The out-degree is STATIC, so it is fused onto the edge rows here —
    // the old per-round `join(outdeg, Seq("src"))` paid a join and its
    // exchange every iteration for a value that never changes (r17
    // optimization; guide §2.4). `pr div outdeg` is unchanged integer
    // math, so every round's ranks are bit-identical.
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .withColumn("outdeg", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    val nodes = e0.select(col("src").as("id"))
      .union(e0.select(col("dst").as("id"))).distinct()
    // Null-contribution self-loops fold the per-round `nodes` LEFT join
    // into the contribution aggregate (the connectedComponents trick):
    // every node appears as a dst, a self-loop's contribution is
    // `pr div NULL` = null which `sum` ignores, and an isolated node's
    // all-null sum coalesces to the base term — rank values identical,
    // one join per round instead of two (r17; round-trip latency
    // dominates the 5-round loop on a kNN-sized graph).
    val e = SketchRegistry.track(
      e0.union(nodes.select(col("id").as("src"), col("id").as("dst"),
          lit(null).cast("long").as("outdeg")))
        .localCheckpoint(true))
    val base = (100L - dampingPct) * 10000L // (1-d) in micro units
    var ranks = SketchRegistry.track(
      nodes.select(col("id"), lit(1000000L).as("pr")).localCheckpoint(true))
    // The rounds compose LAZILY: each round references the previous
    // ranks exactly once and the edge list is already checkpointed, so
    // the composed plan is linear in `iters` and the whole propagation
    // runs as ONE Spark job — the old per-round eager localCheckpoint
    // paid a driver round-trip per round, and round-trip latency
    // dominated the loop on a kNN-sized graph (r17 profile: 34 jobs of
    // ~70 ms for 5 rounds). Ranks math is unchanged, so every round's
    // values stay bit-identical; only the initial ranks stay eager
    // (they are consumed after `e0` is freed below).
    for (_ <- 1 to iters) {
      ranks =
        e.join(ranks.withColumnRenamed("id", "src"), Seq("src"))
          .select(col("dst"), expr("pr div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
          .select(col("dst").as("id"),
            expr(s"$base + ($dampingPct * coalesce(in_sum, 0L)) div 100")
              .as("pr"))
    }
    SketchRegistry.freeLocalCheckpoint(e0)
    ranks.select(col("id"), col("pr").as("pr_micro"))
  }
}
