package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Physical-plan assertions for the scale-critical properties the
  * operators claim — the plan IS the contract at 100 TB, so regressions
  * here are performance bugs even when results stay correct.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.sfDir

  private def planOf(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q02: filter and projection reach the parquet scan") {
    val df = RelationalQueries.queries("q02_filter_project")(spark, dir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan.take(600))
    assert(scan.contains("p_size") && !scan.contains("p_mfgr"),
      "scan must read only referenced columns")
  }

  test("q05: dimension joins broadcast, no cartesian products") {
    val plan = planOf(RelationalQueries.queries("q05_nation_revenue")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"))
  }

  test("v01: ANN ranking is a partial aggregation, not a window") {
    val plan = planOf(VectorQueries.queries("v01_knn_brute")(spark, dir))
    assert(!plan.contains("Window"), "window ranking shuffles the full scored set")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected aggregate-based top-k in:\n${plan.take(800)}")
  }

  test("d08: signature computed by the custom single-pass expression") {
    val df = TextQueries.queries("d08_minhash_pairs")(spark, dir)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_minhash_signature"),
      "minhash must use MinHashSignatureExpr, not composed array_min/transform")
    df.unpersist() // the operator persists its sketch; drop it for test isolation
  }

  test("whole-stage codegen covers the relational hot paths") {
    val plan = planOf(RelationalQueries.queries("q01_pricing_summary")(spark, dir))
    assert(plan.contains("*("), s"no WholeStageCodegen spans in:\n${plan.take(400)}")
  }

  test("d21: repetition metrics are pure map-side (no exchange in the plan)") {
    val plan = planOf(PipelineQueries.queries("d21_repetition")(spark, dir))
    assert(!plan.contains("Exchange"), s"repetition metrics must not shuffle:\n${plan.take(600)}")
  }

  test("d22: decontamination joins the corpus against a BROADCAST eval gram set") {
    val plan = planOf(PipelineQueries.queries("d22_decontaminate")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams must broadcast — corpus side must not shuffle for the join:\n${plan.take(600)}")
  }

  test("d64: prefix-join is equi, verification bounded — no product join, no window") {
    val plan = planOf(TextQueries.queries("d64_prefix_jaccard")(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"prefix filtering must candidate via a token equi-join:\n${plan.take(600)}")
    // the per-doc prefix comes from a bounded collect+sort+slice
    // aggregate, not a per-token window sort
    assert(!plan.contains("Window"),
      s"prefix selection must not be a window:\n${plan.take(600)}")
  }

  test("v41: pagerank plan stays linear in iterations off the checkpointed edges") {
    val df = VectorQueries.queries("v41_pagerank")(spark, dir)
    df.collect()
    // The 5 rounds compose LAZILY into one job (r17: per-round eager
    // checkpoints paid a driver round-trip each); boundedness now means
    // LINEAR — one equi-join per round, every round hanging off the
    // checkpointed edge RDD, with the expensive kNN upstream absent
    // (it lives behind the checkpoint, so no parquet source and no
    // per-round re-execution can appear here).
    val plan = df.queryExecution.optimizedPlan.toString
    val joins = "Join".r.findAllIn(plan).length
    assert(joins <= 6, s"expected ≤ one join per round, got $joins joins:\n${plan.take(800)}")
    assert(!plan.contains("parquet"),
      s"rounds must hang off the checkpointed edge list, not re-plan the corpus:\n${plan.take(800)}")
  }

  test("d29: span dedup aggregates first-occurrences, no window, no product join") {
    val plan = planOf(TextQueries.queries("d29_span_dedup")(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"span dedup must not plan a product join:\n${plan.take(500)}")
    // first-occurrence selection must be the skew-proof partial min
    // aggregation, NOT a per-span row_number window (single-reducer
    // sort on a boilerplate span duplicated across millions of docs)
    assert(!plan.contains("Window"),
      s"span first-occurrence must not be a window:\n${plan.take(500)}")
    assert(plan.contains("partial_min") || plan.contains("min("),
      s"expected min-struct aggregation in:\n${plan.take(800)}")
  }

  test("v09: PQ encode/LUT/ADC run as the native kernels") {
    val df = VectorQueries.queries("v09_pq_topk")(spark, dir)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("graft_pq_encode") && analyzed.contains("graft_pq_lut")
      && analyzed.contains("graft_pq_adc"),
      "PQ path must use the native kernels, not composed lambda folds")
  }

  test("d36: DSIR reads the persisted count table, selects via top-k, never a global sort") {
    val plan = planOf(TextQueries.queries("d36_dsir_select")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), "selection must be top-k")
    assert(plan.contains("InMemoryTableScan"),
      "both stat branches must fold the pinned (doc, bucket) counts, not re-scan the corpus")
    assert(plan.contains("BroadcastHashJoin"), "bucket scores must broadcast")
  }

  test("d44: bigram gate plans aggregations only — no window, no product join") {
    val plan = planOf(TextQueries.queries("d44_bigram_lm_gate")(spark, dir))
    assert(!plan.contains("Window"),
      "the bigram model must come from aggregations, not per-doc windows")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "lp join must stay equi-keyed on (w1, w2)")
    assert(plan.contains("InMemoryTableScan"),
      "model and scoring branches must fold the pinned pair-count table, not re-tokenize")
  }

  test("d46: fraction decontamination broadcasts the eval grams, no product join") {
    val plan = planOf(PipelineQueries.queries("d46_contamination_frac")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "the eval gram set must broadcast (it is artifact-sized at any corpus scale)")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("InMemoryTableScan"),
      "totals and hits branches must fold the pinned per-doc gram frame")
  }

  test("d47: containment pair join is df-capped before the pair explode") {
    val plan = planOf(TextQueries.queries("d47_containment_pairs")(spark, dir))
    assert(plan.contains("LeftSemi"),
      "posting lists must be pruned by the df-cap semi join BEFORE collect_list")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "pairs come from capped posting-list explodes, never a product join")
  }

  test("d39: BM25 top-k is TakeOrderedAndProject, never a global sort") {
    val plan = planOf(TextQueries.queries("d39_bm25_topk")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"BM25 ranking must be top-k (per-partition heads + driver merge), not a full Sort:\n${plan.take(800)}")
    // a global Sort of the scored corpus is the single-reducer shape
    // top-k exists to avoid; Sorts inside joins/aggregates are fine,
    // but the ranking itself must not be Sort+(Global)Limit
    assert(!plan.contains("GlobalLimit"),
      s"ranking must not be Sort+GlobalLimit:\n${plan.take(800)}")
  }

  test("d38: source-overlap pair join is equi on the gram key, no nested-loop join") {
    val plan = planOf(TextQueries.queries("d38_source_overlap")(spark, dir))
    assert(plan.contains("InMemoryTableScan"),
      "all three consumers must read the pinned distinct (source, gram) set")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the pair join must stay equi-keyed on the gram hash")
  }

  test("v16: SQ8 ranking is a partial aggregation over broadcast queries") {
    val plan = planOf(VectorQueries.queries("v16_sq8_topk")(spark, dir))
    assert(!plan.contains("Window"), "window ranking shuffles the full scored set")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      "expected aggregate-based top-k")
    assert(plan.contains("BroadcastExchange"), "query side must broadcast")
  }

  test("d49: RRF fusion top-k is TakeOrdered over bounded lists, no cartesian join") {
    val plan = planOf(TextQueries.queries("d49_hybrid_rrf")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"fused cut must be TakeOrdered, not a global sort:\n${plan.take(600)}")
    assert(!plan.contains("CartesianProduct"), "no cartesian in the fusion")
  }

  test("d50: quantile threshold windows the HISTOGRAM, never the raw corpus") {
    val df = TextQueries.queries("d50_quantile_gate")(spark, dir)
    // the cumulative-rank Window must sit above the length-histogram
    // Aggregate — a window over raw rows would serialize the corpus
    // through one reducer, the exact shape this operator exists to avoid
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the cumulative histogram window")
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"window input must be the histogram aggregate:\n${w.treeString.take(600)}")
    }
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "threshold must broadcast back for the map-side gate")
  }

  test("d52: perplexity-bucket thresholds window the score HISTOGRAM, never raw docs") {
    val df = TextQueries.queries("d52_ppl_buckets")(spark, dir)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the cumulative histogram window")
    windows.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        s"window input must be the milli-nat histogram aggregate:\n${w.treeString.take(600)}")
    }
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "bucket thresholds must broadcast back for the map-side CASE")
  }

  test("v18: filtered search pushes the metadata predicate into the parquet scan") {
    val plan = planOf(VectorQueries.queries("v18_filtered_knn")(spark, dir))
    // the corpus-side scan must carry the label filter as a pushed
    // parquet filter — post-filtering scored rows would read and score
    // the whole store
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(label,3)"),
      s"label predicate must reach the scan:\n${plan.take(1200)}")
    assert(!plan.contains("Window"), "ranking stays aggregate-based under the filter")
  }

  test("d54: the leakage-safe split is map-side only — zero exchanges") {
    // the operator's whole scale claim: split assignment is a pure
    // function of the group key each row carries, so the plan must be
    // scan → project, with no shuffle, no join, no aggregation
    val plan = planOf(TextQueries.queries("d54_leakage_split")(spark, dir))
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n${plan.take(600)}")
    assert(!plan.contains("Join"), s"split must not join:\n${plan.take(600)}")
  }

  test("v22: MMR greedy is ONE fused query-keyed pass — no per-step plan fragments") {
    // r17: the k greedy steps fold into a single query-keyed
    // aggregation + generate (each step only reads data local to one
    // query, so distributing the steps was pure round-trip overhead).
    // The plan must stay bounded: the shortlist/pairs machinery, one
    // collect_list aggregation pair, one generate — and none of the
    // old per-step window/anti-join chain.
    val plan = planOf(VectorQueries.queries("v22_mmr_rerank")(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("Window"),
      s"greedy must not rank via per-step windows:\n${plan.take(600)}")
    assert(plan.contains("Generate explode"),
      s"fused greedy must explode its picks in one pass:\n${plan.take(600)}")
  }

  test("v23: range search broadcasts the query set and never shuffles the corpus") {
    // the whole point of range search over top-k: no global order to
    // maintain, so the plan is scan → broadcast join → filter with no
    // ranking aggregation, no window, and no corpus shuffle
    val plan = planOf(VectorQueries.queries("v23_range_search")(spark, dir))
    assert(plan.contains("BroadcastExchange"), plan.take(600))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"range search must not shuffle the corpus:\n${plan.take(600)}")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"), plan.take(600))
  }

  test("d56: token entropy is pure map-side (no exchange in the plan)") {
    // entropy folds each doc's own token array — any exchange would
    // mean the per-doc computation leaked into a shuffle
    val plan = planOf(TextQueries.queries("d56_token_entropy")(spark, dir))
    assert(!plan.contains("Exchange"), s"entropy must not shuffle:\n${plan.take(600)}")
    assert(!plan.contains("Join"), plan.take(600))
  }

  test("v25: centroid assignment broadcasts one scalar row; the corpus is never shuffled") {
    // the only exchanges live in the vocabulary-sized centroid build
    // ((label, pos) then label — 640 rows at DIM=64); the corpus side
    // must meet the centroid table through a broadcast, not a shuffle
    val plan = planOf(VectorQueries.queries("v25_centroid_assign")(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"), plan.take(800))
  }

  test("v27: tombstone exclusion is a broadcast anti-join, not a shuffle") {
    // deletes must stay O(|tombstones|) at probe time: the codes scan
    // anti-joins a broadcast tombstone set; a sort-merge anti would
    // shuffle the whole codes artifact for a handful of deletes
    val plan = planOf(VectorQueries.queries("v27_deleted_knn")(spark, dir))
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      s"tombstone anti-join must broadcast:\n${plan.take(800)}")
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("v28: multi-probe join broadcasts the exploded query side") {
    val plan = planOf(VectorQueries.queries("v28_multiprobe_lsh")(spark, dir))
    assert(plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"bucket join must broadcast, ranking stays aggregate-based:\n${plan.take(800)}")
  }

  test("q36/q37: one hash exchange each — the window and the group share the partitioning") {
    // TWA and OHLC both window-then-aggregate on the same keys; a
    // second exchange would mean the aggregation failed to reuse the
    // window's partitioning
    for (q <- Seq("q36_time_weighted_avg", "q37_ohlc")) {
      val plan = planOf(RelationalQueries.queries(q)(spark, dir))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$q must not plan a product join:\n${plan.take(500)}")
      assert(plan.contains("Window"), s"$q expected the window plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"$q expected ONE data exchange, found $exchanges:\n${plan.take(800)}")
    }
  }

  test("q38: forward as-of is a joinless single window walk on the key") {
    // union-and-window: the only exchange partitions by user_id; a
    // Join node here would mean the theta-join shape crept back in
    val plan = planOf(RelationalQueries.queries("q38_asof_forward")(spark, dir))
    assert(!plan.contains("Join"), s"forward as-of must be joinless:\n${plan.take(600)}")
    assert(plan.contains("Window"), plan.take(400))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected ONE data exchange, found $exchanges:\n${plan.take(800)}")
  }

  test("v30: every sweep point keeps the broadcast probe shape") {
    // the corpus-sized probe joins must broadcast and ranking stays
    // aggregate-based; the recall compare may SMJ — it joins two
    // query-sized (≤ |queries| rows) top-k frames, never the corpus
    val plan = planOf(VectorQueries.queries("v30_nprobe_sweep")(spark, dir))
    assert(plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
      s"probe joins must broadcast, ranking stays aggregate-based:\n${plan.take(800)}")
  }

  test("v31/v32: label-aware vector ops broadcast; the corpus never shuffles for the join") {
    // hard negatives: per-pair label predicate lives in the broadcast
    // join; outliers: the label-sized centroid table broadcasts
    for (q <- Seq("v31_hard_negatives", "v32_centroid_outliers")) {
      val plan = planOf(VectorQueries.queries(q)(spark, dir))
      assert(plan.contains("BroadcastExchange"), s"$q:\n${plan.take(600)}")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
        s"$q must broadcast and stay aggregate-ranked:\n${plan.take(600)}")
    }
  }

  test("q39: debounce is one exchange on (user, type) and a lag walk") {
    val plan = planOf(RelationalQueries.queries("q39_debounce")(spark, dir))
    assert(!plan.contains("Join"), s"debounce must be joinless:\n${plan.take(500)}")
    assert(plan.contains("Window"), plan.take(400))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected ONE data exchange, found $exchanges:\n${plan.take(800)}")
  }

  test("q40: anomaly stats join broadcasts the |types|-row table") {
    val plan = planOf(RelationalQueries.queries("q40_hourly_anomaly")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"),
      s"an SMJ would shuffle the densified series against a handful of stats rows:\n${plan.take(600)}")
  }

  test("v34: histogram pairs come from a broadcast of the bounded sample, no corpus shuffle") {
    val plan = planOf(VectorQueries.queries("v34_sim_histogram")(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(600))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct") &&
      !plan.contains("Window"),
      s"pair generation must broadcast the sample:\n${plan.take(600)}")
  }

  test("v35: reconstruction-error audit is joinless with map-side partial aggregation") {
    val df = VectorQueries.queries("v35_sq8_error")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("Join"), s"the audit needs no join:\n${plan.take(500)}")
    assert(plan.contains("HashAggregate"), plan.take(400))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"one DIM-key exchange after the partial aggregate, found $exchanges:\n${plan.take(800)}")
  }

  test("v36: gram matrix is joinless with one DIM²-key exchange") {
    val plan = planOf(VectorQueries.queries("v36_gram_matrix")(spark, dir))
    assert(!plan.contains("Join"), s"Σxxᵀ needs no join:\n${plan.take(500)}")
    assert(plan.contains("HashAggregate"), plan.take(400))
    // exactly one REQUIRED exchange — the (i,j)-key one after the
    // partial aggregate (the shuffle carries only DIM² partial sums).
    // An explicit REPARTITION_BY_COL may additionally appear: the r17
    // narrow-input spread (SkewTools.spreadIfNarrow) fires on the
    // single-row-group fixture and never at scale, so it is excluded
    // from the scale contract this pin protects.
    val required = "ENSURE_REQUIREMENTS".r.findAllIn(plan).size
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(required == 1 && exchanges <= 2,
      s"one (i,j)-key exchange after the partial aggregate, found $required required / $exchanges total:\n${plan.take(800)}")
  }

  test("m05: phash banding uses equi-joins only — no pairwise scan anywhere") {
    val plan = planOf(MultimodalQueries.queries("m05_phash_neardup")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"banded Hamming search must never degrade to a pair scan:\n${plan.take(800)}")
  }

  test("q42: sliding distinct has no window and no pairwise join of raw events") {
    val plan = planOf(RelationalQueries.queries("q42_sliding_distinct")(spark, dir))
    assert(!plan.contains("Window"),
      "the trailing-window count must come from the explode, not a window over events")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("d59: novelty is gram-keyed aggregation — equi-joins only") {
    val plan = planOf(TextQueries.queries("d59_ngram_novelty")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"no pairwise stage may exist:\n${plan.take(800)}")
    assert(!plan.contains("Window"))
  }

  test("v37: kNN graph is a list_id equi-join with aggregate ranking — no window, no pair scan") {
    val plan = planOf(VectorQueries.queries("v37_knn_graph")(spark, dir))
    assert(!plan.contains("Window"),
      "per-query ranking must be the bounded-heap aggregate, not a window")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"the corpus self-join must stay list_id-bucketed:\n${plan.take(800)}")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan.take(400))
  }

  test("m06: audio quality audit is a pure per-partition decode — no exchange") {
    val plan = planOf(MultimodalQueries.queries("m06_audio_quality")(spark, dir))
    assert(!plan.contains("Exchange"),
      s"per-clip features need no shuffle:\n${plan.take(600)}")
    assert(!plan.contains("Join"))
  }

  test("q43: exact quantiles are one group-keyed exchange") {
    val plan = planOf(RelationalQueries.queries("q43_exact_quantiles")(spark, dir))
    assert(!plan.contains("Window") && !plan.contains("Join"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"found $exchanges exchanges:\n${plan.take(800)}")
  }

  test("q44: latest-row-per-key is one struct-max exchange — no window, no join") {
    val plan = planOf(RelationalQueries.queries("q44_latest_event")(spark, dir))
    assert(!plan.contains("Window"),
      "the snapshot collapse must not sort the full log per key")
    assert(!plan.contains("Join"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"found $exchanges exchanges:\n${plan.take(800)}")
  }

  test("d60: source matrix adds only equi-joins to the capped banding chain") {
    val plan = planOf(TextQueries.queries("d60_source_neardup_matrix")(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"no pairwise scan:\n${plan.take(800)}")
  }

  test("m07: scene changes are a pure per-partition pass — no exchange, no join") {
    val plan = planOf(MultimodalQueries.queries("m07_scene_changes")(spark, dir))
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"per-clip deltas need no shuffle:\n${plan.take(600)}")
  }

  test("v38: SDC keeps the ADC shape — broadcast query LUTs, no window ranking") {
    val plan = planOf(VectorQueries.queries("v38_pq_sdc_topk")(spark, dir))
    assert(!plan.contains("Window"))
    assert(plan.contains("BroadcastExchange"), "the bounded query side must broadcast")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan.take(400))
  }

  test("v39: triangle rollup is equi-joins only — no pairwise scan, no window") {
    val plan = planOf(VectorQueries.queries("v39_knn_triangles")(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"wedge/closure joins must stay id-keyed:\n${plan.take(800)}")
    assert(!plan.contains("Window"),
      "ranking inside the knn build must stay the bounded-heap aggregate")
  }

  test("q45: CUSUM folds map-side over per-type bounded arrays — no window") {
    val plan = planOf(RelationalQueries.queries("q45_cusum_alarm")(spark, dir))
    assert(!plan.contains("Window"),
      "the sequential fold must be the aggregate HOF, not a window walk")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  test("q48/q50: cohort and churn queries aggregate the bounded activity set — no window, no product join") {
    Seq("q48_retention_cohorts", "q50_weekly_churn").foreach { q =>
      val plan = planOf(RelationalQueries.queries(q)(spark, dir))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$q: cohort linking must be user-keyed equi-joins:\n${plan.take(500)}")
      assert(!plan.contains("Window"),
        s"$q: first-week selection must be a min aggregate, not a window:\n${plan.take(500)}")
    }
  }

  test("q49: funnel steps chain by user-keyed equi-joins; only the three scalar step counts cross-join") {
    val plan = planOf(RelationalQueries.queries("q49_funnel_conversion")(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"funnel must not plan an unconstrained cartesian:\n${plan.take(500)}")
    // the per-user chaining is equi (the BNLJ allowed here joins the
    // three ONE-ROW global aggregates into the summary row)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"step chaining must be a user-keyed equi-join:\n${plan.take(500)}")
  }

  test("d66: the top-K vocabulary is a TakeOrdered artifact broadcast back — no token-keyed shuffle of the corpus join") {
    val plan = planOf(TextQueries.queries("d66_vocab_coverage")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-K must be TakeOrdered (distributed top-k), not a full sort:\n${plan.take(600)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the K-row vocabulary must broadcast back over the token stream:\n${plan.take(600)}")
  }

  test("q52: RFM thresholds broadcast back; customers are never globally sorted") {
    val plan = planOf(RelationalQueries.queries("q52_rfm_segments")(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"threshold attach must be broadcast, not cartesian:\n${plan.take(600)}")
    // the only Sorts allowed feed the three bounded-histogram windows
    // (distinct recency/frequency/bucket values), never the customer set
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the scalar thresholds must broadcast onto the per-customer frame:\n${plan.take(600)}")
  }

  test("v44: semdedup pairs come from a list-keyed equi-join — no all-pairs scan") {
    val plan = planOf(VectorQueries.queries("v44_semdedup")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair space must be bounded by the cluster equi-join:\n${plan.take(800)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"same-list pairing must be an equi-join on list_id:\n${plan.take(800)}")
  }

  test("q53: basket pairs come from the order-keyed equi self-join only") {
    val plan = planOf(RelationalQueries.queries("q53_basket_affinity")(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"pair space must be bounded by the basket equi-join:\n${plan.take(600)}")
    // the one BNLJ allowed is the scalar order-count attach
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"pairing must be an equi-join on l_orderkey:\n${plan.take(600)}")
  }

  test("m11: wav resample is joinless — pure per-partition decode") {
    val plan = planOf(MultimodalQueries.queries("m11_wav_resample")(spark, dir))
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"decode+decimate must not shuffle:\n${plan.take(500)}")
  }

  test("q54: percentile walk windows over the bounded histogram, never over lineitem rows") {
    val plan = planOf(RelationalQueries.queries("q54_ship_delay_percentiles")(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(500))
    // exactly one Window, and it must sit ABOVE the histogram aggregate
    // (aggregate-then-window = bounded input; window-then-aggregate
    // would walk raw join output)
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, plan.take(500))
    // the printed tree is top-down, so a HashAggregate BELOW the Window
    // (later in the string) is the histogram the walk consumes
    assert(plan.indexOf("HashAggregate", winIdx) >= 0,
      s"window must consume an aggregated histogram:\n${plan.take(800)}")
  }

  test("q55: percentile walk windows over the bounded value histogram") {
    val plan = planOf(RelationalQueries.queries("q55_value_percentiles")(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(500))
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("HashAggregate", winIdx) >= 0,
      s"window must consume an aggregated histogram:\n${plan.take(800)}")
  }

  test("q56: attribution is joinless — one user window over a pushed type filter") {
    val plan = planOf(RelationalQueries.queries("q56_attribution")(spark, dir))
    assert(!plan.contains("Join"),
      s"attribution must carry touches in a window, never join them:\n${plan.take(800)}")
    // the error tail is pruned at the scan, not post-read
    assert(plan.contains("PushedFilters") && plan.contains("In(event_type"),
      s"event_type IN filter must reach the parquet scan:\n${plan.take(800)}")
    assert(plan.indexOf("Window") >= 0, plan.take(500))
  }

  test("q57: both session windows share one user_id exchange; no join") {
    val plan = planOf(RelationalQueries.queries("q57_session_paths")(spark, dir))
    assert(!plan.contains("Join"), plan.take(800))
    // lag and the running session counter share partitioning AND
    // ordering — a second hashpartitioning(user_id) exchange means the
    // plan re-shuffled what it already had
    val userExchanges = "hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    assert(userExchanges <= 1,
      s"expected one user_id exchange serving both windows, got $userExchanges:\n${plan.take(1200)}")
  }

  test("d69: centroid assignment is a literal-expression argmin — one equi join only") {
    val plan = planOf(TextQueries.queries("d69_tfidf_cluster")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan.take(800))
    // the only join is docs ⋈ sparse-tf on doc_id (zero-token docs keep
    // their zero vector); centroids ride the plan as literals
    val joins = "Join".r.findAllIn(plan).length
    assert(joins <= 2,
      s"assignment must not join against a centroid table:\n${plan.take(1200)}")
  }

  test("d70: the only pair stage is the rare-token equi block join") {
    val plan = planOf(TextQueries.queries("d70_fuzzy_match")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"fuzzy matching must never go all-pairs:\n${plan.take(800)}")
  }

  test("q58: the observed-day restriction attaches broadcast; no cartesian") {
    val plan = planOf(RelationalQueries.queries("q58_stickiness")(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"the bounded day list must broadcast, not shuffle the contribs:\n${plan.take(1200)}")
  }

  test("q59: one user_id exchange builds the sequences; regex is map-side, no join") {
    val plan = planOf(RelationalQueries.queries("q59_pattern_cep")(spark, dir))
    assert(!plan.contains("Join"), plan.take(800))
    val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userExchanges <= 1,
      s"sequence build must shuffle once on user_id:\n${plan.take(1200)}")
  }

  test("no gate query plans a CartesianProduct") {
    // The one pairwise shape that cannot survive a scale-up. Broadcast
    // nested-loop joins against BOUNDED sides (query sets, scalar
    // aggregates, centroid tables) are legitimate and pinned per-query;
    // an unconstrained cartesian never is. TPC-H/TPC-DS corpus SQL is
    // excluded (generator-catalog setup dominates; covered by golden
    // runs and the bench).
    val all = RelationalQueries.queries ++ TextQueries.queries ++
      PipelineQueries.queries ++ VectorQueries.queries ++ MultimodalQueries.queries
    val offenders = all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan = q(spark, dir).queryExecution.sparkPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("no operator or query source collects results to the driver") {
    // driver-side collect() in an operator means the op isn't
    // distributed; enforce at the source level for the query/operator
    // packages (Verify/Bench/server materialize on purpose)
    val roots = Seq("src/main/scala/graft/queries", "src/main/scala/graft/operators",
      "src/main/scala/graft/functions")
    // IvfIndex.train / PqIndex.train / IvfPqIndex.trainResidual /
    // SqIndex.trainStats / CorpusLm.unigramModel / TextKmeans.model
    // collect the centroid/codebook/min-max/bounded-vocab/idf MODEL
    // artifacts (like the LSH hyperplanes), never result rows
    val exempt = Set("IvfIndex.scala", "PqIndex.scala", "IvfPqIndex.scala",
      "SqIndex.scala", "CorpusLm.scala", "TextKmeans.scala")
    val offenders = roots.flatMap { root =>
      val dirF = new java.io.File(root)
      if (!dirF.exists()) Nil
      else dirF.listFiles().filter(f => f.getName.endsWith(".scala") && !exempt(f.getName))
        .toSeq.flatMap { f =>
          val src = new String(java.nio.file.Files.readAllBytes(f.toPath))
          if (src.contains(".collect()")) Some(f.getName) else None
        }
    }
    assert(offenders.isEmpty, s"driver-side collect() in: ${offenders.mkString(", ")}")
  }
}
