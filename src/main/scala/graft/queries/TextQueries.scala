package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.{Dedup, Sampling}

/** Training-data text pipeline over the `documents` table: dedup
  * (exact / MinHash-LSH / SimHash / n-gram Jaccard), token counting,
  * quality scoring, language ID, fingerprinting.
  *
  * Oracle-checked where DuckDB can express the same computation; the
  * hash-based dedup ops (xxhash64 signatures) are rows-only checks.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Exact dedup groups: fingerprint → copies + keeper ---
    "d01_dedup_exact" -> { (s, dir) =>
      Dedup.exactGroups(Tables(s, dir).documents, "doc_id", "text")
    },

    // --- Docs surviving exact dedup ---
    "d02_dedup_keep" -> { (s, dir) =>
      Dedup.exactKeep(Tables(s, dir).documents, "doc_id", "text")
        .select(col("doc_id"), col("source"), col("n_chars"))
    },

    // --- Token counting (whitespace tokenizer) ---
    "d03_token_count" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"),
          length(col("text")).as("len"))
    },

    // --- Quality scoring: length/word-shape ratios ---
    "d04_quality" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      d.select(
        col("doc_id"),
        length(col("text")).as("len"),
        size(tokens(col("text"))).as("n_tokens"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(tokens(col("text")))).as("avg_word_len"),
        (size(array_distinct(tokens(col("text")))).cast("double") /
          size(tokens(col("text")))).as("ttr"))
    },

    // --- Language ID (marker-token heuristic) ---
    "d05_lang_guess" -> { (s, dir) =>
      Tables(s, dir).documents
        .withColumn("guess", langGuess(tokens(col("text"))))
        .groupBy(col("guess"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // --- Tokenizer fertility by language: chars per BPE-ish token per
    //     language bucket — the curation metric that flags languages a
    //     tokenizer serves badly (high chars/token → over-fragmented).
    //     Integer-exact: long char/token sums, ratio in permille by
    //     integral division. Pure two-level aggregation, map-side
    //     partials — one language-sized shuffle at any corpus scale. ---
    "d51_token_fertility" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(
          langGuess(tokens(col("text"))).as("guess"),
          length(col("text")).cast("long").as("chars"),
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .cast("long").as("bpe"))
        .groupBy(col("guess"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("chars")).as("sum_chars"),
          sum(col("bpe")).as("sum_bpe_tokens"))
        .withColumn("chars_per_token_permille",
          expr("(1000 * sum_chars) div sum_bpe_tokens"))
    },

    // --- Content fingerprint (md5 of normalized text) ---
    "d06_fingerprint" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), contentFingerprint(col("text")).as("fp"))
    },

    // --- Distinct 3-gram shingle count per doc ---
    "d07_shingle_count" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          size(distinctShingles(col("text"), 3)).as("n_shingles"))
    },

    // --- MinHash-LSH near-dup candidate pairs (oracle: banding/join/
    //     estimate recomputed by DuckDB from the dumped signature sketch) ---
    "d08_minhash_pairs" -> { (s, dir) =>
      Dedup.minhashCandidates(Tables(s, dir).documents, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    },

    // --- SimHash near-dup pairs (md5-portable 60-bit variant so the
    //     whole banded pipeline is oracle-checked; xxhash64 variant is
    //     covered by DedupSpec) ---
    "d09_simhash_pairs" -> { (s, dir) =>
      Dedup.simhashPairsMd5(Tables(s, dir).documents, "doc_id", "text", maxHamming = 10)
    },

    // --- Exact n-gram Jaccard pairs (oracle via unnest in DuckDB) ---
    "d10_jaccard_pairs" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables(s, dir).documents, "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), col("n_shared"))
    },

    // --- Full near-dup pipeline: LSH candidates verified by exact
    //     Jaccard (oracle: candidates from the dumped sketch, exact
    //     Jaccard recomputed from document shingles) ---
    "d13_neardup_verified" -> { (s, dir) =>
      Dedup.nearDupPairs(Tables(s, dir).documents, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 4,
        estThreshold = 0.5, jaccardThreshold = 0.7)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    },

    // --- Rolling (order-sensitive) Rabin-Karp fingerprint: polynomial
    //     fold acc*31+h over per-token xxhash64 values. Oracle re-folds
    //     the chain in DuckDB (HUGEINT mod 2^64) from the token-hash
    //     arrays graft.Verify dumps to __TAUX__. ---
    "d11_rolling_fp" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), rollingFingerprint(tokens(col("text"))).as("rfp"))
    },

    // --- BPE-ish token counting: letter runs / digit runs / single
    //     punctuation (the regex family both engines share) ---
    "d14_bpe_tokens" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .as("n_bpe_tokens"),
          size(tokens(col("text"))).as("n_ws_tokens"))
    },

    // --- Quality scoring: punctuation + stopword ratios ---
    "d15_quality_ratios" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val stopwords = Seq("the", "and", "of", "is", "a", "to", "in")
      val toks = tokens(col("text"))
      d.select(
        col("doc_id"),
        (size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).cast("double") /
          length(col("text"))).as("punct_ratio"),
        (size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double") /
          size(toks)).as("stopword_ratio"))
    },

    // --- Corpus stats per source after dedup ---
    "d12_source_stats" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Dedup.exactKeep(d, "doc_id", "text")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("first_doc"))
    },

    // --- Duplicate clusters: exact-Jaccard pairs → connected
    //     components (min-label propagation); cluster = min doc id ---
    "d16_dup_clusters" -> { (s, dir) =>
      val pairs = Dedup.ngramJaccardPairs(Tables(s, dir).documents, "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("cluster"))
    },

    // --- Docs surviving near-dup dedup: drop every cluster member
    //     except the canonical (min-id) keeper ---
    "d17_neardup_keep" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      val losers = Dedup.connectedComponents(pairs, "id_a", "id_b")
        .filter(col("cluster") =!= col("id"))
        .select(col("id").as("doc_id"))
      d.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"), col("n_chars"))
    },

    // --- Deterministic Bernoulli sample (hash-gated scan filter) ---
    "d18_sample_bernoulli" -> { (s, dir) =>
      Sampling.bernoulli(Tables(s, dir).documents, "doc_id", 0.2)
        .select(col("doc_id"), col("source"))
    },

    // --- Deterministic stratified sample: 20 lowest-hashed docs per
    //     source ---
    "d19_sample_stratified" -> { (s, dir) =>
      Sampling.stratifiedFixedN(Tables(s, dir).documents, "source", "doc_id", 20)
        .select(col("doc_id"), col("source"))
    },

    // --- Temperature-based source mixing: per-source targets ∝
    //     sqrt(n_source) (α=0.5), integer-exact allocation,
    //     hash-ordered selection ---
    "d33_source_mix" -> { (s, dir) =>
      Sampling.temperatureMix(Tables(s, dir).documents, "source", "doc_id", totalN = 60)
        .select(col("doc_id"), col("source"))
    },

    // --- Vocabulary by document frequency: top 100 tokens (ties
    //     broken by token so the limit boundary is deterministic) ---
    "d20_vocab_df" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(explode(array_distinct(tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("token"))
        .limit(100)
    },

    // --- Exact-substring span dedup: duplicated 10-token spans are cut
    //     everywhere but their globally-first occurrence ---
    "d29_span_dedup" -> { (s, dir) =>
      Dedup.spanDedupKeep(Tables(s, dir).documents, "doc_id", "text",
        spanTokens = 10)
    },

    // --- Heavy hitters (Misra-Gries): Spark's freqItems merges bounded
    //     per-partition summaries — no full-frequency shuffle at 100 TB.
    //     Contract oracle (q26/d25 pattern): the sketch guarantees NO
    //     FALSE NEGATIVES above the support threshold, so every exact-
    //     frequent token (recomputed by both engines) must check 'ok'. ---
    "d31_freq_items" -> { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(explode(tokens(col("text"))).as("token"))
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      val tot = toks.agg(count(lit(1)).as("tot"))
      val sketch = toks.stat.freqItems(Array("token"), 0.02)
      exact.crossJoin(tot)
        .filter(col("n") > col("tot") * 0.02)
        .crossJoin(sketch)
        .select(col("token"), col("n"),
          when(array_contains(col("token_freqItems"), col("token")), "ok")
            .otherwise("missing").as("sketch_check"))
    },

    // --- Salient terms (keyword extraction): per-doc top-5 terms
    //     ranked by tf desc / corpus df asc — "frequent here, rare
    //     globally", the integer-exact core of tf-idf (consumers apply
    //     any idf transform to the emitted df; transcendental scores
    //     would not hash-compare across engines). Scale shape: one
    //     (doc, term) partial-agg shuffle, a vocab-sized df agg joined
    //     back on the term key, per-doc top-k window. ---
    "d30_salient_terms" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val terms = Tables(s, dir).documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      terms.join(dfreq, Seq("term"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
    },

    // --- Token-budget selection: walk docs by (n_chars desc, doc_id)
    //     and keep until 5000 tokens are filled. Distributed prefix
    //     sum — range partitions + per-partition offsets, never the
    //     single-reducer global window (see BudgetSelect). ---
    "d34_budget_select" -> { (s, dir) =>
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
      graft.operators.BudgetSelect.takeUntilBudget(
          d, "n_tokens", Seq(col("n_chars").desc, col("doc_id").asc),
          budget = 5000L, numParts = 8)
        .select(col("doc_id"), col("n_tokens"), col("cum_before"))
    },

    // --- Deterministic corpus shuffle + sharding: md5-seeded shard in
    //     [0,8) and position within shard — the reproducible global
    //     shuffle that precedes tokenization/packing ---
    "d35_shuffle_shard" -> { (s, dir) =>
      Sampling.shuffleShard(Tables(s, dir).documents, "doc_id",
          numShards = 8, seed = "s42")
        .select(col("doc_id"), col("shard"), col("pos"))
    },

    // --- DSIR importance-weighted selection (Xie et al. 2023): rank
    //     docs by hashed-n-gram likelihood ratio of the en slice
    //     (target) vs the whole corpus (raw), keep the top 50.
    //     Micro-unit log quantization makes the ranking integer-exact
    //     across engines. ---
    "d36_dsir_select" -> { (s, dir) =>
      graft.operators.CorpusLm.importanceWeights(
        Tables(s, dir).documents, "doc_id", "text",
        isTarget = col("lang") === "en", nBuckets = 64, n = 50)
    },

    // --- Corpus-unigram LM scoring + quality gate (CCNet-style
    //     perplexity filtering with the corpus' own unigram model):
    //     keep docs whose mean token log-prob clears the floor. ---
    "d37_unigram_lm" -> { (s, dir) =>
      graft.operators.CorpusLm.unigramLogProb(
          Tables(s, dir).documents, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("sum_lp_micro"), col("keep"))
    },

    // --- CCNet perplexity BUCKETS: head/middle/tail thirds by mean
    //     unigram log-prob — the coarse quality stratification before
    //     sampling/mixing. Integer milli-nat ranking key with a
    //     bounded-histogram threshold walk (the d50 pattern; no
    //     per-doc global rank window). ---
    "d52_ppl_buckets" -> { (s, dir) =>
      graft.operators.CorpusLm.perplexityBuckets(
        Tables(s, dir).documents, "doc_id", "text")
    },

    // --- Cross-source 5-gram contamination matrix: distinct shared
    //     grams per source pair + per-source totals — "how much of
    //     source B is already in source A" before mixing. ---
    "d38_source_overlap" -> { (s, dir) =>
      graft.operators.Decontaminate.sourceOverlap(
        Tables(s, dir).documents, "source", "text", n = 5)
    },

    // --- Per-source token-distribution DRIFT: KL(source ‖ corpus)
    //     over unigram distributions in integer micro-nats — the
    //     mixture-monitoring statistic (a feed gone wrong shows as a
    //     KL spike). One (source, token) shuffle; totals broadcast. ---
    "d53_source_drift" -> { (s, dir) =>
      graft.operators.CorpusLm.sourceDriftKl(
        Tables(s, dir).documents, "source", "text")
    },

    // --- Leakage-safe train/test split: every exact-dup group lands
    //     on ONE side (a per-row split leaks duplicated test text into
    //     training); assignment is a seeded 16-bit hash of the content
    //     fingerprint — map-side only, no join, no shuffle. ---
    "d54_leakage_split" -> { (s, dir) =>
      graft.operators.Sampling.leakageSafeSplit(
        Tables(s, dir).documents, "text", testPermille = 100, seed = "r12")
        .select(col("doc_id"), col("fp"), col("split"))
    },

    // --- Cross-document duplicate-gram diagnostic: how much of each
    //     doc's distinct 3-gram set appears in OTHER docs — the
    //     corpus-duplication measure a dedup pass is judged by.
    //     Exact counts; one gram-df shuffle. ---
    "d55_dup_gram_stats" -> { (s, dir) =>
      graft.operators.Dedup.dupGramStats(Tables(s, dir).documents, "doc_id", "text")
    },

    // --- BM25 ranked retrieval: top-20 docs for a 3-term query,
    //     integer-exact scoring (micro-nat idf, floor-quantized
    //     per-term scores). ---
    "d39_bm25_topk" -> { (s, dir) =>
      graft.operators.Bm25.topK(Tables(s, dir).documents, "doc_id", "text",
        queryTerms = Seq("spark", "merge", "join"), n = 20)
    },

    // --- Unicode NFC normalization (native kernel): composed (é) and
    //     decomposed (e + U+0301) spellings of the same text must
    //     yield identical dedup keys after normalization. The fixture
    //     text is ASCII, so both variants are synthesized per doc;
    //     lengths, equality bits and the post-NFC md5 are all
    //     recomputed by DuckDB's nfc_normalize. ---
    "d40_nfc_normalize" -> { (s, dir) =>
      val composed = concat(col("text"), lit(" caf\u00e9"))
      val decomposed = concat(col("text"), lit(" caf\u0065\u0301"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        length(decomposed).as("len_raw"),
        length(nfcNormalize(decomposed)).as("len_nfc"),
        (composed === decomposed).as("raw_eq"),
        (nfcNormalize(composed) === nfcNormalize(decomposed)).as("canonical_eq"),
        md5(nfcNormalize(decomposed).cast("binary")).as("fp_nfc"))
    },

    // --- Sliding-window chunking (RAG/embedding ingestion): 32-token
    //     windows advancing by 24 (8-token overlap), final window
    //     shortened — pure map-side, one explode, no shuffle. ---
    "d41_chunk_overlap" -> { (s, dir) =>
      graft.operators.Packing.chunkWithOverlap(
          Tables(s, dir).documents, "doc_id", "text",
          chunkTokens = 32, stride = 24)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
          col("n_chunk_tokens"), md5(col("chunk").cast("binary")).as("md5_chunk"))
    },

    // --- Online near-dup gate, batch twin: band collisions of probe
    //     docs (doc_id % 10 == 0) against the rest of the corpus'
    //     prebuilt MinHash band index — the build-once/probe-many
    //     text-dedup analog of the persisted ANN index. ---
    "d48_neardup_gate" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val idx = graft.operators.Dedup.bandIndexOf(
        d.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      graft.operators.Dedup.bandCollisions(
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", idx)
    },

    // --- Hybrid retrieval: BM25 lexical top-20 fused with the exact
    //     embedding-cosine top-20 of query vector 0 via reciprocal-
    //     rank fusion — integer micro-point contributions
    //     (1000000 div (60+rnk)), so fused scores, tie-breaks and the
    //     final cut reproduce bit-for-bit in DuckDB. The rank windows
    //     run over ALREADY-bounded top-k lists (20 rows), never the
    //     corpus. ---
    "d49_hybrid_rrf" -> { (s, dir) =>
      val t = Tables(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score_micro").desc, col("doc_id").asc)
      val lexical = graft.operators.Bm25.topK(t.documents, "doc_id", "text",
          queryTerms = Seq("spark", "merge", "join"), n = 20)
        .withColumn("rnk", row_number().over(w))
        .select(col("doc_id"), col("rnk"))
      val knn = graft.operators.SimilaritySearch.bruteForceTopK(
          t.embeddings, t.embeddings.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rnk"))
      graft.operators.HybridRetrieval.rrf(Seq(lexical, knn), "doc_id", "rnk",
        k0 = 60, n = 10)
    },

    // --- EXACT rank-based length-quantile gate: keep docs at or above
    //     the corpus p90 length, threshold from a length HISTOGRAM
    //     (bounded by max doc length, not corpus size) with pure
    //     integer rank arithmetic — no approx_percentile, so the kept
    //     set is oracle-checkable and run-to-run stable. ---
    "d50_quantile_gate" -> { (s, dir) =>
      graft.operators.QualityFilters.lengthQuantileKeep(
        Tables(s, dir).documents, "doc_id", "text", permille = 900)
    },

    // --- n-gram containment pairs: quote/subset detection — pairs
    //     whose max-side containment (shared / min set size) is
    //     >= 0.8, the asymmetric relation Jaccard misses when a short
    //     doc rides inside a long one. Integer-exact gate. ---
    "d47_containment_pairs" -> { (s, dir) =>
      graft.operators.Dedup.ngramContainmentPairs(
        Tables(s, dir).documents, "doc_id", "text",
        shingleSize = 3, minContainmentPermille = 800)
    },

    // --- Bigram LM quality gate: per-doc mean adjacent-pair log-prob
    //     under the corpus' own MLE bigram model (order-sensitive,
    //     unlike d37's unigram gate), integer micro-nat exact. ---
    "d44_bigram_lm_gate" -> { (s, dir) =>
      graft.operators.CorpusLm.bigramLogProb(
        Tables(s, dir).documents, "doc_id", "text")
    },

    // --- Stratified sample via map-side top-k aggregation: the
    //     skew-safe twin of d19 (same (hash, id) selection order, no
    //     per-stratum window shuffle). ---
    "d45_stratified_topk_agg" -> { (s, dir) =>
      Sampling.stratifiedFixedNAgg(Tables(s, dir).documents, "source", "doc_id", 20)
        .select(col("doc_id"), col("source"))
    },

    // --- Winnowing fingerprint selection (Schleimer et al. 2003):
    //     window-min k-gram fingerprints, rightmost-on-ties — the
    //     guaranteed-detection local fingerprinting that carries
    //     ~2/(w+1) of the gram volume into dedup joins. ---
    "d42_winnow_fp" -> { (s, dir) =>
      graft.operators.Dedup.winnowFingerprints(
        Tables(s, dir).documents, "doc_id", "text", k = 3, window = 4)
    },

    // --- Winnowing-based near-dup candidates: pairs sharing >= 3
    //     distinct winnowed fingerprints — the join carries ~2/(w+1)
    //     of the gram volume, position-independent. ---
    "d43_winnow_pairs" -> { (s, dir) =>
      graft.operators.Dedup.winnowCandidatePairs(
        Tables(s, dir).documents, "doc_id", "text",
        k = 3, window = 4, minShared = 3)
    },

    // --- Per-doc Shannon entropy of the token distribution, in
    //     integer micro-nats (H = ln n − Σ c·ln c / n): the
    //     quality signal TTR misses — a doc repeating two tokens
    //     50/50 has TTR ≈ 0 AND entropy ≈ ln 2, while "aaa…ab" has
    //     the same TTR but near-zero entropy. Pure map-side fold;
    //     the Σ c·ln c term is integer-quantized per distinct token
    //     (the d37/d52 exactness recipe), so the cross-engine sum is
    //     associative and the final double division deterministic.
    //     One hash-counting kernel pass keeps it O(n) per doc
    //     (entropyTermsMicro — the sum is over distinct tokens, so
    //     counting order cannot change it; TextKernelSpec pins the
    //     kernel to the sorted run-count fold bit-for-bit). ---
    "d56_token_entropy" -> { (s, dir) =>
      val t = tokens(col("text"))
      Tables(s, dir).documents
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
          graft.functions.TextFunctions.entropyTermsMicro(col("t"))
            .as("sum_clnc_micro"))
        .select(col("doc_id"), col("n_tokens"), col("sum_clnc_micro"),
          (floor(log(col("n_tokens").cast("double")) * 1000000).cast("long")
              .cast("double") -
            col("sum_clnc_micro").cast("double") /
              col("n_tokens").cast("double")).as("entropy_micro"))
    },

    // --- Zipf slope per source: least-squares slope of ln(freq) vs
    //     ln(rank) over the source's token frequency table (healthy
    //     natural text sits near −1; machine-generated or templated
    //     sources drift off). Integer milli-log terms make the five
    //     regression sums associative and cross-engine exact; the
    //     slope is one double expression over them. One (source,
    //     token) shuffle — the table is vocabulary-sized, so the
    //     per-source rank window is bounded regardless of corpus
    //     size. ---
    "d57_zipf_slope" -> { (s, dir) =>
      graft.operators.CorpusLm.zipfSlope(Tables(s, dir).documents, "source", "text")
    },

    // --- Vocabulary coverage curve: per source, the smallest
    //     vocabulary (ranked by frequency) covering ≥90% of token
    //     occurrences — the tokenizer-budget signal (a source whose
    //     90%-vocab is tiny is templated; one whose curve is flat
    //     needs more merges). Pure integers: the 90% test is
    //     cum·10 ≥ total·9, no division enters the contract; the
    //     cumulative window runs over the vocabulary-sized frequency
    //     table, bounded regardless of corpus size. ---
    "d58_vocab_coverage" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables(s, dir).documents
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
      val base = Window.partitionBy(col("source"))
        .orderBy(col("cnt").desc, col("tok").asc)
      val cum = tf
        .withColumn("rank", row_number().over(base))
        .withColumn("cum", sum(col("cnt")).over(
          base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = tf.groupBy(col("source"))
        .agg(sum(col("cnt")).as("total_tokens"), count(lit(1)).as("n_terms"))
      cum.join(tot, "source")
        .filter(col("cum") * 10 >= col("total_tokens") * 9)
        .groupBy(col("source"))
        .agg(min(col("rank")).as("vocab_90"),
          min(col("n_terms")).as("n_terms"),
          min(col("total_tokens")).as("total_tokens"))
    },

    // --- Corpus novelty: fraction of each document's distinct 3-grams
    //     whose first corpus occurrence (min doc_id) is this document —
    //     the marginal-contribution ranking for ingest ordering (a
    //     shard of 95% previously-seen n-grams is boilerplate no matter
    //     its exact-dup rate). One vocabulary-bounded gram shuffle, no
    //     pairwise stage. ---
    "d59_ngram_novelty" -> { (s, dir) =>
      graft.operators.Dedup.gramNovelty(Tables(s, dir).documents, "doc_id", "text")
    },

    // --- Cross-source contamination matrix: d08's banded near-dup
    //     pairs rolled up to (source, source) counts — the
    //     provenance-level duplication report that decides which feed
    //     to drop or down-weight when two crawls overlap. The rollup
    //     adds two broadcast-sized joins (doc_id → source) and a
    //     |sources|²-key aggregate on top of the capped banding chain;
    //     the pair symmetry is canonicalized with least/greatest so
    //     (A,B) and (B,A) land in one cell. ---
    "d60_source_neardup_matrix" -> { (s, dir) =>
      val docs = Tables(s, dir).documents
      val pairs = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.toDF("id_a", "source_a"), "id_a")
        .join(src.toDF("id_b", "source_b"), "id_b")
        .select(least(col("source_a"), col("source_b")).as("src_lo"),
          greatest(col("source_a"), col("source_b")).as("src_hi"))
        .groupBy(col("src_lo"), col("src_hi"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // --- Mergeable distinct-count sketches: per-shard DataSketches HLL
    //     built independently (shard = doc_id % 4 stands in for "one
    //     sketch per 100 TB partition"), union-merged at the
    //     coordinator, estimate checked against the exact count — the
    //     q26 bound-contract extended to MERGEABILITY, the property
    //     that makes sketch maintenance O(shards) instead of a global
    //     re-scan. ---
    "d61_hll_shard_union" -> { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val sketches = toks
        .groupBy((col("doc_id") % 4).as("shard"))
        .agg(expr("hll_sketch_agg(tok)").as("sk"))
      val merged = sketches.agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
        count(lit(1)).as("n_shards"))
      val exact = toks.agg(count_distinct(col("tok")).as("exact_nd"))
      merged.crossJoin(exact)
        .select(col("n_shards"), col("exact_nd"),
          when(abs(col("est") - col("exact_nd")) <= col("exact_nd") * 0.05, "ok")
            .otherwise("off").as("union_check"))
    },

    // --- Bursty terms (Church–Gale burstiness): terms whose collection
    //     frequency far exceeds their document frequency — they repeat
    //     heavily inside few documents (topical/templated content
    //     words) rather than spreading evenly (function words). The
    //     importance-weighting diagnostic DSIR-style selection reads
    //     before trusting raw frequency. Integer gate 2·cf ≥ 3·df
    //     (burstiness ≥ 1.5, the upper tail of this corpus) with a
    //     df ≥ 5 noise floor; one term-keyed shuffle, vocabulary-
    //     bounded output. ---
    "d62_bursty_terms" -> { (s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(count_distinct(col("doc_id")).as("df"), count(lit(1)).as("cf"))
        .filter(col("cf") * 2 >= col("df") * 3 && col("df") >= 5)
    },

    // --- Mixed-language detection: the doc-LEVEL language guess (d05)
    //     is blind to code-switched and concatenated-crawl documents,
    //     so each doc is re-judged in 20-token chunks and the chunk
    //     votes are rolled up — distinct non-und languages, the
    //     majority language's permille share, and a mixed flag. Pure
    //     map-side chunking + two bounded aggregates keyed by doc. ---
    "d63_mixed_language" -> { (s, dir) =>
      val chunks = Tables(s, dir).documents
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"), explode(
          transform(
            sequence(lit(0), greatest(lit(0),
              ((size(col("t")) + 19) / 20).cast("int") - 1)),
            i => slice(col("t"), i * 20 + 1, lit(20)))).as("ctoks"))
        .select(col("doc_id"), langGuess(col("ctoks")).as("guess"))
      val perLang = chunks.groupBy(col("doc_id"), col("guess"))
        .agg(count(lit(1)).as("cnt"))
      perLang.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_chunks"),
          count(when(col("guess") =!= "und", lit(1))).as("n_langs"),
          coalesce(max(when(col("guess") =!= "und", col("cnt"))), lit(0L))
            .as("maj_cnt"))
        .select(col("doc_id"), col("n_chunks"), col("n_langs"),
          expr("maj_cnt * 1000 div n_chunks").as("majority_permille"),
          (col("n_langs") >= 2).as("is_mixed"))
    },

    // --- EXACT Jaccard-threshold join via prefix filtering (AllPairs/
    //     PPJoin): unlike d10's df-capped posting lists (recall traded
    //     on boilerplate), every pair with token-set J ≥ 0.6 is
    //     guaranteed found — docs keep only the |d|−ceil(0.95|d|)+1
    //     rarest tokens (global (df, token) order), a J ≥ t pair MUST
    //     collide inside those prefixes, and survivors verify on the
    //     full bounded token arrays in integer math. 0.95 is the
    //     near-copy threshold; this fixture's small synthetic vocab
    //     makes everything overlap somewhat, so lower thresholds match
    //     half the corpus against itself. ---
    "d64_prefix_jaccard" -> { (s, dir) =>
      Dedup.prefixJaccardPairs(Tables(s, dir).documents, "doc_id", "text",
        thresholdPct = 95)
    },

    // --- Quality-aware near-dup keeping: d17 keeps each cluster's
    //     LOWEST id; real pipelines keep the BEST copy — here the
    //     longest (max n_chars, tie → min id). Same clusters as
    //     d16/d17; one cluster-keyed min(struct) picks keepers, one
    //     anti join drops the rest. ---
    "d65_neardup_keep_best" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      Dedup.keepBestPerCluster(d, comp, "doc_id", "n_chars")
        .select(col("doc_id"), col("source"), col("n_chars"))
    },

    // --- Per-source vocabulary coverage: what fraction of each
    //     source's token OCCURRENCES the global top-K vocabulary
    //     covers — the tokenizer-budget diagnostic (a source whose
    //     coverage is low will fragment into subwords / UNKs). The
    //     global term-frequency table is vocabulary-bounded and the
    //     top-K (deterministic (count DESC, token) tie-break) joins
    //     back BROADCAST, so the per-source pass is one map-side
    //     conditional aggregate over the token stream — no token-keyed
    //     shuffle ever carries the corpus. Integer permille. ---
    // --- Asymmetric shingle containment (|A∩B| / |A| ≥ 60%): the
    //     quote / sub-document duplication detector symmetric Jaccard
    //     misses — both directions derived from ONE df-bounded
    //     posting-list intersection pass, integer percent. ---
    "d67_containment_pairs" -> { (s, dir) =>
      Dedup.containmentPairs(Tables(s, dir).documents, "doc_id", "text",
        shingleSize = 3, thresholdPct = 60)
    },

    "d66_vocab_coverage" -> { (s, dir) =>
      val toks = Tables(s, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val topk = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
        .select(col("tok"), lit(1L).as("is_top"))
      toks.join(broadcast(topk), Seq("tok"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("is_top"), lit(0L))).as("n_covered"))
        .select(col("source"), col("n_tokens"), col("n_covered"),
          expr("n_covered * 1000 div n_tokens").as("covered_permille"))
    },

    // --- Soft dedup: keep each doc with probability 1/|its NEAR-dup
    //     cluster| — the down-weighting alternative to d17's hard
    //     keeper (expected ONE survivor per cluster, but repeated
    //     content keeps a proportional, randomized presence instead of
    //     always the min-id copy). Clusters are d16's connected
    //     components over the df-capped Jaccard pairs; docs outside
    //     any pair have size 1 and always survive. The coin is the
    //     seeded md5-uniform (the k-means|| trick) as EXACT integer
    //     math — keep iff h32 · size < 2³² — so no float probability
    //     crosses engines. Cluster sizes join back equi-keyed;
    //     the coin is map-side; nothing materializes on the driver. ---
    "d68_soft_dedup_sample" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text",
        shingleSize = 3, threshold = 0.5)
      val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val sizes = clusters.groupBy(col("cluster")).agg(count(lit(1)).as("cs"))
      d.select(col("doc_id"))
        .join(clusters.select(col("id").as("doc_id"), col("cluster")),
          Seq("doc_id"), "left")
        .join(sizes, Seq("cluster"), "left")
        .select(col("doc_id"), coalesce(col("cs"), lit(1L)).as("cluster_size"))
        .withColumn("h32", conv(substring(md5(concat(lit("soft-"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"))
        .filter(col("h32") * col("cluster_size") < lit(4294967296L))
        .select(col("doc_id"), col("cluster_size"))
    },

    // --- Fuzzy entity matching (record linkage): part-name pairs
    //     within Levenshtein distance 2, candidates BLOCKED on a
    //     shared rare token (df ≤ 25 — the d10 df-cap pattern), so
    //     the pair space is Σ df² over rare tokens, never |parts|²,
    //     and the edit distance (the expensive scalar) runs once per
    //     DISTINCT candidate pair after the block join. Both engines
    //     compute the identical classic Levenshtein on ASCII names.
    "d70_fuzzy_match" -> { (s, dir) =>
      fuzzyMatches(s, dir)
    },

    // --- Entity canonicalization on top of d70: connected components
    //     over the fuzzy matches (d16's iterative small-pairs CC, the
    //     min-key canonical), merged entities with member counts —
    //     the resolve step of entity resolution. CC iterates over the
    //     MATCH EDGES only (bounded by d70's blocked pair space), not
    //     the part table. ---
    "d71_entity_groups" -> { (s, dir) =>
      Dedup.connectedComponents(fuzzyMatches(s, dir), "key_a", "key_b")
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"))
        .select(col("cluster").as("entity_key"), col("n_members"))
    },

    // --- Topic-style corpus clustering (TextKmeans): hashed tf-idf
    //     document vectors (md5-bucket hashing trick, fixed 32-dim
    //     feature space) + Lloyd k-means — the clustering stage behind
    //     cluster-level filtering / domain discovery. Training
    //     collects only the dim-sized idf and k×dim centroids (index
    //     artifacts); assignment is a map-side argmin against
    //     broadcast-literal centroids. The oracle re-derives every
    //     assignment from the DUMPED (idf, centroids) parquet — the
    //     identical doubles — so no training float is recomputed
    //     cross-engine; distances fold in ascending dimension order
    //     seeded 0.0, ties to the smaller cluster id, micro-floored.
    "d69_tfidf_cluster" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val m = graft.operators.TextKmeans.model(d, "doc_id", "text", dir)
      graft.operators.TextKmeans.assign(d, "doc_id", "text", m)
    }
  )

  // Blocked fuzzy part-name matches shared by d70/d71: rare-token
  // block join (df ≤ 25) → distinct candidate pairs → Levenshtein ≤ 2.
  private def fuzzyMatches(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.operators.FuzzyMatch.pairs(
      Tables(s, dir).part.select(col("p_partkey"), col("p_name")),
      "p_partkey", "p_name", dfCap = 25, maxDist = 2)

  // Shared CTE chain for d70/d71: rare-token-blocked fuzzy part-name
  // candidates ending in `cand(key_a, key_b, na, nb)`.
  private val fuzzyMatchCtes =
    """t AS (SELECT p_partkey, p_name,
              unnest(string_split(p_name, ' ')) AS tok FROM part),
       dfc AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
       r AS (SELECT t.p_partkey, t.p_name, t.tok
             FROM t JOIN dfc USING (tok) WHERE dfc.c <= 25),
       cand AS (
         SELECT DISTINCT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS na, b.p_name AS nb
         FROM r a JOIN r b ON a.tok = b.tok AND a.p_partkey < b.p_partkey)"""

  // Shared SQL fragment: DuckDB whitespace tokens of trimmed text.
  private val duckToks = "regexp_split_to_array(trim(text), ' +')"

  // Shared CTE chain: the corpus-unigram model and per-doc aggregate
  // (token counts → micro-nat log-probs → per-doc n_tokens +
  // sum_lp_micro) — the scoring half of d37's gate and d52's buckets.
  private lazy val unigramAggCte =
    s"""t AS (SELECT doc_id, $duckToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
          freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
          tot AS (SELECT sum(cnt) AS n FROM freq),
          lp AS (
            SELECT token,
              CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp_micro
            FROM freq, tot),
          pd AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
          agg AS (
            SELECT doc_id,
              CAST(sum(c) AS BIGINT) AS n_tokens,
              CAST(sum(c * lp_micro) AS BIGINT) AS sum_lp_micro
            FROM pd JOIN lp USING (token) GROUP BY 1)"""

  // DuckDB expression parsing the first `nChars` hex chars of md5
  // string `m` into a BIGINT (mirrors Spark's conv(substring(md5,1,n),
  // 16, 10)). Generated char-by-char: DuckDB has no conv().
  private def duckHexPrefix(m: String, nChars: Int): String =
    (0 until nChars).map { i =>
      val c = s"ascii(substr($m, ${i + 1}, 1))"
      s"CAST(CASE WHEN $c >= 97 THEN $c - 87 ELSE $c - 48 END AS BIGINT) * ${1L << ((nChars - 1 - i) * 4)}"
    }.mkString("(", " + ", ")")

  // Shared CTE chain mirroring Dedup.ngramJaccardPairs (df-capped
  // 3-gram shingle join, threshold 0.5) ending in `pairs(id_a, id_b)`.
  private val jaccardPairsCtes =
    s"""sh AS (
          SELECT doc_id, list_distinct(
            CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                 ELSE list_transform(
                   generate_series(1, len($duckToks) - 2),
                   i -> array_to_string($duckToks[i:i+2], ' ')) END) AS s
          FROM documents),
        ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 100),
        exr AS (SELECT ex.doc_id, ex.g FROM ex JOIN rare USING (g)),
        shared AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          FROM exr a JOIN exr b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM shared
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
          WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.5),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        cc(id, comp) AS (
          SELECT DISTINCT a, a FROM sym
          UNION
          SELECT s.b, c.comp FROM cc c JOIN sym s ON c.id = s.a),
        clusters AS (SELECT id, min(comp) AS cluster FROM cc GROUP BY id)"""

  // Uniform [0, 65536) from the first 4 hex digits of md5(doc_id) —
  // mirrors Sampling.hashBucket16.
  private val duckHash16 = {
    val h = "md5(CAST(doc_id AS VARCHAR))"
    def digit(i: Int) =
      s"(CASE WHEN ascii(substr($h, $i, 1)) >= 97 THEN ascii(substr($h, $i, 1)) - 87 ELSE ascii(substr($h, $i, 1)) - 48 END)"
    s"(${digit(1)} * 4096 + ${digit(2)} * 256 + ${digit(3)} * 16 + ${digit(4)})"
  }

  // MinHash-LSH candidate pairs recomputed from the dumped signature
  // sketch (graft.Verify writes doc_id→64-long signature to __TAUX__;
  // the xxhash64 family itself has no DuckDB equivalent, but banding,
  // the pair join, and the agreement estimate are all re-derived).
  // Band collision is raw slice equality — the SAME equivalence the
  // Spark side keys by (its xxhash64 band key is just a compaction of
  // the slice). 16 bands × 4 rows, est = agreeing positions / 64.
  // BM25 per-(doc, term) micro-nat partial scores (`sc`) for the
  // 3-term query — shared by d39 (ranked list) and d49 (RRF fusion);
  // every double op in the same association order as Bm25.topK.
  private val bm25SqlCte =
    s"""t AS (SELECT doc_id, $duckToks AS toks FROM documents),
        lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM t),
        g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(len) AS BIGINT) AS sumlen FROM lens),
        tf AS (
          SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(toks) AS token FROM t)
          WHERE token IN ('spark', 'merge', 'join')
          GROUP BY 1, 2),
        dfq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        sc AS (
          SELECT tf.doc_id,
            CAST(floor(
              CAST(CAST(floor(ln((CAST(g.n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT) AS DOUBLE)
              * ((CAST(tf AS DOUBLE) * (1.2 + 1.0))
                 / (CAST(tf AS DOUBLE)
                    + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(len AS DOUBLE)
                      / (CAST(sumlen AS DOUBLE) / CAST(n AS DOUBLE))))))) AS BIGINT) AS ts
          FROM tf JOIN dfq USING (token) JOIN lens USING (doc_id), g)"""

  // Band-bucket cap mirrored from Dedup.minhashCandidates (maxBandDf
  // default 1000; df >= 2 only drops pairless singleton buckets).
  private val minhashCandSql =
    """sig AS (SELECT doc_id, sig FROM '__TAUX__/minhash_sigs.parquet/*.parquet'),
       banded0 AS (
         SELECT doc_id, sig, bs.b AS band,
                array_to_string(sig[bs.b*4+1 : bs.b*4+4], ',') AS key
         FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) bs),
       keepb AS (
         SELECT band, key FROM banded0 GROUP BY 1, 2
         HAVING count(*) >= 2 AND count(*) <= 1000),
       banded AS (SELECT banded0.* FROM banded0 JOIN keepb USING (band, key)),
       cand AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sa, b.sig AS sb
         FROM banded a JOIN banded b
           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       est AS (
         SELECT id_a, id_b,
                CAST(len(list_filter(generate_series(1, 64), i -> sa[i] = sb[i])) AS DOUBLE) / 64 AS est_jaccard
         FROM cand)"""

  val oracles: Map[String, String] = Map(
    // Mirror of Dedup.spanDedupKeep: chunk into non-overlapping
    // 10-token spans, first occurrence (by doc_id, idx) of each span
    // text wins, reassemble kept spans in order plus the remainder
    // tokens.
    "d29_span_dedup" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
          ch AS (
            SELECT doc_id, i AS idx,
              array_to_string(t[(i*10+1):(i*10+10)], ' ') AS span
            FROM toks, LATERAL (
              SELECT unnest(generate_series(0, CAST(len(t)//10 AS INT)-1)) AS i) gs),
          kept AS (
            SELECT doc_id, idx, span FROM (
              SELECT doc_id, idx, span,
                row_number() OVER (PARTITION BY span ORDER BY doc_id, idx) AS r
              FROM ch)
            WHERE r = 1),
          agg AS (
            SELECT doc_id,
              array_to_string(list(span ORDER BY idx), ' ') AS kept_text,
              count(*) AS n_kept
            FROM kept GROUP BY doc_id),
          base AS (
            SELECT doc_id, CAST(len(t)//10 AS INT) AS n_chunks,
              array_to_string(t[(CAST(len(t)//10 AS INT)*10+1):], ' ') AS tail
            FROM toks)
          SELECT b.doc_id,
            concat_ws(' ', nullif(a.kept_text, ''), nullif(b.tail, '')) AS clean_text,
            b.n_chunks AS n_spans,
            CAST(b.n_chunks - coalesce(a.n_kept, 0) AS INT) AS n_dropped
          FROM base b LEFT JOIN agg a USING (doc_id)""",
    // Contract mirror of d31: exact frequent set over the same strict
    // threshold; 'ok' is the certified no-false-negative guarantee.
    "d31_freq_items" ->
      s"""WITH ex AS (SELECT unnest($duckToks) AS token FROM documents),
          tot AS (SELECT count(*) AS tot FROM ex)
          SELECT token, count(*) AS n, 'ok' AS sketch_check
          FROM ex, tot GROUP BY token, tot.tot
          HAVING count(*) > tot.tot * 0.02""",
    // Mirror of d30: tf per (doc, term), df per term over the tf set,
    // rank by (tf desc, df asc, term asc).
    "d30_salient_terms" ->
      s"""WITH ex AS (SELECT doc_id, unnest($duckToks) AS term FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY 1, 2),
          dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
          r AS (
            SELECT doc_id, term, tf, df,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY tf DESC, df ASC, term ASC) AS rnk
            FROM tf JOIN dfreq USING (term))
          SELECT doc_id, term, tf, df, CAST(rnk AS INT) AS rnk
          FROM r WHERE rnk <= 5""",
    "d08_minhash_pairs" ->
      s"""WITH $minhashCandSql
          SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5""",
    // Mirror of d48: band collisions of probe docs against the rest of
    // the corpus' distinct band index, from the same dumped signatures
    // (band equivalence by raw slice — the Spark key is its xxhash64
    // compaction, same equivalence classes).
    "d48_neardup_gate" ->
      """WITH sig AS (SELECT doc_id, sig FROM '__TAUX__/minhash_sigs.parquet/*.parquet'),
         banded AS (
           SELECT doc_id, bs.b AS band,
                  array_to_string(sig[bs.b*4+1 : bs.b*4+4], ',') AS key
           FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) bs),
         idx0 AS (SELECT band, key, doc_id AS corpus_id
                  FROM banded WHERE doc_id % 10 <> 0 GROUP BY 1, 2, 3),
         keepi AS (SELECT band, key FROM idx0 GROUP BY 1, 2
                   HAVING count(*) <= 1000),
         idx AS (SELECT idx0.* FROM idx0 JOIN keepi USING (band, key)),
         pr AS (SELECT doc_id AS id, band, key
                FROM banded WHERE doc_id % 10 = 0)
         SELECT id, corpus_id, CAST(count(*) AS BIGINT) AS n_bands
         FROM pr JOIN idx USING (band, key) GROUP BY 1, 2""",
    "d13_neardup_verified" ->
      s"""WITH $minhashCandSql,
          sh AS (
            SELECT doc_id, list_distinct(
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END) AS s
            FROM documents)
          SELECT e.id_a, e.id_b,
                 CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                   / len(list_distinct(sa.s || sb.s)) AS jaccard
          FROM est e
          JOIN sh sa ON e.id_a = sa.doc_id
          JOIN sh sb ON e.id_b = sb.doc_id
          WHERE e.est_jaccard >= 0.5
            AND CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                  / len(list_distinct(sa.s || sb.s)) >= 0.7""",
    // Re-fold the Rabin-Karp chain from the dumped per-token xxhash64
    // arrays: DuckDB does the mod-2^64 polynomial in HUGEINT, then maps
    // back to the signed BIGINT Spark's wrapping Long arithmetic yields.
    "d11_rolling_fp" ->
      """SELECT doc_id,
         CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                   THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS rfp
         FROM (
           SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS HUGEINT),
                 list_transform(hashes, h ->
                   (CAST(h AS HUGEINT) + 18446744073709551616::HUGEINT)
                     % 18446744073709551616::HUGEINT)),
               (acc, h) -> (acc*31 + h) % 18446744073709551616::HUGEINT) AS u
           FROM '__TAUX__/token_hashes.parquet/*.parquet')""",
    "d01_dedup_exact" ->
      s"""SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
          count(*) AS n_copies, min(doc_id) AS keeper
          FROM documents GROUP BY 1""",
    "d02_dedup_keep" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE doc_id IN (
           SELECT min(doc_id) FROM documents
           GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))""",
    "d03_token_count" ->
      s"""SELECT doc_id, CAST(len($duckToks) AS INT) AS n_tokens,
          CAST(length(text) AS INT) AS len FROM documents""",
    "d04_quality" ->
      s"""SELECT doc_id,
          CAST(length(text) AS INT) AS len,
          CAST(len($duckToks) AS INT) AS n_tokens,
          CAST(length(replace(text, ' ', '')) AS DOUBLE) / len($duckToks) AS avg_word_len,
          CAST(len(list_distinct($duckToks)) AS DOUBLE) / len($duckToks) AS ttr
          FROM documents""",
    "d05_lang_guess" -> {
      // Mirror TextFunctions.langGuess: score = marker hits among tokens,
      // argmax with first-listed-language preference, 'und' when all 0.
      val scoreExprs = graft.functions.TextFunctions.langMarkers.map { case (lang, markers) =>
        val score = markers
          .map(m => s"len(list_filter($duckToks, t -> t = '$m'))")
          .mkString(" + ")
        (lang, score)
      }
      val bestExpr = scoreExprs.map(_._2).map(s => s"($s)").mkString("greatest(", ", ", ")")
      val pick = scoreExprs.foldRight("'und'") { case ((lang, score), acc) =>
        s"CASE WHEN ($score) = best AND best > 0 THEN '$lang' ELSE $acc END"
      }
      s"""SELECT guess, count(*) AS n_docs FROM (
            SELECT ($pick) AS guess FROM (
              SELECT text, ($bestExpr) AS best FROM documents))
          GROUP BY 1"""
    },
    "d06_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
         FROM documents""",
    "d51_token_fertility" -> {
      // same language pick as d05, BPE-ish token count as d14, ratio
      // by integer division in permille
      val scoreExprs = graft.functions.TextFunctions.langMarkers.map { case (lang, markers) =>
        val score = markers
          .map(m => s"len(list_filter($duckToks, t -> t = '$m'))")
          .mkString(" + ")
        (lang, score)
      }
      val bestExpr = scoreExprs.map(_._2).map(s => s"($s)").mkString("greatest(", ", ", ")")
      val pick = scoreExprs.foldRight("'und'") { case ((lang, score), acc) =>
        s"CASE WHEN ($score) = best AND best > 0 THEN '$lang' ELSE $acc END"
      }
      s"""SELECT guess, count(*) AS n_docs,
            CAST(sum(chars) AS BIGINT) AS sum_chars,
            CAST(sum(bpe) AS BIGINT) AS sum_bpe_tokens,
            (1000 * CAST(sum(chars) AS BIGINT)) // CAST(sum(bpe) AS BIGINT)
              AS chars_per_token_permille
          FROM (
            SELECT ($pick) AS guess,
              CAST(length(text) AS BIGINT) AS chars,
              CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe
            FROM (
              SELECT text, ($bestExpr) AS best FROM documents))
          GROUP BY 1"""
    },
    "d07_shingle_count" ->
      s"""SELECT doc_id,
          CAST(CASE WHEN len($duckToks) < 3 THEN 1
               ELSE len(list_distinct(list_transform(
                 generate_series(1, len($duckToks) - 2),
                 i -> array_to_string($duckToks[i:i+2], ' ')))) END AS INT) AS n_shingles
          FROM documents""",
    "d09_simhash_pairs" -> {
      // Mirror of Dedup.simhashPairsMd5: 60-bit md5-digit SimHash,
      // 4×15-bit band agreement, Hamming <= 10. Bit i comes from hex
      // digit i/4 (1-based position i/4+1), mask 1<<(i%4).
      val digitVal = (d: String) =>
        s"CASE WHEN ascii(substr(md5(t), $d, 1)) >= 97 THEN ascii(substr(md5(t), $d, 1)) - 87 ELSE ascii(substr(md5(t), $d, 1)) - 48 END"
      val bitTerms = (0 until 60).map { i =>
        val idx = i / 4 + 1
        val mask = 1 << (i % 4)
        s"(CASE WHEN list_sum(list_transform(dg, d -> CASE WHEN (d[$idx] & $mask) > 0 THEN 1 ELSE -1 END)) > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" + ")
      val bandCond = (0 until 4).map { b =>
        s"((xor(a.fp, b.fp) >> ${b * 15}) & 32767) = 0"
      }.mkString("(", " OR ", ")")
      s"""WITH toks AS (SELECT doc_id, $duckToks AS tk FROM documents),
          td AS (SELECT doc_id,
                   list_transform(tk, t -> list_transform(range(1, 16), d -> ${digitVal("CAST(d AS INT)")})) AS dg
                 FROM toks),
          fp AS (SELECT doc_id, ($bitTerms) AS fp FROM td)
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
          FROM fp a JOIN fp b ON a.doc_id < b.doc_id AND $bandCond
          WHERE bit_count(xor(a.fp, b.fp)) <= 10"""
    },
    "d10_jaccard_pairs" ->
      s"""WITH sh AS (
            SELECT doc_id, list_distinct(
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END) AS s
            FROM documents),
          ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
          sizes AS (SELECT doc_id, len(s) AS n FROM sh),
          rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 100),
          exr AS (SELECT ex.doc_id, ex.g FROM ex JOIN rare USING (g)),
          shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM exr a JOIN exr b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT id_a, id_b, n_shared FROM shared
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
          WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= 0.5""",
    "d14_bpe_tokens" ->
      s"""SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
          CAST(len($duckToks) AS INT) AS n_ws_tokens
          FROM documents""",
    "d15_quality_ratios" ->
      s"""SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text) AS punct_ratio,
          CAST(len(list_filter($duckToks, t -> t IN ('the','and','of','is','a','to','in'))) AS DOUBLE)
            / len($duckToks) AS stopword_ratio
          FROM documents""",
    "d12_source_stats" ->
      """SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         min(doc_id) AS first_doc
         FROM documents
         WHERE doc_id IN (
           SELECT min(doc_id) FROM documents
           GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
         GROUP BY source""",
    "d16_dup_clusters" ->
      s"""WITH RECURSIVE $jaccardPairsCtes
          SELECT id AS doc_id, cluster FROM clusters""",
    "d17_neardup_keep" ->
      s"""WITH RECURSIVE $jaccardPairsCtes
          SELECT d.doc_id, d.source, d.n_chars FROM documents d
          WHERE d.doc_id NOT IN (SELECT id FROM clusters WHERE cluster <> id)""",
    "d18_sample_bernoulli" ->
      s"""SELECT doc_id, source FROM documents WHERE $duckHash16 < 13107""",
    "d19_sample_stratified" ->
      s"""SELECT doc_id, source FROM (
            SELECT doc_id, source, $duckHash16 AS hv FROM documents)
          QUALIFY row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) <= 20""",
    "d33_source_mix" ->
      s"""WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
          w AS (SELECT source,
                  CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_micro
                FROM counts),
          t AS (SELECT source,
                  CAST(60 * w_micro AS BIGINT) // (SELECT CAST(sum(w_micro) AS BIGINT) FROM w) AS target
                FROM w),
          ranked AS (
            SELECT doc_id, source,
              row_number() OVER (PARTITION BY source ORDER BY $duckHash16, doc_id) AS rn
            FROM documents)
          SELECT doc_id, source FROM ranked JOIN t USING (source) WHERE rn <= target""",
    "d20_vocab_df" ->
      s"""SELECT token, count(*) AS df FROM (
            SELECT doc_id, unnest(list_distinct($duckToks)) AS token FROM documents)
          GROUP BY token ORDER BY df DESC, token LIMIT 100""",
    // Mirror of d34: the single-window cumulative sum IS the spec the
    // distributed prefix sum must match bit-for-bit (integer weights,
    // unique total order).
    "d34_budget_select" ->
      s"""WITH d AS (
            SELECT doc_id, n_chars,
              CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
          c AS (
            SELECT doc_id, n_tokens,
              CAST(coalesce(sum(n_tokens) OVER (
                ORDER BY n_chars DESC, doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS cum_before
            FROM d)
          SELECT doc_id, n_tokens, cum_before FROM c WHERE cum_before < 5000""",
    // Mirror of d35: seeded md5 shard + within-shard hash order.
    "d35_shuffle_shard" -> {
      def digit(i: Int) =
        s"(CASE WHEN ascii(substr(h, $i, 1)) >= 97 THEN ascii(substr(h, $i, 1)) - 87 ELSE ascii(substr(h, $i, 1)) - 48 END)"
      val h16 = s"(${digit(1)} * 4096 + ${digit(2)} * 256 + ${digit(3)} * 16 + ${digit(4)})"
      s"""WITH hashed AS (
            SELECT doc_id, md5('s42-' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents),
          sharded AS (
            SELECT doc_id, h, CAST($h16 % 8 AS INT) AS shard FROM hashed)
          SELECT doc_id, shard,
            CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos
          FROM sharded"""
    },
    // Mirror of d36: hashed uni+bigram buckets, add-one-smoothed
    // micro-nat log ratio, integer doc weights, top-50.
    "d36_dsir_select" -> {
      def digit(i: Int) =
        s"(CASE WHEN ascii(substr(h, $i, 1)) >= 97 THEN ascii(substr(h, $i, 1)) - 87 ELSE ascii(substr(h, $i, 1)) - 48 END)"
      val h16 = s"(${digit(1)} * 4096 + ${digit(2)} * 256 + ${digit(3)} * 16 + ${digit(4)})"
      s"""WITH t AS (
            SELECT doc_id, lang, $duckToks AS toks FROM documents),
          feats AS (
            SELECT doc_id, lang, unnest(toks) AS f FROM t
            UNION ALL
            SELECT doc_id, lang,
              unnest(list_transform(range(1, greatest(len(toks), 1)),
                i -> toks[i] || ' ' || toks[i + 1])) AS f
            FROM t),
          hashed AS (SELECT doc_id, lang, md5(f) AS h FROM feats),
          bb AS (SELECT doc_id, lang, ($h16 % 64) AS b FROM hashed),
          stats AS (
            SELECT b,
              count(*) FILTER (WHERE lang = 'en') AS n_t,
              count(*) AS n_r
            FROM bb GROUP BY b),
          tot AS (SELECT sum(n_t) AS tot_t, sum(n_r) AS tot_r FROM stats),
          sc AS (
            SELECT b,
              CAST(floor(ln(CAST(n_t + 1 AS DOUBLE) / CAST(tot_t + 64 AS DOUBLE)) * 1000000.0) AS BIGINT)
                - CAST(floor(ln(CAST(n_r + 1 AS DOUBLE) / CAST(tot_r + 64 AS DOUBLE)) * 1000000.0) AS BIGINT) AS s
            FROM stats, tot),
          pd AS (SELECT doc_id, b, count(*) AS c FROM bb GROUP BY 1, 2),
          w AS (
            SELECT doc_id, CAST(sum(c * s) AS BIGINT) AS weight_micro
            FROM pd JOIN sc USING (b) GROUP BY 1)
          SELECT doc_id, weight_micro FROM w
          ORDER BY weight_micro DESC, doc_id LIMIT 50"""
    },
    // Mirror of d37: corpus-unigram micro-nat log-probs, exact-integer
    // mean-log-prob gate.
    "d37_unigram_lm" ->
      s"""WITH $unigramAggCte
          SELECT doc_id, n_tokens, sum_lp_micro,
            (sum_lp_micro > -3450000 * n_tokens) AS keep
          FROM agg""",
    // Mirror of d52: the same per-doc unigram aggregate floored to
    // MILLI-nats (exact floor division via the nonnegative-remainder
    // identity — DuckDB's // truncates toward zero on negatives),
    // histogram + descending cumulative window, value-based thirds.
    "d52_ppl_buckets" ->
      s"""WITH $unigramAggCte,
          sm AS (
            SELECT doc_id,
              (sum_lp_micro - ((sum_lp_micro % (n_tokens * 1000) + (n_tokens * 1000))
                % (n_tokens * 1000))) // (n_tokens * 1000) AS score_milli
            FROM agg),
          h AS (SELECT score_milli, count(*) AS cnt FROM sm GROUP BY 1),
          cw AS (
            SELECT score_milli,
              sum(cnt) OVER (ORDER BY score_milli DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM h),
          nn AS (SELECT count(*) AS n FROM sm),
          cuts AS (
            SELECT
              max(CASE WHEN cum >= (n + 2) // 3 THEN score_milli END) AS t_head,
              max(CASE WHEN cum >= (2 * n + 2) // 3 THEN score_milli END) AS t_tail
            FROM cw, nn)
          SELECT doc_id, CAST(score_milli AS BIGINT) AS score_milli,
            CASE WHEN score_milli >= t_head THEN 'head'
                 WHEN score_milli >= t_tail THEN 'middle'
                 ELSE 'tail' END AS bucket
          FROM sm, cuts""",
    // Mirror of d53: (source, token) counts, per-source/per-token/
    // corpus totals, micro-nat log-ratio quantized once, exact
    // integer per-source sum — KL(source ‖ corpus) · n_s unnormalized.
    "d53_source_drift" ->
      s"""WITH t AS (SELECT source, $duckToks AS toks FROM documents),
          tok AS (SELECT source, unnest(toks) AS token FROM t),
          st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
          ns AS (SELECT source, sum(c) AS n_s FROM st GROUP BY 1),
          gw AS (SELECT token, sum(c) AS c_w FROM st GROUP BY 1),
          nn AS (SELECT sum(c) AS n FROM st),
          lr AS (
            SELECT st.source, st.c,
              CAST(floor(ln(CAST(st.c * nn.n AS DOUBLE)
                / CAST(ns.n_s * gw.c_w AS DOUBLE)) * 1000000.0) AS BIGINT) AS lr_micro
            FROM st
            JOIN ns USING (source)
            JOIN gw USING (token), nn)
          SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                 CAST(sum(c * lr_micro) AS BIGINT) AS kl_sum_micro
          FROM lr GROUP BY source""",
    // Mirror of d54: exact-dup fingerprint (the d01 normalization),
    // seeded md5 → 16-bit uniform, test iff u16 < 100·65536/1000 = 6553.
    "d54_leakage_split" -> {
      def digit(i: Int) =
        s"(CASE WHEN ascii(substr(h, $i, 1)) >= 97 THEN ascii(substr(h, $i, 1)) - 87 ELSE ascii(substr(h, $i, 1)) - 48 END)"
      val h16 = s"(${digit(1)} * 4096 + ${digit(2)} * 256 + ${digit(3)} * 16 + ${digit(4)})"
      s"""WITH f AS (
            SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents),
          hh AS (SELECT doc_id, fp, md5('r12-' || fp) AS h FROM f)
          SELECT doc_id, fp,
            CASE WHEN $h16 < 6553 THEN 'test' ELSE 'train' END AS split
          FROM hh"""
    },
    // Mirror of d55: distinct 3-token shingles (short docs shingle to
    // the whole text, exactly like TextFunctions.shingles), gram
    // doc-frequency, per-doc counts of grams with df >= 2.
    "d55_dup_gram_stats" ->
      s"""WITH sh AS (
            SELECT doc_id, list_distinct(
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END) AS s
            FROM documents),
          ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
          dfq AS (SELECT g, count(*) AS df FROM ex GROUP BY g)
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
            CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
          FROM ex JOIN dfq USING (g) GROUP BY doc_id""",
    // Mirror of d38: distinct (source, md5(5-gram)) sets, pair join,
    // per-source totals. Short docs (<5 tokens) shingle to the whole
    // token-joined text, exactly like TextFunctions.shingles.
    "d38_source_overlap" ->
      s"""WITH sh AS (
            SELECT source, list_distinct(
              CASE WHEN len($duckToks) < 5 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(generate_series(1, len($duckToks) - 4),
                     i -> array_to_string($duckToks[i:i+4], ' ')) END) AS s
            FROM documents),
          g AS (SELECT DISTINCT source AS src, md5(g) AS g
                FROM (SELECT source, unnest(s) AS g FROM sh)),
          t AS (SELECT src, count(*) AS n FROM g GROUP BY 1),
          p AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS shared
                FROM g a JOIN g b USING (g) WHERE a.src < b.src GROUP BY 1, 2)
          SELECT src_a, src_b, shared, ta.n AS n_a, tb.n AS n_b
          FROM p
          JOIN t ta ON ta.src = p.src_a
          JOIN t tb ON tb.src = p.src_b""",
    // Mirror of d49: the d39 BM25 top-20 (bm25SqlCte) ranked, fused
    // with the exact cosine top-20 of query vector 0 (v01's scoring
    // shape) by integer RRF — 1000000 // (60+rnk) micro-points, sum,
    // (score desc, doc_id asc) cut at 10.
    "d49_hybrid_rrf" ->
      s"""WITH $bm25SqlCte,
          bmtop AS (
            SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score_micro
            FROM sc GROUP BY 1
            ORDER BY score_micro DESC, doc_id LIMIT 20),
          bmrank AS (
            SELECT doc_id,
              row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rnk
            FROM bmtop),
          qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
          cand AS (
            SELECT vec_id AS doc_id,
              list_reduce(list_transform(generate_series(1, len(embedding)),
                i -> CAST(embedding[i] AS DOUBLE) * CAST(qv.v[i] AS DOUBLE)), (x, y) -> x + y)
              / (sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
               * sqrt(list_reduce(list_transform(qv.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))) AS sim
            FROM embeddings, qv WHERE vec_id <> 0),
          knn AS (
            SELECT doc_id, rnk FROM (
              SELECT doc_id,
                row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS rnk
              FROM cand)
            WHERE rnk <= 20),
          u AS (SELECT doc_id, rnk FROM bmrank
                UNION ALL SELECT doc_id, rnk FROM knn),
          f AS (
            SELECT doc_id,
              CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS score_micro,
              count(*) AS n_lists
            FROM u GROUP BY 1)
          SELECT doc_id, score_micro, n_lists FROM f
          ORDER BY score_micro DESC, doc_id ASC LIMIT 10""",
    // Mirror of d50: rank-⌈900n/1000⌉ length in ascending order is
    // the exact p90 threshold; integer rank arithmetic, keep >=.
    "d50_quantile_gate" ->
      """WITH lens AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len FROM documents),
         rk AS (SELECT (900 * count(*) + 999) // 1000 AS r FROM lens),
         srt AS (SELECT len, row_number() OVER (ORDER BY len) AS rn FROM lens),
         thr AS (SELECT len AS t FROM srt, rk WHERE rn = rk.r)
         SELECT doc_id, len FROM lens, thr WHERE len >= t""",
    // Mirror of d39: BM25 with micro-nat idf and floor-quantized
    // per-term scores, every double in the same association order.
    "d39_bm25_topk" ->
      s"""WITH $bm25SqlCte
          SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score_micro
          FROM sc GROUP BY 1
          ORDER BY score_micro DESC, doc_id LIMIT 20""",
    // Mirror of d40: DuckDB's nfc_normalize implements the same
    // Unicode canonical composition; literals carry the composed
    // (U+00E9) and decomposed (U+0065 U+0301) spellings byte-exactly.
    "d40_nfc_normalize" ->
      s"""WITH v AS (
            SELECT doc_id,
              text || ' caf\u00e9' AS composed,
              text || ' caf\u0065\u0301' AS decomposed
            FROM documents)
          SELECT doc_id,
            CAST(length(decomposed) AS INT) AS len_raw,
            CAST(length(nfc_normalize(decomposed)) AS INT) AS len_nfc,
            (composed = decomposed) AS raw_eq,
            (nfc_normalize(composed) = nfc_normalize(decomposed)) AS canonical_eq,
            md5(nfc_normalize(decomposed)) AS fp_nfc
          FROM v""",
    // Mirror of d41: 1-based list slices clamp at the doc end exactly
    // like Spark's slice.
    "d41_chunk_overlap" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
          c AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS st FROM t)
          SELECT doc_id,
            CAST(st // 24 AS INT) AS chunk_idx,
            CAST(st AS INT) AS chunk_start,
            CAST(len(toks[st+1:st+32]) AS INT) AS n_chunk_tokens,
            md5(array_to_string(toks[st+1:st+32], ' ')) AS md5_chunk
          FROM c""",
    // Mirror of d47: df-capped shared-shingle counts, max-side
    // containment gated in integer math (shared*1000 >= 800*min(n)).
    "d47_containment_pairs" ->
      s"""WITH sh AS (
            SELECT doc_id, list_distinct(
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END) AS s
            FROM documents),
          ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
          sizes AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh),
          rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) BETWEEN 2 AND 100),
          exr AS (SELECT ex.doc_id, ex.g FROM ex JOIN rare USING (g)),
          shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(count(*) AS BIGINT) AS n_shared
            FROM exr a JOIN exr b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT id_a, id_b, n_shared, sa.n AS n_a, sb.n AS n_b
          FROM shared
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
          WHERE n_shared * 1000 >= 800 * least(sa.n, sb.n)""",
    // Mirror of d44: MLE bigram model from adjacent whitespace-token
    // pairs; context count C(w1) = sum over w2 of C(w1,w2); micro-nat
    // floor quantization then exact integer gate.
    "d44_bigram_lm_gate" ->
      s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
          p AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
                FROM (SELECT doc_id, toks,
                        unnest(range(1, len(toks))) AS i
                      FROM t WHERE len(toks) >= 2)),
          pd AS (SELECT doc_id, w1, w2, count(*) AS c FROM p GROUP BY 1, 2, 3),
          bg AS (SELECT w1, w2, sum(c) AS c12 FROM pd GROUP BY 1, 2),
          ctx AS (SELECT w1, sum(c12) AS c1 FROM bg GROUP BY 1),
          lp AS (SELECT bg.w1, bg.w2,
                   CAST(floor(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
                 FROM bg JOIN ctx USING (w1)),
          sc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_pairs,
                   CAST(sum(c * lp) AS BIGINT) AS sum_lp_micro
                 FROM pd JOIN lp USING (w1, w2) GROUP BY 1)
          SELECT d.doc_id,
            coalesce(n_pairs, 0) AS n_pairs,
            coalesce(sum_lp_micro, 0) AS sum_lp_micro,
            (coalesce(n_pairs, 0) = 0 OR sum_lp_micro > -3450000 * n_pairs) AS keep
          FROM (SELECT DISTINCT doc_id FROM documents) d
          LEFT JOIN sc USING (doc_id)""",
    // Mirror of d45 == d19's selection (the Spark plans differ — agg
    // top-k vs window — the selected set must not).
    "d45_stratified_topk_agg" ->
      s"""SELECT doc_id, source FROM (
            SELECT doc_id, source, $duckHash16 AS hv FROM documents)
          QUALIFY row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) <= 20""",
    // Mirror of d42: identical 32-bit md5-prefix gram hashes, window
    // minima with the rightmost-on-ties position rule.
    "d42_winnow_fp" ->
      s"""WITH t AS (
            SELECT doc_id,
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END AS sh
            FROM documents),
          h AS (SELECT doc_id,
                  list_transform(list_transform(sh, g -> md5(g)),
                    m -> ${duckHexPrefix("m", 8)}) AS hs
                FROM t),
          w AS (SELECT doc_id, hs,
                  unnest(range(0, greatest(len(hs) - 4, 0) + 1)) AS i
                FROM h),
          p AS (SELECT DISTINCT doc_id,
                  CAST(i + len(hs[i+1:i+4])
                    - list_position(list_reverse(hs[i+1:i+4]),
                                    list_min(hs[i+1:i+4])) AS INT) AS pos,
                  CAST(list_min(hs[i+1:i+4]) AS BIGINT) AS fp
                FROM w)
          SELECT doc_id, pos, fp FROM p""",
    // Mirror of d43: distinct winnowed fps per doc, df-capped
    // (2 <= df <= 100) fp-keyed pair join.
    "d43_winnow_pairs" ->
      s"""WITH t AS (
            SELECT doc_id,
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END AS sh
            FROM documents),
          h AS (SELECT doc_id,
                  list_transform(list_transform(sh, g -> md5(g)),
                    m -> ${duckHexPrefix("m", 8)}) AS hs
                FROM t),
          w AS (SELECT doc_id, hs,
                  unnest(range(0, greatest(len(hs) - 4, 0) + 1)) AS i
                FROM h),
          fps AS (SELECT DISTINCT doc_id,
                    CAST(list_min(hs[i+1:i+4]) AS BIGINT) AS fp
                  FROM w),
          keep AS (SELECT fp FROM fps GROUP BY fp
                   HAVING count(*) BETWEEN 2 AND 100),
          fk AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp)),
          pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM fk a JOIN fk b USING (fp)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2)
          SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= 3""",

    // Mirror of d56: per distinct token, c·⌊ln(c)·1e6⌋ as BIGINT —
    // associative integer sum, then the identical double expression.
    "d56_token_entropy" ->
      s"""WITH base AS (SELECT doc_id, $duckToks AS t FROM documents),
          terms AS (
            SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
              list_reduce(list_transform(list_distinct(t), x ->
                CAST(len(list_filter(t, y -> y = x)) AS BIGINT) *
                CAST(floor(ln(CAST(len(list_filter(t, y -> y = x)) AS DOUBLE))
                     * 1000000) AS BIGINT)),
                (a, b) -> a + b) AS sum_clnc_micro
            FROM base)
          SELECT doc_id, n_tokens, sum_clnc_micro,
            CAST(CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
                 AS DOUBLE)
              - CAST(sum_clnc_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              AS entropy_micro
          FROM terms""",

    // Mirror of d57: same rank order (freq desc, token asc), same
    // integer milli-log regression sums, same final slope expression.
    "d57_zipf_slope" ->
      s"""WITH tf AS (
            SELECT source, tok, count(*) AS cnt FROM (
              SELECT source, UNNEST($duckToks) AS tok FROM documents)
            GROUP BY 1, 2),
          xy AS (
            SELECT source,
              CAST(floor(ln(CAST(row_number() OVER (PARTITION BY source
                  ORDER BY cnt DESC, tok ASC) AS DOUBLE)) * 1000) AS BIGINT) AS x,
              CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000) AS BIGINT) AS y
            FROM tf),
          agg AS (
            SELECT source, count(*) AS n_terms,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sxx
            FROM xy GROUP BY 1)
          SELECT source, n_terms,
            CAST(n_terms * sxy - sx * sy AS DOUBLE)
              / nullif(CAST(n_terms * sxx - sx * sx AS DOUBLE), 0) AS zipf_slope
          FROM agg""",

    // Mirror of d58: same rank order, integer cumulative sums, and the
    // division-free cum·10 ≥ total·9 coverage test.
    "d58_vocab_coverage" ->
      s"""WITH tf AS (
            SELECT source, tok, count(*) AS cnt FROM (
              SELECT source, UNNEST($duckToks) AS tok FROM documents)
            GROUP BY 1, 2),
          cum AS (
            SELECT source,
              row_number() OVER w AS rank,
              CAST(sum(cnt) OVER (PARTITION BY source
                ORDER BY cnt DESC, tok ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
            FROM tf
            WINDOW w AS (PARTITION BY source ORDER BY cnt DESC, tok ASC)),
          tot AS (
            SELECT source, CAST(sum(cnt) AS BIGINT) AS total_tokens,
              count(*) AS n_terms
            FROM tf GROUP BY 1)
          SELECT c.source, CAST(min(c.rank) AS INT) AS vocab_90,
            min(t.n_terms) AS n_terms, min(t.total_tokens) AS total_tokens
          FROM cum c JOIN tot t USING (source)
          WHERE c.cum * 10 >= t.total_tokens * 9
          GROUP BY 1""",

    // Mirror of d59: the same distinct-3-gram sets (d55's tokenizer
    // branch for short docs), first owner = min doc_id per gram, and
    // one double division of two exact integers at the end.
    "d59_ngram_novelty" ->
      s"""WITH sh AS (
            SELECT doc_id, list_distinct(
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END) AS s
            FROM documents),
          g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
          f AS (SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram)
          SELECT g.doc_id, count(*) AS n_grams,
            CAST(SUM(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
              AS n_novel,
            CAST(SUM(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(count(*) AS DOUBLE) AS novel_frac
          FROM g JOIN f USING (gram)
          GROUP BY g.doc_id""",

    // Mirror of d60: d08's banded chain, thresholded pairs joined to
    // sources, canonicalized with least/greatest, counted per cell.
    "d60_source_neardup_matrix" ->
      s"""WITH $minhashCandSql,
          pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5)
          SELECT least(da.source, db.source) AS src_lo,
                 greatest(da.source, db.source) AS src_hi,
                 count(*) AS n_pairs
          FROM pairs p
          JOIN documents da ON da.doc_id = p.id_a
          JOIN documents db ON db.doc_id = p.id_b
          GROUP BY 1, 2""",

    // Mirror of d61's bound contract (q26 precedent): DuckDB's own HLL
    // estimate must land inside the same 5% band around the same exact
    // count — the sketches differ, the contract doesn't.
    "d61_hll_shard_union" ->
      s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS tok FROM documents),
          ex AS (SELECT count(DISTINCT tok) AS exact_nd FROM tok),
          ap AS (SELECT approx_count_distinct(tok) AS est FROM tok),
          sh AS (SELECT count(DISTINCT doc_id % 4) AS n_shards FROM tok)
          SELECT sh.n_shards, ex.exact_nd,
            CASE WHEN abs(ap.est - ex.exact_nd) <= ex.exact_nd * 0.05
                 THEN 'ok' ELSE 'off' END AS union_check
          FROM sh, ex, ap""",

    // Mirror of d62: same tokenizer, same integer burstiness gate.
    "d62_bursty_terms" ->
      s"""SELECT tok AS term, count(DISTINCT doc_id) AS df, count(*) AS cf
          FROM (SELECT doc_id, unnest($duckToks) AS tok FROM documents)
          GROUP BY 1
          HAVING count(*) * 2 >= count(DISTINCT doc_id) * 3
             AND count(DISTINCT doc_id) >= 5""",

    // Mirror of d63: d29's chunk slicing at 20 tokens, d05's marker
    // argmax (first-listed wins ties) per chunk, and the same integer
    // rollup.
    "d63_mixed_language" -> {
      val scoreExprs = graft.functions.TextFunctions.langMarkers.map { case (lang, markers) =>
        val score = markers
          .map(m => s"len(list_filter(ctoks, t -> t = '$m'))")
          .mkString(" + ")
        (lang, score)
      }
      val bestExpr = scoreExprs.map(_._2).map(s => s"($s)").mkString("greatest(", ", ", ")")
      val pick = scoreExprs.foldRight("'und'") { case ((lang, score), acc) =>
        s"CASE WHEN ($score) = best AND best > 0 THEN '$lang' ELSE $acc END"
      }
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
          ch AS (
            SELECT doc_id, t[(i*20+1):(i*20+20)] AS ctoks
            FROM toks, LATERAL (
              SELECT unnest(generate_series(0,
                greatest(0, CAST((len(t)+19)//20 AS INT) - 1))) AS i) gs),
          g AS (SELECT doc_id, ($pick) AS guess FROM (
                  SELECT doc_id, ctoks, ($bestExpr) AS best FROM ch)),
          pl AS (SELECT doc_id, guess, count(*) AS cnt FROM g GROUP BY 1, 2)
          SELECT doc_id,
            CAST(sum(cnt) AS BIGINT) AS n_chunks,
            CAST(count(CASE WHEN guess <> 'und' THEN 1 END) AS BIGINT) AS n_langs,
            CAST(coalesce(max(CASE WHEN guess <> 'und' THEN cnt END), 0) * 1000
              // sum(cnt) AS BIGINT) AS majority_permille,
            count(CASE WHEN guess <> 'und' THEN 1 END) >= 2 AS is_mixed
          FROM pl GROUP BY doc_id"""
    },

    // Mirror of d64: the same global (df, token) rarity order, the
    // same prefix length |d| − ceil(0.95·|d|) + 1 (rn over the rarity
    // order), the same prefix-postings self-join WITH the AllPairs
    // length filter, and the integer verification over full token
    // sets — on exact STRINGS where Spark probes xxhash64 token ids
    // (equal results absent a 2^-64 collision; the cross-engine match
    // is itself the collision audit).
    "d64_prefix_jaccard" ->
      s"""WITH tok AS (SELECT doc_id AS id,
                         unnest(list_distinct($duckToks)) AS token
                       FROM documents),
          dfr AS (SELECT token, count(*) AS df FROM tok GROUP BY 1),
          ord AS (SELECT t.id, t.token,
                    row_number() OVER (PARTITION BY t.id
                      ORDER BY d.df, t.token) AS rn,
                    count(*) OVER (PARTITION BY t.id) AS n
                  FROM tok t JOIN dfr d USING (token)),
          pre AS (SELECT id, token, n FROM ord
                  WHERE rn <= n - ((95 * n + 99) // 100) + 1),
          cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
                   FROM pre a JOIN pre b
                   ON a.token = b.token AND a.id < b.id
                   AND 95 * greatest(a.n, b.n) <= 100 * least(a.n, b.n)),
          sets AS (SELECT doc_id AS id, list_distinct($duckToks) AS ts
                   FROM documents),
          v AS (SELECT c.id_a, c.id_b,
                  CAST(len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_inter,
                  CAST(len(sa.ts) + len(sb.ts)
                    - len(list_intersect(sa.ts, sb.ts)) AS BIGINT) AS n_union
                FROM cand c
                JOIN sets sa ON sa.id = c.id_a
                JOIN sets sb ON sb.id = c.id_b)
          SELECT id_a, id_b, n_inter, n_union,
            CAST((100 * n_inter) // n_union AS BIGINT) AS jaccard_pct
          FROM v WHERE 100 * n_inter >= 95 * n_union""",

    // Mirror of d65: d16's recursive clusters, keeper = highest
    // n_chars then lowest id, survivors by anti-membership.
    "d65_neardup_keep_best" ->
      s"""WITH RECURSIVE $jaccardPairsCtes,
          scored AS (
            SELECT c.id, c.cluster, d.n_chars
            FROM clusters c JOIN documents d ON d.doc_id = c.id),
          keep AS (
            SELECT cluster, id FROM (
              SELECT cluster, id,
                row_number() OVER (PARTITION BY cluster
                  ORDER BY n_chars DESC, id) AS rn
              FROM scored) WHERE rn = 1)
          SELECT d.doc_id, d.source, d.n_chars FROM documents d
          WHERE d.doc_id NOT IN (
            SELECT s.id FROM scored s JOIN keep k
            ON s.cluster = k.cluster AND s.id <> k.id)""",

    // Mirror of d67: d10's shingle/rare CTEs, both directions from the
    // one a<b intersection count, integer containment percent.
    "d67_containment_pairs" ->
      s"""WITH sh AS (
            SELECT doc_id, list_distinct(
              CASE WHEN len($duckToks) < 3 THEN [array_to_string($duckToks, ' ')]
                   ELSE list_transform(
                     generate_series(1, len($duckToks) - 2),
                     i -> array_to_string($duckToks[i:i+2], ' ')) END) AS s
            FROM documents),
          ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
          sizes AS (SELECT doc_id, len(s) AS n FROM sh),
          rare AS (SELECT g FROM ex GROUP BY g HAVING count(*) <= 100),
          exr AS (SELECT ex.doc_id, ex.g FROM ex JOIN rare USING (g)),
          shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
            FROM exr a JOIN exr b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
          dirs AS (
            SELECT id_a AS contained_id, id_b AS container_id, n_shared
            FROM shared
            UNION ALL
            SELECT id_b, id_a, n_shared FROM shared)
          SELECT b.contained_id, b.container_id,
            CAST(b.n_shared AS BIGINT) AS n_shared,
            CAST(s.n AS BIGINT) AS n_shingles,
            CAST(b.n_shared * 100 // s.n AS BIGINT) AS containment_pct
          FROM dirs b JOIN sizes s ON b.contained_id = s.doc_id
          WHERE b.n_shared * 100 // s.n >= 60""",

    // Mirror of d66: the same single-space tokens, the same
    // (count DESC, token) top-20 tie-break, integer permille.
    "d66_vocab_coverage" ->
      """WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents),
          t2 AS (SELECT source, tok FROM toks WHERE tok <> ''),
          tf AS (SELECT tok, count(*) AS n FROM t2 GROUP BY 1),
          topk AS (SELECT tok FROM tf ORDER BY n DESC, tok LIMIT 20)
          SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN tok IN (SELECT tok FROM topk)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
            CAST(sum(CASE WHEN tok IN (SELECT tok FROM topk)
              THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
              AS covered_permille
          FROM t2 GROUP BY 1""",

    // Mirror of d68: d16's recursive components over the same capped
    // Jaccard pairs, LEFT-joined sizes (singletons = 1), the same
    // seeded md5-uniform coin replayed as exact integer math.
    "d68_soft_dedup_sample" ->
      s"""WITH RECURSIVE $jaccardPairsCtes,
          csz AS (SELECT cluster, count(*) AS cs FROM clusters GROUP BY 1),
          ds AS (
            SELECT d.doc_id, COALESCE(csz.cs, 1) AS cluster_size,
              ${duckHexPrefix("md5('soft-' || CAST(d.doc_id AS VARCHAR))", 8)} AS h32
            FROM documents d
            LEFT JOIN clusters c ON c.id = d.doc_id
            LEFT JOIN csz ON csz.cluster = c.cluster)
          SELECT doc_id, CAST(cluster_size AS BIGINT) AS cluster_size
          FROM ds WHERE h32 * cluster_size < 4294967296""",

    // Mirror of d70: the same rare-token block (df ≤ 25), distinct
    // candidate pairs, the same classic Levenshtein ≤ 2.
    "d70_fuzzy_match" ->
      s"""WITH $fuzzyMatchCtes
          SELECT key_a, key_b, CAST(levenshtein(na, nb) AS BIGINT) AS dist
          FROM cand WHERE levenshtein(na, nb) <= 2""",

    // Mirror of d71: connected components (recursive min-key
    // propagation) over the d70 matches, merged-entity member counts.
    "d71_entity_groups" ->
      s"""WITH RECURSIVE $fuzzyMatchCtes,
          m AS (SELECT key_a, key_b FROM cand
                WHERE levenshtein(na, nb) <= 2),
          sym AS (SELECT key_a AS a, key_b AS b FROM m
                  UNION ALL SELECT key_b, key_a FROM m),
          cc(id, comp) AS (
            SELECT DISTINCT a, a FROM sym
            UNION
            SELECT s.b, c.comp FROM cc c JOIN sym s ON c.id = s.a),
          clusters AS (SELECT id, min(comp) AS canon FROM cc GROUP BY id)
          SELECT canon AS entity_key, count(*) AS n_members
          FROM clusters GROUP BY 1""",

    // Mirror of d69: tf re-counted over the same md5-prefix buckets,
    // idf and centroids read from the DUMPED artifacts (identical
    // parquet doubles), every fold replayed in ascending bucket/
    // dimension order from the exact 0.0 seed, argmin ties to the
    // smaller cluster id, distances micro-floored.
    "d69_tfidf_cluster" ->
      s"""WITH idfl AS (SELECT list(idf ORDER BY bucket) AS l
                        FROM '__TAUX__/tfidf_idf.parquet/*.parquet'),
          cents AS (SELECT cluster_id, centroid
                    FROM '__TAUX__/kmeans_centroids.parquet/*.parquet'),
          tok AS (SELECT doc_id, unnest($duckToks) AS token FROM documents),
          tf AS (SELECT doc_id,
                   ${duckHexPrefix("md5(token)", 8)} % 32 AS bucket,
                   CAST(count(*) AS DOUBLE) AS tf
                 FROM tok WHERE len(token) > 0 GROUP BY 1, 2),
          mp AS (SELECT doc_id,
                   map_from_entries(list(struct_pack(k := bucket, v := tf)))
                     AS m
                 FROM tf GROUP BY 1),
          raw AS (SELECT d.doc_id,
                   list_transform(generate_series(0, 31),
                     b -> coalesce(map_extract(mp.m, b)[1], 0.0)
                       * idfl.l[b + 1]) AS r
                 FROM documents d LEFT JOIN mp ON d.doc_id = mp.doc_id, idfl),
          nv AS (SELECT doc_id, r,
                   sqrt(list_reduce(list_transform(r, x -> x * x),
                     (x, y) -> x + y)) AS nrm
                 FROM raw),
          v AS (SELECT doc_id,
                  CASE WHEN nrm > 0 THEN list_transform(r, x -> x / nrm)
                       ELSE r END AS vec
                FROM nv),
          scored AS (SELECT v.doc_id, c.cluster_id,
                   list_reduce(list_transform(generate_series(1, 32),
                     i -> (v.vec[i] - c.centroid[i])
                        * (v.vec[i] - c.centroid[i])),
                     (x, y) -> x + y) AS d2
                 FROM v CROSS JOIN cents c),
          best AS (SELECT doc_id, cluster_id, d2,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY d2 ASC, cluster_id ASC) AS rn
                   FROM scored)
          SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
            CAST(floor(d2 * 1000000.0) AS BIGINT) AS dist_micro
          FROM best WHERE rn = 1"""
  )
}
