package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.{BloomDedup, Decontaminate, Dedup, Packing, QualityFilters}

/** Round-5 training-data pipeline queries: repetition quality metrics,
  * benchmark decontamination, a combined quality gate, regex redaction,
  * and Bloom-sketch incremental dedup. All oracle-checked (the Bloom
  * query via an engine-independent contract, same pattern as
  * q26_approx_sketches: DuckDB pins the exact new-doc count while the
  * 'ok' columns certify the sketch's no-false-negative / fp-rate bounds,
  * which only hold if the Spark side did the work).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Gopher-style repetition metrics, pure map-side ---
    "d21_repetition" -> { (s, dir) =>
      QualityFilters.repetitionMetrics(Tables(s, dir).documents, "doc_id", "text")
    },

    // --- Benchmark decontamination: docs sharing a 4-token gram with
    //     the eval slice (doc_id % 20 == 0); broadcast semi-join shape.
    //     (Production corpora use ~13-gram windows; 4 fits the ~50-token
    //     synthetic docs so the gate exercises real overlap, not only
    //     exact copies.) ---
    "d22_decontaminate" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Decontaminate.contaminated(
        d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 4)
    },

    // --- Fraction-threshold contamination: contaminated only when
    //     > 25% of a doc's distinct 4-grams hit the eval set (the
    //     overlap-percentage recipe; any-hit is d22) ---
    "d46_contamination_frac" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Decontaminate.contaminationFraction(
        d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 4, minOverlapPermille = 250)
    },

    // --- Combined quality gate with audit flags ---
    "d23_quality_gate" -> { (s, dir) =>
      QualityFilters.qualityGate(Tables(s, dir).documents, "doc_id", "text",
        minTokens = 30, minTtr = 0.3, maxTokenFrac = 0.2)
    },

    // --- Term-denylist redaction audit ---
    "d24_term_redact" -> { (s, dir) =>
      QualityFilters.redactionStats(Tables(s, dir).documents, "doc_id", "text",
        pattern = "\\b(customer|stream)\\b", mask = "[MASKED]")
    },

    // --- Sequence packing: concat-and-chunk pack assignment per
    //     source shard (512-token packs) ---
    "d26_sequence_pack" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Packing.packByBudget(d, "source", "doc_id",
        size(tokens(col("text"))), budget = 512)
    },

    // --- Pack fill statistics ---
    "d27_pack_stats" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      Packing.packStats(
        Packing.packByBudget(d, "source", "doc_id",
          size(tokens(col("text"))), budget = 512),
        "source")
    },

    // --- The composed corpus pipeline, end to end: quality gate →
    //     exact dedup → benchmark decontamination → sequence packing.
    //     One auditable output: every surviving doc with its pack. ---
    "d28_corpus_pipeline" -> { (s, dir) =>
      val d = Tables(s, dir).documents
      val gated = d.join(
        QualityFilters.qualityGate(d, "doc_id", "text", 30, 0.3, 0.2)
          .filter(col("keep")).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val deduped = Dedup.exactKeep(gated, "doc_id", "text")
      val corpus = deduped.filter(col("doc_id") % 20 =!= 0)
      val evalSet = d.filter(col("doc_id") % 20 === 0)
      val cleaned = Decontaminate.clean(corpus, evalSet, "doc_id", "text", n = 4)
      Packing.packByBudget(cleaned, "source", "doc_id",
        size(tokens(col("text"))), budget = 512)
        .select(col("source"), col("doc_id"), col("n_tokens"), col("pack_id"))
    },

    // --- Bloom-sketch incremental dedup: "seen" corpus (doc_id%3==0)
    //     sketched once, incoming batch filtered map-side. Output is the
    //     engine-independent contract row. ---
    "d25_bloom_incremental" -> { (s, dir) =>
      import s.implicits._
      val d = Tables(s, dir).documents
        .select(col("doc_id"), contentFingerprint(col("text")).as("fp"))
      val seen = d.filter(col("doc_id") % 3 === 0)
      val incoming = d.filter(col("doc_id") % 3 =!= 0)
      val nSeen = seen.count()
      val bloom = BloomDedup.buildBloom(seen, col("fp"),
        expectedItems = math.max(nSeen, 1L), numBits = math.max(nSeen, 1L) * 8)
      val seenFps = seen.select("fp").distinct()
      val candNew = BloomDedup.definitelyNew(incoming, bloom, col("fp"))
      val nTrueNew = incoming.join(seenFps, Seq("fp"), "left_anti").count()
      val nCand = candNew.count()
      val nViol = candNew.join(seenFps, Seq("fp"), "left_semi").count()
      val missRate =
        if (nTrueNew == 0) 0.0 else (nTrueNew - nCand).toDouble / nTrueNew
      Seq((nTrueNew,
        if (nViol == 0) "ok" else "violated",
        if (missRate <= 0.05) "ok" else "off"))
        .toDF("n_true_new", "no_false_neg", "fp_bound")
    }
  )

  // DuckDB mirrors ------------------------------------------------------

  private val duckToks = "regexp_split_to_array(trim(text), ' +')"

  /** n-gram list with the same <n fallback as shinglesOfTokens. */
  private def duckGrams(n: Int): String =
    s"""CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
        ELSE list_transform(generate_series(1, len(t) - ${n - 1}),
          i -> array_to_string(t[i:i+${n - 1}], ' ')) END"""

  /** Share of list `a` taken by its most frequent element. */
  private def duckTopFrac(a: String): String =
    s"CAST(list_max(list_transform(list_distinct($a), x -> len(list_filter($a, y -> y = x)))) AS DOUBLE) / len($a)"

  val oracles: Map[String, String] = Map(
    "d21_repetition" ->
      s"""WITH b AS (SELECT doc_id, $duckToks AS t FROM documents),
          g AS (SELECT doc_id, t, ${duckGrams(2)} AS g2, ${duckGrams(3)} AS g3 FROM b)
          SELECT doc_id,
            ${duckTopFrac("t")} AS max_token_frac,
            ${duckTopFrac("g2")} AS top_2gram_frac,
            1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) AS dup_3gram_frac
          FROM g""",
    "d22_decontaminate" ->
      s"""WITH b AS (SELECT doc_id, $duckToks AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct(${duckGrams(4)}) AS s FROM b),
          ex AS (SELECT doc_id, md5(unnest(s)) AS g FROM sh),
          ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 20 = 0),
          corp AS (SELECT doc_id, g FROM ex WHERE doc_id % 20 <> 0)
          SELECT doc_id, count(*) AS n_hits
          FROM corp JOIN ev USING (g) GROUP BY doc_id""",
    "d46_contamination_frac" ->
      s"""WITH b AS (SELECT doc_id, $duckToks AS t FROM documents),
          sh AS (SELECT doc_id, list_distinct(${duckGrams(4)}) AS s FROM b),
          ex AS (SELECT doc_id, md5(unnest(s)) AS g FROM sh),
          ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 20 = 0),
          corp AS (SELECT doc_id, g FROM ex WHERE doc_id % 20 <> 0),
          tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM corp GROUP BY 1),
          hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
                  FROM corp JOIN ev USING (g) GROUP BY 1)
          SELECT tot.doc_id, n_grams,
            CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
            (coalesce(n_hits, 0) * 1000 > 250 * n_grams) AS contaminated
          FROM tot LEFT JOIN hit USING (doc_id)""",
    "d23_quality_gate" ->
      s"""WITH b AS (SELECT doc_id, $duckToks AS t FROM documents),
          m AS (SELECT doc_id,
                  CAST(len(t) AS INT) AS n_tokens,
                  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
                  ${duckTopFrac("t")} AS max_token_frac
                FROM b)
          SELECT doc_id, n_tokens, ttr, max_token_frac,
                 (n_tokens >= 30 AND ttr >= 0.3 AND max_token_frac <= 0.2) AS keep
          FROM m""",
    "d24_term_redact" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\b(customer|stream)\b')) AS INT) AS n_hits,
           regexp_replace(text, '\b(customer|stream)\b', '[MASKED]', 'g') AS redacted
         FROM documents""",
    "d26_sequence_pack" ->
      s"""WITH t AS (SELECT source, doc_id,
            CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents)
          SELECT source, doc_id, n_tokens,
            CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset,
            CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS pack_id
          FROM t""",
    "d27_pack_stats" ->
      s"""WITH t AS (SELECT source, doc_id,
            CAST(len($duckToks) AS BIGINT) AS n_tokens FROM documents),
          p AS (SELECT source, doc_id, n_tokens,
            CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS pack_id
          FROM t)
          SELECT source, pack_id, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM p GROUP BY source, pack_id""",
    "d28_corpus_pipeline" ->
      s"""WITH b AS (SELECT doc_id, source, text, $duckToks AS t FROM documents),
          gate AS (SELECT doc_id FROM (
              SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
                CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
                ${duckTopFrac("t")} AS mtf FROM b) x
            WHERE n_tokens >= 30 AND ttr >= 0.3 AND mtf <= 0.2),
          keepers AS (SELECT min(doc_id) AS doc_id
                      FROM documents JOIN gate USING (doc_id)
                      GROUP BY regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')),
          corpus AS (SELECT doc_id FROM keepers WHERE doc_id % 20 <> 0),
          sh AS (SELECT doc_id, list_distinct(${duckGrams(4)}) AS s FROM b),
          ex AS (SELECT doc_id, md5(unnest(s)) AS g FROM sh),
          ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 20 = 0),
          hit AS (SELECT DISTINCT e.doc_id FROM ex e
                  JOIN ev USING (g) JOIN corpus c ON c.doc_id = e.doc_id),
          clean AS (SELECT doc_id FROM corpus
                    WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
          toks AS (SELECT d.source, d.doc_id,
              CAST(len($duckToks) AS BIGINT) AS n_tokens
            FROM documents d JOIN clean USING (doc_id))
          SELECT source, doc_id, n_tokens,
            CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS pack_id
          FROM toks""",
    "d25_bloom_incremental" ->
      """WITH d AS (SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
           FROM documents),
          seen AS (SELECT fp FROM d WHERE doc_id % 3 = 0),
          inc AS (SELECT fp FROM d WHERE doc_id % 3 <> 0)
          SELECT count(*) AS n_true_new, 'ok' AS no_false_neg, 'ok' AS fp_bound
          FROM inc WHERE fp NOT IN (SELECT fp FROM seen)""")
}
