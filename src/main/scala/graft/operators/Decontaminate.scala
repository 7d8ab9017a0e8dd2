package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Benchmark decontamination: find training documents that share any
  * n-token-gram with an evaluation set (the standard "13-gram overlap"
  * check used when preparing LLM training corpora; n is a parameter
  * because the right value depends on tokenizer granularity).
  *
  * Scale shape: the eval side of the join is a benchmark suite — a few
  * MBs even for large eval collections — so its distinct gram set is
  * broadcast and the 100 TB corpus side never shuffles: the whole check
  * is a map-side broadcast-hash semi join over the corpus scan. Grams
  * are joined on their md5 (fixed 16-byte key) instead of the raw gram
  * string, which caps network/broadcast width regardless of n.
  */
object Decontaminate {

  /** Per-doc distinct gram fingerprints. */
  private def gramSet(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
        explode(distinctShingles(col(textCol), n)).as("gram"))
      .select(col(idCol), md5(col("gram")).as("g"))

  /** Documents of `corpus` contaminated by `evalSet`: every corpus doc
    * sharing >= 1 n-gram with any eval doc, with the count of distinct
    * overlapping grams (`n_hits`) as the contamination strength.
    */
  def contaminated(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = gramSet(evalSet, idCol, textCol, n).select("g").distinct()
    gramSet(corpus, idCol, textCol, n)
      .join(broadcast(evalGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Fraction-threshold contamination report: a doc counts as
    * contaminated only when MORE THAN `minOverlapPermille`/1000 of its
    * distinct n-grams appear in the eval set — the
    * overlap-percentage recipe (vs [[contaminated]]'s any-hit rule,
    * which a single boilerplate gram can trip). The gate compares in
    * exact integer math (n_hits·1000 > permille·n_grams — no float
    * ratio), same broadcast-gram shape: the eval gram set is
    * artifact-sized even at 100 TB corpus scale, the per-doc gram
    * frame is persisted because both the totals branch and the hits
    * branch fold it.
    *
    * Returns (idCol, n_grams, n_hits, contaminated) for every corpus
    * doc with at least one n-gram.
    */
  def contaminationFraction(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int,
      minOverlapPermille: Int = 500): DataFrame = {
    val evalGrams = gramSet(evalSet, idCol, textCol, n).select("g").distinct()
    val grams = SketchRegistry.track(
      gramSet(corpus, idCol, textCol, n).persist())
    val totals = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val hits = grams.join(broadcast(evalGrams), "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated",
        col("n_hits") * 1000L > lit(minOverlapPermille.toLong) * col("n_grams"))
  }

  /** The corpus with contaminated docs removed (broadcast anti join —
    * the shape a 100 TB decontamination pass actually runs).
    */
  def clean(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = gramSet(evalSet, idCol, textCol, n).select("g").distinct()
    val hit = gramSet(corpus, idCol, textCol, n)
      .join(broadcast(evalGrams), "g")
      .select(idCol).distinct()
    corpus.join(hit, Seq(idCol), "left_anti")
  }

  /** Cross-source n-gram contamination matrix: for every pair of
    * sources, how many DISTINCT n-grams they share, with each side's
    * distinct-gram total for normalization (shared/min(n_a,n_b) is the
    * usual containment score) — the corpus-curation audit that answers
    * "how much of source B is already in source A" before mixing.
    *
    * Scale shape: the (source, gram) projection dedups map-side-first
    * into one shuffle; the pair join is keyed by gram and each gram
    * contributes at most |sources|² rows regardless of its document
    * frequency, so a hot gram cannot explode the join; per-source
    * totals are a |sources|-row broadcast. All counts are exact
    * integers.
    */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String, n: Int): DataFrame = {
    // persisted (SketchRegistry-tracked): the totals branch and both
    // sides of the pair join read this — without the pin each of the
    // three consumers would re-scan and re-shingle the corpus
    val grams = SketchRegistry.track(df
      .select(col(srcCol).as("src"), explode(distinctShingles(col(textCol), n)).as("gram"))
      .select(col("src"), md5(col("gram")).as("g"))
      .distinct()
      .persist())
    val totals = grams.groupBy(col("src")).agg(count(lit(1)).as("n"))
    grams.toDF("src_a", "g")
      .join(grams.toDF("src_b", "g"), "g")
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(totals.toDF("src_a", "n_a")), "src_a")
      .join(broadcast(totals.toDF("src_b", "n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared"), col("n_a"), col("n_b"))
  }
}
