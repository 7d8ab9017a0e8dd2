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
        explode(array_distinct(shingles(col(textCol), n))).as("gram"))
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
}
