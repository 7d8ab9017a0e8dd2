package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity matching (record linkage) by blocked edit distance:
  * candidates share at least one RARE token (df ≤ `dfCap`), so the
  * pair space is Σ df² over rare tokens — never |corpus|² — and the
  * Levenshtein scalar (the expensive part) runs once per DISTINCT
  * candidate pair after the block join. The blocking recall bound is
  * explicit: near names sharing no token are out by design (raise
  * recall with more aggressive normalization, not a wider join).
  *
  * Both [[pairs]] (within-corpus, d70) and [[matchesAgainst]] (probe
  * vs corpus — the ingest-time serving half) keep the same block:
  * tokens explode map-side, the only pair stage is the equi join on
  * the token, and `distinct` collapses multi-token agreements before
  * the distance is computed.
  */
object FuzzyMatch {

  /** Within-corpus match pairs (key_a < key_b, dist ≤ maxDist). */
  def pairs(parts: DataFrame, idCol: String, nameCol: String,
      dfCap: Int = 25, maxDist: Int = 2): DataFrame = {
    val toks = parts.select(col(idCol), col(nameCol),
      explode(split(col(nameCol), " ")).as("tok"))
    val rare = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") <= dfCap).select(col("tok"))
    val r = toks.join(rare, Seq("tok"))
    val a = r.select(col("tok"), col(idCol).as("key_a"),
      col(nameCol).as("name_a"))
    val b = r.select(col("tok"), col(idCol).as("key_b"),
      col(nameCol).as("name_b"))
    a.join(b, Seq("tok"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("key_a"), col("key_b"), col("dist"))
  }

  /** Probe names vs a static corpus — the serving half: the corpus'
    * rare-token block index is computed once (df stats over the
    * CORPUS, so gate decisions don't drift with probe traffic); each
    * probe explodes into its tokens and equi-joins the index. Returns
    * (probe_key, corpus_key, dist) per matched pair.
    */
  def matchesAgainst(probe: DataFrame, corpus: DataFrame,
      idCol: String, nameCol: String,
      dfCap: Int = 25, maxDist: Int = 2): DataFrame = {
    val ctoks = corpus.select(col(idCol).as("corpus_key"),
      col(nameCol).as("corpus_name"),
      explode(split(col(nameCol), " ")).as("tok"))
    val rare = ctoks.groupBy(col("tok")).agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") <= dfCap).select(col("tok"))
    val blocked = ctoks.join(rare, Seq("tok"))
    probe.select(col(idCol).as("probe_key"), col(nameCol).as("probe_name"),
        explode(split(col(nameCol), " ")).as("tok"))
      .join(blocked, Seq("tok"))
      .select(col("probe_key"), col("probe_name"),
        col("corpus_key"), col("corpus_name"))
      .distinct()
      .withColumn("dist",
        levenshtein(col("probe_name"), col("corpus_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("probe_key"), col("corpus_key"), col("dist"))
  }
}
