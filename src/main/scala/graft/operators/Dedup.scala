package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus deduplication operators, designed for 100 TB scale:
  *
  *  - exact: one hash-shuffle on a 16-byte fingerprint (never on the
  *    full text), then min-id per group.
  *  - MinHash + LSH: signatures computed map-side as pure expressions,
  *    candidate generation via an explode-on-band-key self-join — the
  *    classic shingle→minhash→band→bucket-join pipeline. Only docs
  *    sharing a band collide; the join key is (band, 64-bit hash) so
  *    bucket sizes stay tiny and skew-resistant.
  *  - SimHash: 64-bit fingerprint, candidates via 4×16-bit band match,
  *    verified by Hamming distance.
  *  - n-gram Jaccard: exact verification on candidate pairs via
  *    shingle-set intersection sizes (explode + count), used standalone
  *    or as the verify stage after LSH.
  *
  * All stages are DataFrame transforms — no driver-side loops, no
  * collect; every shuffle key is a fixed-width hash.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint (md5 of normalized
    * text), keep the lowest id. Returns (fp, n_copies, keeper).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), contentFingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper"))

  /** Rows surviving exact dedup (the keepers only). */
  def exactKeep(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exactGroups(df, idCol, textCol)
      .select(col("keeper").as(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** MinHash-LSH candidate pairs with their estimated (signature-
    * agreement) similarity. `threshold` filters on the fraction of the
    * k minhashes that agree — an unbiased Jaccard estimate.
    *
    * numHashes = bands * rowsPerBand.
    */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = df
      .select(col(idCol).as("id"),
        minhashSignature(shingles(col(textCol), shingleSize), k).as("sig"))
    val banded = sigs
      .select(col("id"), col("sig"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(k))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash near-dup pairs: fingerprint, band on 4×16-bit slices,
    * verify Hamming distance <= maxHamming.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df
      .withColumn("th", transform(tokens(col(textCol)), t => xxhash64(t)))
      .select(col(idCol).as("id"), simhash64OfHashes(col("th")).as("sim"))
    val banded = fp.select(col("id"), col("sim"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sim"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity for all pairs sharing at least one
    * shingle. At scale, feed LSH candidates instead of the full corpus;
    * the shape (explode → self-join on shingle-hash → count) is the
    * same. Shingles are joined by 64-bit hash, never by string.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val exploded = sh.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("sh_hash"))
    val shared = exploded.as("a")
      .join(exploded.as("b"),
        col("a.sh_hash") === col("b.sh_hash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("jaccard",
        col("n_shared").cast("double") /
          (col("sa.n") + col("sb.n") - col("n_shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_shared"), col("jaccard"))
  }
}
