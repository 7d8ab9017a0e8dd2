package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with Rademacher (±1) signs
  * (Achlioptas, "Database-friendly random projections", PODS 2001):
  * p_j = Σ_i v_i·s_ij compresses a d_in-dim embedding to d_out
  * components while approximately preserving pairwise geometry — the
  * cheap dimensionality-reduction pass run before ANN indexing /
  * clustering when the encoder's native width is overkill (SimHash is
  * this construction's 1-bit-per-projection cousin; this keeps real
  * values).
  *
  * Determinism contract: the sign matrix derives from MD5 of
  * "seed:i:j" (first-byte parity), computed ONCE driver-side and
  * embedded as plan literals — no per-row hashing; the projection
  * folds v_i·s_ij in ascending i order and quantizes ONCE to integer
  * micro units, so a SQL engine replays every double op bit-for-bit
  * (v42's oracle inlines the same matrix).
  *
  * 100 TB shape: pure map-side — one codegen'd zip_with/aggregate
  * fold per output component, no shuffle, no UDF; the matrix is
  * d_out×d_in ints riding in the plan (≤ a few KB).
  */
object RandomProjection {

  /** The deterministic ±1 matrix, indexed [j][i] (output × input). */
  def signMatrix(dIn: Int, dOut: Int, seed: String = "rp"): Array[Array[Int]] =
    Array.tabulate(dOut, dIn) { (j, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((d(0) & 1) == 0) 1 else -1
    }

  /** Array of d_out projected components in integer micro units:
    * floor(1e6 · Σ_i v_i·s_ij), folded in ascending i.
    */
  def projectMicro(vec: Column, signs: Array[Array[Int]]): Column =
    array(signs.map { row =>
      val prods = zip_with(vec, typedlit(row.map(_.toDouble)),
        (a, b) => a.cast("double") * b)
      floor(aggregate(prods, lit(0.0), (acc, x) => acc + x) * 1000000.0)
        .cast("long")
    }.toSeq: _*)

  /** Project a whole frame: (idCol, proj array<long> of d_out micro
    * components).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      dIn: Int, dOut: Int, seed: String = "rp"): DataFrame =
    df.select(col(idCol), projectMicro(col(vecCol),
      signMatrix(dIn, dOut, seed)).as("proj"))
}
