package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, written as
  * pure Catalyst higher-order functions (zip_with / aggregate) with no
  * UDF boundary. Accumulation is in double.
  *
  * The hot one — [[cosine]] — routes through the native
  * [[org.apache.spark.sql.graft.CosineExpr]] kernel: HOFs evaluate
  * interpreted (outside whole-stage codegen) and dominate pair-join
  * stages that score 100k+ candidate pairs. The kernel reproduces
  * [[cosineHof]]'s fold order bit-for-bit (VecKernelSpec pins it), so
  * every oracle built against the HOF form still matches exactly.
  */
object VectorFunctions {

  /** Dot product of two equal-length vectors (native kernel; the HOF
    * twin below is VecKernelSpec's bit-identity reference).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VecExpr.dot(a, b)

  /** The composed-HOF dot the kernel replaced — spec reference. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; 0 for zero-norm inputs (native codegen kernel). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VecExpr.cosine(a, b)

  /** The composed-HOF cosine the kernel replaced — kept as the
    * bit-identity reference (VecKernelSpec compares the two on every
    * path the queries use).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Squared L2 distance (native kernel; HOF twin below is the spec
    * reference).
    */
  def l2Sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VecExpr.l2Sq(a, b)

  /** The composed-HOF squared-L2 the kernel replaced — spec reference. */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double")
      diff * diff
    }), lit(0.0), (acc, x) => acc + x)

  /** The deterministic pseudo-random hyperplane family for
    * [[hyperplaneBucket]] — also dumped by graft.Verify so the DuckDB
    * oracle can recompute the bucketing independently.
    */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit LSH bucket id from `nPlanes` fixed pseudo-random
    * hyperplanes. Planes are generated deterministically from `seed`
    * on the driver and inlined as literals — at scale they broadcast
    * with the plan, never shuffled.
    */
  def hyperplaneBucket(v: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val planes = hyperplanes(dim, nPlanes, seed)
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(x => lit(x)): _*)
      when(dot(v, planeCol) >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
