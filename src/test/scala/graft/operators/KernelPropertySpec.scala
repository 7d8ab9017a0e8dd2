package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{MinHashSignatureExpr, PqEncodeExpr, RabinFingerprintExpr, ZorderExpr}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the custom Catalyst kernels (beyond-parity:
  * the reference tests only golden examples). All properties drive the
  * interpreted `eval` path directly — hundreds of random cases with no
  * Spark jobs — and each kernel's eval==codegen agreement is already
  * pinned by its own spec, so these properties transfer to codegen.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, cases: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(r.passed, r.status.toString)
  }

  private val longArrRef = BoundReference(0, ArrayType(LongType), nullable = false)

  test("zorder: componentwise <= implies unsigned-lex byte order <=") {
    // Morton order preserves dominance: if a <= a' and b <= b' then
    // z(a,b) <= z(a',b') — the data-skipping property OPTIMIZE relies on.
    val g = Gen.choose(Long.MinValue, Long.MaxValue)
    check(Prop.forAll(g, g, Gen.choose(0L, 1L << 40), Gen.choose(0L, 1L << 40)) {
      (a, b, da, db) =>
        val aHi = if (a > Long.MaxValue - da) Long.MaxValue else a + da
        val bHi = if (b > Long.MaxValue - db) Long.MaxValue else b + db
        def z(x: Long, y: Long): Array[Byte] =
          ZorderExpr(Seq(Literal(x), Literal(y))).eval(null).asInstanceOf[Array[Byte]]
        java.util.Arrays.compareUnsigned(z(a, b), z(aHi, bHi)) <= 0
    })
  }

  test("minhash: signature of a union is the slotwise min of signatures") {
    val hashes = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    def sig(xs: Seq[Long]): Seq[Long] =
      MinHashSignatureExpr(longArrRef, 32)
        .eval(InternalRow(ArrayData.toArrayData(xs.toArray)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
    check(Prop.forAll(hashes, hashes) { (a, b) =>
      sig(a ++ b) == sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    })
  }

  test("minhash: identical sets agree on every slot, permutation-invariant") {
    val hashes = Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))
    def sig(xs: Seq[Long]): Seq[Long] =
      MinHashSignatureExpr(longArrRef, 16)
        .eval(InternalRow(ArrayData.toArrayData(xs.toArray)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
    check(Prop.forAll(hashes) { a => sig(a) == sig(scala.util.Random.shuffle(a)) })
  }

  test("rabin fingerprint equals the driver-side wrapping fold") {
    val hashes = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    check(Prop.forAll(hashes) { xs =>
      val got = RabinFingerprintExpr(longArrRef)
        .eval(InternalRow(ArrayData.toArrayData(xs.toArray)))
        .asInstanceOf[Long]
      got == xs.foldLeft(0L)((acc, h) => acc * 31L + h)
    })
  }

  test("pq encode: a vector equal to a centroid encodes to that centroid's id") {
    val dsub = 4
    val k = 8
    val m = 2
    // Centroids hold exactly-float-representable doubles so the match
    // distance is exactly 0; distinct arrays make the argmin unique.
    val centroid = Gen.listOfN(dsub, Gen.choose(-1000, 1000).map(_.toFloat))
    val codebookG = Gen.listOfN(k, centroid).map(_.map(_.map(_.toDouble).toArray).toArray)
      .suchThat(cb => cb.map(_.toSeq).distinct.length == k)
    val pick = Gen.choose(0, k - 1)
    check(Prop.forAll(codebookG, codebookG, pick, pick) { (cb1, cb2, i1, i2) =>
      val vec = (cb1(i1) ++ cb2(i2)).map(_.toFloat)
      val codes = PqEncodeExpr(
        BoundReference(0, ArrayType(FloatType), nullable = false),
        Array(cb1, cb2))
        .eval(InternalRow(ArrayData.toArrayData(vec)))
        .asInstanceOf[ArrayData].toIntArray().toSeq
      codes == Seq(i1, i2)
    }, cases = 100)
  }

  test("winnow kernel equals the naive all-windows reference, rightmost on ties") {
    import org.apache.spark.sql.graft.WinnowExpr
    val hashes = Gen.nonEmptyListOf(Gen.choose(0L, 0xFFFFFFFFL))
    val windows = Gen.choose(1, 8)
    def naive(hs: Seq[Long], w: Int): Seq[Long] = {
      val n = hs.length
      (0 to math.max(n - w, 0)).map { i =>
        val win = hs.slice(i, math.min(i + w, n))
        val m = win.min
        val pos = i + win.lastIndexOf(m)
        (pos.toLong << 32) | m
      }.distinct
    }
    check(Prop.forAll(hashes, windows) { (hs, w) =>
      val viaEval = WinnowExpr(longArrRef, w)
        .eval(InternalRow(ArrayData.toArrayData(hs.toArray)))
        .asInstanceOf[ArrayData].toLongArray().toSeq
      viaEval == naive(hs, w)
    })
  }

  test("span dedup invariants on a generated corpus") {
    val spark = graft.SparkFixture.spark
    import spark.implicits._
    val words = Vector("aa", "bb", "cc", "dd", "ee")
    val docG = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(words)).map(_.mkString(" ")))
    val corpus = Gen.listOfN(40, docG).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = corpus.toDF("doc_id", "text")
    val out = Dedup.spanDedupKeep(df, "doc_id", "text", spanTokens = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    val inSpans = corpus.flatMap { case (_, t) =>
      t.split(" ").grouped(3).filter(_.length == 3).map(_.mkString(" "))
    }
    // (1) every doc appears exactly once; (2) 0 <= n_dropped <= n_spans;
    // (3) kept span occurrences == number of DISTINCT span texts
    //     (first occurrence survives, all other copies cut).
    assert(out.length == corpus.length)
    assert(out.forall { case (_, _, nSpans, nDropped) =>
      nDropped >= 0 && nDropped <= nSpans })
    val totalKept = out.map { case (_, _, nSpans, nDropped) => nSpans - nDropped }.sum
    assert(totalKept == inSpans.distinct.length,
      s"kept $totalKept spans, expected ${inSpans.distinct.length} distinct")
  }
}
