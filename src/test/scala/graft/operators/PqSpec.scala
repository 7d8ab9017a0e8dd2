package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkFixture, Tables}
import graft.queries.VectorQueries.{DIM, K_CODES, M_SUB}

class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val emb = Tables(spark, SparkFixture.sfDir).embeddings

  private lazy val codebooks =
    PqIndex.train(emb, "vec_id", "embedding", dim = DIM, m = M_SUB, k = K_CODES)

  test("codebooks have the right shape and finite centroids") {
    assert(codebooks.length == M_SUB)
    assert(codebooks.forall(_.length == K_CODES))
    assert(codebooks.forall(_.forall(_.length == DIM / M_SUB)))
    assert(codebooks.flatten.flatten.forall(v => !v.isNaN && !v.isInfinity))
  }

  test("encode emits one in-range code per subspace, deterministically") {
    val codes = emb.select(col("vec_id"),
      PqIndex.encode(col("embedding"), codebooks).as("codes"))
    val rows = codes.collect()
    assert(rows.forall(_.getSeq[Int](1).length == M_SUB))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < K_CODES)))
    val again = codes.collect()
    assert(rows.map(_.getSeq[Int](1)).toSeq == again.map(_.getSeq[Int](1)).toSeq)
  }

  test("ADC equals the dot product against the reconstructed (decoded) vector") {
    // PQ's defining identity: adc(q, codes(x)) == dot(q, decode(codes(x)))
    // where decode concatenates the selected centroids. Spot-check one
    // corpus vector against one query.
    val r = emb.filter(col("vec_id") === 1)
      .select(PqIndex.encode(col("embedding"), codebooks)).head().getSeq[Int](0)
    val reconstructed = r.toArray.zipWithIndex.flatMap { case (code, j) => codebooks(j)(code) }
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val expected = q.zip(reconstructed).foldLeft(0.0) { case (acc, (x, c)) => acc + x.toDouble * c }
    val got = PqIndex.pqTopK(
      emb.filter(col("vec_id") === 1), emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", codebooks, k = 1)
      .select(col("adc")).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-9, s"adc $got vs reconstructed dot $expected")
  }

  test("native PQ kernels are bit-identical to the composed HOF forms") {
    import graft.functions.VectorFunctions.{dot, l2Sq}
    // The HOF forms the native expressions replaced (argmin via
    // array_max of (-l2Sq, idx) structs; LUT via per-centroid dot
    // folds; ADC via a sequence fold) — kept here as the semantic
    // specification the kernels must reproduce bit-for-bit, since the
    // DuckDB oracle mirrors this exact double fold order.
    val dsub = DIM / M_SUB
    def hofEncode(vec: org.apache.spark.sql.Column) =
      array(codebooks.zipWithIndex.map { case (cb, j) =>
        val sub = slice(vec, j * dsub + 1, dsub)
        val scored = cb.zipWithIndex.map { case (c, i) =>
          struct((-l2Sq(sub, array(c.map(lit): _*))).as("nd"), lit(i).as("idx"))
        }
        array_max(array(scored: _*)).getField("idx")
      }: _*)
    def hofLut(qv: org.apache.spark.sql.Column) =
      array(codebooks.zipWithIndex.map { case (cb, j) =>
        array(cb.map(c =>
          dot(slice(qv, j * dsub + 1, dsub), array(c.map(lit): _*))): _*)
      }: _*)
    def hofAdc(lut: org.apache.spark.sql.Column, codes: org.apache.spark.sql.Column) =
      aggregate(sequence(lit(1), lit(M_SUB)), lit(0.0),
        (acc, j) => acc + element_at(element_at(lut, j), element_at(codes, j) + 1))

    val sample = emb.filter(col("vec_id") < 50)
    val cmp = sample.select(
      PqIndex.encode(col("embedding"), codebooks).as("codes"),
      hofEncode(col("embedding")).as("codes_hof"),
      PqIndex.lookupTable(col("embedding"), codebooks).as("lt"),
      hofLut(col("embedding")).as("lt_hof"))
    val rows = cmp.withColumn("adc", PqIndex.adcDot(col("lt"), col("codes"), M_SUB))
      .withColumn("adc_hof", hofAdc(col("lt_hof"), col("codes_hof")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), "encode mismatch vs HOF form")
      val lt = r.getSeq[scala.collection.Seq[Double]](2)
      val ltHof = r.getSeq[scala.collection.Seq[Double]](3)
      assert(lt.flatten.map(java.lang.Double.doubleToLongBits) ==
        ltHof.flatten.map(java.lang.Double.doubleToLongBits), "LUT not bit-identical")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(5)), "ADC not bit-identical")
    }
  }

  test("native PQ kernels: interpreted eval matches codegen") {
    import org.apache.spark.sql.graft.{PqAdcExpr, PqEncodeExpr, PqLutExpr}
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val vecs = emb.filter(col("vec_id") < 20).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    val ref = BoundReference(0, ArrayType(FloatType), nullable = false)
    vecs.foreach { v =>
      val row = InternalRow(ArrayData.toArrayData(v))
      val encE = PqEncodeExpr(ref, codebooks)
      val lutE = PqLutExpr(ref, codebooks)
      val codes = encE.eval(row).asInstanceOf[ArrayData]
      val lut = lutE.eval(row).asInstanceOf[ArrayData]
      val adcE = PqAdcExpr(Literal(lut, lutE.dataType),
        Literal(codes, encE.dataType))
      // Interpreted projections above; codegen'd ones via a projection
      // that forces the generated path.
      val proj = org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
        .generate(Seq(encE, lutE, adcE))
      val out = proj(row)
      assert(out.getArray(0).toIntArray().toSeq == codes.toIntArray().toSeq)
      val lutCg = out.getArray(1)
      (0 until lut.numElements()).foreach { j =>
        assert(lutCg.getArray(j).toDoubleArray().map(java.lang.Double.doubleToLongBits).toSeq ==
          lut.getArray(j).toDoubleArray().map(java.lang.Double.doubleToLongBits).toSeq)
      }
      assert(java.lang.Double.doubleToLongBits(out.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(adcE.eval(row).asInstanceOf[Double]))
    }
  }

  test("SDC equals a code-table recomputation and agrees with ADC on code-identical pairs") {
    val sample = emb.filter(col("vec_id") < 60)
    val queries = emb.filter(col("vec_id") < 4)
    val got = PqIndex.sdcTopK(sample, queries, "vec_id", "embedding", codebooks, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    // recompute from collected codes + the m×k×k dot table in plain Scala
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val table = codebooks.map(cb => cb.map(a => cb.map(b => dot(a, b))))
    val codes = sample.select(col("vec_id"),
      PqIndex.encode(col("embedding"), codebooks).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val expected = (for {
      q <- codes.keys if q < 4
      ranked = codes.iterator.filter(_._1 != q).map { case (n, nc) =>
        val s = (0 until M_SUB).foldLeft(0.0)((acc, j) => acc + table(j)(codes(q)(j))(nc(j)))
        (n, s)
      }.toSeq.sortBy { case (n, s) => (-s, n) }.take(3)
      ((n, _), i) <- ranked.zipWithIndex
    } yield (q, n, i + 1)).toSet
    assert(got == expected, s"got ${got.size} expected ${expected.size}")
    assert(got.nonEmpty)
  }

  test("PQ top-k recall against exact dot ranking is usable") {
    val queries = emb.filter(col("vec_id") < 5)
    val approx = PqIndex.pqTopK(emb, queries, "vec_id", "embedding", codebooks, k = 5)
    assert(approx.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
    val exact = SimilaritySearch.dotTopK(emb, queries, "vec_id", "embedding", k = 5)
    val recall = SimilaritySearch.recallAtK(approx, exact, 5)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(recall >= 0.2, s"PQ recall collapsed: $recall")
  }
}
