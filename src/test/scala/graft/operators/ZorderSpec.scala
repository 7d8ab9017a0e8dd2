package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ZorderBytes
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class ZorderSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  test("interleave: equal-width ints produce the classic Morton order") {
    // two 1-byte dims: key(x, y) bits are x7 y7 x6 y6 ...
    def key(x: Int, y: Int): Array[Byte] =
      ZorderBytes.interleave(
        Array(ZorderBytes.normalize(x.toByte, org.apache.spark.sql.types.ByteType),
          ZorderBytes.normalize(y.toByte, org.apache.spark.sql.types.ByteType)),
        Array(1, 1))
    // (0,0) < (0,1) < (1,0)? Morton: (1,0) interleaves to 0b10, (0,1) to 0b01
    assert(unsignedCompare(key(0, 0), key(0, 1)) < 0)
    assert(unsignedCompare(key(0, 1), key(1, 0)) < 0)
    assert(unsignedCompare(key(1, 0), key(1, 1)) < 0)
    // locality: (3,3) sorts before (0,16): high bits dominate both dims
    assert(unsignedCompare(key(3, 3), key(0, 16)) < 0)
  }

  test("normalization orders negatives before positives for every numeric type") {
    import org.apache.spark.sql.types._
    // normalized values compare UNSIGNED (they are bit patterns for the key)
    def lt(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0
    assert(lt(ZorderBytes.normalize(-1, IntegerType), ZorderBytes.normalize(1, IntegerType)))
    assert(ZorderBytes.normalize(Int.MinValue, IntegerType) == 0L)
    assert(lt(ZorderBytes.normalize(-1L, LongType), ZorderBytes.normalize(0L, LongType)))
    assert(lt(ZorderBytes.normalize(-1.5f, FloatType), ZorderBytes.normalize(-0.5f, FloatType)))
    assert(lt(ZorderBytes.normalize(-0.5f, FloatType), ZorderBytes.normalize(0.5f, FloatType)))
    assert(lt(ZorderBytes.normalize(-2.0, DoubleType), ZorderBytes.normalize(1.0, DoubleType)))
    assert(lt(ZorderBytes.normalize((-5).toShort, ShortType), ZorderBytes.normalize(5.toShort, ShortType)))
  }

  test("heterogeneous widths interleave all bits (output length = sum of widths)") {
    val k = ZorderBytes.interleave(Array(0xFFFFFFFFL, 0xFFL), Array(4, 1))
    assert(k.length == 5)
    assert(k.forall(_ == -1.toByte), "all-ones inputs must produce all-ones key")
  }

  test("expression: eval and codegen agree, and sorting clusters both dims") {
    val df = spark.range(0, 4096).select(
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))
    val keyed = df.select(col("x"), col("y"), ZorderBytes.zorder(col("x"), col("y")).as("z"))
    // codegen vs interpreted: compare a sample row computed both ways
    val sample = keyed.filter(col("x") === 63 && col("y") === 63).head()
    val interp = ZorderBytes.interleave(
      Array(ZorderBytes.normalize(63, org.apache.spark.sql.types.IntegerType),
        ZorderBytes.normalize(63, org.apache.spark.sql.types.IntegerType)),
      Array(4, 4))
    assert(sample.getAs[Array[Byte]]("z").sameElements(interp))

    // clustering quality: chunk the z-sorted order into 64-row blocks;
    // the average per-block range of EACH dimension must be far below
    // the 64-value domain (a single-column sort leaves the other
    // dimension's range at ~full domain).
    val sorted = keyed.orderBy(col("z")).select(col("x"), col("y")).collect()
    val blocks = sorted.grouped(64).toSeq
    def avgRange(f: Row => Int): Double =
      blocks.map(b => b.map(f).max - b.map(f).min).sum.toDouble / blocks.size
    val rx = avgRange(_.getInt(0))
    val ry = avgRange(_.getInt(1))
    assert(rx < 20, s"x range per block $rx — not clustered")
    assert(ry < 20, s"y range per block $ry — not clustered")
  }

  test("null and string handling") {
    val df = Seq((Some(1), "apple"), (None, "banana"), (Some(2), "")).toDF("n", "s")
    val rows = df.select(ZorderBytes.zorder(col("n"), col("s")).as("z")).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Array[Byte]]("z").length == 12)) // 4 + 8 bytes
  }

  test("ZorderOptimize.cluster produces a z-locality layout") {
    val df = spark.range(0, 4096).select(
      (col("id") % 64).cast("int").as("x"), (col("id") / 64).cast("int").as("y"))
    val clustered = ZorderOptimize.cluster(df, Seq(col("x"), col("y")))
    assert(clustered.count() == 4096)
  }

  test("z-ordered parquet skips row groups for multi-dimensional filters") {
    // many small row groups so min/max stats have pruning power
    val dir = java.nio.file.Files.createTempDirectory("graft_zskip").toString
    // hash-derived coords: row order carries NO locality, so the plain
    // file's row-group min/max stats cover the full domain (no pruning)
    val df = spark.range(0, 500000).select(
      pmod(xxhash64(col("id")), lit(700)).cast("int").as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(700)).cast("int").as("y"))
    // 100 files each: plain randomly partitioned (every file's min/max
    // covers the full domain), z-ordered range-partitioned on the key
    // (each file covers a small hyper-rectangle)
    df.repartition(100).write.parquet(s"$dir/plain")
    val zkey = org.apache.spark.sql.graft.ZorderBytes.zorder(col("x"), col("y"))
    df.repartitionByRange(100, zkey).sortWithinPartitions(zkey)
      .write.parquet(s"$dir/zorder")

    // the scan metric counts rows surviving footer-stats pruning
    def rowsReadAfterPruning(path: String): Long = {
      val q = spark.read.parquet(path).filter(col("x") === 7 && col("y") === 7)
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    }
    val plain = rowsReadAfterPruning(s"$dir/plain")
    val zordered = rowsReadAfterPruning(s"$dir/zorder")
    // identical results, far fewer rows surface from the z-ordered scan
    assert(zordered * 5 < plain,
      s"z-order skipping ineffective: zordered=$zordered plain=$plain")
  }
}
