package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.ZorderBytes
import org.apache.spark.sql.types.IntegerType

import graft.core.ArrayFetchIterator
import graft.operators.{Scored, TopKAggregator}

/** Property checks for the pure algebraic kernels (no SparkSession):
  * z-order key laws, fetch-iterator model conformance, top-k
  * aggregator merge laws. Seeded exhaustive-ish sampling (fixed seed,
  * 500 cases per law) keeps the checks deterministic.
  */
class PropertySpec extends AnyFunSuite {

  private def cases(seed: Long)(f: scala.util.Random => Unit): Unit = {
    val rng = new scala.util.Random(seed)
    (1 to 500).foreach(_ => f(rng))
  }

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private def key2(x: Int, y: Int): Array[Byte] =
    ZorderBytes.interleave(
      Array(ZorderBytes.normalize(x, IntegerType), ZorderBytes.normalize(y, IntegerType)),
      Array(4, 4))

  test("zorder: per-dimension monotonic when the other dimension is fixed") {
    cases(1) { rng =>
      val a = rng.nextInt(); val b = rng.nextInt(); val y = rng.nextInt()
      if (a != b) {
        val (lo, hi) = if (a < b) (a, b) else (b, a)
        assert(unsignedCompare(key2(lo, y), key2(hi, y)) < 0, s"($lo,$hi,$y)")
        assert(unsignedCompare(key2(y, lo), key2(y, hi)) < 0, s"y-dim ($lo,$hi,$y)")
      }
    }
  }

  test("zorder: key equality iff coordinate equality") {
    cases(2) { rng =>
      val x1 = rng.nextInt(2000) - 1000; val y1 = rng.nextInt(2000) - 1000
      val x2 = rng.nextInt(2000) - 1000; val y2 = rng.nextInt(2000) - 1000
      val same = unsignedCompare(key2(x1, y1), key2(x2, y2)) == 0
      assert(same == (x1 == x2 && y1 == y2), s"($x1,$y1) vs ($x2,$y2)")
    }
  }

  test("fetch iterator: fetchAbsolute conforms to an index model") {
    cases(3) { rng =>
      val xs = Array.fill(rng.nextInt(20))(rng.nextInt(100))
      val pos = rng.nextLong() % 30 - 5
      val it = new ArrayFetchIterator[Int](xs)
      it.fetchAbsolute(pos)
      val expectedStart = math.max(0L, math.min(pos, xs.length.toLong))
      assert(it.getFetchStart == expectedStart)
      assert(it.toSeq == xs.toSeq.drop(expectedStart.toInt), s"pos=$pos n=${xs.length}")
    }
  }

  test("top-k aggregator: any split/merge order yields the global top-k") {
    val agg = new TopKAggregator(5)
    cases(4) { rng =>
      val scored = List.fill(rng.nextInt(30))(
        Scored(rng.nextInt(50).toLong, (rng.nextInt(41) - 20) / 2.0))
      val (l, r) = scored.splitAt(rng.nextInt(scored.length + 1))
      val viaMerge = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val direct = scored.sortWith((a, b) =>
        a.sim > b.sim || (a.sim == b.sim && a.neighbor_id < b.neighbor_id)).take(5)
      assert(viaMerge == direct, s"split at ${l.length} of ${scored.length}")
    }
  }
}
