package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.spark
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  import spark.implicits._

  /** The d56 pre-round-13 form: per distinct token, recount the full
    * array — O(distinct·n) per doc. Kept here as the correctness and
    * timing reference for the linear fold.
    */
  private def entropyTermsNaive(toks: org.apache.spark.sql.Column) =
    aggregate(array_distinct(toks), lit(0L), (acc, x) => {
      val c = size(filter(toks, y => y === x)).cast("long")
      acc + c * floor(log(c.cast("double")) * 1000000).cast("long")
    })

  test("entropyTermsMicro matches the naive distinct-recount fold, including edge docs") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog the end",
      "a a a a a a a a",                       // single distinct token
      "x",                                     // one token
      "",                                      // split("") -> [""]
      "b a b a c c c a",                       // interleaved runs
      "uniq1 uniq2 uniq3 uniq4 uniq5",         // all distinct
      " padded   tokens  here ").toDF("text")
    val both = docs
      .select(tokens(col("text")).as("t"))
      .select(entropyTermsMicro(col("t")).as("fast"),
        entropyTermsNaive(col("t")).as("slow"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("entropyTermsMicro matches naive on random documents") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 50).map(i => s"w$i")
    val docs = (0 until 200).map { _ =>
      (0 until (1 + rnd.nextInt(120))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toDF("text")
    val both = docs
      .select(tokens(col("text")).as("t"))
      .select(entropyTermsMicro(col("t")).as("fast"),
        entropyTermsNaive(col("t")).as("slow"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("microbench: linear fold beats the quadratic recount on long high-diversity docs") {
    // 40 docs × 8k tokens, ~6.4k distinct each: the naive form pays
    // distinct·n ≈ 5·10⁷ comparisons per doc.
    val rnd = new scala.util.Random(7)
    val docs = (0 until 40).map { _ =>
      (0 until 8000).map(_ => s"tok${rnd.nextInt(20000)}").mkString(" ")
    }.toDF("text").select(tokens(col("text")).as("t"))
    docs.cache().count()
    def time(c: org.apache.spark.sql.Column): (Long, Long) = {
      val t0 = System.nanoTime()
      val s = docs.select(sum(c).as("s")).collect()(0).getLong(0)
      (s, (System.nanoTime() - t0) / 1000000)
    }
    try {
      val (fastSum, fastMs) = time(entropyTermsMicro(col("t")))
      val (slowSum, slowMs) = time(entropyTermsNaive(col("t")))
      assert(fastSum == slowSum)
      info(s"linear fold: ${fastMs} ms, quadratic recount: ${slowMs} ms")
      assert(fastMs < slowMs,
        s"linear fold ($fastMs ms) must beat the quadratic recount ($slowMs ms)")
    } finally docs.unpersist()
  }

  test("zipf slope is NULL (not engine-divergent) for a single-distinct-token source") {
    // x = floor(ln 1 · 1e3) = 0 for every rank-1-only source, so the
    // regression denominator is 0: Spark's non-ANSI divide nulls where
    // DuckDB's IEEE double divide would inf — the nullif guard keeps
    // both engines at NULL.
    val docs = Seq(
      ("degenerate", "same same same same"),
      ("healthy", "a b b c c c d d d d e e e e e")).toDF("source", "text")
    val rows = graft.operators.CorpusLm.zipfSlope(docs, "source", "text")
      .orderBy("source").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "degenerate" && rows(0).isNullAt(2), rows(0))
    assert(rows(1).getString(0) == "healthy" && !rows(1).isNullAt(2), rows(1))
    assert(math.abs(rows(1).getDouble(2) + 1.0) < 1.0, rows(1)) // near Zipf's -1
  }
}
