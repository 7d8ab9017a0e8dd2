package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Corpus-LM scoring ops: DSIR importance weights and the unigram
  * log-prob gate. Weights are checked against a from-first-principles
  * Scala recomputation on a tiny hand corpus (the driver gate checks
  * the fixtures against DuckDB).
  */
class CorpusLmSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the cat sat", true), // target slice
    (1L, "the cat ran", true),
    (2L, "dog dog dog", false),
    (3L, "the cat sat", false), // identical to doc 0 → identical weight
    (4L, "qq zz", false))
    .toDF("doc_id", "text", "is_t")

  test("DSIR weights rank target-like docs first, identical docs tie") {
    val out = CorpusLm.importanceWeights(
        docs, "doc_id", "text", isTarget = col("is_t"), nBuckets = 16, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 5)
    val w = out.toMap
    // identical text → identical feature multiset → identical weight
    assert(w(0L) == w(3L))
    // target-slice vocab outranks the off-distribution docs
    assert(w(0L) > w(2L) && w(0L) > w(4L))
    // output is ordered weight desc, id asc
    assert(out.sortBy { case (id, wt) => (-wt, id) }.toSeq == out.toSeq)
  }

  test("DSIR weight matches a first-principles recomputation") {
    def feats(text: String): Seq[String] = {
      val t = text.trim.split(" +").toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(f: String, n: Int): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(md.take(4), 16) % n
    }
    val rows = docs.select("doc_id", "text", "is_t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val all = rows.flatMap { case (id, tx, t) => feats(tx).map(f => (id, bucket(f, 16), t)) }
    val byB = all.groupBy(_._2)
    val totT = all.count(_._3).toLong
    val totR = all.length.toLong
    def lnMicro(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) * 1000000.0).toLong
    val score = byB.map { case (b, fs) =>
      b -> (lnMicro(fs.count(_._3) + 1L, totT + 16) - lnMicro(fs.length + 1L, totR + 16))
    }
    val expected = rows.map { case (id, tx, _) =>
      id -> feats(tx).map(f => score(bucket(f, 16))).sum
    }.toMap
    val got = CorpusLm.importanceWeights(
        docs, "doc_id", "text", isTarget = col("is_t"), nBuckets = 16, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.toSeq.sortBy { case (id, w) => (-w, id) }.take(5).toMap)
  }

  test("unigram log-prob sums MLE micro-nats and gates on the exact integer mean") {
    val out = CorpusLm.unigramLogProb(docs, "doc_id", "text", meanLpMicroFloor = -1700000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // corpus = 14 tokens: the×3 cat×3 sat×2 ran dog×3 qq zz
    def lp(cnt: Long) = math.floor(math.log(cnt / 14.0) * 1000000.0).toLong
    assert(out(0L) == ((3L, lp(3) + lp(3) + lp(2), (lp(3) + lp(3) + lp(2)) > -1700000L * 3)))
    assert(out(2L) == ((3L, 3 * lp(3), (3 * lp(3)) > -1700000L * 3)))
    // rare-token doc scores the lowest mean and fails a tight gate
    val (nTok, sum4, keep4) = out(4L)
    assert(nTok == 2L && sum4 == 2 * lp(1) && !keep4)
    assert(out(0L)._3, "common-token doc should clear the gate")
  }

  test("bigram log-prob: MLE from adjacent pairs, order-sensitive, exact gate") {
    val corpus = Seq(
      (0L, "the cat sat"),
      (1L, "the cat ran"),
      (2L, "sat the the"),
      (3L, "solo")) // single token: no pairs, vacuous keep
      .toDF("doc_id", "text")
    def f(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) * 1000000.0).toLong
    // bigrams: (the,cat):2 (cat,sat):1 (cat,ran):1 (sat,the):1 (the,the):1
    // contexts: the:3  cat:2  sat:1
    val out = CorpusLm.bigramLogProb(corpus, "doc_id", "text",
        meanLpMicroFloor = -600000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val a = f(2, 3) + f(1, 2) // doc 0: lp(cat|the)+lp(sat|cat)
    val b = f(2, 3) + f(1, 2) // doc 1: lp(cat|the)+lp(ran|cat)
    val c = f(1, 1) + f(1, 3) // doc 2: lp(the|sat)+lp(the|the)
    assert(out(0L) == ((2L, a, a > -600000L * 2)), out(0L))
    assert(out(1L) == ((2L, b, b > -600000L * 2)), out(1L))
    assert(out(2L) == ((2L, c, c > -600000L * 2)), out(2L))
    assert(out(3L) == ((0L, 0L, true)), "pairless doc passes vacuously")
    // order sensitivity: same tokens, scrambled order → unseen-context
    // pairs get different (here: lower) probability than the fluent doc
    val scrambled = Seq((0L, "the cat sat"), (1L, "the cat sat"),
      (2L, "sat cat the")).toDF("doc_id", "text")
    val so = CorpusLm.bigramLogProb(scrambled, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(so(2L) < so(0L),
      s"scrambled word order must score below the fluent majority: $so")
  }

  test("sourceDriftKl is zero for a source matching the corpus distribution") {
    // both sources carry the exact same unigram distribution → every
    // log-ratio is ln(1) = 0 and the integer KL sum is exactly 0
    val corpus = Seq(
      (0L, "a", "x x y"), (1L, "a", "x"),
      (2L, "b", "x x y x")).toDF("doc_id", "source", "text")
    val out = CorpusLm.sourceDriftKl(corpus, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((4L, 0L)), out("a"))
    assert(out("b") == ((4L, 0L)), out("b"))
  }

  test("sourceDriftKl matches a first-principles recomputation and flags the drifted source") {
    val corpus = Seq(
      (0L, "a", "w w x x"), // 4 tokens, vocab shared with corpus blend
      (1L, "b", "z z z"))   // 3 tokens, disjoint vocab → drifted
      .toDF("doc_id", "source", "text")
    def f(num: Long, den: Long): Long =
      math.floor(math.log(num.toDouble / den.toDouble) * 1000000.0).toLong
    // N = 7; counts: w:2 x:2 (source a), z:3 (source b)
    val expA = 2 * f(2 * 7, 4 * 2) + 2 * f(2 * 7, 4 * 2)
    val expB = 3 * f(3 * 7, 3 * 3)
    val out = CorpusLm.sourceDriftKl(corpus, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((4L, expA)), s"${out("a")} vs ($expA)")
    assert(out("b") == ((3L, expB)), s"${out("b")} vs ($expB)")
    // normalized KL (kl_sum/n) ranks the disjoint-vocab source as more drifted
    assert(expB.toDouble / 3 > expA.toDouble / 4)
  }
}
