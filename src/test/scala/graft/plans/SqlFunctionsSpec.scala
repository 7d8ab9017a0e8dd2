package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** SQL bindings for the pipeline kernels (injected by
  * [[GraftSparkExtension]]): every `spark.sql` caller — JDBC, Trino,
  * batch scripts — can reach the corpus primitives. Values are pinned
  * equal to the Scala-API kernels so the two surfaces can never drift.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("text kernels answer over SQL with the Scala-API values") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "  spaced   out   text  "),
      (3L, "uno")).toDF("id", "text")
    df.createOrReplaceTempView("sqlfn_docs")

    val sql = spark.sql(
      """SELECT id,
        |  graft_token_count(text) AS n,
        |  graft_tokens(text) AS toks,
        |  graft_normalize_ws(text) AS norm,
        |  graft_shingles(text, 2) AS sh,
        |  graft_minhash(text, 2, 4) AS mh,
        |  graft_simhash(text) AS simh,
        |  graft_fingerprint(text) AS fp,
        |  graft_lang_guess(text) AS lang
        |FROM sqlfn_docs""".stripMargin)

    import graft.functions.TextFunctions._
    val api = df.select(col("id"),
      size(tokens(col("text"))).as("n"),
      tokens(col("text")).as("toks"),
      normalizeWs(col("text")).as("norm"),
      shingles(col("text"), 2).as("sh"),
      minhashSignature(shingles(col("text"), 2), 4).as("mh"),
      simhash64(tokens(col("text"))).as("simh"),
      contentFingerprint(col("text")).as("fp"),
      langGuess(tokens(col("text"))).as("lang"))

    assert(sql.collect().map(_.toString).sorted.toSeq ==
      api.collect().map(_.toString).sorted.toSeq)
    // sanity on the values themselves
    val r = sql.filter(col("id") === 2).head()
    assert(r.getAs[Int]("n") == 3)
    assert(r.getAs[String]("norm") == "spaced out text")
  }

  test("hamming and cosine kernels answer over SQL") {
    val h = spark.sql("SELECT graft_hamming64(CAST(0 AS BIGINT), CAST(7 AS BIGINT)) AS d")
      .head().getAs[Number]("d").intValue()
    assert(h == 3)
    val cos = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(cos == 0.0)
    val cos1 = spark.sql(
      """SELECT graft_cosine(array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(cos1 == 1.0)
  }

  test("NFC normalization composes decomposed sequences, eval == codegen") {
    import spark.implicits._
    val composed = "caf\u00e9"
    val decomposed = "caf\u0065\u0301"
    // over SQL (codegen path through a real plan)
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"))
      .toDF("id", "text")
    df.createOrReplaceTempView("sqlfn_nfc")
    val rows = spark.sql(
      "SELECT id, graft_nfc(text) AS n, length(graft_nfc(text)) AS l FROM sqlfn_nfc")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(rows(1L)._1 == composed && rows(1L)._2 == 4, "decomposed must compose")
    assert(rows(2L) == ((composed, 4)))
    assert(rows(3L)._1 == "plain ascii")
    // interpreted eval agrees
    import org.apache.spark.sql.graft.NfcNormalizeExpr
    import org.apache.spark.sql.catalyst.expressions.Literal
    val evaled = NfcNormalizeExpr(Literal(decomposed)).eval(null).toString
    assert(evaled == composed)
  }

  test("winnow kernel answers over SQL, matches the Scala kernel") {
    import spark.implicits._
    Seq((1L, Seq(7L, 3L, 9L, 3L, 5L))).toDF("id", "hs")
      .createOrReplaceTempView("sqlfn_winnow")
    val got = spark.sql("SELECT graft_winnow(hs, 3) AS w FROM sqlfn_winnow")
      .collect().head.getSeq[Long](0)
    val expected = org.apache.spark.sql.graft.WinnowExpr
      .winnow(Array(7L, 3L, 9L, 3L, 5L), 3).toSeq
    assert(got == expected, s"$got vs $expected")
    // unpack contract: pos*2^32 + fp
    assert(got.forall(e => (e >>> 32) < 5 && (e & 0xFFFFFFFFL) <= 9L))
  }

  test("structure arguments must be literal integers") {
    import spark.implicits._
    Seq((1, "a b c")).toDF("n", "text").createOrReplaceTempView("sqlfn_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(text, n) FROM sqlfn_bad").collect()
    }
    assert(e.getMessage != null)
  }
}
