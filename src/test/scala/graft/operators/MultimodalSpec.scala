package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.BinaryFunctions._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def bin(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  test("detectFormat recognizes real magic bytes") {
    val df = Seq(
      ("jpeg", bin(0xFF, 0xD8, 0xFF, 0xE0, 1, 2)),
      ("png", bin(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A)),
      ("gif", bin(0x47, 0x49, 0x46, 0x38, 0x39)),
      ("riff", bin(0x52, 0x49, 0x46, 0x46, 9, 9)),
      ("pdf", bin(0x25, 0x50, 0x44, 0x46, 0x2D)),
      ("unknown", bin(0x00, 0x01, 0x02))).toDF("expected", "content")
    val got = df.select(col("expected"), detectFormat(col("content")).as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("frameSample frames reassemble to the original bytes") {
    val payload = Array.tabulate(150)(i => (i % 251).toByte)
    val df = Seq((1L, payload)).toDF("id", "content")
    val frames = Multimodal.frameSample(df, "id", "content", frameBytes = 64)
      .orderBy("frame_idx").select("frame").as[Array[Byte]].collect()
    assert(frames.length == 3)
    assert(frames.map(_.length).toSeq == Seq(64, 64, 22))
    assert(frames.flatten.sameElements(payload))
  }

  test("metadata matches JDK digests") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val df = Seq((1L, payload)).toDF("id", "content")
    val row = Multimodal.withMetadata(df, "content").head()
    assert(row.getAs[Int]("byte_size") == payload.length)
    val jdk = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      .map("%02x".format(_)).mkString
    assert(row.getAs[String]("sha256") == jdk)
  }

  test("decode stub: fixed dim, deterministic, distributed") {
    val df = spark.range(0, 100)
      .select(col("id"), concat(lit("doc"), col("id")).cast("binary").as("content"))
      .repartition(4)
    val feats = Multimodal.decodeToFeatures(df, "id", "content")
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 16))
    assert(rows.forall(_.getAs[Seq[Double]]("features").forall(v => v >= -1 && v <= 1)))
    val again = Multimodal.decodeToFeatures(df, "id", "content").collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
