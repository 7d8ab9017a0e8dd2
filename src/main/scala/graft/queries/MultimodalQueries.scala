package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BinaryFunctions._
import graft.operators.Multimodal

/** Multimodal-column pipeline over synthesized binary content: the
  * testdata ships no media files, so each document's text bytes are
  * prefixed with a format magic chosen by doc_id % 3 (jpeg / png /
  * none) — which makes format sniffing, sizing, hashing and frame
  * chunking fully oracle-checkable in DuckDB, while m03 exercises the
  * executor-side batched decode stub (rows-only: the fake embedding is
  * JVM-hash-seeded).
  */
object MultimodalQueries {

  private val JPEG = Array(0xFF, 0xD8, 0xFF).map(_.toByte)
  private val PNG = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)

  /** documents + synthesized `content` binary column. */
  private def withContent(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents.withColumn("content",
      when(col("doc_id") % 3 === 0, concat(lit(JPEG), col("text").cast("binary")))
        .when(col("doc_id") % 3 === 1, concat(lit(PNG), col("text").cast("binary")))
        .otherwise(col("text").cast("binary")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- Metadata pass: magic-byte format, size, content address ---
    "m01_binary_meta" -> { (s, dir) =>
      // sha256 over the payload (DuckDB's sha256 is VARCHAR-only, so the
      // oracle can't hash the magic-prefixed blob; format+size cover it)
      Multimodal.withMetadata(withContent(s, dir), "content")
        .select(col("doc_id"), col("format"), col("byte_size"),
          sha2(col("text").cast("binary"), 256).as("sha256"))
    },

    // --- Frame chunking: 64-byte frames + head probe ---
    "m02_frame_stats" -> { (s, dir) =>
      val c = withContent(s, dir)
      Multimodal.frameSample(c, "doc_id", "content", frameBytes = 64)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_frames"))
        .join(c.select(col("doc_id"), headHex(col("content"), 8).as("head_hex")), Seq("doc_id"))
    },

    // --- Batched decode stub → fixed-dim features (rows-only) ---
    "m03_stub_features" -> { (s, dir) =>
      Multimodal.decodeToFeatures(withContent(s, dir), "doc_id", "content")
        .select(col("id").as("doc_id"), size(col("features")).as("dim"),
          aggregate(col("features"), lit(0.0), (a, x) => a + x * x).as("sq_norm"))
    }
  )

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
              WHEN doc_id % 3 = 1 THEN 'png'
              ELSE 'unknown' END AS format,
         CAST(octet_length(content) AS INT) AS byte_size,
         sha256(text) AS sha256
         FROM (SELECT doc_id, text,
                 CASE WHEN doc_id % 3 = 0 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
                      WHEN doc_id % 3 = 1 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
                      ELSE encode(text) END AS content
               FROM documents)""",
    "m02_frame_stats" ->
      """SELECT doc_id,
         CAST(ceil(CAST(octet_length(content) AS DOUBLE) / 64) AS INT) AS n_frames,
         substr(hex(content), 1, 16) AS head_hex
         FROM (SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN '\xFF\xD8\xFF'::BLOB || encode(text)
                      WHEN doc_id % 3 = 1 THEN '\x89\x50\x4E\x47'::BLOB || encode(text)
                      ELSE encode(text) END AS content
               FROM documents)"""
  )
}
