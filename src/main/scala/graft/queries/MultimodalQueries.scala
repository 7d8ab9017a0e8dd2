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
  * chunking fully oracle-checkable in DuckDB. m03 synthesizes a REAL
  * RIFF/WAVE PCM16 container per document and runs the real executor-
  * side batched decode (header walk + sample extraction + windowed
  * energy) — the oracle recomputes the exact-integer features from
  * the same payload bytes.
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

    // --- REAL audio decode: text bytes → RIFF/WAVE PCM16 container
    //     (synthWav) → chunk-walking decode → windowed-energy
    //     features. Every value is exact integer arithmetic, so the
    //     DuckDB oracle recomputes energy + a window-boundary-
    //     sensitive checksum from the same payload bytes. ---
    "m03_wav_features" -> { (s, dir) =>
      val wav = udf((b: Array[Byte]) => Multimodal.synthWav(b))
      val withWav = Tables(s, dir).documents
        .select(col("doc_id"), wav(col("text").cast("binary")).as("content"))
      Multimodal.decodeToFeatures(withWav, "doc_id", "content")
        .select(col("id").as("doc_id"), size(col("features")).as("dim"),
          aggregate(col("features"), lit(0.0), (a, x) => a + x).cast("bigint").as("energy"),
          aggregate(zip_with(col("features"),
              sequence(lit(1), lit(16)).cast("array<double>"), (f, w) => f * w),
            lit(0.0), (a, x) => a + x).cast("bigint").as("win_checksum"))
    },

    // --- REAL image decode: text bytes → 24-bpp BMP container
    //     (synthBmp: bottom-up rows, 4-byte stride padding) →
    //     header-walking decode → exact-integer features, each
    //     certifying one decode property (fidelity / row un-flip /
    //     stride walk). Oracle recomputes from the payload bytes. ---
    "m04_bmp_features" -> { (s, dir) =>
      val bmp = udf((b: Array[Byte]) => Multimodal.synthBmp(b))
      val withBmp = Tables(s, dir).documents
        .select(col("doc_id"), bmp(col("text").cast("binary")).as("content"))
      Multimodal.decodeBmpToFeatures(withBmp, "doc_id", "content")
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("pix_sum"), col("top_row_sum"), col("even_col_sum"))
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
               FROM documents)""",
    // Recomputes the WAV pipeline's windowed-energy features from the
    // payload bytes: sample_i = (byte_i - 128) * 256 (what synthWav
    // encodes and decodeWav must round-trip), window of sample i is
    // i*16/n (integer division), energy = sum of amp^2, win_checksum =
    // sum over windows of (w+1) * window_energy. A decode bug in the
    // header walk, endianness, or windowing breaks the checksum.
    "m03_wav_features" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
         s AS (SELECT doc_id, n, h, unnest(range(0, n)) AS i FROM b),
         v AS (SELECT doc_id, n, i,
                 (16*(strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1))-1)
                    + strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1))-1
                    - 128) * 256 AS amp
               FROM s)
         SELECT b.doc_id, 16 AS dim,
           CAST(COALESCE(SUM(v.amp*v.amp), 0) AS BIGINT) AS energy,
           CAST(COALESCE(SUM(((v.i*16)//v.n + 1) * v.amp*v.amp), 0) AS BIGINT) AS win_checksum
         FROM b LEFT JOIN v USING (doc_id)
         GROUP BY b.doc_id""",
    // Recomputes the BMP pipeline's features from the payload bytes:
    // pixel k (row-major top-down) is payload byte k on a width-7
    // canvas, height ceil(n/7); pix_sum = Σ bytes (stride pads are
    // zero), top_row_sum = bytes 0..6 (a bottom-up un-flip bug breaks
    // this), even_col_sum = bytes at k%7 even (a stride-walk bug
    // breaks this).
    "m04_bmp_features" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n FROM documents),
         s AS (SELECT doc_id, n, hx, unnest(range(0, n)) AS k FROM b),
         v AS (SELECT doc_id, n, k,
                 16*(strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1))-1)
                   + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1))-1 AS byte
               FROM s)
         SELECT b.doc_id,
           CAST(7 AS INT) AS width,
           CAST(greatest((b.n + 6) // 7, 1) AS INT) AS height,
           CAST(COALESCE(SUM(v.byte), 0) AS BIGINT) AS pix_sum,
           CAST(COALESCE(SUM(CASE WHEN v.k < 7 THEN v.byte ELSE 0 END), 0) AS BIGINT) AS top_row_sum,
           CAST(COALESCE(SUM(CASE WHEN (v.k % 7) % 2 = 0 THEN v.byte ELSE 0 END), 0) AS BIGINT) AS even_col_sum
         FROM b LEFT JOIN v USING (doc_id)
         GROUP BY b.doc_id, b.n"""
  )
}
