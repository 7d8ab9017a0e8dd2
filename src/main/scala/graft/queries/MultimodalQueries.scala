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
    },

    // --- Perceptual near-dup: BMP decode → 8×8 average-hash → banded
    //     Hamming ≤ 3 pair search. The whole chain is exact-integer so
    //     the oracle replays it from the payload bytes, INCLUDING the
    //     bucket cap (so both engines agree at any SF, not just where
    //     the cap doesn't bind). ---
    "m05_phash_neardup" -> { (s, dir) =>
      val bmp = udf((b: Array[Byte]) => Multimodal.synthBmp(b))
      val withBmp = Tables(s, dir).documents
        .select(col("doc_id"), bmp(col("text").cast("binary")).as("content"))
      val hashes = Multimodal.decodeBmpToAHash(withBmp, "doc_id", "content")
      Multimodal.phashNearDupPairs(hashes, maxHamming = 3, maxBucket = 256)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
    },

    // --- Audio quality gate: REAL WAV decode → clipped-sample count,
    //     peak amplitude, zero-crossing count — the audio twin of the
    //     d04 text quality gate (drop silent / clipped / DC-stuck
    //     clips before they poison a training mix). Exact integers
    //     from the decoded samples; the oracle recomputes them from
    //     the payload bytes through the synthWav amplitude contract. ---
    "m06_audio_quality" -> { (s, dir) =>
      val wav = udf((b: Array[Byte]) => Multimodal.synthWav(b))
      val withWav = Tables(s, dir).documents
        .select(col("doc_id"), wav(col("text").cast("binary")).as("content"))
      Multimodal.decodeWavToQuality(withWav, "doc_id", "content")
        .select(col("id").as("doc_id"), col("n_samples"), col("n_clipped"),
          col("max_abs"), col("zero_crossings"))
    },

    // --- Silence segmentation: per clip, the count of silent samples
    //     (|amp| < 2048), the number of maximal silent RUNS and the
    //     longest run — the trim/drop signal an audio pipeline runs
    //     before paying for transcription. Pure per-partition decode,
    //     no shuffle (the m06 shape); the oracle rebuilds the runs
    //     from the payload bytes with the gaps-and-islands window. ---
    "m09_silence_segments" -> { (s, dir) =>
      val wav = udf((b: Array[Byte]) => Multimodal.synthWav(b))
      val withWav = Tables(s, dir).documents
        .select(col("doc_id"), wav(col("text").cast("binary")).as("content"))
      Multimodal.decodeWavToSilence(withWav, "doc_id", "content")
        .select(col("id").as("doc_id"), col("n_samples"), col("n_silent"),
          col("n_runs"), col("longest_run"))
    },

    // --- REAL image resize: BMP decode → nearest-neighbor resample to
    //     a 4×4 thumbnail → exact-integer grid features (sum, a
    //     position-weighted checksum catching cell permutations, and
    //     the TL/BR corners catching index math at both grid ends).
    //     The oracle replays decode + the x·w div outW index math from
    //     the payload bytes. ---
    "m10_bmp_resize" -> { (s, dir) =>
      val bmp = udf((b: Array[Byte]) => Multimodal.synthBmp(b))
      val withBmp = Tables(s, dir).documents
        .select(col("doc_id"), bmp(col("text").cast("binary")).as("content"))
      Multimodal.decodeBmpToResized(withBmp, "doc_id", "content", outW = 4, outH = 4)
        .select(col("id").as("doc_id"), col("out_w"), col("out_h"),
          col("rz_sum"), col("rz_checksum"), col("corner_tl"), col("corner_br"))
    },

    // --- REAL audio resample: WAV decode → nearest-sample DECIMATION
    //     by 4 (output i reads input sample i·4 — the audio twin of
    //     m10's resize index math) → exact-integer features: in/out
    //     lengths, Σ|amp|, a position-weighted checksum catching
    //     dropped/reordered samples, first/last output samples
    //     catching stride math at both ends. The oracle replays the
    //     decimation from the payload bytes through the synthWav
    //     amplitude contract. ---
    "m11_wav_resample" -> { (s, dir) =>
      val wav = udf((b: Array[Byte]) => Multimodal.synthWav(b))
      val withWav = Tables(s, dir).documents
        .select(col("doc_id"), wav(col("text").cast("binary")).as("content"))
      Multimodal.decodeWavToResampled(withWav, "doc_id", "content", factor = 4)
        .select(col("id").as("doc_id"), col("n_in"), col("n_out"),
          col("sum_abs"), col("rs_checksum"), col("first_amp"), col("last_amp"))
    },

    // --- Shot-boundary detection: 64-byte frames over the clip bytes,
    //     a cut where the frame-to-frame absolute-difference sum
    //     crosses 1800 (≈ the corpus median delta — real cuts sit in
    //     the upper tail, repeated content at 0). Exact integers; the
    //     oracle replays frame alignment, partial-tail handling and
    //     the threshold from the payload bytes. ---
    "m07_scene_changes" -> { (s, dir) =>
      Multimodal.sceneChanges(
        Tables(s, dir).documents
          .select(col("doc_id"), col("text").cast("binary").as("content")),
        "doc_id", "content", frameBytes = 64, threshold = 1800L)
        .select(col("id").as("doc_id"), col("n_frames"), col("n_cuts"),
          col("max_frame_delta"))
    },

    // --- Image entropy gate: REAL BMP decode → gray-histogram entropy
    //     in the d56 integer-micro-nat contract — blank / flat-fill /
    //     low-texture images show near-zero entropy before any model
    //     sees them. The oracle recomputes the histogram from the
    //     payload bytes INCLUDING the canvas zero-padding the decoder
    //     surfaces past the payload end. ---
    "m08_image_entropy" -> { (s, dir) =>
      val bmp = udf((b: Array[Byte]) => Multimodal.synthBmp(b))
      val withBmp = Tables(s, dir).documents
        .select(col("doc_id"), bmp(col("text").cast("binary")).as("content"))
      Multimodal.decodeBmpToEntropy(withBmp, "doc_id", "content")
        .select(col("id").as("doc_id"), col("n_pixels"),
          col("n_distinct_gray"), col("sum_clnc_micro"),
          (floor(log(col("n_pixels").cast("double")) * 1000000).cast("long")
              .cast("double") -
            col("sum_clnc_micro").cast("double") /
              col("n_pixels").cast("double")).as("entropy_micro"))
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
         GROUP BY b.doc_id, b.n""",
    // Mirror of m10: cell i of the 4×4 thumbnail samples source pixel
    // (sy, sx) = ((i//4)·h div 4, (i%4)·7 div 4) over the synthBmp
    // grid (w=7, h=ceil(n/7), gray(k)=payload byte k, 0 past the end)
    // — the same integer index math, checksum weights i+1.
    "m10_bmp_resize" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n FROM documents),
         dims AS (SELECT doc_id, hx, n,
                    greatest((n + 6) // 7, 1) AS h FROM b),
         cells AS (
           SELECT doc_id, i,
             ((i // 4) * h) // 4 * 7 + ((i % 4) * 7) // 4 AS k, n, hx
           FROM dims, unnest(range(0, 16)) AS t(i)),
         v AS (
           SELECT doc_id, i,
             CASE WHEN k < n THEN
               16*(strpos('0123456789ABCDEF', substr(hx, CAST(2*k+1 AS INT), 1))-1)
                 + strpos('0123456789ABCDEF', substr(hx, CAST(2*k+2 AS INT), 1))-1
             ELSE 0 END AS byte
           FROM cells)
         SELECT doc_id,
           CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
           CAST(sum(byte) AS BIGINT) AS rz_sum,
           CAST(sum((i + 1) * byte) AS BIGINT) AS rz_checksum,
           CAST(max(CASE WHEN i = 0 THEN byte END) AS INT) AS corner_tl,
           CAST(max(CASE WHEN i = 15 THEN byte END) AS INT) AS corner_br
         FROM v GROUP BY doc_id""",

    // Replays the full perceptual chain from payload bytes: cell i of
    // the 8×8 grid samples pixel (i/8, (i%8)*7/8) = payload byte
    // (i/8)*7 + (i%8)*7/8 (0 past the end — synthBmp zero-pads and
    // rows past the image are 0); integer mean of the 64 samples;
    // bit i set iff sample > mean, packed into four 16-bit bands;
    // candidates from same-(band, value) buckets of ≤ 256 members;
    // pairs verified at Hamming ≤ 3. A decode bug (un-flip, stride),
    // a sampling-index bug, a mean-rounding bug, or a banding bug all
    // break the pair set.
    "m05_phash_neardup" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                      octet_length(encode(text)) AS n FROM documents),
         cells AS (
           SELECT doc_id, i,
             CASE WHEN (i//8)*7 + (i%8)*7//8 < n THEN
               16*(strpos('0123456789ABCDEF', substr(hx, CAST(2*((i//8)*7 + (i%8)*7//8)+1 AS INT), 1))-1)
                 + strpos('0123456789ABCDEF', substr(hx, CAST(2*((i//8)*7 + (i%8)*7//8)+2 AS INT), 1))-1
             ELSE 0 END AS v
           FROM b, unnest(range(0, 64)) AS t(i)),
         m AS (SELECT doc_id, SUM(v)//64 AS mean FROM cells GROUP BY doc_id),
         bands AS (
           SELECT c.doc_id, i//16 AS j,
             CAST(SUM(CASE WHEN v > mean THEN (1<<(i%16)) ELSE 0 END) AS INT) AS bv
           FROM cells c JOIN m USING (doc_id) GROUP BY c.doc_id, i//16),
         ok AS (SELECT j, bv FROM bands GROUP BY j, bv HAVING count(*) <= 256),
         cand AS (
           SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           FROM (SELECT * FROM bands JOIN ok USING (j, bv)) x
           JOIN (SELECT * FROM bands JOIN ok USING (j, bv)) y
             ON x.j = y.j AND x.bv = y.bv AND x.doc_id < y.doc_id),
         h AS (SELECT doc_id,
                 MAX(CASE WHEN j = 0 THEN bv END) AS b0,
                 MAX(CASE WHEN j = 1 THEN bv END) AS b1,
                 MAX(CASE WHEN j = 2 THEN bv END) AS b2,
                 MAX(CASE WHEN j = 3 THEN bv END) AS b3
               FROM bands GROUP BY doc_id)
         SELECT doc_a, doc_b,
           CAST(bit_count(xor(a.b0, c.b0)) + bit_count(xor(a.b1, c.b1))
              + bit_count(xor(a.b2, c.b2)) + bit_count(xor(a.b3, c.b3)) AS INT) AS hamming
         FROM cand JOIN h a ON a.doc_id = doc_a JOIN h c ON c.doc_id = doc_b
         WHERE bit_count(xor(a.b0, c.b0)) + bit_count(xor(a.b1, c.b1))
             + bit_count(xor(a.b2, c.b2)) + bit_count(xor(a.b3, c.b3)) <= 3""",
    // Recomputes the audio-quality features from the payload bytes via
    // the synthWav amplitude contract amp_i = (byte_i - 128) * 256:
    // clipped within 255 of either PCM16 rail (symmetric window:
    // amp <= -32513 or amp >= 32512; bytes 0/255 map to -32768/32512),
    // peak = max |amp|, zero crossings = adjacent sign products < 0
    // (lag window per doc in byte order). A decode bug in the chunk
    // walk, endianness, or sample order breaks these counts.
    "m06_audio_quality" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
         s AS (SELECT doc_id, n, h, unnest(range(0, n)) AS i FROM b),
         v AS (SELECT doc_id, n, i,
                 (16*(strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1))-1)
                    + strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1))-1
                    - 128) * 256 AS amp
               FROM s),
         w AS (SELECT doc_id, amp,
                 lag(amp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
               FROM v)
         SELECT b.doc_id,
           CAST(b.n AS BIGINT) AS n_samples,
           CAST(COALESCE(SUM(CASE WHEN w.amp <= -32513 OR w.amp >= 32512
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_clipped,
           CAST(COALESCE(MAX(abs(w.amp)), 0) AS INT) AS max_abs,
           CAST(COALESCE(SUM(CASE WHEN w.prev * w.amp < 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS zero_crossings
         FROM b LEFT JOIN w USING (doc_id)
         GROUP BY b.doc_id, b.n""",
    // Mirror of m11: the same byte→amp unpack at stride-4 indices, the
    // same ceil-division output length, position-weighted checksum and
    // end samples.
    "m11_wav_resample" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
         o AS (SELECT doc_id, n, (n + 3) // 4 AS n_out, h FROM b),
         s AS (SELECT doc_id, n, n_out, h, unnest(range(0, n_out)) AS i FROM o),
         v AS (SELECT doc_id, n, n_out, i,
                 (16*(strpos('0123456789ABCDEF', substr(h, CAST(2*(i*4)+1 AS INT), 1))-1)
                    + strpos('0123456789ABCDEF', substr(h, CAST(2*(i*4)+2 AS INT), 1))-1
                    - 128) * 256 AS amp
               FROM s)
         SELECT doc_id, CAST(n AS BIGINT) AS n_in,
           CAST(n_out AS BIGINT) AS n_out,
           CAST(sum(abs(amp)) AS BIGINT) AS sum_abs,
           CAST(sum((i + 1) * amp) AS BIGINT) AS rs_checksum,
           CAST(max(CASE WHEN i = 0 THEN amp END) AS INT) AS first_amp,
           CAST(max(CASE WHEN i = n_out - 1 THEN amp END) AS INT) AS last_amp
         FROM v GROUP BY doc_id, n, n_out""",

    // Mirror of m09: the same byte→amp unpack, silent samples by the
    // SAME |amp| < 2048 rail, runs recovered with the gaps-and-islands
    // trick (sample index minus its silent-only row_number is constant
    // exactly within one maximal run).
    "m09_silence_segments" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
         s AS (SELECT doc_id, n, h, unnest(range(0, n)) AS i FROM b),
         v AS (SELECT doc_id, i,
                 (16*(strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1))-1)
                    + strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1))-1
                    - 128) * 256 AS amp
               FROM s),
         sil AS (SELECT doc_id, i,
                   i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
                 FROM v WHERE abs(amp) < 2048),
         runs AS (SELECT doc_id, grp, count(*) AS run_len
                  FROM sil GROUP BY doc_id, grp)
         SELECT b.doc_id,
           CAST(b.n AS BIGINT) AS n_samples,
           CAST(COALESCE(SUM(run_len), 0) AS BIGINT) AS n_silent,
           CAST(COALESCE(COUNT(run_len), 0) AS BIGINT) AS n_runs,
           CAST(COALESCE(MAX(run_len), 0) AS BIGINT) AS longest_run
         FROM b LEFT JOIN runs USING (doc_id)
         GROUP BY b.doc_id, b.n""",
    // Recomputes the scene-change pass from the payload bytes: byte i
    // (i >= 64) belongs to frame i/64 and differences against byte
    // i-64; per-frame delta sums; cuts at delta >= 1800. A frame-
    // alignment or partial-tail bug shifts the deltas and breaks the
    // counts.
    "m07_scene_changes" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
         s AS (SELECT doc_id, n, h, unnest(range(64, n)) AS i FROM b WHERE n > 64),
         v AS (SELECT doc_id, i//64 AS f,
                 abs((16*(strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1))-1)
                    + strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1))-1)
                   - (16*(strpos('0123456789ABCDEF', substr(h, CAST(2*(i-64)+1 AS INT), 1))-1)
                    + strpos('0123456789ABCDEF', substr(h, CAST(2*(i-64)+2 AS INT), 1))-1)) AS d
               FROM s),
         fd AS (SELECT doc_id, f, SUM(d) AS delta FROM v GROUP BY 1, 2)
         SELECT b.doc_id,
           CAST(greatest((b.n + 63) // 64, 1) AS INT) AS n_frames,
           CAST(COALESCE(SUM(CASE WHEN fd.delta >= 1800 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_cuts,
           CAST(COALESCE(MAX(fd.delta), 0) AS BIGINT) AS max_frame_delta
         FROM b LEFT JOIN fd USING (doc_id)
         GROUP BY b.doc_id, b.n""",
    // Recomputes the gray histogram from the payload bytes PLUS the
    // canvas zero-padding the decoder surfaces (pixel k in [n, 7·h) is
    // gray 0 on the width-7, h = max(ceil(n/7), 1) canvas), then the
    // d56 micro-nat terms per occupied bin and the same one-subtraction
    // one-division entropy.
    "m08_image_entropy" ->
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS h,
                      octet_length(encode(text)) AS n FROM documents),
         s AS (SELECT doc_id, h, unnest(range(0, n)) AS i FROM b),
         v AS (SELECT doc_id,
                 16*(strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1))-1)
                   + strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1))-1 AS byte
               FROM s),
         hist0 AS (SELECT doc_id, byte, count(*) AS c FROM v GROUP BY 1, 2),
         pad AS (SELECT doc_id, 0 AS byte,
                   7 * greatest((n + 6) // 7, 1) - n AS c
                 FROM b WHERE 7 * greatest((n + 6) // 7, 1) - n > 0),
         hist AS (SELECT doc_id, byte, CAST(SUM(c) AS BIGINT) AS c
                  FROM (SELECT * FROM hist0 UNION ALL SELECT * FROM pad)
                  GROUP BY 1, 2),
         agg AS (SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_pixels,
                   count(*) AS n_distinct_gray,
                   CAST(SUM(c * CAST(floor(ln(c) * 1000000) AS BIGINT)) AS BIGINT)
                     AS sum_clnc_micro
                 FROM hist GROUP BY 1)
         SELECT doc_id, n_pixels, n_distinct_gray, sum_clnc_micro,
           CAST(CAST(floor(ln(n_pixels) * 1000000) AS BIGINT) AS DOUBLE)
             - CAST(sum_clnc_micro AS DOUBLE) / CAST(n_pixels AS DOUBLE)
             AS entropy_micro
         FROM agg"""
  )
}
