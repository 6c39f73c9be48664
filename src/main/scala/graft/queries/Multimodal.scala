package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators: media carried as opaque `binary`
  * columns with typed metadata derived per row, frame fan-out, modality
  * demux — and, for container formats that need no codec library, REAL
  * decode in pure SQL byte arithmetic: RIFF/WAV PCM16
  * (`mm_wav_pcm_decode`, `mm_wav_frame_energy`), uncompressed 24-bit
  * BMP (`mm_bmp_decode`, `mm_bmp_resize`), and NPY float32 at the
  * IEEE-754 bit level (`mm_npy_f32_decode`). Each decoder's oracle
  * computes expected values from the generator formula WITHOUT seeing
  * bytes, so the differential catches endianness/offset/stride/sign
  * bugs in the parse.
  *
  * Only lib-dependent codecs (JPEG, H.264, …) remain stubbed — none
  * exist in this environment; mm_binary_metadata/mm_frame_sample keep
  * those stubs clearly marked, and graft.multimodal.DecodeStub holds
  * the mapPartitions batch-shaped variant a production codec would
  * drop into.
  */
object Multimodal {

  // ── SQL byte-arithmetic helpers shared by the real container
  // decoders (WAV/BMP/NPY): little-endian integer write and read over
  // a `media` binary column, composed entirely from codegen'd
  // built-ins (hex/unhex/substring/shiftright/conv). ──

  /** SQL expr producing the `nBytes` little-endian bytes of `v`. */
  private def le(v: String, nBytes: Int): String = {
    val bytes = (0 until nBytes).map(i =>
      s"lpad(hex(shiftright($v, ${8 * i}) & 255), 2, '0')")
    s"unhex(concat(${bytes.mkString(", ")}))"
  }

  /** SQL expr for the unsigned byte of `media` at 1-based `pos`. */
  private def byteAt(pos: String): String =
    s"cast(conv(hex(substring(media, cast(($pos) as int), 1)), 16, 10) as bigint)"

  /** SQL expr reading an unsigned little-endian int of `nBytes` at
    * 1-based `pos` of `media`. */
  private def leRead(pos: String, nBytes: Int): String =
    (0 until nBytes).map(i =>
      s"${byteAt(s"($pos) + $i")} * ${1L << (8 * i)}").mkString("(", " + ", ")")

  /** Per-doc sample count of the synthetic WAV fixture. */
  private val wavN = "(64 + pmod(doc_id, 64))"

  /** Signed int16 sample `i` of doc `doc_id`, as unsigned 0..65535. */
  private val wavSampleU =
    "pmod(pmod(doc_id * 31 + i * 17, 2048) - 1024, 65536)"

  /** SQL expr building the complete valid mono 8 kHz PCM16 WAV bytes
    * for `doc_id` — shared by the decode and frame-energy queries. */
  private lazy val wavExpr: String = s"""concat(
    unhex('52494646'), ${le(s"36 + 2 * $wavN", 4)}, unhex('57415645'),
    unhex('666D7420'), ${le("16", 4)}, ${le("1", 2)}, ${le("1", 2)},
    ${le("8000", 4)}, ${le("16000", 4)}, ${le("2", 2)}, ${le("16", 2)},
    unhex('64617461'), ${le(s"2 * $wavN", 4)},
    unhex(array_join(transform(sequence(0, $wavN - 1),
      i -> concat(lpad(hex($wavSampleU & 255), 2, '0'),
                  lpad(hex(shiftright($wavSampleU, 8) & 255), 2, '0'))), '')))"""


  // ── Synthetic 24-bit BMP fixture shared by the decode and resize
  // queries: w×h from doc_id, bottom-up padded rows, channel value at
  // image (x, y) = (doc_id·7 + x·13 + y·29 + c·97) mod 256. ──
  private val bmpW = "(4 + pmod(doc_id, 5))"
  private val bmpH = "(3 + pmod(doc_id, 4))"
  private val bmpRowSize = s"(((3 * $bmpW + 3) div 4) * 4)"
  private val bmpDataSize = s"($bmpRowSize * $bmpH)"

  private def bmpPx(c: Int): String =
    s"pmod(doc_id * 7 + x * 13 + ($bmpH - 1 - ry) * 29 + ${c * 97}, 256)"

  private lazy val bmpExpr: String = {
    // one stored row: w pixels of BGR then zero padding to rowSize
    val rowHex =
      s"""concat(array_join(transform(sequence(0, $bmpW - 1),
            x -> concat(lpad(hex(${bmpPx(0)}), 2, '0'),
                        lpad(hex(${bmpPx(1)}), 2, '0'),
                        lpad(hex(${bmpPx(2)}), 2, '0'))), ''),
          repeat('00', $bmpRowSize - 3 * $bmpW))"""
    s"""concat(
      unhex('424D'), ${le(s"54 + $bmpDataSize", 4)}, ${le("0", 4)},
      ${le("54", 4)}, ${le("40", 4)}, ${le(bmpW, 4)}, ${le(bmpH, 4)},
      ${le("1", 2)}, ${le("24", 2)}, ${le("0", 4)}, ${le(bmpDataSize, 4)},
      ${le("2835", 4)}, ${le("2835", 4)}, ${le("0", 4)}, ${le("0", 4)},
      unhex(array_join(transform(sequence(0, $bmpH - 1), ry -> $rowHex), '')))"""
  }

  def qs: Seq[Q] = Seq(
    // Opaque binary column + typed metadata extraction. STUB: width/
    // height are deterministic functions of byte length, not real pixels.
    Q("mm_binary_metadata",
      (s, d) => Tables.documents(s, d)
        .withColumn("media", encode(col("text"), "UTF-8")) // binary payload
        .select(col("doc_id"),
          length(col("media")).cast("long").as("byte_len"),
          md5(col("media")).as("digest"),
          (length(col("media")) % 640).cast("long").as("width"),   // STUB decode
          ((length(col("media")) * 7) % 480).cast("long").as("height"), // STUB decode
          lit(3L).as("channels"))
        .orderBy("doc_id"),
      Some("""
SELECT doc_id,
       octet_length(encode(text))::BIGINT AS byte_len,
       md5(text) AS digest,
       (octet_length(encode(text)) % 640)::BIGINT AS width,
       ((octet_length(encode(text)) * 7) % 480)::BIGINT AS height,
       3::BIGINT AS channels
FROM documents ORDER BY doc_id""")),

    // Frame sampling: one asset -> N frame rows (explode fan-out), each
    // frame sliced from the payload and digested. STUB: "frames" are
    // fixed-offset slices of the payload, not decoded video.
    Q("mm_frame_sample",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(3))).as("frame_idx"))
        .withColumn("frame_payload",
          col("text").substr(col("frame_idx") * 16 + 1, lit(16)))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          md5(encode(col("frame_payload"), "UTF-8")).as("frame_digest"),
          length(col("frame_payload")).cast("long").as("frame_bytes"))
        .orderBy("doc_id", "frame_idx"),
      Some("""
SELECT doc_id, frame_idx::BIGINT AS frame_idx,
       md5(substring(text, frame_idx * 16 + 1, 16)) AS frame_digest,
       length(substring(text, frame_idx * 16 + 1, 16))::BIGINT AS frame_bytes
FROM documents, (SELECT unnest(range(0, 4)) AS frame_idx)
ORDER BY doc_id, frame_idx""")),

    // Modality dispatch: sniff the container format from the payload's
    // leading bytes (magic numbers) and route each asset to its
    // modality's processing partition — the demux step in front of any
    // mixed-media pipeline. The sniff is a row-local CASE over the hex
    // prefix; the partitioned write groups each modality contiguously
    // so the per-modality decoder (an mm_frame_sample-shaped stage)
    // reads only its own files. STUB only in that payloads are derived
    // from text; the magic-byte table (jpeg/png/riff) is the real one.
    Q("mm_modality_dispatch",
      (s, d) => {
        val sniffed = Tables.documents(s, d)
          .withColumn("media", encode(col("text"), "UTF-8"))
          // deterministic synthetic headers: distribute docs across the
          // three container types by id, leave a remainder unknown
          .withColumn("media",
            when(col("doc_id") % 4 === 0,
              concat(unhex(lit("FFD8FF")), col("media")))
            .when(col("doc_id") % 4 === 1,
              concat(unhex(lit("89504E47")), col("media")))
            .when(col("doc_id") % 4 === 2,
              concat(unhex(lit("52494646")), col("media")))
            .otherwise(col("media")))
          .withColumn("magic", upper(hex(substring(col("media"), 1, 4))))
          .withColumn("modality",
            when(col("magic").startsWith("FFD8FF"), "image_jpeg")
            .when(col("magic").startsWith("89504E47"), "image_png")
            .when(col("magic").startsWith("52494646"), "audio_riff")
            .otherwise("unknown"))
        sniffed
          .groupBy("modality")
          .agg(count(lit(1)).as("n_assets"),
            sum(length(col("media"))).cast("long").as("total_bytes"))
          .orderBy("modality")
      },
      Some("""
SELECT modality, count(*) AS n_assets,
       CAST(sum(octet_length(encode(text)) +
                CASE WHEN doc_id % 4 = 0 THEN 3
                     WHEN doc_id % 4 IN (1, 2) THEN 4 ELSE 0 END)
            AS BIGINT) AS total_bytes
FROM (SELECT doc_id, text,
             CASE WHEN doc_id % 4 = 0 THEN 'image_jpeg'
                  WHEN doc_id % 4 = 1 THEN 'image_png'
                  WHEN doc_id % 4 = 2 THEN 'audio_riff'
                  -- un-prefixed docs are sniffed too: the engine
                  -- classifies by ACTUAL leading bytes, so a document
                  -- whose text itself starts with a printable magic
                  -- ('RIFF' is the only ASCII one) is that modality on
                  -- both sides, not silently divergent
                  WHEN text LIKE 'RIFF%' THEN 'audio_riff'
                  ELSE 'unknown' END AS modality
      FROM documents)
GROUP BY modality ORDER BY modality""")),

    // REAL container decode, zero external libs: a byte-exact RIFF/WAV
    // PCM16 writer AND parser built from SQL byte arithmetic
    // (hex/unhex/substring/shiftright — all codegen'd). Each doc
    // synthesizes a valid mono 8 kHz 16-bit WAV (44-byte canonical
    // header + little-endian PCM derived from doc_id), then the
    // ENGINE-SIDE result is computed only by PARSING the bytes back:
    // header fields validated, data chunk length read from offset 41,
    // each sample re-assembled from its two LE bytes and sign-extended,
    // then aggregated. The oracle never sees bytes — it computes the
    // same statistics from the generator formula — so any parser bug
    // (endianness, offset, sign) breaks the hash. This upgrades the
    // multimodal story from "decode stubbed" to "containers without
    // library codecs (RIFF/WAV here) decode for real, in-plan"; only
    // lib-dependent codecs (JPEG/H.264) remain behind DecodeStub. At
    // 100 TB the whole pipeline is map-only: synthesize/scan, explode
    // samples, partial-aggregate per doc — no shuffle beyond the
    // per-doc combine.
    Q("mm_wav_pcm_decode",
      (s, d) => {
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), expr(wavExpr).as("media"))
          // header fields come ONLY from the bytes
          .withColumn("fmt_ok",
            expr("decode(substring(media, 1, 4), 'UTF-8') = 'RIFF'") &&
              expr("decode(substring(media, 9, 4), 'UTF-8') = 'WAVE'") &&
              expr("decode(substring(media, 37, 4), 'UTF-8') = 'data'") &&
              expr(s"${leRead("21", 2)} = 1") && // PCM
              expr(s"${leRead("23", 2)} = 1") && // mono
              expr(s"${leRead("5", 4)} = 36 + ${leRead("41", 4)}"))
          .withColumn("sample_rate", expr(leRead("25", 4)))
          .withColumn("bits", expr(leRead("35", 2)))
          .withColumn("n_samples", expr(s"${leRead("41", 4)} div 2"))
          .withColumn("i", explode(expr("sequence(0, n_samples - 1)")))
          .withColumn("u", expr(leRead("45 + 2 * i", 2)))
          .withColumn("smp", expr("if(u > 32767, u - 65536, u)"))
          .groupBy("doc_id", "fmt_ok", "sample_rate", "bits", "n_samples")
          .agg(min("smp").as("min_s"), max("smp").as("max_s"),
            sum("smp").as("sum_s"),
            sum(expr("smp * smp")).as("sum_sq"))
          .orderBy("doc_id")
      },
      Some("""
WITH base AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
              WHERE doc_id < 100),
smp AS (SELECT doc_id, n,
               ((doc_id * 31 + i * 17) % 2048) - 1024 AS s
        FROM base, UNNEST(range(0, n)) AS t(i))
SELECT doc_id, true AS fmt_ok,
       CAST(8000 AS BIGINT) AS sample_rate, CAST(16 AS BIGINT) AS bits,
       CAST(max(n) AS BIGINT) AS n_samples,
       min(s) AS min_s, max(s) AS max_s,
       CAST(sum(s) AS BIGINT) AS sum_s, CAST(sum(s * s) AS BIGINT) AS sum_sq
FROM smp GROUP BY doc_id ORDER BY doc_id""")),

    // Decode → features, composed: frame-level energy/peak over the
    // PARSED PCM stream — the feature-extract stage of an audio
    // pipeline (VAD, loudness normalization, silence trimming all
    // start here), running on real decoded samples, not a stub. Frames
    // are 32 samples, full frames only; energy and peak are integer-
    // exact so the oracle (generator formula, no bytes) hash-matches.
    // Shape at scale: parse+explode is map-side, the frame aggregate
    // is a partial-agg groupBy on (doc, frame) — one bounded shuffle.
    Q("mm_wav_frame_energy",
      (s, d) => {
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), expr(wavExpr).as("media"))
          .withColumn("n_samples", expr(s"${leRead("41", 4)} div 2"))
          .withColumn("n_frames", expr("n_samples div 32"))
          .withColumn("i", explode(expr("sequence(0, n_frames * 32 - 1)")))
          .withColumn("u", expr(leRead("45 + 2 * i", 2)))
          .withColumn("smp", expr("if(u > 32767, u - 65536, u)"))
          .groupBy(col("doc_id"), expr("i div 32").as("frame_idx"))
          .agg(sum(expr("smp * smp")).as("energy"),
            max(expr("abs(smp)")).as("peak"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""
WITH base AS (SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
              WHERE doc_id < 100),
smp AS (SELECT doc_id, i // 32 AS frame_idx,
               ((doc_id * 31 + i * 17) % 2048) - 1024 AS s
        FROM base, UNNEST(range(0, (n // 32) * 32)) AS t(i))
SELECT doc_id, frame_idx,
       CAST(sum(s * s) AS BIGINT) AS energy,
       CAST(max(abs(s)) AS BIGINT) AS peak
FROM smp GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx""")),

    // The image twin of the WAV decode: uncompressed 24-bit BMP written
    // and parsed in pure SQL byte arithmetic. BMP's two traps make it a
    // real parser test: pixel rows are stored BOTTOM-UP and padded to
    // 4-byte boundaries, and the result includes a row-weighted channel
    // sum (Σ (y+1)·red with y the TOP-DOWN image row), so a parser that
    // forgets the vertical flip or uses a 3·w stride instead of the
    // padded one breaks the hash. The oracle computes from the pixel
    // formula directly — it never sees bytes. Map-only like the WAV
    // path; only lib-dependent codecs (JPEG etc.) remain stubbed.
    Q("mm_bmp_decode",
      (s, d) => {
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), expr(bmpExpr).as("media"))
          .withColumn("fmt_ok",
            expr("decode(substring(media, 1, 2), 'UTF-8') = 'BM'") &&
              expr(s"${leRead("27", 2)} = 1") && // planes
              expr(s"${leRead("29", 2)} = 24") && // bpp
              expr(s"${leRead("31", 4)} = 0") && // BI_RGB
              expr(s"${leRead("3", 4)} = 54 + ${leRead("35", 4)}"))
          .withColumn("img_w", expr(leRead("19", 4)))
          .withColumn("img_h", expr(leRead("23", 4)))
          .withColumn("row_size", expr("((3 * img_w + 3) div 4) * 4"))
          .withColumn("k", explode(expr("sequence(0, img_w * img_h - 1)")))
          .withColumn("x", expr("k % img_w"))
          .withColumn("ry", expr("k div img_w")) // stored row (bottom-up)
          .withColumn("y", expr("img_h - 1 - ry")) // image row (top-down)
          .withColumn("off", expr("55 + ry * row_size + 3 * x"))
          .withColumn("blue", expr(leRead("off", 1)))
          .withColumn("green", expr(leRead("off + 1", 1)))
          .withColumn("red", expr(leRead("off + 2", 1)))
          .groupBy("doc_id", "fmt_ok", "img_w", "img_h")
          .agg(sum("blue").as("sum_b"), sum("green").as("sum_g"),
            sum("red").as("sum_r"),
            sum(expr("(y + 1) * red")).as("row_weighted_r"))
          .orderBy("doc_id")
      },
      Some("""
WITH base AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
              FROM documents WHERE doc_id < 100),
pix AS (SELECT doc_id, w, h, i % w AS x, i // w AS y
        FROM base, UNNEST(range(0, w * h)) AS t(i)),
chan AS (SELECT doc_id, w, h, x, y,
                (doc_id * 7 + x * 13 + y * 29) % 256 AS blue,
                (doc_id * 7 + x * 13 + y * 29 + 97) % 256 AS green,
                (doc_id * 7 + x * 13 + y * 29 + 194) % 256 AS red
         FROM pix)
SELECT doc_id, true AS fmt_ok,
       CAST(max(w) AS BIGINT) AS img_w, CAST(max(h) AS BIGINT) AS img_h,
       CAST(sum(blue) AS BIGINT) AS sum_b,
       CAST(sum(green) AS BIGINT) AS sum_g,
       CAST(sum(red) AS BIGINT) AS sum_r,
       CAST(sum((y + 1) * red) AS BIGINT) AS row_weighted_r
FROM chan GROUP BY doc_id ORDER BY doc_id""")),

    // Resize over REALLY-parsed pixels — the last multimodal verb
    // (decode / feature-extract / resize / frame-sample) running on
    // real math: nearest-neighbor downsample to 2×2, where each output
    // pixel reads its source pixel's 3 channels from the BMP bytes at
    // the padded bottom-up offset. The oracle evaluates the pixel
    // formula at the same source coordinates (never bytes), so a
    // coordinate-mapping bug (rounding, flip, stride) breaks the hash.
    // Map-only: header parse + a 4-row explode per asset.
    Q("mm_bmp_resize",
      (s, d) => {
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), expr(bmpExpr).as("media"))
          .withColumn("img_w", expr(leRead("19", 4)))
          .withColumn("img_h", expr(leRead("23", 4)))
          .withColumn("row_size", expr("((3 * img_w + 3) div 4) * 4"))
          .withColumn("k", explode(expr("sequence(0, 3)")))
          .withColumn("ox", expr("k % 2"))
          .withColumn("oy", expr("k div 2"))
          // nearest-neighbor source pixel in TOP-DOWN image coords
          .withColumn("sx", expr("(ox * img_w) div 2"))
          .withColumn("sy", expr("(oy * img_h) div 2"))
          // byte offset of the source pixel: stored rows are bottom-up
          .withColumn("off",
            expr("55 + (img_h - 1 - sy) * row_size + 3 * sx"))
          .select(col("doc_id"), col("ox").cast("long").as("ox"),
            col("oy").cast("long").as("oy"),
            expr(leRead("off", 1)).as("blue"),
            expr(leRead("off + 1", 1)).as("green"),
            expr(leRead("off + 2", 1)).as("red"))
          .orderBy("doc_id", "oy", "ox")
      },
      Some("""
WITH base AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
              FROM documents WHERE doc_id < 100),
px AS (SELECT doc_id, k % 2 AS ox, k // 2 AS oy,
              ((k % 2) * w) // 2 AS sx, ((k // 2) * h) // 2 AS sy
       FROM base, UNNEST(range(0, 4)) AS t(k))
SELECT doc_id, ox, oy,
       (doc_id * 7 + sx * 13 + sy * 29) % 256 AS blue,
       (doc_id * 7 + sx * 13 + sy * 29 + 97) % 256 AS green,
       (doc_id * 7 + sx * 13 + sy * 29 + 194) % 256 AS red
FROM px ORDER BY doc_id, oy, ox""")),

    // Convolution over REALLY-parsed pixels — the feature-extraction
    // verb as an image kernel: a 3×3 box blur (integer mean of the 9
    // clamp-to-edge taps) where every tap reads its channel bytes from
    // the BMP at the padded bottom-up offset. 9 byte-reads per output
    // pixel, all map-side; per-doc checksums (plus a row-weighted one)
    // keep the output bounded while pinning every blurred value. The
    // oracle runs the same kernel on the pixel FORMULA at the same
    // clamped coordinates — never bytes — so a tap-offset, clamp, or
    // stride bug breaks the hash. Integer division by 9 truncates
    // identically in both engines (all operands non-negative).
    Q("mm_bmp_boxblur",
      (s, d) => {
        def tap(c: Int): String =
          leRead(s"55 + (img_h - 1 - sy) * row_size + 3 * sx + $c", 1)
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), expr(bmpExpr).as("media"))
          .withColumn("img_w", expr(leRead("19", 4)))
          .withColumn("img_h", expr(leRead("23", 4)))
          .withColumn("row_size", expr("((3 * img_w + 3) div 4) * 4"))
          .withColumn("k", explode(expr("sequence(0, img_w * img_h - 1)")))
          .withColumn("x", expr("k % img_w"))
          .withColumn("y", expr("k div img_w")) // top-down image coords
          .withColumn("j", explode(expr("sequence(0, 8)")))
          .withColumn("sx",
            expr("greatest(0L, least(img_w - 1, x + j % 3 - 1))"))
          .withColumn("sy",
            expr("greatest(0L, least(img_h - 1, y + j div 3 - 1))"))
          .select(col("doc_id"), col("x"), col("y"),
            expr(tap(0)).as("tb"), expr(tap(1)).as("tg"),
            expr(tap(2)).as("tr"))
          .groupBy("doc_id", "x", "y")
          .agg(expr("sum(tb) div 9").as("bb"),
            expr("sum(tg) div 9").as("bg"),
            expr("sum(tr) div 9").as("br"))
          .groupBy("doc_id")
          .agg(sum("bb").as("sum_blur_b"), sum("bg").as("sum_blur_g"),
            sum("br").as("sum_blur_r"),
            sum(expr("(y + 1) * br")).as("row_weighted_blur_r"))
          .orderBy("doc_id")
      },
      Some("""
WITH base AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
              FROM documents WHERE doc_id < 100),
pix AS (SELECT doc_id, w, h, i % w AS x, i // w AS y
        FROM base, UNNEST(range(0, w * h)) AS t(i)),
taps AS (SELECT doc_id, w, h, x, y,
                greatest(0, least(w - 1, x + j % 3 - 1)) AS sx,
                greatest(0, least(h - 1, y + j // 3 - 1)) AS sy
         FROM pix, UNNEST(range(0, 9)) AS t(j)),
blur AS (SELECT doc_id, x, y,
                sum((doc_id * 7 + sx * 13 + sy * 29) % 256) // 9 AS bb,
                sum((doc_id * 7 + sx * 13 + sy * 29 + 97) % 256) // 9 AS bg,
                sum((doc_id * 7 + sx * 13 + sy * 29 + 194) % 256) // 9 AS br
         FROM taps GROUP BY doc_id, x, y)
SELECT doc_id,
       CAST(sum(bb) AS BIGINT) AS sum_blur_b,
       CAST(sum(bg) AS BIGINT) AS sum_blur_g,
       CAST(sum(br) AS BIGINT) AS sum_blur_r,
       CAST(sum((y + 1) * br) AS BIGINT) AS row_weighted_blur_r
FROM blur GROUP BY doc_id ORDER BY doc_id""")),

    // NPY float32 decode — the embedding-interchange format, parsed at
    // the IEEE-754 bit level in pure SQL: magic + version validated
    // from bytes, the header length read LE16, the shape extracted by
    // regexp from the decoded header dict, and every float32
    // re-assembled from its 4 LE bytes as sign/exponent/mantissa →
    // (1−2s)·(1+m/2²³)·2^(e−127). The generator picks exponents and
    // mantissas as integers, so every value is an EXACT double in both
    // engines and the differential is hash-exact with no rounding — a
    // bit-level parser bug (byte order, field widths, bias) cannot
    // hide. One row per decoded component; map-only at any scale.
    Q("mm_npy_f32_decode",
      (s, d) => {
        val n = "(8 + pmod(doc_id, 8))"
        val eBits = "(120 + pmod(doc_id + i, 16))"
        val mBits = "pmod(doc_id * 1001 + i * 37, 8388608)"
        val u32 = s"(shiftleft(cast($eBits as bigint), 23) + $mBits)"
        val dict =
          s"""concat("{'descr': '<f4', 'fortran_order': False, 'shape': (", $n, ",), }")"""
        val npy = s"""concat(
          unhex('934E554D5059'), unhex('0100'),
          ${le(s"((10 + length($dict) + 1 + 63) div 64) * 64 - 10", 2)},
          encode(concat($dict,
            repeat(' ', ((10 + length($dict) + 1 + 63) div 64) * 64 - 10
                          - length($dict) - 1),
            '\\n'), 'UTF-8'),
          unhex(array_join(transform(sequence(0, $n - 1),
            i -> concat(lpad(hex($u32 & 255), 2, '0'),
                        lpad(hex(shiftright($u32, 8) & 255), 2, '0'),
                        lpad(hex(shiftright($u32, 16) & 255), 2, '0'),
                        lpad(hex(shiftright($u32, 24) & 255), 2, '0'))), '')))"""
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), expr(npy).as("media"))
          .withColumn("fmt_ok",
            expr("hex(substring(media, 1, 6)) = '934E554D5059'") &&
              expr(s"${leRead("7", 2)} = 1") && // version 1.0 LE = 0x0001
              expr("decode(substring(media, cast(11 as int), " +
                s"cast(${leRead("9", 2)} as int)), 'UTF-8') like '%<f4%'"))
          .withColumn("hlen", expr(leRead("9", 2)))
          .withColumn("n_vals", expr(
            s"cast(regexp_extract(decode(substring(media, 11, cast(hlen as int)), " +
              "'UTF-8'), 'shape.: \\\\((\\\\d+),', 1) as bigint)"))
          .withColumn("i", explode(expr("sequence(0, n_vals - 1)")))
          .withColumn("u", expr(leRead("11 + hlen + 4 * i", 4)))
          .withColumn("sgn", expr("u div 2147483648"))
          .withColumn("e", expr("(u div 8388608) % 256"))
          .withColumn("m", expr("u % 8388608"))
          // double literals need the D suffix: bare 8388608.0 parses as
          // DECIMAL and the division would truncate at decimal scale
          .withColumn("val", expr(
            "(1 - 2 * sgn) * (1.0D + cast(m as double) / 8388608.0D) " +
              "* power(2.0D, e - 127)"))
          .select(col("doc_id"), col("fmt_ok"), col("n_vals"),
            col("i").cast("long").as("i"), col("val"))
          .orderBy("doc_id", "i")
      },
      Some("""
WITH base AS (SELECT doc_id, 8 + doc_id % 8 AS n FROM documents
              WHERE doc_id < 100),
v AS (SELECT doc_id, n, i,
             120 + (doc_id + i) % 16 AS e,
             (doc_id * 1001 + i * 37) % 8388608 AS m
      FROM base, UNNEST(range(0, n)) AS t(i))
SELECT doc_id, true AS fmt_ok, CAST(n AS BIGINT) AS n_vals,
       CAST(i AS BIGINT) AS i,
       (1.0 + m / 8388608.0) * pow(2.0, e - 127) AS val
FROM v ORDER BY doc_id, i""")),

    // Perceptual-hash image near-dup — the multimodal arm of the dedup
    // family (what PDQ/pHash pipelines run before training a vision
    // model): a 16-bit dHash per image from REALLY-parsed BMP bytes
    // (gray = channel mean at a 5×4 nearest-neighbor sample grid, bit k
    // set iff gray(x+1,y) > gray(x,y) — gradients survive re-encode /
    // brightness shifts, which is the point of dHash), then near-dups
    // via BANDED Hamming join: 4 nibble bands, candidates share any
    // (band, nibble) — an equi-join, shuffle ∝ band collisions, never
    // all image pairs — exact filter bit_count(xor) ≤ 2. Per-image
    // report keeps the output N-bounded however dense the collisions.
    // The oracle derives hash and pairs from the pixel FORMULA, never
    // bytes, so a stride/flip/offset bug in the decode breaks the hash.
    Q("mm_image_phash",
      (s, d) => {
        def gray(sx: String, sy: String): String = {
          val off = s"(55 + (img_h - 1 - ($sy)) * row_size + 3 * ($sx))"
          s"((${leRead(off, 1)} + ${leRead(s"($off + 1)", 1)} + " +
            s"${leRead(s"($off + 2)", 1)}) div 3)"
        }
        val hashes = Tables.documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"), expr(bmpExpr).as("media"))
          .withColumn("img_w", expr(leRead("19", 4)))
          .withColumn("img_h", expr(leRead("23", 4)))
          .withColumn("row_size", expr("((3 * img_w + 3) div 4) * 4"))
          .withColumn("k", explode(expr("sequence(0, 15)")))
          .withColumn("gx", expr("k % 4"))
          .withColumn("gy", expr("k div 4"))
          .withColumn("g1",
            expr(gray("(gx * img_w) div 5", "(gy * img_h) div 4")))
          .withColumn("g2",
            expr(gray("((gx + 1) * img_w) div 5", "(gy * img_h) div 4")))
          .groupBy("doc_id")
          .agg(sum(expr("IF(g2 > g1, shiftleft(cast(1 as bigint), " +
            "cast(k as int)), cast(0 as bigint))")).as("phash"))
        val b = hashes
          .withColumn("band", explode(expr("sequence(0, 3)")))
          .withColumn("bval",
            expr("shiftright(phash, cast(band * 4 as int)) % 16"))
        val l = b.select(col("band"), col("bval"), col("doc_id").as("i"),
          col("phash").as("hi"))
        val r = b.select(col("band"), col("bval"), col("doc_id").as("j"),
          col("phash").as("hj"))
        val nd = l.join(r, Seq("band", "bval")).filter(col("i") < col("j"))
          .select("i", "j", "hi", "hj").distinct()
          .filter(expr("bit_count(hi ^ hj) <= 2"))
        val sides = nd.select(col("i").as("doc_id"), col("j").as("partner"))
          .unionAll(nd.select(col("j").as("doc_id"), col("i").as("partner")))
        val agg = sides.groupBy("doc_id")
          .agg(count(lit(1)).as("n_neardup"), min("partner").as("min_partner"))
        hashes.join(agg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("phash"),
            coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
            col("min_partner"))
          .orderBy("doc_id")
      },
      Some("""
WITH base AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
              FROM documents WHERE doc_id < 100),
px AS (SELECT doc_id, k,
              (((k % 4) * w) // 5) AS x1, ((((k % 4) + 1) * w) // 5) AS x2,
              (((k // 4) * h) // 4) AS sy
       FROM base, UNNEST(range(0, 16)) AS t(k)),
gr AS (SELECT doc_id, k,
         (((doc_id*7 + x1*13 + sy*29) % 256) + ((doc_id*7 + x1*13 + sy*29 + 97) % 256)
          + ((doc_id*7 + x1*13 + sy*29 + 194) % 256)) // 3 AS g1,
         (((doc_id*7 + x2*13 + sy*29) % 256) + ((doc_id*7 + x2*13 + sy*29 + 97) % 256)
          + ((doc_id*7 + x2*13 + sy*29 + 194) % 256)) // 3 AS g2
       FROM px),
hsh AS (SELECT doc_id, CAST(sum(CASE WHEN g2 > g1 THEN 1 << k ELSE 0 END) AS BIGINT) AS phash
        FROM gr GROUP BY doc_id),
b AS (SELECT doc_id, phash, band, (phash >> (band * 4)) % 16 AS bval
      FROM hsh, UNNEST(range(0, 4)) AS t(band)),
nd AS (SELECT i, j FROM (
         SELECT DISTINCT l.doc_id AS i, r.doc_id AS j, l.phash AS hi, r.phash AS hj
         FROM b l JOIN b r ON l.band = r.band AND l.bval = r.bval AND l.doc_id < r.doc_id)
       WHERE bit_count(xor(hi, hj)) <= 2),
sides AS (SELECT i AS doc_id, j AS partner FROM nd
          UNION ALL SELECT j AS doc_id, i AS partner FROM nd),
ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_neardup, min(partner) AS min_partner
       FROM sides GROUP BY doc_id)
SELECT h.doc_id, h.phash,
       COALESCE(ag.n_neardup, 0) AS n_neardup, ag.min_partner
FROM hsh h LEFT JOIN ag ON h.doc_id = ag.doc_id
ORDER BY h.doc_id"""))
  )
}
