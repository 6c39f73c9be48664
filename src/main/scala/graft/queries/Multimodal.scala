package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media carried as opaque `binary` columns
  * with typed metadata derived per row, and per-frame sampling that fans
  * one asset out into N frame rows.
  *
  * No image/audio codecs exist in this environment, so the *decode* step
  * is a clearly-marked deterministic STUB (arithmetic on byte length +
  * content digest standing in for pixel decoding). Everything around it
  * — binary encoding, schema, per-frame explode fan-out, digesting,
  * partition-friendly shapes — is real Spark plumbing and oracle-checked.
  * A production build swaps `fakeWidth/fakeHeight` for a real decoder
  * inside the same dataflow (see graft.multimodal.DecodeStub for the
  * mapPartitions batch-shaped variant).
  */
object Multimodal {

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
GROUP BY modality ORDER BY modality"""))
  )
}
