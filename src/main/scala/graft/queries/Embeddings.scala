package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorExpressions

/** Embedding-column preprocessing for the training-data pipeline:
  * unit-normalization (before cosine ANN the dot product IS the cosine)
  * and symmetric int8 quantization (4× storage cut for 100 TB embedding
  * stores). Results are verified value-by-value: each vector explodes to
  * (vec_id, idx, value) rows so the oracle hash-compares every
  * component, not a summary.
  *
  * Quantization rounds via floor(x + 0.5) — identical semantics in both
  * engines, unlike round-half-up vs round-half-even ambiguity.
  */
object Embeddings {

  def qs: Seq[Q] = Seq(
    Q("emb_normalize",
      (s, d) => {
        VectorExpressions.register(s)
        Tables.embeddings(s, d)
          .withColumn("nrm", expr("norm_f(embedding)"))
          .select(col("vec_id"), col("nrm"),
            posexplode(col("embedding").cast("array<double>")))
          .select(col("vec_id"), col("pos").cast("long").as("idx"),
            round(col("col") / col("nrm"), 6).as("val"))
          .orderBy("vec_id", "idx")
      },
      Some("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
           FROM embeddings)
SELECT vec_id, idx, val FROM (
  SELECT vec_id, unnest(list_transform(range(1, len(v) + 1),
           i -> {'idx': i - 1, 'val': round(v[i] / nrm, 6)}), recursive := true)
  FROM e)
ORDER BY vec_id, idx""")),

    Q("emb_quantize_int8",
      (s, d) => {
        val dv = col("embedding").cast("array<double>")
        Tables.embeddings(s, d)
          .withColumn("scale", array_max(transform(dv, x => abs(x))) / 127.0)
          .select(col("vec_id"), col("scale"), posexplode(dv))
          .select(col("vec_id"), col("pos").cast("long").as("idx"),
            when(col("scale") === 0.0, 0L)
              .otherwise(floor(col("col") / col("scale") + 0.5).cast("long"))
              .as("q"))
          .orderBy("vec_id", "idx")
      },
      Some("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
           FROM embeddings)
SELECT vec_id, idx, q FROM (
  SELECT vec_id, unnest(list_transform(range(1, len(v) + 1),
           i -> {'idx': i - 1,
                 'q': CASE WHEN scale = 0 THEN 0
                           ELSE CAST(floor(v[i] / scale + 0.5) AS BIGINT) END}),
         recursive := true)
  FROM e)
ORDER BY vec_id, idx""")),

    // Matryoshka truncation — serve a cheaper retrieval tier from the
    // PREFIX of each embedding (the nesting property MRL-style models
    // train for): keep the first 16 dims and re-unit-normalize, so
    // the truncated dot product is again a cosine. Map-only at any
    // scale; the 4× dim cut compounds with int8 quantization for the
    // coarse tier that PQ/IVF then re-ranks. Verified component-wise
    // like emb_normalize (float→double is exact, so both engines see
    // identical inputs).
    Q("emb_matryoshka_truncate",
      (s, d) => {
        VectorExpressions.register(s)
        Tables.embeddings(s, d)
          .withColumn("tr", slice(col("embedding"), 1, 16))
          .withColumn("nrm", expr("norm_f(tr)"))
          .select(col("vec_id"), col("nrm"),
            posexplode(col("tr").cast("array<double>")))
          .select(col("vec_id"), col("pos").cast("long").as("idx"),
            round(col("col") / col("nrm"), 6).as("val"))
          .orderBy("vec_id", "idx")
      },
      Some("""
WITH e AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v,
                  sqrt(list_sum(list_transform((embedding::DOUBLE[])[1:16], x -> x*x))) AS nrm
           FROM embeddings)
SELECT vec_id, idx, val FROM (
  SELECT vec_id, unnest(list_transform(range(1, len(v) + 1),
           i -> {'idx': i - 1, 'val': round(v[i] / nrm, 6)}), recursive := true)
  FROM e)
ORDER BY vec_id, idx"""))
  )
}
