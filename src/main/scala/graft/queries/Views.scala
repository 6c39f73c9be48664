package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's three SQL aggregate views (views_p1.py:3-43,
  * views_part1.sql:1-29), re-hosted on the embeddings-similarity
  * datamart: the silver fact is the flagship's per-target top-10 pairs;
  * the role-playing dimension is `documents` (doc_id == vec_id), with an
  * `alogp`-analog numeric attribute made nullable deterministically so
  * the NULL-semantics distinction between views 7b and 7b' is observable
  * (SURVEY.md §7.4: avg skips NULLs; the no-NULL variant differs only in
  * all-NULL groups).
  */
object Views {

  /** silver_fact: per-target top-10 similarity pairs (datamart.py:28-58). */
  def silverFact(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("target_id")
      .orderBy(col("sim").desc, col("source_id").asc)
    SimilarityPipeline.pairs(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SimilarityPipeline.TopK)
      .select("target_id", "source_id", "sim")
  }

  /** silver_dim: documents with the nullable alogp-analog attribute. */
  def silverDim(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      when(col("source") === "src3", lit(null)).otherwise(col("n_chars"))
        .as("attr"))

  /** Shared WITH-clause prefix for the fact in oracle SQL. */
  val factCte: String = """
WITH t AS (
  SELECT vec_id AS target_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings WHERE label = 0
), s AS (
  SELECT vec_id AS source_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings WHERE label <> 0
), p AS (
  SELECT t.target_id, s.source_id,
         round(list_sum(list_transform(range(1, len(t.e)+1), i -> t.e[i] * s.e[i])) / (t.nrm * s.nrm), 6) AS sim
  FROM t CROSS JOIN s WHERE t.target_id <> s.source_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY target_id ORDER BY sim DESC, source_id ASC) AS rn FROM p
), fact AS (
  SELECT target_id, source_id, sim FROM r WHERE rn <= 10
), dim AS (
  SELECT doc_id, CASE WHEN source = 'src3' THEN NULL ELSE n_chars END AS attr
  FROM documents
)"""

  def qs: Seq[Q] = Seq(
    // View 7a: mean similarity per source molecule (views_p1.py:9-12)
    // avg is computed as exact-DECIMAL sum (sims are exact 6dp values)
    // cast to double, divided by count: bit-identical in both engines.
    // round(avg(...), 6) would NOT be — the average of 6dp decimals can
    // land exactly on a .5 rounding boundary, where Spark's HALF_UP and
    // DuckDB's float rounding disagree.
    Q("view_7a_avg_similarity",
      (s, d) => silverFact(s, d)
        .groupBy("source_id")
        .agg(
          (sum(col("sim").cast("decimal(10,6)")).cast("double") /
            count(lit(1))).as("avg_sim"),
          count(lit(1)).as("n_pairs"))
        .orderBy("source_id"),
      Some(factCte + """
SELECT source_id,
       CAST(sum(CAST(sim AS DECIMAL(10,6))) AS DOUBLE) / count(*) AS avg_sim,
       count(*) AS n_pairs
FROM fact GROUP BY source_id ORDER BY source_id""")),

    // View 7b: mean |attr(source) - attr(target)| per source, NULLs
    // skipped by avg; all-NULL groups surface with NULL avg
    // (views_p1.py:16-28)
    Q("view_7b_avg_attr_diff",
      (s, d) => {
        val dim = silverDim(s, d)
        val tDim = dim.select(col("doc_id").as("t_doc"), col("attr").as("t_attr"))
        val sDim = dim.select(col("doc_id").as("s_doc"), col("attr").as("s_attr"))
        silverFact(s, d)
          .join(tDim, col("target_id") === col("t_doc"))
          .join(sDim, col("source_id") === col("s_doc"))
          .groupBy("source_id")
          .agg(round(avg(abs(col("s_attr") - col("t_attr"))), 6).as("avg_attr_diff"))
          .orderBy("source_id")
      },
      Some(factCte + """
SELECT source_id, round(avg(abs(sd.attr - td.attr)), 6) AS avg_attr_diff
FROM fact
JOIN dim td ON fact.target_id = td.doc_id
JOIN dim sd ON fact.source_id = sd.doc_id
GROUP BY source_id ORDER BY source_id""")),

    // View 7b': same but with explicit IS NOT NULL on both sides —
    // differs from 7b only for groups whose rows are all NULL
    // (views_p1.py:31-43)
    Q("view_7b_nonull_attr_diff",
      (s, d) => {
        val dim = silverDim(s, d)
        val tDim = dim.select(col("doc_id").as("t_doc"), col("attr").as("t_attr"))
        val sDim = dim.select(col("doc_id").as("s_doc"), col("attr").as("s_attr"))
        silverFact(s, d)
          .join(tDim, col("target_id") === col("t_doc"))
          .join(sDim, col("source_id") === col("s_doc"))
          .filter(col("s_attr").isNotNull && col("t_attr").isNotNull)
          .groupBy("source_id")
          .agg(round(avg(abs(col("s_attr") - col("t_attr"))), 6).as("avg_attr_diff"))
          .orderBy("source_id")
      },
      Some(factCte + """
SELECT source_id, round(avg(abs(sd.attr - td.attr)), 6) AS avg_attr_diff
FROM fact
JOIN dim td ON fact.target_id = td.doc_id
JOIN dim sd ON fact.source_id = sd.doc_id
WHERE sd.attr IS NOT NULL AND td.attr IS NOT NULL
GROUP BY source_id ORDER BY source_id"""))
  )
}
