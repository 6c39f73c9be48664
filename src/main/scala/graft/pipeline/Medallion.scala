package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.SimilarityPipeline

/** The reference's entire DAG (/root/reference/dags/final_pipeline.py:
  * 52-92) as one idempotent library call over a parquet warehouse:
  *
  *   check_if_tables_exist ─(missing)→ construct_bronze ─┐
  *         └─(present)──────────────────────────────────┤
  *   ingest_and_score (incremental, skip already-done targets)  [I1/I2]
  *   create_or_update_datamart (top-k + tie flag, anti-join dedup,
  *     dim upsert)                                              [J6/J7/I3]
  *   create_or_replace_views (7a, 7b, 7b')                      [K6]
  *
  * Airflow's branch operator and trigger rules become plain control
  * flow (SURVEY.md §2.9 I4 — orchestration is not an engine feature).
  * Re-running against an already-populated warehouse is a no-op at
  * every stage: bronze is existence-checked, the fact append is
  * anti-joined against the warehouse (never re-inserting a pair), and
  * empty deltas skip their writes entirely (the reference's
  * early-exit guards, tanimoto.py:152-153, datamart.py:82-83).
  */
object Medallion {

  final case class Report(
      bronzeConstructed: Boolean,
      newFacts: Long,
      newDimRows: Long,
      viewRows: Map[String, Long])

  private def exists(path: String): Boolean = Files.exists(Paths.get(path))

  /** Run the full pipeline; `warehouse` is the medallion root. */
  def run(spark: SparkSession, sfDir: String, warehouse: String): Report = {
    // ── bronze: construct only what is missing (db_interact.py:54-84) ──
    val bronzeEmb = s"$warehouse/bronze_embeddings"
    val bronzeDocs = s"$warehouse/bronze_documents"
    val constructed = !exists(bronzeEmb)
    if (constructed) {
      Tables.embeddings(spark, sfDir).write.parquet(bronzeEmb)
      Tables.documents(spark, sfDir).write.parquet(bronzeDocs)
    }

    // ── incremental ingest + score (tanimoto.py:150-197) ──
    // Partitioned by target for I2 idempotence: dynamic-partition
    // overwrite rewrites only the targets actually recomputed.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val pairsDir = s"$warehouse/similarity_pairs"
    val emb = spark.read.parquet(bronzeEmb)
    val done: DataFrame =
      if (exists(pairsDir)) spark.read.parquet(pairsDir)
        .select(col("target_id")).distinct()
      else spark.emptyDataFrame.withColumn("target_id", lit(0L)).limit(0)
    val targets = emb.filter(col("label") === 0)
      .select(col("vec_id").as("target_id"))
      .join(done, Seq("target_id"), "left_anti") // J9: skip finished targets
    if (!targets.isEmpty) {
      SimilarityPipeline.pairs(spark, sfDir)
        .join(targets, Seq("target_id"), "left_semi")
        .write.mode(SaveMode.Overwrite).partitionBy("target_id")
        .parquet(pairsDir)
    }

    // ── datamart: top-k + tie flag, dedup-on-append (datamart.py) ──
    val factDir = s"$warehouse/silver_fact"
    val dimDir = s"$warehouse/silver_dim"
    // partition-directory columns read back as int; restore the id type
    // unordered: the facts land in a parquet fact table, where a global
    // ORDER BY would pay a range exchange for ordering parquet keeps no
    // promise about anyway
    val topk = SimilarityPipeline.tieFlagUnordered(
      spark.read.parquet(pairsDir)
        .select(col("target_id").cast("long"), col("source_id"), col("sim")))
      .select("target_id", "source_id", "sim", "tie_flag")
    val existingFact: Option[DataFrame] =
      if (exists(factDir)) Some(spark.read.parquet(factDir)) else None
    val freshFacts = existingFact match {
      case Some(f) => topk.join(f.select("target_id", "source_id"),
        Seq("target_id", "source_id"), "left_anti") // J6
      case None => topk
    }
    val nFacts = freshFacts.count()
    if (nFacts > 0) // I3: append-only with dedup-on-ingest
      freshFacts.write.mode(SaveMode.Append).parquet(factDir)

    // dim: ids appearing in either fact role, not yet in the dim (J7/A7)
    val factNow = spark.read.parquet(factDir)
    val ids = factNow.select(col("target_id").as("id"))
      .union(factNow.select(col("source_id").as("id"))).distinct()
    val existingDim: Option[DataFrame] =
      if (exists(dimDir)) Some(spark.read.parquet(dimDir)) else None
    val draftIds = existingDim match {
      case Some(dm) => ids.join(dm.select("id"), Seq("id"), "left_anti")
      case None => ids
    }
    // enrich from bronze documents (J3 analog; doc_id == vec_id domain)
    val freshDim = draftIds.join(spark.read.parquet(bronzeDocs),
        col("id") === col("doc_id"))
      .select(col("id"), col("lang"), col("source"), col("n_chars"))
    val nDim = freshDim.count()
    if (nDim > 0)
      freshDim.write.mode(SaveMode.Append).parquet(dimDir)

    // ── views (views_p1.py:3-43): CREATE OR REPLACE == overwrite ──
    val dim = spark.read.parquet(dimDir)
    val tDim = dim.select(col("id").as("t_id"), col("n_chars").as("t_attr"))
    val sDim = dim.select(col("id").as("s_id"), col("n_chars").as("s_attr"))
    val joined = factNow
      .join(tDim, col("target_id") === col("t_id"))
      .join(sDim, col("source_id") === col("s_id"))
    // same DECIMAL-sum discipline as the declared view_7a query: sims
    // are exact 6dp values, so the sum (and thus the average) is
    // order-independent — a re-run over reshuffled partitions produces
    // bit-identical view rows
    val v7a = factNow.groupBy("source_id")
      .agg((sum(col("sim").cast("decimal(10,6)")).cast("double") /
        count(lit(1))).as("avg_sim"), count(lit(1)).as("n_pairs"))
    val v7b = joined.groupBy("source_id")
      .agg(avg(abs(col("s_attr") - col("t_attr"))).as("avg_attr_diff"))
    val v7b2 = joined
      .filter(col("s_attr").isNotNull && col("t_attr").isNotNull)
      .groupBy("source_id")
      .agg(avg(abs(col("s_attr") - col("t_attr"))).as("avg_attr_diff"))
    val viewRows = Map("view_7a" -> v7a, "view_7b" -> v7b, "view_7b_nonull" -> v7b2)
      .map { case (name, df) =>
        df.write.mode(SaveMode.Overwrite).parquet(s"$warehouse/$name")
        name -> spark.read.parquet(s"$warehouse/$name").count()
      }

    Report(constructed, nFacts, nDim, viewRows)
  }
}
