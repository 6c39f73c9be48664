package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash

/** Training-set curation operators — the selection/assembly stage a
  * large-scale pipeline runs AFTER text analysis and dedup: train/test
  * decontamination, deterministic stratified sampling, reproducible
  * shuffle-sharding, and per-shard token-budget packing.
  *
  * All randomness is the engine-portable [[TextHash]] rolling hash of a
  * salted key, never `rand()`: every operator is a pure function of the
  * input tables, so results are reproducible run-to-run, engine-to-
  * engine (the DuckDB oracles mirror the arithmetic exactly), and —
  * the property that matters operationally — stable under cluster
  * resizing, task retries, and partition reordering.
  */
object Curation {

  /** Salt for sampling/shuffle keys; changing it draws an independent
    * deterministic sample/order.
    */
  val Salt = "graft_seed_42_"

  /** Shards for shuffle/packing: in production ≈ number of training
    * readers; each shard's rows arrive in deterministic hash order.
    */
  val Shards = 8

  private def hkeyExpr: String =
    s"tok_hash(concat('$Salt', cast(doc_id as string)))"

  private def sqlHkey: String =
    TextHash.sqlTokenHash(s"'$Salt' || doc_id::VARCHAR")

  def qs: Seq[Q] = Seq(
    // Train/test decontamination: flag training documents sharing >= 2
    // distinct shingles with any held-out (source = 'src3') document.
    // Inverted-index equi-join on shingle — shuffle proportional to
    // shared-shingle postings, never |train| x |test| — with the
    // boilerplate df-cap on the held-out side (a shingle in more than
    // DfCap eval docs is template noise, not contamination signal).
    Q("curation_decontam_overlap",
      (s, d) => {
        val docs = Dedup.docShingles(s, d)
        val tpost = docs.filter(col("source") === "src3")
          .select(col("doc_id").as("test_id"), explode(col("shs")).as("sh"))
        val trpost = docs.filter(col("source") =!= "src3")
          .select(col("doc_id").as("train_id"), explode(col("shs")).as("sh"))
        val hot = tpost.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > Dedup.DfCap).select("sh")
        val tp = tpost.join(hot, Seq("sh"), "left_anti")
        trpost.join(tp, Seq("sh"))
          .groupBy("train_id", "test_id").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .groupBy("train_id")
          .agg(count(lit(1)).as("n_test_docs"), max("n_shared").as("max_shared"))
          .orderBy("train_id")
      },
      Some(s"""
WITH d AS (SELECT doc_id, source, ${Dedup.sqlShingles("text")} AS shs FROM documents),
tpost AS (SELECT doc_id AS test_id, unnest(shs) AS sh FROM d WHERE source = 'src3'),
trpost AS (SELECT doc_id AS train_id, unnest(shs) AS sh FROM d WHERE source <> 'src3'),
dfreq AS (SELECT sh, count(*) AS df FROM tpost GROUP BY sh),
tp AS (SELECT test_id, tpost.sh AS sh FROM tpost JOIN dfreq ON tpost.sh = dfreq.sh
       WHERE dfreq.df <= ${Dedup.DfCap}),
shared AS (SELECT train_id, test_id, count(*) AS n_shared
           FROM trpost JOIN tp ON trpost.sh = tp.sh
           GROUP BY train_id, test_id HAVING count(*) >= 2)
SELECT train_id, count(*) AS n_test_docs, max(n_shared) AS max_shared
FROM shared GROUP BY train_id ORDER BY train_id""")),

    // Deterministic stratified sample: 10% per language stratum, chosen
    // by salted-hash order (not rand()) so the sample is reproducible
    // and stable under any physical reordering. One shuffle on the
    // stratum key; per-stratum windows run partition-parallel.
    Q("curation_stratified_sample",
      (s, d) => {
        TextHash.register(s)
        val w = Window.partitionBy("lang")
          .orderBy(col("hkey").asc, col("doc_id").asc)
        val wAll = Window.partitionBy("lang")
        Tables.documents(s, d)
          .withColumn("hkey", expr(hkeyExpr))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wAll))
          .filter(col("rn") <= ceil(col("n") * 0.1))
          .select("doc_id", "lang", "hkey")
          .orderBy("doc_id")
      },
      Some(s"""
WITH h AS (SELECT doc_id, lang, $sqlHkey AS hkey FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY hkey ASC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM h)
SELECT doc_id, lang, hkey FROM r WHERE rn <= ceil(n * 0.1) ORDER BY doc_id""")),

    // Reproducible corpus shuffle + sharding: global training order =
    // ORDER BY salted hash (a distributed range-partitioned sort — no
    // single-task stage), shard = hash mod Shards so each of N readers
    // consumes a deterministic, disjoint, hash-uniform slice.
    Q("curation_reproducible_shuffle",
      (s, d) => {
        TextHash.register(s)
        Tables.documents(s, d)
          .withColumn("hkey", expr(hkeyExpr))
          .withColumn("shard", pmod(col("hkey"), lit(Shards.toLong)))
          .select("doc_id", "shard", "hkey")
          .orderBy("hkey", "doc_id")
      },
      Some(s"""
SELECT doc_id, $sqlHkey % $Shards AS shard, $sqlHkey AS hkey
FROM documents ORDER BY hkey, doc_id""")),

    // Per-shard token-budget packing: within each shard, take documents
    // in deterministic hash order while the running token total stays
    // under the shard budget — the assembly step that cuts a corpus to
    // a target token count. The running sum is windowed PER SHARD
    // (never a global single-task window); total budget = Shards x
    // per-shard budget.
    Q("curation_token_budget_pack",
      (s, d) => {
        TextHash.register(s)
        val w = Window.partitionBy("shard")
          .orderBy(col("hkey").asc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.documents(s, d)
          .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
          .withColumn("hkey", expr(hkeyExpr))
          .withColumn("shard", pmod(col("hkey"), lit(Shards.toLong)))
          .withColumn("cum_tokens", sum("n_tokens").over(w))
          .filter(col("cum_tokens") <= 3000)
          .select("doc_id", "shard", "n_tokens", "cum_tokens")
          .orderBy("shard", "cum_tokens", "doc_id")
      },
      Some(s"""
WITH h AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
                  $sqlHkey AS hkey, $sqlHkey % $Shards AS shard
           FROM documents),
c AS (SELECT doc_id, shard, n_tokens,
             -- DuckDB windowed sum over BIGINT yields HUGEINT (lands as
             -- float64 in the compare); CAST pins it to int64 to match
             -- Spark's long cum_tokens.
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY hkey ASC, doc_id ASC
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
      FROM h)
SELECT doc_id, shard, n_tokens, cum_tokens FROM c
WHERE cum_tokens <= 3000 ORDER BY shard, cum_tokens, doc_id"""))
  )
}
