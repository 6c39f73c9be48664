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
ORDER BY vec_id, idx""")),

    // K-means over the embedding column (K=4, two unrolled Lloyd
    // iterations, seeds = the K lowest vec_ids) — the semantic-
    // clustering primitive behind diversity sampling, semantic dedup,
    // and topic-balanced mixes. Engine-exact across both engines by
    // construction, no feature any SQL engine lacks:
    //   * distances are ROW-LOCAL left folds over the dim axis
    //     (zip_with+aggregate here, list_reduce in DuckDB — same
    //     association, so the doubles are bit-identical);
    //   * argmin is min(struct(dist, cid)): total order, ties to the
    //     lowest cluster id;
    //   * centroid means sum per-dim as DECIMAL(38,15) — exact and
    //     shuffle-order-independent, unlike a double sum — and divide
    //     once in double.
    // 100 TB shape: centroids are K×dim (broadcast, always tiny); each
    // iteration is one broadcast cross join (map-side, K× row
    // amplification) + partial-agg min on vec_id + partial-agg decimal
    // sum on (cid, dim) — two narrow shuffles per iteration,
    // independent of K, no driver-side centroid collect anywhere.
    Q("emb_kmeans_centroids",
      (s, d) => kmeans(s, d)._2
        .select(col("cid").as("cluster_id"),
          col("pos").cast("long").as("idx"),
          round(col("comp"), 6).as("val"), col("n").as("n_vecs"))
        .orderBy("cluster_id", "idx"),
      Some(s"""
WITH $kmeansSql
SELECT cid AS cluster_id, CAST(idx AS BIGINT) AS idx, round(comp, 6) AS val,
       n AS n_vecs
FROM s2 ORDER BY cluster_id, idx""")),

    // Final cluster assignment (vec → nearest updated-once centroid,
    // squared distance kept): the per-document cluster label the
    // downstream mix/dedup stages key on. dist is to the iteration-1
    // centroid the final assignment used — identical arithmetic both
    // engines (row-local fold), rounded only at the output edge.
    Q("emb_kmeans_assign",
      (s, d) => kmeans(s, d)._1
        .select(col("vec_id"), col("cid").as("cluster_id"),
          round(col("dist"), 6).as("dist"))
        .orderBy("vec_id"),
      Some(s"""
WITH $kmeansSql
SELECT vec_id, cid AS cluster_id, round(dist, 6) AS dist
FROM a2 ORDER BY vec_id""")),

    // Diversity sampling: the m vectors CLOSEST to each centroid — a
    // cluster-stratified subset that preserves topic coverage at a
    // fraction of the corpus (the embedding-space analog of the
    // domain-mix sampler). Rank inside each cluster is (dist, vec_id):
    // total order, no ties. One extra narrow shuffle (cluster key) on
    // top of the assignment.
    Q("emb_diversity_sample",
      (s, d) => {
        val m = 8
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cid").orderBy(col("dist"), col("vec_id"))
        kmeans(s, d)._1
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= m)
          .select(col("cid").as("cluster_id"), col("rk"),
            col("vec_id"), round(col("dist"), 6).as("dist"))
          .orderBy("cluster_id", "rk")
      },
      Some(s"""
WITH $kmeansSql
SELECT cid AS cluster_id, rk, vec_id, round(dist, 6) AS dist
FROM (SELECT cid, vec_id, dist,
             CAST(row_number() OVER (PARTITION BY cid
                    ORDER BY dist, vec_id) AS BIGINT) AS rk
      FROM a2)
WHERE rk <= 8 ORDER BY cluster_id, rk"""))
  )

  /** Shared K-means machinery (K=4, two Lloyd iterations, seeds = the
    * K lowest vec_ids). Returns (final assignment with its squared
    * distance, final per-(cid, dim) centroid stats). See
    * emb_kmeans_centroids scaladoc for the determinism contract.
    */
  private def kmeans(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val it = kmeansIterations(s, d)
    (it.last._1, it.last._2)
  }

  /** All per-iteration (assignment, stats) pairs — exposed to the spec
    * so Lloyd's monotonicity law (objective never increases between
    * iterations) can be asserted on the REAL pipeline, not a replica.
    */
  private[queries] def kmeansIterations(
      s: org.apache.spark.sql.SparkSession, d: String)
      : Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = {
    val K = 4
    val iters = 2
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
    val seedW = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
    var centroids = v.orderBy("vec_id").limit(K)
      .select((row_number().over(seedW) - 1).cast("long").as("cid"),
        col("x").as("c"))
    val out = Seq.newBuilder[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
    for (_ <- 1 to iters) {
      val assigned = v.crossJoin(broadcast(centroids))
        .withColumn("dist",
          aggregate(zip_with(col("x"), col("c"),
            (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, e) => acc + e))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("cid"), col("x"))).as("m"))
        .select(col("vec_id"), col("m.dist").as("dist"),
          col("m.cid").as("cid"), col("m.x").as("x"))
      val stats = assigned
        .select(col("cid"), posexplode(col("x")))
        .groupBy("cid", "pos")
        .agg(sum(col("col").cast("decimal(38,15)")).as("sm"),
          count(lit(1)).as("n"))
        .withColumn("comp", col("sm").cast("double") / col("n"))
      centroids = stats.groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("comp")))),
          t => t.getField("comp")).as("c"))
      out += ((assigned, stats))
    }
    out.result()
  }

  /** DuckDB CTE chain for [[kmeans]]: seeds c0 → assign a1 (dist kept)
    * → decimal-mean stats s1 → centroids c1 → assign a2 → stats s2.
    */
  private val kmeansSql: String = """v AS (
  SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
              x AS c
       FROM (SELECT * FROM v ORDER BY vec_id LIMIT 4)),
d1 AS (SELECT v.vec_id, v.x, c0.cid,
              list_reduce(list_transform(range(1, len(v.x) + 1),
                i -> (v.x[i] - c0.c[i]) * (v.x[i] - c0.c[i])),
                (a, b) -> a + b) AS dist
       FROM v CROSS JOIN c0),
a1 AS (SELECT vec_id, x, cid, dist FROM
        (SELECT vec_id, x, cid, dist,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         FROM d1)
       WHERE rn = 1),
e1 AS (SELECT cid, unnest(list_transform(range(1, len(x) + 1),
         i -> {'idx': i - 1, 'val': x[i]}), recursive := true)
       FROM a1),
s1 AS (SELECT cid, idx,
              CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS comp,
              count(*) AS n
       FROM e1 GROUP BY cid, idx),
c1 AS (SELECT cid, list(comp ORDER BY idx) AS c FROM s1 GROUP BY cid),
d2 AS (SELECT v.vec_id, v.x, c1.cid,
              list_reduce(list_transform(range(1, len(v.x) + 1),
                i -> (v.x[i] - c1.c[i]) * (v.x[i] - c1.c[i])),
                (a, b) -> a + b) AS dist
       FROM v CROSS JOIN c1),
a2 AS (SELECT vec_id, x, cid, dist FROM
        (SELECT vec_id, x, cid, dist,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         FROM d2)
       WHERE rn = 1),
e2 AS (SELECT cid, unnest(list_transform(range(1, len(x) + 1),
         i -> {'idx': i - 1, 'val': x[i]}), recursive := true)
       FROM a2),
s2 AS (SELECT cid, idx,
              CAST(sum(CAST(val AS DECIMAL(38,15))) AS DOUBLE) / count(*) AS comp,
              count(*) AS n
       FROM e2 GROUP BY cid, idx)"""
}
