package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Persistent IVF ANN index — the similarity-search counterpart of
  * [[DedupIndex]]: quantizer training and corpus assignment happen ONCE
  * at build time and land in parquet state; queries read the state, so
  * serving cost never includes clustering the corpus.
  *
  *  - `cent/` (cent_id, c_emb, c_nrm) — the coarse quantizer
  *    ([[SimilaritySearch.kmeansCents]]: deterministic init + one Lloyd
  *    iteration, oracle-mirrored arithmetic). Tiny; broadcast at query
  *    time.
  *  - `vec/`  (vec_id, embedding, nrm) PARTITIONED BY cell — the IVF
  *    posting lists as partition directories. A query probing nprobe
  *    cells touches only those directories: partition pruning IS the
  *    inverted-file property, expressed in the storage layout instead
  *    of a bespoke file format.
  *
  * At 100 TB the build is one clustering pass + one cell-partitioned
  * write (both corpus-scale, both once); per-query cost is
  * nprobe × (cell size) — never |N| — and the state serves any number
  * of query batches. Rebuild when the corpus drifts from the quantizer
  * (the standard IVF retraining trade).
  */
object AnnIndex {

  /** Top-`nprobe` cell assignment of (vec_id, embedding, nrm, ...) rows
    * against a broadcast centroid set — shared by build (nprobe=1) and
    * query (the recall dial). Metadata columns beyond the vector triple
    * (e.g. a `label`) ride along untouched, so a build can persist them
    * into the cell partitions for filtered search.
    */
  def assignCells(df: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val keep = df.columns.map(col).toSeq
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_c").desc, col("cent_id").asc)
    df.crossJoin(broadcast(cents))
      .withColumn("cos_c",
        round(expr("dot_f(embedding, c_emb)") / (col("nrm") * col("c_nrm")), 6))
      .withColumn("rnc", row_number().over(w))
      .filter(col("rnc") <= nprobe)
      .select(keep :+ col("cent_id").as("cell"): _*)
  }

  /** Train the quantizer on `train`, assign `vecs` to cells, persist
    * both under `stateDir`. The quantizer is pluggable: the default is
    * the oracle-exact single-Lloyd [[SimilaritySearch.kmeansCents]];
    * production builds pass [[SimilaritySearch.kmeansCentsAvg]] (plain
    * `avg`, multi-iteration — no per-(cell,dim) collect_list, so the
    * training reduction is safe at any corpus size).
    */
  def build(s: SparkSession, train: DataFrame, vecs: DataFrame,
      stateDir: String,
      quantizer: DataFrame => DataFrame = SimilaritySearch.kmeansCents): Unit = {
    VectorExpressions.register(s)
    quantizer(train)
      .write.mode("overwrite").parquet(s"$stateDir/cent")
    val cents = s.read.parquet(s"$stateDir/cent")
    assignCells(vecs, cents, nprobe = 1)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$stateDir/vec")
  }

  /** Fold `newVecs` into the index WITHOUT retraining the quantizer:
    * assign against the persisted centroids and append into the cell
    * partitions — only the touched cell directories gain files, and
    * existing data is never rewritten (delta-proportional, like
    * [[DedupIndex.update]]). Queries pick the new vectors up
    * immediately. Retrain (a fresh [[build]]) when the corpus drifts
    * from the quantizer — appending cannot move centroids, the
    * standard IVF staleness trade.
    */
  def append(s: SparkSession, newVecs: DataFrame, stateDir: String): Unit = {
    VectorExpressions.register(s)
    val cents = s.read.parquet(s"$stateDir/cent")
    assignCells(newVecs, cents, nprobe = 1)
      .write.mode("append").partitionBy("cell").parquet(s"$stateDir/vec")
  }

  /** Top-`topK` cosine neighbours for `queries` against the index at
    * `stateDir`, probing each query's `nprobe` nearest cells. The
    * broadcast query-cell set lets dynamic partition pruning restrict
    * the `vec/` scan to probed cell directories.
    *
    * `candidateFilter` is the filtered-ANN hook: a predicate over the
    * metadata columns persisted into `vec/` (e.g. `col("label") === 1`),
    * applied directly on the state scan — parquet pushes it down, so
    * selectivity cuts candidate volume BEFORE the cell join and the
    * re-rank runs among qualifying vectors only (pre-filter, never
    * post-filter top-k).
    */
  def query(s: SparkSession, queries: DataFrame, stateDir: String,
      topK: Int, nprobe: Int,
      candidateFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    VectorExpressions.register(s)
    val cents = s.read.parquet(s"$stateDir/cent")
    val q = assignCells(queries, cents, nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_norm"), col("cell"))
    val scan = s.read.parquet(s"$stateDir/vec")
    val vecs = candidateFilter.fold(scan)(scan.filter)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb2"),
        col("nrm").as("c_norm"), col("cell"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("c_id").asc)
    vecs.join(broadcast(q), Seq("cell"))
      .withColumn("cos",
        round(expr("dot_f(q_emb, c_emb2)") / (col("q_norm") * col("c_norm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("q_id"), col("c_id"), col("cos"),
        col("rn").cast("long").as("rn"))
      .orderBy("q_id", "rn")
  }
}
