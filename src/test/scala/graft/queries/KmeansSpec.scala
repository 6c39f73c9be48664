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
    // INPUT centroid (the c1 set the assignment used), via an
    // independent cross join; the assigned (dist, cluster) must be the
    // row minimum under the (dist, cid) tie-break. Catches an argmin
    // tie-break or broadcast-side bug the hash oracle would only catch
    // indirectly.
    val it = Embeddings.kmeansIterations(s, TestSpark.Sf0001)
    val cIn = it.last._1.select(col("cid").as("ccid"), col("c"))
    assert(cIn.count() == 4)
    val assigned = it.last._2.select(col("vec_id"), col("cid"), col("dist"))
    val v = graft.Tables.embeddings(s, TestSpark.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
    val all = v.crossJoin(cIn)
      .withColumn("d2",
        aggregate(zip_with(col("x"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, e) => acc + e))
      .select("vec_id", "ccid", "d2")
    // no candidate centroid strictly beats the assigned one under (dist, cid)
    val better = all.join(assigned, "vec_id")
      .filter(col("d2") < col("dist") ||
        (col("d2") === col("dist") && col("ccid") < col("cid")))
    assert(better.count() == 0, "a centroid beats the assigned one")
    // and the assigned (cid, dist) is itself one of the candidate rows
    val missing = assigned.join(all,
      assigned("vec_id") === all("vec_id") &&
        col("cid") === col("ccid") && col("dist") === col("d2"),
      "left_anti")
    assert(missing.count() == 0, "assigned pair not among recomputed candidates")
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
      .map { case (_, assigned, _) =>
        assigned.agg(sum("dist")).head().getDouble(0)
      }
    assert(objectives.size == 2)
    assert(objectives(1) <= objectives(0) + 1e-9,
      s"objective rose across iterations: $objectives")
    assert(objectives.forall(_ > 0.0))
  }

  test("K=16, 3 iterations converges monotonically through the same machinery") {
    // the declared queries pin (K=4, iters=2) for oracle parity; the
    // machinery itself is parameterized — prove Lloyd's law holds at a
    // real model size, and that every vector stays assigned each round.
    val n = graft.Tables.embeddings(s, TestSpark.Sf0001).count()
    val it = Embeddings.kmeansIterations(s, TestSpark.Sf0001, k = 16, iters = 3)
    assert(it.size == 3)
    val objectives = it.map { case (_, assigned, _) =>
      assert(assigned.count() == n)
      assigned.agg(sum("dist")).head().getDouble(0)
    }
    assert(objectives.sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 },
      s"objective rose across iterations: $objectives")
  }

  test("farthest-point seeding obeys the greedy law: each seed maximizes the running min-distance") {
    // seed j must be the vector whose minimum squared distance to the
    // already-chosen seeds is the corpus maximum (ties → lowest
    // vec_id). Recomputed independently, in-memory, over the whole
    // corpus — a wrong argmax, a stale running-min, or a tie-break
    // flip all break this.
    val seeds = Embeddings.kmeansIterations(s, TestSpark.Sf0001, farthest = true)
      .head._1.orderBy("cid").collect()
      .map(r => r.getSeq[Double](1).toArray)
    assert(seeds.length == 4)
    val corpus = graft.Tables.embeddings(s, TestSpark.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    assert(seeds(0).sameElements(corpus.head._2), "seed 0 is not the lowest vec_id")
    for (j <- 1 until seeds.length) {
      val prev = seeds.take(j)
      def mind(x: Array[Double]): Double = prev.map(d2(x, _)).min
      val bestM = corpus.map(c => mind(c._2)).max
      assert(math.abs(mind(seeds(j)) - bestM) <= 1e-12 * math.max(1.0, bestM),
        s"seed $j min-dist ${mind(seeds(j))} != corpus max $bestM")
    }
  }

  test("seeded assignment also satisfies Lloyd's law and covers every vector") {
    val n = graft.Tables.embeddings(s, TestSpark.Sf0001).count()
    val it = Embeddings.kmeansIterations(s, TestSpark.Sf0001, farthest = true)
    val objectives = it.map { case (_, assigned, _) =>
      assigned.agg(sum("dist")).head().getDouble(0)
    }
    assert(objectives(1) <= objectives(0) + 1e-9)
    val a = run("emb_kmeans_seeded_assign")
    assert(a.count() == n)
    assert(a.select("vec_id").distinct().count() == n)
  }
}
