package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Laws for the embedding preprocessing/graph operators that the
  * row-level oracle can't express: unit-norm invariants, replica
  * arithmetic, and per-node rank structure of the k-NN graph.
  */
class EmbeddingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vectors(): Map[Long, Array[Double]] =
    Tables.embeddings(spark, TestSpark.Sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  test("emb_mean_center output is unit-norm and tracks the in-memory " +
    "mean-centered vectors") {
    val vs = vectors()
    val dim = vs.head._2.length
    val n = vs.size
    val mean = (0 until dim).map { j =>
      vs.values.map(_(j)).sum / n // tolerance-compared, order drift ok
    }.toArray
    val got = Registry.queries("emb_mean_center")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    assert(got.keySet == vs.keySet)
    got.foreach { case (id, comps) =>
      assert(comps.length == dim)
      // unit norm after centering (rounding at 6dp bounds the drift)
      val nrm = math.sqrt(comps.map(c => c * c).sum)
      assert(math.abs(nrm - 1.0) < 1e-4, s"vec $id norm $nrm")
      // replica: centered + normalized, compared within float tolerance
      val c = vs(id).zip(mean).map { case (x, m) => x - m }
      val cn = math.sqrt(c.map(y => y * y).sum)
      c.zip(comps).zipWithIndex.foreach { case ((raw, gotv), j) =>
        assert(math.abs(raw / cn - gotv) < 1e-5, s"vec $id dim $j")
      }
    }
  }

  test("pca: unit component, monotone Rayleigh estimate, replica match, " +
    "abtt output orthogonal to the removed direction") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val vs = vectors().toSeq.sortBy(_._1).map(_._2)
    val dim = vs.head.length
    val n = vs.size
    // in-memory replica of the engine arithmetic: decimal-exact mean,
    // scaled-integer cross-row sums, IEEE row-local folds
    val mean = (0 until dim).map { j =>
      vs.map(v => JBD.valueOf(v(j))).reduce(_.add(_)).doubleValue() / n
    }.toArray
    val c = vs.map(v => v.zip(mean).map { case (x, m) => x - m })
    def step(vIn: Array[Double]): (Array[Double], Double) = {
      val y = (0 until dim).map { j =>
        c.map { cv =>
          val s = cv.zip(vIn).foldLeft(0.0) { case (a, (x, w)) => a + x * w }
          JBD.valueOf(cv(j) * s * 1e12).setScale(0, RoundingMode.HALF_UP)
            .longValue()
        }.sum.toDouble / 1e12
      }.toArray
      val nrm = math.sqrt(y.foldLeft(0.0)((a, w) => a + w * w))
      (y.map(_ / nrm), nrm)
    }
    val v0 = Array.fill(dim)(1.0 / math.sqrt(dim))
    val (v1, l1) = step(v0)
    val (v2, l2) = step(v1)
    val (v3, l3) = step(v2)
    // Rayleigh estimate is monotone for the PSD Gram matrix
    assert(l1 <= l2 + 1e-9 && l2 <= l3 + 1e-9, s"$l1 / $l2 / $l3")
    val got = Registry.queries("emb_pca_top_component")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == dim)
    // unit component (rounding at 6dp bounds the drift)
    val unit = got.map(_._2).map(x => x * x).sum
    assert(math.abs(unit - 1.0) < 1e-4)
    // replica match, component for component and λ = ‖y₃‖/n
    got.foreach { case (idx, value, lam) =>
      assert(math.abs(v3(idx.toInt) - value) < 1e-6, s"dim $idx")
      assert(math.abs(l3 / n - lam) < 1e-6, s"lambda $lam vs ${l3 / n}")
    }
    // abtt residuals are orthogonal to the removed direction
    val abtt = Registry.queries("emb_abtt_transform")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    abtt.foreach { case (id, comps) =>
      val dot = comps.zip(v3).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-4, s"vec $id not orthogonal: $dot")
      val nrm2 = comps.map(x => x * x).sum
      assert(math.abs(nrm2 - 1.0) < 1e-4, s"vec $id not unit")
    }
  }

  test("deflated component 2: unit, orthogonal to component 1, " +
    "smaller eigenvalue") {
    def comp(name: String): (Array[Double], Double) = {
      val rows = Registry.queries(name)(spark, TestSpark.Sf0001)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      (rows.map(_._2), rows.head._3)
    }
    val (v1, l1) = comp("emb_pca_top_component")
    val (v2, l2) = comp("emb_pca_deflated_component")
    assert(v1.length == v2.length)
    val unit2 = v2.map(x => x * x).sum
    assert(math.abs(unit2 - 1.0) < 1e-4, s"comp2 not unit: $unit2")
    // the residuals carry no component along u, so the deflated
    // iteration stays in u's orthogonal complement
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-4, s"components not orthogonal: $dot")
    // spectral order
    assert(l2 > 0.0 && l2 <= l1 + 1e-9, s"lambda order violated: $l1 / $l2")
  }

  test("top-R PCA: unit components, pairwise orthogonal, descending " +
    "eigenvalues that are true Rayleigh quotients, trace bound, and the " +
    "step-1 direction is the single-component query's vector") {
    val rows = Registry.queries("emb_pca_topr")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val comps = rows.groupBy(_._1).view.mapValues { es =>
      (es.sortBy(_._2).map(_._3), es.head._4)
    }.toMap
    assert(comps.keySet == Set(1L, 2L, 3L, 4L))
    val dim = comps(1L)._1.length
    comps.values.foreach { case (v, _) => assert(v.length == dim) }
    // unit components (6dp output rounding bounds the drift)
    comps.foreach { case (k, (v, _)) =>
      val unit = v.map(x => x * x).sum
      assert(math.abs(unit - 1.0) < 1e-4, s"comp $k not unit: $unit")
    }
    // pairwise orthogonality — deflation removes each direction exactly,
    // so every later iteration stays in the joint orthogonal complement
    // (tolerance covers the 6dp output rounding: dim terms of ≤1e-6)
    for (i <- 1L to 4L; j <- (i + 1) to 4L) {
      val dot = comps(i)._1.zip(comps(j)._1).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) <= 1e-4 + 4 * dim * 1e-6,
        s"components $i,$j not orthogonal: $dot")
    }
    // spectral order λ₁ ≥ λ₂ ≥ λ₃ ≥ λ₄ > 0
    val lams = (1L to 4L).map(comps(_)._2)
    assert(lams.forall(_ > 0.0), s"non-positive eigenvalue: $lams")
    lams.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"lambda order violated: $lams")
    }
    // every λ is the TRUE Rayleigh quotient of its own vector against
    // the centered corpus (recomputed here from the raw fixture), so
    // the descending order can never be bought with fabricated values
    val vs = vectors().toSeq.sortBy(_._1).map(_._2)
    val n = vs.size
    val mean = (0 until dim).map(j => vs.map(_(j)).sum / n).toArray
    val c = vs.map(v => v.zip(mean).map { case (x, m) => x - m })
    comps.foreach { case (k, (v, lam)) =>
      val quot = c.map { cv =>
        val s = cv.zip(v).map { case (x, w) => x * w }.sum
        s * s
      }.sum / n
      assert(math.abs(quot - lam) < 1e-4,
        s"comp $k lambda $lam is not its Rayleigh quotient $quot")
    }
    // Σλ over orthonormal directions is bounded by the covariance trace
    val trace = (0 until dim).map { j =>
      c.map(cv => cv(j) * cv(j)).sum / n
    }.sum
    assert(lams.sum <= trace + 1e-6,
      s"sum of eigenvalues ${lams.sum} exceeds trace $trace")
    // the deflation-step-1 direction IS emb_pca_top_component's vector
    // (identical machinery); after the λ-sort it sits at SOME comp slot
    val s1 = Registry.queries("emb_pca_top_component")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      .map(_._2).toSeq
    assert(comps.values.exists(_._1.toSeq == s1),
      "no topr component matches emb_pca_top_component's direction")
  }

  test("nn-descent refinement never loses recall vs brute-force top-3") {
    val vs = vectors()
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // brute-force truth: each node's top-3 by (cos desc, id asc)
    val truth = vs.map { case (id, v) =>
      id -> vs.collect { case (j, w) if j != id => (cosine(v, w), j) }
        .toSeq.sortBy(t => (-t._1, t._2)).take(3).map(_._2).toSet
    }
    def recallOf(name: String): Double = {
      val edges = Registry.queries(name)(spark, TestSpark.Sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(2))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val hits = truth.toSeq.map { case (id, t) =>
        (t & edges.getOrElse(id, Set.empty)).size
      }.sum
      hits.toDouble / truth.map(_._2.size).sum
    }
    val base = recallOf("simsearch_knn_graph")
    val refined = recallOf("simsearch_knn_refine")
    assert(base > 0.3, s"base graph recall degenerate: $base")
    assert(refined >= base - 1e-12,
      s"refinement lost recall: $base -> $refined")
  }

  test("nn-descent to convergence: per-round recall monotone, fixed " +
    "point within MaxRefineRounds, converged beats round 1") {
    val vs = vectors()
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = vs.map { case (id, v) =>
      id -> vs.collect { case (j, w) if j != id => (cosine(v, w), j) }
        .toSeq.sortBy(t => (-t._1, t._2)).take(3).map(_._2).toSet
    }
    val rounds = SimilaritySearch.knnRounds(spark, TestSpark.Sf0001,
      SimilaritySearch.MaxRefineRounds)
    def edgesOf(g: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      g.select("src", "dst").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val perRound = rounds.map(edgesOf)
    def recall(e: Map[Long, Set[Long]]): Double =
      truth.toSeq.map { case (id, t) =>
        (t & e.getOrElse(id, Set.empty)).size
      }.sum.toDouble / truth.map(_._2.size).sum
    val recalls = perRound.map(recall)
    // monotone: each round's per-node list only moves up the
    // (cos desc, dst asc) order, so true neighbors are never displaced
    // by non-neighbors
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-12, s"recall regressed across a round: $recalls")
    }
    // the edge sets reach a fixed point within the unrolled budget —
    // the premise that lets the engine early-exit under a fixed-round
    // oracle
    assert(perRound.takeRight(2).distinct.size == 1,
      "edge set still changing at MaxRefineRounds")
    // the converged graph strictly improves on the LSH-seeded round-1
    // graph on this fixture
    assert(recalls.last > recalls.head,
      s"convergence bought no recall: $recalls")
    // and the registered converged query returns exactly the fixed point
    val reg = edgesOf(Registry.queries("simsearch_knn_converged")(
      spark, TestSpark.Sf0001))
    assert(reg == perRound.last,
      "simsearch_knn_converged drifted from the round ladder")
    rounds.foreach(graft.Caching.release)
  }

  test("knn graph: contiguous ranks ordered by (cos desc, dst), " +
    "exact cosine arithmetic, no self-loops") {
    val vs = vectors()
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val rows = Registry.queries("simsearch_knn_graph")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, _, dst, cos) =>
      assert(src != dst, s"self-loop at $src")
      // the emitted cosine is the true cosine of the pair (to rounding)
      assert(math.abs(cosine(vs(src), vs(dst)) - cos) < 1e-5,
        s"edge $src->$dst cosine off")
    }
    rows.groupBy(_._1).foreach { case (src, es) =>
      val byRank = es.sortBy(_._2)
      assert(byRank.length <= 3)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length).toSeq,
        s"node $src ranks not contiguous")
      // rank order is (cos desc, dst asc)
      val resorted = byRank.sortBy(e => (-e._4, e._3))
      assert(resorted.toSeq == byRank.toSeq, s"node $src mis-ranked")
    }
  }

  test("whitening: unit variance per retained component (the law that " +
    "makes it whitening), bounded cross-correlation, and z recomputed " +
    "from the corpus matches") {
    val rows = Registry.queries("emb_whitening")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byComp = rows.groupBy(_._2)
    assert(byComp.keySet == Set(1L, 2L))
    val n = vectors().size
    byComp.foreach { case (k, es) =>
      assert(es.length == n, s"comp $k missing vectors")
      // mean(z^2) == 1 by construction (lambda IS the mean of sc^2);
      // the slack covers the 6dp rounding of lambda and of z
      val varZ = es.map(e => e._3 * e._3).sum / n
      assert(math.abs(varZ - 1.0) < 1e-3, s"comp $k variance $varZ")
    }
    // decorrelation is as good as the power iteration's convergence
    // (3 steps on this fixture: measured ~-0.16); whitening of EXACT
    // eigenvectors would be 0 -- the bound catches a sign/indexing bug,
    // not residual convergence error
    val z1 = byComp(1L).map(e => e._1 -> e._3).toMap
    val cross = byComp(2L).map(e => z1(e._1) * e._3).sum / n
    assert(math.abs(cross) < 0.25, s"components correlated: $cross")
  }
}
