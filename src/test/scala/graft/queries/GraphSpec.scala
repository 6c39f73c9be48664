package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariants for the iterative graph operator beyond oracle equality:
  * the oracle proves both engines compute the same integers; these
  * prove the integers behave like PageRank.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    Registry.queries("graph_pagerank")(spark, TestSpark.Sf0001).collect()

  test("rank mass is bounded: never exceeds SCALE, never collapses") {
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rank_ppb")).sum
    // floor rounding + dangling mass only ever LOSE ppb, so the total
    // must be ≤ 1e9 — and damping guarantees at least the teleport
    // share (15%) survives every round
    assert(total <= 1000000000L, s"mass created from nothing: $total")
    assert(total >= 150000000L, s"mass collapsed below teleport floor: $total")
  }

  test("every node gets at least the teleport base, ranks are positive") {
    val n = rows.length
    val base = (15L * (1000000000L / n)) / 100L
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_ppb") >= base,
        s"node ${r.getAs[Long]("nationkey")} below teleport base")
    }
  }

  test("triangle counts match brute force on a crafted graph") {
    import spark.implicits._
    // K4 on {0,1,2,3} (every node in 3 triangles), a pendant 3->4
    // (zero triangles), an isolated edge 5-6, self-loop and duplicate/
    // reversed edges that must not double-count
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (5L, 6L), (6L, 5L), (2L, 0L), (4L, 4L))
      .toDF("src", "dst")
    val nodes = (0L to 6L).toDF("node")
    val got = Graph.triangleCounts(edges, nodes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // brute force over the cleaned undirected graph
    val und = edges.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val ns = (0L to 6L).toSeq
    val want = ns.map { n =>
      n -> ns.combinations(2).count { case Seq(x, y) =>
        x != n && y != n &&
          und((math.min(x, y), math.max(x, y))) &&
          und((math.min(n, x), math.max(n, x))) &&
          und((math.min(n, y), math.max(n, y)))
      }.toLong
    }.toMap
    assert(got == want, s"got $got want $want")
  }

  test("integer arithmetic makes the result parallelism-invariant") {
    // the determinism claim in the scaladoc, tested: a different
    // partition count must reduce in a different order yet produce
    // bit-identical ranks (bigint sums are associative; double sums
    // would differ here)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = Registry.queries("graph_pagerank")(spark, TestSpark.Sf0001)
        .collect()
      assert(alt.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        rows.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("knn communities: every node labeled once, labels shrink to real " +
    "communities, and each label is reachable within the propagation " +
    "radius") {
    val rows = Registry.queries("graph_knn_communities")(
      spark, graft.TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length)
    val nComms = rows.map(_._2).distinct.length
    assert(nComms > 1, "all nodes collapsed into one community")
    assert(nComms < rows.length, "no label ever propagated -- vacuous")
    // a node's label can only have travelled along out-edges, one hop
    // per round: the label must be reachable within LpaRounds=3 hops
    val edges = SimilaritySearch.knnEdges(spark, graft.TestSpark.Sf0001)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (node, lbl) =>
      var frontier = Set(node)
      var seen = frontier
      var found = node == lbl
      for (_ <- 1 to 3 if !found) {
        frontier = frontier.flatMap(edges.getOrElse(_, Set.empty)) -- seen
        seen ++= frontier
        found = frontier.contains(lbl) || found
      }
      assert(found || seen.contains(lbl),
        s"node $node carries label $lbl not reachable in 3 hops")
    }
  }

  test("converged knn communities: in-memory LPA flips are non-increasing, " +
    "hit zero within MaxLpaRounds, and the fixed point matches the query") {
    val edges = SimilaritySearch.knnEdges(spark, graft.TestSpark.Sf0001)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    val flipSeq = scala.collection.mutable.Buffer.empty[Int]
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      rounds += 1
      val next = adj.map { case (n, ns) =>
        // most frequent label among neighbors + the node's own current
        // label (the self-vote stabilization), ties to MIN label
        val votes = (labels(n) +: ns.map(labels))
          .groupBy(identity).view.mapValues(_.size)
        n -> votes.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
      val flips = next.count { case (n, l) => labels(n) != l }
      flipSeq += flips
      labels = next
      converged = flips == 0
    }
    assert(converged,
      s"in-memory LPA did not converge in 20 rounds: $flipSeq")
    assert(rounds <= Graph.MaxLpaRounds,
      s"fixture needs $rounds rounds > MaxLpaRounds=${Graph.MaxLpaRounds} " +
        s"-- raise the oracle unroll: $flipSeq")
    flipSeq.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a,
        s"flip counts not non-increasing: $flipSeq")
      case _ => ()
    }
    val got = Registry.queries("graph_knn_communities_converged")(
      spark, graft.TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == labels,
      "engine fixed point differs from the in-memory LPA fixed point")
  }

  test("link prediction: pairs are unlinked, counts match brute-force " +
    "common-neighborhoods, degrees are real") {
    val g = SimilaritySearch.knnEdges(spark, graft.TestSpark.Sf0001)
      .select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = g.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val linked = g.map { case (a, b) =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val preds = Registry.queries("graph_link_prediction")(
      spark, graft.TestSpark.Sf0001).collect()
    assert(preds.nonEmpty)
    preds.foreach { r =>
      val a = r.getAs[Long]("a"); val b = r.getAs[Long]("b")
      assert(a < b, s"pair not canonically ordered: $a,$b")
      assert(!linked.contains((a, b)), s"predicted pair $a-$b already linked")
      val common = adj(a).intersect(adj(b))
      assert(common.nonEmpty, s"$a-$b predicted with no shared neighbor")
      assert(r.getAs[Long]("cn") == common.size.toLong,
        s"$a-$b cn ${r.getAs[Long]("cn")} != brute ${common.size}")
      assert(r.getAs[Long]("deg_a") == adj(a).size.toLong)
      assert(r.getAs[Long]("deg_b") == adj(b).size.toLong)
    }
  }
}
