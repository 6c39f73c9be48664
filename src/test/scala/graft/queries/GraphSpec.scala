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
}
