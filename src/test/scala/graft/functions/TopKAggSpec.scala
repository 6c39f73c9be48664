package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.Registry

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("aggregate top-k equals the window top-k on real data (sf0.001)") {
    val viaAgg = Registry.queries("w1_topk_partial_agg")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val viaWin = Registry.queries("w1_topk_per_group")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("reduce rejects below-cutoff rows without growing the buffer") {
    val agg = new TopKAgg(2)
    val full = agg.merge(
      agg.reduce(agg.zero, ScoredId(0.9, 1)),
      agg.reduce(agg.zero, ScoredId(0.8, 2)))
    assert(agg.reduce(full, ScoredId(0.1, 3)) eq full) // same instance: O(1) reject
    assert(agg.reduce(full, ScoredId(0.95, 4)).map(_.id) == Seq(4L, 1L))
  }

  test("merge is commutative and respects the (score desc, id asc) tiebreak") {
    val agg = new TopKAgg(3)
    val a = Seq(ScoredId(0.9, 5), ScoredId(0.5, 2))
    val b = Seq(ScoredId(0.9, 3), ScoredId(0.5, 9))
    assert(agg.merge(a, b) == agg.merge(b, a))
    assert(agg.merge(a, b).map(_.id) == Seq(3L, 5L, 2L)) // id asc among 0.9 ties
  }

  test("partial aggregation plan: exchange carries aggregate buffers, not rows") {
    val topk = udaf(new TopKAgg(3))
    val plan = graft.Tables.orders(spark, TestSpark.Sf0001)
      .groupBy("o_custkey").agg(topk(col("o_totalprice"), col("o_orderkey")))
      .queryExecution.executedPlan.toString
    // partial (map-side) and final aggregate on either side of the exchange
    assert(plan.contains("ObjectHashAggregate"))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2)
  }
}
