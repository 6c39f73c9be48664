package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-quality regression net: the physical plans that make these
  * queries scale must KEEP their shape. A correctness-green query whose
  * filter stopped reaching the scan, or whose broadcast turned into a
  * shuffle, is a regression the oracle can't catch — these assertions
  * can.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    Registry.queries(name)(spark, TestSpark.Sf001)
      .queryExecution.executedPlan.toString

  test("P6/S2: range predicate is pushed into the parquet scan") {
    val p = plan("s2_range_chunked_scan")
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_orderkey,5000)"), p.take(2000))
    assert(p.contains("LessThan(l_orderkey,6000)"))
  }

  test("P1: projection prunes the scan to referenced columns only") {
    val p = plan("p1_projection")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      p.take(2000))
  }

  test("J1/flagship: cross join broadcasts the small target side") {
    val p = plan("pipeline_topk_tieflag")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("BroadcastExchange"))
  }

  test("J2: dimension equi-join broadcasts under the threshold") {
    val p = plan("j2_left_equijoin")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("flagship stays inside whole-stage codegen for the similarity kernel") {
    // AQE annotates codegen stages only in the FINAL plan — and only for
    // THIS DataFrame's own execution (count() would plan separately)
    val df = Registry.queries("pipeline_topk_tieflag")(spark, TestSpark.Sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // '*(N)' prefixes are the WholeStageCodegen stage markers; the
    // similarity kernel's Project must carry one
    assert(p.contains("isFinalPlan=true"), p.take(500))
    assert("""\*\(\d+\) Project \[target_id""".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("O2: global sort+limit compiles to TakeOrderedAndProject, not a full sort") {
    val p = plan("o2_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("J6: anti-join shuffles only the key columns of the exclusion side") {
    val p = plan("j6_anti_join_pairs")
    assert(p.contains("LeftAnti"), p.take(2000))
  }
}
