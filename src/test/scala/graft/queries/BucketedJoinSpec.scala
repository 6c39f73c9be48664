package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The point of bucketing is the plan, not the rows: with broadcast
  * disabled, the join of two tables bucketed by the join key must be a
  * sort-merge join with NO shuffle exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed co-located join plans without a shuffle exchange") {
    Registry.queries("j11_bucketed_colocated_join")(spark, TestSpark.Sf0001)
      .count() // materializes the bucketed tables
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_lineitem_bucketed")
        .join(spark.table("graft_orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
