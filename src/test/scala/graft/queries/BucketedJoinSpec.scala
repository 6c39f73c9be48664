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
    // Build the bucketed tables under a spec-owned scratch root (the
    // registered query deletes its own bucket files once the result is
    // materialized, so the catalog entries it leaves behind would point
    // at nothing).
    val root = graft.Scratch.dir("bucketed_spec")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Joins.bucketedColocatedJoin(spark, TestSpark.Sf0001, root).count()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_lineitem_bucketed")
        .join(spark.table("graft_orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("graft_orders_bucketed", "graft_lineitem_bucketed")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.Scratch.delete(root)
    }
  }
}
