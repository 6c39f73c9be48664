package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CrossJoinGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def analyzed(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed

  test("vetoes a big-by-big cartesian join") {
    val big = spark.range(10_000_000L).toDF("a")
    val plan = analyzed(big.crossJoin(big.select(org.apache.spark.sql.functions.col("a").as("b"))))
    val e = intercept[IllegalStateException] {
      CrossJoinGuard.check(plan, maxBytes = 1L << 20)
    }
    assert(e.getMessage.contains("CrossJoinGuard"))
  }

  test("passes a cross join whose smaller side is bounded — the flagship shape") {
    val big = spark.range(10_000_000L).toDF("a")
    val small = spark.range(100L).toDF("b")
    CrossJoinGuard.check(analyzed(big.crossJoin(small)), maxBytes = 1L << 20)
  }

  test("ignores condition-full joins and is off without the conf") {
    import org.apache.spark.sql.functions.col
    val big = spark.range(10_000_000L).toDF("a")
    val joined = big.join(big.select(col("a").as("b")), col("a") === col("b"))
    CrossJoinGuard.check(analyzed(joined), maxBytes = 1L)
    // rule() with the conf unset is a no-op even on the worst plan
    CrossJoinGuard.rule(spark)(analyzed(big.crossJoin(big.select(col("a").as("b")))))
  }

  test("the real flagship pipeline passes under a production threshold") {
    val df = graft.queries.Registry
      .queries("pipeline_topk_tieflag")(spark, TestSpark.Sf0001)
    CrossJoinGuard.check(analyzed(df), maxBytes = 64L << 20)
  }
}
