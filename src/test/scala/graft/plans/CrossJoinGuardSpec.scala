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

  test("a pre-pushdown equi-join (filter above a cross join) passes the guard") {
    import org.apache.spark.sql.functions.col
    val big = spark.range(10_000_000L).toDF("a")
    // crossJoin().filter(equality) — at analysis time the condition is
    // still a Filter above a condition-less Join; the optimizer will
    // push it down into a hash join, so the guard must not veto it
    val viaApi = big.crossJoin(big.select(col("a").as("b")))
      .filter(col("a") === col("b"))
    CrossJoinGuard.check(analyzed(viaApi), maxBytes = 1L << 20)
    // the comma-join SQL spelling of the same plan
    big.createOrReplaceTempView("cjg_x")
    val viaSql = spark.sql(
      "SELECT * FROM cjg_x t1, cjg_x t2 WHERE t1.a = t2.a AND t1.a > 5")
    CrossJoinGuard.check(analyzed(viaSql), maxBytes = 1L << 20)
    // but a filter that does NOT cross both sides still vetoes
    val e = intercept[IllegalStateException] {
      CrossJoinGuard.check(analyzed(
        big.crossJoin(big.select(col("a").as("b"))).filter(col("a") > 5)),
        maxBytes = 1L << 20)
    }
    assert(e.getMessage.contains("CrossJoinGuard"))
  }

  test("malformed conf value raises a clear error naming the conf key") {
    val prev = spark.conf.getOption(CrossJoinGuard.ConfKey)
    spark.conf.set(CrossJoinGuard.ConfKey, "64m")
    try {
      val e = intercept[IllegalArgumentException] {
        CrossJoinGuard.rule(spark)(analyzed(spark.range(10).toDF("a")))
      }
      assert(e.getMessage.contains(CrossJoinGuard.ConfKey))
    } finally prev match {
      case Some(v) => spark.conf.set(CrossJoinGuard.ConfKey, v)
      case None    => spark.conf.unset(CrossJoinGuard.ConfKey)
    }
  }

  test("the real flagship pipeline passes under a production threshold") {
    val df = graft.queries.Registry
      .queries("pipeline_topk_tieflag")(spark, TestSpark.Sf0001)
    CrossJoinGuard.check(analyzed(df), maxBytes = 64L << 20)
  }
}
