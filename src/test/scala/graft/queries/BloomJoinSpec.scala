package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Mechanics of the j18 runtime-filter join: the oracle proves the
  * final answer equals the plain join; these prove the Bloom prefilter
  * is doing its job on the way there — it passes every true match (no
  * false negatives, the correctness half) and actually shrinks the
  * probe side (the performance half — a filter that passes everything
  * is a no-op runtime filter).
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def highBalKeys = Tables.customer(spark, TestSpark.Sf0001)
    .filter(col("c_acctbal") > 9000)
    .select(col("c_custkey")).collect().map(_.getLong(0)).toSet

  test("bloom prefilter has no false negatives: every true match survives") {
    val keys = highBalKeys
    val result = Registry.queries("j18_bloom_filter_join")(
      spark, TestSpark.Sf0001)
    // per-nation totals must equal the plain join's — recomputed here
    // without any Bloom machinery
    val plain = Tables.orders(spark, TestSpark.Sf0001)
      .filter(col("o_custkey").isin(keys.toSeq: _*))
      .join(Tables.customer(spark, TestSpark.Sf0001)
        .filter(col("c_acctbal") > 9000),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_orders"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val got = result.collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    assert(got == plain)
  }

  test("bloom prefilter shrinks the probe side below the full orders scan") {
    val m = 4096L
    val seeds = 0 until 3
    def bitsOf(c: org.apache.spark.sql.Column) = seeds.map(k =>
      pmod(Sketches.h60(concat(lit(s"bj${k}_"), c)), lit(m)))
    val bits = Tables.customer(spark, TestSpark.Sf0001)
      .filter(col("c_acctbal") > 9000)
      .select(explode(array(bitsOf(col("c_custkey")): _*)).as("bit"))
      .distinct()
    val orders = Tables.orders(spark, TestSpark.Sf0001)
    val total = orders.count()
    val survivors = orders
      .select(col("o_orderkey"),
        explode(array(seeds.zip(bitsOf(col("o_custkey"))).map {
          case (k, b) => struct(lit(k).as("k"), b.as("bit"))
        }: _*)).as("kb"))
      .join(broadcast(bits), col("kb.bit") === bits("bit"), "left_semi")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === seeds.size)
      .count()
    // true-match fraction is small here; with k=3/m=4096 the false-
    // positive tax must not drown the reduction
    assert(survivors < total / 2,
      s"prefilter kept $survivors of $total — not reducing")
  }
}
