package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases the reference handles implicitly (SURVEY.md §5.2):
  * malformed input -> null (F6), duplicate-key survivors (A6), all-NULL
  * groups (A3 / views 7b vs 7b'), empty incremental delta (I1).
  */
class OperatorEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.Row

  test("F6 pattern: fallible parse nulls malformed rows, na.drop removes them") {
    import spark.implicits._
    val d = Seq("{\"k\": 1}", "not json at all", "{\"k\": 7}", "")
      .toDF("props")
      .withColumn("parsed", from_json(col("props"), StructType.fromDDL("k INT")))
      .withColumn("k", col("parsed.k"))
    assert(d.filter(col("k").isNull).count() == 2)
    assert(d.na.drop(Seq("k")).count() == 2)
  }

  test("A6: deterministic survivor via row_number beats dropDuplicates ambiguity") {
    import spark.implicits._
    val d = Seq((1, "b"), (1, "a"), (2, "z")).toDF("k", "v")
    val survivor = d.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("v")))
      .filter(col("rn") === 1).drop("rn")
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(survivor == Seq((1, "a"), (2, "z"))) // always the min-v row
  }

  test("A3: avg ignores NULLs; all-NULL group yields NULL avg, not absent row") {
    import spark.implicits._
    val d = Seq(("g1", Some(2.0)), ("g1", None), ("g2", None))
      .toDF("g", "x")
    val out = d.groupBy("g").agg(avg("x").as("a")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out("g1").contains(2.0)) // NULL skipped in the mean
    assert(out("g2").isEmpty)       // group present, avg NULL — the 7b/7b' split
  }

  test("I1: empty delta short-circuits without writing (isEmpty, not count)") {
    import spark.implicits._
    val files = Seq("f1.csv", "f2.csv").toDF("file")
    val used  = Seq("f1.csv", "f2.csv").toDF("file")
    val delta = files.join(used, Seq("file"), "left_anti")
    assert(delta.isEmpty)
  }

  test("W1 invariants on real data: <= k rows per group, min(top-k) >= max(rest)") {
    val pairs = SimilarityPipeline.pairs(spark, TestSpark.Sf0001)
    val ranked = SimilarityPipeline.tieFlagOverPairs(pairs)
    val perGroup = ranked.groupBy("target_id").count().collect()
    assert(perGroup.forall(_.getLong(1) <= SimilarityPipeline.TopK))
    // cutoff dominance: worst kept sim >= best dropped sim per target
    val kept = ranked.groupBy("target_id").agg(min("sim").as("worst_kept"))
    val dropped = pairs.join(
      ranked.select(col("target_id"), col("source_id")).withColumn("kept", lit(1)),
      Seq("target_id", "source_id"), "left_anti")
      .groupBy("target_id").agg(max("sim").as("best_dropped"))
    val bad = kept.join(dropped, "target_id")
      .filter(col("worst_kept") < col("best_dropped"))
    assert(bad.isEmpty)
  }

  test("anti-join result is disjoint from the exclusion set (U4/J6)") {
    val c = graft.Tables.customer(spark, TestSpark.Sf0001)
    val excl = c.filter(col("c_custkey") % 3 === 0).select("c_custkey")
    val out = c.join(excl, Seq("c_custkey"), "left_anti")
    assert(out.join(excl, Seq("c_custkey")).isEmpty)
    assert(out.count() + excl.count() == c.count())
  }
}
