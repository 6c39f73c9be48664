package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.Views

class MedallionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("full DAG run is correct and a re-run is a complete no-op") {
    val wh = Files.createTempDirectory("graft_medallion").toString

    val r1 = Medallion.run(spark, TestSpark.Sf0001, wh)
    assert(r1.bronzeConstructed)
    assert(r1.newFacts > 0 && r1.newDimRows > 0)

    // the materialized fact equals the declarative silver fact definition
    val factPairs = spark.read.parquet(s"$wh/silver_fact")
      .select("target_id", "source_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val declared = Views.silverFact(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(factPairs == declared)

    // dim covers exactly the ids appearing in either fact role
    val dimIds = spark.read.parquet(s"$wh/silver_dim")
      .select("id").collect().map(_.getLong(0)).toSet
    val factIds = factPairs.map(_._1) ++ factPairs.map(_._2)
    assert(dimIds == factIds)

    // second run: bronze present, zero new facts/dim rows, views stable
    val r2 = Medallion.run(spark, TestSpark.Sf0001, wh)
    assert(!r2.bronzeConstructed)
    assert(r2.newFacts == 0 && r2.newDimRows == 0)
    assert(r2.viewRows == r1.viewRows)

    // fact was not duplicated by the re-run (I3 dedup-on-append)
    val n = spark.read.parquet(s"$wh/silver_fact").count()
    assert(n == factPairs.size)
  }

  test("views have the 7b vs 7b-nonull NULL-group distinction shape") {
    val wh = Files.createTempDirectory("graft_medallion2").toString
    Medallion.run(spark, TestSpark.Sf0001, wh)
    val v7b = spark.read.parquet(s"$wh/view_7b").count()
    val v7bn = spark.read.parquet(s"$wh/view_7b_nonull").count()
    // the no-NULL variant can only lose whole groups, never gain
    assert(v7bn <= v7b)
  }
}
