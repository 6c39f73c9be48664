package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The JDBC partitioned source must actually range-partition (one
  * bounded query per partition — the reference's hand-rolled chunked
  * extraction, compute_morgan.py:11-44, done natively) and the round
  * trip through Derby must preserve every value and the schema.
  */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("s7: JDBC read is split into 4 range partitions") {
    val df = Registry.queries("s7_jdbc_partitioned_source")(spark, TestSpark.Sf0001)
    val planStr = df.queryExecution.optimizedPlan.toString
    assert(planStr.contains("JDBCRelation"), planStr.take(1000))
    assert(planStr.contains("numPartitions=4"), planStr.take(1000))
  }

  test("s7: values and schema survive the Derby round trip") {
    val viaJdbc = Registry.queries("s7_jdbc_partitioned_source")(spark, TestSpark.Sf0001)
    val direct = Tables.customer(spark, TestSpark.Sf0001)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .orderBy("c_custkey")
    assert(viaJdbc.schema == direct.schema,
      s"jdbc=${viaJdbc.schema}\ndirect=${direct.schema}")
    assert(viaJdbc.collect().toSeq == direct.collect().toSeq)
  }

  test("s4b: cp1252 bytes decode via the fallback and the bad line is dropped") {
    val rows = Registry.queries("s4b_csv_encoding_fallback")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "café")
    assert(rows(1).getString(1) == "naïve")
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
  }
}
