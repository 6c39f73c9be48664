package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SCD2 merge's exactly-once contract (the dimension counterpart of
  * I3's fact discipline): a re-delivered batch — same keys, same
  * attribute values — must change NOTHING, because versioning keys on
  * actual attribute change, not on batch membership. And a genuinely new
  * batch after the re-delivery must still version normally.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def dim0: DataFrame =
    graft.Tables.customer(s, TestSpark.Sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .withColumn("version", lit(1L))
      .withColumn("valid_from", lit(1L))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("re-delivered batch is a no-op: same rows, no new versions") {
    val changes = graft.Tables.customer(s, TestSpark.Sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100.0, 2))
    val once = graft.Caching.materialize(s,
      Incremental.scd2Apply(dim0, changes, batch = 2L))
    // the redelivery arrives in a LATER batch — idempotence must come
    // from value comparison, not from an identical batch id
    val twice = Incremental.scd2Apply(once, changes, batch = 3L)
    assert(sameRows(once, twice),
      "re-delivering the same batch changed the dimension")
    assert(twice.agg(max("version")).head().getLong(0) == 2L)
    graft.Caching.release(once)
  }

  test("a genuinely new batch after a re-delivery still versions normally") {
    val changes = graft.Tables.customer(s, TestSpark.Sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100.0, 2))
    val v2 = graft.Caching.materialize(s,
      Incremental.scd2Apply(dim0, changes, batch = 2L))
    val v2b = graft.Caching.materialize(s,
      Incremental.scd2Apply(v2, changes, batch = 3L)) // no-op redelivery
    // second real change to a subset of the same keys
    val changes2 = changes.filter(col("c_custkey") % 14 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 50.0, 2))
    val v3 = graft.Caching.materialize(s,
      Incremental.scd2Apply(v2b, changes2, batch = 4L))
    val versioned = v3.filter(col("c_custkey") % 14 === 0)
    assert(versioned.agg(max("version")).head().getLong(0) == 3L,
      "second change batch must open version 3")
    // key with v3: exactly one current row, closed chain valid_to set
    val k = versioned.filter(col("version") === 3L)
      .select("c_custkey").head().getLong(0)
    val chain = v3.filter(col("c_custkey") === k)
      .orderBy("version").collect()
    assert(chain.length == 3)
    assert(chain.count(_.getAs[Boolean]("is_current")) == 1)
    assert(chain.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    assert(!chain(0).isNullAt(chain(0).fieldIndex("valid_to")) &&
      !chain(1).isNullAt(chain(1).fieldIndex("valid_to")) &&
      chain(2).isNullAt(chain(2).fieldIndex("valid_to")))
    Seq(v2, v2b, v3).foreach(graft.Caching.release)
  }
}
