package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws of the CDC log-compaction kernel (i7) that the closed-form
  * oracle can't express: last-writer-wins by seq regardless of arrival
  * order, delete/insert interleaving, and idempotence under full-log
  * re-delivery — the exactly-once property a CDC consumer leans on when
  * its upstream replays.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def log(rows: (Long, String, Double, String, String, Long)*)
      : DataFrame = {
    import s.implicits._
    rows.toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment",
      "op", "seq")
  }

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("last-writer-wins honors seq, not arrival order") {
    // rows deliberately out of seq order in the input
    val l = log(
      (1L, "v2", 20.0, "B", "U", 2L),
      (1L, "v1", 10.0, "A", "I", 0L),
      (1L, "v1b", 15.0, "A", "U", 1L))
    val out = Incremental.cdcApply(l).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "v2" && out.head.getDouble(2) == 20.0)
  }

  test("delete-after-update erases; insert-after-delete resurrects") {
    val l = log(
      (1L, "a", 1.0, "A", "I", 0L),
      (1L, "a2", 2.0, "A", "U", 1L),
      (1L, null.asInstanceOf[String], 0.0, null.asInstanceOf[String], "D", 2L),
      (2L, "b", 1.0, "B", "I", 0L),
      (2L, null.asInstanceOf[String], 0.0, null.asInstanceOf[String], "D", 1L),
      (2L, "b-back", 3.0, "B", "I", 2L))
    val out = Incremental.cdcApply(l).orderBy("c_custkey").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L)) // key 1 deleted
    assert(out.head.getString(1) == "b-back")
  }

  test("re-applying the full log (re-delivery) is a no-op") {
    val l = log(
      (1L, "a", 1.0, "A", "I", 0L),
      (1L, "a2", 2.0, "A", "U", 1L),
      (2L, "b", 1.0, "B", "I", 0L),
      (3L, "c", 1.0, "C", "I", 0L),
      (3L, null.asInstanceOf[String], 0.0, null.asInstanceOf[String], "D", 1L))
    val once = Incremental.cdcApply(l)
    // the upstream replays everything: same log delivered twice over
    val twice = Incremental.cdcApply(l.union(l))
    assert(sameRows(once, twice), "replayed log changed the table")
  }

  test("the registered query applies its log over real data") {
    val out = graft.Caching.materialize(s,
      Registry.queries("i7_cdc_apply")(s, TestSpark.Sf0001))
    val cust = graft.Tables.customer(s, TestSpark.Sf0001)
    val expected = cust.filter(col("c_custkey") % 7 =!= 0).count() +
      cust.filter(col("c_custkey") % 11 === 0).count()
    assert(out.count() == expected)
    // no deleted key survives
    assert(out.filter(col("c_custkey") % 7 === 0 &&
      col("c_custkey") < 1000000L).isEmpty)
    graft.Caching.release(out)
  }
}
