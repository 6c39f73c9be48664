package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws of the order-8 Hilbert key (o7_hilbert_layout) that the oracle
  * cannot express: the oracle proves Spark and DuckDB compute the same
  * integers; these prove the integers ARE a Hilbert curve. Both are
  * checked on the full 256×256 grid — no sampling, no reference
  * implementation to be circular against:
  *
  *  - bijectivity: the 65,536 cells map to exactly the keys 0..65535;
  *  - unit-step adjacency: cells with consecutive keys are Manhattan-
  *    distance-1 grid neighbors — the defining Hilbert property, and
  *    precisely what Morton order (o6) lacks at every 2^k boundary.
  *
  * Plus the payoff the operator exists for, measured on the real
  * fixture: the Hilbert layout's per-file envelope area is no worse
  * than the Morton layout's on the same rows and file count.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val grid: Array[(Int, Int, Long)] = {
    import spark.implicits._
    val cells = spark.range(0, 65536L, 1, 8)
      .select((col("id") % 256).cast("int").as("x"),
        (col("id") / 256).cast("int").as("y"))
    WindowsSorts.withHilbertKey(cells, "x", "y", "hkey")
      .select("x", "y", "hkey").as[(Int, Int, Long)].collect()
  }

  test("order-8 Hilbert key is a bijection onto 0..65535") {
    assert(grid.length == 65536)
    val keys = grid.map(_._3).sorted
    assert(keys.head == 0L && keys.last == 65535L)
    assert(keys.distinct.length == 65536, "duplicate Hilbert keys")
  }

  test("consecutive Hilbert keys are grid neighbors (unit-step walk)") {
    val byKey = grid.sortBy(_._3)
    byKey.sliding(2).foreach { case Array((x1, y1, k1), (x2, y2, _)) =>
      val dist = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(dist == 1,
        s"keys $k1,${k1 + 1} map to non-adjacent cells ($x1,$y1)->($x2,$y2)")
    }
  }

  test("Hilbert layout's file envelopes are no worse than Morton's " +
    "on the real fixture") {
    def area(name: String): Double =
      Registry.queries(name)(spark, TestSpark.Sf001).collect()
        .map(r => r.getAs[Long]("ck_span").toDouble *
          r.getAs[Long]("day_span").toDouble).sum
    val hilbert = area("o7_hilbert_layout")
    val morton = area("o6_zorder_layout")
    assert(hilbert <= morton,
      s"Hilbert envelopes ($hilbert) beat by Morton ($morton)")
  }
}
