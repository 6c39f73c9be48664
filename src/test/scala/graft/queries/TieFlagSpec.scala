package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reference's tie-at-the-cutoff semantics (SURVEY.md §7.4;
  * /root/reference/dags/modules/datamart.py:28-47): flag is 0 everywhere
  * UNLESS the whole-group count of rows tying the 10th-place score
  * exceeds the in-top-10 count; then rows AT the cutoff carry the total
  * tie count. Not a boolean.
  */
class TieFlagSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Int, Int, Double)]) = {
    import spark.implicits._
    SimilarityPipeline.tieFlagOverPairs(
      rows.toDF("target_id", "source_id", "sim"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toSeq
  }

  test("ties beyond the cutoff: rows at cutoff get the TOTAL tie count") {
    // ranks 1-9 descending, ranks 10,11,12 all tie at 0.5
    val pairs = (1 to 9).map(i => (1, i, 1.0 - i * 0.01)) ++
      Seq((1, 10, 0.5), (1, 11, 0.5), (1, 12, 0.5))
    val out = run(pairs)
    assert(out.size == 10)
    val flags = out.map(r => r._2 -> r._5).toMap
    assert((1 to 9).forall(flags(_) == 0L))
    assert(flags(10) == 3L) // 3 rows tie the cutoff score group-wide
  }

  test("ties fully inside the top-10 produce no flag") {
    val pairs = (1 to 8).map(i => (1, i, 1.0 - i * 0.01)) ++
      Seq((1, 9, 0.5), (1, 10, 0.5), (1, 11, 0.3))
    val out = run(pairs)
    assert(out.size == 10)
    assert(out.forall(_._5 == 0L)) // ties_total == ties_top == 2
  }

  test("groups smaller than k emit all rows, no cutoff, flag 0") {
    val pairs = Seq((7, 1, 0.9), (7, 2, 0.8), (7, 3, 0.8))
    val out = run(pairs)
    assert(out.size == 3)
    assert(out.forall(_._5 == 0L))
    assert(out.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("float-noise ties within 1e-9 are treated as equal (readme.MD:63)") {
    val pairs = (1 to 9).map(i => (1, i, 1.0 - i * 0.01)) ++
      Seq((1, 10, 0.5), (1, 11, 0.5 + 1e-12), (1, 12, 0.1))
    val out = run(pairs)
    val flags = out.map(r => r._2 -> r._5).toMap
    // source 11 (0.5 + 1e-12) outranks source 10 and becomes the rank-10
    // cutoff row; source 10 differs by < tolerance -> counts as a tie
    assert(flags(11) == 2L)
    assert(!flags.contains(10)) // rank 11, filtered by the top-k
  }

  test("rank ordering breaks sim ties by ascending source_id (deterministic W1)") {
    val pairs = Seq((1, 5, 0.5), (1, 3, 0.5), (1, 4, 0.9))
    val out = run(pairs)
    assert(out.map(r => (r._4, r._2)).toSeq == Seq((1L, 4), (2L, 3), (3L, 5)))
  }

  test("multiple groups are independent") {
    val g1 = (1 to 11).map(i => (1, i, 1.0 - i * 0.01))
    val g2 = (1 to 12).map(i => (2, i, if (i >= 10) 0.4 else 1.0 - i * 0.01))
    val out = run(g1 ++ g2)
    assert(out.count(_._1 == 1) == 10)
    assert(out.count(_._1 == 2) == 10)
    val g2flags = out.filter(_._1 == 2).map(r => r._2 -> r._5).toMap
    assert(g2flags(10) == 3L) // sources 10,11,12 tie at 0.4; only 10 in top-k
    assert(out.filter(_._1 == 1).forall(_._5 == 0L))
  }
}
