package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ANN-family invariants the row-level oracle can't express: probing
  * more cells can only improve (or tie) the quality of every top-k
  * slot, and the exact kernel dominates both.
  */
class SimilaritySearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def topkByQuery(name: String): Map[Long, Seq[Double]] =
    Registry.queries(name)(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Double]("cos"), r.getAs[Long]("rn")))
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }

  test("IVF nprobe=2 dominates nprobe=1 slot-by-slot; brute force dominates both") {
    val one = topkByQuery("simsearch_ivf_bucketed")
    val two = topkByQuery("simsearch_ivf_multiprobe")
    val exact = topkByQuery("simsearch_bruteforce_topk")
    assert(one.keySet == two.keySet)
    one.foreach { case (q, cos1) =>
      val cos2 = two(q)
      cos1.zip(cos2).zipWithIndex.foreach { case ((c1, c2), k) =>
        assert(c2 >= c1, s"query $q slot $k: nprobe=2 $c2 < nprobe=1 $c1")
      }
      val ce = exact(q)
      cos2.zip(ce).zipWithIndex.foreach { case ((c2, cx), k) =>
        assert(cx >= c2, s"query $q slot $k: exact $cx < nprobe=2 $c2")
      }
    }
  }
}
