package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the perceptual-hash image near-dup operator. The banded
  * Hamming join is RECALL-LOSSLESS at the shipped radius by pigeonhole:
  * 16 bits split into 4 nibble bands means ≤2 differing bits can touch
  * at most 2 bands, so at least 2 bands agree and the pair is a
  * candidate. The per-doc report must therefore EQUAL the all-pairs
  * truth recomputed from the hashes — subset is not good enough.
  */
class PhashSpec extends AnyFunSuite {

  test("banded near-dup report equals the all-pairs Hamming truth " +
    "(lossless banding at radius 2), relation is symmetric, fixture " +
    "is non-vacuous") {
    val rows = Registry.queries("mm_image_phash")(
      TestSpark.spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.length == 100)
    assert(rows.map(_._1).distinct.length == 100)
    val hash = rows.map(r => r._1 -> r._2).toMap
    // all-pairs truth, straight from the emitted hashes
    val truth = (for {
      i <- hash.keys; j <- hash.keys if i < j
      if java.lang.Long.bitCount(hash(i) ^ hash(j)) <= 2
    } yield (i, j)).toSet
    assert(truth.nonEmpty, "no near-dup image pairs -- vacuous fixture")
    val partners = truth.toSeq.flatMap { case (i, j) => Seq(i -> j, j -> i) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (id, _, n, minP) =>
      val want = partners.getOrElse(id, Seq.empty)
      assert(n == want.length.toLong,
        s"doc $id n_neardup $n != truth ${want.length}")
      assert(minP == want.sorted.headOption,
        s"doc $id min_partner $minP != truth ${want.sorted.headOption}")
    }
    // symmetry: every pair contributes to both endpoints
    assert(rows.map(_._3).sum == 2L * truth.size)
  }

  test("a hash bit flips only when the underlying pixels change: " +
    "phashes are not all equal and not all distinct on the gradient " +
    "fixture") {
    val hs = Registry.queries("mm_image_phash")(
      TestSpark.spark, TestSpark.Sf0001).collect().map(_.getLong(1))
    assert(hs.distinct.length > 1, "degenerate: one hash for all images")
    assert(hs.distinct.length < hs.length,
      "no collisions at all -- banding untested")
  }
}
