package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextHashSpec extends AnyFunSuite {

  test("tokenHash: empty and null map to 0") {
    assert(TextHash.tokenHash("") == 0L)
    assert(TextHash.tokenHash(null) == 0L)
  }

  test("tokenHash folds left from an unmodded first-char seed (DuckDB list_reduce semantics)") {
    // 'ab' -> 'a'*31 + 'b' = 97*31 + 98
    assert(TextHash.tokenHash("ab") == 97L * 31 + 98)
    assert(TextHash.tokenHash("a") == 97L)
  }

  test("shingleSet: short texts collapse to the whole text") {
    assert(TextHash.shingleSet("").toSeq == Seq(""))
    assert(TextHash.shingleSet("one").toSeq == Seq("one"))
    assert(TextHash.shingleSet("one two").toSeq == Seq("one two"))
  }

  test("shingleSet: sliding 3-grams, distinct") {
    assert(TextHash.shingleSet("a b c d").toSeq == Seq("a b c", "b c d"))
    assert(TextHash.shingleSet("a b a b a b").toSeq ==
      Seq("a b a", "b a b")) // duplicates collapse
  }

  test("shingleMin equals the min token-hash over the shingle set") {
    for (s <- Seq("a b c d e", "x", "lorem ipsum dolor sit amet", "a a a a")) {
      assert(TextHash.shingleMin(s) ==
        TextHash.shingleSet(s).map(TextHash.tokenHash).min)
    }
  }

  test("simhash32 stays in unsigned 32-bit range and is order-sensitive only via token multiset") {
    val h1 = TextHash.simhash32("alpha beta gamma")
    val h2 = TextHash.simhash32("gamma beta alpha")
    assert(h1 >= 0L && h1 < (1L << 32))
    // SimHash is a bag-of-tokens signature: permutation-invariant
    assert(h1 == h2)
  }

  test("simhash32 of similar texts is close in Hamming distance; dissimilar far") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the lazy cat again and again"
    val far  = "completely unrelated words describing spark catalyst optimizer rules"
    assert(ham(TextHash.simhash32(base), TextHash.simhash32(near)) <=
      ham(TextHash.simhash32(base), TextHash.simhash32(far)))
  }
}
