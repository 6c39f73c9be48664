package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

object TopKProps extends Properties("TopKAgg") {

  private val entry: Gen[ScoredId] = for {
    s <- Gen.chooseNum(0.0, 1.0)
    id <- Gen.chooseNum(0L, 50L)
  } yield ScoredId(s, id)

  private val entries: Gen[List[ScoredId]] = Gen.listOf(entry)

  private def expected(xs: List[ScoredId], k: Int): Seq[ScoredId] =
    xs.sortBy(x => (-x.score, x.id)).take(k)

  property("fold of reduce equals global sort-take") =
    Prop.forAll(entries, Gen.chooseNum(1, 8)) { (xs, k) =>
      val agg = new TopKAgg(k)
      xs.foldLeft(agg.zero)(agg.reduce) == expected(xs, k)
    }

  property("merge of split halves equals unsplit fold (map-side combine safety)") =
    Prop.forAll(entries, Gen.chooseNum(1, 8)) { (xs, k) =>
      val agg = new TopKAgg(k)
      val (a, b) = xs.splitAt(xs.length / 2)
      agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce)) == expected(xs, k)
    }

  property("merge is associative") =
    Prop.forAll(entries, entries, entries, Gen.chooseNum(1, 5)) { (x, y, z, k) =>
      val agg = new TopKAgg(k)
      def buf(l: List[ScoredId]) = l.foldLeft(agg.zero)(agg.reduce)
      agg.merge(buf(x), agg.merge(buf(y), buf(z))) ==
        agg.merge(agg.merge(buf(x), buf(y)), buf(z))
    }

  property("buffer never exceeds k") =
    Prop.forAll(entries, Gen.chooseNum(1, 8)) { (xs, k) =>
      val agg = new TopKAgg(k)
      xs.foldLeft(agg.zero)(agg.reduce).size <= k
    }
}
