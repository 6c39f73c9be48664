package graft.queries

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** Randomized equivalence of the distributed substring-span operator
  * against the brute-force model: mark every token covered by a K-gram
  * that occurs verbatim in another doc; spans are maximal contiguous
  * covered runs. Small vocab + short docs force real cross-doc gram
  * collisions.
  */
object SpanProps extends Properties("SubstringSpans") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val K = 3

  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(2, 5)
    docs <- Gen.listOfN(nDocs,
      Gen.chooseNum(K, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))))
  } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }

  private def brute(corpus: List[(Long, String)]): Map[Long, (Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toVector }.toMap
    def grams(id: Long): Seq[(Int, Seq[String])] = {
      val v = toks(id)
      if (v.length < K) Seq.empty
      else (0 to v.length - K).map(i => i -> v.slice(i, i + K))
    }
    val owners: Map[Seq[String], Set[Long]] = corpus.flatMap { case (id, _) =>
      grams(id).map { case (_, g) => (g, id) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpus.flatMap { case (id, _) =>
      val covered = grams(id).collect {
        case (i, g) if (owners(g) - id).nonEmpty => i until i + K
      }.flatten.toSet
      if (covered.isEmpty) None
      else {
        val runs = covered.toList.sorted
          .foldLeft(List.empty[List[Int]]) {
            case (acc @ (run :: rest), p) if p == run.head + 1 =>
              (p :: run) :: rest
            case (acc, p) => List(p) :: acc
          }
        Some(id -> (runs.size.toLong, covered.size.toLong))
      }
    }.toMap
  }

  property("operator == brute-force covered-run model") =
    Prop.forAll(corpusGen) { corpus =>
      val spark = TestSpark.spark
      import spark.implicits._
      val got = Dedup.substringSpans(corpus.toDF("doc_id", "text"), K)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = brute(corpus)
      Prop(got == want) :| s"got=$got want=$want corpus=$corpus"
    }
}
