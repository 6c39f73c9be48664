package graft.queries

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** Randomized invariants of the tie-flag window pipeline (semantics
  * pinned example-by-example in TieFlagSpec; these hold for ANY input).
  * Scores are drawn from a small grid so cutoff ties actually occur.
  */
object TieFlagProps extends Properties("TieFlag") {

  // each sample runs a Spark job — 15 randomized inputs per property
  // keeps the suite fast while still exploring the space
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val pairsGen: Gen[List[(Int, Int, Double)]] = for {
    nGroups <- Gen.chooseNum(1, 3)
    rows <- Gen.listOfN(nGroups * 14, for {
      t <- Gen.chooseNum(1, nGroups)
      s <- Gen.chooseNum(1, 1000)
      v <- Gen.chooseNum(1, 8)
    } yield (t, s, v / 8.0))
  } yield rows.distinctBy(r => (r._1, r._2))

  private def run(rows: List[(Int, Int, Double)]) = {
    val spark = TestSpark.spark
    import spark.implicits._
    SimilarityPipeline.tieFlagOverPairs(
      rows.toDF("target_id", "source_id", "sim"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toList
  }

  property("per-group size <= k; ranks are 1..n without gaps") =
    Prop.forAll(pairsGen) { rows =>
      val out = run(rows)
      out.groupBy(_._1).forall { case (_, g) =>
        g.size <= SimilarityPipeline.TopK &&
          g.map(_._4).sorted == (1L to g.size).toList
      }
    }

  property("kept sims dominate dropped sims per group") =
    Prop.forAll(pairsGen) { rows =>
      val out = run(rows)
      val kept = out.map(r => (r._1, r._2)).toSet
      rows.groupBy(_._1).forall { case (t, g) =>
        val (in, outRows) = g.partition(r => kept((r._1, r._2)))
        outRows.isEmpty || in.map(_._3).min >= outRows.map(_._3).max
      }
    }

  property("nonzero flags appear only at the cutoff score and carry the full-group tie count") =
    Prop.forAll(pairsGen) { rows =>
      val out = run(rows)
      out.groupBy(_._1).forall { case (t, g) =>
        val full = rows.filter(_._1 == t)
        if (full.size < SimilarityPipeline.TopK) g.forall(_._5 == 0L)
        else {
          val cutoff = g.map(_._3).min // sim of rank-k row
          val tiesTotal = full.count(r => math.abs(r._3 - cutoff) < SimilarityPipeline.Tol)
          val tiesTop = g.count(r => math.abs(r._3 - cutoff) < SimilarityPipeline.Tol)
          g.forall { r =>
            val atCut = math.abs(r._3 - cutoff) < SimilarityPipeline.Tol
            if (atCut && tiesTotal > tiesTop) r._5 == tiesTotal
            else r._5 == 0L
          }
        }
      }
    }
}
