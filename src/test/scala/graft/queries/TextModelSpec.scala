package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.TextHash

import java.math.{BigDecimal => JBD, RoundingMode}

/** Differential tests for the model-shaped text operators: the bigram
  * LM scorer and the linear quality classifier are re-implemented here
  * as plain in-memory Scala (no Spark, no SQL) and compared row-for-row
  * against the registered queries — a third, independent formulation on
  * top of the DuckDB oracle.
  *
  * Rounding replica note: Spark's round() on DoubleType goes through
  * BigDecimal.valueOf (the double's SHORTEST decimal form), not the
  * exact binary expansion — the replicas must do the same or true
  * half-way points (e.g. a scaled ln term landing on x.5) diverge.
  */
class TextModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def roundHalfUp(x: Double, scale: Int): Double =
    JBD.valueOf(x).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  test("text_ngram_lm_score matches an independent in-memory bigram LM") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val tokss = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val uni = tokss.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val bi = tokss.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = uni.size.toLong
    val expected = tokss.collect { case (id, ts) if ts.length >= 2 =>
      val ps = ts.zip(ts.drop(1))
      val ll = ps.map { p =>
        val t = math.log((bi(p) + 1.0) / (uni(p._1) + v)) * 10000
        JBD.valueOf(t).setScale(0, RoundingMode.HALF_UP).longValue()
      }.sum
      id -> ((ps.length.toLong, ll / 10000.0 / ps.length))
    }.toMap
    val got = Registry.queries("text_ngram_lm_score")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, res) =>
      assert(res == expected(id), s"doc $id: got $res want ${expected(id)}")
    }
    // the smoothed probability is strictly < 1 (c1 >= c12 and V > 1),
    // so every mean log-probability is strictly negative
    got.values.foreach { case (_, score) => assert(score < 0.0) }
  }

  test("text_quality_classifier matches an in-memory replica of the " +
    "hashed linear model") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) =>
      val ts = t.split(" ", -1)
      val wsum = ts.map(x => TextHash.tokenHash("clsw_" + x) % 2001 - 1000).sum
      val z = 0.25 + wsum / (ts.length * 1000.0)
      val score = roundHalfUp(1.0 / (1.0 + math.exp(-z)), 4)
      id -> ((ts.length.toLong, wsum, score, score >= 0.5))
    }.toMap
    val got = Registry.queries("text_quality_classifier")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got == expected)
    // sigmoid range law: open interval, never saturates to 0/1 after
    // rounding unless |z| is huge — the mean-pooled z is bounded by 1.25
    got.values.foreach { case (_, _, score, _) =>
      assert(score > 0.0 && score < 1.0)
    }
  }

  test("text_tfidf_keywords matches an independent in-memory TF-IDF") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val n = docs.length.toLong
    val tf = docs.flatMap { case (id, text) =>
      text.split(" ", -1).groupBy(identity).map {
        case (tok, occ) => (id, tok, occ.length.toLong)
      }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def idfScaled(dfv: Long): Long =
      JBD.valueOf(math.log((n + 1).toDouble / (dfv + 1)) * 10000)
        .setScale(0, RoundingMode.HALF_UP).longValue()
    val expected = tf.groupBy(_._1).flatMap { case (id, toks) =>
      toks.map { case (_, tok, tfv) =>
        (id, tok, tfv, df(tok), tfv * idfScaled(df(tok)))
      }.sortBy(t => (-t._5, t._2)).take(3).zipWithIndex
        .map { case ((_, tok, tfv, dfv, sc), i) =>
          (id, (i + 1).toLong, tok, tfv, dfv, sc)
        }
    }.toSeq.sortBy(t => (t._1, t._2))
    val rows = Registry.queries("text_tfidf_keywords")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rn"),
        r.getAs[String]("tok"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
        r.getAs[Long]("score_scaled")))
      .sortBy(t => (t._1, t._2))
    assert(rows.nonEmpty)
    assert(rows.toSeq == expected)
  }
}
