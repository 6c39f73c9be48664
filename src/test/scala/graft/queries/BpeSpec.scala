package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential test for the BPE merge induction: the oracle proves
  * Spark and DuckDB agree, but both run the SAME SQL semantics — this
  * spec checks those semantics against an INDEPENDENT in-memory
  * reference implementation of greedy left-to-right BPE, including
  * the overlapping-run case ((a,a) pairs) the window parity exists
  * for.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Sep: Char = 31.toChar // ASCII unit separator, as in Bpe

  /** Reference greedy BPE: per round, count adjacent pairs over all
    * docs, pick (maxCount, then lexicographically smallest pair),
    * merge left-to-right non-overlapping within each doc.
    */
  private def refBpe(docs: Seq[Seq[String]], rounds: Int)
      : (Seq[(String, String, Long)], Seq[Seq[String]]) = {
    var cur = docs
    val rules = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      cur.foreach(ts => ts.zip(ts.drop(1)).foreach(p =>
        counts(p) = counts.getOrElse(p, 0L) + 1))
      val (a, b) = counts.keys.toSeq
        .sortBy { case (x, y) => (-counts((x, y)), x, y) }.head
      rules += ((a, b, counts((a, b))))
      cur = cur.map { ts =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == a && ts(i + 1) == b) {
            out += s"$a$Sep$b"; i += 2
          } else { out += ts(i); i += 1 }
        }
        out.result()
      }
    }
    (rules.result(), cur)
  }

  private def runQuery(docs: Seq[String]): Seq[(String, String, Long)] = {
    import spark.implicits._
    val df = graft.Scratch.withDir(spark, "bpe-fixture") { root =>
      docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .write.parquet(s"$root/documents.parquet")
      Registry.queries("text_bpe_merges")(spark, root)
    }
    df.collect().toSeq
      .map(r => (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"),
        r.getAs[Long]("pair_cnt")))
  }

  test("matches reference greedy BPE on overlapping same-token runs") {
    // 'x x x x x' forces the (x,x) run-parity path: 2 merges, not 4
    val docs = Seq("x x x x x", "x x y x x", "y y y")
    val got = runQuery(docs)
    val (want, _) = refBpe(docs.map(_.split(" ").toSeq), 3)
    assert(got == want.map { case (a, b, c) =>
      (a.replace(Sep, '+'), b.replace(Sep, '+'), c) },
      s"got $got want $want")
  }

  test("matches reference greedy BPE on real corpus text") {
    val texts = graft.Tables.documents(spark, TestSpark.Sf0001)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 40)
      .orderBy("doc_id")
      .collect().map(_.getAs[String]("text")).toSeq
    val got = runQuery(texts)
    val (want, _) = refBpe(texts.map(_.split(" ").toSeq), 3)
    assert(got == want.map { case (a, b, c) =>
      (a.replace(Sep, '+'), b.replace(Sep, '+'), c) },
      s"got $got want $want")
  }
}
