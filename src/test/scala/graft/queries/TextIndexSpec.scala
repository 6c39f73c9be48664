package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contracts of the persisted BM25 index that the full-corpus oracle
  * can't see: the serving scan really prunes to the query terms'
  * buckets (the point of the layout), incremental append reproduces
  * the from-scratch state exactly, and serving equals the inline
  * scorer row-for-row.
  */
class TextIndexSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def docs = graft.Tables.documents(s, TestSpark.Sf0001)
    .select("doc_id", "text")

  private def withDirs[A](prefixes: String*)(body: Seq[String] => A): A = {
    val roots = prefixes.map(graft.Scratch.dir)
    try body(roots)
    finally roots.foreach(graft.Scratch.delete)
  }

  test("serving scan reads only the query terms' bucket directories") {
    withDirs("tidxspec") { case Seq(dir) =>
      TextIndex.build(s, docs, dir)
      val pruned = TextIndex.prunedPostings(s, dir, TextIndex.Terms)
      // the scan plan carries a static partition filter on bucket
      // (inputFiles would lie here: it lists the relation's files
      // BEFORE partition pruning)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
        plan.take(2000))
      // data-level evidence: the rows actually read span at most
      // |terms| buckets, and the index holds strictly more
      // partition-column values read back as int (directory inference)
      val probed = pruned.select("bucket").distinct()
        .collect().map(_.getAs[Number](0).longValue).toSet
      assert(probed.nonEmpty && probed.size <= TextIndex.Terms.length)
      assert(probed.forall(b => b >= 0 && b < TextIndex.NBuckets))
      val all = s.read.parquet(s"$dir/post").select("bucket").distinct().count()
      assert(all > probed.size,
        "pruning assertion is vacuous: corpus only populated the probed buckets")
    }
  }

  test("append-built index state equals the from-scratch build exactly") {
    withDirs("tidxinc", "tidxfull") { case Seq(dirInc, dirFull) =>
      TextIndex.build(s, docs.filter(col("doc_id") % 3 =!= 0), dirInc)
      TextIndex.append(s, docs.filter(col("doc_id") % 3 === 0), dirInc)
      TextIndex.build(s, docs, dirFull)
      val pInc = s.read.parquet(s"$dirInc/post")
      val pFull = s.read.parquet(s"$dirFull/post")
      assert(pInc.exceptAll(pFull).isEmpty && pFull.exceptAll(pInc).isEmpty,
        "postings diverge between incremental and rebuild")
      val sInc = s.read.parquet(s"$dirInc/stats").head()
      val sFull = s.read.parquet(s"$dirFull/stats").head()
      assert(sInc.getLong(0) == sFull.getLong(0) &&
        sInc.getLong(1) == sFull.getLong(1), "stats diverge")
    }
  }

  test("index serving equals the inline scorer's top-k row-for-row") {
    withDirs("tidxserve") { case Seq(dir) =>
      TextIndex.build(s, docs, dir)
      val served = TextIndex.query(s, dir, 10).collect().toSeq
      val inline = Registry.queries("text_bm25_topk")(s, TestSpark.Sf0001)
        .collect().toSeq
      assert(served == inline)
    }
  }

  test("append stage runs on a copy: repeated runs never mutate the shared bootstrap") {
    // if the stage appended into the process-cached bootstrap instead
    // of its own copy, the second run would fold the delta twice and
    // every tf/posting count would drift
    val q = Registry.queries("text_index_append")
    val r1 = q(s, TestSpark.Sf0001).collect().map(_.toSeq).toSeq
    val r2 = q(s, TestSpark.Sf0001).collect().map(_.toSeq).toSeq
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("power-of-two resharding split law: doubling NBuckets splits each bucket into exactly {b, b+N}") {
    // with bucket = hash mod N, growing N arbitrarily scatters terms
    // across all old buckets, but doubling is clean: every term in old
    // bucket b lands in b or b+N under 2N, and both children are
    // reachable — a reshard rewrites each old bucket once. Checked
    // over the corpus's real token vocabulary.
    import graft.functions.TextHash
    val n = TextIndex.NBuckets
    val corpusVocab = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("tok"))
      .distinct().collect().map(_.getString(0)).filter(_.nonEmpty)
    // the law is a property of the hash, not the data — widen the small
    // fixture vocabulary with synthetic terms to cover every bucket
    val vocab = corpusVocab ++ (0 until 2000).map(i => s"synthetic_term_$i")
    assert(corpusVocab.nonEmpty)
    def bucket(t: String, nb: Int): Long = {
      val h = TextHash.tokenHash(t) % nb; (h + nb) % nb
    }
    vocab.foreach { t =>
      val b = bucket(t, n); val b2 = bucket(t, 2 * n)
      assert(b2 == b || b2 == b + n,
        s"term '$t' left its split pair: $b -> $b2")
    }
    // both children occur somewhere (the doubling really splits)
    val children = vocab.map(t => bucket(t, 2 * n)).toSet
    assert(children.exists(_ >= n) && children.exists(_ < n))
  }
}
