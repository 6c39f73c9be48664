package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.TextHash

/** Invariants of the curation operators that the row-level oracle
  * can't express: exact stratum fractions, determinism across runs,
  * shard partitioning, budget maximality, and true contamination of
  * every flagged document.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stratified sample takes exactly ceil(10%) of every language stratum") {
    val sample = Registry.queries("curation_stratified_sample")(spark, TestSpark.Sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables.documents(spark, TestSpark.Sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sample.nonEmpty)
    sample.foreach { case (lang, n) =>
      assert(n == math.ceil(full(lang) * 0.1).toLong, s"stratum $lang")
    }
  }

  test("sample and shuffle are deterministic across runs") {
    def run(name: String) =
      Registry.queries(name)(spark, TestSpark.Sf0001).collect().toSeq
    assert(run("curation_stratified_sample") == run("curation_stratified_sample"))
    assert(run("curation_reproducible_shuffle") == run("curation_reproducible_shuffle"))
  }

  test("shuffle shards partition the corpus") {
    val out = Registry.queries("curation_reproducible_shuffle")(spark, TestSpark.Sf0001)
      .collect()
    val total = Tables.documents(spark, TestSpark.Sf0001).count()
    assert(out.length == total) // every doc exactly once
    assert(out.map(_.getLong(0)).distinct.length == total)
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < Curation.Shards))
  }

  test("token packing respects the per-shard budget and is a maximal hash-order prefix") {
    val out = Registry.queries("curation_token_budget_pack")(spark, TestSpark.Sf0001)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) <= 3000))
    // maximality: within each shard the packed set is a PREFIX of the
    // hash order — the first excluded doc would push the sum past budget
    TextHash.register(spark)
    val all = Tables.documents(spark, TestSpark.Sf0001)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("hkey", expr(
        s"tok_hash(concat('${Curation.Salt}', cast(doc_id as string)))"))
      .withColumn("shard", pmod(col("hkey"), lit(Curation.Shards.toLong)))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("hkey"), r.getAs[Long]("shard")))
    val packed = out.map(_.getLong(0)).toSet
    all.groupBy(_._4).foreach { case (shard, docs) =>
      var cum = 0L
      var cut = false
      docs.sortBy(d => (d._3, d._1)).foreach { case (id, n, _, _) =>
        cum += n
        if (cum <= 3000 && !cut) assert(packed.contains(id), s"shard $shard doc $id")
        else { cut = true; assert(!packed.contains(id), s"shard $shard doc $id") }
      }
    }
  }

  test("every flagged train doc truly shares >= 2 uncapped shingles with a held-out doc") {
    val flagged = Registry.queries("curation_decontam_overlap")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val testShs = docs.filter(_._2 == "src3")
      .map { case (id, _, t) => id -> TextHash.shingleSet(t).toSet }
    val dfCount = testShs.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.size }
    val uncapped = testShs.map { case (id, s) =>
      id -> s.filter(sh => dfCount(sh) <= Dedup.DfCap)
    }
    val brute = docs.filter(_._2 != "src3").flatMap { case (id, _, t) =>
      val shs = TextHash.shingleSet(t).toSet
      val hits = uncapped.map { case (_, ts) => (shs intersect ts).size }
        .filter(_ >= 2)
      if (hits.isEmpty) None else Some(id -> hits.max.toLong)
    }.toMap
    assert(flagged == brute,
      s"flagged=${flagged.size} brute=${brute.size} diff=${(flagged.keySet diff brute.keySet) ++ (brute.keySet diff flagged.keySet)}")
  }
}
