package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's interface assumptions, pinned: a rename, a key drift
  * between queries and oracleSql, or an empty flagship would otherwise
  * only surface in the driver's own run, after the round closed.
  */
class DriverContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("query names are stable identifiers (driver files them as paths and JSON keys)") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"names unsafe for the driver's artifact layout: $bad")
  }

  test("query names are unique across the registry (a duplicate silently " +
    "replaces the earlier query in the driver's map)") {
    val names = graft.queries.Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dups.isEmpty, s"duplicate query names: ${dups.toSeq.sorted}")
  }

  test("declared surface only grows within a round (backstop against accidental drops)") {
    // 289 mid-round-9 (268 at the round-8 close + seeded k-means, st13,
    // st14, st15, composed medallion pipeline, temperature mix, bigram
    // LM score, quality classifier, epoch upsample, ABTT mean-center,
    // k-NN graph, path mining, quality ensemble, PCA/ABTT, NN-descent refine, isotropy report, st16 streaming gate, phrase search, dataset card, deflated PCA); a refactor that silently drops a registered query
    // family fails here with the delta visible
    assert(SparkEntry.queries.size >= 315,
      s"declared queries shrank to ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 315)
  }
}
