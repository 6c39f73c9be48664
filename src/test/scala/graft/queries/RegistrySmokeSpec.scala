package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Every registered query must execute on sf0.001 and (except the
  * incremental empty-delta cases) produce rows. The value-level check is
  * the driver's DuckDB oracle (tools/check.py replicates it); this spec
  * is the fast regression net that keeps `sbt test` meaningful.
  */
class RegistrySmokeSpec extends AnyFunSuite {

  // Queries whose correct sf0.001 result is legitimately empty.
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "dedup_simhash",
    "dedup_embedding_cosine", "i1_incremental_delta", "s2_range_chunked_scan")

  // Nondeterministic output (current_timestamp) cannot hash-match an
  // oracle; the driver records a rows-only check for these.
  private val noOracleByDesign = Set("f10_state_timestamp")

  test("oracle coverage: every SQL-expressible query declares its DuckDB twin") {
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(noOracleByDesign)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.size == names.distinct.size)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val n = q.fn(TestSpark.spark, TestSpark.Sf0001).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }
}
