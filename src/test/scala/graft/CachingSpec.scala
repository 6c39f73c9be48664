package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The checkpoint-block lifecycle contract: materialize() pins blocks
  * that catalog.clearCache() cannot see, release()/flush() free them
  * deterministically — the between-queries isolation Bench/Verify rely
  * on (SCALE.md: +2 s measured on an unrelated query without it).
  */
class CachingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("materialize pins a block invisible to clearCache; flush frees it") {
    Caching.flush() // isolate from other suites sharing the session
    val before = persistedIds
    val df = Caching.materialize(spark, (1 to 1000).toDF("x"))
    assert(df.count() == 1000)
    val pinned = persistedIds -- before
    assert(pinned.nonEmpty, "localCheckpoint must pin its RDD")
    spark.catalog.clearCache()
    assert((persistedIds -- before) == pinned,
      "catalog.clearCache must NOT free checkpoint blocks (that is the bug)")
    Caching.flush()
    assert((persistedIds -- before).isEmpty, "flush must free them")
  }

  test("release frees one materialized frame, through projections, and only ours") {
    Caching.flush()
    val before = persistedIds
    val a = Caching.materialize(spark, (1 to 100).toDF("x"))
    val b = Caching.materialize(spark, (1 to 50).toDF("y"))
    a.count(); b.count()
    assert((persistedIds -- before).size == 2)
    Caching.release(a.select("x")) // projection over the LogicalRDD leaf
    assert((persistedIds -- before).size == 1, "exactly a's block freed")
    assert(b.count() == 50, "b must stay readable")
    Caching.release((1 to 5).toDF("z")) // foreign df: no-op
    assert((persistedIds -- before).size == 1)
    Caching.flush()
    assert((persistedIds -- before).isEmpty)
  }

  test("Scratch.withDir deletes the scratch tree and the result survives it") {
    var captured: String = null
    val df = Scratch.withDir(spark, "spec") { root =>
      captured = root
      (1 to 10).toDF("v").write.parquet(s"$root/t")
      spark.read.parquet(s"$root/t")
    }
    assert(!Files.exists(Paths.get(captured)), "scratch tree must be gone")
    assert(df.count() == 10, "result must not reference scratch files")
    Caching.flush()
  }
}
