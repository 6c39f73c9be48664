package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The persistent near-dup index contract: run 2 reads the durable
  * state, shingles ONLY the delta, and emits exactly the pairs a
  * from-scratch run over the combined corpus emits (restricted to the
  * recomputed set it is allowed to touch) — including when the delta
  * pushes a shingle across the df cap and old signatures go stale.
  */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_ndidx_spec").toString

  /** From-scratch verified pairs over `docs` (released eagerly). */
  private def fromScratch(docs: DataFrame): Set[(Long, Long, Double)] = {
    val (verified, post) = Dedup.minhashVerifiedLazy(s, docs,
      identity[DataFrame] _)
    val out = verified.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    post.unpersist(true)
    out
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private val base = docsDf(
    1L -> "the quick brown fox jumps over the lazy dog tonight",
    2L -> "the quick brown fox jumps over the lazy cat tonight",
    3L -> "spark catalyst optimizer rewrites logical query plans",
    4L -> "completely unrelated text about cooking pasta dinners")

  test("update shingles only the delta and emits the from-scratch pairs touching it") {
    val root = tmpRoot()
    DedupIndex.bootstrap(s, base, s"$root/v1")
    val delta = docsDf(
      5L -> "the quick brown fox jumps over the lazy dog today",
      6L -> "spark catalyst optimizer rewrites logical query plans")
    val all = base.union(delta)
    val res = DedupIndex.update(s, all, s"$root/v1", s"$root/v2")
    assert(res.metrics.nDelta == 2)
    assert(res.metrics.nAffected == 0)
    // delta-proportional: exactly the delta was re-signed, nothing else
    assert(res.metrics.nSigsRecomputed == res.metrics.nDelta)
    val deltaIds = Set(5L, 6L)
    val expected = fromScratch(all)
      .filter { case (i, j, _) => deltaIds(i) || deltaIds(j) }
    assert(pairSet(res.pairs) == expected)
    assert(expected.nonEmpty, "fixture must actually produce near-dup pairs")
  }

  test("updated state equals a from-scratch bootstrap (signatures and df)") {
    val root = tmpRoot()
    DedupIndex.bootstrap(s, base, s"$root/v1")
    val delta = docsDf(5L -> "the quick brown fox jumps over the lazy dog today")
    val all = base.union(delta)
    DedupIndex.update(s, all, s"$root/v1", s"$root/v2")
    DedupIndex.bootstrap(s, all, s"$root/scratch")
    // sig is a full table per version; df/rawpost are batch lineages,
    // compared through the lineage-aware readers
    for ((inc, scratch) <- Seq(
      s.read.parquet(s"$root/v2/sig") -> s.read.parquet(s"$root/scratch/sig"),
      DedupIndex.dfAll(s, s"$root/v2") -> DedupIndex.dfAll(s, s"$root/scratch"),
      DedupIndex.rawAll(s, s"$root/v2") -> DedupIndex.rawAll(s, s"$root/scratch"))) {
      assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty,
        "state diverged from from-scratch")
    }
  }

  test("a delta that flips a shingle over the df cap re-signs the affected old docs") {
    // dfCap=2: the base corpus has a shingle in exactly 2 docs (not
    // hot); the delta adds a third occurrence, flipping it hot — the
    // two OLD docs' kept posting sets change, so their signatures are
    // stale and must be recomputed for incremental == from-scratch.
    val cap = 2
    val shared = "alpha beta gamma"
    val b = docsDf(
      1L -> s"$shared one extra word here",
      2L -> s"$shared two extra word here",
      3L -> "totally different text with nothing shared at all")
    val root = tmpRoot()
    DedupIndex.bootstrap(s, b, s"$root/v1", dfCap = cap)
    val delta = docsDf(4L -> s"$shared three extra word here")
    val all = b.union(delta)
    // no dfCap here: update must pick the bootstrap cap up from meta/
    val res = DedupIndex.update(s, all, s"$root/v1", s"$root/v2")
    assert(res.metrics.nDelta == 1)
    assert(res.metrics.nAffected == 2, "both old docs carrying the flipped shingle")
    assert(res.metrics.nSigsRecomputed == 3)
    // with the flip handled, the new state must equal from-scratch
    DedupIndex.bootstrap(s, all, s"$root/scratch", dfCap = cap)
    val inc = s.read.parquet(s"$root/v2/sig")
    val scratch = s.read.parquet(s"$root/scratch/sig")
    assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty,
      "flip-affected signatures diverged from from-scratch")
  }

  test("meta records the build cap; update writes only delta-sized batches") {
    val root = tmpRoot()
    DedupIndex.bootstrap(s, base, s"$root/v1", dfCap = 7)
    assert(DedupIndex.dfCapOf(s, s"$root/v1") == 7)
    val all = base.union(docsDf(5L -> "some new appended document text"))
    DedupIndex.update(s, all, s"$root/v1", s"$root/v2")
    assert(DedupIndex.dfCapOf(s, s"$root/v2") == 7, "cap must propagate")
    // delta-proportional state I/O: the v2 postings BATCH holds doc 5
    // alone; the full corpus is served through the meta lineage
    val batchIds = s.read.parquet(s"$root/v2/rawpost")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(batchIds == Set(5L), s"v2 batch must hold only the delta, got $batchIds")
    assert(DedupIndex.rawAll(s, s"$root/v2")
      .select("doc_id").distinct().count() == 5)
  }

  test("compact folds the lineage into one batch with identical contents") {
    val root = tmpRoot()
    DedupIndex.bootstrap(s, base, s"$root/v1")
    val all = base.union(docsDf(5L -> "the quick brown fox jumps over the lazy dog today"))
    DedupIndex.update(s, all, s"$root/v1", s"$root/v2")
    DedupIndex.compact(s, s"$root/v2", s"$root/c")
    val mc = DedupIndex.metaOf(s, s"$root/c")
    assert(mc.rawDirs.size == 1 && mc.dfDirs.size == 1)
    for ((a, b) <- Seq(
      DedupIndex.dfAll(s, s"$root/v2") -> DedupIndex.dfAll(s, s"$root/c"),
      DedupIndex.rawAll(s, s"$root/v2") -> DedupIndex.rawAll(s, s"$root/c"),
      s.read.parquet(s"$root/v2/sig") -> s.read.parquet(s"$root/c/sig"))) {
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "compaction changed state contents")
    }
    // and a further update runs off the compacted version
    val all2 = all.union(docsDf(6L -> "yet another appended document entirely"))
    val res = DedupIndex.update(s, all2, s"$root/c", s"$root/v3")
    assert(res.metrics.nDelta == 1)
  }

  test("assertAppendOnly passes on appends and throws on mutated content") {
    val root = tmpRoot()
    DedupIndex.bootstrap(s, base, s"$root/v1")
    val appended = base.union(docsDf(9L -> "a brand new appended doc"))
    DedupIndex.assertAppendOnly(s, appended, s"$root/v1") // must not throw
    val mutated = docsDf(
      1L -> "REWRITTEN text for an already indexed id",
      2L -> "the quick brown fox jumps over the lazy cat tonight")
    val e = intercept[IllegalStateException] {
      DedupIndex.assertAppendOnly(s, mutated, s"$root/v1")
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("purge removes tombstoned docs and equals a bootstrap of the remaining corpus") {
    // cap=2 with a shingle in exactly 3 docs (hot); purging one carrier
    // flips it back under the cap, so the two SURVIVING carriers must be
    // re-signed for purged == from-scratch to hold
    val cap = 2
    val shared = "alpha beta gamma"
    val all = docsDf(
      1L -> s"$shared one extra word here",
      2L -> s"$shared two extra word here",
      3L -> s"$shared three extra word here",
      4L -> "totally different text with nothing shared at all")
    val root = tmpRoot()
    DedupIndex.bootstrap(s, all, s"$root/v1", dfCap = cap)
    val m = DedupIndex.purge(s, docsDf(3L -> "ignored").select("doc_id"),
      s"$root/v1", s"$root/v2")
    assert(m.nPurged == 1)
    assert(m.nAffected == 2, "both surviving carriers of the cooled shingle")
    val remaining = all.filter(org.apache.spark.sql.functions.col("doc_id") =!= 3L)
    DedupIndex.bootstrap(s, remaining, s"$root/scratch", dfCap = cap)
    for ((a, b) <- Seq(
      s.read.parquet(s"$root/v2/sig") -> s.read.parquet(s"$root/scratch/sig"),
      DedupIndex.dfAll(s, s"$root/v2") -> DedupIndex.dfAll(s, s"$root/scratch"),
      DedupIndex.rawAll(s, s"$root/v2") -> DedupIndex.rawAll(s, s"$root/scratch"))) {
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "purged state diverged from bootstrap of the remaining corpus")
    }
    // purge compacts: single-batch lineage, and updates keep working
    assert(DedupIndex.metaOf(s, s"$root/v2").rawDirs.size == 1)
    val res = DedupIndex.update(s,
      remaining.union(docsDf(9L -> "a fresh doc after the purge")),
      s"$root/v2", s"$root/v3")
    assert(res.metrics.nDelta == 1)
  }

  test("full lifecycle update→update→purge→update equals from-scratch over the survivors") {
    // The composed contract over a MULTI-BATCH lineage, with a cap flip
    // in each direction along the way: two updates (the second over the
    // first's two-batch lineage), a purge that both removes docs and
    // cools a hot shingle, then a further update on the purged state —
    // the final state must be indistinguishable from bootstrapping the
    // surviving corpus + later deltas from scratch.
    val cap = 2
    val shared = "alpha beta gamma"
    val root = tmpRoot()
    val b0 = docsDf(
      1L -> s"$shared one extra word here",
      2L -> s"$shared two extra word here",
      3L -> "totally different text with nothing shared at all")
    DedupIndex.bootstrap(s, b0, s"$root/v1", dfCap = cap)
    // update A: doc 4 flips the shared shingle hot (df 2→3 > cap) —
    // old carriers 1 and 2 are re-signed
    val a1 = b0.union(docsDf(
      4L -> s"$shared three extra word here",
      5L -> "spark catalyst optimizer rewrites logical query plans"))
    val resA = DedupIndex.update(s, a1, s"$root/v1", s"$root/v2")
    assert(resA.metrics.nDelta == 2 && resA.metrics.nAffected == 2)
    // update B: runs over the two-batch lineage of v2
    val a2 = a1.union(docsDf(
      6L -> "spark catalyst optimizer rewrites logical query planners",
      7L -> "another entirely unrelated document about gardening tools"))
    val resB = DedupIndex.update(s, a2, s"$root/v2", s"$root/v3")
    assert(resB.metrics.nDelta == 2)
    assert(DedupIndex.metaOf(s, s"$root/v3").rawDirs.size == 3,
      "three-batch lineage before the purge")
    // purge: doc 4 leaving cools the shared shingle (df 3→2 ≤ cap) —
    // survivors 1 and 2 re-sign; doc 5 leaving also drops its pairs
    val m = DedupIndex.purge(s, docsDf(4L -> "x", 5L -> "x").select("doc_id"),
      s"$root/v3", s"$root/v4")
    assert(m.nPurged == 2)
    assert(m.nAffected == 2, "both surviving carriers of the cooled shingle")
    // update C: ingest continues on the purged state
    val survivors = a2.filter(!col("doc_id").isin(4L, 5L))
    val a3 = survivors.union(docsDf(
      8L -> "the quick brown fox jumps over the lazy dog tonight"))
    val resC = DedupIndex.update(s, a3, s"$root/v4", s"$root/v5")
    assert(resC.metrics.nDelta == 1)
    // the composed final state ≡ one bootstrap of the final corpus
    DedupIndex.bootstrap(s, a3, s"$root/scratch", dfCap = cap)
    for ((inc, scratch) <- Seq(
      s.read.parquet(s"$root/v5/sig") -> s.read.parquet(s"$root/scratch/sig"),
      DedupIndex.dfAll(s, s"$root/v5") -> DedupIndex.dfAll(s, s"$root/scratch"),
      DedupIndex.rawAll(s, s"$root/v5") -> DedupIndex.rawAll(s, s"$root/scratch"))) {
      assert(inc.exceptAll(scratch).isEmpty && scratch.exceptAll(inc).isEmpty,
        "lifecycle state diverged from from-scratch over the survivors")
    }
    graft.Scratch.delete(root)
  }

  test("st20 version chain: a crashed-and-redelivered update recomputes " +
    "from the SAME parent and overwrites its own version, leaving the " +
    "chain and the downstream head unchanged") {
    // The streaming-maintenance contract behind st20: versions are
    // named by batch id (b<id>), the parent of batch id is the largest
    // version BELOW it — so a replay of a crashed batch resolves to the
    // same parent even if its own partial output exists, recomputes
    // deterministically, and mode("overwrite") replaces its own files.
    // Exactly-once state from at-least-once delivery, spec'd at the
    // DedupIndex grain st20's require() exercises end-to-end.
    val root = tmpRoot()
    DedupIndex.bootstrap(s, base, s"$root/v0")
    val d1 = docsDf(
      5L -> "the quick brown fox jumps over the lazy dog today")
    val d2 = docsDf(
      6L -> "spark catalyst optimizer rewrites logical query planners")
    def sigRows(dir: String): Seq[Vector[Any]] =
      s.read.parquet(s"$dir/sig").collect().map(_.toSeq.toVector).toSeq
        .sortBy(_.head.asInstanceOf[Long])
    // deltas ALONE (the streaming ingest shape), chained b1 <- v0, b2 <- b1
    DedupIndex.update(s, d1, s"$root/v0", s"$root/b1")
    val b1Once = sigRows(s"$root/b1")
    DedupIndex.update(s, d2, s"$root/b1", s"$root/b2")
    val headOnce = sigRows(s"$root/b2")
    // mid-batch-crash redelivery: batch 1 arrives AGAIN — the parent is
    // still v0 (b1 is not a version below id 1), the replay overwrites
    DedupIndex.update(s, d1, s"$root/v0", s"$root/b1")
    assert(sigRows(s"$root/b1") == b1Once,
      "replaying b1 changed its own state")
    assert(sigRows(s"$root/b2") == headOnce,
      "replaying b1 perturbed the downstream head")
    // and the chained head still equals one from-scratch build
    DedupIndex.bootstrap(s, base.union(d1).union(d2), s"$root/scratch")
    val head = s.read.parquet(s"$root/b2/sig")
    val scratch = s.read.parquet(s"$root/scratch/sig")
    assert(head.exceptAll(scratch).isEmpty && scratch.exceptAll(head).isEmpty,
      "streamed chain diverged from from-scratch")
    graft.Scratch.delete(root)
  }

  test("registered dedup_incremental_minhash (index-backed) matches the rebuild-and-filter result") {
    val docs = graft.Tables.documents(s, TestSpark.Sf0001)
      .select("doc_id", "text")
    val expected = fromScratch(docs)
      .filter { case (i, j, _) => i % 5 == 0 || j % 5 == 0 }
    val got = pairSet(
      Registry.queries("dedup_incremental_minhash")(s, TestSpark.Sf0001))
    assert(got == expected)
  }
}
