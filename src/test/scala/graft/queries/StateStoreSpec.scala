package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The version-chain contract st20/st21 ride on, pinned directly:
  * parent selection is by NUMERIC batch id (never lexicographic), the
  * bootstrap ranks -1 (parent of the first batch, never of itself),
  * replay of batch id derives from the same parent even after later
  * versions exist, and a prefix containing regex metacharacters is
  * quoted. The streaming specs prove the end-to-end behavior; this one
  * makes the walk's edge cases fail with a named law instead of a
  * hash mismatch three subsystems away.
  */
class StateStoreSpec extends AnyFunSuite {

  private def chainWith(names: Seq[String],
      prefix: String = "b"): StateStore.VersionChain = {
    val base = Files.createTempDirectory("vchain").toFile
    names.foreach(n => Files.createDirectory(base.toPath.resolve(n)))
    StateStore.VersionChain(base.getAbsolutePath, prefix,
      "v0", s"${base.getAbsolutePath}/boot")
  }

  test("parentFor picks the newest strictly-smaller batch id, " +
    "numerically — b9 < b10 even though 'b9' > 'b10' lexicographically") {
    val c = chainWith(Seq("b1", "b9", "b10"))
    assert(c.parentFor(11) == "b10")
    assert(c.parentFor(10) == "b9")
    assert(c.parentFor(9) == "b1")
    assert(c.headPath == c.pathOf("b10"))
  }

  test("the bootstrap ranks -1: it is the first batch's parent, and a " +
    "replayed batch never selects itself or a later version") {
    val c = chainWith(Seq("b2", "b5"))
    assert(c.parentFor(2) == "v0",
      "first batch's parent must be the bootstrap")
    // b2 replayed after b5 landed: same parent as the original run
    assert(c.parentFor(2) == "v0" && c.parentFor(5) == "b2",
      "replay must not see versions built by larger ids")
    assert(c.pathOf("v0").endsWith("/boot"),
      "bootstrap path is the configured one, not baseDir/v0")
  }

  test("non-version directories and the staging clutter next to the " +
    "chain are ignored; a regex-metachar prefix is treated literally") {
    val c = chainWith(Seq("b1", "stage_t1", "in", "ck", "b2x", "bb3"))
    assert(c.versions().toSet == Set("v0", "b1"))
    val c2 = chainWith(Seq("s+v1", "sxv2"), prefix = "s+v")
    assert(c2.versions().toSet == Set("v0", "s+v1"),
      "prefix must be quoted — 's+v' is a literal, not 's, one-or-more'")
  }

  test("dirFor composes the overwrite target from the prefix, so a " +
    "batch's replay lands on its own directory") {
    val c = chainWith(Seq("b1"))
    assert(c.dirFor(7) == s"${c.baseDir}/b7")
  }

  test("compact(keepLast) preserves the head, keeps parentFor identical " +
    "for every post-horizon id, and rejects pre-horizon replays loudly") {
    val c = chainWith(Seq("b1", "b2", "b3", "b9", "b10"))
    val headBefore = c.headPath
    val parentsBefore = Seq(10L, 11L, 42L).map(id => id -> c.parentFor(id))
    c.compact(keepLast = 2) // keeps b9, b10; horizon = 9
    assert(c.horizon == 9L)
    assert(c.headPath == headBefore, "compaction must not move the head")
    assert(c.versions().toSet == Set("v0", "b9", "b10"),
      "only the newest keepLast numbered versions survive (plus bootstrap)")
    parentsBefore.foreach { case (id, p) =>
      assert(c.parentFor(id) == p,
        s"parentFor($id) changed across compaction: $p -> ${c.parentFor(id)}")
    }
    // b9's own replay needs the folded b3 — rejected, never re-parented
    for (id <- Seq(1L, 3L, 9L)) {
      val e = intercept[IllegalArgumentException](c.parentFor(id))
      assert(e.getMessage.contains("compaction horizon"),
        s"replay of pre-horizon batch $id must name the horizon, " +
          s"got: ${e.getMessage}")
    }
  }

  test("compact is a no-op when keepLast covers every version, never " +
    "touches the bootstrap, and refuses keepLast < 1") {
    val c = chainWith(Seq("b1", "b2"))
    c.compact(keepLast = 2)
    assert(c.versions().toSet == Set("v0", "b1", "b2"))
    assert(c.horizon == Long.MinValue, "a no-op compact records no horizon")
    assert(c.parentFor(1) == "v0", "bootstrap parentage intact after no-op")
    c.compact(keepLast = 5)
    assert(c.versions().toSet == Set("v0", "b1", "b2"))
    assertThrows[IllegalArgumentException](c.compact(keepLast = 0))
  }

  test("a second compact tightens the horizon monotonically and the " +
    "horizon file is ignored by the version walk") {
    val c = chainWith(Seq("b1", "b2", "b3", "b4"))
    c.compact(keepLast = 3) // horizon 2
    assert(c.horizon == 2L)
    c.compact(keepLast = 1) // horizon 4
    assert(c.horizon == 4L)
    assert(c.versions().toSet == Set("v0", "b4"),
      "_compact_horizon must not be parsed as a version")
    assert(c.headPath == c.pathOf("b4"))
    assert(c.parentFor(5) == "b4")
  }
}
