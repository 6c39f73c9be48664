package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Cross-invocation cache for the shared warm state (the dedup-index
  * and BM25-index bootstrap/steady dirs): the state is a deterministic
  * function of (builder code, fixture), so a bench or verify run can
  * reuse the dirs a previous JVM built instead of re-paying the
  * full-corpus build every invocation — the round-9 verdict's
  * `warm_shared_s` item (dedup warm alone was 23.6 s of every bench
  * run's wall time).
  *
  * Safety comes from the completeness marker, which stores a
  * FINGERPRINT of the builder classes (SHA-256 over the compiled
  * .class resources of the subsystems that define the state's
  * semantics) plus the fixture file's (size, mtime): ANY recompilation
  * of those classes — even a comment edit — invalidates the cache, so
  * a semantics change can never serve stale state; over-invalidation
  * just costs one rebuild. A crash mid-build leaves no marker and the
  * next run rebuilds over the partial dir (every builder writes with
  * mode=overwrite). The timed stage queries are unaffected by WHO
  * built the state: they consume these dirs read-only as inputs
  * (update/compact/purge/serve write their own output dirs), which is
  * exactly why the build cost was hoisted out of their bench lines in
  * the first place.
  *
  * Opt out with SPARK_GRAFT_WARM_CACHE=off (every invocation then
  * builds fresh process-lifetime scratch state, the pre-round-10
  * behavior); point it at a custom root otherwise. Default root:
  * /tmp/graft_warm_cache.
  */
object WarmCache {

  private def root: Option[String] =
    sys.env.get("SPARK_GRAFT_WARM_CACHE") match {
      case Some("off") | Some("none") => None
      case Some(r)                    => Some(r)
      case None                       => Some("/tmp/graft_warm_cache")
    }

  /** SHA-256 over the named compiled class resources — bumped by ANY
    * recompilation of the classes that define the cached state's
    * semantics.
    */
  private def classFingerprint(classes: Seq[Class[_]]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    classes.foreach { c =>
      val res = c.getResourceAsStream(
        "/" + c.getName.replace('.', '/') + ".class")
      require(res != null, s"no class resource for ${c.getName}")
      try {
        val buf = new Array[Byte](8192)
        var n = res.read(buf)
        while (n >= 0) { md.update(buf, 0, n); n = res.read(buf) }
      } finally res.close()
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** (size, mtime) stamp over EVERY *.parquet entry in the fixture dir
    * (file or Spark-written directory), not just documents.parquet —
    * cached state may derive from any driver table (the serve graph is
    * a pure function of embeddings.parquet), so regenerating one table
    * without the others must still invalidate.
    */
  private def fixtureStamp(sfDir: String): String = {
    val dir = Paths.get(sfDir)
    if (!Files.exists(dir)) return "nofixture"
    def leafStamp(p: java.nio.file.Path): String =
      if (Files.isDirectory(p)) {
        val s = Files.walk(p)
        try {
          val leaves = s.filter(Files.isRegularFile(_)).iterator()
          var size = 0L; var mtime = 0L
          while (leaves.hasNext) {
            val l = leaves.next()
            size += Files.size(l)
            mtime = math.max(mtime, Files.getLastModifiedTime(l).toMillis)
          }
          s"${size}_$mtime"
        } finally s.close()
      } else s"${Files.size(p)}_${Files.getLastModifiedTime(p).toMillis}"
    val entries = Files.list(dir)
    try {
      val it = entries.filter(_.getFileName.toString.endsWith(".parquet"))
        .sorted().iterator()
      val parts = Seq.newBuilder[String]
      while (it.hasNext) {
        val p = it.next()
        parts += s"${p.getFileName}=${leafStamp(p)}"
      }
      val all = parts.result()
      if (all.isEmpty) "nofixture" else all.mkString(",")
    } finally entries.close()
  }

  /** Return a directory holding the state `build` produces for
    * (tag, sfDir): the cached one when a complete same-fingerprint build
    * exists, else a fresh build (cached under the root when one is
    * configured, plain process-lifetime scratch otherwise).
    */
  def getOrBuild(tag: String, sfDir: String, classes: Seq[Class[_]],
      build: String => Unit): String = root match {
    case None =>
      val dir = Scratch.dir(tag)
      build(dir)
      dir
    case Some(r) =>
      val fp = classFingerprint(classes) + "_" + fixtureStamp(sfDir)
      // key on the full sf path, not just its basename — two trees with
      // same-named sf dirs must not collide
      val key = tag + "_" + math.abs(sfDir.hashCode).toString
      val dir = s"$r/$key"
      val marker = Paths.get(dir, "_WARM_COMPLETE")
      val hit = Files.exists(marker) &&
        new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == fp
      if (!hit) {
        // rebuild from empty: a stale or partial dir may hold files the
        // current builder would not write (older layouts, crashed runs)
        Scratch.delete(dir)
        Files.createDirectories(Paths.get(dir))
        build(dir)
        Files.write(marker, fp.getBytes(StandardCharsets.UTF_8))
      }
      dir
  }
}
