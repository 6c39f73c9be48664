package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Scratch-directory hygiene for queries that need a local filesystem
  * fixture (streaming sources/checkpoints, index state versions). Every
  * creation is paired with an explicit recursive delete once the result
  * no longer references the files (i.e. after [[Caching.materialize]]),
  * so repeated bench/verify iterations do not accumulate unbounded /tmp
  * trees — previously each invocation leaked inputs + checkpoints +
  * sinks.
  */
object Scratch {

  def dir(prefix: String): String =
    Files.createTempDirectory(s"graft_$prefix").toString

  /** One scratch root for process-lifetime state that cannot be deleted
    * mid-run (e.g. the Derby system home, which holds derby.log for as
    * long as the embedded engine is loaded). Deleted by a JVM shutdown
    * hook instead of eagerly.
    */
  def jvmDir(prefix: String): String = {
    val p = dir(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p)))
    p
  }

  /** Recursive delete; missing paths are a no-op. */
  def delete(root: String): Unit = {
    val p = Paths.get(root)
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally stream.close()
    }
  }

  /** Run `body` with a fresh scratch root, materialize its result so it
    * references no scratch file, then delete the root.
    */
  def withDir(s: org.apache.spark.sql.SparkSession, prefix: String)(
      body: String => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val root = dir(prefix)
    try Caching.materialize(s, body(root))
    finally delete(root)
  }
}
