package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared mechanics of the durable-state subsystems the library
  * keeps fresh under a stream (IVF postings — st17/AnnIndex, BM25
  * postings — st18/TextIndex, the LSM MinHash dedup index — st20/
  * DedupIndex, the k-NN edge list — st21/KnnGraphIndex). Each
  * subsystem owns its DERIVATION (what a batch folds in); the state
  * DISCIPLINE is one of two shapes and lives here, once:
  *
  *  - [[appendTagged]] for append-only FACTS: a batch's rows land
  *    under their own `ingest=<tag>` partition level via dynamic
  *    partition overwrite, so a redelivered tag replaces exactly its
  *    own partitions — exactly-once state from at-least-once delivery.
  *  - [[VersionChain]] for state that is NOT append-only (a new row
  *    can displace an old one, e.g. a rank-k edge list or an LSM
  *    signature set): each batch derives a whole new version from the
  *    newest version built by a SMALLER batch id and overwrites its
  *    own directory on replay — never chains a duplicate.
  *
  * [[visibleBatchId]] scopes fact reads BY BATCH ID (not by what
  * exists on disk): a crash-redelivered batch recomputes against
  * exactly the facts its original run saw, even though later batches'
  * partitions already exist by redelivery time.
  */
object StateStore {

  /** Write `df` under `dir/ingest=<tag>` (plus `extraPartitionCols`
    * levels below it) through dynamic partition overwrite — the
    * idempotent tagged append. The overwrite-mode conf must land on
    * the session the WRITE runs under: inside foreachBatch that is the
    * micro-batch's CLONED session, whose conf is isolated from the
    * caller's; setting it on `s` alone leaves the clone in static
    * mode, and a static overwrite wipes every other ingest partition
    * (observed: only the last batch survived the drain).
    */
  def appendTagged(s: SparkSession, df: DataFrame, dir: String, tag: String,
      extraPartitionCols: Seq[String] = Seq.empty): Unit = {
    val tagged = df.withColumn("ingest", lit(tag))
    val sess = tagged.sparkSession
    val prev = sess.conf.get("spark.sql.sources.partitionOverwriteMode",
      "static")
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try tagged.write.mode("overwrite")
      .partitionBy("ingest" +: extraPartitionCols: _*).parquet(dir)
    finally sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // the session's FileStatusCache still lists the replaced files;
    // without this, the next read of dir serves deleted part paths
    s.catalog.refreshByPath(dir)
  }

  /** Batch-id visibility rank of an `ingest` tag: `b<digits>` → the
    * numeric id; anything else (a bootstrap tag) → -1, visible to
    * every batch. Filter facts with `visibleBatchId <= myId` so a
    * replayed batch sees exactly what its original run saw.
    */
  def visibleBatchId: Column =
    when(col("ingest").rlike("^b[0-9]+$"),
      substring(col("ingest"), 2, 18).cast("long")).otherwise(lit(-1L))

  /** The batch-id version chain: versions live as
    * `$baseDir/$prefix<id>` directories next to a bootstrap version
    * named `bootName` at `bootPath` (which may live elsewhere — e.g. a
    * warm-cache dir). The chain is the idempotency: batch `id` always
    * derives from [[parentFor]]`(id)` — the newest version built by a
    * STRICTLY smaller batch id — and overwrites [[dirFor]]`(id)`, so a
    * foreachBatch retry or checkpoint replay recomputes from the SAME
    * parent and never chains a duplicate version. Every version stays
    * readable (audits, time travel) until [[compact]] folds versions
    * older than the retained window, after which replays behind the
    * recorded horizon are rejected instead of silently re-parented.
    */
  final case class VersionChain(baseDir: String, prefix: String,
      bootName: String, bootPath: String) {
    private def idOf(name: String): Long =
      if (name == bootName) -1L else name.stripPrefix(prefix).toLong

    private def horizonPath =
      java.nio.file.Paths.get(baseDir, "_compact_horizon")

    /** Oldest numbered id that survived the last [[compact]] — replays
      * at or below it are rejected (their parent is folded away).
      * [[Long.MinValue]] when the chain has never been compacted.
      */
    def horizon: Long =
      if (java.nio.file.Files.exists(horizonPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(horizonPath),
          java.nio.charset.StandardCharsets.UTF_8).trim
        // a malformed horizon (e.g. a partial write by a pre-r14 build,
        // or manual edits) must fail with the actionable rebuild hint,
        // not a bare NumberFormatException on every parentFor call
        try txt.toLong
        catch {
          case _: NumberFormatException => throw new IllegalStateException(
            s"malformed compaction horizon at $horizonPath " +
              s"(contents: '${txt.take(40)}') — the chain metadata is " +
              "corrupt; delete the state dir and rebuild from the " +
              "bootstrap instead of deriving from an unknown horizon")
        }
      }
      else Long.MinValue

    /** Fold superseded versions: keep the newest `keepLast` numbered
      * versions, delete the rest, and record the compaction HORIZON
      * (the oldest surviving numbered id) in `_compact_horizon`. The
      * bootstrap is never touched — it may live in a shared warm dir
      * ([[bootPath]]) other consumers read. Laws this preserves:
      *  - [[headPath]] is identical before and after (the newest
      *    version always survives, keepLast >= 1);
      *  - [[parentFor]]`(id)` is identical for every id STRICTLY above
      *    the horizon — the max-below walk only ever selects versions
      *    >= the oldest kept one;
      *  - a replay at or below the horizon would silently re-derive
      *    from a WRONG (older or bootstrap) parent, so [[parentFor]]
      *    rejects it loudly — at deployment cadence the stream's
      *    checkpoint is always ahead of any sane horizon, and a replay
      *    that far back means the checkpoint was lost, which demands a
      *    rebuild, not a silent wrong answer.
      * The horizon is written BEFORE the deletes, so a crash between
      * the two still rejects pre-horizon replays rather than serving
      * them a folded-away parent. Without compaction st20/st21 storage
      * grows one full version per batch forever — index size × batch
      * count; with it, the retained window is a config knob (the
      * dedup_index_compact precedent for the LSM postings).
      *
      * PRECONDITION: every surviving version must be SELF-CONTAINED.
      * st21's edge list and st17/18's tagged appends are; st20's LSM
      * meta reaches into EARLIER version dirs (rawDirs/dfDirs lineage),
      * so its lifecycle is fold first (DedupIndex.compact writes a
      * self-contained maintenance version), drop dirs second — the
      * StreamingSpec compaction tests pin both flows.
      */
    def compact(keepLast: Int): Unit = {
      require(keepLast >= 1,
        s"compact(keepLast=$keepLast): must keep at least the head")
      val numbered = versions().filter(_ != bootName).sortBy(idOf)
      if (numbered.length > keepLast) {
        val kept = numbered.takeRight(keepLast)
        // atomic horizon write (temp + ATOMIC_MOVE): a crash MID-WRITE
        // must never leave a truncated horizon file that poisons every
        // later parentFor (the doc above covers a crash BETWEEN write
        // and deletes; this covers a crash during the write itself)
        val tmp = java.nio.file.Paths.get(baseDir,
          s"_compact_horizon.tmp${System.nanoTime()}")
        java.nio.file.Files.write(tmp,
          idOf(kept.head).toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, horizonPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        numbered.dropRight(keepLast)
          .foreach(n => graft.Scratch.delete(s"$baseDir/$n"))
      }
    }

    /** All version names on disk, bootstrap first (unordered past that). */
    def versions(): Seq[String] = {
      val base = new java.io.File(baseDir)
      val pat = java.util.regex.Pattern.quote(prefix) + "\\d+"
      val bs = Option(base.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .map(_.getName).filter(_.matches(pat))
      bootName +: bs
    }

    def pathOf(name: String): String =
      if (name == bootName) bootPath else s"$baseDir/$name"

    /** Name of the newest version built by a batch id < `id` — the
      * replay-deterministic parent (the bootstrap ranks -1). Rejects
      * ids at or below the [[compact]] horizon: their original parent
      * is folded away, and deriving from an older survivor would be a
      * silently different computation than the original run's.
      */
    def parentFor(id: Long): String = {
      require(id > horizon,
        s"batch $id is at or below the compaction horizon ($horizon) of " +
          s"$baseDir — its parent version was folded away; a replay " +
          "this far back means the stream checkpoint predates the " +
          "retained window: rebuild the state instead of deriving from " +
          "a wrong parent")
      versions().filter(n => idOf(n) < id).maxBy(idOf)
    }

    def parentPathFor(id: Long): String = pathOf(parentFor(id))

    /** The directory batch `id`'s version (over)writes. */
    def dirFor(id: Long): String = s"$baseDir/$prefix$id"

    /** Path of the chain head — the serving version. */
    def headPath: String = parentPathFor(Long.MaxValue)
  }
}
