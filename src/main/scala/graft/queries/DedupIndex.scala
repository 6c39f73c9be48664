package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Caching

/** Persistent MinHash near-dup index — the reference's incremental
  * contract (tanimoto.py:28-58 keeps a durable `used_input_files` state
  * so a daily run only processes new inputs) re-expressed as parquet
  * state tables:
  *
  *  - `rawpost/` (doc_id, sh, h) — raw hashed postings, the output of
  *    the only text-processing stage ([[Dedup.rawPostings]]);
  *  - `df/`      (sh, df)        — shingle document frequencies, which
  *    merge across batches by summation;
  *  - `sig/`     (doc_id, th, n, m0..m7) — MinHash signatures + set
  *    sizes + a content hash (`th`) for the append-only audit;
  *  - `meta/`    (df_cap) — the parameters the index was built with;
  *    [[update]] reads them back, so two state versions can never mix
  *    signatures computed under different caps.
  *
  * [[update]] shingles ONLY documents not yet in the index; everything
  * else is relational algebra over the persisted tables. Results are
  * IDENTICAL to a from-scratch run: the merged df table equals the
  * full-corpus df, and documents whose df-cap/rescue status changed
  * because the delta pushed a shingle across [[Dedup.DfCap]] are
  * detected (the `flipped` set) and re-signed along with the delta —
  * the index never serves a stale signature.
  *
  * THE CORPUS CONTRACT IS APPEND-ONLY — the reference's
  * used_input_files semantics (tanimoto.py:28-58): a doc_id, once
  * indexed, is immutable, and deletions are not reflected. A doc_id
  * reused with DIFFERENT text is out of contract: [[update]] would keep
  * serving the original signature. [[assertAppendOnly]] audits exactly
  * that (content hashes are stored per doc), so a pipeline that cannot
  * guarantee immutability upstream can fail loudly instead of serving
  * stale pairs.
  *
  * Each update WRITES A NEW state directory instead of mutating the old
  * one: safe on object stores (no read-modify-write races, atomic
  * adoption by switching a pointer, trivial rollback), and the previous
  * version remains readable for audits. At 100 TB the state tables are
  * a small multiple of the corpus token count, partitioned like any
  * other warehouse table.
  */
object DedupIndex {

  /** What an [[update]] actually did — the delta-proportionality
    * evidence: `nSigsRecomputed == nDelta + nAffected`, where
    * nAffected counts previously-indexed docs whose cap status a
    * flipped shingle changed (zero on a typical day).
    */
  case class UpdateMetrics(nDelta: Long, nAffected: Long, nSigsRecomputed: Long)

  case class UpdateResult(pairs: DataFrame, metrics: UpdateMetrics)

  /** Content hash stored per indexed doc — the append-only audit key. */
  private def contentHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), xxhash64(col("text")).as("th"))

  /** Full build of the index state for `docs` (doc_id, text) under
    * `stateDir` — run once, then [[update]] per batch.
    */
  def bootstrap(s: SparkSession, docs: DataFrame, stateDir: String,
      dfCap: Int = Dedup.DfCap): Unit = {
    Dedup.rawPostings(s, docs)
      .write.mode("overwrite").parquet(s"$stateDir/rawpost")
    // downstream stages derive from the durable copy, never re-shingle
    val raw = s.read.parquet(s"$stateDir/rawpost")
    Dedup.shingleDf(raw).write.mode("overwrite").parquet(s"$stateDir/df")
    val dfT = s.read.parquet(s"$stateDir/df")
    Dedup.signatures(Dedup.cappedPostings(raw, dfT, dfCap))
      .join(contentHash(docs), Seq("doc_id"))
      .write.mode("overwrite").parquet(s"$stateDir/sig")
    writeMeta(s, stateDir, dfCap)
  }

  private def writeMeta(s: SparkSession, stateDir: String, dfCap: Int): Unit = {
    import s.implicits._
    Seq(dfCap).toDF("df_cap").coalesce(1)
      .write.mode("overwrite").parquet(s"$stateDir/meta")
  }

  /** The dfCap a state version was built with — every [[update]] reads
    * it back instead of trusting a caller-supplied value.
    */
  def dfCapOf(s: SparkSession, stateDir: String): Int =
    s.read.parquet(s"$stateDir/meta").head().getAs[Int]("df_cap")

  /** Audit the append-only contract (class doc): returns the doc_ids
    * whose current text hash differs from the indexed one — nonempty
    * means the corpus mutated under the index and a [[bootstrap]]
    * rebuild is required. Column-pruned to (doc_id, text); no shingling.
    */
  def assertAppendOnly(s: SparkSession, docs: DataFrame, stateDir: String): Unit = {
    val changed = contentHash(docs)
      .join(s.read.parquet(s"$stateDir/sig")
        .select(col("doc_id"), col("th").as("th_indexed")), Seq("doc_id"))
      .filter(col("th") =!= col("th_indexed"))
    val n = changed.count()
    if (n > 0) throw new IllegalStateException(
      s"append-only contract violated: $n indexed doc_ids have changed " +
        "content; the index would serve stale signatures — rebootstrap")
  }

  /** Incremental update: fold the APPENDED documents of `docs`
    * (doc_id, text) into the index at `inDir` — doc_ids already indexed
    * are assumed immutable and deletions unreflected (the append-only
    * contract, class doc; audit with [[assertAppendOnly]]) — writing
    * the new state to `outDir`, and return the verified near-dup pairs
    * that TOUCH the recomputed set (delta ∪ flipped-affected) —
    * existing×existing pairs were emitted by previous runs and are
    * never re-verified.
    */
  def update(s: SparkSession, docs: DataFrame, inDir: String,
      outDir: String): UpdateResult = {
    // Parameters come from the state itself, never the caller: a cap
    // mismatch would silently serve signatures built under another cap.
    val dfCap = dfCapOf(s, inDir)
    val oldRaw = s.read.parquet(s"$inDir/rawpost")
    val oldDf = s.read.parquet(s"$inDir/df")
      .select(col("sh"), col("df").as("df_old"))
    val oldSig = s.read.parquet(s"$inDir/sig")

    // The durable used-set: anything already signed is never re-read.
    val indexed = oldSig.select("doc_id")
    val delta = docs.join(indexed, Seq("doc_id"), "left_anti")

    // The ONLY text processing of the whole update. The delta postings
    // land in a scratch dir (deleted before returning — they are merged
    // into rawpost/, not part of the rawpost/df/sig/meta state layout).
    val scratch = s"$outDir/_scratch"
    Dedup.rawPostings(s, delta)
      .write.mode("overwrite").parquet(s"$scratch/deltapost")
    val deltaRaw = s.read.parquet(s"$scratch/deltapost")

    oldRaw.select("doc_id", "sh", "h")
      .union(deltaRaw.select("doc_id", "sh", "h"))
      .write.mode("overwrite").parquet(s"$outDir/rawpost")
    val raw = s.read.parquet(s"$outDir/rawpost")

    // df merges by summation — no rescan of old postings.
    oldDf
      .join(Dedup.shingleDf(deltaRaw).select(col("sh"), col("df").as("df_delta")),
        Seq("sh"), "full")
      .select(col("sh"),
        (coalesce(col("df_old"), lit(0L)) + coalesce(col("df_delta"), lit(0L)))
          .as("df"))
      .write.mode("overwrite").parquet(s"$outDir/df")
    val dfT = s.read.parquet(s"$outDir/df")

    // Shingles whose hot status the delta changed: every previously-
    // indexed doc carrying one has a stale signature (its kept/rescued
    // posting set changed) and must be re-signed — the correctness
    // guard that makes incremental == from-scratch. Derived from the
    // DURABLE df tables (not the lazy merge) so the scratch delta
    // postings can be deleted before returning.
    val flipped = dfT.join(oldDf, Seq("sh"), "left")
      .filter((coalesce(col("df_old"), lit(0L)) > dfCap) =!= (col("df") > dfCap))
      .select("sh")
    val affected = raw.join(flipped, Seq("sh")).select("doc_id").distinct()
      .join(indexed, Seq("doc_id"), "left_semi")
    val recompute = affected.union(delta.select("doc_id")).distinct()
      .persist()

    val post = Dedup.cappedPostings(raw, dfT, dfCap).persist()
    val sigRe = Dedup.signatures(post.join(recompute, Seq("doc_id"), "left_semi"))
      .join(contentHash(docs), Seq("doc_id"))
    val sigCols = oldSig.columns.map(col)
    oldSig.join(recompute, Seq("doc_id"), "left_anti").select(sigCols: _*)
      .union(sigRe.select(sigCols: _*))
      .write.mode("overwrite").parquet(s"$outDir/sig")
    val sig = s.read.parquet(s"$outDir/sig")
    writeMeta(s, outDir, dfCap)

    val metrics = UpdateMetrics(
      nDelta = delta.count(),
      nAffected = affected.count(),
      nSigsRecomputed = sigRe.count())

    // Candidates from the FULL band index (a new doc must pair with an
    // old one), pruned to pairs touching the recomputed set BEFORE
    // verification — verify cost is delta-proportional.
    val cand = Dedup.bucketPairs(Dedup.bandKeys(sig), Dedup.SaltCap)
    // using-column joins reorder columns — realign before the union
    val touching = cand
      .join(recompute.select(col("doc_id").as("i")), Seq("i"), "left_semi")
      .select("i", "j")
      .union(cand
        .join(recompute.select(col("doc_id").as("j")), Seq("j"), "left_semi")
        .select("i", "j"))
      .distinct()
    val pairs = Caching.releasing(s, post, recompute)(
      Dedup.verifyPairs(touching, post, sig))
    // pairs is materialized above, so nothing references the scratch
    // delta postings any more — drop them; the state dir now holds
    // exactly the documented rawpost/df/sig/meta layout.
    val sp = new org.apache.hadoop.fs.Path(scratch)
    sp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(sp, true)
    UpdateResult(pairs, metrics)
  }
}
