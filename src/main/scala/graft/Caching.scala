package graft

import org.apache.spark.internal.Logging
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Cache-lifecycle discipline for library queries.
  *
  * A query that persist()s an intermediate and returns a lazy result
  * leaks the pinned blocks into the consumer's session: nothing ever
  * calls unpersist, so a consumer composing two library queries
  * accumulates orphaned storage. Two tools fix that:
  *
  *  - [[materialize]] — evaluate a multi-branch intermediate ONCE
  *    without pinning catalog-cache blocks: a reliable checkpoint when
  *    `spark.graft.checkpointDir` is set (cluster mode — survives
  *    executor loss, so truncating lineage is safe), an executor-memory
  *    localCheckpoint otherwise.
  *  - [[releasing]] — for the persist-is-still-right cases (a big
  *    intermediate feeding a SMALL result): eagerly materialize the
  *    result, then unpersist the intermediates deterministically before
  *    returning, so the returned DataFrame references no cached block.
  *
  * localCheckpoint blocks are NOT in the catalog cache, so
  * `spark.catalog.clearCache()` cannot free them, and Spark only reaps
  * them when the driver GCs the Dataset (ContextCleaner) — under a big
  * heap that is far too late: a harness running hundreds of queries
  * back-to-back accumulates dead checkpoint blocks that evict live ones
  * and tax every later query with GC pressure (measured: +2 s on an
  * unrelated 0.8 s query after ~100 checkpointing queries). So every
  * locally-checkpointed RDD is registered here, and:
  *
  *  - [[release]] frees one materialized DataFrame's blocks as soon as
  *    its consumer is done with it (e.g. the previous round of an
  *    iterative loop);
  *  - [[flush]] frees everything still registered — the between-queries
  *    hook for Bench/Verify or any consumer at a pipeline boundary.
  *
  * After release/flush the affected DataFrames must not be read again:
  * localCheckpoint truncates lineage, so the data is unrecoverable by
  * design (that is what makes the blocks safe to drop eagerly).
  */
object Caching extends Logging {

  private val pinned = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]

  /** Materialize `df` once for multi-branch reuse; see class doc. */
  def materialize(s: SparkSession, df: DataFrame): DataFrame = {
    val ckDir = s.conf.getOption("spark.graft.checkpointDir")
    ckDir.foreach(s.sparkContext.setCheckpointDir)
    if (ckDir.isDefined) df.checkpoint()
    else {
      if (!s.sparkContext.isLocal)
        logWarning("graft.Caching: spark.graft.checkpointDir is unset on " +
          "a non-local master — falling back to localCheckpoint, whose " +
          "blocks live only in executor memory; an executor loss makes " +
          "the materialized result unrecoverable. Set the conf to a " +
          "reliable (HDFS/object-store) path in cluster mode.")
      val out = df.localCheckpoint(true)
      out.queryExecution.analyzed match {
        case lr: LogicalRDD => pinned.add(lr.rdd)
        case _              => ()
      }
      out
    }
  }

  /** Eagerly materialize a SMALL `result`, then release the persisted
    * intermediates it derived from; see class doc. Handles BOTH kinds
    * of intermediate: `.persist()`ed frames (unpersist) and
    * [[materialize]]d frames (whose localCheckpoint blocks unpersist
    * cannot see — those go through [[release]], which only touches
    * RDDs this object registered).
    */
  def releasing(s: SparkSession, cached: DataFrame*)(result: DataFrame): DataFrame = {
    val out = materialize(s, result)
    cached.foreach { c => c.unpersist(false); release(c) }
    out
  }

  /** Free the checkpoint blocks behind one [[materialize]]d DataFrame
    * (or a projection of one — leaves are walked). Only RDDs this
    * object registered are touched, so a df built over foreign scans is
    * a no-op. The caller asserts `df` will never be read again.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD if pinned.remove(lr.rdd) =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Free every still-registered checkpoint block — the between-queries
    * isolation hook (class doc). Safe to call when nothing is pinned.
    */
  def flush(): Unit = {
    var r = pinned.poll()
    while (r != null) { r.unpersist(blocking = false); r = pinned.poll() }
  }
}
