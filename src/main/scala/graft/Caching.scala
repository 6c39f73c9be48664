package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache-lifecycle discipline for library queries.
  *
  * A query that persist()s an intermediate and returns a lazy result
  * leaks the pinned blocks into the consumer's session: nothing ever
  * calls unpersist, so a consumer composing two library queries
  * accumulates orphaned storage (Bench/Verify clear the cache between
  * queries; a real consumer doesn't). Two tools fix that:
  *
  *  - [[materialize]] — evaluate a multi-branch intermediate ONCE
  *    without pinning catalog-cache blocks: a reliable checkpoint when
  *    `spark.graft.checkpointDir` is set (cluster mode — survives
  *    executor loss, so truncating lineage is safe), an executor-memory
  *    localCheckpoint otherwise. The materialized blocks belong to the
  *    RDD itself and are freed by Spark's ContextCleaner as soon as the
  *    result is unreferenced — no manual unpersist contract.
  *  - [[releasing]] — for the persist-is-still-right cases (a big
  *    intermediate feeding a SMALL result): eagerly materialize the
  *    result, then unpersist the intermediates deterministically before
  *    returning, so the returned DataFrame references no cached block.
  */
object Caching {

  /** Materialize `df` once for multi-branch reuse; see class doc. */
  def materialize(s: SparkSession, df: DataFrame): DataFrame = {
    val ckDir = s.conf.getOption("spark.graft.checkpointDir")
    ckDir.foreach(s.sparkContext.setCheckpointDir)
    if (ckDir.isDefined) df.checkpoint() else df.localCheckpoint(true)
  }

  /** Eagerly materialize a SMALL `result`, then release the persisted
    * intermediates it derived from; see class doc.
    */
  def releasing(s: SparkSession, cached: DataFrame*)(result: DataFrame): DataFrame = {
    val out = materialize(s, result)
    cached.foreach(_.unpersist(false))
    out
  }
}
