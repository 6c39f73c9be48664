package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductF, NormF, TextHash}

/** Library packaging: everything graft adds to a session, injectable via
  * the standard extensions mechanism —
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // compile-time
  *   // or spark.sql.extensions=graft.GraftExtensions  (config-time)
  *
  * Injected functions are catalog-level (visible to SQL, `expr`, and the
  * DataFrame API) with no per-query registration calls. The per-query
  * `register` helpers remain for sessions graft doesn't own.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (children: Seq[Expression]) => DotProductF(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("norm_f"),
      new ExpressionInfo(classOf[NormF].getName, "norm_f"),
      (children: Seq[Expression]) => NormF(children.head)))
    // analyzer check rule: veto big-by-big cartesian joins before they
    // execute (active only when spark.graft.crossJoinGuard.maxBytes is
    // set — see CrossJoinGuard)
    ext.injectCheckRule(graft.plans.CrossJoinGuard.rule)
  }
}

/** Session factory with the configuration a 100 TB deployment needs set
  * BEFORE first query (values here are the local-mode variants; the
  * cluster profile differs only in sizing, not in which knobs matter):
  *
  *  - AQE on with skew-join splitting: similarity/dedup workloads are
  *    exactly where hot keys (common shingles, dense LSH buckets) appear;
  *  - shuffle partitions sized to the parallelism actually available
  *    (cluster: 2-3× total executor cores; local: the core count);
  *  - broadcast threshold generous enough that dimension tables and
  *    query-vector sets broadcast instead of shuffling the fact side;
  *  - UTC session timezone — cross-engine timestamp determinism
  *    (SURVEY.md §5).
  */
object GraftSession {
  def build(master: String = "local[*]", cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    TextHash.register(s) // UDF-backed text hashing (no Expression form yet)
    s
  }
}
