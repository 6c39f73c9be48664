package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}

/** Safety rail for the one plan shape that silently works at test
  * scale and detonates at cluster scale: a condition-less join whose
  * BOTH sides are large. Each of this library's intentional cross
  * joins pairs a big side with a bounded one (the flagship broadcasts
  * a filtered target slice); a big×big cartesian is always a bug —
  * O(N·M) rows that no amount of cluster survives.
  *
  * Injected as an analyzer CHECK rule (not an optimizer rewrite): it
  * vetoes before any execution, using the pre-CBO size estimates that
  * leaf relations always carry. Off unless
  * `spark.graft.crossJoinGuard.maxBytes` is set — the knob a
  * production session sets to, say, its broadcast threshold: any
  * cartesian whose smaller side exceeds it is almost certainly not
  * the plan the author meant.
  */
object CrossJoinGuard {

  val ConfKey = "spark.graft.crossJoinGuard.maxBytes"

  /** The check-rule form [[graft.GraftExtensions]] injects. */
  def rule(s: SparkSession): LogicalPlan => Unit = plan => {
    val thr = s.conf.getOption(ConfKey).map(_.toLong).getOrElse(-1L)
    if (thr >= 0L) check(plan, thr)
  }

  /** Throw if `plan` contains a condition-less inner/cross join whose
    * smaller side is estimated above `maxBytes`.
    */
  def check(plan: LogicalPlan, maxBytes: Long): Unit = plan.foreach {
    case Join(l, r, Cross | Inner, None, _) =>
      val smaller = l.stats.sizeInBytes.min(r.stats.sizeInBytes)
      if (smaller > maxBytes)
        throw new IllegalStateException(
          s"CrossJoinGuard: cartesian join with smaller side ~$smaller bytes " +
            s"(> $maxBytes). A big-by-big cross join is O(N*M) at any " +
            "cluster size; add a join condition, pre-filter one side " +
            s"under the threshold, or raise/unset $ConfKey.")
    case _ => ()
  }
}
