package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}

/** Safety rail for the one plan shape that silently works at test
  * scale and detonates at cluster scale: a condition-less join whose
  * BOTH sides are large. Each of this library's intentional cross
  * joins pairs a big side with a bounded one (the flagship broadcasts
  * a filtered target slice); a big×big cartesian is always a bug —
  * O(N·M) rows that no amount of cluster survives.
  *
  * Injected as an analyzer CHECK rule (not an optimizer rewrite): it
  * vetoes before any execution, using the pre-CBO size estimates that
  * leaf relations always carry. Because it runs pre-pushdown, an
  * equi-join the author wrote as `FROM a, b WHERE a.k = b.k` (or
  * `crossJoin(b).filter(a("k") === b("k"))`) still LOOKS like a bare
  * cartesian at this stage — the condition lives in a Filter above the
  * Join until the optimizer pushes it down. The guard therefore treats
  * an equality conjunct that spans both join sides in the immediately
  * enclosing Filter as the join condition it will become, and lets the
  * plan through. Off unless `spark.graft.crossJoinGuard.maxBytes` is
  * set — the knob a production session sets to, say, its broadcast
  * threshold: any cartesian whose smaller side exceeds it is almost
  * certainly not the plan the author meant.
  */
object CrossJoinGuard extends PredicateHelper {

  val ConfKey = "spark.graft.crossJoinGuard.maxBytes"

  /** The check-rule form [[graft.GraftExtensions]] injects. */
  def rule(s: SparkSession): LogicalPlan => Unit = plan => {
    val thr = s.conf.getOption(ConfKey) match {
      case None => -1L
      case Some(v) => scala.util.Try(v.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"CrossJoinGuard: $ConfKey must be a byte count in plain " +
            s"digits, got '$v' (unset the conf to disable the guard)"))
    }
    if (thr >= 0L) check(plan, thr)
  }

  /** True iff some conjunct of `cond` is an equality whose two sides
    * resolve one against `l` and one against `r` — i.e. the predicate
    * the optimizer will push into the join as its condition.
    */
  private def hasEquiConjunct(cond: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = {
    def spans(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b)       => spans(a, b)
      case EqualNullSafe(a, b) => spans(a, b)
      case _                   => false
    }
  }

  /** Throw if `plan` contains a condition-less inner/cross join whose
    * smaller side is estimated above `maxBytes` — unless the Filter
    * directly above it carries a cross-side equality conjunct (a
    * pre-pushdown equi-join, see class doc).
    */
  def check(plan: LogicalPlan, maxBytes: Long): Unit = {
    def visit(p: LogicalPlan): Unit = p match {
      case Filter(cond, Join(l, r, Cross | Inner, None, _))
          if hasEquiConjunct(cond, l, r) =>
        visit(l); visit(r)
      case Join(l, r, Cross | Inner, None, _) =>
        val smaller = l.stats.sizeInBytes.min(r.stats.sizeInBytes)
        if (smaller > maxBytes)
          throw new IllegalStateException(
            s"CrossJoinGuard: cartesian join with smaller side ~$smaller bytes " +
              s"(> $maxBytes). A big-by-big cross join is O(N*M) at any " +
              "cluster size; add a join condition, pre-filter one side " +
              s"under the threshold, or raise/unset $ConfKey.")
        visit(l); visit(r)
      case _ => p.children.foreach(visit)
    }
    visit(plan)
  }
}
