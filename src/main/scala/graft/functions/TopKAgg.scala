package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) entry of a top-k buffer; ordering is score DESC then
  * id ASC — the same explicit tiebreak the window formulation (W1) uses.
  */
case class ScoredId(score: Double, id: Long)

/** Bounded per-group top-k as a typed Aggregator (SURVEY.md §4's
  * candidate `TypedImperativeAggregate` extension, realized).
  *
  * Why it exists: `row_number().over(Window.partitionBy(g).orderBy(...))`
  * shuffles EVERY row of every group before discarding all but k. This
  * aggregate keeps at most k entries per group per map task, so the
  * exchange carries ≤ k·groups rows regardless of input size — the
  * difference between shuffling 100 TB and shuffling the answer.
  * Catalyst plans it as partial + final ObjectHashAggregate; merge is
  * associative/commutative, so map-side combine is automatic.
  *
  * The buffer stays sorted (score desc, id asc); inserts into a full
  * buffer first check against the current cutoff and are O(1) rejects
  * for the overwhelming majority of rows once the group warms up.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.size >= k && !beats(x, buf.last)) buf // O(1) reject below cutoff
    else ((buf :+ x).sortWith(beats)).take(k)

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sortWith(beats).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
