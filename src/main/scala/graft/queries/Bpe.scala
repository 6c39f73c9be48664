package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** BPE merge-rule induction — tokenizer-vocabulary training as
  * declarative rounds (north-star extension: the op a pipeline runs
  * BEFORE token counting even makes sense). Each round (a) counts
  * adjacent token pairs corpus-wide, (b) picks the most frequent pair
  * with a total deterministic tie-break, (c) applies the merge
  * greedily left-to-right exactly like reference BPE: inside a run of
  * overlapping matches (only possible for an (a,a) pair) the 1st,
  * 3rd, … matches merge and the even ones are consumed. The output is
  * the learned merge table (round, pair, pre-merge count) — the
  * artifact a tokenizer build persists.
  *
  * Greedy-run parity is pure window algebra over one doc-keyed
  * partitioning: rank-in-run = running match count minus its value at
  * the last non-match (last(...,ignoreNulls)), a merge is a match
  * with odd rank, and the following row is consumed via lag(). No
  * joins or renumbering anywhere in merge application — merged pairs
  * keep the pair-start's original `pos`, so the next round's lead()
  * adjacency just works.
  *
  * Determinism: pair counts are integers, the argmax tie-break is
  * (count desc, pair asc) over raw token bytes, and merge application
  * is window algebra over integers — no floats anywhere, so the whole
  * training run hash-matches the DuckDB twin. Merged tokens join with
  * an ASCII unit separator (chr(31), can't occur in the fixture text);
  * the output table renders it as '+'.
  *
  * Scale shape per round: one vocabulary-sized shuffle (pair groupBy)
  * plus one broadcast of the 1-row argmax; all merge-application
  * window expressions share the same doc-keyed partition+order, so
  * they stack on a single exchange+sort, and each round's output is
  * referenced exactly once by the next — no per-round checkpoint
  * needed at a fixed round count (the join-free rewrite halved the
  * sf0.1 time vs the original anti-join formulation). A production
  * vocab build runs the identical plan more times, checkpointing
  * every ~10 rounds to cap lineage.
  */
object Bpe {

  private val Rounds = 3

  /** Run the full training loop: per-round rule rows, the final token
    * table, and the materialized intermediates the caller must release.
    */
  private def train(s: SparkSession, d: String)
      : (Seq[DataFrame], DataFrame, Seq[DataFrame]) = {
    val sep = "chr(31)"
    var toks = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val mats = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val rules = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val w = Window.partitionBy("doc_id").orderBy("pos")
    for (r <- 1 to Rounds) {
      val t = toks.withColumn("nxt", lead("tok", 1).over(w))
      val best = t.filter(col("nxt").isNotNull)
        .groupBy("tok", "nxt").agg(count(lit(1)).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("tok").asc, col("nxt").asc)
        .limit(1)
        .select(col("tok").as("a"), col("nxt").as("b"), col("pair_cnt"))
      val bestM = graft.Caching.materialize(s, best)
      mats += bestM
      rules += bestM.select(lit(r.toLong).as("merge_round"),
        expr(s"replace(a, $sep, '+')").as("tok_a"),
        expr(s"replace(b, $sep, '+')").as("tok_b"), col("pair_cnt"))
      // Merge application as pure window algebra over ONE doc-keyed
      // partitioning (no joins, no per-round shuffle beyond the pair
      // count): greedy left-to-right parity inside a run of
      // overlapping matches = odd running match-count since the last
      // non-match (runs are bounded by construction, and all four
      // window expressions share the same partition+order, so they
      // stack on a single exchange+sort).
      toks = t.crossJoin(broadcast(bestM))
        .withColumn("match",
          col("tok") === col("a") && col("nxt") === col("b"))
        .withColumn("cm",
          sum(when(col("match"), 1L).otherwise(0L)).over(w))
        .withColumn("cm0", last(when(!col("match"), col("cm")), true).over(w))
        .withColumn("merged",
          col("match") && (col("cm") - coalesce(col("cm0"), lit(0L))) % 2 === 1)
        .withColumn("consumed",
          coalesce(lag("merged", 1).over(w), lit(false)))
        .filter(!col("consumed"))
        .select(col("doc_id"), col("pos"),
          when(col("merged"), concat(col("a"), expr(sep), col("b")))
            .otherwise(col("tok")).as("tok"))
      // checkpoint the round output: round r's argmax materialization
      // must otherwise re-execute every earlier round's window chain
      // (O(R^2) chain executions across the loop)
      toks = graft.Caching.materialize(s, toks)
      mats += toks
    }
    (rules.toSeq, toks, mats.toSeq)
  }

  def merges(s: SparkSession, d: String): DataFrame = {
    val (rules, _, mats) = train(s, d)
    graft.Caching.releasing(s, mats: _*)(
      rules.reduce(_ union _).orderBy("merge_round"))
  }

  /** text_bpe_encode — the APPLY side of the tokenizer story: run the
    * learned merges over the corpus and report each document's token
    * count before/after plus the corpus-level compression. Same plan
    * as training (the final token table already exists when the rules
    * do); the before/after rollups are two doc-keyed aggregations.
    * The compression ratio is one double division of exact bigints.
    */
  def encode(s: SparkSession, d: String): DataFrame = {
    val (_, toks, mats) = train(s, d)
    val before = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_before"))
    val after = toks.groupBy("doc_id").agg(count(lit(1)).as("n_after"))
    graft.Caching.releasing(s, mats: _*)(
      before.join(after, Seq("doc_id"))
        .select(col("doc_id"), col("n_before"), col("n_after"),
          round(col("n_after").cast("double") / col("n_before"), 6)
            .as("ratio"))
        .orderBy("doc_id"))
  }

  /** The DuckDB twin: identical rounds as generated CTEs. */
  private def cteBlock: String = {
    def round(r: Int): String =
      s"""t$r AS (
         |  SELECT doc_id, pos, tok,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS idx,
         |         lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
         |  FROM toks$r),
         |best$r AS (
         |  SELECT tok AS a, nxt AS b, CAST(count(*) AS BIGINT) AS pair_cnt
         |  FROM t$r WHERE nxt IS NOT NULL GROUP BY tok, nxt
         |  ORDER BY pair_cnt DESC, a ASC, b ASC LIMIT 1),
         |mg$r AS (
         |  SELECT doc_id, pos, idx, tok,
         |         row_number() OVER (PARTITION BY doc_id, idx - rnm
         |                            ORDER BY idx) AS rnrun
         |  FROM (SELECT m.doc_id, m.pos, m.idx,
         |               m.a || chr(31) || m.b AS tok,
         |               row_number() OVER (PARTITION BY m.doc_id
         |                                  ORDER BY m.idx) AS rnm
         |        FROM (SELECT t.*, b.a, b.b FROM t$r t, best$r b
         |              WHERE t.tok = b.a AND t.nxt = b.b) m)),
         |mk$r AS (SELECT doc_id, pos, idx, tok FROM mg$r WHERE rnrun % 2 = 1),
         |toks${r + 1} AS (
         |  SELECT t.doc_id, t.pos, t.tok FROM t$r t
         |  LEFT JOIN (SELECT doc_id, idx FROM mk$r
         |             UNION ALL SELECT doc_id, idx + 1 FROM mk$r) c
         |    ON t.doc_id = c.doc_id AND t.idx = c.idx
         |  WHERE c.idx IS NULL
         |  UNION ALL SELECT doc_id, pos, tok FROM mk$r)""".stripMargin
    val rounds = (1 to Rounds).map(round).mkString(",\n")
    s"""WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |toks1 AS (
       |  SELECT doc_id, i AS pos, ts[i + 1] AS tok
       |  FROM w0, UNNEST(range(0, len(ts))) AS u(i)),
       |$rounds""".stripMargin
  }

  private def mergesSql: String = {
    val rules = (1 to Rounds).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_round,
         |       replace(a, chr(31), '+') AS tok_a,
         |       replace(b, chr(31), '+') AS tok_b, pair_cnt
         |FROM best$r""".stripMargin).mkString("\nUNION ALL\n")
    s"""$cteBlock
       |$rules
       |ORDER BY merge_round""".stripMargin
  }

  private def encodeSql: String =
    s"""$cteBlock
       |SELECT b.doc_id, n_before, n_after,
       |       round(CAST(n_after AS DOUBLE) / n_before, 6) AS ratio
       |FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_before
       |      FROM toks1 GROUP BY doc_id) b
       |JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_after
       |      FROM toks${Rounds + 1} GROUP BY doc_id) a ON b.doc_id = a.doc_id
       |ORDER BY b.doc_id""".stripMargin

  def qs: Seq[Q] = Seq(
    Q("text_bpe_merges", merges, Some(mergesSql)),
    Q("text_bpe_encode", encode, Some(encodeSql))
  )
}
