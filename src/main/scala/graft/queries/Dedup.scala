package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextHash, VectorExpressions}

/** Deduplication operators for corpus curation: exact, MinHash+LSH,
  * SimHash, blocked n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is a hash group-by — one shuffle on the content key;
  *  - MinHash+LSH is the global near-dup path: per-doc signatures (map
  *    side), band keys exploded, candidates from an equi-join on band
  *    key (shuffle proportional to candidates, never O(N^2)), then exact
  *    verification only on candidates;
  *  - blocked Jaccard / SimHash bound pair generation by a blocking key;
  *  - embedding near-dup at scale rides the same LSH bucketing as
  *    SimilaritySearch (sign-random-projection).
  */
object Dedup {

  /** Documents with a materialized shingle-set column (see
    * TextHash.shingleSet for why this is a UDF, not a `transform` HOF).
    */
  def docShingles(s: SparkSession, d: String): DataFrame = {
    TextHash.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("shingle_set(text)").as("shs"))
  }

  /** DuckDB twin of [[shingles]] given a text expression. */
  def sqlShingles(text: String): String =
    s"""list_distinct(CASE WHEN len(string_split($text, ' ')) < 3 THEN [$text]
        ELSE list_transform(range(1, len(string_split($text, ' ')) - 1),
               i -> string_split($text, ' ')[i] || ' ' ||
                    string_split($text, ' ')[i+1] || ' ' ||
                    string_split($text, ' ')[i+2]) END)"""

  /** Simulated re-ingest: every 10th document re-arrives under a new id
    * (the reference's incremental-batch overlap, tanimoto.py:28-49).
    */
  private def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.union(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  private val corpusCte = """corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)"""

  // MinHash parameters: 8 signatures, 4 bands of 2 rows
  val MinHashAB: Seq[(Long, Long)] = Seq(
    (2971L, 1049L), (3517L, 2039L), (4349L, 3259L), (5237L, 4421L),
    (6101L, 5639L), (7013L, 6689L), (7919L, 7127L), (8543L, 8221L))

  /** SimHash near-dup pairs (i < j) within a source block. */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    TextHash.register(s)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), expr("simhash32(text)").as("sh"))
    val a = docs.select(col("doc_id").as("i"), col("source"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("j"), col("source"), col("sh").as("sh_b"))
    a.join(b, Seq("source")).filter(col("i") < col("j"))
      .withColumn("hamming", bit_count(expr("sh_a ^ sh_b")).cast("long"))
      .filter(col("hamming") <= 6)
      .select("i", "j", "hamming")
  }

  /** DuckDB CTE list computing `pairs` = [[simhashPairs]] (no WITH). */
  val simhashCtesBody: String = """th AS (SELECT doc_id, source,
              list_transform(string_split(text, ' '), t ->
                CASE WHEN length(t) = 0 THEN 0
                ELSE list_reduce(list_transform(string_split(t, ''),
                       c -> ascii(c)::BIGINT), (x, y) -> (x * 31 + y) % 1000000007)
                END) AS hs
            FROM documents),
sh AS (SELECT doc_id, source,
         CAST(list_sum(list_transform(range(0, 32), j ->
           CASE WHEN list_sum(list_transform(hs,
                  h -> CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN 1 << j ELSE 0 END)) AS BIGINT) AS sh
       FROM th),
pairs AS (SELECT a.doc_id AS i, b.doc_id AS j,
                 CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
          FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.sh, b.sh)) <= 6)"""

  val simhashCtes: String = "WITH " + simhashCtesBody

  def qs: Seq[Q] = Seq(
    // Exact dedup: hash group-by on full content; survivor = lowest id,
    // output = (duplicate, canonical) pairs
    Q("dedup_exact",
      (s, d) => {
        val w = Window.partitionBy("text").orderBy("doc_id")
        corpus(s, d)
          .withColumn("canonical", min("doc_id").over(
            Window.partitionBy("text")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") > 1)
          .select(col("doc_id").as("dup_id"), col("canonical"))
          .orderBy("dup_id")
      },
      Some(s"""
WITH $corpusCte
SELECT doc_id AS dup_id, canonical FROM (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY text) AS canonical,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM corpus)
WHERE rn > 1 ORDER BY dup_id""")),

    // MinHash + LSH near-dup: global, no O(N^2) pair generation —
    // candidates only from shared LSH band keys, then exact-Jaccard
    // verification of candidates
    Q("dedup_minhash_lsh",
      (s, d) => {
        TextHash.register(s)
        // Postings (doc, shingle) computed once and persisted: the
        // signature pipeline, the candidate verification, and the per-doc
        // set sizes all derive from it. Tiny relative to the corpus (one
        // row per distinct shingle occurrence).
        val post = docShingles(s, d)
          .select(col("doc_id"), explode(col("shs")).as("sh"))
          .withColumn("h", expr("tok_hash(sh)")) // hash once, 8 sigs read it
          .persist()
        // One aggregation pass yields the signature AND the set size —
        // the verification step reads |A| from here instead of a second
        // groupBy over the postings.
        val aggCols = count(lit(1)).as("n") +: MinHashAB.zipWithIndex.map {
          case ((a, b), i) => min((col("h") * a + b) % TextHash.P).as(s"m$i")
        }
        val sig = post.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
        val bands = sig.select(col("doc_id"),
          explode(array((0 until 4).map { b =>
            struct(lit(b).as("band"),
              concat_ws("_", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("key"))
          }: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        // Candidates: group each LSH bucket once and emit its i<j pairs —
        // one shuffle on the band key, no self-join recompute. Bucket
        // population is bounded by band selectivity (salt wide buckets at
        // scale before the collect).
        val cand = bands.groupBy("band", "key")
          .agg(collect_list("doc_id").as("ids"))
          .filter(size(col("ids")) > 1)
          .select(explode(col("ids")).as("i"), col("ids"))
          .select(col("i"), explode(col("ids")).as("j"))
          .filter(col("i") < col("j"))
          .distinct()
        // Exact-Jaccard verification by co-occurrence counting over the
        // postings — candidate pairs only, no array materialization. The
        // candidate set and per-doc sizes are tiny relative to the
        // postings: broadcast them so verification adds no shuffle of
        // the postings side.
        broadcast(cand)
          .join(post.select(col("doc_id").as("i"), col("sh")), "i")
          .join(post.select(col("doc_id").as("j"), col("sh")), Seq("j", "sh"))
          .groupBy("i", "j").agg(count(lit(1)).as("common"))
          .join(broadcast(sig.select(col("doc_id").as("i"), col("n").as("na"))), "i")
          .join(broadcast(sig.select(col("doc_id").as("j"), col("n").as("nb"))), "j")
          .withColumn("jac", round(col("common").cast("double") /
            (col("na") + col("nb") - col("common")), 6))
          .filter(col("jac") >= 0.5)
          .select("i", "j", "jac")
          .orderBy("i", "j")
      },
      Some {
        val h = TextHash.sqlTokenHash("sh")
        val mins = MinHashAB.zipWithIndex.map { case ((a, b), i) =>
          s"min(($a * h + $b) % ${TextHash.P}) AS m$i"
        }.mkString(", ")
        val bandSelects = (0 until 4).map { b =>
          s"SELECT doc_id, $b AS band, m${2 * b}::VARCHAR || '_' || m${2 * b + 1}::VARCHAR AS key FROM sig"
        }.mkString("\nUNION ALL\n")
        s"""
WITH d AS (SELECT doc_id, ${sqlShingles("text")} AS shs FROM documents),
hs AS (SELECT doc_id, $h AS h FROM (SELECT doc_id, unnest(shs) AS sh FROM d)),
sig AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
bands AS ($bandSelects),
cand AS (SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
SELECT i, j,
       round(len(list_intersect(a.shs, b.shs))::DOUBLE /
             len(list_distinct(a.shs || b.shs)), 6) AS jac
FROM cand JOIN d a ON cand.i = a.doc_id JOIN d b ON cand.j = b.doc_id
WHERE round(len(list_intersect(a.shs, b.shs))::DOUBLE /
            len(list_distinct(a.shs || b.shs)), 6) >= 0.5
ORDER BY i, j"""
      }),

    // SimHash near-dup: 32-bit signature, Hamming distance <= 6 within a
    // source block
    Q("dedup_simhash",
      (s, d) => simhashPairs(s, d).orderBy("i", "j"),
      Some(simhashCtes + """
SELECT i, j, hamming FROM pairs ORDER BY i, j""")),

    // Connected components over the near-dup pair graph — the stage that
    // turns pairwise matches into dedup CLUSTERS (every doc labeled with
    // the min doc_id reachable through near-dup edges; singletons label
    // themselves). Iterative min-label propagation: each round is one
    // join + aggregate, lineage truncated per round with localCheckpoint
    // (at cluster scale: persist to the cluster checkpoint dir instead;
    // same loop is expressible on GraphX/pregel, but the DataFrame
    // formulation keeps it inside Catalyst and the oracle's reach).
    // Rounds needed = graph diameter, which for dup clusters is tiny.
    Q("dedup_connected_components",
      (s, d) => {
        val edges = simhashPairs(s, d).select("i", "j")
        val und = edges.select(col("i").as("a"), col("j").as("b"))
          .union(edges.select(col("j").as("a"), col("i").as("b")))
          .persist()
        // Only edge-touched docs can change labels; singletons (the vast
        // majority of a real corpus) skip the loop entirely and are
        // appended as their own cluster at the end.
        val inGraph = und.select(col("a").as("doc_id")).distinct()
        var labels = inGraph
          .select(col("doc_id"), col("doc_id").as("cluster"))
          .localCheckpoint(true)
        var converged = false
        var iter = 0
        while (!converged && iter < 20) {
          val nbrMin = und
            .join(labels.select(col("doc_id").as("b"),
              col("cluster").as("b_cluster")), Seq("b"))
            .groupBy("a").agg(min("b_cluster").as("nbr_min"))
          val next = labels
            .join(nbrMin.select(col("a").as("doc_id"), col("nbr_min")),
              Seq("doc_id"), "left")
            .select(col("doc_id"),
              least(col("cluster"),
                coalesce(col("nbr_min"), col("cluster"))).as("cluster"))
            .localCheckpoint(true)
          converged = next
            .join(labels.select(col("doc_id"), col("cluster").as("old")),
              Seq("doc_id"))
            .filter(col("cluster") =!= col("old"))
            .isEmpty
          labels = next
          iter += 1
        }
        val singletons = Tables.documents(s, d)
          .join(inGraph, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("doc_id").as("cluster"))
        labels.union(singletons).orderBy("doc_id")
      },
      Some("WITH RECURSIVE " + simhashCtesBody + """,
und AS (SELECT i AS a, j AS b FROM pairs UNION ALL SELECT j AS a, i AS b FROM pairs),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, und.b FROM reach JOIN und ON reach.r = und.a
)
SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id ORDER BY doc_id""")),

    // Blocked n-gram Jaccard via an inverted shingle index: explode to
    // (doc, shingle) postings, equi-join postings on (source, shingle) to
    // count |A∩B| per pair, then |A∪B| = |A|+|B|-|A∩B|. Only pairs that
    // actually share a shingle are ever materialized — never the O(B²)
    // block cross product with per-pair array intersection. Same
    // arithmetic as the set formulation, so the oracle is unchanged.
    Q("dedup_ngram_jaccard",
      (s, d) => {
        val docs = docShingles(s, d)
        val counts = docs.select(col("doc_id"), size(col("shs")).as("n"))
        val post = docs.select(col("doc_id"), col("source"),
          explode(col("shs")).as("sh"))
        post.select(col("doc_id").as("i"), col("source"), col("sh"))
          .join(post.select(col("doc_id").as("j"), col("source"), col("sh")),
            Seq("source", "sh"))
          .filter(col("i") < col("j"))
          .groupBy("i", "j").agg(count(lit(1)).as("common"))
          .join(counts.select(col("doc_id").as("i"), col("n").as("na")), "i")
          .join(counts.select(col("doc_id").as("j"), col("n").as("nb")), "j")
          .withColumn("jac", round(col("common").cast("double") /
            (col("na") + col("nb") - col("common")), 6))
          .filter(col("jac") >= 0.5)
          .select("i", "j", "jac")
          .orderBy("i", "j")
      },
      Some(s"""
WITH d AS (SELECT doc_id, source, ${sqlShingles("text")} AS shs FROM documents)
SELECT a.doc_id AS i, b.doc_id AS j,
       round(len(list_intersect(a.shs, b.shs))::DOUBLE /
             len(list_distinct(a.shs || b.shs)), 6) AS jac
FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.shs, b.shs))::DOUBLE /
            len(list_distinct(a.shs || b.shs)), 6) >= 0.5
ORDER BY i, j""")),

    // Embedding-cosine near-dup: exact pairwise over the native kernel;
    // at 100 TB this becomes LSH-bucketed (see simsearch_lsh_bucketed)
    Q("dedup_embedding_cosine",
      (s, d) => {
        VectorExpressions.register(s)
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            expr("norm_f(embedding)").as("nrm"))
        val a = emb.select(col("vec_id").as("i"), col("embedding").as("e_a"),
          col("nrm").as("n_a"))
        val b = emb.select(col("vec_id").as("j"), col("embedding").as("e_b"),
          col("nrm").as("n_b"))
        a.crossJoin(b).filter(col("i") < col("j"))
          .withColumn("cos",
            round(expr("dot_f(e_a, e_b)") / (col("n_a") * col("n_b")), 6))
          .filter(col("cos") >= 0.4)
          .select("i", "j", "cos")
          .orderBy("i", "j")
      },
      Some("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
           FROM embeddings)
SELECT a.vec_id AS i, b.vec_id AS j,
       round(list_sum(list_transform(range(1, len(a.v)+1), k -> a.v[k] * b.v[k])) /
             (a.nrm * b.nrm), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(range(1, len(a.v)+1), k -> a.v[k] * b.v[k])) /
            (a.nrm * b.nrm), 6) >= 0.4
ORDER BY i, j"""))
  )
}
