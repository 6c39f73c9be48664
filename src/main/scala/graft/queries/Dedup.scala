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

  /** 3-token shingle array (distinct), engine-portable. */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) < 3, array(text))
        .otherwise(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ",
            element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
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
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), shingles(col("text")).as("shs"))
        val hashed = docs
          .select(col("doc_id"), explode(col("shs")).as("sh"))
          .select(col("doc_id"), expr("tok_hash(sh)").as("h"))
        val minCols = MinHashAB.zipWithIndex.map { case ((a, b), i) =>
          min((col("h") * a + b) % TextHash.P).as(s"m$i")
        }
        val sig = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
        val bands = sig.select(col("doc_id"),
          explode(array((0 until 4).map { b =>
            struct(lit(b).as("band"),
              concat_ws("_", col(s"m${2 * b}"), col(s"m${2 * b + 1}")).as("key"))
          }: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
        val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
          .distinct()
        val a = docs.select(col("doc_id").as("i"), col("shs").as("sh_a"))
        val b = docs.select(col("doc_id").as("j"), col("shs").as("sh_b"))
        cand.join(a, "i").join(b, "j")
          .withColumn("jac",
            round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b"))), 6))
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
      (s, d) => {
        TextHash.register(s)
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), expr("simhash32(text)").as("sh"))
        val a = docs.select(col("doc_id").as("i"), col("source"), col("sh").as("sh_a"))
        val b = docs.select(col("doc_id").as("j"), col("source"), col("sh").as("sh_b"))
        a.join(b, Seq("source")).filter(col("i") < col("j"))
          .withColumn("hamming", bit_count(expr("sh_a ^ sh_b")).cast("long"))
          .filter(col("hamming") <= 6)
          .select("i", "j", "hamming")
          .orderBy("i", "j")
      },
      Some("""
WITH th AS (SELECT doc_id, source,
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
       FROM th)
SELECT a.doc_id AS i, b.doc_id AS j,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 6
ORDER BY i, j""")),

    // Blocked n-gram Jaccard: exact pairwise similarity, pair generation
    // bounded by the blocking key (source)
    Q("dedup_ngram_jaccard",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), shingles(col("text")).as("shs"))
        val a = docs.select(col("doc_id").as("i"), col("source"), col("shs").as("sh_a"))
        val b = docs.select(col("doc_id").as("j"), col("source"), col("shs").as("sh_b"))
        a.join(b, Seq("source")).filter(col("i") < col("j"))
          .withColumn("jac",
            round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b"))), 6))
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
