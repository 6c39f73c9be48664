package graft.functions

import org.apache.spark.sql.SparkSession

/** Deterministic, engine-portable string hashing for text operators
  * (feature hashing F7, MinHash/SimHash dedup, fingerprinting).
  *
  * The reference's Morgan fingerprint (mpp.py:81-93) is a deterministic
  * string -> fixed-width-vector feature hash; we reproduce the *pattern*
  * with a polynomial rolling hash that is also expressible in pure SQL,
  * so the DuckDB oracle can mirror it exactly:
  *
  *   duckdb: list_reduce(list_transform(string_split(tok, ''),
  *             c -> ascii(c)::BIGINT), (x, y) -> (x * 31 + y) % 1000000007)
  *
  * list_reduce seeds with the first element and folds left — the Scala
  * implementation matches that exactly (first char unmodded seed, then
  * h = (h*31 + c) mod P). Deliberately NOT Spark's murmur3 `hash()`:
  * that is not reproducible in DuckDB SQL.
  */
object TextHash {
  val P = 1000000007L

  def tokenHash(s: String): Long = {
    if (s == null || s.isEmpty) 0L
    else {
      var h = s.charAt(0).toLong
      var i = 1
      while (i < s.length) {
        h = (h * 31 + s.charAt(i)) % P
        i += 1
      }
      h
    }
  }

  /** The DuckDB expression equivalent to tokenHash(`tok`). */
  def sqlTokenHash(tok: String): String =
    s"""CASE WHEN length($tok) = 0 THEN 0
        ELSE list_reduce(list_transform(string_split($tok, ''),
               c -> ascii(c)::BIGINT), (x, y) -> (x * 31 + y) % 1000000007)
        END"""

  /** (a*h + b) mod P — the universal-hash family used for MinHash
    * signatures; same arithmetic in Scala and SQL.
    */
  def affine(h: Long, a: Long, b: Long): Long = (a * h + b) % P

  def sqlAffine(h: String, a: Long, b: Long): String = s"($a * $h + $b) % ${P}"

  def register(spark: SparkSession): Unit = {
    spark.udf.register("tok_hash", (s: String) => tokenHash(s))
  }
}
