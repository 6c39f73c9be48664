package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sketch aggregates (beyond the reference's ∅-list, SURVEY.md §2.4
  * extension): distinct-count and frequency estimation as ONE-PASS,
  * mergeable summaries — the shapes that replace exact DISTINCT /
  * per-key counts when 100 TB makes exactness a shuffle you can't
  * afford.
  *
  * Both sketches are DETERMINISTIC: every hash is a 60-bit integer
  * from an md5 prefix (portable across engines — DuckDB computes the
  * identical value), so unlike approx_count_distinct / approx
  * percentile the estimates themselves go through the driver's
  * hash-compare oracle gate. Spark's own HLL++ (approx_count_distinct)
  * is the production default; KMV here demonstrates the sketch
  * contract (bounded state, mergeable, error ~1/sqrt(k)) in
  * oracle-checkable form.
  *
  * Scale notes: both are classic map-side-combinable aggregates — the
  * shuffle carries at most (groups × k) hash values for KMV and
  * (d × w) counters for CMS, independent of input row count. That
  * boundedness is the entire point at 100 TB.
  */
object Sketches {

  /** 60-bit portable hash: md5 hex prefix → BIGINT. Identical in
    * DuckDB as CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT).
    */
  private[graft] def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** DuckDB spelling of [[h60]]. */
  private def h60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 15)) AS BIGINT)"

  private[graft] val K = 64 // KMV sketch size: ~12.5% standard error
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 256

  /** Count-min sketch of a `key` column: d×w counter cells. Additive in
    * the input — sketch(A ⊎ B) = sketch(A) + sketch(B) cell-wise
    * (SketchSpec proves it), which is what makes it map-side
    * combinable and cross-shard mergeable.
    */
  private[graft] def cmsSketch(items: DataFrame): DataFrame =
    cmsCells(items).groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

  /** The (key, j, bucket) hash cells behind [[cmsSketch]]. */
  private[graft] def cmsCells(items: DataFrame): DataFrame =
    items
      .select(col("key"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
      .withColumn("bucket",
        pmod(h60(concat_ws(":", col("j"), col("key"))), lit(CmsWidth)))

  /** KMV state per group: the ≤ K smallest DISTINCT key hashes, ranked.
    * Merging two groups' states = the K smallest of their union
    * (SketchSpec proves it) — state is bounded by K per group at any
    * input size.
    */
  private[graft] def kmvState(grouped: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("grp").orderBy("h")
    grouped
      .select(col("grp"), h60(col("key")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
  }

  def qs: Seq[Q] = Seq(

    // KMV (k-minimum-values) distinct-count sketch, per group: keep
    // the k smallest distinct hash values; if the k-th smallest
    // normalized hash is u, the distinct count estimates to
    // (k-1) / u. Exact count alongside shows the error honestly.
    // Groups with fewer than k distinct values fall back to the exact
    // hash count (the sketch IS exact below saturation).
    Q("a15_kmv_distinct_sketch",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ranked = kmvState(li
          .select(col("l_returnflag").as("grp"), col("l_partkey").as("key")))
        val est = ranked.groupBy("grp").agg(
          count(lit(1)).as("n_kept"),
          max(when(col("rn") === K, col("h"))).as("hk"))
          .select(col("grp"), col("n_kept"),
            round(when(col("n_kept") < K, col("n_kept").cast("double"))
              .otherwise(lit((K - 1).toDouble) * pow(lit(2.0), 60)
                / col("hk").cast("double")), 3).as("est_distinct"))
        val exact = li.groupBy(col("l_returnflag").as("grp"))
          .agg(countDistinct("l_partkey").as("exact_distinct"))
        est.join(exact, "grp").orderBy("grp")
      },
      Some(s"""
WITH hashed AS (
  SELECT DISTINCT l_returnflag AS grp, ${h60Sql("l_partkey")} AS h
  FROM lineitem),
ranked AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM hashed),
est AS (
  SELECT grp, count(*) AS n_kept,
         round(CASE WHEN count(*) < $K THEN CAST(count(*) AS DOUBLE)
                    ELSE ${K - 1}.0 * pow(2.0, 60)
                         / CAST(max(CASE WHEN rn = $K THEN h END) AS DOUBLE)
               END, 3) AS est_distinct
  FROM ranked WHERE rn <= $K GROUP BY grp),
exact AS (
  SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS exact_distinct
  FROM lineitem GROUP BY l_returnflag)
SELECT est.grp AS grp, n_kept, est_distinct, exact_distinct
FROM est JOIN exact ON est.grp = exact.grp ORDER BY grp""")),

    // Count-min sketch: d=4 hash rows × w=256 counters, built in one
    // aggregate pass (explode the 4 row ids, hash (row:key), count per
    // cell). The frequency estimate for a key is the MIN over its 4
    // cells — always >= the true count, never under. Probing the
    // distinct supplier keys against the sketch alongside their exact
    // counts makes the overestimate visible and oracle-checked.
    Q("a16_countmin_sketch",
      (s, d) => {
        // hashing is map-side work on a narrow derived column: parquet
        // split count would cap its parallelism far below the cluster's,
        // so round-robin to the session's parallelism first
        val li = Tables.lineitem(s, d).select(col("l_suppkey").as("key"))
          .repartition(s.sparkContext.defaultParallelism)
        val cells = cmsCells(li)
        val sketch = cells.groupBy("j", "bucket")
          .agg(count(lit(1)).as("cnt"))
        // probe the distinct (key, j, bucket) triples out of the same
        // hashed cells — no second hashing pass over the input
        val probes = cells.distinct()
        val estim = probes
          .join(sketch, Seq("j", "bucket"))
          .groupBy("key").agg(min("cnt").as("cms_est"))
        val exact = li.groupBy("key").agg(count(lit(1)).as("exact_cnt"))
        estim.join(exact, "key")
          .select(col("key"), col("cms_est"), col("exact_cnt"),
            (col("cms_est") - col("exact_cnt")).as("overcount"))
          .orderBy("key")
      },
      Some(s"""
WITH items AS (SELECT l_suppkey AS key FROM lineitem),
cells AS (
  SELECT key, j,
         ${h60Sql("j || ':' || key")} % 256 AS bucket
  FROM items, UNNEST(range(0, 4)) AS t(j)),
sketch AS (SELECT j, bucket, count(*) AS cnt FROM cells GROUP BY j, bucket),
probes AS (
  SELECT DISTINCT key, j,
         ${h60Sql("j || ':' || key")} % 256 AS bucket
  FROM items, UNNEST(range(0, 4)) AS t(j)),
estim AS (
  SELECT key, min(cnt) AS cms_est
  FROM probes JOIN sketch USING (j, bucket) GROUP BY key),
exact AS (SELECT key, count(*) AS exact_cnt FROM items GROUP BY key)
SELECT key, cms_est, exact_cnt, cms_est - exact_cnt AS overcount
FROM estim JOIN exact USING (key) ORDER BY key""")),

    // Quantiles over a deterministic hash sample — the scale answer to
    // "exact percentiles need a per-group sort of everything" (a13):
    // keep rows whose portable 60-bit key hash lands under 20%, take
    // DISCRETE quantiles of the sample. The sample predicate is
    // row-local and engine-portable, so the sketch is trivially
    // MERGEABLE (sample(A ∪ B) = sample(A) ∪ sample(B) — a row-level
    // filter commutes with union, unlike a quantile) and stable under
    // resharding/retries; at 100 TB the sort shrinks 5×, and the rate
    // dials accuracy against cost. Estimates are oracle-hash-checked
    // exactly, like the KMV/CMS family above.
    Q("a19_sampled_quantiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("event_type")
          .orderBy(col("value").asc, col("event_id").asc)
        val wAll = Window.partitionBy("event_type")
        Tables.events(s, d)
          .filter(pmod(h60(col("event_id")), lit(100L)) < 20)
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .groupBy("event_type")
          .agg(max("n").as("n_sample"),
            min(when(col("rn") === ceil(col("n") * 0.5), col("value"))).as("p50"),
            min(when(col("rn") === ceil(col("n") * 0.9), col("value"))).as("p90"),
            max("value").as("p100"))
          .orderBy("event_type")
      },
      Some(s"""
WITH smp AS (
  SELECT event_type, event_id, value FROM events
  WHERE ${h60Sql("event_id")} % 100 < 20),
r AS (SELECT event_type, value,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY value ASC, event_id ASC) AS rn,
        count(*) OVER (PARTITION BY event_type) AS n
      FROM smp)
SELECT event_type, max(n) AS n_sample,
       min(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50,
       min(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90,
       max(value) AS p100
FROM r GROUP BY event_type ORDER BY event_type""")),

    // Heavy hitters by candidate-generation + verification: a bounded
    // Misra-Gries summary per partition nominates candidates, then ONE
    // semi-joined aggregation computes exact counts for just those
    // candidates. The guarantee makes the approximate stage invisible
    // in the answer: a token absent from partition i's summary has
    // local frequency <= n_i/(MgK+1), so a token absent from EVERY
    // summary has global frequency <= n/(MgK+1) < n/64 — the candidate
    // union is a proven superset of the true heavy hitters, and the
    // exact verification pass makes the final set exact (and therefore
    // oracle-checkable against plain GROUP BY/HAVING SQL). At 100 TB:
    // no full-vocabulary shuffle ever happens — the sketch pass is
    // map-only with <= MgK state per task, candidates (<= partitions x
    // MgK) broadcast back, and the count shuffle carries only rows
    // matching a candidate.
    Q("a20_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token"))
        val cands = toks.as[String]
          .mapPartitions(it => misraGries(it, MgK))
          .toDF("token").distinct()
        val tot = toks.agg(count(lit(1)).as("n"))
        toks.join(broadcast(cands), Seq("token"))
          .groupBy("token").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(tot))
          .filter(col("cnt") * 64 > col("n"))
          .select(col("token"), col("cnt"))
          .orderBy(desc("cnt"), col("token"))
      },
      Some("""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
SELECT token, CAST(count(*) AS BIGINT) AS cnt
FROM toks CROSS JOIN tot
GROUP BY token, tot.n
HAVING CAST(count(*) AS BIGINT) * 64 > tot.n
ORDER BY cnt DESC, token"""))
  )

  private[graft] val MgK = 256 // Misra-Gries capacity: 4x the 1/64 bar

  /** Misra-Gries frequent-items fold: at most `k` counters; when a new
    * item arrives at capacity, ALL counters drop by one (each decrement
    * cancels one prior increment, so the scan is amortized O(1) per
    * item) and zeroed entries free their slot. Survivors satisfy
    * count(t) >= freq(t) - n/(k+1); contrapositive: anything frequent
    * enough survives. Memory is <= k entries no matter the input size.
    * Taking `init` makes the fold RESUMABLE — folding batch-by-batch
    * with carried state equals one fold over the concatenation
    * (SketchSpec pins it), which is exactly what the streaming twin
    * (EventsStream.heavyHitterCandidates) relies on across
    * micro-batches.
    */
  private[graft] def misraGriesFold[T](init: Map[T, Long],
      it: Iterator[T], k: Int): Map[T, Long] = {
    val m = scala.collection.mutable.HashMap.from(init)
    val dead = scala.collection.mutable.ArrayBuffer.empty[T]
    for (t <- it) {
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          dead.clear()
          for ((key, c) <- m)
            if (c == 1L) dead += key else m.update(key, c - 1)
          dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  /** One-partition candidate summary over string tokens (a20). */
  private[graft] def misraGries(it: Iterator[String], k: Int)
      : Iterator[String] =
    misraGriesFold(Map.empty[String, Long], it, k).keysIterator
}
