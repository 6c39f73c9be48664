package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.9 — incremental / exactly-once semantics (I1–I3), batch
  * formulations. The Structured Streaming formulation of I1 (file source
  * + checkpoint + Trigger.AvailableNow) lives in
  * graft.streaming.EventsStream and is exercised by its spec; these
  * queries are the oracle-checkable batch twins.
  */
object Incremental {

  def qs: Seq[Q] = Seq(
    // I1 new-delta detection + process-only-the-delta
    // (tanimoto.py:17-68): event days stand in for input files; the
    // "used" state is the pre-cutoff day set; the delta aggregation only
    // touches new days. Sum is computed in DECIMAL so the result is
    // order-independent and engine-exact.
    Q("i1_incremental_delta",
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
        val used = ev.select("day").distinct()
          .filter(col("day") < "2024-01-15")
        ev.join(used, Seq("day"), "left_anti")
          .groupBy("day")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .orderBy("day")
      },
      Some("""SELECT day, count(*) AS n_events,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
              FROM (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, value
                    FROM events)
              WHERE day >= '2024-01-15'
              GROUP BY day ORDER BY day""")),

    // I2 idempotent output: dynamic-partition overwrite run twice yields
    // the same sink state as run once (tanimoto.py:132-135 analog)
    Q("i2_idempotent_sink",
      (s, d) => graft.Scratch.withDir(s, "idem") { out =>
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val ev = Tables.events(s, d).select("event_id", "event_type", "value")
        ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$out/ev")
        // re-run of the same batch — dynamic overwrite keeps it exactly-once
        ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$out/ev")
        s.read.parquet(s"$out/ev")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), min("event_id").as("min_id"),
            max("event_id").as("max_id"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, min(event_id) AS min_id,
                     max(event_id) AS max_id
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // I3 append-only fact with dedup-on-ingest (datamart.py:59-80 +
    // db_interact.py:150-166): anti-join new batch against existing
    // facts, append, and the union reconstructs exactly the full fact set.
    // The expensive similarity fact is materialized ONCE
    // (Caching.materialize): `existing`, `incoming`, and the final union
    // all read the same materialized copy instead of re-deriving the
    // cross join + window stack three times in one plan (the round-2
    // scale flaw) — and unlike a bare persist(), the blocks are released
    // once the result is unreferenced, so composing this query with
    // others never accumulates pinned cache.
    Q("i3_upsert_dedup",
      (s, d) => {
        val full = graft.Caching.materialize(s, Views.silverFact(s, d))
        val existing = full.filter(col("target_id") < 100)
        val incoming = full // re-delivery of everything, overlap included
        val fresh = incoming.join(existing.select("target_id", "source_id"),
          Seq("target_id", "source_id"), "left_anti")
        existing.union(fresh)
          .orderBy("target_id", "source_id")
      },
      Some(Views.factCte + """
SELECT target_id, source_id, sim FROM fact ORDER BY target_id, source_id""")),

    // Slowly-changing dimension, type 2 — the canonical warehouse
    // versioning merge the reference's datamart sidesteps by replacing
    // tables wholesale (db_interact.py:87-97): an incoming batch of
    // changed rows CLOSES the current version (valid_to stamped,
    // is_current dropped) and INSERTS the new one, while untouched rows
    // ride along unchanged. The merge step is [[scd2Apply]] — see its
    // doc for the idempotence contract (only ACTUAL attribute changes
    // open versions, so re-delivering a batch is a no-op; Scd2Spec).
    // Batch ids stand in for timestamps (deterministic fixture).
    Q("i5_scd2_dimension",
      (s, d) => {
        val dim = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val current = dim
          .withColumn("version", lit(1L))
          .withColumn("valid_from", lit(1L))
          .withColumn("valid_to", lit(null).cast("long"))
          .withColumn("is_current", lit(true))
        // incoming batch: every 7th customer's balance changed
        val changes = dim.filter(col("c_custkey") % 7 === 0)
          .withColumn("c_acctbal", round(col("c_acctbal") + 100.0, 2))
        scd2Apply(current, changes, batch = 2L)
          .orderBy("c_custkey", "version")
      },
      Some("""
WITH chg AS (SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS c_acctbal
             FROM customer WHERE c_custkey % 7 = 0)
SELECT c_custkey, 1::BIGINT AS version, c_name, c_acctbal,
       1::BIGINT AS valid_from, NULL::BIGINT AS valid_to, true AS is_current
FROM customer WHERE c_custkey % 7 <> 0
UNION ALL
SELECT c_custkey, 1::BIGINT, c_name, c_acctbal, 1::BIGINT, 2::BIGINT, false
FROM customer WHERE c_custkey % 7 = 0
UNION ALL
SELECT c_custkey, 2::BIGINT, c_name, c_acctbal, 2::BIGINT, NULL::BIGINT, true
FROM chg
ORDER BY c_custkey, version""")),

    // Incremental aggregate maintenance (beyond §2 — materialized-view
    // delta update): a per-key aggregate table is brought current by
    // MERGING the delta's partial aggregates into the stored state
    // (full outer join + coalesced sum/count algebra), never
    // rescanning the base table. Works because sum/count form a
    // commutative monoid — the same property behind map-side combine
    // and the sketch merges. At 100 TB this is the difference between
    // O(delta) and O(corpus) per refresh. The oracle recomputes from
    // scratch: merged state must equal the full aggregate exactly.
    Q("i6_incremental_agg_maintain",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        def aggOf(df: org.apache.spark.sql.DataFrame) = df
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        // stored state: everything before the delta; delta: every 5th order
        val state = aggOf(li.filter(col("l_orderkey") % 5 =!= 0))
        val delta = aggOf(li.filter(col("l_orderkey") % 5 === 0))
          .withColumnRenamed("n", "dn").withColumnRenamed("qty", "dqty")
        state.join(delta, Seq("l_partkey"), "full_outer")
          .select(col("l_partkey"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n"),
            (coalesce(col("qty"), lit(0).cast("decimal(18,2)"))
              + coalesce(col("dqty"), lit(0).cast("decimal(18,2)")))
              .cast("double").as("sum_qty"))
          .orderBy("l_partkey")
      },
      Some("""
SELECT l_partkey, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_partkey ORDER BY l_partkey"""))
  )

  /** One SCD2 merge step: fold `incoming` (c_custkey + tracked
    * attributes c_name, c_acctbal) into the versioned dimension `dim`
    * at batch id `batch`, returning the new dimension state.
    *
    * Only rows whose tracked attributes ACTUALLY differ (null-safely)
    * from the key's current version close-and-open — which is exactly
    * what makes re-delivery idempotent: applying the same batch twice
    * changes nothing the second time, the dimension counterpart of I3's
    * exactly-once fact discipline (asserted in Scd2Spec). Keys unknown
    * to the dimension are ignored (an SCD2 merge versions existing
    * members; inserts are a separate path).
    *
    * Plan shape: three hash joins on the business key (inner for change
    * detection, semi to close, anti to carry) + a union — every piece
    * broadcastable or shuffle-on-key; history rides through untouched,
    * so at 100 TB this is a partition-append on valid_from, never a
    * rewrite of history.
    */
  private[graft] def scd2Apply(dim: org.apache.spark.sql.DataFrame,
      incoming: org.apache.spark.sql.DataFrame, batch: Long): org.apache.spark.sql.DataFrame = {
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val changed = incoming.alias("i")
      .join(cur.alias("c"), col("i.c_custkey") === col("c.c_custkey"))
      .filter(!(col("i.c_acctbal") <=> col("c.c_acctbal")) ||
        !(col("i.c_name") <=> col("c.c_name")))
      .select(col("i.c_custkey").as("c_custkey"),
        col("i.c_name").as("c_name"), col("i.c_acctbal").as("c_acctbal"),
        col("c.version").as("old_version"))
    val keys = changed.select("c_custkey")
    val closed = cur.join(keys, Seq("c_custkey"), "left_semi")
      .withColumn("valid_to", lit(batch))
      .withColumn("is_current", lit(false))
    val untouched = cur.join(keys, Seq("c_custkey"), "left_anti")
    val opened = changed
      .withColumn("version", col("old_version") + lit(1L))
      .withColumn("valid_from", lit(batch))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val cols = Seq("c_custkey", "version", "c_name", "c_acctbal",
      "valid_from", "valid_to", "is_current")
    hist.select(cols.map(col): _*)
      .union(untouched.select(cols.map(col): _*))
      .union(closed.select(cols.map(col): _*))
      .union(opened.select(cols.map(col): _*))
  }
}
