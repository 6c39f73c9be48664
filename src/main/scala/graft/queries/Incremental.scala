package graft.queries

import org.apache.spark.sql.expressions.Window
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
FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""")),

    // CDC op-log application (beyond §2 — the lakehouse MERGE the
    // reference's replace-the-table datamart sidesteps, db_interact.py
    // :87-97): an ordered change log of Insert/Update/Delete rows is
    // compacted onto a base snapshot by last-writer-wins per key —
    // exactly how a Debezium/CDC feed is folded into a table. Deletes
    // are genuinely new here: I3 (upsert) and I5 (SCD2) only ever add
    // or version rows. The log is synthesized deterministically from
    // the customer table: seq 0 base snapshot, seq 1 balance updates
    // (every 5th key), seq 2 late inserts (every 11th key, offset ids),
    // seq 3 takedown deletes (every 7th key) — so a key divisible by 35
    // proves delete-after-update wins. One shuffle on the key (the
    // window); at 100 TB this is the standard log-compaction shape:
    // state and log co-partition on the key, nothing is driver-side,
    // and re-applying the same log is idempotent (max-seq wins twice).
    // The oracle states the expected FINAL table in closed form, so the
    // apply machinery is checked against an independent derivation.
    Q("i7_cdc_apply",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        val base = cust
          .withColumn("op", lit("I")).withColumn("seq", lit(0L))
        val updates = cust.filter(col("c_custkey") % 5 === 0)
          .withColumn("c_acctbal", round(col("c_acctbal") + 50.0, 2))
          .withColumn("op", lit("U")).withColumn("seq", lit(1L))
        val inserts = cust.filter(col("c_custkey") % 11 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000L)
          .withColumn("op", lit("I")).withColumn("seq", lit(2L))
        val deletes = cust.filter(col("c_custkey") % 7 === 0)
          .select(col("c_custkey"),
            lit(null).cast("string").as("c_name"),
            lit(null).cast("double").as("c_acctbal"),
            lit(null).cast("string").as("c_mktsegment"))
          .withColumn("op", lit("D")).withColumn("seq", lit(3L))
        cdcApply(base.unionByName(updates).unionByName(inserts)
          .unionByName(deletes))
          .orderBy("c_custkey")
      },
      Some("""
SELECT c_custkey, c_name,
       CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 50.0, 2)
            ELSE c_acctbal END AS c_acctbal,
       c_mktsegment
FROM customer WHERE c_custkey % 7 <> 0
UNION ALL
SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
FROM customer WHERE c_custkey % 11 = 0
ORDER BY c_custkey""")),

    // Snapshot diff (beyond §2 — data-versioning audit): given two
    // versions of a table, emit every added / removed / changed key
    // with per-column change flags — the "what did this batch actually
    // do" report a lakehouse time-travel deployment runs after each
    // write, and the input a selective backfill consumes. One full
    // outer join on the key (single shuffle, AQE-splittable); flags are
    // null-safe so a value↔NULL transition counts as a change. The new
    // version is built in closed form (drop every 7th, +50.0 balance on
    // every 5th, re-segment every 9th, insert offset ids for every
    // 11th) and the oracle re-derives the same diff with DuckDB's
    // IS DISTINCT FROM — the differential check is of the diff
    // machinery itself.
    Q("i8_snapshot_diff",
      (s, d) => {
        val oldv = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        val newv = oldv.filter(col("c_custkey") % 7 =!= 0)
          .withColumn("c_acctbal",
            when(col("c_custkey") % 5 === 0,
              round(col("c_acctbal") + 50.0, 2)).otherwise(col("c_acctbal")))
          .withColumn("c_mktsegment",
            when(col("c_custkey") % 9 === 0, lit("MOVED"))
              .otherwise(col("c_mktsegment")))
          .unionByName(oldv.filter(col("c_custkey") % 11 === 0)
            .withColumn("c_custkey", col("c_custkey") + 1000000L))
        val j = oldv.alias("o")
          .join(newv.alias("n"),
            col("o.c_custkey") === col("n.c_custkey"), "full_outer")
        val balChanged = !(col("o.c_acctbal") <=> col("n.c_acctbal"))
        val segChanged = !(col("o.c_mktsegment") <=> col("n.c_mktsegment"))
        val present =
          col("o.c_custkey").isNotNull && col("n.c_custkey").isNotNull
        j.select(
            coalesce(col("o.c_custkey"), col("n.c_custkey")).as("c_custkey"),
            when(col("o.c_custkey").isNull, "added")
              .when(col("n.c_custkey").isNull, "removed")
              .when(balChanged || segChanged, "changed")
              .otherwise("unchanged").as("change_type"),
            (present && balChanged).as("bal_changed"),
            (present && segChanged).as("seg_changed"),
            col("o.c_acctbal").as("old_acctbal"),
            col("n.c_acctbal").as("new_acctbal"))
          .filter(col("change_type") =!= "unchanged")
          .orderBy("c_custkey")
      },
      Some("""
WITH newv AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 50.0, 2)
              ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 9 = 0 THEN 'MOVED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 7 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 11 = 0)
SELECT * FROM (
  SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
         CASE WHEN o.c_custkey IS NULL THEN 'added'
              WHEN n.c_custkey IS NULL THEN 'removed'
              WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         (o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
          AND o.c_acctbal IS DISTINCT FROM n.c_acctbal) AS bal_changed,
         (o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
          AND o.c_mktsegment IS DISTINCT FROM n.c_mktsegment) AS seg_changed,
         o.c_acctbal AS old_acctbal, n.c_acctbal AS new_acctbal
  FROM customer o FULL OUTER JOIN newv n ON o.c_custkey = n.c_custkey)
WHERE change_type <> 'unchanged'
ORDER BY c_custkey""")),

    // Small-file compaction planning — the OPTIMIZE/bin-packing step
    // of a lakehouse maintenance loop as a declarative plan. "Files"
    // are doc_id-bucketed groups with byte sizes; the planner assigns
    // them to target-sized output bins by exclusive-prefix-sum
    // division: bin = floor(bytes_before / target), target = ⌈total/8⌉.
    // Pure integer window arithmetic — no sequential first-fit loop,
    // so the plan itself scales (one sort by file id, one 1-row total
    // broadcast back); bins are contiguous file runs, within 1 file of
    // target bytes each (the FFD quality that matters for file sizing,
    // without FFD's inherently sequential state). The planner only
    // READS the listing — at 100 TB the rewrite it feeds is per-bin
    // parallel and this plan stays proportional to file count, not
    // data size.
    Q("i9_compaction_plan",
      (s, d) => {
        val wOrd = Window.orderBy("file_id")
        val wAll = Window.partitionBy()
        Tables.documents(s, d)
          .groupBy((col("doc_id") % 64).as("file_id"))
          .agg(sum("n_chars").as("size_bytes"))
          .withColumn("bytes_before", coalesce(
            sum("size_bytes").over(wOrd.rowsBetween(
              Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("target",
            ceil(sum("size_bytes").over(wAll) / lit(8.0)).cast("long"))
          .withColumn("bin", (col("bytes_before") / col("target"))
            .cast("long"))
          .select("file_id", "size_bytes", "bin")
          .orderBy("file_id")
      },
      Some("""
WITH files AS (
  SELECT doc_id % 64 AS file_id, sum(n_chars) AS size_bytes
  FROM documents GROUP BY doc_id % 64),
pl AS (
  SELECT file_id, CAST(size_bytes AS BIGINT) AS size_bytes,
         CAST(coalesce(sum(size_bytes) OVER (ORDER BY file_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS bytes_before,
         CAST(ceil(CAST(sum(size_bytes) OVER () AS DOUBLE) / 8.0) AS BIGINT)
           AS target
  FROM files)
SELECT file_id, size_bytes,
       CAST(floor(CAST(bytes_before AS DOUBLE) / target) AS BIGINT) AS bin
FROM pl ORDER BY file_id"""))
  )

  /** Compact an ordered CDC log (op ∈ I/U/D, monotonically increasing
    * `seq` per key) into final table state: the highest-seq row per key
    * wins and deletes erase. Exactly-once by construction — re-applying
    * any suffix of the log (re-delivery) cannot change the winner.
    * Single shuffle on the key; at scale this is the log-compaction
    * kernel behind MERGE INTO, co-partitioned with the table it feeds.
    */
  private[graft] def cdcApply(log: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_custkey").orderBy(col("seq").desc)
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .drop("rn", "op", "seq")
  }

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
