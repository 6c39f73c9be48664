package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-time windowing over the `events` stream table — batch
  * formulations with exact DuckDB twins. The Structured Streaming
  * variants (watermark + windowed agg + stateful sessionization) live in
  * graft.streaming.EventsStream; semantics here are identical, which is
  * what makes the streaming path testable against the batch oracle.
  *
  * Window starts are computed by explicit epoch-microsecond floor
  * arithmetic (exact integers) rather than engine-specific bucketing
  * functions, so both engines land on identical timestamps.
  */
object Events {

  def qs: Seq[Q] = Seq(
    // Tumbling 10-minute window: count + DECIMAL-exact sum per window x type
    Q("e1_tumbling_window",
      (s, d) => Tables.events(s, d)
        .withColumn("win_start",
          date_format(window(col("ts"), "10 minutes").getField("start"),
            "yyyy-MM-dd HH:mm:ss"))
        .groupBy("win_start", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("win_start", "event_type"),
      Some("""
SELECT strftime(make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""")),

    // Sliding window: 10-minute length, 5-minute slide — every event in
    // exactly two windows (Spark's TimeWindow generator expands the
    // assignment; the oracle mirrors it as an explicit 2-element unnest)
    Q("e2_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy("win_start", "event_type"),
      Some("""
WITH g AS (
  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) * 300000000 AS grid_us,
         event_type, value
  FROM events
), w AS (
  SELECT unnest([grid_us - 300000000, grid_us]) AS start_us, event_type, value
  FROM g
)
SELECT strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""")),

    // Session windows: per-user, 30-minute inactivity gap, batch
    // formulation via lag + running sum (the flatMapGroupsWithState
    // analog)
    Q("e3_session_window",
      (s, d) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum("new_sess").over(run))
          .groupBy("user_id", "sess_id")
          .agg(
            date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
            count(lit(1)).as("n_events"))
          .select("user_id", "sess_id", "session_start", "session_end", "n_events")
          .orderBy("user_id", "sess_id")
      },
      Some("""
WITH x AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
), f AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
  FROM x
), g AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
  FROM f
)
SELECT user_id, sess_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*) AS n_events
FROM g GROUP BY user_id, sess_id ORDER BY user_id, sess_id""")),

    // JSON extraction: typed struct parse of the props column
    Q("e4_json_extract",
      (s, d) => Tables.events(s, d)
        .withColumn("parsed",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .select(col("event_id"), col("parsed.k").cast("long").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events ORDER BY event_id"""))
,
    // Late-data audit — the batch health metric behind watermark
    // tuning: per user (arrival order = event_id), an event is "late"
    // if its event time trails the user's running max by more than the
    // 30-minute watermark delay — exactly the events
    // dropDuplicatesWithinWatermark/windowed aggs would drop. Measured
    // per user so the window is partition-parallel (a GLOBAL running
    // max would serialize the corpus through one task); the output
    // tells you what a given delay costs in dropped data BEFORE you
    // deploy it.
    Q("e5_late_event_audit",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("hwm", max(unix_micros(col("ts"))).over(w))
          .withColumn("late",
            col("hwm").isNotNull &&
              unix_micros(col("ts")) < col("hwm") - lit(30L * 60 * 1000000))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
          .orderBy("user_id")
      },
      Some("""
WITH a AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
m AS (SELECT user_id, us,
             max(us) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      FROM a)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN hwm IS NOT NULL AND us < hwm - 1800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM m GROUP BY user_id ORDER BY user_id""")),

    // Ordered funnel (beyond §2): view → click → purchase, each stage
    // strictly after the previous one PER USER — the product-analytics
    // staple. Three stage-min aggregates chained by two per-user
    // equi-joins (each stage's threshold broadcast back as one row per
    // user); no window over the full event stream, no self-join
    // explosion. Conversion lag sums in exact integer micros.
    Q("e7_ordered_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val s1 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("t1"))
        val s2 = ev.filter(col("event_type") === "click")
          .join(s1, "user_id").filter(col("us") > col("t1"))
          .groupBy("user_id").agg(min("us").as("t2"))
        val s3 = ev.filter(col("event_type") === "purchase")
          .join(s2, "user_id").filter(col("us") > col("t2"))
          .groupBy("user_id").agg(min("us").as("t3"))
        val n1 = s1.agg(count(lit(1)).as("n")).select(col("n").as("n_viewed"))
        val n2 = s2.agg(count(lit(1)).as("n")).select(col("n").as("n_clicked_after"))
        val n3 = s3.join(s2, "user_id")
          .agg(count(lit(1)).as("n_purchased_after"),
            sum(col("t3") - col("t2")).cast("long").as("total_lag_us"))
        n1.crossJoin(n2).crossJoin(n3)
      },
      Some("""
WITH ev AS (SELECT user_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
s1 AS (SELECT user_id, min(us) AS t1 FROM ev
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT ev.user_id, min(us) AS t2 FROM ev
       JOIN s1 ON ev.user_id = s1.user_id
       WHERE event_type = 'click' AND us > t1 GROUP BY ev.user_id),
s3 AS (SELECT ev.user_id, min(us) AS t3 FROM ev
       JOIN s2 ON ev.user_id = s2.user_id
       WHERE event_type = 'purchase' AND us > t2 GROUP BY ev.user_id)
SELECT (SELECT count(*) FROM s1) AS n_viewed,
       (SELECT count(*) FROM s2) AS n_clicked_after,
       (SELECT count(*) FROM s3) AS n_purchased_after,
       (SELECT CAST(sum(t3 - t2) AS BIGINT)
        FROM s3 JOIN s2 ON s3.user_id = s2.user_id) AS total_lag_us""")),

    // VARIANT semi-structured extraction (beyond §2 — Spark 4's
    // binary JSON type): parse once into VARIANT, then typed
    // path-extraction with variant_get. Against schemaless feeds this
    // replaces from_json-with-declared-schema (e4): the parse cost is
    // paid once and every downstream path read is a cheap binary
    // probe, not a re-parse — the right trade at 100 TB where one
    // feed fans out to many extractions. The nested document is built
    // deterministically from columns so the oracle can rebuild it.
    Q("e6_variant_extract",
      (s, d) => Tables.events(s, d)
        .filter(col("event_id") % 20 === 0)
        .withColumn("doc", concat(
          lit("{\"u\":"), col("user_id"),
          lit(",\"m\":{\"t\":\""), col("event_type"),
          lit("\",\"k\":"), get_json_object(col("props"), "$.k"),
          lit("}}")))
        .withColumn("v", parse_json(col("doc")))
        .select(col("event_id"),
          try_variant_get(col("v"), "$.u", "long").as("u"),
          try_variant_get(col("v"), "$.m.t", "string").as("t"),
          try_variant_get(col("v"), "$.m.k", "long").as("k"))
        .orderBy("event_id"),
      Some("""
WITH j AS (SELECT event_id,
                  '{"u":' || CAST(user_id AS VARCHAR) ||
                  ',"m":{"t":"' || event_type ||
                  '","k":' || json_extract_string(props, '$.k') || '}}' AS doc
           FROM events WHERE event_id % 20 = 0)
SELECT event_id,
       CAST(json_extract(doc, '$.u') AS BIGINT) AS u,
       json_extract_string(doc, '$.m.t') AS t,
       CAST(json_extract(doc, '$.m.k') AS BIGINT) AS k
FROM j ORDER BY event_id"""))
  ,

    // Retention cohort matrix — the product-analytics staple: users
    // grouped by first-seen week, activity counted at each week
    // offset. Week index = epoch-micros div one week (pure integer;
    // date_trunc's locale-sensitive week boundary never enters). Two
    // shuffles by construction — min(wk) per user, then the
    // (cohort, offset) rollup — and the first reuses the user_id
    // partitioning a real deployment would already have; output is
    // cohorts × offsets regardless of event count, so the matrix
    // stays tiny at any scale.
    Q("e8_retention_cohorts",
      (s, d) => {
        val wUser = Window.partitionBy("user_id")
        Tables.events(s, d)
          .withColumn("wk", expr("unix_micros(ts) div 604800000000"))
          .withColumn("cohort_wk", min("wk").over(wUser))
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
          .agg(countDistinct("user_id").as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy("cohort_wk", "wk_offset")
      },
      Some("""
WITH wks AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
  FROM events),
coh AS (
  SELECT *, min(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM wks)
SELECT cohort_wk, wk - cohort_wk AS wk_offset,
       count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM coh GROUP BY cohort_wk, wk - cohort_wk
ORDER BY cohort_wk, wk_offset""")),

    // Last-touch attribution: each purchase credits the user's most
    // recent click at-or-before it and within a 7-day horizon — the
    // event-time argmax-per-row shape (funnels count, attribution must
    // PICK one). The Spark side is the 100 TB formulation: ONE shuffle
    // on user_id, clicks and purchases interleaved in a single
    // running-max window (sorted by (us, click-before-purchase) so a
    // same-microsecond click still credits), carrying struct(us, id)
    // forward — no self-join, no per-purchase click scan. The oracle
    // is the independent join+rank formulation; matching it proves the
    // window fold computes the same argmax. Ties (two clicks, same µs)
    // credit the higher event_id on both sides.
    Q("e9_last_touch_attribution",
      (s, d) => {
        val horizonUs = 7L * 24 * 3600 * 1000000L
        val tagged = Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("us"))
          .withColumn("tr", when(col("event_type") === "click", 0).otherwise(1))
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("tr"))
        tagged
          .withColumn("lastc",
            max(when(col("event_type") === "click",
              struct(col("us"), col("event_id")))).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            when(col("lastc.us") > col("us") - horizonUs,
              col("lastc.event_id")).as("click_id"),
            when(col("lastc.us") > col("us") - horizonUs,
              expr("(us - lastc.us) div 60000000")).as("gap_min"))
          .orderBy("event_id")
      },
      Some("""
WITH p AS (SELECT event_id AS p_id, user_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS c_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS c_us
      FROM events WHERE event_type = 'click'),
j AS (SELECT p.p_id, p.user_id, p.p_us, c.c_id, c.c_us,
             row_number() OVER (PARTITION BY p.p_id
               ORDER BY c.c_us DESC NULLS LAST, c.c_id DESC NULLS LAST) AS rn
      FROM p LEFT JOIN c ON p.user_id = c.user_id
       AND c.c_us <= p.p_us AND c.c_us > p.p_us - 604800000000)
SELECT p_id AS event_id, user_id, c_id AS click_id,
       (p_us - c_us) // 60000000 AS gap_min
FROM j WHERE rn = 1 ORDER BY event_id""")),

    // User-journey path mining — the Sankey/flow report behind funnel
    // DESIGN (e7 counts a fixed funnel; this one discovers which
    // sequences actually happen): each user's first five events in
    // (ts, event_id) order join into a '>'-delimited path, then paths
    // roll up to (users, total events) and the top 20 ship. Determinism:
    // the per-user order is total (event_id breaks µs ties) and the
    // top-20 cut is ordered (n_users DESC, path ASC) — no engine-private
    // tie. At 100 TB: the prefix trim happens BEFORE any collection (a
    // row_number filter, so per-user state is ≤ 5 rows regardless of
    // how heavy a user is), the path rollup shuffles path-keyed with
    // map-side partials, and the final cut is a TakeOrdered, not a
    // global sort.
    Q("e10_path_mining",
      (s, d) => {
        // the '>' path delimiter must not appear inside an event_type or
        // distinct journeys would collapse into one path string — assert
        // the invariant at scan time (fails the job loudly, row-local, no
        // shuffle) rather than silently mis-grouping
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            when(col("event_type").contains(">"),
              raise_error(concat(lit("e10_path_mining: event_type contains" +
                " the path delimiter '>': "), col("event_type"))))
              .otherwise(col("event_type")).as("event_type"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val wc = Window.partitionBy("user_id")
        ev.withColumn("rn", row_number().over(w))
          .withColumn("ne", count(lit(1)).over(wc).cast("long"))
          .filter(col("rn") <= 5)
          .groupBy("user_id")
          .agg(max("ne").as("ne"),
            concat_ws(">", transform(
              sort_array(collect_list(struct(col("rn"), col("event_type")))),
              x => x.getField("event_type"))).as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_users"), sum("ne").as("n_events"))
          .orderBy(col("n_users").desc, col("path").asc)
          .limit(20)
      },
      Some("""
WITH ev AS (SELECT user_id, event_id, event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
r AS (SELECT user_id, event_type,
        row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
        count(*) OVER (PARTITION BY user_id) AS ne
      FROM ev),
p AS (SELECT user_id, CAST(max(ne) AS BIGINT) AS ne,
        string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 5 GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(ne) AS BIGINT) AS n_events
FROM p GROUP BY path ORDER BY n_users DESC, path ASC LIMIT 20"""))
  )
}
