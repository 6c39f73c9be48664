package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.5–2.7 — window functions / top-k (W1–W2), sorts & limits
  * (O1–O3), set operations (U1–U4).
  *
  * Top-k goes through `row_number` over a partitioned window (shuffles
  * only the key+score columns), and sort+limit compiles to
  * `TakeOrderedAndProject` (per-partition heap, no global sort) — both
  * are the 100 TB-safe shapes.
  */
object WindowsSorts {

  /** Two-phase scalable GLOBAL row numbering — the engine-side total
    * order every corpus-sized ranking in this library routes through
    * (o5_scalable_row_number is its oracle-verified reference): a bare
    * `row_number()` over an unpartitioned window collapses the whole
    * dataset into ONE task, so instead (1) range-repartition on the
    * sort key — partitions become globally ordered — and number rows
    * WITHIN each partition (distributed), then (2) add per-partition
    * offsets computed from the tiny #partitions-row count table (the
    * only single-partition window left runs over `parts` rows, and the
    * offsets broadcast back). `sortCols` must be a TOTAL order
    * (include a tie-break key) — then the result is identical to the
    * single-task window under any partitioning. Appends `out`
    * (1-based, long); helper columns are dropped.
    *
    * The locally-ranked frame is materialized ONCE before the offsets
    * branch and the join branch read it: both branches otherwise
    * re-execute the range exchange, and AQE may pick different
    * partition boundaries per execution — then per-partition counts
    * attach to pids that do not match the join side's pids and the
    * global ranks come out overlapping (observed: ntile buckets off by
    * up to 15% on the layout queries). One materialization pins one
    * set of boundaries; at deployment scale that is a single write of
    * the ranked corpus — the natural cost of a total-order layout op.
    * The pinned frame is appended to `pins`: the CALLER owns its
    * lifetime and must release it once the query's output is
    * materialized (`Caching.releasing(s, pins.toSeq: _*)(out)` — the
    * Caching discipline), because this function's result still reads
    * the pinned blocks lazily.
    */
  private[queries] def globalRowNumber(s: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame,
      out: String, parts: Int,
      pins: scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame],
      sortCols: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.DataFrame = {
    val local = graft.Caching.materialize(s,
      rankedWithinPartitions(df, parts, sortCols: _*))
    pins += local
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", sum("__cnt").over(wOff) - col("__cnt"))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, (col("__lrn") + col("__off")).cast("long"))
      .drop("__pid", "__lrn", "__off")
  }

  /** Phase 1 of [[globalRowNumber]], exposed so PlanQualitySpec can
    * pin its shape (the materialization hides it from the final
    * plan): range-repartitioned, sorted within partitions, with the
    * per-partition `__lrn` rank — the row_number window here MUST
    * carry the `__pid` partition spec, never a global window.
    */
  private[queries] def rankedWithinPartitions(
      df: org.apache.spark.sql.DataFrame, parts: Int,
      sortCols: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.DataFrame = {
    val byKey = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy(sortCols: _*)
    byKey.withColumn("__lrn", row_number().over(wLocal))
  }

  /** Exact engine-side replica of `ntile(k)` over a global order, fed
    * by [[globalRowNumber]] instead of a single-task window: given the
    * global 1-based rank `rn` and total count `n` (both columns), the
    * first n%k buckets take n/k+1 rows and the rest n/k — the standard
    * ntile fill rule, as integer CASE arithmetic both engines agree
    * on. The oracle keeps the literal `ntile` window; this is the
    * shape that survives a 1000-executor corpus.
    */
  private[queries] def ntileExpr(rn: String, n: String, k: Int): String =
    s"CASE WHEN $rn <= ($n % $k) * ($n div $k + 1) " +
      s"THEN ($rn - 1) div ($n div $k + 1) + 1 " +
      s"ELSE ($n % $k) + ($rn - ($n % $k) * ($n div $k + 1) - 1) " +
      s"div ($n div $k) + 1 END"

  /** Engine path of the o6/o7 layout reports BEFORE the output
    * materialize-and-release wrapper — the two differ only in the
    * space-filling key. Exposed package-private (via
    * [[zorderLayoutUnreleased]]/[[hilbertLayoutUnreleased]]) so
    * PlanQualitySpec can assert the two-phase-rank plan shape: the
    * registered queries return a released checkpoint scan, whose plan
    * would make those assertions vacuous. `pins` receives the ranked
    * frame's pin; the caller owns its release.
    */
  private def layoutUnreleased(s: org.apache.spark.sql.SparkSession,
      d: String, pins: scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame],
      attachKey: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      key: String): org.apache.spark.sql.DataFrame = {
    val bounds = Tables.orders(s, d).agg(
      min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"),
      min(datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
        .as("min_day"),
      max(datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
        .as("max_day"))
    val keyed = attachKey(Tables.orders(s, d)
      .withColumn("od_day",
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
      .crossJoin(broadcast(bounds))
      .withColumn("qx", expr(
        "CAST((o_custkey - min_ck) * 256 div (max_ck - min_ck + 1) AS INT)"))
      .withColumn("qy", expr(
        "CAST((od_day - min_day) * 256 div (max_day - min_day + 1) AS INT)")))
    val n1 = Tables.orders(s, d).agg(count(lit(1)).as("__n"))
    globalRowNumber(s, keyed, "__rn", 8, pins,
      col(key).asc, col("o_orderkey").asc)
      .crossJoin(broadcast(n1))
      .withColumn("file_id", expr(ntileExpr("__rn", "__n", 16)).cast("long"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("o_custkey").as("min_ck"), max("o_custkey").as("max_ck"),
        min("od_day").cast("long").as("min_day"),
        max("od_day").cast("long").as("max_day"))
      .withColumn("ck_span", col("max_ck") - col("min_ck") + 1)
      .withColumn("day_span", col("max_day") - col("min_day") + 1)
      .orderBy("file_id")
  }

  private[queries] def zorderLayoutUnreleased(
      s: org.apache.spark.sql.SparkSession, d: String,
      pins: scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame =
    layoutUnreleased(s, d, pins,
      df => df.withColumn("zkey", expr(zkeySpark("qx", "qy"))), "zkey")

  private[queries] def hilbertLayoutUnreleased(
      s: org.apache.spark.sql.SparkSession, d: String,
      pins: scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame =
    layoutUnreleased(s, d, pins,
      df => withHilbertKey(df, "qx", "qy", "hkey"), "hkey")

  /** 16-bit Morton (Z-order) key: interleave the low 8 bits of `x`
    * (even positions) and `y` (odd positions). Both builders emit the
    * same sum-of-terms structure so the two engines compute
    * bit-identical integers; Spark spells shifts as functions, DuckDB
    * as operators.
    */
  private[queries] def zkeySpark(x: String, y: String): String =
    (0 until 8).map(i =>
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")

  /** DuckDB twin of [[zkeySpark]]. */
  private def zkeyDuck(x: String, y: String): String =
    (0 until 8).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** Hilbert d-index of an 8-bit (x, y) cell (order-8 curve, 256×256
    * grid) — the classic xy2d scale fold: at each scale s the quadrant
    * pays s²·((3·rx) xor ry) into d, then the frame reflects/swaps so
    * the next scale walks its sub-quadrant in curve order. The
    * reflection uses the full-width complement (255−v): on the bits
    * below s — the only ones later scales read — it equals the
    * textbook s−1−v, and it never goes negative. Unlike the Morton
    * interleave (o6), consecutive Hilbert keys are always GRID
    * NEIGHBORS (no 2^k boundary jumps), which is why Hilbert layouts
    * get tighter per-file min/max envelopes on the same data
    * ([[HilbertSpec]] proves the adjacency law and measures the win).
    * Eight unrolled scale steps, pure integer CASE arithmetic —
    * codegen-friendly, no UDF.
    */
  private[queries] def withHilbertKey(df: org.apache.spark.sql.DataFrame,
      xCol: String, yCol: String, out: String): org.apache.spark.sql.DataFrame = {
    var cur = df.withColumn("hx", col(xCol)).withColumn("hy", col(yCol))
      .withColumn("hd", lit(0L))
    for (s <- Seq(128, 64, 32, 16, 8, 4, 2, 1)) {
      cur = cur
        .withColumn("rx",
          when(col("hx").bitwiseAND(lit(s)) > 0, 1).otherwise(0))
        .withColumn("ry",
          when(col("hy").bitwiseAND(lit(s)) > 0, 1).otherwise(0))
        .withColumn("hd",
          col("hd") + lit(s.toLong * s) * expr("CAST((3 * rx) ^ ry AS BIGINT)"))
        .withColumn("nhx", when(col("ry") === 0,
          when(col("rx") === 1, lit(255) - col("hy")).otherwise(col("hy")))
          .otherwise(col("hx")))
        .withColumn("nhy", when(col("ry") === 0,
          when(col("rx") === 1, lit(255) - col("hx")).otherwise(col("hx")))
          .otherwise(col("hy")))
        .withColumn("hx", col("nhx")).withColumn("hy", col("nhy"))
        .drop("rx", "ry", "nhx", "nhy")
    }
    cur.withColumn(out, col("hd")).drop("hx", "hy", "hd")
  }

  /** DuckDB twin of [[withHilbertKey]]: the same eight scale steps as
    * a generated CTE chain (`carry` = columns to thread through);
    * expects a CTE named `hh0` providing carry + hx, hy, hd.
    */
  private def hilbertDuckSteps(carry: String): String =
    Seq(128, 64, 32, 16, 8, 4, 2, 1).zipWithIndex.map { case (s, k) =>
      s"""hh${k + 1} AS (
  SELECT $carry,
         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 255 - hy ELSE hy END
              ELSE hx END AS hx,
         CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN 255 - hx ELSE hx END
              ELSE hy END AS hy,
         hd + ${s.toLong * s} * xor(3 * rx, ry) AS hd
  FROM (SELECT *,
               CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
               CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
        FROM hh$k))"""
    }.mkString(",\n")

  def qs: Seq[Q] = Seq(
    // W1 per-group top-k by score with explicit tiebreak (datamart.py:28-47)
    Q("w1_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rn").cast("long").as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders)
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // W2 group-relative tie computation over the whole partition frame
    // (datamart.py:33-39): tie count at the top-3 cutoff, whole group vs
    // inside the slice
    Q("w2_group_tie_flag",
      (s, d) => {
        val wOrd = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val wAll = Window.partitionBy("o_custkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val atCut = abs(col("o_totalprice") - col("cutoff")) < 1e-9
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(wOrd))
          .withColumn("cutoff", max(when(col("rn") === 3, col("o_totalprice"))).over(wAll))
          .withColumn("ties_total", count(when(atCut, 1)).over(wAll))
          .withColumn("ties_top", count(when(atCut && col("rn") <= 3, 1)).over(wAll))
          .filter(col("rn") <= 3)
          .withColumn("tie_flag",
            when(atCut && col("ties_total") > col("ties_top"), col("ties_total"))
              .otherwise(lit(0L)))
          .select(col("o_custkey"), col("o_orderkey"),
            col("rn").cast("long").as("rn"), col("tie_flag"))
          .orderBy("o_custkey", "rn")
      },
      Some("""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
), c AS (
  SELECT *, max(CASE WHEN rn = 3 THEN o_totalprice END)
              OVER (PARTITION BY o_custkey) AS cutoff
  FROM r
), c2 AS (
  SELECT *,
    count(CASE WHEN abs(o_totalprice - cutoff) < 1e-9 THEN 1 END)
      OVER (PARTITION BY o_custkey) AS ties_total,
    count(CASE WHEN abs(o_totalprice - cutoff) < 1e-9 AND rn <= 3 THEN 1 END)
      OVER (PARTITION BY o_custkey) AS ties_top
  FROM c
)
SELECT o_custkey, o_orderkey, rn,
  CASE WHEN abs(o_totalprice - cutoff) < 1e-9 AND ties_total > ties_top
       THEN ties_total ELSE 0 END AS tie_flag
FROM c2 WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // W1' — identical semantics to w1_topk_per_group, computed by the
    // bounded TopKAgg aggregate instead of a window: the shuffle carries
    // at most k rows per group per map task (see TopKAgg scaladoc). Same
    // oracle SQL as w1 — the driver's hash-compare proves the two
    // formulations agree.
    Q("w1_topk_partial_agg",
      (s, d) => {
        val topk = udaf(new graft.functions.TopKAgg(3))
        Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(col("o_custkey"), posexplode(col("top")))
          .select(col("o_custkey"),
            col("col.id").as("o_orderkey"),
            col("col.score").as("o_totalprice"),
            (col("pos") + 1).cast("long").as("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders)
              WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // Beyond the reference's ∅-list: moving-frame aggregate — trailing
    // 4-row average of event values per user (DECIMAL-exact arithmetic)
    Q("w3_moving_avg",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(-3, 0)
        Tables.events(s, d)
          .withColumn("trail_avg",
            (sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
              count(lit(1)).over(w)))
          .select(col("event_id"), col("user_id"), col("value"),
            round(col("trail_avg"), 6).as("trail_avg"))
          .orderBy("event_id")
      },
      Some("""
SELECT event_id, user_id, value,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / count(*) OVER w, 6) AS trail_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY event_id""")),

    // Beyond the reference's ∅-list: lag/lead — per-user deltas between
    // consecutive event values and the next event's type
    Q("w4_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .withColumn("delta", round(col("value") - lag("value", 1).over(w), 6))
          .withColumn("next_type", lead("event_type", 1).over(w))
          .select("event_id", "user_id", "delta", "next_type")
          .orderBy("event_id")
      },
      Some("""
SELECT event_id, user_id,
       round(value - lag(value, 1) OVER w, 6) AS delta,
       lead(event_type, 1) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
ORDER BY event_id""")),

    // Rank-family windows (beyond the ∅-list): percent_rank + ntile
    // over a per-group total order made deterministic by the unique-key
    // tiebreak — with a unique ordering, rank == row_number, so both
    // functions agree across engines bit-for-bit.
    Q("w5_ntile_percent_rank",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .filter(col("o_orderkey") % 20 === 0)
          .select("o_orderkey", "o_orderpriority", "pr", "quartile")
          .orderBy("o_orderkey")
      },
      Some("""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pr,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
QUALIFY o_orderkey % 20 = 0 ORDER BY o_orderkey""")),

    // RANGE-framed window (beyond the ∅-list) — the frame is defined by
    // ORDER-BY VALUE distance, not row count: each event sees every
    // event of the same user within the trailing hour, however many
    // rows that is (w3's ROWS frame is the fixed-row-count cousin).
    // Peers with identical timestamps are all in-frame by definition,
    // so the result is deterministic without a tiebreak; the decimal
    // sum keeps the windowed total engine-exact. One shuffle on
    // user_id, sorted once, both aggregates share the frame.
    Q("w6_range_frame",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"))
          .rangeBetween(-3600L * 1000000L, 0)
        Tables.events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sum_1h",
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
          .select("event_id", "user_id", "n_1h", "sum_1h")
          .orderBy("event_id")
      },
      Some("""
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id""")),

    // Forward fill / LOCF (beyond the ∅-list — the sensor-gap-fill
    // shape): carry the last non-null observation forward within each
    // user's timeline via last(…, ignoreNulls) over an unbounded-
    // preceding ROWS frame. The null pattern is derived
    // deterministically (readings above the threshold stand in for
    // missing samples). One shuffle on user_id; the fill itself is a
    // single sorted pass — no self-join, no as-of lookup.
    Q("w7_forward_fill",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("reading", when(col("value") <= 80.0, col("value")))
          .withColumn("filled", last("reading", ignoreNulls = true).over(w))
          .filter(col("event_id") % 20 === 0)
          .select("event_id", "user_id", "reading", "filled")
          .orderBy("event_id")
      },
      Some("""
SELECT event_id, user_id, reading,
       last_value(reading IGNORE NULLS) OVER w AS filled
FROM (SELECT event_id, user_id, ts,
             CASE WHEN value <= 80.0 THEN value END AS reading
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
QUALIFY event_id % 20 = 0 ORDER BY event_id""")),

    // O1 global sort descending by score (datamart.py:31)
    Q("o1_global_sort",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_totalprice > 400000.0
              ORDER BY o_totalprice DESC, o_orderkey ASC""")),

    // O2 sort + LIMIT -> TakeOrderedAndProject (datamart.py:31, head(10))
    Q("o2_sort_limit",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""")),

    // O3 reverse-sorted listing, newest first (tanimoto.py:67)
    Q("o3_sort_desc_names",
      (s, d) => Tables.documents(s, d)
        .select("source").distinct()
        .orderBy(col("source").desc),
      Some("SELECT DISTINCT source FROM documents ORDER BY source DESC")),

    // O4 LIMIT/OFFSET pagination (db_interact.py:181-200 — broken and
    // unused in the reference; implemented here for inventory
    // completeness). Pagination over a total order is well-defined;
    // at cluster scale prefer keyset pagination (WHERE key > last) —
    // OFFSET still sorts-and-skips the prefix.
    Q("o4_limit_offset",
      (s, d) => Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .offset(20).limit(10),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
              ORDER BY c_custkey LIMIT 10 OFFSET 20""")),

    // First-touch attribution (beyond the ∅-list): the funnel-analytics
    // composition — sessionize by inactivity gap (lag + cumsum, the
    // batch twin of e3/st5's session windows), then credit every
    // purchase in a session to the session's ENTRY event type
    // (first_value over the session partition). Three windows, all
    // partitioned by user — one shuffle total, nothing global.
    Q("w10_session_attribution",
      (s, d) => {
        val wSeq = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val wSess = Window.partitionBy("user_id", "sid")
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .withColumn("gap_us",
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wSeq))
          .withColumn("brk",
            when(col("gap_us").isNull || col("gap_us") >= 1800L * 1000000L, 1)
              .otherwise(0))
          .withColumn("sid", sum("brk").over(
            wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("entry_type", first("event_type").over(wSess))
          .filter(col("event_type") === "purchase")
          .groupBy("entry_type")
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("attributed_value"))
          .orderBy("entry_type")
      },
      Some("""
WITH seq AS (
  SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP))
           - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)),
s2 AS (
  SELECT *, CAST(sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800 * 1000000
                          THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM seq),
s3 AS (
  SELECT *, first_value(event_type)
              OVER (PARTITION BY user_id, sid
                    ORDER BY ts ASC, event_id ASC) AS entry_type
  FROM s2)
SELECT entry_type, count(*) AS n_purchases,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
FROM s3 WHERE event_type = 'purchase'
GROUP BY entry_type ORDER BY entry_type""")),

    // Rank-function gallery (beyond the ∅-list): rank / dense_rank /
    // cume_dist complete the ranking family next to w1's row_number
    // and w5's percent_rank/ntile. Ties are REAL here (o_totalprice
    // collides), which is the point: rank leaves gaps, dense_rank
    // doesn't, cume_dist counts peers — and all three are
    // deterministic under ties without a tiebreak because equal keys
    // get equal values.
    Q("w9_rank_gallery",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").asc)
        Tables.orders(s, d)
          .withColumn("rnk", rank().over(w).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .filter(col("o_orderkey") % 25 === 0)
          .select("o_orderkey", "o_orderpriority", "rnk", "drnk", "cd")
          .orderBy("o_orderkey")
      },
      Some("""
SELECT o_orderkey, o_orderpriority,
       rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
       round(cume_dist() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC)
QUALIFY o_orderkey % 25 = 0 ORDER BY o_orderkey""")),

    // Time-grid densification (beyond the ∅-list): the resample shape —
    // project each user's sparse events onto a complete hourly grid
    // (sequence + explode between the user's own bounds), left-join the
    // observed hourly aggregate, and LOCF-fill the holes (w7's fill over
    // a generated, gap-free axis). Grid generation is per-row local;
    // the only shuffles are the hourly pre-aggregate and the user_id
    // window — at 100 TB the grid never materializes wider than
    // users × hours, independent of event count.
    Q("w8_time_grid_densify",
      (s, d) => {
        val ev = Tables.events(s, d)
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("h0"),
            date_trunc("hour", max(col("ts"))).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("INTERVAL 1 HOUR"))).as("h"))
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("filled", last("v", ignoreNulls = true).over(w))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hours"),
            count(col("v")).as("n_observed"),
            sum(col("filled")).cast("double").as("filled_sum"))
          .orderBy("user_id")
      },
      Some("""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         sum(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))),
bounds AS (
  SELECT user_id, date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS h0,
         date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS h1
  FROM events GROUP BY user_id),
grid AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds),
filled AS (
  SELECT g.user_id, g.h, hourly.v,
         last_value(hourly.v IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
  FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h)
SELECT user_id, count(*) AS n_hours, count(v) AS n_observed,
       CAST(sum(filled) AS DOUBLE) AS filled_sum
FROM filled GROUP BY user_id ORDER BY user_id""")),

    // Linear interpolation on the densified grid — the resample mode
    // LOCF can't provide (sensor/metric series): a missing hour
    // strictly between two observations gets prev + (next-prev) *
    // elapsed-fraction; hours outside the observed range stay null.
    // Bracketing observations come from the same one window pass
    // family as w7/w8 (last/first ignoreNulls over the user-keyed
    // grid). The interpolated double is a FIXED expression of exact
    // decimals and integer second-diffs, and the per-user checksum
    // rounds to decimal(18,6) BEFORE summing, so the aggregate is
    // order-insensitive and hash-stable at any parallelism.
    Q("w11_linear_interpolate",
      (s, d) => {
        val ev = Tables.events(s, d)
        val hourly = ev
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
        val grid = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("h0"),
            date_trunc("hour", max(col("ts"))).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("INTERVAL 1 HOUR"))).as("h"))
        val wb = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("pv", last("v", ignoreNulls = true).over(wb))
          .withColumn("ph",
            last(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wb))
          .withColumn("nv", first("v", ignoreNulls = true).over(wf))
          .withColumn("nh",
            first(when(col("v").isNotNull, col("h")), ignoreNulls = true).over(wf))
          // exact integer interpolation in micro-units: cents-scaled
          // bigints and integer div (all values non-negative, so floor
          // == truncation) — double round(x, 6) has engine-specific
          // tie behavior, measured 1e-6 apart on this fixture
          .withColumn("pvc", (col("pv") * 100).cast("long"))
          .withColumn("nvc", (col("nv") * 100).cast("long"))
          .withColumn("ds",
            unix_timestamp(col("h")) - unix_timestamp(col("ph")))
          .withColumn("dt",
            unix_timestamp(col("nh")) - unix_timestamp(col("ph")))
          .withColumn("interp_u6", when(
            col("v").isNull && col("pv").isNotNull && col("nv").isNotNull,
            expr("(pvc * 10000L * dt + (nvc - pvc) * 10000L * ds) div dt")))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_hours"), count(col("v")).as("n_observed"),
            count(col("interp_u6")).as("n_interp"),
            (sum(col("interp_u6")).cast("double") / lit(1000000.0))
              .as("interp_sum"))
          .orderBy("user_id")
      },
      Some("""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         sum(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))),
bounds AS (
  SELECT user_id, date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS h0,
         date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS h1
  FROM events GROUP BY user_id),
grid AS (
  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds),
br AS (
  SELECT g.user_id, g.h, hourly.v,
         last_value(hourly.v IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN hourly.v IS NOT NULL THEN g.h END IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         first_value(hourly.v IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN hourly.v IS NOT NULL THEN g.h END IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h),
it AS (
  SELECT user_id, h, v,
         CASE WHEN v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL THEN
           (CAST(pv * 100 AS BIGINT) * 10000 * date_diff('second', ph, nh)
            + (CAST(nv * 100 AS BIGINT) - CAST(pv * 100 AS BIGINT)) * 10000
              * date_diff('second', ph, h))
           // date_diff('second', ph, nh)
         END AS interp_u6
  FROM br)
SELECT user_id, count(*) AS n_hours, count(v) AS n_observed,
       count(interp_u6) AS n_interp,
       CAST(sum(interp_u6) AS DOUBLE) / 1000000.0 AS interp_sum
FROM it GROUP BY user_id ORDER BY user_id""")),

    // Scalable GLOBAL row numbering (beyond the ∅-list): a bare
    // row_number() over an unpartitioned window collapses the whole
    // dataset into ONE task — the canonical local-mode-works,
    // cluster-dies shape. The scalable plan: range-repartition on the
    // sort key (so partitions are globally ordered), number rows
    // WITHIN each partition (distributed), then add per-partition
    // offsets computed from the tiny partition-count table (a
    // running sum over #partitions rows, broadcast back). Same
    // result as the single-task window, verified by the oracle's
    // plain row_number().
    Q("o5_scalable_row_number",
      (s, d) => {
        val pins = scala.collection.mutable
          .Buffer.empty[org.apache.spark.sql.DataFrame]
        val out = globalRowNumber(s,
          Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
          "global_rn", 8, pins, col("o_totalprice").desc, col("o_orderkey").asc)
          .select("o_orderkey", "o_totalprice", "global_rn")
          .filter(col("global_rn") <= 500)
          .orderBy("global_rn")
        graft.Caching.releasing(s, pins.toSeq: _*)(out)
      },
      Some("""
SELECT o_orderkey, o_totalprice,
       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
         AS global_rn
FROM orders
QUALIFY global_rn <= 500 ORDER BY global_rn""")),

    // Z-order layout — multi-dimensional clustering for data skipping
    // (the Delta/Iceberg Z-ORDER write pattern, re-derived): quantize
    // two dimensions to 8 bits each by min-max scaling (integer
    // arithmetic, engine-portable — NOT ntile, whose tie-break is
    // engine-private), interleave the bits into a 16-bit Morton key,
    // and lay rows out in zkey order. The query reports the PAYOFF in
    // oracle-checkable form: per-file min/max envelopes for BOTH
    // dimensions after assigning rows to 16 equal files along the
    // zkey order — every file covers a small rectangle of
    // (custkey × orderdate), so a reader filtering on EITHER dim
    // prunes most files; a single-dim sort would give tight envelopes
    // on one dim and full-range envelopes on the other. The file
    // assignment runs through globalRowNumber + the exact integer
    // ntile replica (ntileExpr) — ONE repartitionByRange(zkey)
    // shuffle, no single-task window; the oracle keeps the literal
    // ntile, which is rank-identical. The stats table is what the
    // format's footer min/max gives readers for free.
    Q("o6_zorder_layout",
      (s, d) => {
        val pins = scala.collection.mutable
          .Buffer.empty[org.apache.spark.sql.DataFrame]
        val out = zorderLayoutUnreleased(s, d, pins)
        graft.Caching.releasing(s, pins.toSeq: _*)(out)
      },
      Some(s"""
WITH b AS (
  SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
         min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS min_day,
         max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS max_day
  FROM orders),
keyed AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS od_day,
         CAST((o_custkey - min_ck) * 256 // (max_ck - min_ck + 1) AS INTEGER)
           AS qx,
         CAST((date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               - min_day) * 256 // (max_day - min_day + 1) AS INTEGER) AS qy
  FROM orders CROSS JOIN b),
z AS (
  SELECT o_orderkey, o_custkey, od_day,
         ${zkeyDuck("qx", "qy")} AS zkey
  FROM keyed),
f AS (
  SELECT o_custkey, od_day,
         CAST(ntile(16) OVER (ORDER BY zkey ASC, o_orderkey ASC) AS BIGINT)
           AS file_id
  FROM z)
SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
       CAST(min(od_day) AS BIGINT) AS min_day,
       CAST(max(od_day) AS BIGINT) AS max_day,
       max(o_custkey) - min(o_custkey) + 1 AS ck_span,
       CAST(max(od_day) - min(od_day) + 1 AS BIGINT) AS day_span
FROM f GROUP BY file_id ORDER BY file_id""")),

    // O7 Hilbert-curve layout — o6's Morton layout with the stronger
    // curve: same 8-bit quantization of (o_custkey, order day), same
    // 16-file assignment along key order, same per-file min/max
    // envelopes, but the cell order is the order-8 Hilbert walk
    // ([[withHilbertKey]]), whose consecutive cells are always grid
    // neighbors — no Morton 2^k jumps — so file envelopes (the
    // data-skipping payoff both layouts exist for) come out tighter on
    // the same rows. The key is eight unrolled integer CASE steps
    // inside codegen; the one wide op is the layout sort itself, which
    // runs through globalRowNumber (repartitionByRange on the key, the
    // o5 technique) + the ntileExpr file assignment — no single-task
    // window in the engine plan.
    Q("o7_hilbert_layout",
      (s, d) => {
        val pins = scala.collection.mutable
          .Buffer.empty[org.apache.spark.sql.DataFrame]
        val out = hilbertLayoutUnreleased(s, d, pins)
        graft.Caching.releasing(s, pins.toSeq: _*)(out)
      },
      Some(s"""
WITH b AS (
  SELECT min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
         min(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS min_day,
         max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS max_day
  FROM orders),
hh0 AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
           AS od_day,
         CAST((o_custkey - min_ck) * 256 // (max_ck - min_ck + 1) AS INTEGER)
           AS hx,
         CAST((date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               - min_day) * 256 // (max_day - min_day + 1) AS INTEGER) AS hy,
         CAST(0 AS BIGINT) AS hd
  FROM orders CROSS JOIN b),
${hilbertDuckSteps("o_orderkey, o_custkey, od_day")},
f AS (
  SELECT o_custkey, od_day,
         CAST(ntile(16) OVER (ORDER BY hd ASC, o_orderkey ASC) AS BIGINT)
           AS file_id
  FROM hh8)
SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
       CAST(min(od_day) AS BIGINT) AS min_day,
       CAST(max(od_day) AS BIGINT) AS max_day,
       max(o_custkey) - min(o_custkey) + 1 AS ck_span,
       CAST(max(od_day) - min(od_day) + 1 AS BIGINT) AS day_span
FROM f GROUP BY file_id ORDER BY file_id""")),

    // U1 UNION ALL of two disjoint slices (mpp.py:136)
    Q("u1_union_all",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_returnflag")
        li.filter(col("l_returnflag") === "A")
          .union(li.filter(col("l_returnflag") === "R"))
          .orderBy("l_orderkey", "l_linenumber", "l_returnflag")
      },
      Some("""SELECT * FROM (
                SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
                WHERE l_returnflag = 'A'
                UNION ALL
                SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
                WHERE l_returnflag = 'R')
              ORDER BY l_orderkey, l_linenumber, l_returnflag""")),

    // U2 union-fold accumulation (datamart.py:54-58) — three slices
    // folded; in Spark the fold is one union node, not N materializations
    Q("u2_union_accumulate",
      (s, d) => {
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
        Seq("F", "O", "P")
          .map(st => o.filter(col("o_orderstatus") === st))
          .reduce(_ union _)
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders
              WHERE o_orderstatus IN ('F', 'O', 'P')
              ORDER BY o_orderkey""")),

    // U3 union + distinct of two column roles (datamart.py:96-102)
    Q("u3_union_distinct",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        o.select(col("o_custkey").as("id"))
          .union(c.select(col("c_custkey").as("id")))
          .distinct()
          .orderBy("id")
      },
      Some("""SELECT o_custkey AS id FROM orders
              UNION SELECT c_custkey FROM customer ORDER BY id""")),

    // U4 EXCEPT: parts not shipped before 1996 (datamart.py:86-103 pattern)
    // Beyond the ∅-list: multiset EXCEPT ALL / INTERSECT ALL — bag
    // semantics preserve DUPLICITY (how many copies survive), which is
    // what reconciliation actually needs: "orders minus shipments"
    // must say 3−2=1 copy remains, not merely "present". One query
    // exercises both; counts roll up so the oracle pins every
    // multiplicity.
    Q("u7_except_intersect_all",
      (s, d) => {
        val a = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "A").select(col("l_partkey").as("id"))
        val b = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R").select(col("l_partkey").as("id"))
        val ex = a.exceptAll(b).groupBy("id")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        val in = a.intersectAll(b).groupBy("id")
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        ex.union(in).orderBy("op", "id")
      },
      Some("""
WITH a AS (SELECT l_partkey AS id FROM lineitem WHERE l_returnflag = 'A'),
b AS (SELECT l_partkey AS id FROM lineitem WHERE l_returnflag = 'R'),
ex AS (SELECT id FROM a EXCEPT ALL SELECT id FROM b),
inx AS (SELECT id FROM a INTERSECT ALL SELECT id FROM b)
SELECT id, n, op FROM (
  SELECT id, count(*) AS n, 'except_all' AS op FROM ex GROUP BY id
  UNION ALL
  SELECT id, count(*), 'intersect_all' FROM inx GROUP BY id)
ORDER BY op, id""")),

    Q("u4_except",
      (s, d) => Tables.part(s, d).select(col("p_partkey").as("id"))
        .except(Tables.lineitem(s, d)
          .filter(col("l_shipdate") < "1996-01-01")
          .select(col("l_partkey").as("id")))
        .orderBy("id"),
      Some("""SELECT p_partkey AS id FROM part
              EXCEPT
              SELECT l_partkey FROM lineitem
              WHERE l_shipdate < TIMESTAMP '1996-01-01'
              ORDER BY id""")),

    // Beyond the reference's ∅-list: INTERSECT — parts shipped in BOTH
    // halves of the time range
    Q("u5_intersect",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_shipdate") < "1996-01-01")
          .select(col("l_partkey").as("id"))
          .intersect(li.filter(col("l_shipdate") >= "1996-01-01")
            .select(col("l_partkey").as("id")))
          .orderBy("id")
      },
      Some("""SELECT l_partkey AS id FROM lineitem
              WHERE l_shipdate < TIMESTAMP '1996-01-01'
              INTERSECT
              SELECT l_partkey FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              ORDER BY id""")),

    // unionByName with missing-column back-fill — the set-op companion
    // of s8 schema evolution: batches whose schemas drifted (reordered
    // columns, a column absent in the older extract) still union
    // safely BY NAME, with NULL back-fill — positional unionAll here
    // would silently mis-assign columns, the classic drift bug.
    Q("u6_union_by_name",
      (s, d) => {
        val c = Tables.customer(s, d)
        val newBatch = c.filter(col("c_custkey") % 2 === 0)
          .select("c_custkey", "c_name", "c_acctbal")
        val oldBatch = c.filter(col("c_custkey") % 2 === 1)
          .select(col("c_acctbal"), col("c_custkey")) // reordered, no name
        newBatch.unionByName(oldBatch, allowMissingColumns = true)
          .orderBy("c_custkey")
      },
      Some("""
SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
UNION ALL
SELECT c_custkey, NULL AS c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 1
ORDER BY c_custkey""")),

    // Exponentially-weighted moving average (trend smoothing, the
    // time-series companion of w3's flat moving average). A true EWMA
    // is a sequential recurrence; the windowable form is the 8-term
    // truncated expansion ewma_t = Σ_k w_k·x_{t-k} / Σ_k w_k with
    // w_k = 2^-k — α = 1/2 is chosen deliberately: every weight is a
    // power of two, so each product is an exact double scaling and the
    // left-associated sum chain (both engines parse `a+b+c` the same
    // way) is bit-identical — no rounding needed, the hash gate checks
    // raw doubles. Truncation error is bounded by 2^-8 of the running
    // scale. One shuffle on user_id; lags reuse one sorted frame.
    Q("w12_ewma",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val terms = (0 until 8).map { k =>
          val c = if (k == 0) col("value") else lag(col("value"), k).over(w)
          (c, math.pow(0.5, k))
        }
        val num = terms.map { case (c, wt) =>
          coalesce(c, lit(0.0)) * lit(wt) }.reduce(_ + _)
        val den = terms.map { case (c, wt) =>
          when(c.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
        Tables.events(s, d)
          .withColumn("ewma", num / den)
          .filter(col("event_id") % 5 === 0)
          .select("event_id", "user_id", "value", "ewma")
          .orderBy("event_id")
      },
      Some {
        val nums = (0 until 8).map { k =>
          val c = if (k == 0) "value" else s"lag(value, $k) OVER w"
          s"coalesce($c, 0.0) * ${math.pow(0.5, k)}"
        }.mkString(" + ")
        val dens = (0 until 8).map { k =>
          val c = if (k == 0) "value" else s"lag(value, $k) OVER w"
          s"(CASE WHEN $c IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0.0 END)"
        }.mkString(" + ")
        s"""
SELECT event_id, user_id, value, ($nums) / ($dens) AS ewma
FROM (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
QUALIFY event_id % 5 = 0 ORDER BY event_id"""
      }),

    // Interval union / flatten (gaps-and-islands over OVERLAPPING
    // ranges — distinct from e3's gap-based sessions: intervals carry
    // explicit, varying ends, and merging needs the running max of all
    // PRIOR ends, not just the previous row's). Each event opens a
    // 1–7-minute interval; an island breaks where a start clears every
    // end seen so far. All arithmetic in integer epoch-micros. One
    // shuffle on user_id; the running max and the island id share one
    // sorted frame — the coverage/dead-air analysis shape (uptime
    // stitching, span coverage) that row-local ops can't express.
    Q("w13_interval_islands",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("start_us").asc, col("event_id").asc)
        Tables.events(s, d)
          .withColumn("start_us", unix_micros(col("ts")))
          .withColumn("end_us",
            col("start_us") + (col("event_id") % 7 + 1) * 60000000L)
          .withColumn("prev_max_end",
            max("end_us").over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("brk",
            when(col("prev_max_end").isNull ||
              col("start_us") > col("prev_max_end"), 1).otherwise(0))
          .withColumn("island", sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
          .groupBy("user_id", "island")
          .agg(min("start_us").as("island_start_us"),
            max("end_us").as("island_end_us"),
            count(lit(1)).as("n_events"))
          .withColumn("covered_us",
            col("island_end_us") - col("island_start_us"))
          .orderBy("user_id", "island")
      },
      Some("""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS start_us,
         epoch_us(CAST(ts AS TIMESTAMP)) + (event_id % 7 + 1) * 60000000 AS end_us
  FROM events),
mx AS (
  SELECT *, max(end_us) OVER (PARTITION BY user_id
             ORDER BY start_us ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
  FROM iv),
br AS (
  SELECT *, CASE WHEN prev_max_end IS NULL OR start_us > prev_max_end
                 THEN 1 ELSE 0 END AS brk
  FROM mx),
isl AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
              ORDER BY start_us ASC, event_id ASC
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM br)
SELECT user_id, island, min(start_us) AS island_start_us,
       max(end_us) AS island_end_us, count(*) AS n_events,
       max(end_us) - min(start_us) AS covered_us
FROM isl GROUP BY user_id, island ORDER BY user_id, island"""))
  )
}
