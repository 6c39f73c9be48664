package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.4 — aggregations (A1–A7).
  *
  * Hash aggregation with partial (map-side) combine is automatic in
  * Spark; at 100 TB the only knob that matters is that grouping keys are
  * low-cardinality relative to input (all of these are), so the
  * final-aggregate shuffle is tiny.
  *
  * Float determinism: sums/avgs are either over integral-valued doubles
  * (exact in IEEE754 up to 2^53 — order-independent) or rounded to 6
  * decimals (SURVEY.md §5).
  */
object Aggregates {

  def qs: Seq[Q] = Seq(
    // A1 COUNT(*) scalar aggregate (compute_morgan.py:11-13)
    Q("a1_count_star",
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem")),

    // The spark.sql(...) entry path: the same engine surface via SQL
    // text on a registered view (TPC-H Q1 shape — pricing summary).
    // DECIMAL-cast sums keep the aggregation order-independent so the
    // hash compare is exact (SURVEY.md §5).
    Q("sql_pricing_summary",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                 CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
                 count(*) AS count_order
          FROM sql_lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus""")
      },
      Some("""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""")),

    // Explicit GROUPING SETS — the general form ROLLUP (a10) and CUBE
    // (a12) are sugar over: exactly the requested aggregation levels,
    // nothing else (here: per-flag, per-status, and grand total — the
    // flag×status cross level is deliberately absent). One pass over
    // the fact with Expand, no self-union of scans.
    Q("a14_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem_gs")
        s.sql("""
          SELECT l_returnflag, l_linestatus, count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          FROM sql_lineitem_gs
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY l_returnflag, l_linestatus, n""")
      },
      Some("""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""")),

    // SQL text entry, join-heavy shape (TPC-H Q3 — shipping priority):
    // 3-way join + filtered date window + grouped revenue + top-10.
    // Revenue is exact decimal arithmetic summed before the final
    // DOUBLE cast, and the ORDER BY carries the unique l_orderkey
    // tiebreak so LIMIT 10 is deterministic across engines.
    Q("sql_shipping_priority",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("sql_customer")
        Tables.orders(s, d).createOrReplaceTempView("sql_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        s.sql("""
          SELECT l_orderkey,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
                 o_orderdate, o_orderpriority
          FROM sql_customer
          JOIN sql_orders ON c_custkey = o_custkey
          JOIN sql_lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
            AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, l_orderkey LIMIT 10""")
      },
      Some("""
SELECT l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // SQL text entry, 6-way snowflake join (TPC-H Q5 — local supplier
    // volume): customer/orders/lineitem/supplier co-located by nation,
    // rolled up a region dimension. The dims broadcast; the
    // c_nationkey = s_nationkey co-location predicate rides the
    // supplier join.
    Q("sql_local_supplier_volume",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("sql_customer")
        Tables.orders(s, d).createOrReplaceTempView("sql_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        Tables.supplier(s, d).createOrReplaceTempView("sql_supplier")
        Tables.nation(s, d).createOrReplaceTempView("sql_nation")
        Tables.region(s, d).createOrReplaceTempView("sql_region")
        s.sql("""
          SELECT n_name,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
          FROM sql_customer
          JOIN sql_orders ON c_custkey = o_custkey
          JOIN sql_lineitem ON l_orderkey = o_orderkey
          JOIN sql_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN sql_nation ON s_nationkey = n_nationkey
          JOIN sql_region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY n_name
          ORDER BY revenue DESC, n_name""")
      },
      Some("""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name""")),

    // SQL text entry, returned-item revenue (TPC-H Q10 shape): which
    // customers returned the most value in a quarter — fact joined to
    // two dims, grouped by customer, top-20. The nation dim broadcasts;
    // the returnflag filter reaches the lineitem scan before the join.
    Q("sql_returned_item_revenue",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("sql_customer")
        Tables.orders(s, d).createOrReplaceTempView("sql_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        Tables.nation(s, d).createOrReplaceTempView("sql_nation")
        s.sql("""
          SELECT c_custkey, c_name, n_name,
                 CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
          FROM sql_customer
          JOIN sql_orders ON c_custkey = o_custkey
          JOIN sql_lineitem ON l_orderkey = o_orderkey
          JOIN sql_nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
          GROUP BY c_custkey, c_name, n_name
          ORDER BY revenue DESC, c_custkey LIMIT 20""")
      },
      Some("""
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // SQL text entry, scan-dominated aggregate (TPC-H Q6 shape —
    // forecast revenue change): no join at all, every predicate lands
    // in PushedFilters, one decimal-exact global sum. The degenerate
    // single-row case of the SQL path, worth covering because it is
    // the shape where pushdown does ALL the work.
    Q("sql_revenue_change",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        s.sql("""
          SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
                 count(*) AS n_items
          FROM sql_lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            AND l_discount >= 0.02 AND l_discount <= 0.04
            AND l_quantity < 24""")
      },
      Some("""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24""")),

    // SQL text entry, IN-subquery with aggregate HAVING (TPC-H Q18
    // shape — large-volume customers): the subquery form Catalyst must
    // DECORRELATE into a join against the pre-aggregated key set (a
    // per-row subquery execution would be quadratic). Decimal-exact
    // sums; unique o_orderkey tiebreak keeps LIMIT deterministic.
    Q("sql_large_volume_customer",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("sql_customer")
        Tables.orders(s, d).createOrReplaceTempView("sql_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        s.sql("""
          SELECT c_name, c_custkey, o_orderkey, o_totalprice,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
          FROM sql_customer
          JOIN sql_orders ON c_custkey = o_custkey
          JOIN sql_lineitem ON o_orderkey = l_orderkey
          WHERE o_orderkey IN (
            SELECT l_orderkey FROM sql_lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
          GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
      },
      Some("""
SELECT c_name, c_custkey, o_orderkey, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 200)
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    // SQL text entry, correlated EXISTS (TPC-H Q4 shape — order
    // priority checking): Catalyst must rewrite the correlated EXISTS
    // into a left-semi join on l_orderkey; the naive per-order probe
    // would rescan lineitem |orders| times. (The testdata has no
    // l_commitdate/l_receiptdate, so the Q4 predicate becomes
    // returnflag='R'.)
    Q("sql_order_priority_exists",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("sql_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        s.sql("""
          SELECT o_orderpriority, count(*) AS order_count
          FROM sql_orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
            AND EXISTS (SELECT 1 FROM sql_lineitem
                        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
          GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      },
      Some("""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // SQL text entry, NOT IN + COUNT(DISTINCT) (TPC-H Q16 shape —
    // parts/supplier relationship): the uncorrelated NOT IN becomes a
    // null-aware anti join against the (tiny, broadcast) excluded
    // supplier set; the distinct count shuffles once on the group keys.
    // (No partsupp table in the testdata — lineitem is the
    // part-supplier link.)
    Q("sql_parts_supplier_cnt",
      (s, d) => {
        Tables.part(s, d).createOrReplaceTempView("sql_part")
        Tables.supplier(s, d).createOrReplaceTempView("sql_supplier")
        Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
        s.sql("""
          SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
          FROM sql_part JOIN sql_lineitem ON p_partkey = l_partkey
          WHERE p_brand <> 'Brand#1'
            AND l_suppkey NOT IN (SELECT s_suppkey FROM sql_supplier
                                  WHERE s_acctbal < 0.0)
          GROUP BY p_brand, p_size
          ORDER BY supplier_cnt DESC, p_brand, p_size""")
      },
      Some("""
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size""")),

    // SQL text entry, scalar subquery + NOT EXISTS (TPC-H Q22 shape —
    // global sales opportunity): the scalar average is one tiny
    // broadcast value, the NOT EXISTS an anti join on o_custkey. The
    // threshold is computed as exact-decimal sum / count in ONE double
    // division on both engines (a native double avg would fold in a
    // different order per engine and flip boundary rows under the
    // hash gate). Every testdata customer has SOME order, so the
    // reference predicate becomes "no recent order".
    Q("sql_global_sales_opportunity",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("sql_customer")
        Tables.orders(s, d).createOrReplaceTempView("sql_orders")
        s.sql("""
          SELECT c_nationkey, count(*) AS numcust,
                 CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
          FROM sql_customer
          WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                    / count(*)
                             FROM sql_customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM sql_orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
          GROUP BY c_nationkey ORDER BY c_nationkey""")
      },
      Some("""
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / count(*)
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // Per-group z-score normalization (beyond the ∅-list): the feature
    // standardization every ML ingest applies. Mean and variance come
    // from exact decimal sums (a11's trick), so the only float ops are
    // one division, one sqrt — IEEE requires sqrt correctly rounded —
    // and the final (x-µ)/σ, identical on both engines under
    // round(…,6). Stats broadcast back onto the rows: two passes, one
    // tiny join, no window over the full data.
    // Activity bitmaps — the retention/engagement primitive: one
    // BIGINT per user packs 30 days of presence (bit i = active on
    // day i+1), built by the bit_or aggregate. Bitwise agg is
    // associative/commutative (map-side combinable, merge = OR), the
    // per-user state is 8 bytes at any event volume, and downstream
    // set algebra (cohort intersect = AND, churn = ANDNOT) never
    // touches the raw events again. bit_count gives active-day counts
    // without unpacking.
    Q("a21_activity_bitmap",
      (s, d) => {
        Tables.events(s, d)
          .select(col("user_id"),
            expr("shiftleft(1L, day(ts) - 1)").as("daybit"))
          .groupBy("user_id").agg(expr("bit_or(daybit)").as("bitmap"))
          .select(col("user_id"), col("bitmap"),
            expr("cast(bit_count(bitmap) as bigint)").as("n_active_days"),
            (col("bitmap").bitwiseAND(lit(127L)) =!= 0).as("active_week1"))
          .orderBy("user_id")
      },
      Some("""
SELECT user_id, bit_or(1::BIGINT << (date_part('day', CAST(ts AS TIMESTAMP)) - 1)) AS bitmap,
       bit_count(bit_or(1::BIGINT << (date_part('day', CAST(ts AS TIMESTAMP)) - 1)))::BIGINT AS n_active_days,
       (bit_or(1::BIGINT << (date_part('day', CAST(ts AS TIMESTAMP)) - 1)) & 127) <> 0 AS active_week1
FROM events GROUP BY user_id ORDER BY user_id""")),

    Q("a18_zscore_normalize",
      (s, d) => {
        val v = col("value").cast("decimal(18,2)")
        val stats = Tables.events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(v).cast("double").as("sv"),
            sum((v * v).cast("decimal(28,4)")).cast("double").as("ssv"))
          .select(col("event_type"),
            (col("sv") / col("n")).as("mu"),
            sqrt((col("ssv") - col("sv") * col("sv") / col("n")) / col("n"))
              .as("sigma"))
        Tables.events(s, d)
          .filter(col("event_id") % 40 === 0)
          .join(broadcast(stats), "event_type")
          .select(col("event_id"), col("event_type"),
            round((col("value") - col("mu")) / col("sigma"), 6).as("z"))
          .orderBy("event_id")
      },
      Some("""
WITH stats AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mu,
         sqrt((CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) *
                              CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4)))
                    AS DOUBLE)
               - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                 * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
              / count(*)) AS sigma
  FROM events GROUP BY event_type)
SELECT event_id, event_type, round((value - mu) / sigma, 6) AS z
FROM events JOIN stats USING (event_type)
WHERE event_id % 40 = 0 ORDER BY event_id""")),

    // UNPIVOT / melt (beyond the ∅-list): the wide→long inverse of a9's
    // pivot — metric columns become (metric, value) rows, the reshape
    // every metrics store and chart feed wants. Spark's native unpivot
    // (3.4+) is a zero-shuffle row-local expansion.
    Q("a17_unpivot_melt",
      (s, d) => {
        val wide = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
              .as("sum_price"))
        wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")),
          "metric", "metric_value")
          .orderBy("l_returnflag", "metric")
      },
      Some("""
WITH wide AS (
  SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, metric_value
FROM wide UNPIVOT (metric_value FOR metric IN (sum_qty, sum_price))
ORDER BY l_returnflag, metric""")),

    // A2 AVG group-by (views_p1.py:9-12); l_quantity is integral-valued
    // so the sum is exact and the avg deterministic across engines
    Q("a2_avg_groupby",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(avg(l_quantity), 6) AS avg_qty,
                     count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Beyond the reference's ∅-list: PIVOT — docs-per-source breakdown
    // by language (Spark pivot == conditional-count columns)
    Q("a9_pivot_counts",
      (s, d) => Tables.documents(s, d)
        .groupBy("lang")
        .pivot("source", Seq("src1", "src2", "src3"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("lang"),
      Some("""SELECT lang,
                     count(*) FILTER (source = 'src1') AS src1,
                     count(*) FILTER (source = 'src2') AS src2,
                     count(*) FILTER (source = 'src3') AS src3
              FROM documents GROUP BY lang ORDER BY lang""")),

    // Beyond the reference's ∅-list: ROLLUP — subtotal lattice over
    // (returnflag, linestatus); NULL markers ordered explicitly so both
    // engines agree (DuckDB defaults NULLS LAST on ASC, Spark FIRST)
    Q("a10_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY l_returnflag ASC NULLS FIRST,
                       l_linestatus ASC NULLS FIRST""")),

    // Beyond the reference's ∅-list: CUBE — the full grouping lattice
    Q("a12_cube",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
              ORDER BY o_orderstatus ASC NULLS FIRST,
                       o_orderpriority ASC NULLS FIRST""")),

    // Beyond the ∅-list: population variance — normally hash-unsafe
    // (float sum order varies across engines), made exact by DECIMAL
    // sums: values are 2dp, squares exact at 4dp, so sum and sum-of-
    // squares are order-independent integers scaled by 10^-4
    Q("a11_decimal_variance",
      (s, d) => {
        val v = col("value").cast("decimal(18,2)")
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(v).cast("double").as("s"),
            sum((v * v).cast("decimal(28,4)")).cast("double").as("ss"))
          .select(col("event_type"), col("n"),
            round((col("ss") - col("s") * col("s") / col("n")) / col("n"), 4)
              .as("var_pop"))
          .orderBy("event_type")
      },
      Some("""
SELECT event_type, n, round((ss - s * s / n) / n, 4) AS var_pop
FROM (SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
             CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) *
                           CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS ss
      FROM events GROUP BY event_type)
ORDER BY event_type""")),

    // A4 MIN within the top-k slice: the cutoff score per group
    // (datamart.py:32) — derived from the flagship ranked pairs
    Q("a4_min_in_topk",
      (s, d) => {
        val w = Window.partitionBy("target_id")
          .orderBy(col("sim").desc, col("source_id").asc)
        SimilarityPipeline.pairs(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= SimilarityPipeline.TopK)
          .groupBy("target_id")
          .agg(min("sim").as("cutoff_score"))
          .orderBy("target_id")
      },
      Some("""
WITH t AS (
  SELECT vec_id AS target_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings WHERE label = 0
), s AS (
  SELECT vec_id AS source_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings WHERE label <> 0
), p AS (
  SELECT t.target_id, s.source_id,
         round(list_sum(list_transform(range(1, len(t.e)+1), i -> t.e[i] * s.e[i])) / (t.nrm * s.nrm), 6) AS sim
  FROM t CROSS JOIN s WHERE t.target_id <> s.source_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY target_id ORDER BY sim DESC, source_id ASC) AS rn FROM p
)
SELECT target_id, min(sim) AS cutoff_score FROM r WHERE rn <= 10
GROUP BY target_id ORDER BY target_id""")),

    // A5 conditional count with float tolerance: rows tying the group max
    // (datamart.py:33-39; readme.MD:63)
    Q("a5_tie_count",
      (s, d) => {
        val w = Window.partitionBy("l_orderkey")
        Tables.lineitem(s, d)
          .withColumn("mx", max("l_quantity").over(w))
          .groupBy("l_orderkey")
          .agg(count(when(abs(col("l_quantity") - col("mx")) < 1e-9, 1))
            .as("tie_cnt"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey,
                     count(CASE WHEN abs(l_quantity - mx) < 1e-9 THEN 1 END) AS tie_cnt
              FROM (SELECT l_orderkey, l_quantity,
                           max(l_quantity) OVER (PARTITION BY l_orderkey) AS mx
                    FROM lineitem)
              GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // A6 dedup by key with a DETERMINISTIC survivor — row_number over an
    // explicit total order, not dropDuplicates (mpp.py:50; SURVEY §7.4)
    Q("a6_dedup_by_key",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC) AS rn
                FROM events)
              WHERE rn = 1 ORDER BY user_id""")),

    // A7 distinct union of two key roles (datamart.py:96-102)
    Q("a7_distinct_union",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.select(col("l_partkey").as("id"))
          .union(li.select(col("l_suppkey").as("id")))
          .distinct()
          .orderBy("id")
      },
      Some("""SELECT l_partkey AS id FROM lineitem
              UNION
              SELECT l_suppkey FROM lineitem
              ORDER BY id""")),

    // Exact discrete percentiles per group (beyond the reference's
    // ∅-list): the nearest-rank definition via row_number over a TOTAL
    // order (value, then event_id for ties) — engine-exact, unlike
    // interpolating percentile functions whose float arithmetic
    // differs across engines. One shuffle on the group key; at scale
    // approx_percentile is the sketch alternative when exactness isn't
    // required.
    Q("a13_percentiles",
      (s, d) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("value").asc, col("event_id").asc)
        val wAll = Window.partitionBy("event_type")
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(wAll))
          .groupBy("event_type")
          .agg(
            min(when(col("rn") === ceil(col("n") * 0.5), col("value"))).as("p50"),
            min(when(col("rn") === ceil(col("n") * 0.9), col("value"))).as("p90"),
            max("value").as("p100"))
          .orderBy("event_type")
      },
      Some("""
WITH r AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM events)
SELECT event_type,
       min(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN value END) AS p50,
       min(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN value END) AS p90,
       max(value) AS p100
FROM r GROUP BY event_type ORDER BY event_type""")),

    // Robust outlier detection via median / MAD (beyond §2 — the
    // data-quality gate that, unlike a18's z-score, a few huge
    // outliers cannot drag: mean and stddev move with the outlier,
    // the median and the median-absolute-deviation do not). All
    // arithmetic is exact integers: prices become cents (bigint), and
    // because the exact 0.5-quantile of integers is either a value or
    // a midpoint, carrying 2×median and 4×MAD as scaled bigints keeps
    // every comparison integral — `dev > 3·MAD` is `2·dev2 > 3·mad4`
    // with dev2 = |2c − med2|. The interpolating percentile IS safe
    // here (contrast a13's caveat) precisely because its inputs are
    // integers: a+(b−a)/2 is exact in doubles below 2^52, so both
    // engines agree bit-for-bit. Two grouped aggregates + two
    // broadcast-sized joins (one row per group); the per-row pass is
    // map-only, so at 100 TB this costs two shuffles on the group key.
    Q("a23_mad_outliers",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_returnflag").as("g"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("c"))
        val med = li.groupBy("g").agg(
          expr("CAST(round(2 * percentile(c, 0.5D)) AS BIGINT)").as("m2"))
        val dev = li.join(med, "g")
          .withColumn("dev2", abs(col("c") * 2 - col("m2")))
        val mad = dev.groupBy("g").agg(
          expr("CAST(round(2 * percentile(dev2, 0.5D)) AS BIGINT)").as("mad4"))
        dev.join(mad, "g").groupBy("g").agg(
            count(lit(1)).as("n"),
            max("m2").as("med2"),
            max("mad4").as("mad4"),
            sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L))
              .as("n_outliers"),
            max("dev2").as("max_dev2"))
          .orderBy("g")
      },
      Some("""
WITH li AS (SELECT l_returnflag AS g,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS c
            FROM lineitem),
med AS (SELECT g, CAST(round(2 * quantile_cont(c, 0.5)) AS BIGINT) AS m2
        FROM li GROUP BY g),
dev AS (SELECT li.g, c, m2, abs(2 * c - m2) AS dev2
        FROM li JOIN med ON li.g = med.g),
mad AS (SELECT g, CAST(round(2 * quantile_cont(dev2, 0.5)) AS BIGINT) AS mad4
        FROM dev GROUP BY g)
SELECT dev.g AS g, count(*) AS n, max(m2) AS med2, max(mad4) AS mad4,
       CAST(sum(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       max(dev2) AS max_dev2
FROM dev JOIN mad ON dev.g = mad.g
GROUP BY dev.g ORDER BY g"""))
  )
}
