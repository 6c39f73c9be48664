package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.3 — joins (J1–J9).
  *
  * Join-strategy notes for scale: small dims (nation, region, supplier)
  * broadcast via `autoBroadcastJoinThreshold`; fact–fact equi-joins
  * shuffle on the join key (sort-merge), which is the right plan at
  * 100 TB as long as both sides are pre-filtered/pruned first — every
  * query here filters before joining.
  */
object Joins {

  def qs: Seq[Q] = Seq(
    // J1 cross join + per-pair similarity kernel (tanimoto.py:124-147) —
    // the flagship covers the full pipeline; this entry is the bare
    // operator: BroadcastNestedLoopJoin with the small side broadcast
    Q("j1_crossjoin_similarity",
      (s, d) => SimilarityPipeline.pairs(s, d)
        .filter(col("target_id") < 100)
        .orderBy("target_id", "source_id"),
      Some("""
WITH t AS (
  SELECT vec_id AS target_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings WHERE label = 0
), s AS (
  SELECT vec_id AS source_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
  FROM embeddings WHERE label <> 0
)
SELECT t.target_id, s.source_id,
       round(list_sum(list_transform(range(1, len(t.e)+1), i -> t.e[i] * s.e[i])) / (t.nrm * s.nrm), 6) AS sim
FROM t CROSS JOIN s
WHERE t.target_id <> s.source_id AND t.target_id < 100
ORDER BY target_id, source_id""")),

    // J2 left equi-join recovering ids, unmatched rows kept (tanimoto.py:177-183)
    Q("j2_left_equijoin",
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left")
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, c_name, c_mktsegment
              FROM orders LEFT JOIN customer ON o_custkey = c_custkey
              ORDER BY o_orderkey""")),

    // J3 multi-way inner equi-join with dim filter (datamart.py:155-167)
    Q("j3_multiway_join",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_7")
        .select("l_orderkey", "l_linenumber", "c_custkey", "n_name")
        .orderBy("l_orderkey", "l_linenumber", "c_custkey"),
      Some("""SELECT l_orderkey, l_linenumber, c_custkey, n_name
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              WHERE n_name = 'NATION_7'
              ORDER BY l_orderkey, l_linenumber, c_custkey""")),

    // J4 fact -> dim inner join (views_p1.py:9-12)
    Q("j4_fact_dim_join",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select("l_orderkey", "l_linenumber", "p_brand", "p_type")
        .orderBy("l_orderkey", "l_linenumber", "p_brand", "p_type"),
      Some("""SELECT l_orderkey, l_linenumber, p_brand, p_type
              FROM lineitem JOIN part ON l_partkey = p_partkey
              ORDER BY l_orderkey, l_linenumber, p_brand, p_type""")),

    // J5 role-playing dimension: the same dim joined twice under two
    // roles (views_p1.py:22-26) — customer-nation vs supplier-nation
    Q("j5_roleplaying_dim",
      (s, d) => {
        val n = Tables.nation(s, d)
        val cn = n.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
        val sn = n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(cn, col("c_nationkey") === col("cnk"))
          .join(sn, col("s_nationkey") === col("snk"))
          .filter(col("cust_nation") =!= col("supp_nation"))
          .filter(col("l_orderkey") < 2000)
          .select("l_orderkey", "l_linenumber", "cust_nation", "supp_nation")
          .orderBy("l_orderkey", "l_linenumber", "cust_nation", "supp_nation")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                     cn.n_name AS cust_nation, sn.n_name AS supp_nation
              FROM lineitem
              JOIN orders    ON l_orderkey = o_orderkey
              JOIN customer  ON o_custkey = c_custkey
              JOIN supplier  ON l_suppkey = s_suppkey
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN nation sn ON s_nationkey = sn.n_nationkey
              WHERE cn.n_name <> sn.n_name AND l_orderkey < 2000
              ORDER BY l_orderkey, l_linenumber, cust_nation, supp_nation""")),

    // J6 anti-join on a composite key: new fact pairs minus pairs already
    // in the warehouse (datamart.py:59-80)
    Q("j6_anti_join_pairs",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val cut = "1998-06-01"
        val existing = li.filter(col("l_shipdate") < cut)
          .select("l_orderkey", "l_partkey").distinct()
        li.filter(col("l_shipdate") >= cut)
          .select("l_orderkey", "l_partkey", "l_linenumber")
          .join(existing, Seq("l_orderkey", "l_partkey"), "left_anti")
          .orderBy("l_orderkey", "l_partkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem a
              WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND NOT EXISTS (
                SELECT 1 FROM lineitem e
                WHERE e.l_shipdate < TIMESTAMP '1998-06-01'
                  AND e.l_orderkey = a.l_orderkey AND e.l_partkey = a.l_partkey)
              ORDER BY l_orderkey, l_partkey, l_linenumber""")),

    // J7 EXCEPT for new dim ids (datamart.py:86-103): fact-side ids
    // not already present in the (BUILDING-segment) dim slice
    Q("j7_except_new_ids",
      (s, d) => Tables.orders(s, d).select(col("o_custkey").as("id"))
        .except(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("id")))
        .orderBy("id"),
      Some("""SELECT o_custkey AS id FROM orders
              EXCEPT
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              ORDER BY id""")),

    // J8 incremental-ingest anti-join: input listing minus used set
    // (tanimoto.py:28-49) — event days stand in for file names
    Q("j8_incremental_listing",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
          .distinct()
        val used = days.filter(col("day") < "2024-01-15")
        days.join(used, Seq("day"), "left_anti").orderBy("day")
      },
      Some("""SELECT day FROM (SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day FROM events)
              WHERE day NOT IN (
                SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') FROM events
                WHERE CAST(ts AS DATE) < DATE '2024-01-15')
              ORDER BY day""")),

    // J9 existence skip-join: don't reprocess targets whose output
    // already exists (tanimoto.py:132-135) — 'F'-status orders stand in
    // for already-written sink files
    Q("j9_existence_skip",
      (s, d) => {
        val o = Tables.orders(s, d)
        val done = o.filter(col("o_orderstatus") === "F").select("o_orderkey")
        o.select("o_orderkey", "o_orderstatus", "o_orderpriority")
          .join(done, Seq("o_orderkey"), "left_anti")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
              WHERE o_orderstatus <> 'F' ORDER BY o_orderkey""")),

    // J10 salted skew join — the manual technique for a hot join key
    // when AQE can't see the skew (e.g. the skewed side is an
    // intermediate). The big side gets a per-row salt from an attribute
    // that is NOT the join key (here l_linenumber; production: a random
    // int — deterministic here so the DuckDB oracle stays hash-exact);
    // the small side is replicated once per salt value. Each hot key's
    // rows now land in R different shuffle partitions. Result set is
    // provably identical to the unsalted join — which is exactly what
    // the oracle (a plain join) checks.
    Q("j10_salted_skew_join",
      (s, d) => {
        val R = 4
        val big = Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .withColumn("salt", pmod(col("l_linenumber"), lit(R)))
        val small = Tables.orders(s, d)
          .select("o_orderkey", "o_totalprice")
          .withColumn("salt", explode(array((0 until R).map(lit): _*)))
        big.join(small,
            big("l_orderkey") === small("o_orderkey") &&
              big("salt") === small("salt"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              ORDER BY l_orderkey, l_linenumber""")),

    // J11 bucketed co-located join — both sides written bucketBy the
    // join key, so the sort-merge join consumes bucket files directly
    // with NO shuffle exchange on either side (asserted in
    // BucketedJoinSpec with broadcast disabled). At 100 TB this is the
    // technique for fact-fact joins repeated across runs: pay the
    // bucketed write once, skip the join shuffle every time after.
    Q("j11_bucketed_colocated_join",
      // Scratch.withDir materializes the joined result, then deletes the
      // bucket files — the catalog entries stay behind (dropped and
      // recreated by the next invocation or by the spec, which rebuilds
      // under its own scratch root before inspecting the plan).
      (s, d) => graft.Scratch.withDir(s, "bucketed")(out =>
        bucketedColocatedJoin(s, d, out)),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              ORDER BY l_orderkey, l_linenumber""")),

    // J12 as-of join — an operator Spark lacks natively, composed from
    // existing ops (union + ordered window with IGNORE NULLS) per the
    // composition-first preference: for each purchase event, the value
    // of the user's latest signup at-or-before it. One shuffle on
    // user_id; no range-explosion, no per-row subquery. The oracle is
    // DuckDB's NATIVE ASOF JOIN, so the composition is checked against
    // a first-class implementation.
    Q("j12_asof_join",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("ts").asc, col("is_purchase").asc, col("event_id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "signup"))
          .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
          .withColumn("asof_signup_value",
            last(when(col("event_type") === "signup", col("value")), ignoreNulls = true)
              .over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"),
            col("asof_signup_value"))
          .orderBy("event_id")
      },
      Some("""
SELECT p.event_id, p.user_id, p.value, s.value AS asof_signup_value
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id""")),

    // Banded range join — the classic interval-join acceleration: a
    // naive `value BETWEEN lo AND hi` join has no equi-key, so Spark
    // plans a BroadcastNestedLoopJoin (per-row interval scan; at scale,
    // |facts|×|tiers| comparisons). Bucketizing both sides by a fixed
    // band width turns it into an equi-join on bucket id: tiers
    // replicate to every band they overlap (a handful of rows), facts
    // compute one bucket each, and the residual lo<=v<hi filter runs
    // only within matching bands. PlanQualitySpec asserts the BNLJ is
    // gone. Same technique scales to time-interval and IP-range joins.
    Q("j13_banded_range_join",
      (s, d) => {
        import s.implicits._
        val band = 50L
        val tiers = Seq((1L, 0L, 50L), (2L, 50L, 120L), (3L, 120L, 200L),
          (4L, 200L, 350L), (5L, 350L, 500L)).toDF("tier_id", "lo", "hi")
        val tb = tiers.withColumn("bkt",
          explode(sequence(floor(col("lo") / band).cast("long"),
            floor((col("hi") - 1) / band).cast("long"))))
        Tables.events(s, d)
          .withColumn("bkt", floor(col("value") / band).cast("long"))
          .join(broadcast(tb), Seq("bkt"))
          .filter(col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy("tier_id")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy("tier_id")
      },
      Some("""
WITH t(tier_id, lo, hi) AS (VALUES (1, 0, 50), (2, 50, 120), (3, 120, 200),
                                   (4, 200, 350), (5, 350, 500))
SELECT t.tier_id::BIGINT AS tier_id, count(*) AS n,
       CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events e JOIN t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier_id ORDER BY tier_id""")),

    // Typed cogroup — KeyValueGroupedDataset.cogroup for per-key
    // reconciliation logic that wants BOTH sides' rows in hand (the
    // §2.10 typed surface beyond UDF/Aggregator). Each order key gets
    // its order row and all its line items together; totals accumulate
    // in BigDecimal so the per-group fold is order-independent and the
    // oracle's DECIMAL sum matches exactly. Relationally this is a
    // left join + group-by (the oracle states it that way); cogroup is
    // the escape hatch for when the per-key merge is genuinely
    // imperative — demonstrated on logic simple enough to verify.
    Q("j14_cogroup_reconcile",
      (s, d) => {
        import s.implicits._
        val orders = Tables.orders(s, d)
          .filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
        val items = Tables.lineitem(s, d)
          .filter(col("l_orderkey") % 50 === 0)
          .select(col("l_orderkey"), col("l_extendedprice")).as[(Long, Double)]
        orders.groupByKey(_._1).cogroup(items.groupByKey(_._1)) {
          (key, os, is) =>
            val order = os.toSeq.headOption
            if (order.isEmpty) Iterator.empty // item-only keys out of scope
            else {
              var n = 0L
              var total = BigDecimal(0)
              is.foreach { it => n += 1; total += BigDecimal(it._2) }
              Iterator((key, n, total.toDouble, order.get._2))
            }
        }.toDF("o_orderkey", "n_items", "items_total", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""
SELECT o.o_orderkey, count(l.l_orderkey) AS n_items,
       CAST(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS items_total,
       o.o_totalprice
FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey % 50 = 0
GROUP BY o.o_orderkey, o.o_totalprice
ORDER BY o.o_orderkey""")),

    // Null-safe equi-join (beyond §2): <=> treats NULL as a
    // legitimate, joinable key value — the lookup-with-missing-bucket
    // shape (rows whose dimension key is absent match the dim's
    // explicit "missing" row instead of dropping out as a plain
    // equi-join would). Catalyst plans <=> as a hash join exactly like
    // =, so the null bucket shuffles/broadcasts normally — no
    // degeneration to a nested loop (plan-asserted).
    Q("j15_null_safe_join",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .withColumn("src_key",
            when(col("source") === "src3", lit(null)).otherwise(col("source")))
        val dim = ((0 to 19).filter(_ != 3).map(i => (s"src$i", s"tier_${i % 3}"))
          :+ (null.asInstanceOf[String], "tier_missing"))
          .toDF("src_key", "tier")
        docs.join(dim, docs("src_key") <=> dim("src_key"))
          .groupBy("tier").agg(count(lit(1)).as("n_docs"))
          .orderBy("tier")
      },
      Some("""
WITH docs AS (SELECT CASE WHEN source = 'src3' THEN NULL ELSE source END
                       AS src_key
              FROM documents),
dim AS (
  SELECT 'src' || CAST(i AS VARCHAR) AS src_key,
         'tier_' || CAST(i % 3 AS VARCHAR) AS tier
  FROM UNNEST(range(0, 20)) AS t(i) WHERE i <> 3
  UNION ALL SELECT NULL, 'tier_missing')
SELECT tier, count(*) AS n_docs
FROM docs JOIN dim ON docs.src_key IS NOT DISTINCT FROM dim.src_key
GROUP BY tier ORDER BY tier""")),

    // Fuzzy string join (beyond §2 — entity resolution): probe names
    // carry a deterministic typo (4th char deleted); matching is
    // BLOCK on a cheap equi-key (first two chars), then VERIFY with
    // levenshtein inside the block. The blocking key turns the O(N·M)
    // all-pairs edit-distance into an equi-join over small buckets —
    // the only way edit distance survives 100 TB — and the verify is
    // a codegen'd per-pair kernel, same discipline as the LSH
    // dedup family (candidates from an index, exactness from a
    // verifier).
    Q("j16_fuzzy_match_join",
      (s, d) => {
        val parts = Tables.part(s, d)
          .select(col("p_partkey"), col("p_name")).distinct()
        val probes = parts.filter(col("p_partkey") % 97 === 0)
          .select(col("p_partkey").as("probe_id"),
            concat(substring(col("p_name"), 1, 3),
              substring(col("p_name"), 5, 1000)).as("probe_name"))
        val blockedP = probes
          .withColumn("blk", substring(col("probe_name"), 1, 2))
        val blockedC = parts
          .withColumn("blk", substring(col("p_name"), 1, 2))
        blockedP.join(blockedC, "blk")
          .withColumn("lev",
            levenshtein(col("probe_name"), col("p_name")).cast("long"))
          .filter(col("lev") <= 1)
          .select("probe_id", "probe_name", "p_partkey", "p_name", "lev")
          .orderBy("probe_id", "p_partkey")
      },
      Some("""
WITH parts AS (SELECT DISTINCT p_partkey, p_name FROM part),
probes AS (
  SELECT p_partkey AS probe_id,
         substr(p_name, 1, 3) || substr(p_name, 5) AS probe_name
  FROM parts WHERE p_partkey % 97 = 0)
SELECT probe_id, probe_name, p_partkey, p_name,
       CAST(levenshtein(probe_name, p_name) AS BIGINT) AS lev
FROM probes JOIN parts ON substr(probe_name, 1, 2) = substr(p_name, 1, 2)
WHERE levenshtein(probe_name, p_name) <= 1
ORDER BY probe_id, p_partkey""")),

    // J17 full-outer reconciliation — the two-ledger audit shape: the
    // same per-customer totals derived from two systems (ledger B is
    // missing every 97th order — the simulated sync gap), FULL OUTER
    // joined and classified match / left_only / right_only / mismatch.
    // Exact DECIMAL totals make equality well-defined; both sides
    // hash-partition on the join key (same-key shuffles, AQE-coalesced)
    // and the classification is row-local — the shape scales as one
    // co-partitioned join whatever the ledger sizes.
    Q("j17_full_outer_reconcile",
      (s, d) => {
        def ledger(src: DataFrame) = src
          .groupBy("o_custkey")
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total"),
            count(lit(1)).as("n_orders"))
        val orders = Tables.orders(s, d)
        val a = ledger(orders)
          .select(col("o_custkey").as("cust_a"), col("total").as("total_a"),
            col("n_orders").as("n_a"))
        val b = ledger(orders.filter(col("o_orderkey") % 97 =!= 0))
          .select(col("o_custkey").as("cust_b"), col("total").as("total_b"),
            col("n_orders").as("n_b"))
        a.join(b, col("cust_a") === col("cust_b"), "full_outer")
          .select(
            coalesce(col("cust_a"), col("cust_b")).as("custkey"),
            when(col("cust_b").isNull, "left_only")
              .when(col("cust_a").isNull, "right_only")
              .when(col("total_a") === col("total_b"), "match")
              .otherwise("mismatch").as("status"),
            col("total_a"), col("total_b"))
          .groupBy("status")
          .agg(count(lit(1)).as("n"),
            // stay DECIMAL through the sum (order-independent), one
            // cast at the end — the repo's money convention
            sum(coalesce(col("total_a"), lit(0).cast("decimal(18,2)")))
              .cast("double").as("sum_a"),
            sum(coalesce(col("total_b"), lit(0).cast("decimal(18,2)")))
              .cast("double").as("sum_b"))
          .orderBy("status")
      },
      Some("""
WITH a AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
                  count(*) AS n FROM orders GROUP BY o_custkey),
b AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
             count(*) AS n FROM orders WHERE o_orderkey % 97 <> 0
      GROUP BY o_custkey),
j AS (SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
             CASE WHEN b.o_custkey IS NULL THEN 'left_only'
                  WHEN a.o_custkey IS NULL THEN 'right_only'
                  WHEN a.total = b.total THEN 'match'
                  ELSE 'mismatch' END AS status,
             a.total AS total_a, b.total AS total_b
      FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
SELECT status, count(*) AS n,
       CAST(sum(coalesce(total_a, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE) AS sum_a,
       CAST(sum(coalesce(total_b, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE) AS sum_b
FROM j GROUP BY status ORDER BY status""")),

    // Runtime-filter join reduction: the build side's key set is
    // compressed to Bloom bits (k=3, m=4096 — a ≤m-row broadcast, the
    // curation_bloom_decontam trick aimed at a join) and the probe
    // side is prefiltered BEFORE its shuffle — false positives are
    // swept out by the exact join that follows, so the answer is
    // IDENTICAL to the plain join, which is exactly what the oracle
    // runs (no Bloom on the DuckDB side: the filter is a plan
    // optimization, not a semantics change — the hash gate proves it).
    // This is Spark's own runtime-filter/DPP idea made explicit and
    // portable: at 100 TB the probe shuffle carries only rows whose
    // key survives the bits, a ~selectivity-sized fraction, and the
    // bits build is one distinct + broadcast off the (already small)
    // filtered build side. `BloomJoinSpec` pins the mechanics: the
    // prefilter passes every true match and actually shrinks the
    // probe side.
    Q("j18_bloom_filter_join",
      (s, d) => {
        val m = 4096L
        val seeds = 0 until 3
        def bitsOf(c: Column) = seeds.map(k =>
          pmod(Sketches.h60(concat(lit(s"bj${k}_"), c)), lit(m)))
        val cust = Tables.customer(s, d)
          .filter(col("c_acctbal") > 9000)
          .select("c_custkey", "c_nationkey")
        val bits = cust
          .select(explode(array(bitsOf(col("c_custkey")): _*)).as("bit"))
          .distinct()
        val probes = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            explode(array(seeds.zip(bitsOf(col("o_custkey"))).map {
              case (k, b) => struct(lit(k).as("k"), b.as("bit"))
            }: _*)).as("kb"))
        val reduced = probes
          .join(broadcast(bits), probes("kb.bit") === bits("bit"), "left_semi")
          .groupBy("o_orderkey", "o_custkey", "o_totalprice")
          .agg(count(lit(1)).as("n_set"))
          .filter(col("n_set") === seeds.size)
        reduced
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("revenue"))
          .orderBy("c_nationkey")
      },
      Some("""
SELECT c_nationkey, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_acctbal > 9000
GROUP BY c_nationkey ORDER BY c_nationkey"""))
  )

  /** J11's body: catalog-managed cleanup (DROP the entries), then
    * recreate both sides as EXTERNAL bucketed tables under `out` and
    * return the co-located join — sort-merge with NO shuffle exchange on
    * either side (BucketedJoinSpec asserts it with broadcast disabled).
    * Shared with the spec so it can keep the bucket files alive under
    * its own scratch root while it inspects the plan.
    */
  private[graft] def bucketedColocatedJoin(
      s: org.apache.spark.sql.SparkSession, d: String, out: String): org.apache.spark.sql.DataFrame = {
    Seq("graft_orders_bucketed", "graft_lineitem_bucketed")
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").format("parquet")
      .option("path", s"$out/orders")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_orders_bucketed")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .write.mode("overwrite").format("parquet")
      .option("path", s"$out/lineitem")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_lineitem_bucketed")
    s.table("graft_lineitem_bucketed")
      .join(s.table("graft_orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
      .orderBy("l_orderkey", "l_linenumber")
  }
}
