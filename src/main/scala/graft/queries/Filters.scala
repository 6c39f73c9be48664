package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.2 — projections / filters / predicates (P1–P13).
  *
  * Every query is a declarative DataFrame program so Catalyst pushes the
  * predicate / projection into the parquet scan (verified in
  * PlanQualitySpec: PushedFilters + ReadSchema must show up in the
  * formatted plan). Each carries a DuckDB oracle twin and ends in a total
  * ORDER BY (SURVEY.md §5 determinism rules).
  */
object Filters {

  def qs: Seq[Q] = Seq(
    // P1 column projection pruned into the scan (compute_morgan.py:20-22)
    Q("p1_projection",
      (s, d) => Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_quantity""")),

    // P2 drop columns after deriving (mpp.py:94)
    Q("p2_drop_columns",
      (s, d) => Tables.orders(s, d)
        .drop("o_totalprice", "o_orderdate")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
              FROM orders ORDER BY o_orderkey""")),

    // P3 column rename (datamart.py:40)
    Q("p3_rename",
      (s, d) => Tables.customer(s, d)
        .withColumnRenamed("c_name", "customer_name")
        .withColumnRenamed("c_acctbal", "balance")
        .select("c_custkey", "customer_name", "balance")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name AS customer_name, c_acctbal AS balance
              FROM customer ORDER BY c_custkey""")),

    // P4 reindex: subset + reorder, dropping extras (tanimoto.py:77-78)
    Q("p4_reindex",
      (s, d) => Tables.part(s, d)
        .select("p_name", "p_partkey")
        .orderBy("p_partkey"),
      Some("SELECT p_name, p_partkey FROM part ORDER BY p_partkey")),

    // P5 literal column attach (tanimoto.py:136-137)
    Q("p5_literal_column",
      (s, d) => Tables.supplier(s, d)
        .withColumn("source_tag", lit("batch_2026"))
        .select("s_suppkey", "s_name", "source_tag")
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name, 'batch_2026' AS source_tag
              FROM supplier ORDER BY s_suppkey""")),

    // P6 range predicate, pushed to parquet row groups (compute_morgan.py:22)
    Q("p6_range_predicate",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_orderkey") >= 1000 && col("l_orderkey") < 2000)
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
              WHERE l_orderkey >= 1000 AND l_orderkey < 2000
              ORDER BY l_orderkey, l_linenumber, l_partkey""")),

    // P7 inequality filter between two columns (tanimoto.py:141-144)
    Q("p7_self_inequality",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_partkey") =!= col("l_suppkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
              FROM lineitem WHERE l_partkey <> l_suppkey
              ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""")),

    // P8 equality filter on a dimension attribute (datamart.py:166)
    Q("p8_equality_filter",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
              WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""")),

    // P9 NULL predicate on a nullable attribute (views_p1.py:40); the
    // nullable attr is derived deterministically (no nulls in testdata)
    Q("p9_null_predicate",
      (s, d) => Tables.documents(s, d)
        .withColumn("attr",
          when(col("source") === "src3", lit(null)).otherwise(col("n_chars")))
        .filter(col("attr").isNotNull)
        .select("doc_id", "attr")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, attr FROM (
                SELECT doc_id,
                       CASE WHEN source = 'src3' THEN NULL ELSE n_chars END AS attr
                FROM documents)
              WHERE attr IS NOT NULL ORDER BY doc_id""")),

    // P10 na.drop after a fallible derivation (mpp.py:78)
    Q("p10_dropna",
      (s, d) => Tables.events(s, d)
        .withColumn("v",
          when(col("value") < 50.0, lit(null)).otherwise(col("value")))
        .na.drop(Seq("v"))
        .select("event_id", "v")
        .orderBy("event_id"),
      Some("""SELECT event_id, v FROM (
                SELECT event_id,
                       CASE WHEN value < 50.0 THEN NULL ELSE value END AS v
                FROM events)
              WHERE v IS NOT NULL ORDER BY event_id""")),

    // P11 string-contains predicate (tanimoto.py:25, datamart.py:19)
    Q("p11_string_contains",
      (s, d) => Tables.part(s, d)
        .filter(col("p_name").contains("red"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
              WHERE contains(p_name, 'red') ORDER BY p_partkey""")),

    // P12 float-tolerance equality (datamart.py:33-38; readme.MD:63)
    Q("p12_float_tolerance",
      (s, d) => Tables.lineitem(s, d)
        .filter(abs(col("l_discount") - 0.05) < 1e-9)
        .select("l_orderkey", "l_linenumber", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_discount FROM lineitem
              WHERE abs(l_discount - 0.05) < 1e-9
              ORDER BY l_orderkey, l_linenumber, l_discount""")),

    // P13 case-insensitive column resolution (mpp.py:39-45);
    // spark.sql.caseSensitive=false resolves L_ORDERKEY -> l_orderkey
    Q("p13_case_insensitive",
      (s, d) => Tables.lineitem(s, d)
        .select(col("L_ORDERKEY").as("l_orderkey"),
          col("l_LineNumber").as("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT L_ORDERKEY AS l_orderkey, l_LineNumber AS l_linenumber
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // Beyond the reference's ∅-list: LIKE and RLIKE predicates on table
    // data (the reference only regexes in a scalar transform, F1)
    Q("p14_like_rlike",
      (s, d) => Tables.part(s, d)
        .filter(col("p_name").like("%bolt%") ||
          col("p_name").rlike("^(red|blue) (widget|gear)$"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
              WHERE p_name LIKE '%bolt%'
                 OR regexp_matches(p_name, '^(red|blue) (widget|gear)$')
              ORDER BY p_partkey"""))
  )
}
