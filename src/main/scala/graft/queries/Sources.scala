package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.1 — scans / sources / sinks (S1–S6, K1–K6, M1).
  *
  * Sink operators (K*) are exercised as write-then-read-back round trips
  * into a per-invocation temp dir, so the query is still a pure function
  * of the testdata and the oracle runs against the original tables.
  */
object Sources {

  def qs: Seq[Q] = Seq(
    // S1 warehouse table scan, full row materialization (db_interact.py:115-130)
    Q("s1_warehouse_scan",
      (s, d) => Tables.customer(s, d).orderBy("c_custkey"),
      Some("SELECT * FROM customer ORDER BY c_custkey")),

    // S2 range-chunked scan — the chunk predicate is pushed into the
    // parquet scan (compute_morgan.py:11-44); one chunk shown, chunking
    // itself is native partition parallelism in Spark
    Q("s2_range_chunked_scan",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_orderkey") >= 5000 && col("l_orderkey") < 6000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
              WHERE l_orderkey >= 5000 AND l_orderkey < 6000
              ORDER BY l_orderkey, l_linenumber, l_extendedprice""")),

    // S3 bronze materialization: extract -> sink -> re-scan (db_interact.py:68-78)
    Q("s3_bronze_materialize",
      (s, d) => graft.Scratch.withDir(s, "bronze") { out =>
        Tables.orders(s, d).write.mode("overwrite").parquet(s"$out/orders")
        s.read.parquet(s"$out/orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
              FROM orders ORDER BY o_orderkey""")),

    // S4 CSV source: explicit schema, header, PERMISSIVE bad-line mode,
    // encoding option (S3_interact.py:78-96)
    Q("s4_csv_roundtrip",
      (s, d) => graft.Scratch.withDir(s, "csv") { out =>
        val region = Tables.region(s, d)
        region.write.mode("overwrite").option("header", "true").csv(s"$out/region")
        s.read.schema(region.schema)
          .option("header", "true").option("mode", "PERMISSIVE")
          .option("encoding", "UTF-8")
          .csv(s"$out/region")
          .orderBy("r_regionkey")
      },
      Some("SELECT * FROM region ORDER BY r_regionkey")),

    // S4b CSV encoding fallback + bad-line drop — the hard parts of the
    // reference's CSV ingest (S3_interact.py:88-96): try utf-8 first, on
    // decode failure retry cp1252, and warn-drop malformed lines. The
    // fixture carries cp1252 bytes (0xE9/0xEF — invalid UTF-8 lead
    // sequences) and one row that cannot parse against the schema; the
    // fallback probe detects the U+FFFD replacement chars a UTF-8 decode
    // produces and re-reads with windows-1252, and PERMISSIVE mode parks
    // the malformed row in the corrupt-record column, where it is
    // dropped (the reference logs-and-drops bad lines).
    Q("s4b_csv_encoding_fallback",
      (s, d) => graft.Scratch.withDir(s, "csvenc") { out =>
        import org.apache.spark.sql.types._
        val bytes = "id,name,val\n1,café,10\n2,naïve,20\nnot_parseable\n"
          .getBytes(java.nio.charset.Charset.forName("windows-1252"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/data.csv"), bytes)
        val schema = StructType(Seq(
          StructField("id", IntegerType), StructField("name", StringType),
          StructField("val", IntegerType), StructField("_corrupt", StringType)))
        // Spark 4 restricts CSV charsets to a safe list by default;
        // cp1252 (the reference's fallback encoding) needs the legacy
        // full-JVM-charset switch
        s.conf.set("spark.sql.legacy.javaCharsets", "true")
        def read(enc: String) = s.read.schema(schema)
          .option("header", "true").option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .option("encoding", enc).csv(out)
        val bad = read("UTF-8")
          .filter(col("name").contains("�")).limit(1).count() > 0
        // persist the parsed rows before touching _corrupt: Spark
        // (correctly) refuses plans whose pruned scan schema collapses
        // to only the internal corrupt-record column, e.g. a count()
        // over the corrupt-filtered read; the block is released before
        // returning (Caching.releasing) so it cannot leak
        val chosen =
          (if (bad) read("windows-1252") else read("UTF-8")).persist()
        graft.Caching.releasing(s, chosen)(
          chosen.filter(col("_corrupt").isNull)
            .select("id", "name", "val").orderBy("id"))
      },
      Some("SELECT * FROM (VALUES (1, 'café', 10), (2, 'naïve', 20)) " +
        "AS t(id, name, val) ORDER BY id")),

    // S5 parquet source (S3_interact.py:98-109)
    Q("s5_parquet_source",
      (s, d) => Tables.part(s, d).orderBy("p_partkey"),
      Some("SELECT * FROM part ORDER BY p_partkey")),

    // S7 true JDBC partitioned source — the reference's core warehouse
    // I/O is a JDBC database: arbitrary-SELECT scans
    // (db_interact.py:115-130) and hand-rolled range-chunked extraction
    // (compute_morgan.py:11-44, `WHERE molregno >= lo AND < hi` in a
    // loop). Spark's JDBC source does the same range split natively:
    // partitionColumn/lowerBound/upperBound/numPartitions issues one
    // bounded query per partition, in parallel. Demonstrated end-to-end
    // against embedded Derby (ships with the Spark distribution): load
    // the table over JDBC, read it back 4-way range-partitioned
    // (JdbcSourceSpec asserts the partitioning), compare to the same
    // rows from parquet via the oracle.
    Q("s7_jdbc_partitioned_source",
      (s, d) => {
        // keep Derby's derby.log inside a scratch dir, not the working
        // dir; the dir must outlive the query (the embedded engine keeps
        // the log open), so it is deleted at JVM exit, not eagerly
        if (System.getProperty("derby.system.home") == null)
          System.setProperty("derby.system.home", graft.Scratch.jvmDir("derby"))
        val url = "jdbc:derby:memory:graft_" +
          java.util.UUID.randomUUID().toString.take(8) + ";create=true"
        val driver = "org.apache.derby.jdbc.EmbeddedDriver"
        val src = Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        src.write.format("jdbc")
          .option("url", url).option("driver", driver)
          .option("dbtable", "customer_jdbc")
          .mode("overwrite").save()
        val bounds = src.agg(min("c_custkey"), max("c_custkey")).head()
        s.read.format("jdbc")
          .option("url", url).option("driver", driver)
          .option("dbtable", "customer_jdbc")
          .option("partitionColumn", "c_custkey")
          .option("lowerBound", bounds.getLong(0))
          .option("upperBound", bounds.getLong(1) + 1)
          .option("numPartitions", 4)
          .load()
          // strip the JDBC client-type field metadata so the result
          // schema is identical to the parquet-sourced one
          .select(src.columns.map(c =>
            col(c).as(c, org.apache.spark.sql.types.Metadata.empty)): _*)
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey, c_acctbal
              FROM customer ORDER BY c_custkey""")),

    // S6 directory-listing source with glob filter (S3_interact.py:34-38)
    Q("s6_glob_source",
      (s, d) => s.read.parquet(s"$d/nat*.parquet").orderBy("n_nationkey"),
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // S8 schema evolution across parquet batches — the warehouse
    // reality every long-lived ingest hits: a later batch grew a
    // column. mergeSchema=true unifies the footer schemas at read time
    // and back-fills the missing column with NULL for old batches —
    // no rewrite of historical data (at 100 TB, rewriting history for
    // a new column is not an option). Spark merges footers only when
    // asked (it is a read-option, not a default, because footer
    // merging lists every file's footer).
    Q("s8_schema_evolution",
      (s, d) => graft.Scratch.withDir(s, "schevo") { out =>
        val o = Tables.orders(s, d)
        o.filter(col("o_orderkey") < 4000)
          .select("o_orderkey", "o_custkey")
          .write.parquet(s"$out/t/b1") // old batch: narrow schema
        o.filter(col("o_orderkey") >= 4000 && col("o_orderkey") < 8000)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .write.parquet(s"$out/t/b2") // new batch: schema grew
        s.read.option("mergeSchema", "true").parquet(s"$out/t/b1", s"$out/t/b2")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""
SELECT o_orderkey, o_custkey, NULL::DOUBLE AS o_totalprice FROM orders
WHERE o_orderkey < 4000
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_orderkey >= 4000 AND o_orderkey < 8000
ORDER BY o_orderkey""")),

    // K1 CSV sink, append mode (compute_morgan.py:17-46)
    Q("k1_csv_append_sink",
      (s, d) => graft.Scratch.withDir(s, "csvsink") { out =>
        val o = Tables.orders(s, d)
          .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        o.filter(col("o_orderstatus") === "F")
          .write.mode("overwrite").option("header", "true").csv(s"$out/o")
        o.filter(col("o_orderstatus") === "O")
          .write.mode("append").option("header", "true").csv(s"$out/o")
        s.read.schema(o.schema).option("header", "true").csv(s"$out/o")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
              WHERE o_orderstatus IN ('F', 'O') ORDER BY o_orderkey""")),

    // K2 parquet sink partitioned by group — partition dirs replace the
    // reference's per-target file naming (S3_interact.py:56-70,
    // tanimoto.py:132). At cluster scale this is the layout that lets a
    // reader prune to one group without listing others.
    Q("k2_partitioned_sink",
      (s, d) => graft.Scratch.withDir(s, "partsink") { out =>
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .write.mode("overwrite").partitionBy("l_returnflag")
          .parquet(s"$out/li")
        s.read.parquet(s"$out/li")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""")),

    // K3 warehouse sink, replace vs append modes (db_interact.py:87-97)
    Q("k3_sink_modes",
      (s, d) => graft.Scratch.withDir(s, "modes") { out =>
        val o = Tables.orders(s, d)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        o.filter(col("o_orderstatus") === "F")
          .write.mode("overwrite").parquet(s"$out/t")
        o.filter(col("o_orderstatus") === "O")
          .write.mode("append").parquet(s"$out/t")
        s.read.parquet(s"$out/t").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
              WHERE o_orderstatus IN ('F', 'O') ORDER BY o_orderkey""")),

    // K4 insert-select with conflict skip: uniqueness is enforced by an
    // anti-join before append, Spark-side (db_interact.py:150-166,
    // datamart.py:155-168) — result = the rows actually inserted
    Q("k4_insert_select_conflict_skip",
      (s, d) => {
        val c = Tables.customer(s, d)
        val existing = c.filter(col("c_custkey") % 3 === 0)
          .select("c_custkey")
        c.select("c_custkey", "c_name", "c_nationkey")
          .join(existing, Seq("c_custkey"), "left_anti")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
              WHERE NOT EXISTS (
                SELECT 1 FROM customer e
                WHERE e.c_custkey % 3 = 0 AND e.c_custkey = customer.c_custkey)
              ORDER BY c_custkey""")),

    // K5 DDL: CREATE TABLE IF NOT EXISTS -> temp view + catalog
    // (datamart.py:108-145); constraints become engine-side dedup (K4)
    Q("k5_create_if_not_exists",
      (s, d) => {
        Tables.documents(s, d).createOrReplaceTempView("bronze_documents")
        if (!s.catalog.tableExists("silver_dim_documents")) {
          s.sql("""CREATE OR REPLACE TEMP VIEW silver_dim_documents AS
                   SELECT doc_id, lang, source, n_chars FROM bronze_documents""")
        }
        s.table("silver_dim_documents").orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, n_chars FROM documents
              ORDER BY doc_id""")),

    // K6 view sink: CREATE OR REPLACE VIEW (views_p1.py:3-43)
    Q("k6_view_sink",
      (s, d) => {
        Tables.documents(s, d).createOrReplaceTempView("k6_documents")
        s.sql("""CREATE OR REPLACE TEMP VIEW k6_lang_counts AS
                 SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
                 FROM k6_documents GROUP BY lang""")
        s.table("k6_lang_counts").orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars
              FROM documents GROUP BY lang ORDER BY lang""")),

    // K7 quarantine sink — the dead-letter half of the s4b ingest: good
    // rows land in the main sink, malformed raw lines land in a
    // QUARANTINE sink (for replay/debugging) instead of being silently
    // dropped; the batch report counts both. At scale the quarantine is
    // just another partitioned append — bad data never blocks the
    // pipeline and never disappears.
    // K8 snapshot-versioned sink with time travel (beyond §2 — the
    // Iceberg/Delta snapshot pattern on plain parquet): data files are
    // IMMUTABLE; each version is a manifest listing its member files;
    // an append publishes new files plus a manifest that references
    // the old files — never rewrites them — and flips the _LATEST
    // pointer as the last, atomic step. Readers resolve
    // pointer → manifest → file list, so "as of v1" and "latest" are
    // both O(manifest) metadata reads. At 100 TB this is the only
    // sane mutation model: appends cost O(delta), time travel costs
    // nothing extra, and a crashed publish leaves _LATEST untouched
    // (the half-written version is invisible).
    Q("k8_snapshot_versioned_sink",
      (s, d) => graft.Scratch.withDir(s, "snap") { root =>
        import java.nio.file.{Files, Paths}
        import scala.jdk.CollectionConverters._
        val sup = Tables.supplier(s, d)
        def publish(df: DataFrame, v: Int, carry: Seq[String]): Unit = {
          val dataDir = s"$root/data_v$v"
          df.write.mode("overwrite").parquet(dataDir)
          // Files.list holds a directory handle until closed
          val ls = Files.list(Paths.get(dataDir))
          val mine =
            try ls.iterator().asScala
              .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
            finally ls.close()
          Files.write(Paths.get(s"$root/manifest_v$v.txt"),
            (carry ++ mine).mkString("\n").getBytes)
          Files.write(Paths.get(s"$root/_LATEST"), v.toString.getBytes)
        }
        def manifest(v: Int): Seq[String] =
          Files.readString(Paths.get(s"$root/manifest_v$v.txt"))
            .split("\n").toSeq
        def readVersion(v: Int): DataFrame =
          s.read.parquet(manifest(v): _*)
        // v1: even suppliers; v2: append the odd ones (v1 files carried
        // by reference into v2's manifest, not rewritten)
        publish(sup.filter(col("s_suppkey") % 2 === 0), 1, Nil)
        publish(sup.filter(col("s_suppkey") % 2 === 1), 2, manifest(1))
        val latest = Files.readString(Paths.get(s"$root/_LATEST")).trim.toInt
        def summarize(tag: String, df: DataFrame): DataFrame =
          df.agg(count(lit(1)).as("n_rows"),
            sum(col("s_acctbal").cast("decimal(18,2)")).cast("double")
              .as("bal_sum"))
            .select(lit(tag).as("snapshot"), col("n_rows"), col("bal_sum"))
        summarize("v1_asof", readVersion(1))
          .union(summarize("v2_asof", readVersion(2)))
          .union(summarize("latest", readVersion(latest)))
          .orderBy("snapshot")
      },
      Some("""
SELECT 'v1_asof' AS snapshot, count(*) AS n_rows,
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
FROM supplier WHERE s_suppkey % 2 = 0
UNION ALL
SELECT 'v2_asof', count(*),
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
FROM supplier
UNION ALL
SELECT 'latest', count(*),
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
FROM supplier
ORDER BY snapshot""")),

    Q("k7_quarantine_sink",
      (s, d) => graft.Scratch.withDir(s, "quarantine") { out =>
        import org.apache.spark.sql.types._
        import s.implicits._
        val bytes = "id,name,val\n1,alpha,10\n2,beta,20\nnot,parseable,x\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/data.csv"), bytes)
        val schema = StructType(Seq(
          StructField("id", IntegerType), StructField("name", StringType),
          StructField("val", IntegerType), StructField("_corrupt", StringType)))
        val parsed = s.read.schema(schema)
          .option("header", "true").option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(s"$out/data.csv").persist()
        parsed.filter(col("_corrupt").isNull)
          .select("id", "name", "val")
          .write.mode("overwrite").parquet(s"$out/good")
        parsed.filter(col("_corrupt").isNotNull)
          .select(col("_corrupt").as("raw_line"))
          .write.mode("overwrite").parquet(s"$out/quarantine")
        parsed.unpersist(false)
        val good = s.read.parquet(s"$out/good")
        val quar = s.read.parquet(s"$out/quarantine")
        good.select(lit("good").as("sink"), col("id").cast("long").as("rec"))
          .union(quar.select(lit("quarantine").as("sink"),
            length(col("raw_line")).cast("long").as("rec")))
          .groupBy("sink").agg(count(lit(1)).as("n"), sum("rec").as("checksum"))
          .orderBy("sink")
      },
      Some("""
SELECT sink, CAST(n AS BIGINT) AS n, CAST(checksum AS BIGINT) AS checksum
FROM (VALUES ('good', 2, 3), ('quarantine', 1, 15))
AS t(sink, n, checksum) ORDER BY sink""")),

    // M2 column-existence probe — the schema-introspection twin of M1
    // (the reference probes information_schema before ALTERs,
    // db_interact.py:99-113); Spark answers from the DataFrame schema,
    // no catalog round-trip.
    Q("m2_column_probe",
      (s, d) => {
        import s.implicits._
        val cols = Tables.customer(s, d).columns.toSet
        Seq("c_custkey", "c_mktsegment", "c_no_such_col")
          .map(c => (c, cols.contains(c)))
          .toDF("col", "present").orderBy("col")
      },
      Some("""
SELECT * FROM (VALUES ('c_custkey', true), ('c_mktsegment', true),
                      ('c_no_such_col', false))
AS t(col, present) ORDER BY col""")),

    // K9 file-sizing sink (beyond §2): the small-files problem is the
    // dominant operational failure of 100 TB parquet lakes (every file
    // is a task + a NameNode/listing entry + a row-group header).
    // maxRecordsPerFile bounds file size from above WITHIN a task;
    // repartition bounds task count — together they pin the output
    // layout deterministically: 1 task × ceil(9912/2000) = 5 files.
    // The read-back aggregates file-level row counts via the
    // input_file_name metadata column — layout as data, oracle-checked.
    Q("k9_file_sizing_sink",
      (s, d) => graft.Scratch.withDir(s, "filesize") { out =>
        Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "A")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .repartition(1)
          .sortWithinPartitions("l_orderkey", "l_linenumber")
          .write.mode("overwrite")
          .option("maxRecordsPerFile", 2000)
          .parquet(s"$out/li")
        val back = s.read.parquet(s"$out/li")
        back
          .groupBy(input_file_name().as("f"))
          .agg(count(lit(1)).as("rows_in_file"))
          .groupBy("rows_in_file")
          .agg(count(lit(1)).cast("long").as("n_files"))
          .orderBy("rows_in_file")
      },
      Some("""
WITH n AS (SELECT count(*) AS total FROM lineitem WHERE l_returnflag = 'A')
SELECT CAST(CASE WHEN i < total // 2000 THEN 2000 ELSE total % 2000 END AS BIGINT)
         AS rows_in_file,
       CAST(count(*) AS BIGINT) AS n_files
FROM n, UNNEST(range(0, CAST(ceil(total / 2000.0) AS BIGINT))) AS t(i)
GROUP BY 1 ORDER BY rows_in_file""")),

    // M3 column statistics — the ANALYZE TABLE surface (beyond §2):
    // count / distinct / min / max per key column, the numbers a
    // cost-based optimizer (and a human sizing a join) reads first.
    // One pass over the fact table, all stats in a single aggregate;
    // at 100 TB swap countDistinct for approx_count_distinct and the
    // plan is unchanged.
    Q("m3_column_stats",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
        def statsOf(c: String) = li.agg(
          count(col(c)).cast("long").as("n_nonnull"),
          countDistinct(col(c)).as("ndv"),
          min(col(c)).cast("double").as("min_v"),
          max(col(c)).cast("double").as("max_v"))
          .select(lit(c).as("col"), col("n_nonnull"), col("ndv"),
            col("min_v"), col("max_v"))
        statsOf("l_orderkey")
          .union(statsOf("l_partkey"))
          .union(statsOf("l_quantity"))
          .orderBy("col")
      },
      Some("""
SELECT col, n_nonnull, ndv, min_v, max_v FROM (
  SELECT 'l_orderkey' AS col, count(l_orderkey) AS n_nonnull,
         count(DISTINCT l_orderkey) AS ndv,
         CAST(min(l_orderkey) AS DOUBLE) AS min_v,
         CAST(max(l_orderkey) AS DOUBLE) AS max_v FROM lineitem
  UNION ALL
  SELECT 'l_partkey', count(l_partkey), count(DISTINCT l_partkey),
         CAST(min(l_partkey) AS DOUBLE), CAST(max(l_partkey) AS DOUBLE)
  FROM lineitem
  UNION ALL
  SELECT 'l_quantity', count(l_quantity), count(DISTINCT l_quantity),
         CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE)
  FROM lineitem)
ORDER BY col""")),

    // M4 constraint audit — the dbt-test / data-contract surface
    // (beyond §2): uniqueness, referential integrity, null rate, and
    // range checks emitted as ONE violation-count report. Each check
    // is a scan or an anti join on the key it audits — the shapes a
    // nightly contract run executes; zero violations is itself the
    // assertion the testdata must pass.
    Q("m4_constraint_audit",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val li = Tables.lineitem(s, d)
        val dupPk = orders.groupBy("o_orderkey")
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(count(lit(1)).as("violations"))
          .select(lit("orders_pk_unique").as("chk"), col("violations"))
        val orphanFk = li.join(orders, li("l_orderkey") === orders("o_orderkey"),
          "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit("lineitem_orderkey_fk").as("chk"), col("violations"))
        val nullCheck = cust
          .agg(count(when(col("c_name").isNull, 1)).as("violations"))
          .select(lit("customer_name_not_null").as("chk"), col("violations"))
        val rangeCheck = li
          .agg(count(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1))
            .as("violations"))
          .select(lit("lineitem_discount_range").as("chk"), col("violations"))
        dupPk.union(orphanFk).union(nullCheck).union(rangeCheck)
          .orderBy("chk")
      },
      Some("""
SELECT * FROM (
  SELECT 'orders_pk_unique' AS chk, count(*) AS violations
  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
  UNION ALL
  SELECT 'lineitem_orderkey_fk', count(*)
  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  UNION ALL
  SELECT 'customer_name_not_null', count(*) FROM customer WHERE c_name IS NULL
  UNION ALL
  SELECT 'lineitem_discount_range', count(*)
  FROM lineitem WHERE l_discount < 0.0 OR l_discount > 1.0)
ORDER BY chk""")),

    // M5 join-key skew report (beyond §2): the diagnostic that decides
    // WHEN to reach for j10's salting — per candidate join key, the
    // hottest key's share and the max/avg frequency ratio. One
    // aggregate per key column over the fact table; a ratio ≫ 1 says
    // a plain hash join will strand one reducer with the hot key's
    // entire partition (AQE skew-split or salting territory).
    Q("m5_skew_report",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        def skewOf(c: String) = {
          val freq = li.groupBy(col(c).as("k"))
            .agg(count(lit(1)).as("f"))
          freq.agg(
            count(lit(1)).as("n_keys"),
            max("f").as("max_f"),
            sum("f").as("total"))
            .select(lit(c).as("key_col"), col("n_keys"), col("max_f"),
              round(col("max_f") / (col("total") / col("n_keys")), 4)
                .as("skew_ratio"),
              round(col("max_f") / col("total"), 6).as("hot_share"))
        }
        skewOf("l_orderkey").union(skewOf("l_partkey"))
          .union(skewOf("l_suppkey")).union(skewOf("l_returnflag"))
          .orderBy("key_col")
      },
      Some("""
WITH f AS (
  SELECT 'l_orderkey' AS key_col, count(*) AS f
  FROM lineitem GROUP BY l_orderkey
  UNION ALL
  SELECT 'l_partkey', count(*) FROM lineitem GROUP BY l_partkey
  UNION ALL
  SELECT 'l_suppkey', count(*) FROM lineitem GROUP BY l_suppkey
  UNION ALL
  SELECT 'l_returnflag', count(*) FROM lineitem GROUP BY l_returnflag)
SELECT key_col, count(*) AS n_keys, max(f) AS max_f,
       round(max(f) / (sum(f) / count(*)), 4) AS skew_ratio,
       round(CAST(max(f) AS DOUBLE) / sum(f), 6) AS hot_share
FROM f GROUP BY key_col ORDER BY key_col""")),

    // M6 equi-depth histogram — the ANALYZE-style column statistic a
    // cost-based optimizer and a data-skipping layout both feed on:
    // 8 buckets over o_totalprice, each holding (almost) the same row
    // count, with exact [lo, hi] envelopes. Built WITHOUT interpolating
    // percentiles (engine float drift): a deterministic global rank
    // assigns bucket = (rn-1)*8/n in integer arithmetic, so boundaries
    // fall on actual data values and both engines agree bit-for-bit.
    // One global sort (the rank) + one group-by — at corpus scale the
    // rank becomes repartitionByRange + per-partition offsets (the o5
    // technique); the statistic itself is a 8-row broadcastable table.
    Q("m6_equidepth_histogram",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))
          .withColumn("bucket", expr("(rn - 1) * 8 div n"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
          .orderBy("bucket")
      },
      Some("""
WITH r AS (SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
             count(*) OVER () AS n
           FROM orders)
SELECT (rn - 1) * 8 // n AS bucket, count(*) AS n_rows,
       min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM r GROUP BY 1 ORDER BY bucket""")),

    // S10 ORC source/sink — the other columnar warehouse format
    // (closing a marked-absent row in SURVEY §2.1's ∅ list; Avro stays
    // absent — its SQL connector jar is not in this distribution). The
    // ORC reader shares parquet's scan machinery: vectorized batches,
    // predicate pushdown, column pruning — the roundtrip plus the
    // pushed filter prove the format is a first-class citizen, not a
    // compatibility shim.
    Q("s10_orc_roundtrip",
      (s, d) => graft.Scratch.withDir(s, "orc") { out =>
        Tables.part(s, d).write.mode("overwrite").orc(s"$out/part")
        s.read.orc(s"$out/part")
          .filter(col("p_partkey") % 2 === 0)
          .orderBy("p_partkey")
      },
      Some("SELECT * FROM part WHERE p_partkey % 2 = 0 ORDER BY p_partkey")),

    // S11 XML source — the remaining enterprise interchange format
    // (feeds, sitemaps, legacy exports), on Spark 4's native XML
    // datasource. The fixture is synthesized from orders rows — one
    // element per record with BOTH an attribute (id) and child
    // elements, because attribute-vs-element mapping is where XML
    // readers break — then read back with rowTag + an EXPLICIT schema
    // (inference at 100 TB is an extra corpus pass; same rule as CSV/
    // JSONL). Doubles travel as their cast-to-string shortest form, so
    // parse-back is bit-exact and the oracle can recompute from the
    // ORIGINAL table without ever seeing XML — a tag-routing or
    // attribute-prefix bug breaks the hash.
    Q("s11_xml_source",
      (s, d) => graft.Scratch.withDir(s, "xml") { out =>
        // XML demands ONE root per file (a file of concatenated row
        // elements is malformed — the reader keeps the first and
        // quarantines the rest), so the fixture writes one rooted
        // document per shard via partitionBy: the real layout of
        // feed/export interchange, with shard count sized so each
        // document stays file-sized.
        val elems = Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0)
          .select(pmod(col("o_orderkey"), lit(8L)).as("shard"),
            format_string(
              "<order id=\"%d\"><status>%s</status><price>%s</price></order>",
              col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice").cast("string")).as("elem"))
        elems.groupBy("shard")
          .agg(concat(lit("<orders>"), concat_ws("", collect_list(col("elem"))),
            lit("</orders>")).as("value"))
          .write.partitionBy("shard").mode("overwrite").text(s"$out/orders_xml")
        s.read.format("xml")
          .option("rowTag", "order")
          .schema("_id BIGINT, status STRING, price DOUBLE")
          .load(s"$out/orders_xml")
          .select(col("_id").as("o_orderkey"),
            col("status").as("o_orderstatus"),
            col("price").as("o_totalprice"))
          .filter(col("o_totalprice") > 50000)
          .orderBy("o_orderkey")
      },
      Some("""
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE o_orderkey % 7 = 0 AND o_totalprice > 50000 ORDER BY o_orderkey""")),

    // K11 dynamic partition overwrite — the daily-restate sink: rewrite
    // ONLY the partitions the new data touches (here: double the F
    // partition's totals), leaving every other partition's files
    // untouched. Static overwrite mode would have dropped the whole
    // table first — the classic footgun this conf exists to avoid; at
    // 100 TB restating one day must never rewrite the year.
    Q("k11_dynamic_partition_overwrite",
      (s, d) => graft.Scratch.withDir(s, "dynpo") { out =>
        val orders = Tables.orders(s, d)
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        orders.write.mode("overwrite")
          .partitionBy("o_orderstatus").parquet(s"$out/t")
        val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try orders.filter(col("o_orderstatus") === "F")
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .write.mode("overwrite")
          .partitionBy("o_orderstatus").parquet(s"$out/t")
        finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        s.catalog.refreshByPath(s"$out/t")
        s.read.parquet(s"$out/t")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // S9 JSONL source — the lingua franca of LLM data pipelines: one
    // JSON object per line. Explicit caller schema (schema inference at
    // 100 TB is a full extra pass over the corpus — never), PERMISSIVE
    // parse with malformed lines parked in the corrupt-record column
    // (the JSON analog of the reference's CSV permissive ingest,
    // S3_interact.py:78-96), quarantined rows excluded from the good
    // stream. The fixture round-trips the region table through the
    // native JSONL writer and plants two malformed lines (bad type /
    // not JSON) in an extra part file the directory scan picks up.
    Q("s9_jsonl_source",
      (s, d) => graft.Scratch.withDir(s, "jsonl") { out =>
        import org.apache.spark.sql.types._
        val region = Tables.region(s, d)
        region.write.mode("overwrite").json(s"$out/r")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/r/part-corrupt.json"),
          ("{\"r_regionkey\": \"not_a_number\", \"r_name\": 7}\n" +
            "this line is not json\n").getBytes("UTF-8"))
        val schema = StructType(
          region.schema.fields :+ StructField("_corrupt", StringType))
        // same persist discipline as s4b: a plan that prunes the scan
        // down to only the internal corrupt-record column is rejected
        // by Spark, so parse once, then carve good rows from the block
        val parsed = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(s"$out/r").persist()
        graft.Caching.releasing(s, parsed)(
          parsed.filter(col("_corrupt").isNull)
            .select(region.columns.map(col).toSeq: _*)
            .orderBy("r_regionkey"))
      },
      Some("SELECT * FROM region ORDER BY r_regionkey")),

    // S9b multiline JSON — the other wire shape: one document whose
    // record spans lines (an API response array, a config export).
    // multiLine=true switches the reader from line-splittable to
    // whole-file parse; at 100 TB that costs parallelism (one task per
    // FILE, not per split), which is exactly why the flat JSONL form
    // above is the default and this one is for small/medium side
    // inputs — the trade is stated here because the option looks free.
    Q("s9b_json_multiline",
      (s, d) => graft.Scratch.withDir(s, "jsonml") { out =>
        import org.apache.spark.sql.types._
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/doc.json"),
          """[
            |  {"id": 1,
            |   "tag": "alpha"},
            |  {"id": 2,
            |   "tag": "beta"}
            |]""".stripMargin.getBytes("UTF-8"))
        val schema = StructType(Seq(
          StructField("id", LongType), StructField("tag", StringType)))
        s.read.schema(schema).option("multiLine", "true")
          .json(s"$out/doc.json").orderBy("id")
      },
      Some("""SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'alpha'),
                                    (CAST(2 AS BIGINT), 'beta'))
              AS t(id, tag) ORDER BY id""")),

    // S9c gzip-compressed JSONL — how the format actually arrives from
    // crawlers/exports. The reader decodes transparently; the caveat
    // this query exists to record: a .json.gz file is NOT splittable —
    // one file = one task regardless of size — so at 100 TB the
    // ingest contract is "many medium gzip files" (or zstd/bzip2 for
    // splittable frames), never one giant archive. Same schema and
    // quarantine discipline as s9.
    Q("s9c_jsonl_gzip",
      (s, d) => graft.Scratch.withDir(s, "jsonlgz") { out =>
        val nation = Tables.nation(s, d)
        nation.write.mode("overwrite")
          .option("compression", "gzip").json(s"$out/n")
        s.read.schema(nation.schema).json(s"$out/n")
          .orderBy("n_nationkey")
      },
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // K10 partitioned JSONL sink + dead-letter split — the sink half of
    // the JSONL story, composing k2's layout with k7's quarantine: good
    // rows land as JSONL partitioned by status (each partition dir is
    // independently line-splittable downstream), malformed input lines
    // land raw in a JSONL dead-letter dir, and the read-back aggregates
    // both sinks. Orders flow through the real writer/reader; the two
    // planted corrupt lines make the quarantine leg non-empty.
    Q("k10_jsonl_partitioned_sink",
      (s, d) => graft.Scratch.withDir(s, "jsonlsink") { out =>
        import org.apache.spark.sql.types._
        val orders = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        orders.write.mode("overwrite").json(s"$out/in")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/in/part-corrupt.json"),
          ("{\"o_orderkey\": \"NaN?\"}\n" + "garbage line\n").getBytes("UTF-8"))
        val schema = StructType(
          orders.schema.fields :+ StructField("_corrupt", StringType))
        val parsed = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(s"$out/in").persist()
        parsed.filter(col("_corrupt").isNull)
          .select(orders.columns.map(col).toSeq: _*)
          .write.mode("overwrite").partitionBy("o_orderstatus")
          .json(s"$out/good")
        parsed.filter(col("_corrupt").isNotNull)
          .select(col("_corrupt").as("raw_line"))
          .write.mode("overwrite").json(s"$out/deadletter")
        parsed.unpersist(false)
        val good = s.read.schema(orders.schema).json(s"$out/good")
        val dead = s.read.json(s"$out/deadletter")
        good.groupBy(col("o_orderstatus").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("checksum"))
          .union(dead
            .agg(count(lit(1)).as("n"),
              sum(length(col("raw_line"))).cast("double").as("checksum"))
            .select(lit("deadletter").as("bucket"), col("n"), col("checksum")))
          .orderBy("bucket")
      },
      Some("""
SELECT o_orderstatus AS bucket, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS checksum
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT 'deadletter', 2, 34.0  -- the two planted lines' total length
ORDER BY bucket""")),

    // M1 table-existence probe (db_interact.py:99-113)
    Q("m1_table_exists",
      (s, d) => {
        import s.implicits._
        Tables.nation(s, d).createOrReplaceTempView("m1_nation")
        Seq(
          ("m1_nation", s.catalog.tableExists("m1_nation")),
          ("m1_no_such_table", s.catalog.tableExists("m1_no_such_table")))
          .toDF("tbl", "present").orderBy("tbl")
      },
      Some("""SELECT * FROM (
                SELECT 'm1_nation' AS tbl, true AS present
                UNION ALL
                SELECT 'm1_no_such_table', false)
              ORDER BY tbl"""))
  )
}
