package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift tripwire for the driver-generated fixtures (FIXTURES.md).
  *
  * Round 7 lost 36 queries and 50 tests SILENTLY when the driver
  * regenerated `/root/testdata` with `events.ts` as timestamp[us] where
  * every prior round stored TIMESTAMP(NANOS): nothing in the suite
  * pinned the fixture schemas, so the first failure surfaced in the
  * correctness artifact instead of one loud spec. This spec asserts
  * every table's footer schema at every sf dir present, accepting for
  * each timestamp-bearing column exactly the storage eras the adaptive
  * readers support — any OTHER drift (a new column, a renamed column, a
  * type the reader cannot normalize) fails here first, with the table
  * and column named.
  *
  * The reference's analog: frozen schemas inherited from the source DB
  * (db_interact.py:70-78).
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  /** Storage eras the adaptive readers accept for a timestamp column:
    * µs with or without TZ annotation (plain inference), or ns-int64
    * (surfaces as LongType under the legacy probe — events only).
    */
  private def tsLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private val exact: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  // (table, column-name list, ts-columns) for the timestamp-bearing tables
  private val withTs: Seq[(String, Seq[String], Set[String])] = Seq(
    ("orders",
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      Set("o_orderdate")),
    ("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"),
      Set("l_shipdate")))

  private val nonTsTypes: Map[String, DataType] = Map(
    "o_orderkey" -> LongType, "o_custkey" -> LongType,
    "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
    "o_orderpriority" -> StringType,
    "l_orderkey" -> LongType, "l_partkey" -> LongType,
    "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
    "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
    "l_discount" -> DoubleType, "l_tax" -> DoubleType,
    "l_returnflag" -> StringType, "l_linestatus" -> StringType)

  test("fixture dirs exist (driver contract)") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
  }

  for (d <- sfDirs) {
    test(s"$d: exact-typed tables match FIXTURES.md") {
      for ((table, cols) <- exact) {
        val schema = spark.read.parquet(s"$d/$table.parquet").schema
        val got = schema.fields.map(f => f.name -> f.dataType).toSeq
        assert(got == cols,
          s"$table schema drifted: got $got, FIXTURES.md says $cols")
      }
    }

    test(s"$d: orders/lineitem match, ts columns in a supported era") {
      for ((table, names, tsCols) <- withTs) {
        val schema = spark.read.parquet(s"$d/$table.parquet").schema
        assert(schema.fields.map(_.name).toSeq == names,
          s"$table columns drifted: ${schema.fields.map(_.name).toSeq}")
        for (f <- schema.fields)
          if (tsCols(f.name))
            assert(tsLike(f.dataType),
              s"$table.${f.name} stored as ${f.dataType}: not a supported timestamp era")
          else
            assert(f.dataType == nonTsTypes(f.name),
              s"$table.${f.name} drifted to ${f.dataType}")
      }
    }

    test(s"$d: events.ts stored in an era the adaptive reader supports") {
      // the probe itself throws on eras schema inference cannot even
      // name (e.g. a future INT96 resurrection) — that failure is
      // exactly the loud signal this spec exists to produce
      val stored = Tables.eventsTsType(spark, d)
      assert(stored == LongType || tsLike(stored),
        s"events.ts stored as $stored: Tables.events has no branch for it — " +
          "add one (and a FIXTURES.md note) before trusting any events query")
      val nonTs = Seq("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType).toMap
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      val schema =
        try spark.read.parquet(s"$d/events.parquet").schema
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      assert(schema.fields.map(_.name).toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
        s"events columns drifted: ${schema.fields.map(_.name).toSeq}")
      for (f <- schema.fields if f.name != "ts")
        assert(f.dataType == nonTs(f.name),
          s"events.${f.name} drifted to ${f.dataType}")
    }

    test(s"$d: adaptive readers normalize ts to session-TZ TimestampType") {
      // the invariant every downstream query and watermark relies on,
      // whatever era the storage is in
      assert(Tables.events(spark, d).schema("ts").dataType == TimestampType)
      assert(graft.streaming.EventsStream.rawSchema("ts").dataType ==
        TimestampNTZType)
    }
  }
}
