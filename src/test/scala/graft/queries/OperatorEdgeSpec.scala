package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases the reference handles implicitly (SURVEY.md §5.2):
  * malformed input -> null (F6), duplicate-key survivors (A6), all-NULL
  * groups (A3 / views 7b vs 7b'), empty incremental delta (I1).
  */
class OperatorEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.Row

  test("F6 pattern: fallible parse nulls malformed rows, na.drop removes them") {
    import spark.implicits._
    val d = Seq("{\"k\": 1}", "not json at all", "{\"k\": 7}", "")
      .toDF("props")
      .withColumn("parsed", from_json(col("props"), StructType.fromDDL("k INT")))
      .withColumn("k", col("parsed.k"))
    assert(d.filter(col("k").isNull).count() == 2)
    assert(d.na.drop(Seq("k")).count() == 2)
  }

  test("A6: deterministic survivor via row_number beats dropDuplicates ambiguity") {
    import spark.implicits._
    val d = Seq((1, "b"), (1, "a"), (2, "z")).toDF("k", "v")
    val survivor = d.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("v")))
      .filter(col("rn") === 1).drop("rn")
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(survivor == Seq((1, "a"), (2, "z"))) // always the min-v row
  }

  test("A3: avg ignores NULLs; all-NULL group yields NULL avg, not absent row") {
    import spark.implicits._
    val d = Seq(("g1", Some(2.0)), ("g1", None), ("g2", None))
      .toDF("g", "x")
    val out = d.groupBy("g").agg(avg("x").as("a")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out("g1").contains(2.0)) // NULL skipped in the mean
    assert(out("g2").isEmpty)       // group present, avg NULL — the 7b/7b' split
  }

  test("I1: empty delta short-circuits without writing (isEmpty, not count)") {
    import spark.implicits._
    val files = Seq("f1.csv", "f2.csv").toDF("file")
    val used  = Seq("f1.csv", "f2.csv").toDF("file")
    val delta = files.join(used, Seq("file"), "left_anti")
    assert(delta.isEmpty)
  }

  test("W1 invariants on real data: <= k rows per group, min(top-k) >= max(rest)") {
    val pairs = SimilarityPipeline.pairs(spark, TestSpark.Sf0001)
    val ranked = SimilarityPipeline.tieFlagOverPairs(pairs)
    val perGroup = ranked.groupBy("target_id").count().collect()
    assert(perGroup.forall(_.getLong(1) <= SimilarityPipeline.TopK))
    // cutoff dominance: worst kept sim >= best dropped sim per target
    val kept = ranked.groupBy("target_id").agg(min("sim").as("worst_kept"))
    val dropped = pairs.join(
      ranked.select(col("target_id"), col("source_id")).withColumn("kept", lit(1)),
      Seq("target_id", "source_id"), "left_anti")
      .groupBy("target_id").agg(max("sim").as("best_dropped"))
    val bad = kept.join(dropped, "target_id")
      .filter(col("worst_kept") < col("best_dropped"))
    assert(bad.isEmpty)
  }

  test("anti-join result is disjoint from the exclusion set (U4/J6)") {
    val c = graft.Tables.customer(spark, TestSpark.Sf0001)
    val excl = c.filter(col("c_custkey") % 3 === 0).select("c_custkey")
    val out = c.join(excl, Seq("c_custkey"), "left_anti")
    assert(out.join(excl, Seq("c_custkey")).isEmpty)
    assert(out.count() + excl.count() == c.count())
  }

  test("j15 semantics: <=> matches NULL to NULL; = never does") {
    import spark.implicits._
    val l = Seq(Some("a"), None).toDF("k")
    val r = Seq(Some("a"), None).toDF("k2")
    assert(l.join(r, col("k") === col("k2")).count() == 1)
    assert(l.join(r, col("k") <=> col("k2")).count() == 2)
  }

  test("w7/w8 fill: a user whose first observations are null stays null until the first value") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = Seq((1, 1, None), (1, 2, None), (1, 3, Some(5.0)), (1, 4, None))
      .toDF("u", "t", "v")
    val w = Window.partitionBy("u").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = d.withColumn("f", last("v", ignoreNulls = true).over(w))
      .orderBy("t").collect().map(r => Option(r.get(3)))
    assert(filled.toSeq == Seq(None, None, Some(5.0), Some(5.0)))
  }

  test("substring spans: docs shorter than the gram width are excluded, not errored") {
    import spark.implicits._
    // minimal corpus: one 3-token doc (below K=8) plus two 10-token
    // twins; the short doc must not appear and must not break explode
    val base = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, "a b c")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("edge_docs")
    // re-run the operator's core shape inline against the tiny corpus
    val k = 8
    val grams = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= k)
      .select(col("doc_id"), explode(sequence(lit(0), col("n") - k)).as("i"))
    assert(grams.filter(col("doc_id") === 3L).isEmpty)
    assert(grams.count() == 6) // two docs x three 8-gram starts
  }

  test("chunking is a faithful re-tiling: every chunk equals the source token slice") {
    // differential check against an independent Scala tokenizer — the
    // oracle proves Spark==DuckDB; this proves both match the intended
    // (window, stride) = (50, 30) tiling of the ORIGINAL text
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val chunks = Registry.queries("text_chunk_sliding")(spark, TestSpark.Sf0001)
      .collect()
    assert(chunks.nonEmpty)
    val expected = docs.toSeq.flatMap { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      (0 until toks.length by 30).zipWithIndex.map { case (start, idx) =>
        (id, idx.toLong) ->
          (math.min(50, toks.length - start).toLong,
            toks.slice(start, start + 50).mkString(" "))
      }
    }.toMap
    assert(chunks.length == expected.size,
      s"${chunks.length} chunks vs ${expected.size} expected tilings")
    chunks.foreach { r =>
      val key = (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"))
      val exp = expected(key)
      assert(r.getAs[Long]("chunk_tokens") == exp._1, s"token count at $key")
      assert(r.getAs[String]("chunk_text") == exp._2, s"chunk text at $key")
    }
  }

  test("z-order files bound BOTH dims: custkey locality a date-sorted layout lacks") {
    import org.apache.spark.sql.expressions.Window
    val z = Registry.queries("o6_zorder_layout")(spark, TestSpark.Sf001)
      .collect()
    val fullCk = (z.map(_.getAs[Long]("max_ck")).max
      - z.map(_.getAs[Long]("min_ck")).min + 1).toDouble
    val zAvgCk = z.map(_.getAs[Long]("ck_span")).sum.toDouble / z.length
    // the SAME file assignment discipline, but ordered by date alone —
    // the layout z-order competes against
    val dateSorted = graft.Tables.orders(spark, TestSpark.Sf001)
      .withColumn("file_id", ntile(16).over(
        Window.orderBy(col("o_orderdate").asc, col("o_orderkey").asc)))
      .groupBy("file_id")
      .agg((max("o_custkey") - min("o_custkey") + 1).as("ck_span"))
      .collect()
    val dAvgCk = dateSorted.map(_.getAs[Long]("ck_span")).sum.toDouble /
      dateSorted.length
    // date-sorted files span ~the full custkey domain; z-order files
    // must do much better on the dimension the sort ignores
    assert(dAvgCk > 0.9 * fullCk,
      s"baseline unexpectedly clustered: $dAvgCk vs domain $fullCk")
    assert(zAvgCk < 0.6 * dAvgCk,
      s"z-order avg ck span $zAvgCk not < 0.6x date-sorted $dAvgCk")
  }

  test("sentence chunking is lossless: chunks joined in order reconstruct each doc") {
    // split on '. ' then string_agg with '. ' is an exact inverse, so
    // concatenating a doc's chunk_texts in chunk order must reproduce
    // the original text byte-for-byte — this pins both the sentence
    // assignment (no sentence lost/duplicated across chunk boundaries)
    // and the order-pinned reassembly inside each chunk
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rebuilt = Registry.queries("text_chunk_sentences")(spark, TestSpark.Sf0001)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Long]("chunk_idx"))
          .map(_.getAs[String]("chunk_text")).mkString(". ")
      }
    assert(rebuilt.keySet == docs.keySet)
    rebuilt.foreach { case (id, txt) =>
      assert(txt == docs(id), s"doc $id not reconstructed")
    }
  }

  test("Morton key is a bijection on the 8-bit x 8-bit grid") {
    // 65536 (qx, qy) pairs must map to 65536 distinct zkeys covering
    // exactly 0..65535 — any dropped/duplicated bit in the generated
    // interleave expression breaks this immediately
    val grid = spark.range(0, 65536)
      .selectExpr("CAST(id % 256 AS INT) AS qx", "CAST(id div 256 AS INT) AS qy")
      .selectExpr(s"${WindowsSorts.zkeySpark("qx", "qy")} AS zkey")
    assert(grid.distinct().count() == 65536L)
    val mm = grid.agg(min("zkey"), max("zkey")).head()
    assert(mm.getInt(0) == 0 && mm.getInt(1) == 65535)
  }

  test("k8 snapshot isolation: v1 read is unchanged by the v2 publish") {
    val out = Registry.queries("k8_snapshot_versioned_sink")(
      spark, TestSpark.Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // latest == v2 (pointer flipped), and v1 stays the strict subset it
    // was published as — time travel reads the old manifest untouched
    assert(out("latest") == out("v2_asof"))
    assert(out("v1_asof")._1 < out("v2_asof")._1)
  }

  test("w12 ewma is a convex combination: bounded by the 8-row trailing envelope") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc).rowsBetween(-7, 0)
    val env = graft.Tables.events(spark, TestSpark.Sf0001)
      .withColumn("lo", min("value").over(w))
      .withColumn("hi", max("value").over(w))
      .select("event_id", "lo", "hi")
    val bad = Registry.queries("w12_ewma")(spark, TestSpark.Sf0001)
      .join(env, "event_id")
      // weights are positive and normalized over present lags, so the
      // smoothed value can never leave the window's [min, max]
      .filter(col("ewma") < col("lo") - lit(1e-9) ||
        col("ewma") > col("hi") + lit(1e-9))
    assert(bad.isEmpty)
  }

  test("w13 islands partition the events: disjoint, gap-separated, counts add up") {
    val isl = Registry.queries("w13_interval_islands")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // consecutive islands of one user never touch: the next start is
    // strictly past the previous merged end (else they'd be one island)
    isl.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, _, prevEnd, _), (_, _, nextStart, _, _)) =>
          assert(nextStart > prevEnd)
        case _ => ()
      }
    }
    val total = graft.Tables.events(spark, TestSpark.Sf0001).count()
    assert(isl.map(_._5).sum == total) // every event in exactly one island
  }

  test("e8 retention can't exceed cohort size; matrix accounts for every event") {
    val m = Registry.queries("e8_retention_cohorts")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val size0 = m.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    m.foreach { case (cohort, _, nUsers, _) =>
      // offset 0 holds the whole cohort (min-week membership), later
      // offsets count subsets of it
      assert(size0.contains(cohort) && nUsers <= size0(cohort))
    }
    val total = graft.Tables.events(spark, TestSpark.Sf0001).count()
    assert(m.map(_._4).sum == total)
  }

  test("i9 compaction bins: contiguous runs, near-target sizes, all files placed") {
    val plan = Registry.queries("i9_compaction_plan")(spark, TestSpark.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = plan.map(_._2).sum
    val target = math.ceil(total / 8.0).toLong
    // bins follow file order (contiguous runs), never skip backwards
    assert(plan.sortBy(_._1).map(_._3).sliding(2).forall {
      case Array(a, b) => b >= a; case _ => true
    })
    // exclusive-prefix binning overruns target by at most one file
    plan.groupBy(_._3).foreach { case (bin, files) =>
      val bytes = files.map(_._2).sum
      val maxFile = files.map(_._2).max
      assert(bytes <= target + maxFile, s"bin $bin holds $bytes > $target + $maxFile")
    }
    assert(plan.map(_._1).toSet.size == plan.length) // every file exactly once
  }

  test("collocation counts are consistent: c12 <= min(c1, c2), pmi from the row") {
    val rows = Registry.queries("text_term_cooccurrence")(
      spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    val nTok = graft.Tables.documents(spark, TestSpark.Sf001)
      .select(explode(split(col("text"), " "))).count()
    rows.foreach { r =>
      val (c12, c1, c2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c12 <= math.min(c1, c2)) // a bigram can't outnumber its parts
      val expect = BigDecimal(math.log(c12.toDouble * nTok / (c1 * c2)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - expect) < 1e-9)
    }
  }

  test("attribution: every purchase appears once; credited gaps sit inside the 7-day horizon") {
    val out = Registry.queries("e9_last_touch_attribution")(
      spark, TestSpark.Sf001)
    val nPurch = graft.Tables.events(spark, TestSpark.Sf001)
      .filter(col("event_type") === "purchase").count()
    assert(out.count() == nPurch)
    // credited rows: gap in [0, 7 days); uncredited rows: BOTH fields null
    val credited = out.filter(col("click_id").isNotNull)
    assert(credited.filter(col("gap_min") < 0 ||
      col("gap_min") >= 7L * 24 * 60).count() == 0)
    assert(out.filter(col("click_id").isNull &&
      col("gap_min").isNotNull).count() == 0)
    // both populations exist in the fixture, or the test is vacuous
    assert(credited.count() > 0 && credited.count() < nPurch)
  }
}
