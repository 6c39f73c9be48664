package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariants the sketch operators must hold beyond oracle equality:
  * the oracle proves both engines compute the same numbers; these prove
  * the numbers mean what a sketch promises.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("count-min never undercounts, and is exact for most keys at this width") {
    val rows = Registry.queries("a16_countmin_sketch")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    // the one-sided error guarantee IS the sketch's contract
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS undercounted key ${r.getAs[Long]("key")}")
    }
    // d=4 x w=256 cells against ~100 keys: collisions must be rare —
    // if most keys overcount, the hash rows are correlated (broken)
    val exactHits = rows.count(_.getAs[Long]("overcount") == 0L)
    assert(exactHits * 10 >= rows.length * 9,
      s"only $exactHits/${rows.length} keys exact — hash rows look correlated")
  }

  test("KMV estimate lands within sketch error of the exact distinct count") {
    val rows = Registry.queries("a15_kmv_distinct_sketch")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val relErr = math.abs(est - exact) / exact
      // k=64 → 1/sqrt(k) = 12.5% standard error; 40% is >3 sigma
      assert(relErr < 0.4,
        s"grp=${r.getAs[String]("grp")} est=$est exact=$exact relErr=$relErr")
      // below saturation the sketch must be EXACT (it holds every hash)
      if (r.getAs[Long]("n_kept") < 64)
        assert(est == exact, s"unsaturated sketch must be exact, got $est vs $exact")
    }
  }

  test("CMS is mergeable: sketch(A) + sketch(B) == sketch(A ++ B), cell for cell") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val all = (1 to 500).map(i => (i % 37).toLong).toDF("key")
    val a = all.filter(col("key") % 2 === 0)
    val b = all.filter(col("key") % 2 === 1)
    val merged = Sketches.cmsSketch(a).withColumnRenamed("cnt", "ca")
      .join(Sketches.cmsSketch(b).withColumnRenamed("cnt", "cb"),
        Seq("j", "bucket"), "full_outer")
      .select(col("j"), col("bucket"),
        (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("cnt"))
    val whole = Sketches.cmsSketch(all)
    assert(merged.join(whole, Seq("j", "bucket"))
      .filter(merged("cnt") =!= whole("cnt")).isEmpty)
    assert(merged.count() == whole.count())
  }

  test("KMV is mergeable: k smallest of (state(A) ∪ state(B)) == state(A ++ B)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // 300 distinct keys per half ensures both halves saturate K=64
    val all = (1 to 600).map(i => ("g", i.toLong)).toDF("grp", "key")
    val a = all.filter(col("key") <= 300)
    val b = all.filter(col("key") > 300)
    val w = Window.partitionBy("grp").orderBy("h")
    val merged = Sketches.kmvState(a).select("grp", "h")
      .union(Sketches.kmvState(b).select("grp", "h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Sketches.K)
    val whole = Sketches.kmvState(all).select("grp", "h", "rn")
    assert(merged.select("grp", "h").except(whole.select("grp", "h")).isEmpty)
    assert(whole.select("grp", "h").except(merged.select("grp", "h")).isEmpty)
  }

  test("portable HLL registers merge: per-bucket max of halves == registers of the whole") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val all = (1 to 800).map(i => ("g", s"key-$i")).toDF("source", "key")
    val a = all.filter(expr("CAST(substr(key, 5) AS INT) % 2 = 0"))
    val b = all.filter(expr("CAST(substr(key, 5) AS INT) % 2 = 1"))
    val merged = Sketches.hllRegs(a).withColumnRenamed("rho", "ra")
      .join(Sketches.hllRegs(b).withColumnRenamed("rho", "rb"),
        Seq("source", "bucket"), "full_outer")
      .select(col("source"), col("bucket"),
        greatest(coalesce(col("ra"), lit(0L)), coalesce(col("rb"), lit(0L)))
          .as("rho"))
    val whole = Sketches.hllRegs(all)
    assert(merged.join(whole, Seq("source", "bucket"))
      .filter(merged("rho") =!= whole("rho")).isEmpty)
    assert(merged.count() == whole.count())
  }

  test("portable HLL estimate lands within sketch error; ALL row merges the sources") {
    val rows = Registry.queries("a22_hll_registers")(spark, TestSpark.Sf001)
      .collect()
    assert(rows.length >= 2, "need per-source rows plus the ALL row")
    rows.foreach { r =>
      val est = r.getAs[Long]("est_distinct").toDouble
      val exact = r.getAs[Long]("exact_distinct").toDouble
      // m=64 → 1.04/sqrt(64) = 13% standard error; 40% is ~3 sigma
      assert(math.abs(est - exact) / exact < 0.4,
        s"source=${r.getAs[String]("source")} est=$est exact=$exact")
    }
    val all = rows.find(_.getAs[String]("source") == "ALL").get
    val perSource = rows.filter(_.getAs[String]("source") != "ALL")
    // merged estimate counts the union: >= any single source's exact
    assert(all.getAs[Long]("exact_distinct") >=
      perSource.map(_.getAs[Long]("exact_distinct")).max)
  }

  test("substring spans: per-doc mass is consistent with the span count and doc length") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    val spans = Registry.queries("dedup_substring_spans")(spark, TestSpark.Sf0001)
    val joined = spans.join(docs, "doc_id").collect()
    assert(joined.nonEmpty, "no duplicated spans found at sf0.001")
    joined.foreach { r =>
      val nSpans = r.getAs[Long]("n_spans")
      val mass = r.getAs[Long]("dup_tokens")
      val nToks = r.getAs[Int]("n_toks").toLong
      assert(nSpans >= 1L)
      // every maximal span covers at least one full 8-gram, and merged
      // spans are disjoint, so the mass is bounded on both sides
      assert(mass >= nSpans * 8, s"doc ${r.getAs[Long]("doc_id")}: mass $mass < ${nSpans}x8")
      assert(mass <= nToks, s"doc ${r.getAs[Long]("doc_id")}: mass $mass > doc length $nToks")
    }
  }
  test("native Datasketches HLL: near-exact here, and per-group union == global sketch") {
    // the production path for distinct counts at 100 TB is Spark's
    // built-in hll_sketch_agg / hll_union_agg (Apache Datasketches) —
    // not oracle-hashable (DuckDB's HLL differs), so the contract is
    // spec'd instead: estimate accuracy, and the merge law that makes
    // the sketch shardable (inserting the same values under any
    // grouping fills the same registers, so unioning per-group
    // sketches must reproduce the global estimate exactly)
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, TestSpark.Sf001)
    val est = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head().getLong(0)
    val exact = ev.select("user_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"HLL estimate $est vs exact $exact drifted beyond 5%")
    val merged = ev.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    assert(merged == est,
      s"union of per-group sketches ($merged) != global sketch ($est)")
  }

  test("native approx_percentile brackets the exact discrete percentile") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, TestSpark.Sf001)
    val Array(lo, hi) = ev
      .agg(expr("approx_percentile(value, 0.5, 1000)"),
        expr("percentile(value, 0.5)"))
      .head().toSeq.map(_.toString.toDouble).toArray
    // accuracy=1000 on this cardinality: approx must land within 2%
    assert(math.abs(lo - hi) <= math.abs(hi) * 0.02 + 1e-9,
      s"approx_percentile $lo vs exact $hi")
  }

  test("Misra-Gries summary is a superset of every (n/(k+1))-frequent item") {
    // adversarial-ish stream: a few heavy items buried in a long
    // distinct tail, heavy items clustered at the END so survival
    // can't come from arrival order
    val rnd = new scala.util.Random(7)
    val tail = Seq.fill(20000)(s"t${rnd.nextInt(15000)}")
    val heavy = Seq("h1", "h2", "h3").flatMap(h => Seq.fill(1500)(h))
    val stream = tail ++ heavy
    for (k <- Seq(16, 64, 256)) {
      val summary = Sketches.misraGries(stream.iterator, k).toSet
      assert(summary.size <= k, s"k=$k summary exceeded capacity")
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val bar = stream.size.toDouble / (k + 1)
      exact.foreach { case (t, c) =>
        if (c > bar)
          assert(summary.contains(t),
            s"k=$k dropped $t with freq $c > n/(k+1)=$bar")
      }
    }
  }

  test("Misra-Gries fold is resumable: batch-wise state == one pass") {
    // the law the streaming twin depends on across micro-batches
    val rnd = new scala.util.Random(11)
    val stream = Seq.fill(5000)(rnd.nextInt(300).toLong)
    for (k <- Seq(16, 64)) {
      val onePass =
        Sketches.misraGriesFold(Map.empty[Long, Long], stream.iterator, k)
      val batched = stream.grouped(137).foldLeft(Map.empty[Long, Long]) {
        (st, batch) => Sketches.misraGriesFold(st, batch.iterator, k)
      }
      assert(batched == onePass, s"k=$k resume diverged")
    }
  }

  test("heavy-hitter candidates make the approximate stage invisible") {
    // the declared query's answer must equal plain exact GROUP BY —
    // the sketch may only ever ADD candidates, never lose a true hit
    import org.apache.spark.sql.functions._
    val toks = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 64 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = Registry.queries("a20_heavy_hitters")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact, s"sketch path diverged: ${got.diff(exact)} extra, " +
      s"${exact.diff(got)} missing")
  }

  test("CM self-join-size estimate is a one-sided upper bound on the F2 moment") {
    val r = Registry.queries("a24_cm_selfjoin_size")(spark, TestSpark.Sf0001)
      .head()
    val est = r.getAs[Long]("cm_est")
    val exact = r.getAs[Long]("exact_sjs")
    // collisions can only ADD cross terms: every sketch row's Σcnt² is
    // ≥ Σn², so the min across rows still is
    assert(r.getAs[Long]("overcount") >= 0L && est >= exact)
    // and at d=4 × w=256 against ~hundreds of keys the bound should be
    // tight enough to plan with, not a vacuous 10× blow-up
    assert(est <= exact * 2, s"estimate $est vs exact $exact — too loose to use")
  }

  test("KMV set algebra: union-of-sketches IS the sketch of the union, " +
    "and the Jaccard estimate lands within the sketch's error band") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, TestSpark.Sf001)
    def hashes(flag: String): Seq[Long] = Sketches.kmvState(
      li.filter(col("l_returnflag") === flag)
        .select(lit(flag).as("grp"), col("l_orderkey").as("key")))
      .select("h").collect().map(_.getLong(0)).toSeq
    val ska = hashes("A"); val skb = hashes("R")
    assert(ska.length == Sketches.K && skb.length == Sketches.K)
    // merge law: K smallest of (sketch(A) ∪ sketch(B)) == sketch(A∪B)
    // built directly from the pooled keys — EXACT equality, the same
    // min-k law the reservoir sample rests on
    val merged = (ska ++ skb).distinct.sorted.take(Sketches.K)
    val direct = Sketches.kmvState(
      li.filter(col("l_returnflag").isin("A", "R"))
        .select(lit("u").as("grp"), col("l_orderkey").as("key")))
      .select("h").collect().map(_.getLong(0)).toSeq.sorted
    assert(merged == direct, "union-of-sketches differs from direct sketch")
    // estimator sanity on the declared query: at K=64 the Jaccard
    // std error is ~sqrt(J(1-J)/K) ≈ 0.06; a 0.2 band is ~3σ
    val r = Registry.queries("a25_kmv_set_algebra")(spark, TestSpark.Sf001)
      .head()
    val estJ = r.getAs[Double]("est_jaccard")
    val exJ = r.getAs[Double]("exact_jaccard")
    assert(math.abs(estJ - exJ) <= 0.2,
      s"Jaccard estimate $estJ vs exact $exJ outside the 3-sigma band")
    val estU = r.getAs[Double]("est_union")
    val exU = r.getAs[Long]("exact_union").toDouble
    assert(math.abs(estU - exU) / exU <= 0.4,
      s"union estimate $estU vs exact $exU outside the error band")
  }

}
