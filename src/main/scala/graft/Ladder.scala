package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Measured scaling curves — the evidence behind SCALE.md's complexity
  * claims: runs each family's representative query across the
  * sf0.001/0.01/0.1 fixture ladder, fits the wall-time scaling exponent
  * against the family's DRIVER-TABLE row count, and FAILS (exit 1) if
  * any family scales worse than its claimed O() cap. Writes
  * `scale_ladder.json`; SCALE.md carries the table.
  *
  * Method notes, so the numbers are read honestly:
  *  - the x-axis is the family's driver-table ROWS at each sf, not the
  *    sf label — documents hold 500 rows at BOTH sf0.001 and sf0.01
  *    (then 5000 at sf0.1) and embeddings 500/500/2000, so doc/emb
  *    families have exactly two distinct scale points (a 10×/4× step)
  *    while lineitem families have three (6k/60k/600k). Duplicate sizes
  *    keep the min time (same workload measured twice).
  *  - the fitted exponent is ln(t_hi/t_lo)/ln(n_hi/n_lo) over the two
  *    LARGEST distinct sizes — the pair least polluted by fixed
  *    per-query overhead (scheduler + plan time, ~0.1-0.3 s), which
  *    deflates small-sf denominators and makes the fit CONSERVATIVE
  *    (a true quadratic still lands far above every cap: 10× rows →
  *    100× work swamps any constant floor).
  *  - caps are the claimed complexity plus slack for log factors and
  *    constant-floor distortion: 1.4 for map/join-shaped linear
  *    families, 1.6 for iterative families whose round count may grow
  *    with the data (label propagation, Lloyd-style loops).
  *
  * Usage: tools/run.sh graft.Ladder  (SPARK_GRAFT_CPUS to override
  * parallelism; the config is held FIXED across all sf points so the
  * exponent measures the algorithm, not the cluster).
  */
object Ladder {

  final case class Family(query: String, table: String, cap: Double,
      claim: String, warmDedup: Boolean = false)

  val families: Seq[Family] = Seq(
    Family("dedup_minhash_lsh", "documents", 1.4,
      "inverted shingle postings + band-bucket equi-join: O(N) + collisions"),
    Family("dedup_ngram_jaccard", "documents", 1.4,
      "posting-list intersection over df-capped shingles: O(N) + collisions"),
    Family("dedup_connected_components", "documents", 1.6,
      "min-label propagation: O(E x diameter) with per-round checkpoint"),
    Family("dedup_incremental_minhash", "documents", 1.4,
      "delta x corpus asymmetric banding (delta grows with sf here): O(delta + collisions)",
      warmDedup = true),
    Family("dedup_substring_spans", "documents", 1.4,
      "positional 8-gram inverted index + per-doc span stitching: O(tokens)"),
    Family("simsearch_knn_graph", "embeddings", 1.4,
      "SRP band-collision candidates + per-node top-k: O(N + collisions)"),
    Family("simsearch_knn_refine", "embeddings", 1.4,
      "one NN-descent round: degree-bounded 2-hop self-join, O(edges)"),
    Family("emb_pca_top_component", "embeddings", 1.35,
      "3 power steps, each one dim-keyed decimal aggregate: O(N x dim)"),
    Family("emb_isotropy_report", "embeddings", 1.35,
      "sum-vector identity: O(N x dim) for a naively O(N^2 x dim) statistic"),
    Family("text_bpe_merges", "documents", 1.4,
      "pair-count iterations over the token corpus: O(tokens x merges)"),
    Family("text_bpe_encode", "documents", 1.4,
      "longest-match encoding with broadcast vocab: O(tokens)"),
    Family("graph_pagerank", "lineitem", 1.5,
      "5 damped rounds, each one edge-keyed aggregate: O(E x rounds)"),
    Family("curation_leakage_safe_split", "documents", 1.6,
      "verified pairs -> connected components -> one draw per cluster"),
    Family("simsearch_graph_route", "embeddings", 1.4,
      "deg-16 serve-graph build O(N + collisions) dominates; per-query " +
        "serve is constant at EVERY stage: 64-vector capped entry scan " +
        "+ beam-bounded hops (query count here grows with N via % 97)"),
    Family("graph_link_prediction", "embeddings", 1.4,
      "wedge join over the materialized k-NN edge list: O(N x deg^2)"),
    Family("curation_ngram_decontam_spans", "documents", 1.4,
      "benchmark 13-gram keys broadcast against train positional grams: " +
        "O(tokens) probe, spans stitched over hits only"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_LADDER_OUT", "scale_ladder.json")
    val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up only — a warm-up failure must not mask the
    // real run, but fatal errors (OOM, linkage) still propagate
    try SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => }

    // rows per (sf, table) — the x-axis
    val tables = families.map(_.table).distinct
    val rows: Map[(String, String), Long] = (for {
      sf <- sfs; t <- tables
    } yield (sf, t) -> spark.read.parquet(s"$base/$sf/$t.parquet").count()).toMap

    // timings: min of 2, shared dedup state warmed OUTSIDE the timing
    val secs = scala.collection.mutable.Map.empty[(String, String), Double]
    for (sf <- sfs) {
      val dir = s"$base/$sf"
      if (families.exists(_.warmDedup)) queries.Dedup.warmSharedState(spark, dir)
      for (f <- families) {
        def once(): Double = {
          val t0 = System.nanoTime()
          queries.Registry.queries(f.query)(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache(); Caching.flush()
          dt
        }
        secs((sf, f.query)) = math.min(once(), once())
        println(f"[ladder] $sf ${f.query}%-32s ${secs((sf, f.query))}%.3f s")
      }
    }

    def r3(d: Double): String = f"$d%.3f"
    val results = families.map { f =>
      // collapse duplicate sizes to the min time, then fit on the two
      // largest distinct sizes
      val pts = sfs.map(sf => (rows((sf, f.table)), secs((sf, f.query))))
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq.sortBy(_._1)
      val Seq((nLo, tLo), (nHi, tHi)) = pts.takeRight(2)
      val exp = math.log(tHi / tLo) / math.log(nHi.toDouble / nLo)
      val ok = exp <= f.cap
      val ptsJson = pts.map { case (n, t) => s"""{"rows":$n,"sec":${r3(t)}}""" }
        .mkString("[", ",", "]")
      (f, exp, ok,
        s"""\"${f.query}\":{"table":"${f.table}","points":$ptsJson,""" +
          s""""exponent":${r3(exp)},"cap":${f.cap},"ok":$ok,""" +
          s""""claim":"${f.claim}"}""")
    }
    val violations = results.collect { case (f, exp, false, _) =>
      s"${f.query}: exponent ${r3(exp)} > cap ${f.cap}"
    }
    val json = s"""{"sfs":${sfs.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""cpus":$cpus,"families":{${results.map(_._4).mkString(",")}},""" +
      s""""violations":${violations.map(v => "\"" + v + "\"").mkString("[", ",", "]")}}"""
    Files.write(Paths.get(outPath), json.getBytes(StandardCharsets.UTF_8))
    results.foreach { case (f, exp, ok, _) =>
      println(f"[ladder] ${f.query}%-32s exponent ${r3(exp)}%s cap ${f.cap}%s " +
        (if (ok) "OK" else "VIOLATED"))
    }
    spark.stop()
    if (violations.nonEmpty) {
      violations.foreach(v => System.err.println(s"[ladder] SCALING VIOLATION: $v"))
      sys.exit(1)
    }
  }
}
