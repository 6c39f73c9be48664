package graft

import org.apache.spark.sql.SparkSession

/** Dev tool behind PlanQualitySpec's shuffle budgets: prints the
  * hash/range/single-partition exchange count of each named query's
  * executed plan at sf0.01 — the number a new budget entry pins.
  *
  * Usage: tools/run.sh graft.CountShuffles <query> [query...]
  */
object CountShuffles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (n <- args) {
      val p = queries.Registry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString
      val c = p.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") ||
          l.contains("Exchange rangepartitioning") ||
          l.contains("Exchange SinglePartition"))
      println(s"SHUFFLES $n = $c")
    }
    spark.stop()
  }
}
