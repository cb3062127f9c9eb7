package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.HistogramAlgebra
import graft.extensions.GraftFunctions

/** The injected SQL functions must agree with their Column/pure forms and
  * stay inside whole-stage codegen (native expression trees, no UDF).
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graft_logbin SQL form matches the pure algebra") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_logbin(x) FROM VALUES (0.0), (100.0), (1e6) AS t(x)")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0.0, 100.0, 1e6).map(HistogramAlgebra.logBin(_)))
  }

  test("graft_hamming SQL form matches Long.bitCount") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_hamming(12345, 54321)").head().getLong(0)
    assert(got == java.lang.Long.bitCount(12345L ^ 54321L))
  }

  test("graft_net24 truncates to the /24 network") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_net24('10.1.2.3')").head().getString(0) == "10.1.2")
  }

  test("injected functions stay codegen-native (no UDF node in the plan)") {
    GraftFunctions.register(spark)
    val plan = spark.sql("SELECT graft_logbin(x) FROM VALUES (1.0) AS t(x)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }
}
