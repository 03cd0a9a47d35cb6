package graft

import graft.functions.FlinkFunctions
import org.apache.spark.sql.functions._

/** Flink-name function surface: scalar wrappers + SINGLE_VALUE error
  * semantics (ref SingleValueAggFunction: >1 row per group must fail). */
class FunctionsSpec extends SparkTestBase {

  test("scalar wrappers match Flink semantics") {
    assert(FlinkFunctions.splitIndex("a,b,c", ",", 0) == "a")
    assert(FlinkFunctions.splitIndex("a,b,c", ",", 2) == "c")
    assert(FlinkFunctions.splitIndex("a,b,c", ",", 3) == null)
    assert(FlinkFunctions.splitIndex(null, ",", 0) == null)
    assert(FlinkFunctions.isDigit("123") && !FlinkFunctions.isDigit("12a") && !FlinkFunctions.isDigit(""))
    assert(FlinkFunctions.isAlpha("abC") && !FlinkFunctions.isAlpha("ab1"))
    assert(FlinkFunctions.isDecimal("-12.5") && FlinkFunctions.isDecimal("3") && !FlinkFunctions.isDecimal("1.2.3"))
    assert(FlinkFunctions.hashCode("abc") == "abc".hashCode)
  }

  test("SINGLE_VALUE returns the value for 1-row groups") {
    val s = spark
    import s.implicits._
    FlinkFunctions.registerAll(s)
    Seq((1, 2.5), (2, 3.5)).toDF("k", "v").createOrReplaceTempView("sv_ok")
    val out = s.sql("SELECT k, SINGLE_VALUE(v) AS sv FROM sv_ok GROUP BY k ORDER BY k")
      .as[(Int, Double)].collect().toSeq
    assert(out == Seq((1, 2.5), (2, 3.5)))
  }

  test("SINGLE_VALUE errors on multi-row groups") {
    val s = spark
    import s.implicits._
    FlinkFunctions.registerAll(s)
    Seq((1, 2.5), (1, 3.5)).toDF("k", "v").createOrReplaceTempView("sv_bad")
    val e = intercept[Exception] {
      s.sql("SELECT k, SINGLE_VALUE(v) AS sv FROM sv_bad GROUP BY k").collect()
    }
    assert(e.getMessage.contains("SINGLE_VALUE") ||
      Option(e.getCause).exists(_.getMessage.contains("SINGLE_VALUE")))
  }
}
