package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the custom Catalyst expressions (reference gap
  * functions, SqlFunctionUtils.java semantics) — both the codegen path
  * (DataFrame select) and SQL registration. */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = StreamHarness.spark
  import GraftFunctions._

  private def evalOne(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head.get(0)
  }

  test("is_alpha") {
    assert(evalOne(is_alpha(lit("Hello"))) == true)
    assert(evalOne(is_alpha(lit("Hello1"))) == false)
    assert(evalOne(is_alpha(lit(""))) == false)
    assert(evalOne(is_alpha(lit(null).cast("string"))) == null)
  }

  test("is_digit / is_decimal") {
    assert(evalOne(is_digit(lit("0123"))) == true)
    assert(evalOne(is_digit(lit("12a"))) == false)
    assert(evalOne(is_decimal(lit("-12.5"))) == true)
    assert(evalOne(is_decimal(lit(".5"))) == true)
    assert(evalOne(is_decimal(lit("1e5"))) == false)
  }

  test("split_index 0-based with out-of-range null") {
    assert(evalOne(split_index(lit("a,b,c"), lit(","), lit(1))) == "b")
    assert(evalOne(split_index(lit("a,b,c"), lit(","), lit(5))) == null)
    assert(evalOne(split_index(lit("a..b"), lit("."), lit(1))) == "")
  }

  test("SQL registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT is_alpha('abc') a, is_digit('12') d, split_index('x:y', ':', 1) s").head
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getString(2) == "y")
  }
}
