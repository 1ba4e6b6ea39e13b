package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.util.Names
import graft.etl.Normalize

class NamesSpec extends AnyFunSuite {

  test("decamelize handles camel, pascal, acronyms, digits") {
    assert(Names.decamelize("camelCaseKey") == "camel_case_key")
    assert(Names.decamelize("PascalCase") == "pascal_case")
    assert(Names.decamelize("ABCDef") == "abc_def")
    assert(Names.decamelize("a1B") == "a1_b")
    assert(Names.decamelize("already_snake") == "already_snake")
    assert(Names.decamelize("UPPER") == "upper")
  }

  test("cleanEventKey strips and replaces separators") {
    assert(Names.cleanEventKey(" bad-key: name ") == "bad_key_name")
    assert(Names.cleanEventKey("a b") == "ab")
  }

  test("normalizeEventName matches reference chain") {
    assert(Names.normalizeEventName("Product Added&Removed") == "product_addedand_removed")
    assert(Names.normalizeEventName("Users") == "users")
    assert(Names.normalizeEventName("checkoutStarted") == "checkout_started")
  }

  test("column-value normalization equals driver-side string normalization") {
    val spark = TestSpark.spark
    import spark.implicits._
    val samples = Seq("Product Added&Removed", "Users", "checkoutStarted",
      "ABCDef thing", "x1Y", "S&P 500Index", "  spaced  out  ")
    val viaCol = samples.toDF("e")
      .select(Normalize.normalizeEventNameCol(col("e")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(viaCol == samples.map(Names.normalizeEventName))
  }
}
