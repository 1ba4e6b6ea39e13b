package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.JsonFlatten

class JsonFlattenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fromJson(lines: String*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.json(lines.toDS)
  }

  test("nested dicts join keys with underscore, decamelized") {
    val df = fromJson("""{"userId":"u1","context":{"appVersion":"1.2","os":{"name":"ios"}}}""")
    val flat = JsonFlatten.flatten(df)
    assert(flat.columns.toSet == Set("user_id", "context_app_version", "context_os_name"))
    val r = flat.head()
    assert(r.getAs[String]("context_os_name") == "ios")
  }

  test("arrays flatten positionally, one row per event, null-padded") {
    val df = fromJson(
      """{"id":1,"items":[{"sku":"s1"},{"sku":"s2"}]}""",
      """{"id":2,"items":[{"sku":"s3"}]}""")
    val flat = JsonFlatten.flatten(df)
    assert(flat.count() == 2) // no explode
    assert(flat.columns.toSet == Set("id", "items_0_sku", "items_1_sku"))
    val byId = flat.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("items_0_sku") == "s1")
    assert(byId(1L).getAs[String]("items_1_sku") == "s2")
    assert(byId(2L).getAs[String]("items_0_sku") == "s3")
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("items_1_sku")))
  }

  test("observed max array length bounds expansion") {
    val df = fromJson("""{"a":[1,2,3]}""", """{"a":[4]}""")
    assert(JsonFlatten.observeArrayLengths(df) == Map("a" -> 3))
    val flat = JsonFlatten.flatten(df)
    assert(flat.columns.toSet == Set("a_0", "a_1", "a_2"))
  }

  test("arrays nested inside array-of-struct use observed lengths, not the default") {
    val df = fromJson(
      """{"id":1,"a":[{"b":[1,2,3]},{"b":[4]}]}""",
      """{"id":2,"a":[{"b":[5,6]}]}""")
    // observation keys use '*' for positional segments; the flatten lookup
    // must resolve the same keys (ADVICE r1: it used concrete indices and
    // always fell back to defaultLen=16)
    val lens = JsonFlatten.observeArrayLengths(df)
    assert(lens("a") == 2 && lens("a.*.b") == 3)
    val flat = JsonFlatten.flatten(df)
    val bCols = flat.columns.filter(_.matches("a_\\d+_b_\\d+")).toSet
    assert(bCols == Set("a_0_b_0", "a_0_b_1", "a_0_b_2", "a_1_b_0", "a_1_b_1", "a_1_b_2"))
    val r1 = flat.filter(flat("id") === 1).head()
    assert(r1.getAs[Long]("a_0_b_2") == 3L)
    assert(r1.getAs[Long]("a_1_b_0") == 4L)
    assert(r1.isNullAt(r1.fieldIndex("a_1_b_1")))
  }

  test("keys are cleaned: strip, spaces dropped, :/- to underscore") {
    val df = fromJson("""{"bad-key: name":1,"With Space":{"x-y":2}}""")
    val flat = JsonFlatten.flatten(df)
    // reference clean order: strip, drop spaces, then ':'/'-' -> '_'
    // (seghouse/util/json_util.py:23-24): " bad-key: name" -> "bad_key_name"
    assert(flat.columns.toSet == Set("bad_key_name", "with_space_x_y"))
  }
}
