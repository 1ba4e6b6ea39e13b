package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.VectorFunctions

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0f, 0.0f, 1.0f), Array(1.0, 0.0, 0.0))
  ).toDF("id", "f", "d")

  test("native dot/norm/cosine match the HOF formulation bit-for-bit") {
    val hofDot = aggregate(zip_with($"f", $"d", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val r = df.select(
      VectorFunctions.dot($"f", $"d").as("nd"), hofDot.as("hd"),
      VectorFunctions.norm($"d").as("nn"),
      sqrt(aggregate(zip_with($"d", $"d", (x, y) => x * y), lit(0.0), (a, x) => a + x)).as("hn"),
      VectorFunctions.cosine($"f", $"d").as("nc")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1)) // dot exact
      assert(row.getDouble(2) == row.getDouble(3)) // norm exact
    }
    val first = r(0)
    assert(first.getDouble(0) == 32.0)
    assert(first.getDouble(4) == 32.0 / (math.sqrt(14.0) * math.sqrt(77.0)))
  }

  test("null array yields null; mixed float/double works") {
    val withNull = Seq((1L, null: Array[Float], Array(1.0, 2.0))).toDF("id", "f", "d")
    val out = withNull.select(VectorFunctions.dot($"f", $"d").as("v")).head()
    assert(out.isNullAt(0))
  }

  test("SQL surface: graft_dot/graft_cosine/graft_norm registered") {
    VectorFunctions.register(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT graft_dot(f, d) AS gd, graft_cosine(f, f) AS gc, graft_norm(d) AS gn FROM vecs WHERE id = 1"
    ).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12) // self-cosine
    assert(r.getDouble(2) == math.sqrt(77.0))
  }

  test("SQL surface: sketch functions registered and extensions cover every builder") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_shingle_hashes(array('a','b','c','d'), 3) AS sh,
                graft_minhash(graft_shingle_hashes(array('a','b','c','d'), 3), 8) AS mh,
                graft_simhash(array(1L, 2L, 3L)) AS sim""").head()
    assert(r.getSeq[Long](0).length == 2) // 4 tokens, n=3 -> 2 shingles
    assert(r.getSeq[Long](1).length == 8)
    // portable family + repetition stats through SQL
    val p = spark.sql(
      """SELECT graft_md5_hash64(array('abc')) AS h,
                graft_md5_shingle_hashes(array('a','b','c'), 2) AS sh,
                graft_affine_minhash(graft_md5_hash64(array('a','b')), 4) AS mh,
                graft_repetition_stats(array('a','b','a','b','a'), 2) AS rep""").head()
    assert(p.getSeq[Long](0) ==
      Seq(java.lang.Long.parseUnsignedLong("900150983cd24fb0", 16)))
    assert(p.getSeq[Long](1).length == 2)
    assert(p.getSeq[Long](2).length == 4)
    assert(p.getStruct(3).getLong(0) == 4L && p.getStruct(3).getLong(2) == 4L)
    // every builder name resolves on the session after register()
    Seq("graft_dot", "graft_cosine", "graft_norm", "graft_minhash",
        "graft_simhash", "graft_shingle_hashes", "graft_md5_hash64",
        "graft_md5_shingle_hashes", "graft_affine_minhash",
        "graft_repetition_stats").foreach { f =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(f)), f)
    }
    // GraftExtensions injects the SAME builder list (single source of
    // truth) — applying it to a fresh extensions object must accept every
    // builder (a new SparkContext can't be built in the shared test JVM).
    new graft.plans.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("whole-stage codegen handles the expression (no fallback errors at scale)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.limit(1).select($"embedding").head().getSeq[Float](0).map(_.toDouble)
    val qc = array(q.map(lit): _*)
    val scored = emb.select(VectorFunctions.cosine($"embedding", qc).as("s"))
    assert(scored.count() == 500)
    assert(scored.filter($"s".isNotNull && $"s".between(-1.000001, 1.000001)).count() == 500)
  }
}
