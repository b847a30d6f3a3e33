package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL surface of the native expressions via SparkSessionExtensions
  * injection: the SQL names and the Column API must build the SAME
  * expression classes and return identical values.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("simhash64 SQL == Column API") {
    val got = spark.sql("SELECT simhash64('the quick brown fox') AS s").as[Long].head()
    val want = Seq("the quick brown fox").toDF("t")
      .select(SimHash($"t").as("s")).as[Long].head()
    assert(got == want)
  }

  test("minhash_signature SQL == Column API, literal-arg validation") {
    val got = spark.sql("SELECT minhash_signature('a b c d e', 3, 6) AS s")
      .as[Seq[String]].head()
    val want = Seq("a b c d e").toDF("t")
      .select(MinHashSignature($"t", 3, 6).as("s")).as[Seq[String]].head()
    assert(got == want && got.length == 6)
    val e = intercept[Exception](
      spark.sql("SELECT minhash_signature('a b c', 3, k) FROM (SELECT 6 AS k)").collect())
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("cosine_sim and shingle_jaccard run from SQL over a table") {
    spark.sql("SELECT CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>) AS a, " +
        "CAST(array(2.0, 4.0) AS ARRAY<DOUBLE>) AS b")
      .createOrReplaceTempView("v")
    val cos = spark.sql("SELECT cosine_sim(a, b) AS c FROM v").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12)
    val j = spark.sql(
      "SELECT shingle_jaccard('a b c d', 'a b c e', 3) AS j").as[Double].head()
    // shingles: {a b c, b c d} vs {a b c, b c e} -> 1/3
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("shingle_array and shingle_overlap run from SQL") {
    val arr = spark.sql("SELECT shingle_array('a b c d', 3) AS s")
      .as[Seq[String]].head()
    assert(arr == Seq("a b c", "b c d"))
    val ov = spark.sql("SELECT shingle_overlap('a b c d', 'a b c e', 3) AS o")
      .as[Seq[Long]].head()
    assert(ov == Seq(1L, 2L, 2L)) // |A∩B|, |A|, |B|
  }

  test("the SQL path uses the native expression (no UDF) in the plan") {
    spark.range(1).selectExpr("'x y z' AS t").createOrReplaceTempView("docs_v")
    val p = spark.sql("SELECT simhash64(t) FROM docs_v")
      .queryExecution.executedPlan.toString
    assert(p.contains("simhash64"), p.take(300))
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p.take(300))
  }
}
