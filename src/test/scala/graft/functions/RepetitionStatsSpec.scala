package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the fused Gopher-style repetition kernel:
  * segment-axis fractions, n-gram character fractions, tie-breaks, and
  * the degenerate short/empty inputs.
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String, n: Int = 2): Seq[Double] =
    Seq((1L, text)).toDF("id", "t")
      .select(RepetitionStats(col("t"), n).as("rs"))
      .head().getAs[scala.collection.Seq[Double]]("rs").toSeq

  test("duplicated segments and bigrams measured by count and char mass") {
    // segments of "a b. a b. c" on '. ': ["a b","a b","c"] -> 1 dup occ of 3,
    // dup chars 6 of 7; words: [a, b., a, b., c] -> bigram "a b." twice
    // (8 chars of the 11-char text), and it is also the top bigram
    val s = stats("a b. a b. c")
    assert(s(0) == 1.0 / 3)
    assert(s(1) == 6.0 / 7)
    assert(s(2) == 8.0 / 11)
    assert(s(3) == 8.0 / 11)
  }

  test("top-ngram tie breaks to the lexicographically smallest gram") {
    // "x y z": bigrams "x y" and "y z" both once; top = "x y" (3 of 5 chars)
    val s = stats("x y z")
    assert(s == Seq(0.0, 0.0, 3.0 / 5, 0.0))
  }

  test("degenerate inputs: empty text and sub-n-gram docs report zeros") {
    assert(stats("") == Seq(0.0, 0.0, 0.0, 0.0))
    assert(stats("w") == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("SQL surface plans the same expression as the Column API") {
    GraftFunctions.register(spark)
    val sqlRow = spark.sql(
      "SELECT repetition_stats('a b. a b. c', 2) AS rs")
      .head().getAs[scala.collection.Seq[Double]]("rs").toSeq
    assert(sqlRow == stats("a b. a b. c"))
  }
}
