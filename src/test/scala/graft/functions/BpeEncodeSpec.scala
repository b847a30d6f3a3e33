package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the BPE encode kernel: non-overlapping left-to-right
  * fusion, rule priority, symbol-boundary integrity, and the SQL
  * registration path.
  */
class BpeEncodeSpec extends SparkSpec {

  import spark.implicits._

  private def enc(word: String, merges: Seq[String]): Seq[String] =
    Seq(word).toDF("w")
      .select(BpeEncode(col("w"), typedLit(merges)).as("t"))
      .as[Seq[String]].head()

  test("run of an a==b rule fuses non-overlapping left-to-right") {
    // llll under (l,l): [ll][ll], never [lll][l]
    assert(enc("llll", Seq("l l")) == Seq("ll", "ll"))
    assert(enc("lllll", Seq("l l")) == Seq("ll", "ll", "l"))
    assert(enc("lll", Seq("l l")) == Seq("ll", "l"))
  }

  test("rules apply in array order; earlier merges shadow later ones") {
    // (h,e) first consumes the h+e; the later (e,l) then has no lone e
    assert(enc("hello", Seq("h e", "e l", "l o")) ==
      Seq("he", "l", "lo"))
    // reversed priority: (e,l) eats the e before (h,e) can
    assert(enc("hello", Seq("e l", "h e", "l o")) ==
      Seq("h", "el", "lo"))
  }

  test("fused symbols never match a single-char rule side") {
    // after (a,b)→ab, rule (b,c) must not fire on the b inside "ab"
    assert(enc("abc", Seq("a b", "b c")) == Seq("ab", "c"))
    // but a rule naming the fused symbol itself does fire
    assert(enc("abc", Seq("a b", "ab c")) == Seq("abc"))
  }

  test("degenerate inputs: single char, no applicable rule, empty merges") {
    assert(enc("x", Seq("l l")) == Seq("x"))
    assert(enc("xyz", Seq("a b")) == Seq("x", "y", "z"))
    assert(enc("xyz", Seq.empty) == Seq("x", "y", "z"))
  }

  test("SQL surface: bpe_encode registered via extensions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT bpe_encode('hello', array('l l', 'h e')) AS t")
      .as[Seq[String]].head()
    assert(r == Seq("he", "ll", "o"))
  }
}
