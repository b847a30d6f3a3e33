package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.ops.Dedup

/** Property tests: the byte-level native expressions must agree with the
  * composable Spark-SQL formulations on ANY text — unicode (multi-byte
  * UTF-8 must not confuse the 0x20 split scan), repeated/leading/trailing
  * spaces (empty words are legal tokens), empty strings, and single
  * words. Generators driven directly (scalatestplus bridge not in the
  * offline dep set).
  */
class NativeExprPropSpec extends SparkSpec {
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const(""),
    Gen.oneOf("é", "日本語", "𝒳", "naïve", "käse", "a.b", "x,y", "∑∆"),
    Gen.listOfN(3, Gen.choose('!', '~')).map(_.mkString))

  private val text: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", " ")
  } yield ws.mkString(sep)

  private def samples(n: Int): Seq[String] =
    (Iterator.continually(text.sample).flatten.take(n).toSeq ++
      Seq("", " ", "  ", "a", "a b", "a b c", " a b c ", "é ü ñ ø")).distinct

  test("native minhash signature == composable signature on random text") {
    val df = samples(300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val narrow = Dedup.minhashSignatureNarrow(df, "doc_id", "text")
    val exploded = Dedup.minhashSignature(Dedup.shinglesRaw(df, "doc_id", "text"))
    assert(narrow.exceptAll(exploded).isEmpty && exploded.exceptAll(narrow).isEmpty)
  }

  test("native simhash == composable simhash on random text") {
    val df = samples(300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val narrow = Dedup.simhashNarrow(df, "doc_id", "text")
    val exploded = Dedup.simhash(df, "doc_id", "text")
    assert(narrow.exceptAll(exploded).isEmpty && exploded.exceptAll(narrow).isEmpty)
  }

  test("native shingle jaccard == relational jaccard on random text pairs") {
    val texts = samples(40).filter(_.trim.split(" ").length >= 3)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").cache()
    val pairs = docs.select($"doc_id".as("id_a"))
      .crossJoin(docs.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b")
    val rel = Dedup.jaccardForPairs(pairs, Dedup.shingles(docs, "doc_id", "text"))
      .withColumnRenamed("jaccard", "jr")
    val nat = pairs
      .join(docs.select($"doc_id".as("id_a"), $"text".as("ta")), Seq("id_a"))
      .join(docs.select($"doc_id".as("id_b"), $"text".as("tb")), Seq("id_b"))
      .select($"id_a", $"id_b", ShingleJaccard($"ta", $"tb", 3).as("jn"))
    val cmp = rel.join(nat, Seq("id_a", "id_b"), "full_outer")
      .filter(coalesce($"jr", lit(0d)) =!= coalesce($"jn", lit(0d)))
    assert(cmp.isEmpty, cmp.limit(5).collect().mkString("\n"))
  }
}
