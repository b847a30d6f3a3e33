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

  test("bpe_encode reconstruction invariant: symbols concatenate back to the word") {
    val rnd = new scala.util.Random(11)
    val words = (Iterator.continually(word.sample).flatten
      .filter(_.nonEmpty).take(200).toSeq ++
      Seq("llll", "ababab", "日本語日本", "aaaa", "xyzzy")).distinct
    // random single-char rules drawn from the words' own alphabet, so
    // merges genuinely fire
    val alphabet = words.flatMap(_.toSeq).distinct
    val rules = (0 until 12).map { _ =>
      s"${alphabet(rnd.nextInt(alphabet.size))} ${alphabet(rnd.nextInt(alphabet.size))}"
    }
    val out = words.toDF("w")
      .select($"w", BpeEncode($"w", typedLit(rules)).as("syms"))
      .as[(String, Seq[String])].collect()
    out.foreach { case (w, syms) =>
      assert(syms.mkString == w, s"'$w' -> $syms loses content")
      assert(syms.forall(_.nonEmpty), s"'$w' -> $syms has empty symbols")
    }
  }

  test("pq encode/adc agree with a scalar brute-force reference on random vectors") {
    val rnd = new scala.util.Random(23)
    val m = 4; val ks = 8; val dsub = 4; val dim = m * dsub
    val cb = Array.fill(m * ks)(Array.fill(dsub)(rnd.nextGaussian()))
    val vecs = (0 until 120).map(i => i.toLong -> Array.fill(dim)(rnd.nextGaussian()))
    def l2(a: Array[Double], off: Int, w: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < w.length) { val d = a(off + i) - w(i); s += d * d; i += 1 }
      s
    }
    def refEncode(v: Array[Double]): Seq[Int] =
      (0 until m).map { mi =>
        (0 until ks).minBy(c => (l2(v, mi * dsub, cb(mi * ks + c)), c))
      }
    val cbLit = typedLit(cb.map(_.toSeq).toSeq)
    val got = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
      .select($"id", PqEncode($"v", cbLit, ks).as("codes"),
        PqAdc($"v", PqEncode($"v", cbLit, ks), cbLit, ks).as("adc"))
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    got.foreach { case (id, codes, adc) =>
      val v = vecs(id.toInt)._2
      val exp = refEncode(v)
      assert(codes == exp, s"vec $id: $codes vs $exp")
      val expAdc = (0 until m).map(mi => l2(v, mi * dsub, cb(mi * ks + codes(mi)))).sum
      assert(math.abs(adc - expAdc) < 1e-12, s"vec $id adc $adc vs $expAdc")
    }
  }
}
