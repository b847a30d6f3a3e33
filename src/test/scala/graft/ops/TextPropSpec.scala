package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Properties the dedup/similarity portability story rests on, checked
  * over arbitrary input instead of curated fixtures. normalizeText is the
  * dedup KEY function — if it is not idempotent or emits characters
  * outside its documented alphabet, "normalization-level duplicate"
  * stops being a stable equivalence class across engines. Cosine is the
  * semantic-dedup/ANN metric — out-of-range values silently corrupt
  * top-k ordering and threshold filters.
  */
class TextPropSpec extends SparkSpec {
  import spark.implicits._

  private val anyText: Gen[String] = for {
    n <- Gen.choose(0, 14)
    ws <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const(""),
      Gen.oneOf("é", "日本語", "𝒳", "naïve", "A.B", "x,,y", "∑∆", "Tab\there",
        "CRLF\r\n", "semi;colon", "UPPER", "MiXeD123"),
      Gen.listOfN(4, Gen.choose('!', '~')).map(_.mkString)))
    sep <- Gen.oneOf(" ", "  ", "   ")
  } yield ws.mkString(sep)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("normalizeText is idempotent and stays inside its alphabet on arbitrary text") {
    val texts = samples(anyText, 200)
    val rows = texts.toDF("text")
      .select(
        TextAnalysis.normalizeText(col("text")).as("n1"),
        TextAnalysis.normalizeText(TextAnalysis.normalizeText(col("text"))).as("n2"))
      .collect()
    rows.foreach { r =>
      val (n1, n2) = (r.getString(0), r.getString(1))
      assert(n1 == n2, s"not idempotent: '$n1' -> '$n2'")
      assert(n1.forall(c => c == ' ' || c.isDigit || (c >= 'a' && c <= 'z')),
        s"alphabet escape: '$n1'")
      assert(!n1.contains("  "), s"space run survived: '$n1'")
      assert(n1 == n1.trim, s"untrimmed: '$n1'")
    }
  }

  test("cosine similarity is bounded, symmetric, and 1 on self for arbitrary vectors") {
    val vec: Gen[Seq[Float]] = for {
      n <- Gen.const(8)
      xs <- Gen.listOfN(n, Gen.choose(-5.0f, 5.0f))
    } yield xs
    val pairs = samples(vec, 80).grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
      .filter { case (a, b) => a.exists(_ != 0f) && b.exists(_ != 0f) }
    val got = pairs.toDF("a", "b")
      .select(
        Similarity.cosine(col("a"), col("b")).as("ab"),
        Similarity.cosine(col("b"), col("a")).as("ba"),
        Similarity.cosine(col("a"), col("a")).as("aa"))
      .collect()
    got.foreach { r =>
      val (ab, ba, aa) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(ab) <= 1.0 + 1e-9, s"out of range: $ab")
      assert(ab == ba, s"asymmetric: $ab vs $ba")
      assert(math.abs(aa - 1.0) <= 1e-6, s"self-cosine $aa")
    }
  }
}
