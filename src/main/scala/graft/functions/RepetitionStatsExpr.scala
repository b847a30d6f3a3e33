package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repetition quality signals (the Gopher / MassiveText
  * repetition filters, Rae et al. 2021 §A1.1) in ONE fused pass over the
  * text — the standard pre-training quality gate for boilerplate,
  * templated spam and generation loops. Returns
  * `[dup_segment_frac, dup_segment_char_frac, top_ngram_char_frac,
  * dup_ngram_char_frac]`:
  *
  *  - `dup_segment_frac`: (occurrences − distinct) / occurrences over
  *    `". "`-separated segments (the corpus's sentence/paragraph axis —
  *    same splitter as [[graft.ops.TextAnalysis.dedupSegments]]);
  *  - `dup_segment_char_frac`: characters inside segments that occur
  *    more than once (all their occurrences) / total segment characters;
  *  - `top_ngram_char_frac`: characters covered by all occurrences of
  *    the MOST frequent word n-gram / total text characters (ties break
  *    to the lexicographically smallest n-gram — deterministic);
  *  - `dup_ngram_char_frac`: characters covered by all occurrences of
  *    every n-gram occurring more than once / total text characters
  *    (occurrences overlap, so this can exceed 1 — reported raw, as a
  *    RANKING signal; the oracle reproduces the same definition).
  *
  * Empty text reports all zeros; a document with no n-gram (shorter
  * than n words) reports 0 for both n-gram fractions.
  *
  * Scale posture: a narrow per-row projection — no explode, no shuffle;
  * the within-document n-gram counting that would relationally cost a
  * 200x row blowup plus a (doc, ngram)-keyed shuffle happens in a local
  * hash map. At 100 TB the quality gate is one scan of the corpus.
  * All arithmetic is integer-count ratios over UTF-8 character counts —
  * engine-portable, DuckDB-reproducible.
  */
case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"need n>=1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(t: Any): Any =
    RepetitionStats.stats(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RepetitionStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $cls.stats($t, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  /** Column-API entry point: `RepetitionStats($"text", n = 2)`. */
  def apply(text: Column, n: Int): Column =
    Shim.column(RepetitionStats(Shim.expression(text), n))

  /** Split on a literal separator, keeping empties — Spark/DuckDB
    * `split`/`string_split` semantics, so the oracle agrees exactly.
    */
  private def splitKeepEmpties(s: String, sep: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    var i = s.indexOf(sep, from)
    while (i >= 0) {
      out += s.substring(from, i)
      from = i + sep.length
      i = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.toArray
  }

  def stats(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array[Any](0.0, 0.0, 0.0, 0.0))

    // ---- segment axis (". "-separated) --------------------------------
    val segs = splitKeepEmpties(s, ". ")
    val segCounts = new java.util.HashMap[String, Int](math.max(4, segs.length * 2))
    segs.foreach(g => segCounts.merge(g, 1, Integer.sum))
    var dupSegOcc = 0L
    var dupSegChars = 0L
    var totalSegChars = 0L
    val segIt = segCounts.entrySet().iterator()
    while (segIt.hasNext) {
      val e = segIt.next()
      val len = e.getKey.codePointCount(0, e.getKey.length).toLong
      val c = e.getValue.toLong
      totalSegChars += len * c
      if (c > 1) { dupSegOcc += c - 1; dupSegChars += len * c }
    }
    val dupSegFrac = (dupSegOcc.toDouble / segs.length.toDouble)
    val dupSegCharFrac =
      if (totalSegChars == 0) 0.0 else dupSegChars.toDouble / totalSegChars.toDouble

    // ---- word n-gram axis (space-separated, empties kept) -------------
    val words = splitKeepEmpties(s, " ")
    val m = words.length - n + 1
    val totalChars = s.codePointCount(0, s.length).toLong
    var topNgramCharFrac = 0.0
    var dupNgramCharFrac = 0.0
    if (m > 0 && totalChars > 0) {
      val grams = new java.util.HashMap[String, Int](math.max(4, m * 2))
      var i = 0
      while (i < m) {
        val g = words.slice(i, i + n).mkString(" ")
        grams.merge(g, 1, Integer.sum)
        i += 1
      }
      var topGram: String = null
      var topCnt = 0
      var dupChars = 0L
      val it = grams.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val g = e.getKey
        val c = e.getValue
        if (c > topCnt || (c == topCnt && (topGram == null || g.compareTo(topGram) < 0))) {
          topGram = g; topCnt = c
        }
        if (c > 1) dupChars += g.codePointCount(0, g.length).toLong * c
      }
      topNgramCharFrac =
        topGram.codePointCount(0, topGram.length).toLong * topCnt.toDouble / totalChars.toDouble
      dupNgramCharFrac = dupChars.toDouble / totalChars.toDouble
    }

    new GenericArrayData(
      Array[Any](dupSegFrac, dupSegCharFrac, topNgramCharFrac, dupNgramCharFrac))
  }
}
