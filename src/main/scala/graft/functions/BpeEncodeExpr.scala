package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE subword segmentation of ONE word against an ordered merge table —
  * the tokenizer APPLICATION step that pairs with the merge MINING
  * statistic (`q_bpe_merges`, reference Sennrich et al. 2016 §3.2).
  *
  * `merges` is an array of `"a b"` rules (two space-separated symbols),
  * highest priority first. The word starts as its sequence of Unicode
  * code points; each rule is applied in array order as ONE left-to-right
  * fold over the current symbol sequence: whenever the previous surviving
  * symbol is exactly `a` and the current symbol is exactly `b`, the two
  * fuse into `a+b` (a just-fused symbol never re-fuses with the next
  * input on the same rule — standard non-overlapping BPE semantics, so a
  * run `llll` under rule `l l` yields `ll ll`, not `lll l`). Returns the
  * surviving symbol sequence.
  *
  * Determinism: output is a pure function of (word, merges); the merge
  * table's order IS the priority. The fold is reproducible in ANSI-ish
  * SQL (`list_reduce` over a split string), which is how the DuckDB
  * oracle replays it symbol-for-symbol.
  *
  * Scale posture: encode runs over the word-frequency table (vocabulary-
  * sized, not corpus-sized) with the merge table broadcast — a narrow
  * projection, no shuffle; downstream token counts weight by word
  * frequency. Cost per word is O(rules × symbols).
  */
case class BpeEncode(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeEncode.encode(w.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeEncode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (w, m) => s"${ev.value} = $cls.encode($w, $m);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {

  /** Column-API entry point: `BpeEncode($"word", $"merges")`. */
  def apply(word: Column, merges: Column): Column =
    Shim.column(BpeEncode(Shim.expression(word), Shim.expression(merges)))

  /** One word → its subword symbols under the ordered merge rules. */
  def encode(word: UTF8String, merges: ArrayData): GenericArrayData = {
    val s = word.toString
    // initial symbols: one per Unicode code point (matches the oracle's
    // character-based substring, and q_bpe_merges' pair mining)
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(s.substring(i, i + n))
      i += n
    }
    val nRules = merges.numElements()
    var r = 0
    while (r < nRules && syms.size > 1) {
      // a null or separator-less element is an inert rule, not an error —
      // SQL callers can hand-build merge arrays
      val ruleU = if (merges.isNullAt(r)) null else merges.getUTF8String(r)
      val rule = if (ruleU == null) "" else ruleU.toString
      val sp = rule.indexOf(' ')
      if (sp > 0) {
        val a = rule.substring(0, sp)
        val b = rule.substring(sp + 1)
        val out = new java.util.ArrayList[String](syms.size)
        var j = 0
        var lastFused = false
        while (j < syms.size) {
          val cur = syms.get(j)
          if (!out.isEmpty && !lastFused && out.get(out.size - 1) == a
              && cur == b) {
            out.set(out.size - 1, a + b)
            lastFused = true
          } else {
            out.add(cur)
            lastFused = false
          }
          j += 1
        }
        syms = out
      }
      r += 1
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) {
      arr(k) = UTF8String.fromString(syms.get(k))
      k += 1
    }
    new GenericArrayData(arr)
  }
}
