package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The ONE shingle-set construction shared by [[ShingleJaccard]] and
  * [[ShingleOverlap]] (and mirrored by the hashing loop in
  * [[MinHashSignature]]): word n-grams as byte ranges of the original
  * text, with Spark/DuckDB `split` semantics — empty words between
  * consecutive separators are kept. The DuckDB oracles depend on exactly
  * these semantics; keeping a single definition makes drift between the
  * two expressions impossible rather than merely commented against.
  */
private[functions] object Shingles {

  /** Word-start offsets of `bytes` under `split(text, " ", -1)`
    * semantics (empty words kept): `starts(w)` is word w's first byte,
    * with a sentinel at index `words` so word w spans
    * `[starts(w), starts(w+1) - 1)`. Returns (starts, wordCount). THE
    * single definition of the boundary scan — MinHashSignature and
    * ShingleArray share it, so split semantics cannot drift between the
    * kernels and the oracles that replay them.
    */
  def wordStarts(bytes: Array[Byte]): (Array[Int], Int) = {
    var words = 1
    var p = 0
    while (p < bytes.length) { if (bytes(p) == ' '.toByte) words += 1; p += 1 }
    val starts = new Array[Int](words + 1)
    var wi = 1
    p = 0
    while (p < bytes.length) {
      if (bytes(p) == ' '.toByte) { starts(wi) = p + 1; wi += 1 }
      p += 1
    }
    starts(words) = bytes.length + 1
    (starts, words)
  }

  /** Distinct word n-grams of `text`. A shingle of n consecutive words
    * joined by ' ' is exactly the original text's byte range covering
    * them (separators included), so no string assembly happens per
    * shingle — just an offset/length slice.
    */
  def shingleSet(text: UTF8String, n: Int): java.util.HashSet[String] = {
    val bytes = text.getBytes
    val (starts, words) = wordStarts(bytes)
    val m = words - n + 1
    val set = new java.util.HashSet[String](math.max(4, m * 2))
    if (m <= 0) return set
    var i = 0
    while (i < m) {
      // shingle i = original byte range covering words [i, i+n) incl. separators
      set.add(new String(bytes, starts(i), starts(i + n) - 1 - starts(i),
        java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    set
  }
}
