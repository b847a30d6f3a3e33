package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.ops.Dedup

/** Specs for the native MinHashSignature / ShingleJaccard expressions:
  * value parity with the composable (exploded SQL-aggregate) forms on
  * real data, plus split-semantics edge cases (multi-space, short docs).
  */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("native minhash signature == exploded groupBy signature on documents") {
    val docs = Tables.documents(spark, sf)
    val narrow = Dedup.minhashSignatureNarrow(docs, "doc_id", "text")
    val exploded = Dedup.minhashSignature(
      Dedup.shinglesRaw(docs, "doc_id", "text"))
    assert(narrow.count() === exploded.count())
    assert(narrow.exceptAll(exploded).isEmpty && exploded.exceptAll(narrow).isEmpty)
  }

  test("minhash signature split semantics: multi-space and short docs") {
    val df = Seq(
      (1L, "a  b c d"),          // empty word from double space
      (2L, "one two"),           // < 3 words -> excluded
      (3L, "x y z"),             // exactly one shingle
      (4L, " lead and trail ")   // leading/trailing empties are words
    ).toDF("doc_id", "text")
    val narrow = Dedup.minhashSignatureNarrow(df, "doc_id", "text")
    val exploded = Dedup.minhashSignature(Dedup.shinglesRaw(df, "doc_id", "text"))
    assert(narrow.exceptAll(exploded).isEmpty && exploded.exceptAll(narrow).isEmpty)
    assert(narrow.filter($"id" === 2L).isEmpty)
  }

  test("native shingle_array == composable HOF form on documents and edges") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .unionByName(Seq(
        (100001L, "a  b c d"),        // empty word from double space
        (100002L, "one two"),         // < 3 words -> empty array
        (100003L, "x y z"),           // exactly one shingle
        (100004L, " lead and trail ") // leading/trailing empties are words
      ).toDF("doc_id", "text"))
    val both = docs.select($"doc_id",
      graft.ops.TextAnalysis.shingleArray($"text", 3).as("nat"),
      graft.ops.TextAnalysis.shingleArrayComposable($"text", 3).as("comp"))
    assert(both.filter(not($"nat" <=> $"comp")).isEmpty)
    assert(both.filter($"doc_id" === 100002L).select(size($"nat"))
      .as[Int].head() === 0)
  }

  test("shingle jaccard matches the relational shingle-join formulation") {
    val docs = Tables.documents(spark, sf).limit(50).cache()
    val pairs = docs.select($"doc_id".as("id_a"))
      .crossJoin(docs.select($"doc_id".as("id_b")))
      .filter($"id_a" < $"id_b")
    val relational = Dedup.jaccardForPairs(
        pairs, Dedup.shingles(docs, "doc_id", "text"))
      .withColumnRenamed("jaccard", "j_rel")
    val native = pairs
      .join(docs.select($"doc_id".as("id_a"), $"text".as("ta")), Seq("id_a"))
      .join(docs.select($"doc_id".as("id_b"), $"text".as("tb")), Seq("id_b"))
      .select($"id_a", $"id_b", ShingleJaccard($"ta", $"tb", 3).as("j_nat"))
    val joined = relational.join(native, Seq("id_a", "id_b"), "full_outer")
      // relational form omits zero-intersection pairs (inner shingle join);
      // the native form returns 0.0 there
      .filter(coalesce($"j_nat", lit(0d)) =!= 0d || $"j_rel".isNotNull)
    assert(joined.filter(abs($"j_rel" - $"j_nat") > 1e-12).isEmpty)
  }

  test("shingle jaccard edge cases") {
    val df = Seq(
      (1L, "a b c", "a b c"),     // identical -> 1.0
      (2L, "a b c", "x y z"),     // disjoint -> 0.0
      (3L, "a b", "a b c"),       // left has no shingles -> 0.0
      (4L, "a b", "c d")          // both empty -> null
    ).toDF("id", "ta", "tb")
    val out = df.select($"id", ShingleJaccard($"ta", $"tb", 3).as("j"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === 0.0)
    assert(out(3L) === 0.0)
    assert(out(4L) === null)
  }

  test("native simhash == exploded vote-sum simhash on documents") {
    val docs = Tables.documents(spark, sf)
    val narrow = Dedup.simhashNarrow(docs, "doc_id", "text")
    val exploded = Dedup.simhash(docs, "doc_id", "text")
    assert(narrow.exceptAll(exploded).isEmpty && exploded.exceptAll(narrow).isEmpty)
  }

  test("native simhash edge cases: empty string and multi-space tokens") {
    val df = Seq((1L, ""), (2L, "a  b"), (3L, "x")).toDF("doc_id", "text")
    val narrow = Dedup.simhashNarrow(df, "doc_id", "text")
    val exploded = Dedup.simhash(df, "doc_id", "text")
    assert(narrow.exceptAll(exploded).isEmpty && exploded.exceptAll(narrow).isEmpty)
  }

  test("lshCandidates super-bucket cap drops only oversized buckets") {
    val doc = "the same boilerplate text repeated in every mirror page here"
    val docs = ((1L to 50L).map(i => (i, doc)) ++
      Seq((100L, "one unique document about something else entirely"),
          (101L, "one unique document about something else entirely")))
      .toDF("doc_id", "text")
    val bands = Dedup.lshBands(Dedup.minhashSignatureNarrow(docs, "doc_id", "text"))
    // uncapped: the 50-clone bucket contributes 50*49/2 pairs
    assert(Dedup.lshCandidates(bands).count() === 50L * 49 / 2 + 1)
    // capped at 10: boilerplate buckets dropped, the small pair survives
    val capped = Dedup.lshCandidates(bands, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(capped === Set((100L, 101L)))
  }

  test("minhash signature of null text is null row-filtered") {
    val df = Seq((1L, Some("a b c d")), (2L, None))
      .toDF("doc_id", "text")
    assert(Dedup.minhashSignatureNarrow(df, "doc_id", "text").count() === 1)
  }

  test("cosine_sim: null elements and mismatched lengths yield NULL, not a wrong number") {
    // a null slot read as 0.0 and a silent truncation to the shorter
    // length both produce confident wrong similarities — the composable
    // form returns NULL for both, and the native kernel must agree
    val withNull = Seq(Tuple1(1)).toDF("x")
      .select(CosineSimilarity(
        expr("array(1.0d, cast(null as double), 3.0d)"),
        expr("array(1.0d, 2.0d, 3.0d)")).as("s"))
    assert(withNull.head().isNullAt(0), "null element must yield NULL")
    val mismatched = Seq(Tuple1(1)).toDF("x")
      .select(CosineSimilarity(
        expr("array(1.0d, 2.0d)"),
        expr("array(1.0d, 2.0d, 3.0d)")).as("s"))
    assert(mismatched.head().isNullAt(0), "length mismatch must yield NULL")
    // equal-length non-null still computes (and matches the HOF form)
    val ok = Seq((Seq(1.0f, 2.0f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val native = ok.select(CosineSimilarity($"a", $"b")).as[Double].head()
    val hof = ok.select(graft.ops.Similarity.cosineHof($"a", $"b")).as[Double].head()
    assert(native == hof && math.abs(native - 1.0) < 1e-12)
  }

  test("cosine_sim: a zero-norm vector yields NULL, never the NaN that wins top-k") {
    // 0/0 = NaN and Spark orders NaN ABOVE every real double — one
    // all-zero embedding (failed embedding job, padding row) would
    // outrank every sim=1.0 match in ORDER BY sim DESC. Both forms must
    // return NULL (sorts last under desc, fails every >= threshold).
    // DuckDB returns -1.0 here — the contract is pinned engine-side; the
    // oracle corpora carry no zero vectors.
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(z.select(CosineSimilarity($"a", $"b")).head().isNullAt(0),
      "native kernel must NULL a zero-norm side")
    assert(z.select(graft.ops.Similarity.cosineHof($"a", $"b")).head().isNullAt(0),
      "HOF form must NULL a zero-norm side")
    // a zero vector never displaces a real match from a descending top-k
    val ranked = Seq(
        (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("id", "v")
      .select($"id", CosineSimilarity($"v",
        expr("array(cast(1.0 as float), cast(0.0 as float))")).as("sim"))
      .orderBy($"sim".desc, $"id")
      .select("id").as[Long].collect().toSeq
    assert(ranked.take(2) == Seq(1L, 3L),
      s"zero vector must rank LAST, got order $ranked")
  }

  test("decryptToken is null-safe on corrupt tokens (no job-killing throw)") {
    GraftFunctions.register(spark)
    val df = Seq(("ok", "0123456789abcdef"), ("bad", "0123456789abcdef"))
      .toDF("label", "key")
    val enc = df.filter($"label" === "ok")
      .select(graft.functions.Security.encryptToken(lit("hello"), "0123456789abcdef").as("t"))
      .as[String].head()
    val roundtrip = Seq(Tuple1(enc)).toDF("t")
      .select(graft.functions.Security.decryptToken($"t", "0123456789abcdef").as("p"))
      .as[String].head()
    assert(roundtrip == "hello")
    // corrupt base64 payload: NULL, not a GCM-tag exception killing the task
    val corrupt = Seq(Tuple1("AAAAAAAAAAAAAAAAAAAAAA==")).toDF("t")
      .select(graft.functions.Security.decryptToken($"t", "0123456789abcdef"))
    assert(corrupt.head().isNullAt(0))
  }

  test("quantize8/dequantize8: native kernels match the HOF reference on fixtures") {
    // the fixture corpus (float arrays) through both forms — struct AND
    // roundtrip must agree value-for-value, or the SQ8 recall audit and
    // the quantized IVF extract silently diverge from the oracle
    val emb = Tables.embeddings(spark, sf).limit(50)
    val both = emb.select(
      graft.ops.Similarity.quantize8($"embedding").as("nat"),
      graft.ops.Similarity.quantize8Hof($"embedding").as("hof"),
      graft.ops.Similarity.dequantize8(
        graft.ops.Similarity.quantize8($"embedding")).as("nat_rt"),
      graft.ops.Similarity.dequantize8Hof(
        graft.ops.Similarity.quantize8Hof($"embedding")).as("hof_rt"))
    assert(both.filter($"nat" =!= $"hof").count() === 0,
      "native quantize8 must equal the HOF reference")
    assert(both.filter($"nat_rt" =!= $"hof_rt").count() === 0,
      "native roundtrip must equal the HOF roundtrip")
  }

  test("quantize8: HALF_UP rounding boundaries and degenerate vectors match the HOF form") {
    // maxabs = 127 makes x/maxabs*127 = x, so .5 values sit exactly on
    // the rounding boundary: HALF_UP goes away from zero on both signs
    val vecs = Seq(
      Seq(127.0, 2.5, -2.5, 0.4999, -0.5),
      Seq(0.0, 0.0),             // all-zero: scale 0 + zero codes
      Seq.empty[Double])         // empty: scale 0 + empty codes
      .map(Tuple1(_)).toDF("v")
    val rows = vecs.select(
      graft.ops.Similarity.quantize8($"v").as("nat"),
      graft.ops.Similarity.quantize8Hof($"v").as("hof")).collect()
    rows.foreach { r => assert(r.get(0) === r.get(1), s"mismatch: $r") }
    val q = rows.head.getStruct(0).getSeq[Byte](1)
    assert(q === Seq[Byte](127, 3, -3, 0, -1), "HALF_UP away from zero")
    // null elements survive quantize (null code) and dequantize (null slot)
    val withNull = Seq(Tuple1(1)).toDF("x")
      .select(expr("array(1.0d, cast(null as double), -1.0d)").as("v"))
    val natQ = withNull.select(
      graft.ops.Similarity.quantize8($"v").as("nat"),
      graft.ops.Similarity.quantize8Hof($"v").as("hof"),
      graft.ops.Similarity.dequantize8(
        graft.ops.Similarity.quantize8($"v")).as("rt")).head()
    assert(natQ.getStruct(0) === natQ.getStruct(1))
    assert(natQ.getSeq[Any](2) === Seq(1.0, null, -1.0))
  }

  test("quantize8: operation ORDER regression — divide-then-multiply, not reciprocal") {
    // maxabs=3.0, x=0.22440944881889763: x/3*127 = 9.4999…96 (rounds to 9,
    // the HOF/oracle value) while x*(127/3) = exactly 9.5 (rounds to 10).
    // A reciprocal-form native kernel passes every power-of-two-friendly
    // fixture and silently diverges here.
    val v = Seq(Tuple1(Seq(3.0, 0.22440944881889763))).toDF("v")
    val r = v.select(
      graft.ops.Similarity.quantize8($"v").as("nat"),
      graft.ops.Similarity.quantize8Hof($"v").as("hof")).head()
    assert(r.getStruct(0) === r.getStruct(1), "order-of-operations divergence")
    assert(r.getStruct(0).getSeq[Byte](1) === Seq[Byte](127, 9),
      "x/maxabs*127 rounds 9.4999… down to 9")
  }

  test("dequantize8: null scale with non-null q yields per-element nulls (HOF parity)") {
    // unreachable from quantize8 output but reachable from structs read
    // back from parquet — x * NULL = null per element, not a NULL array
    val df = Seq(Tuple1(1)).toDF("x").select(expr(
      "named_struct('scale', cast(null as double), " +
        "'q', array(cast(1 as tinyint), cast(-2 as tinyint)))").as("qv"))
    val r = df.select(
      graft.ops.Similarity.dequantize8($"qv").as("nat"),
      graft.ops.Similarity.dequantize8Hof($"qv").as("hof")).head()
    assert(!r.isNullAt(0), "array itself must be non-null")
    assert(r.getSeq[Any](0) === Seq(null, null))
    assert(r.getSeq[Any](0) === r.getSeq[Any](1), "must match the HOF form")
  }
}
