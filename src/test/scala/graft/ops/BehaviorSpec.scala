package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Round-5 behavioral analytics (funnel, cohort retention) + the text
  * scoring/diversity/reassembly operators that ride the same round.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- Behavior.funnel ---------------------------------------------------

  test("funnel counts ordered completions only, first occurrence wins") {
    // u1 completes a→b→c in order; u2 does b before a (b must not count);
    // u3 stops after a; u4 does a→b with b at the SAME instant (strictly-
    // after excludes it).
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c"),
      (2L, ts("2024-01-01 09:00:00"), "b"), (2L, ts("2024-01-01 10:00:00"), "a"),
      (3L, ts("2024-01-01 10:00:00"), "a"),
      (4L, ts("2024-01-01 10:00:00"), "a"), (4L, ts("2024-01-01 10:00:00"), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnel(events, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("step").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1, "a", 4L), (2, "b", 1L), (3, "c", 1L)))
  }

  test("funnel: a user may revisit earlier steps without resetting progress") {
    // a → b → a → c still completes a→b→c (progress times are mins of
    // qualifying occurrences, later 'a's are irrelevant).
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"), (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 11:30:00"), "a"), (1L, ts("2024-01-01 12:00:00"), "c")
    ).toDF("user_id", "ts", "event_type")
    val got = Behavior.funnel(events, "user_id", "ts", "event_type", Seq("a", "b", "c"))
    assert(got.filter(col("step") === 3).head().getLong(2) === 1L)
  }

  test("funnel is monotonically non-increasing on real events") {
    val counts = Behavior.funnel(Tables.events(spark, sf), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"))
      .orderBy("step").select("users").as[Long].collect()
    assert(counts.length === 4 && counts.head > 0)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)), s"not monotone: ${counts.toSeq}")
  }

  // ---- Behavior.cohortRetention ------------------------------------------

  test("cohortRetention: offset-0 cell equals the cohort size; offsets are week-exact") {
    val ret = Behavior.cohortRetention(Tables.events(spark, sf), "user_id", "ts")
    val firsts = Tables.events(spark, sf).groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      .groupBy("cohort_week").agg(count(lit(1)).as("n"))
    val zero = ret.filter(col("week_offset") === 0)
      .select("cohort_week", "n_users")
    val expect = firsts.select(col("cohort_week"), col("n").as("n_users"))
    assert(zero.exceptAll(expect).isEmpty && expect.exceptAll(zero).isEmpty)
    assert(ret.filter(col("week_offset") < 0).isEmpty)
  }

  // ---- TextAnalysis.bigramLogProb ----------------------------------------

  test("bigramLogProb matches hand-computed conditional probabilities") {
    // doc1 "x y x y" → bigrams [x y, y x, x y]; doc2 "y x z" → [y x, x z];
    // doc3 has no bigrams → absent from output.
    // corpus counts: "x y"=2, "y x"=2, "x z"=1; prefixes: x→3, y→2
    val docs = Seq((1L, "x y x y"), (2L, "y x z"), (3L, "solo")).toDF("id", "text")
    val scored = TextAnalysis.bigramLogProb(docs, "id", "text")
      .orderBy("id").collect()
    assert(scored.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    def lg2(x: Double) = math.log(x) / math.log(2)
    // doc1 mean = (log2(2/3) + log2(2/2) + log2(2/3)) / 3
    val exp1 = (lg2(2.0 / 3) * 2 + 0.0) / 3
    assert(math.abs(scored(0).getDouble(2) - exp1) < 1e-9)
    assert(scored(0).getLong(1) === 3L)
    // doc2 mean = (log2(2/2) + log2(1/3)) / 2
    val exp2 = lg2(1.0 / 3) / 2
    assert(math.abs(scored(1).getDouble(2) - exp2) < 1e-9)
  }

  test("bigramLogProbHashed reproduces the exact-string form on real data") {
    // the 8-byte-BIGINT-key scale variant must be answer-identical to
    // the exact form absent 2^-60 hash collisions — checked row-for-row
    // on the real corpus, not a fixture, so prefix-hash grouping and the
    // max(hp) dependency assumption are exercised at genuine vocabulary
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .select(col("id"), col("n_bigrams"),
        org.apache.spark.sql.functions.round(col("mean_log2p"), 9).as("m"))
    val hashed = TextAnalysis.bigramLogProbHashed(docs, "doc_id", "text")
      .select(col("id"), col("n_bigrams"),
        org.apache.spark.sql.functions.round(col("mean_log2p"), 9).as("m"))
    assert(exact.count() > 0)
    assert(exact.exceptAll(hashed).isEmpty && hashed.exceptAll(exact).isEmpty)
  }

  // ---- TextAnalysis.lexicalStats -----------------------------------------

  test("lexicalStats: uniform tokens give log2(n) entropy, repeats give 0") {
    val docs = Seq((1L, "a b c d"), (2L, "a a a a")).toDF("id", "text")
    val got = TextAnalysis.lexicalStats(docs, "id", "text").orderBy("id").collect()
    val r1 = got(0)
    assert(r1.getLong(1) === 4L && r1.getLong(2) === 4L)
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-12)
    assert(math.abs(r1.getDouble(4) - 2.0) < 1e-12) // log2(4)
    val r2 = got(1)
    assert(r2.getLong(2) === 1L && math.abs(r2.getDouble(3) - 0.25) < 1e-12)
    assert(math.abs(r2.getDouble(4)) < 1e-12)
  }

  // ---- TextAnalysis.reassembleChunks -------------------------------------

  test("chunk(overlap=0) → reassemble round-trips byte-exact from any partitioning") {
    val docs = Tables.documents(spark, sf).limit(200)
    val chunked = docs.select(col("doc_id"),
        posexplode(TextAnalysis.chunks(col("text"), size = 16, overlap = 0)))
      .repartition(7) // hostile order: reassembly must not depend on it
    val re = TextAnalysis.reassembleChunks(chunked, "doc_id", "pos", "col")
      .withColumnRenamed("text", "re_text")
    val joined = re.join(docs.select(col("doc_id"), col("text").as("orig_text")),
        re("id") === col("doc_id"))
      .filter(col("re_text") =!= col("orig_text"))
    assert(joined.isEmpty, "reassembled text differs from original")
  }

  test("dataCard on an EMPTY corpus: counts 0, ratios NULL, no ANSI divide-by-zero throw") {
    // the r10 sweep's hazard class: a global agg over an empty corpus
    // (fresh date partition, filter matched nothing) puts n_docs = 0
    // under every ratio — ANSI `/` would kill the job; try_divide must
    // report NULL (DuckDB's own division-by-zero result)
    val empty = Seq.empty[(Long, String, Long, String, String)]
      .toDF("doc_id", "text", "n_chars", "lang", "source")
    val card = TextAnalysis.dataCard(empty)
      .as[(String, Option[Double])].collect().toMap
    assert(card("n_docs").contains(0.0))
    assert(card("n_sources").contains(0.0) && card("n_langs").contains(0.0))
    assert(card("dup_rate").isEmpty, "ratio over zero docs must be NULL")
    assert(card("mean_doc_tokens").isEmpty && card("pct_en").isEmpty)
    // and the non-degenerate path still reports real numbers
    val one = Seq((1L, "a b c", 5L, "en", "web"))
      .toDF("doc_id", "text", "n_chars", "lang", "source")
    val card1 = TextAnalysis.dataCard(one)
      .as[(String, Option[Double])].collect().toMap
    assert(card1("n_docs").contains(1.0) && card1("pct_en").contains(1.0))
    assert(card1("mean_doc_tokens").contains(3.0))
  }
}
