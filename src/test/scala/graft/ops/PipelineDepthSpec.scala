package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.etl.Scd

/** Round-4 pipeline-depth operators: sequence packing, per-key caps,
  * type-2 history, semantic dedup, containment, normalization, unigram
  * LM scoring.
  */
class PipelineDepthSpec extends SparkSpec {
  import spark.implicits._

  // ---- Pack.packSequences ------------------------------------------------

  test("packSequences equals the single-window definition and ignores partitioning") {
    val docs = Tables.documents(spark, sf)
    val packed = Pack.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 512)
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oracle = docs
      .select(col("doc_id").as("id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("seq_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / 512).cast("long"))
    assert(packed.exceptAll(oracle).isEmpty && oracle.exceptAll(packed).isEmpty)
    packed.unpersist()

    // identical assignment from a hostile input partitioning
    val repacked = Pack.packSequences(docs.repartition(13), "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 512)
    assert(repacked.exceptAll(oracle).isEmpty)
    repacked.unpersist()
  }

  test("packSequences: oversized documents own their start bin; fill is contiguous") {
    val docs = Seq((1L, 10L), (2L, 600L), (3L, 10L), (4L, 500L))
      .toDF("doc_id", "nt")
    val packed = Pack.packSequences(docs, "doc_id", col("nt"), budget = 512)
      .orderBy("id").as[(Long, Long, Long)].collect()
    // starts at 0, 10, 610, 620 -> bins 0, 0, 1, 1
    assert(packed.map(_._3).toSeq === Seq(0L, 0L, 1L, 1L))
    assert(packed.map(_._2).toSeq === Seq(10L, 600L, 10L, 500L))
  }

  test("packSequences never plans a global (empty-partition) window") {
    val docs = Tables.documents(spark, sf)
    val packed = Pack.packSequences(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 512)
    // analyzed, not optimized: the returned frame is persisted, so the
    // optimized plan is just the cache lookup (InMemoryRelation)
    val winSpecs = packed.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
    }
    assert(winSpecs.nonEmpty && winSpecs.forall(_.nonEmpty),
      s"global window in plan: $winSpecs")
    packed.unpersist()
  }

  test("shardManifest: boundary rule, exact totals, hand-checked modular checksum") {
    val docs = Seq(
      (1L, "a b c"),   // start 0 → shard 0
      (2L, "d e"),     // start 3 → shard 0 (overflows the 4-token boundary)
      (3L, "f"),       // start 5 → shard 1
      (4L, "g h i j")  // start 6 → shard 1
    ).toDF("doc_id", "text")
    def dmod(id: Long, text: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$id:$text".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % Pack.ChecksumPrime
    }
    val expect0 = (dmod(1L, "a b c") + dmod(2L, "d e")) % Pack.ChecksumPrime
    val expect1 = (dmod(3L, "f") + dmod(4L, "g h i j")) % Pack.ChecksumPrime
    val m = Pack.shardManifest(docs, "doc_id", "text",
        TextAnalysis.tokenCount(col("text")), shardTokens = 4L)
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(m == Seq(
      (0L, 2L, 5L, 1L, 2L, expect0),
      (1L, 2L, 5L, 3L, 4L, expect1)))

    // the checksum commutes: a hostile input order (reversed, absurd
    // partitioning) yields the identical manifest
    val m2 = Pack.shardManifest(docs.orderBy(col("doc_id").desc).repartition(7),
        "doc_id", "text", TextAnalysis.tokenCount(col("text")), shardTokens = 4L)
      .orderBy("shard_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(m2 == m)
  }

  test("packSequences carries pass-through columns unchanged (shardManifest's digest lane)") {
    val docs = Seq((1L, 10L), (2L, 600L), (3L, 10L)).toDF("doc_id", "nt")
    val packed = Pack.packSequences(docs, "doc_id", col("nt"), budget = 512)
      .orderBy("id").columns.toSeq
    assert(packed == Seq("id", "n_tokens", "seq_id"),
      "the zero-extras path must keep its public shape")
  }

  // ---- Sampling.capPerKey ------------------------------------------------

  test("capPerKey's local phase windows on (keys, partition id), global on keys") {
    val capped = Sampling.capPerKey(Tables.documents(spark, sf),
      Seq("source"), Seq(col("doc_id")), 7)
    val winSpecs = capped.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.length
    }
    // two windows: the local pre-cap partitions on 2 exprs, the global on 1
    assert(winSpecs.sorted === Seq(1, 2), s"window specs: $winSpecs")
  }

  test("capPerKey equals single-phase row_number for any partitioning") {
    val docs = Tables.documents(spark, sf)
    val capped = Sampling.capPerKey(docs, Seq("source"), Seq(col("doc_id")), 7)
      .select("doc_id")
    val w = Window.partitionBy("source").orderBy("doc_id")
    val oracle = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 7).select("doc_id")
    assert(capped.exceptAll(oracle).isEmpty && oracle.exceptAll(capped).isEmpty)
    val cappedHostile = Sampling
      .capPerKey(docs.repartition(17), Seq("source"), Seq(col("doc_id")), 7)
      .select("doc_id")
    assert(cappedHostile.exceptAll(oracle).isEmpty)
  }

  test("capPerKey with cap >= group size keeps everything") {
    val docs = Tables.documents(spark, sf)
    assert(Sampling.capPerKey(docs, Seq("source"), Seq(col("doc_id")), 100000)
      .count() === docs.count())
  }

  // ---- Scd.type2History --------------------------------------------------

  test("type2History: runs, intervals, and point-in-time reconstruction") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"), (1L, 4L, "a"),
      (2L, 1L, "x"), (2L, 2L, "x")
    ).toDF("user_id", "seq", "state")
    val hist = Scd.type2History(ev, Seq("user_id"), Seq(col("seq")),
      Seq("state"), col("seq"), carry = Seq("seq"))
    val rows = hist.orderBy("user_id", "valid_from")
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(rows === Seq(
      (1L, "a", 1L, Some(3L), false),
      (1L, "b", 3L, Some(4L), false),
      (1L, "a", 4L, None, true),
      (2L, "x", 1L, None, true)))
    // exactly one current row per key
    val cur = hist.filter(col("is_current")).groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(cur.values.forall(_ == 1L))
  }

  test("type2History: null tracked values open and close runs") {
    val ev = Seq(
      (1L, 1L, Some("a")), (1L, 2L, None), (1L, 3L, None), (1L, 4L, Some("a")),
      (3L, 1L, Option.empty[String])
    ).toDF("user_id", "seq", "state")
    val hist = Scd.type2History(ev, Seq("user_id"), Seq(col("seq")),
      Seq("state"), col("seq"))
    assert(hist.filter(col("user_id") === 1L).count() === 3)
    // a key whose first (and only) value is null still gets its run
    assert(hist.filter(col("user_id") === 3L).count() === 1)
  }

  test("asOf over a written history extract pushes the interval filter to the scan") {
    val ev = Seq((1L, 1L, "a"), (1L, 5L, "b"), (1L, 9L, "c"))
      .toDF("user_id", "seq", "state")
    val hist = Scd.type2History(ev, Seq("user_id"), Seq(col("seq")),
      Seq("state"), col("seq"))
    val path = s"${sys.props("java.io.tmpdir")}/graft_scd2_extract"
    hist.write.mode("overwrite").parquet(path)
    val snap = Scd.asOf(spark.read.parquet(path), lit(6L))
    val scans = snap.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // valid_from <= 6 reaches the parquet reader (row-group skipping)
    assert(scans.head.metadata("PushedFilters").contains("LessThanOrEqual(valid_from"),
      scans.head.metadata("PushedFilters"))
    assert(snap.select("state").as[String].collect().toSeq === Seq("b"))
  }

  // ---- Similarity.semanticDedup -------------------------------------------

  test("semanticDedup: kept set has no within-cell pair over threshold; " +
    "every dropped id has a lower cell-mate over threshold") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", m = 8)
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", cents, 0.3)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("embedding"), col("__cell"))

    val keptV = kept.join(assigned, kept("id") === assigned("vec_id"))
      .select(col("id"), col("cell"), col("embedding"))
    val a = keptV.select(col("id").as("id_a"), col("cell"), col("embedding").as("v_a"))
    val b = keptV.select(col("id").as("id_b"), col("cell"), col("embedding").as("v_b"))
    val violations = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        Similarity.cosine(col("v_a"), col("v_b")) >= 0.3)
    assert(violations.isEmpty, "two kept vectors within threshold in one cell")

    val dropped = assigned.join(kept, assigned("vec_id") === kept("id"), "left_anti")
    val dl = dropped.select(col("vec_id").as("id_b"), col("__cell").as("cell"),
      col("embedding").as("v_b"))
    val anyLower = assigned
      .select(col("vec_id").as("id_a"), col("__cell").as("cell"),
        col("embedding").as("v_a"))
      .join(dl, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        Similarity.cosine(col("v_a"), col("v_b")) >= 0.3)
      .select("id_b").distinct()
    assert(anyLower.count() === dropped.count(),
      "a dropped id lacks a lower within-threshold cell-mate")
    kept.unpersist()
  }

  test("semanticDedup: over-cap cells drop no rows but record the cap") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", m = 2)
    CapMetrics.clear()
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", cents,
      threshold = 0.3, maxCell = 10)
    val report = CapMetrics.get("semantic_dedup")
    assert(report.exists(_.engaged), s"cap should engage at maxCell=10: $report")
    // capped cells contribute no losers -> their members are all kept
    assert(kept.count() > 0)
    kept.unpersist()
  }

  // ---- Dedup.containmentForPairs ------------------------------------------

  test("containment: a document fully inside another scores cont_a = 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val c = Dedup.containmentForPairs(pairs, Dedup.shingles(docs, "doc_id", "text"))
      .orderBy("id_b").as[(Long, Long, Double, Double)].collect()
    // doc1's 3 shingles all appear in doc2 (prefix): containment 1.0
    assert(c.head._3 === 1.0)
    assert(c.head._4 < 1.0) // doc2 not contained in doc1
    c.find(_._2 == 3L).foreach(r => fail(s"disjoint pair should have no overlap row: $r"))
  }

  test("containmentPairs (native kernel) equals containmentForPairs (relational)") {
    val docs = Tables.documents(spark, sf)
    val native = Dedup.containmentPairs(docs, "doc_id", "text")
      .select(col("id_a"), col("id_b"),
        round(col("cont_a"), 6).as("ca"), round(col("cont_b"), 6).as("cb"))
    val cand = Dedup.lshCandidates(Dedup.lshBands(
      Dedup.minhashSignatureNarrow(docs, "doc_id", "text")))
    val relational = Dedup
      .containmentForPairs(cand, Dedup.shingles(docs, "doc_id", "text"))
      .select(col("id_a"), col("id_b"),
        round(col("cont_a"), 6).as("ca"), round(col("cont_b"), 6).as("cb"))
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
    assert(native.count() > 0)
    native.unpersist(); relational.unpersist()
  }

  // ---- Dedup band index: incremental dedup against history -----------------

  test("nearDupsAgainstIndex equals the batch pipeline restricted to crossing pairs") {
    val docs = Tables.documents(spark, sf)
    val old = docs.filter(col("doc_id") < 400)
    val fresh = docs.filter(col("doc_id") >= 400)
    val idx = s"${sys.props("java.io.tmpdir")}/graft_band_index_spec"
    Dedup.writeBandIndex(old, "doc_id", "text", idx)
    val inc = Dedup.nearDupsAgainstIndex(fresh, "doc_id", "text", idx, old)
      .select(col("id_new"), col("id_old"), round(col("jaccard"), 4).as("j"))
    val full = Dedup.nearDupPairs(docs, "doc_id", "text")
      .filter(col("id_a") < 400 && col("id_b") >= 400)
      .select(col("id_b").as("id_new"), col("id_a").as("id_old"),
        round(col("jaccard"), 4).as("j"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    assert(inc.count() > 0, "fixture split should cross at least one near-dup pair")
    inc.unpersist(); full.unpersist()
  }

  test("appendToBandIndex: the next batch dedups against appended history") {
    val idx = s"${sys.props("java.io.tmpdir")}/graft_band_index_append"
    val old = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val b1 = Seq((2L, "one two three four five six")).toDF("doc_id", "text")
    val b2 = Seq((3L, "one two three four five six")).toDF("doc_id", "text")
    Dedup.writeBandIndex(old, "doc_id", "text", idx)
    // batch 1 has no dup in history; accept it into the index
    assert(Dedup.nearDupsAgainstIndex(b1, "doc_id", "text", idx, old).count() === 0)
    Dedup.appendToBandIndex(b1, "doc_id", "text", idx)
    // batch 2 duplicates batch 1 — visible only via the appended segment
    val hits = Dedup.nearDupsAgainstIndex(b2, "doc_id", "text", idx,
        old.unionByName(b1))
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(hits === Set((3L, 2L)))
  }

  // ---- TextAnalysis.normalizeText / unigramLogProb -------------------------

  test("normalizeText canonicalizes case, punctuation, and whitespace") {
    val rows = Seq("Hello,  World!", "hello world", "HELLO ... world  ")
      .toDF("text")
      .select(TextAnalysis.normalizeText(col("text")).as("n"))
      .as[String].collect().toSet
    assert(rows === Set("hello world"))
  }

  test("unigramLogProb matches a hand-computed distribution") {
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Double)].collect()
    // corpus: a=2, b=2, total=4 -> p(a)=p(b)=0.5, log2 = -1
    assert(out.map(_._2).toSeq === Seq(3L, 1L))
    assert(out.forall(r => math.abs(r._3 - (-1.0)) < 1e-12))
  }
}
