package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew safety of the banded near-dup pipelines: a boilerplate-dominated
  * corpus (thousands of identical documents → one super-bucket per band)
  * must not trigger a quadratic single-bucket self-join. The default
  * `Dedup.DefaultMaxBucket` cap drops the hot bucket (bounded recall
  * loss, documented) while ordinary near-dup pairs are still found.
  */
class SkewCapSpec extends SparkSpec {
  import spark.implicits._

  private val boiler =
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
  private val unique =
    "the quick brown fox jumps over the lazy dog near the river bank today"

  private def corpus(nBoiler: Int) = {
    val docs = (0L until nBoiler.toLong).map(i => (i, boiler)) ++
      Seq((100001L, unique), (100002L, unique))
    docs.toDF("id", "text")
  }

  test("minhash nearDupPairs survives a super-bucket corpus (cap engages)") {
    val n = Dedup.DefaultMaxBucket + 1000 // hot bucket strictly over the cap
    CapMetrics.clear()
    val out = Dedup.nearDupPairs(corpus(n), "id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the boilerplate super-bucket was dropped in every band; the normal
    // duplicate pair (small bucket) is still found
    assert(out == Set((100001L, 100002L)))
    // the drop is NOT silent: the report counts the hot bucket in every
    // band (k=6, bandRows=2 → 3 bands) and all its rows
    val r = CapMetrics.get("minhash_lsh").get
    assert(r.engaged && r.droppedBuckets == 3L && r.droppedRows == 3L * n,
      s"unexpected cap report: $r")
  }

  test("cap off on a small corpus finds the boilerplate pairs (cap is the only difference)") {
    val out = Dedup.nearDupPairs(corpus(4), "id", "text", threshold = 0.8,
        maxBucket = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)) && out.contains((100001L, 100002L)))
  }

  test("lshCandidates drops buckets over an explicit cap, keeps the rest") {
    val bands = Seq(
      (0, "hot", 1L), (0, "hot", 2L), (0, "hot", 3L),
      (0, "cold", 10L), (0, "cold", 11L)
    ).toDF("band_id", "band_key", "id")
    val pairs = Dedup.lshCandidates(bands, maxBucket = 2)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L)))
  }

  test("simhashPairsBanded survives a super-bucket corpus (cap engages)") {
    val n = Dedup.DefaultMaxBucket + 1000
    CapMetrics.clear()
    val sig = Dedup.simhashNarrow(corpus(n), "id", "text")
    val out = Dedup.simhashPairsBanded(sig, maxHamming = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((100001L, 100002L)))
    // both bands' boilerplate buckets dropped, counted
    val r = CapMetrics.get("simhash_banded").get
    assert(r.engaged && r.droppedBuckets == 2L && r.droppedRows == 2L * n,
      s"unexpected cap report: $r")
  }

  test("embedding nearDupPairs survives a hot LSH bucket (cap engages)") {
    val dim = 8
    val hot = Array.tabulate(dim)(i => (i + 1).toDouble)
    val cold = hot.map(-_) // opposite bucket under sign-LSH
    val n = Dedup.DefaultMaxBucket + 1000
    val vecs = (0L until n.toLong).map(i => (i, hot)) ++
      Seq((100001L, cold), (100002L, cold))
    val df = vecs.toDF("vec_id", "embedding")
    CapMetrics.clear()
    val out = Similarity.nearDupPairs(df, "vec_id", "embedding",
        threshold = 0.9, nPlanes = 4, dim = dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((100001L, 100002L)))
    val r = CapMetrics.get("embed_neardup").get
    assert(r.engaged && r.droppedBuckets == 1L && r.droppedRows == n.toLong,
      s"unexpected cap report: $r")
  }

  test("embedding nearDupPairs derives its geometry from the data") {
    val dim = 8
    // two antipodal groups — derived dim must be 8 (not the old 64
    // default) and derived nPlanes >= 4; pairs inside each group survive
    val a = Array.tabulate(dim)(i => (i + 1).toDouble)
    val b = a.map(-_)
    val df = Seq((1L, a), (2L, a), (3L, b), (4L, b)).toDF("vec_id", "embedding")
    CapMetrics.clear()
    val out = Similarity.nearDupPairs(df, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 4L)))
    val r = CapMetrics.get("embed_neardup").get
    assert(!r.engaged, s"cap should not engage on 4 rows: $r")
  }

  test("lshBucket raises on a vector whose dim mismatches the planes") {
    val df = Seq((1L, Array.tabulate(768)(_.toDouble))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.nearDupPairs(df.union(df.withColumn("vec_id", lit(2L))),
        "vec_id", "embedding", threshold = 0.9, nPlanes = 4, dim = 64).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("expected 64-dim vector")), ex.toString)
  }

  test("nPlanesFor sizes the bucket space to the corpus") {
    assert(Similarity.nPlanesFor(100L) == 4) // floor
    assert(Similarity.nPlanesFor(1000000000L) == 20) // 1e9/2^20 ≈ 954 < cap/4
    assert(Similarity.nPlanesFor(Long.MaxValue / 4) == 24) // ceiling
  }

  test("chunked-md5 minhash rejects unsupported k fast") {
    intercept[IllegalArgumentException](Dedup.requireChunkableK(9))
    intercept[IllegalArgumentException](
      graft.functions.MinHashSignature(lit("a b c d"), 3, 9))
    intercept[IllegalArgumentException](new graft.functions.MinHashAggregator(16))
    intercept[IllegalArgumentException](
      Dedup.minhashSignature(Seq((1L, "x")).toDF("id", "shingle"), k = 32))
    // every supported k stays in bounds
    (1 to 8).foreach(Dedup.requireChunkableK)
  }

  test("lshTopK probe enumeration is combination-driven and guarded") {
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(Seq((1L, Array(1.0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", Array(1.0), k = 1, nPlanes = 63)
    }
  }
}
