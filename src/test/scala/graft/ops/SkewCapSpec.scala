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
    val out = Dedup.nearDupPairs(corpus(n), "id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the boilerplate super-bucket was dropped in every band; the normal
    // duplicate pair (small bucket) is still found
    assert(out == Set((100001L, 100002L)))
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
    val sig = Dedup.simhashNarrow(corpus(n), "id", "text")
    val out = Dedup.simhashPairsBanded(sig, maxHamming = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((100001L, 100002L)))
  }

  test("embedding nearDupPairs survives a hot LSH bucket (cap engages)") {
    val dim = 8
    val hot = Array.tabulate(dim)(i => (i + 1).toDouble)
    val cold = hot.map(-_) // opposite bucket under sign-LSH
    val n = Dedup.DefaultMaxBucket + 1000
    val vecs = (0L until n.toLong).map(i => (i, hot)) ++
      Seq((100001L, cold), (100002L, cold))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(df, "vec_id", "embedding",
        threshold = 0.9, nPlanes = 4, dim = dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((100001L, 100002L)))
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
