package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

/** Product-quantization kernels: argmin correctness against a scalar
  * reference, tie-breaks, ADC decomposition, Lloyd refinement payoff,
  * and the SQL registration path.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  // m=2 subspaces of 2 dims, ks=2 codewords; subspace-major layout
  private val cb: Seq[Seq[Double]] = Seq(
    Seq(0.0, 0.0), Seq(10.0, 10.0), // subspace 0: codes 0, 1
    Seq(5.0, 5.0), Seq(-5.0, -5.0)) // subspace 1: codes 0, 1

  private def encode(v: Seq[Double]): Seq[Int] =
    Seq(v).toDF("v")
      .select(PqEncode(col("v"), typedLit(cb), ks = 2).as("c"))
      .as[Seq[Int]].head()

  private def adc(q: Seq[Double], codes: Seq[Int]): Double =
    Seq((q, codes)).toDF("q", "c")
      .select(PqAdc(col("q"), col("c"), typedLit(cb), ks = 2).as("d"))
      .as[Double].head()

  test("encode picks the nearest codeword per subspace") {
    assert(encode(Seq(1.0, 1.0, 4.0, 4.0)) == Seq(0, 0))
    assert(encode(Seq(9.0, 9.0, -4.0, -6.0)) == Seq(1, 1))
    assert(encode(Seq(1.0, 1.0, -9.0, 0.0)) == Seq(0, 1))
  }

  test("argmin ties break to the smallest codeword index") {
    // (5,5) is equidistant from subspace-0 codewords (0,0) and (10,10)
    assert(encode(Seq(5.0, 5.0, 5.0, 5.0)).head == 0)
  }

  test("a null query component fails loudly instead of reading as 0.0") {
    val e = intercept[Exception] {
      Seq(Seq(1, 0)).toDF("c")
        .select(PqAdc(
          expr("array(1.0d, cast(null as double), 3.0d, 4.0d)"),
          col("c"), typedLit(cb), ks = 2).as("d"))
        .as[Double].head()
    }
    assert(e.getMessage != null && e.getMessage.contains("null query component"),
      s"got ${e.getMessage}")
  }

  test("adc is the sum of per-subspace squared L2 to the coded words") {
    // q = (1,2, 3,4) vs codes (1,0): ||(1,2)-(10,10)||² + ||(3,4)-(5,5)||²
    val expected = (81.0 + 64.0) + (4.0 + 1.0)
    assert(adc(Seq(1.0, 2.0, 3.0, 4.0), Seq(1, 0)) == expected)
  }

  test("adc of a vector against its own codes equals its quantization error") {
    val v = Seq(1.0, 1.0, 4.0, 4.0)
    val codes = encode(v)
    // codes (0,0): ||(1,1)-(0,0)||² + ||(4,4)-(5,5)||² = 2 + 2
    assert(codes == Seq(0, 0))
    assert(adc(v, codes) == 4.0)
  }

  test("Lloyd refinement reduces mean quantization error on real vectors") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def meanErr(iters: Int): Double = {
      val cbArr = Similarity.pqCodebooks(emb, "vec_id", "v",
        m = 4, ks = 8, iters = iters)
      val lit = Similarity.pqCodebooksLit(cbArr)
      emb.select(PqAdc(col("v"),
          PqEncode(col("v"), lit, ks = 8), lit, ks = 8).as("e"))
        .agg(avg("e")).as[Double].head()
    }
    val seeded = meanErr(0)
    val refined = meanErr(2)
    assert(refined < seeded,
      s"refined error $refined should beat seeded $seeded")
  }

  test("large-m·ks refinement routes through a deterministic sample with bounded error") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = emb.count().toInt
    def err(cbArr: Array[Array[Array[Double]]]): Double = {
      val lit = Similarity.pqCodebooksLit(cbArr)
      emb.select(PqAdc(col("v"),
          PqEncode(col("v"), lit, ks = 8), lit, ks = 8).as("e"))
        .agg(avg("e")).as[Double].head()
    }
    // threshold 0 forces the sampled route on the same data the full
    // route refines — with sample == corpus the two run IDENTICAL math
    // (same seeds, same lowest-code tie-break, same empty-cell rule),
    // differing only in floating-point summation order
    val full = Similarity.pqCodebooks(emb, "vec_id", "v",
      m = 4, ks = 8, iters = 2)
    val sampledAll = Similarity.pqCodebooks(emb, "vec_id", "v",
      m = 4, ks = 8, iters = 2, sampleThresholdCells = 0, sampleN = n)
    full.flatten.flatMap(_.toSeq).zip(sampledAll.flatten.flatMap(_.toSeq))
      .foreach { case (a, b) => assert(math.abs(a - b) <= 1e-9,
        s"sample==corpus must reproduce the distributed refinement: $a vs $b") }
    // a TRUE sample (quarter of the corpus) still beats id-rank seeding
    // on FULL-corpus quantization error — the bounded-quality contract
    // the sampled route ships under
    val seeded = Similarity.pqCodebooks(emb, "vec_id", "v", m = 4, ks = 8)
    val sampled = Similarity.pqCodebooks(emb, "vec_id", "v",
      m = 4, ks = 8, iters = 2, sampleThresholdCells = 0, sampleN = n / 4)
    assert(err(sampled) < err(seeded),
      s"sample-refined ${err(sampled)} should beat seeded ${err(seeded)}")
    // determinism: the hash-sample is a pure function of the data
    val sampled2 = Similarity.pqCodebooks(emb, "vec_id", "v",
      m = 4, ks = 8, iters = 2, sampleThresholdCells = 0, sampleN = n / 4)
    assert(sampled.flatten.flatten.toSeq == sampled2.flatten.flatten.toSeq)
  }

  test("SQL surface: pq_encode / pq_adc registered via extensions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT pq_adc(array(1.0d, 1.0d, 4.0d, 4.0d),
        |  pq_encode(array(1.0d, 1.0d, 4.0d, 4.0d),
        |    array(array(0.0d, 0.0d), array(10.0d, 10.0d),
        |          array(5.0d, 5.0d), array(-5.0d, -5.0d)), 2),
        |  array(array(0.0d, 0.0d), array(10.0d, 10.0d),
        |        array(5.0d, 5.0d), array(-5.0d, -5.0d)), 2) AS d
        |""".stripMargin).as[Double].head()
    assert(r == 4.0)
  }
}
