package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form OLS probe: exact recovery on noiseless data, R²
  * semantics, singularity guard, and the scoring path.
  */
class RegressSpec extends SparkSpec {

  import spark.implicits._

  test("recovers exact coefficients and R²=1 on noiseless linear data") {
    val rows = for (i <- 1 to 50; j <- 1 to 4)
      yield (i.toDouble, j.toDouble, 2.0 + 3.0 * i - 0.5 * j)
    val df = rows.toDF("x1", "x2", "y")
    val fit = Regress.fitLinear2(df, col("y"), col("x1"), col("x2"))
      .as[(Long, Double, Double, Double, Double)].head()
    assert(fit._1 == 200L)
    assert(math.abs(fit._2 - 2.0) < 1e-7, s"b0=${fit._2}")
    assert(math.abs(fit._3 - 3.0) < 1e-8, s"b1=${fit._3}")
    assert(math.abs(fit._4 + 0.5) < 1e-8, s"b2=${fit._4}")
    assert(math.abs(fit._5 - 1.0) < 1e-9, s"r2=${fit._5}")
  }

  test("uninformative features give R² near 0") {
    // y alternates independently of two non-collinear features
    val rows = (0 until 120).map(i =>
      ((i % 2).toDouble, ((i / 2) % 3).toDouble,
        if ((i / 12) % 2 == 0) 1.0 else -1.0))
    val df = rows.toDF("x1", "x2", "y")
    val fit = Regress.fitLinear2(df, col("y"), col("x1"), col("x2"))
      .select("r2").as[Double].head()
    assert(math.abs(fit) < 1e-6, s"r2=$fit")
  }

  test("a singular normal matrix yields null coefficients, not infinities") {
    // x2 = 2·x1: perfectly collinear — the relative-magnitude guard
    // (|det| vs the Hadamard bound of the normal matrix) catches this
    // whether float rounding lands det at exact zero or a few ulps off,
    // so ALL coefficients must be null, no hedging
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i, i * 1.5)).toDF("x1", "x2", "y")
    val fit = Regress.fitLinear2(df, col("y"), col("x1"), col("x2"))
    val r = fit.select("b0", "b1", "b2", "r2").collect().head
    assert((0 to 3).forall(r.isNullAt), s"expected all-null coefficients, got $r")
  }

  test("near-collinear features within rounding of singular are rejected too") {
    // x2 = 2·x1 + tiny jitter: det is formally nonzero but far below the
    // 1e-12 * Hadamard-bound threshold — exact `det != 0` would pass it
    // and emit huge unstable coefficients
    val df = (1 to 20).map { i =>
      (i.toDouble, 2.0 * i + i * 1e-14, i * 1.5)
    }.toDF("x1", "x2", "y")
    val fit = Regress.fitLinear2(df, col("y"), col("x1"), col("x2"))
    val r = fit.select("b0", "b1", "b2", "r2").collect().head
    assert((0 to 3).forall(r.isNullAt), s"expected all-null coefficients, got $r")
  }

  test("score applies the broadcast fit to new rows") {
    val train = (1 to 99).map(i =>
      (i.toDouble, (i % 3).toDouble, 10.0 + 2.0 * i)).toDF("x1", "x2", "y")
    val fit = Regress.fitLinear2(train, col("y"), col("x1"), col("x2"))
    val scored = Regress.score(Seq((200.0, 0.0)).toDF("x1", "x2"), fit,
        col("x1"), col("x2"))
      .select("probe_score").as[Double].head()
    assert(math.abs(scored - 410.0) < 1e-6, s"scored=$scored")
  }
}
