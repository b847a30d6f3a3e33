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

  test("Pearson via try_divide: zero-variance and singleton groups are NULL, never a throw") {
    // r10 sweep finding: under ANSI mode Spark's corr() throws
    // DIVIDE_BY_ZERO on a zero-variance group (DuckDB returns NULL) —
    // q_stats_agg therefore spells Pearson as
    // try_divide(covar_samp, sd·sd), algebraically identical where
    // defined (the n−1 factors cancel) and NULL on degenerate groups on
    // any data, matching the oracle engine.
    val df = Seq(
      ("const", 1.0, 2.0), ("const", 1.0, 3.0),   // zero variance in x
      ("single", 5.0, 7.0),                        // n = 1
      ("real", 1.0, 1.0), ("real", 2.0, 3.0), ("real", 3.0, 5.0))
      .toDF("g", "x", "y")
    val got = df.groupBy("g")
      .agg(expr("try_divide(covar_samp(x, y), stddev_samp(x) * stddev_samp(y))").as("r"))
      .orderBy("g")
      .as[(String, Option[Double])].collect().toSeq
    assert(got.map(_._1) == Seq("const", "real", "single"))
    assert(got(0)._2.isEmpty, "zero-variance group must be NULL")
    assert(got(2)._2.isEmpty, "singleton group must be NULL")
    assert(math.abs(got(1)._2.get - 1.0) < 1e-12, s"exact linear y=2x-1: ${got(1)._2}")
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
