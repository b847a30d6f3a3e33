package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form ordinary least squares from sufficient statistics — the
  * "distill an expensive quality signal into a cheap probe" operator: a
  * linear probe fitted over the corpus in ONE scan, so the expensive
  * gate (fused-kernel diversity, perplexity, a teacher model's score)
  * runs once and every future pass scores documents with arithmetic on
  * columns it already has.
  *
  * Everything is sufficient statistics: the single aggregate emits the
  * normal-equation sums (O(p²) values), coefficients come from Cramer's
  * rule as column arithmetic on that one row, and R² expands
  * algebraically from the SAME sums (`SSE = Σy² − 2bᵀXᵀy + bᵀXᵀXb`) —
  * no second data pass, no driver round-trip, nothing corpus-sized
  * after the scan. At 100 TB the fit costs exactly one map-side-combined
  * aggregate of nine doubles.
  */
object Regress {

  /** 3×3 determinant, written once so the Spark column expression and
    * the generated oracle SQL share the exact operation structure.
    */
  private def det3(a: Column, b: Column, c: Column,
                   d: Column, e: Column, f: Column,
                   g: Column, h: Column, i: Column): Column =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** Fit `y ≈ b0 + b1·x1 + b2·x2` by OLS. Returns ONE row:
    * `(n, b0, b1, b2, r2)` — unrounded; a singular normal matrix
    * (collinear features, constant column) yields null coefficients
    * rather than an exploding division.
    */
  def fitLinear2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    // rows with ANY null drop from EVERY statistic: count(lit(1)) counts
    // all rows while sum() skips nulls, so without this filter the
    // normal equations would mix row populations and solve a mismatched
    // system — silently wrong coefficients, not an error
    val s = df.select(y.as("y"), x1.as("x1"), x2.as("x2"))
      .na.drop(Seq("y", "x1", "x2"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
    val det = det3(col("n"), col("s1"), col("s2"),
      col("s1"), col("s11"), col("s12"),
      col("s2"), col("s12"), col("s22"))
    // singularity by RELATIVE magnitude, not det == 0 exactly: nearly-
    // collinear features leave det within float rounding of zero but
    // formally nonzero, and dividing by it explodes the coefficients.
    // Scale = Hadamard bound (product of row norms), the determinant's
    // natural magnitude; 1e-12 leaves ~4 decimal digits of conditioning
    // above double-precision rounding (eps ~ 2.2e-16).
    val rowNorm = (a: Column, b: Column, c: Column) =>
      sqrt(a * a + b * b + c * c)
    val detScale = rowNorm(col("n"), col("s1"), col("s2")) *
      rowNorm(col("s1"), col("s11"), col("s12")) *
      rowNorm(col("s2"), col("s12"), col("s22"))
    val okDet = abs(col("det")) > lit(1e-12) * col("det_scale")
    val withB = s.withColumn("det", det)
      .withColumn("det_scale", detScale)
      .withColumn("b0",
        when(okDet, det3(col("sy"), col("s1"), col("s2"),
          col("s1y"), col("s11"), col("s12"),
          col("s2y"), col("s12"), col("s22")) / col("det")))
      .withColumn("b1",
        when(okDet, det3(col("n"), col("sy"), col("s2"),
          col("s1"), col("s1y"), col("s12"),
          col("s2"), col("s2y"), col("s22")) / col("det")))
      .withColumn("b2",
        when(okDet, det3(col("n"), col("s1"), col("sy"),
          col("s1"), col("s11"), col("s1y"),
          col("s2"), col("s12"), col("s2y")) / col("det")))
    val sse = col("syy") -
      lit(2.0) * (col("b0") * col("sy") + col("b1") * col("s1y") +
        col("b2") * col("s2y")) +
      (col("b0") * col("b0") * col("n") +
        col("b1") * col("b1") * col("s11") +
        col("b2") * col("b2") * col("s22") +
        lit(2.0) * col("b0") * col("b1") * col("s1") +
        lit(2.0) * col("b0") * col("b2") * col("s2") +
        lit(2.0) * col("b1") * col("b2") * col("s12"))
    val sst = col("syy") - col("sy") * col("sy") / col("n")
    withB
      .withColumn("r2", when(okDet && sst =!= 0,
        lit(1.0) - sse / sst))
      .select(col("n").cast("long").as("n"),
        col("b0"), col("b1"), col("b2"), col("r2"))
  }

  /** Score a frame with a fitted probe: `b0 + b1·x1 + b2·x2` with the
    * one-row fit broadcast — the cheap gate that replaces the expensive
    * signal on every later corpus pass.
    */
  def score(df: DataFrame, fit: DataFrame, x1: Column, x2: Column,
            as: String = "probe_score"): DataFrame =
    df.crossJoin(broadcast(
        fit.select(col("b0"), col("b1"), col("b2"))))
      .withColumn(as, col("b0") + col("b1") * x1 + col("b2") * x2)
      .drop("b0", "b1", "b2")
}
