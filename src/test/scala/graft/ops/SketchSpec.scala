package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-min sketch invariants: one-sided error, exactness without
  * collisions, and cell-wise mergeability (the property that makes the
  * map-side combine and cross-period roll-ups sound).
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("estimate is exact when the sketch is collision-free") {
    val df = Seq.fill(7)("a").union(Seq.fill(3)("b")).toDF("v")
    // w=1024 with 2 distinct values: collisions essentially impossible
    val hh = Sketch.cmsHeavyHitters(df, "v", d = 4, w = 1024)
      .orderBy("v").as[(String, Long, Long, Long)].collect()
    assert(hh.toSeq == Seq(("a", 7L, 7L, 0L), ("b", 3L, 3L, 0L)))
  }

  test("estimate never undercounts, even under forced collisions") {
    val df = (0 until 500).map(i => s"item_$i").toDF("v")
    // w=8 with 500 distinct values: every bucket collides heavily
    val hh = Sketch.cmsHeavyHitters(df, "v", d = 4, w = 8)
    assert(hh.filter(col("cms_est") < col("n")).isEmpty)
    // and collisions genuinely happened (the test is not vacuous)
    assert(hh.filter(col("overcount") > 0).count() > 0)
  }

  test("weighted sketch over the frequency table equals the raw sketch") {
    val raw = (0 until 400).map(i => s"k${i % 23}").toDF("v")
    val freq = raw.groupBy("v").agg(count(lit(1)).as("n"))
    val a = Sketch.cmsSketch(raw, "v", d = 4, w = 16)
    val b = Sketch.cmsSketchWeighted(freq, "v", "n", d = 4, w = 16)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("cmsHeavyHittersFromFreq over a frequency table matches the raw path") {
    val raw = (0 until 300).map(i => s"v${i % 13}").toDF("v")
    val freq = raw.groupBy("v").agg(count(lit(1)).as("cnt"))
    val a = Sketch.cmsHeavyHitters(raw, "v", d = 4, w = 8).orderBy("v")
      .as[(String, Long, Long, Long)].collect().toSeq
    val b = Sketch.cmsHeavyHittersFromFreq(freq, "v", "cnt", d = 4, w = 8)
      .orderBy("v").as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("sketch of a union equals the cell-wise sum of the sketches") {
    val a = (0 until 200).map(i => s"x${i % 17}").toDF("v")
    val b = (0 until 300).map(i => s"x${i % 29}").toDF("v")
    val merged = Sketch.cmsSketch(a.union(b), "v", d = 4, w = 16)
    val summed = Sketch.cmsSketch(a, "v", d = 4, w = 16)
      .union(Sketch.cmsSketch(b, "v", d = 4, w = 16))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
    assert(merged.except(summed).isEmpty && summed.except(merged).isEmpty)
  }
}
