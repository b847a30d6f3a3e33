package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic split is stable, total, and roughly proportioned") {
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.deterministicSplit(docs, "doc_id")
    val s2 = Sampling.deterministicSplit(docs.repartition(7), "doc_id")
    // same assignment regardless of partitioning / run
    assert(s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).isEmpty)
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(counts.keySet === Set("train", "val", "test"))
    assert(total === docs.count())
    assert(counts("train").toDouble / total > 0.6, s"train too small: $counts")
  }

  test("sampleByHash(pct) is a subset consistent with the split buckets") {
    val docs = Tables.documents(spark, sf)
    val sampled = Sampling.sampleByHash(docs, "doc_id", 10).select("doc_id")
    val all = docs.select("doc_id")
    assert(sampled.exceptAll(all).isEmpty)
    // re-running yields the identical sample
    assert(Sampling.sampleByHash(docs, "doc_id", 10).select("doc_id")
      .exceptAll(sampled).isEmpty)
  }

  test("split is a narrow projection (no shuffle)") {
    val p = Sampling.deterministicSplit(Tables.documents(spark, sf), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(300))
  }

  test("weightedMixture applies per-stratum rates and nests under raises") {
    val docs = Tables.documents(spark, sf)
    val mix = Sampling.weightedMixture(docs, "source", "doc_id",
      Map("src0" -> 100, "src1" -> 0), defaultPct = 10)
    val bySrc = mix.groupBy("source").count().as[(String, Long)].collect().toMap
    // 100% stratum fully present; 0% stratum absent; default strata partial
    assert(bySrc("src0") == docs.filter($"source" === "src0").count())
    assert(!bySrc.contains("src1"))
    assert(bySrc.getOrElse("src2", 0L) < docs.filter($"source" === "src2").count())
    // raising a weight only ADDS rows (nested samples)
    val raised = Sampling.weightedMixture(docs, "source", "doc_id",
      Map("src0" -> 100, "src1" -> 40), defaultPct = 10)
    assert(mix.select("doc_id").exceptAll(raised.select("doc_id")).isEmpty)
    // identical to stratifiedSampleByHash at a uniform rate
    val uniformA = Sampling.weightedMixture(docs, "source", "doc_id", Map(), defaultPct = 20)
    val uniformB = Sampling.stratifiedSampleByHash(docs, "source", "doc_id", 20)
    assert(uniformA.select("doc_id").exceptAll(uniformB.select("doc_id")).isEmpty)
    assert(uniformB.select("doc_id").exceptAll(uniformA.select("doc_id")).isEmpty)
  }
}
