package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Materialized PQ index: sidecar exact round-trip, probe == in-memory
  * ADC ranking, IVF-PQ partition pruning, and the missing-sidecar
  * guard.
  */
class PqIndexSpec extends SparkSpec {

  import spark.implicits._

  private def emb = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def tmp(p: String) = Files.createTempDirectory(p).toString + "/idx"

  test("sidecar round-trips the codebooks bit-exactly") {
    val path = tmp("pq_rt")
    val cb = Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8)
    val (m, ks, cb2, cents) = Similarity.readPqSidecar(spark, path)
    assert(m == 4 && ks == 8 && cents.isEmpty)
    assert(cb2.flatten.flatten.toSeq == cb.flatten.flatten.toSeq)
  }

  test("probe over the flat index matches the in-memory ADC ranking") {
    val path = tmp("pq_flat")
    val cb = Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8)
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val got = Similarity.probePqIndex(spark, path, "vec_id", query, k = 5)
      .as[(Long, Double)].collect().toSeq
    // in-memory reference: encode + ADC through the same kernels
    val cbLit = Similarity.pqCodebooksLit(cb)
    val want = emb.select(col("vec_id"),
        graft.functions.PqAdc(typedLit(query.toSeq),
          graft.functions.PqEncode(col("v"), cbLit, 8), cbLit, 8).as("adc"))
      .orderBy(col("adc"), col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"probe $got vs in-memory $want")
  }

  test("IVF-PQ index prunes to the probed cells at the source") {
    val path = tmp("pq_ivf")
    Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8, ivfCells = 8)
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val probe = Similarity.probePqIndex(spark, path, "vec_id", query,
      k = 5, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"cell probe must prune partitions:\n${plan.take(800)}")
    // candidates really are restricted: every returned id lives in one
    // of the 2 probed cells of the partitioned layout
    val cells = spark.read.parquet(path)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    val (_, _, _, cents) = Similarity.readPqSidecar(spark, path)
    assert(cents.length == 8)
    val got = probe.as[(Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 5)
    val probedCells = got.map(r => cells(r._1)).toSet
    assert(probedCells.size <= 2, s"results span cells $probedCells")
  }

  test("a missing sidecar is rejected loudly") {
    val path = tmp("pq_bare")
    emb.select("vec_id").write.parquet(path)
    val e = intercept[IllegalArgumentException] {
      Similarity.probePqIndex(spark, path, "vec_id", Array.fill(64)(0.0), k = 3)
    }
    assert(e.getMessage.contains("sidecar"))
  }
}
