package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** Dev scratch: stage-by-stage wall times for the lossless set-sim tier
  * (q_setsim_join / q_setsim_decontaminate / q_setsim_index) — which of
  * candidate generation / verification / index write dominates, plus the
  * candidate stage's executed plan (exchange count, reuse, join strategy).
  */
object ProfileSetSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus.toInt, "profile-setsim")
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pss] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val words = split(col("text"), " ")
    val keep = greatest(ceil(size(words) *
        (lit(0.5) + (col("doc_id") % 10).cast("double") * lit(0.05)))
      .cast("int"), lit(3))
    val twins = docs0.select((col("doc_id") + 10000000L).as("doc_id"),
      array_join(slice(words, lit(1), keep), " ").as("text"))
    val corpus = docs0.unionAll(twins)
    corpus.count() // warm the scan

    (1 to 3).foreach { rep =>
      println(s"[pss] === rep $rep ===")
      timed("candidates only")(
        Dedup.setSimCandidates(corpus, "doc_id", "text", 7, 10).count())
      clearAll()
      timed("full setSimJoinExact")(
        Dedup.setSimJoinExact(corpus, "doc_id", "text", 7, 10).count())
      clearAll()
    }
    println("[pss] === candidate-stage executed plan ===")
    val cand = Dedup.setSimCandidates(corpus, "doc_id", "text", 7, 10)
    cand.count()
    println(cand.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
