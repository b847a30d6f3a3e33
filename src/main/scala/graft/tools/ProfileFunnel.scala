package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, TextAnalysis}

/** Dev scratch: stage-by-stage wall times for the q_dedup_funnel
  * composition — which of normalize-dedup / minhash-pairs / clusters /
  * canonical dominates.
  */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("profile-funnel")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"[profile] === rep $rep ===")
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000).as("doc_id"), upper(col("text")).as("text")))
      timed("0 raw count")(corpus.count())
      val d1 = graft.catalog.Catalog.dedupFirst(
        corpus.withColumn("__nk", md5(TextAnalysis.normalizeText(col("text")))),
        Seq("__nk"), "doc_id").drop("__nk")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("1 d1 count")(d1.count())
      val pairs = timed("2 nearDupPairs")(
        Dedup.nearDupPairs(d1, "doc_id", "text", threshold = 0.8).select("id_a", "id_b"))
      timed("2b pairs count")(pairs.count())
      val labels = timed("3 clusters")(Dedup.clusters(pairs))
      timed("3b labels count")(labels.count())
      val losers = labels.filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
      timed("4 canonical count")(
        d1.join(losers, Seq("doc_id"), "left_anti").count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
