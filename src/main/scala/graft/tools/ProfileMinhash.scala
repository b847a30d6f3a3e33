package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Dedup

object ProfileMinhash {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    t("warm docs")(docs.count())
    t("neardup run1")(Dedup.nearDupPairs(docs, "doc_id", "text", 0.8).count())
    // stage breakdown (steady state)
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shRaw = Dedup.shinglesRaw(docs, "doc_id", "text")
    t("stage shingles count")(shRaw.count())
    val sig = t("stage signature") {
      val s = Dedup.minhashSignature(shRaw, 6).persist(disk); s.count(); s
    }
    val pairs = t("stage candidates") {
      val p = Dedup.lshCandidates(Dedup.lshBands(sig, 6, 2)).persist(disk); p.count(); p
    }
    t("stage jaccard")(Dedup.jaccardForPairs(pairs, shRaw).filter(col("jaccard") >= 0.8).count())
    t("neardup run3")(Dedup.nearDupPairs(docs, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
