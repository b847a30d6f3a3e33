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
    t("sig exploded")(Dedup.minhashSignature(
      Dedup.shinglesRaw(docs, "doc_id", "text"), 6).count())
    t("sig narrow")(Dedup.minhashSignatureNarrow(docs, "doc_id", "text").count())
    t("neardup cold")(Dedup.nearDupPairs(docs, "doc_id", "text", 0.8).count())
    t("neardup warm")(Dedup.nearDupPairs(docs, "doc_id", "text", 0.8).count())
    // stage breakdown of the narrow pipeline, fresh lineage
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs2 = Tables.documents(spark, d).filter(col("doc_id") >= 0)
    val sig = t("stage sig") {
      val s = Dedup.minhashSignatureNarrow(docs2, "doc_id", "text").persist(disk)
      s.count(); s
    }
    val pairs = t("stage candidates") {
      val p = Dedup.lshCandidates(Dedup.lshBands(sig, 6, 2)).persist(disk)
      p.count(); p
    }
    t("stage jaccard") {
      val txt = docs2.select(col("doc_id"), col("text"))
      pairs
        .join(txt.select(col("doc_id").as("id_a"), col("text").as("__ta")), Seq("id_a"))
        .join(txt.select(col("doc_id").as("id_b"), col("text").as("__tb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.functions.ShingleJaccard(col("__ta"), col("__tb"), 3).as("jaccard"))
        .filter(col("jaccard") >= 0.8).count()
    }
    spark.stop()
  }
}
