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
    t("warm docs")(Tables.documents(spark, d).count())
    t("neardup run1")(Dedup.nearDupPairs(Tables.documents(spark, d), "doc_id", "text", 0.8).count())
    t("neardup run2")(Dedup.nearDupPairs(Tables.documents(spark, d), "doc_id", "text", 0.8).count())
    t("neardup run3")(Dedup.nearDupPairs(Tables.documents(spark, d), "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
