package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Dev scratch: A/B the two LSH verification kernels on the SAME cached
  * candidate pairs within one JVM — per-pair fused text re-shingling
  * (ShingleJaccard over texts) vs per-doc tokenize-once + codegen
  * array_intersect. Cross-session noise on this box swamps 0.3 s deltas;
  * this is the controlled comparison.
  */
object ProfileVerifyAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus.toInt, "profile-verify-ab")
    val Disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ab] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val sig = graft.ops.Dedup.minhashSignatureNarrow(docs, "doc_id", "text")
      .persist(Disk)
    val pairs = graft.ops.Dedup.lshCandidates(graft.ops.Dedup.lshBands(sig))
      .persist(Disk)
    println(s"[ab] candidate pairs: ${pairs.count()}")
    val candIds = pairs.select(col("id_a").as("__cid"))
      .union(pairs.select(col("id_b").as("__cid"))).distinct()
    val txtText = docs.select(col("doc_id").as("__cid"), col("text").as("__ct"))
      .join(broadcast(candIds), Seq("__cid"), "left_semi").persist(Disk)
    println(s"[ab] candidate docs: ${txtText.count()}")
    val txtSets = docs.select(col("doc_id").as("__cid"),
        array_distinct(graft.ops.TextAnalysis.shingleArray(col("text"), 3)).as("__sh"))
      .select(col("__cid"), size(col("__sh")).as("__n"), col("__sh"))
      .join(broadcast(candIds), Seq("__cid"), "left_semi").persist(Disk)
    txtSets.count()

    (1 to 3).foreach { rep =>
      timed(s"rep $rep OLD text-kernel verify") {
        pairs
          .join(txtText.select(col("__cid").as("id_a"), col("__ct").as("__ta")), Seq("id_a"))
          .join(txtText.select(col("__cid").as("id_b"), col("__ct").as("__tb")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            graft.functions.ShingleJaccard(col("__ta"), col("__tb"), 3).as("jaccard"))
          .filter(col("jaccard") >= 0.8).count()
      }
      timed(s"rep $rep NEW set-intersect verify") {
        pairs
          .join(txtSets.select(col("__cid").as("id_a"), col("__n").as("__na"),
            col("__sh").as("__sha")), Seq("id_a"))
          .join(txtSets.select(col("__cid").as("id_b"), col("__n").as("__nb"),
            col("__sh").as("__shb")), Seq("id_b"))
          .select(col("id_a"), col("id_b"), col("__na"), col("__nb"),
            size(array_intersect(col("__sha"), col("__shb"))).as("__i"))
          .select(col("id_a"), col("id_b"),
            (col("__i").cast("double") /
              (col("__na") + col("__nb") - col("__i")).cast("double")).as("jaccard"))
          .filter(col("jaccard") >= 0.8).count()
      }
      timed(s"rep $rep NEW including set fetch (uncached)") {
        val ts = docs.select(col("doc_id").as("__cid"),
            array_distinct(graft.ops.TextAnalysis.shingleArray(col("text"), 3)).as("__sh"))
          .select(col("__cid"), size(col("__sh")).as("__n"), col("__sh"))
          .join(broadcast(candIds), Seq("__cid"), "left_semi")
        pairs
          .join(ts.select(col("__cid").as("id_a"), col("__n").as("__na"),
            col("__sh").as("__sha")), Seq("id_a"))
          .join(ts.select(col("__cid").as("id_b"), col("__n").as("__nb"),
            col("__sh").as("__shb")), Seq("id_b"))
          .select(size(array_intersect(col("__sha"), col("__shb"))).as("__i"),
            col("__na"), col("__nb"))
          .filter(col("__i").cast("double") /
            (col("__na") + col("__nb") - col("__i")).cast("double") >= 0.8).count()
      }
      timed(s"rep $rep OLD including text fetch (uncached)") {
        val tt = docs.select(col("doc_id").as("__cid"), col("text").as("__ct"))
          .join(broadcast(candIds), Seq("__cid"), "left_semi")
        pairs
          .join(tt.select(col("__cid").as("id_a"), col("__ct").as("__ta")), Seq("id_a"))
          .join(tt.select(col("__cid").as("id_b"), col("__ct").as("__tb")), Seq("id_b"))
          .select(graft.functions.ShingleJaccard(col("__ta"), col("__tb"), 3).as("jaccard"))
          .filter(col("jaccard") >= 0.8).count()
      }
    }
    spark.stop()
  }
}
