package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.ops.{Dedup, TextAnalysis}

/** Dev scratch (r18): stage wall times for the remaining heavy headliners —
  * q_setsim_index's build/probe halves, q_ngram_spans' gram stages, and
  * q_curation_pipeline's quality/pairs/collapse/contamination segments.
  */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus.toInt, "profile-r18")
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p18] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    docs.count()

    (1 to 2).foreach { rep =>
      println(s"[p18] === rep $rep: setsim_index halves ===")
      val words = split(col("text"), " ")
      val probes = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          array_join(slice(words, lit(1),
            greatest(ceil(size(words) *
                (lit(0.5) + expr("(doc_id % 250) DIV 25").cast(DoubleType) * lit(0.05)))
              .cast("int"), lit(3))), " ").as("text"))
      val idx = s"${sys.props("java.io.tmpdir")}/p18_idx_$rep"
      timed("index write")(Dedup.writeSetSimIndex(docs, "doc_id", "text", idx))
      timed("index probe")(Dedup.setSimAgainstIndex(
        probes, "doc_id", "text", idx, docs, 7, 10).count())
      clearAll()

      println(s"[p18] === rep $rep: ngram_spans stages ===")
      val toks = docs.select(col("doc_id").as("id"),
          TextAnalysis.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 8)
      val grams = toks.select(col("id"), explode(expr(
        """transform(sequence(1, size(w) - 7),
          |i -> struct(i AS start, array_join(slice(w, i, 8), ' ') AS g))"""
          .stripMargin.replace("\n", " "))).as("p"))
        .select(col("id"), col("p.start").as("start"), col("p.g").as("g"))
      timed("grams explode count")(grams.count())
      val flagged = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select(col("g"))
      timed("flagged agg count")(flagged.count())
      timed("full q_ngram_spans")(
        graft.SparkEntry.queries("q_ngram_spans")(spark, sfDir).count())
      timed("full q_ngram_spans_hashed")(
        graft.SparkEntry.queries("q_ngram_spans_hashed")(spark, sfDir).count())
      clearAll()

      println(s"[p18] === rep $rep: curation segments ===")
      val bench = docs.filter(col("doc_id") % 50 === 0)
      val tokc = TextAnalysis.tokens(col("text"))
      val q = docs.filter(col("doc_id") % 50 =!= 0)
        .filter((size(filter(tokc, t => t.isin(TextAnalysis.StopwordsEn.map(lit): _*)))
          .cast(DoubleType) / size(tokc).cast(DoubleType)) >= 0.05)
      timed("1 quality filter count")(q.count())
      val pairs = timed("2 nearDupPairs")(
        Dedup.nearDupPairs(q, "doc_id", "text", threshold = 0.8)
          .select("id_a", "id_b"))
      val ded = timed("3 canonical+leaf")(
        Dedup.materializeLeaf(Dedup.canonicalDocs(q, "doc_id", pairs))._1)
      val contaminated = timed("4 contamination")(
        Dedup.contamination(ded, bench, "doc_id", "text")
          .filter(col("overlap_ratio") > 0.5).select(col("id").as("doc_id")))
      timed("4b contamination count")(contaminated.count())
      val clean = ded.join(contaminated, Seq("doc_id"), "left_anti")
      timed("5 split agg")(
        graft.ops.Sampling.deterministicSplit(clean, "doc_id")
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextAnalysis.tokenCount(col("text"))).as("n_tokens"))
          .orderBy("split").count())
      clearAll()
    }
    spark.stop()
  }
}
