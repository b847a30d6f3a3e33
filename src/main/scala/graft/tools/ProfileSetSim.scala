package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Tables
import graft.ops.Dedup

/** Dev scratch: stage-by-stage wall times for the lossless set-sim tier
  * (q_setsim_join / q_setsim_decontaminate / q_setsim_index) — which of
  * tokenize / frequency / canonical-order window / prefix self-join /
  * verification / index write dominates at a given SF.
  */
object ProfileSetSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("profile-setsim")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pss] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val Disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    (1 to 2).foreach { rep =>
      println(s"[pss] === rep $rep (self-join fixture) ===")
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val words = split(col("text"), " ")
      val keep = greatest(ceil(size(words) *
          (lit(0.5) + (col("doc_id") % 10).cast("double") * lit(0.05)))
        .cast("int"), lit(3))
      val twins = docs.select((col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(words, lit(1), keep), " ").as("text"))
      val corpus = docs.unionAll(twins)
      timed("0 corpus count")(corpus.count())

      // mirror setSimCandidates' stages with explicit breaks
      val num = 7; val den = 10; val n = 3
      val tok = corpus.select(col("doc_id").as("id"),
        explode(array_distinct(graft.ops.TextAnalysis.shingleArray(col("text"), n)))
          .as("tok"))
      timed("1 tok explode count")(tok.count())
      val freq = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      timed("2 freq agg count")(freq.count())
      import org.apache.spark.sql.expressions.Window
      val sized = tok.join(freq, Seq("tok"))
        .withColumn("pos",
          row_number().over(Window.partitionBy("id").orderBy(col("cnt"), col("tok"))))
        .withColumn("s", count(lit(1)).over(Window.partitionBy("id")))
      val prefix = sized
        .filter(col("pos") <= col("s") -
          expr(s"($num * s + ${den - 1}) DIV $den") + 1)
        .select(col("tok"), col("id"), col("s"), col("pos"))
      timed("3 prefix (join+window) count")(prefix.count())
      val pf = prefix.persist(Disk)
      pf.count()
      val rows = pf.as("a").join(pf.as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.s").as("s_a"), col("b.s").as("s_b"),
          (lit(1L) + least(col("a.s") - col("a.pos"), col("b.s") - col("b.pos")))
            .as("__ub"))
        .filter(lit(den.toLong) * least(col("s_a"), col("s_b")) >=
          lit(num.toLong) * greatest(col("s_a"), col("s_b")))
        .filter(lit((num + den).toLong) * col("__ub") >=
          lit(num.toLong) * (col("s_a") + col("s_b")))
        .select(col("id_a"), col("id_b"), col("s_a"), col("s_b")).distinct()
      timed("4 candidate join (prefix cached) count")(rows.count())
      pf.unpersist(blocking = false)
      timed("5 full setSimJoinExact")(
        Dedup.setSimJoinExact(corpus, "doc_id", "text", num, den).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

      println(s"[pss] === rep $rep (index fixture) ===")
      val probes = docs.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          array_join(slice(words, lit(1),
            greatest(ceil(size(words) *
                (lit(0.5) + expr("(doc_id % 250) DIV 25").cast(DoubleType) * lit(0.05)))
              .cast("int"), lit(3))), " ").as("text"))
      val idx = s"${sys.props("java.io.tmpdir")}/pss_setsim_index_$rep"
      timed("6 writeSetSimIndex")(
        Dedup.writeSetSimIndex(docs, "doc_id", "text", idx))
      timed("7 setSimAgainstIndex")(
        Dedup.setSimAgainstIndex(probes, "doc_id", "text", idx, docs,
          num, den).count())
      timed("8 setSimJoinExactRS (decontam shape)")(
        Dedup.setSimJoinExactRS(probes, docs, "doc_id", "text", num, den).count())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
