package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Dev scratch (r19): quantify the exact set-sim candidate join's
  * hot-token cross-product and what a size-banded inverted list would
  * cut. For the q_setsim_join twin corpus at 7/10: per prefix token with
  * d entries the join emits C(d,2) raw rows; banding by set-size octave
  * (bit length of s — exact integer banding, no FP) restricts pairing to
  * same-or-adjacent bands, which is lossless for num/den >= 1/2 because
  * the length filter den·min >= num·max already kills any pair whose
  * sizes differ by more than 2x. Prints raw vs banded pair mass, the
  * post-filter row counts, and the prefix-size distribution, so the
  * banding decision is a measured number, not a hunch.
  */
object ProfileSetSimCand {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus.toInt, "profile-setsim-cand")
    import org.apache.spark.sql.types.LongType

    val docs0 = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val words = split(col("text"), " ")
    val keep = greatest(ceil(size(words) *
        (lit(0.5) + (col("doc_id") % 10).cast("double") * lit(0.05)))
      .cast("int"), lit(3))
    val twins = docs0.select((col("doc_id") + 10000000L).as("doc_id"),
      array_join(slice(words, lit(1), keep), " ").as("text"))
    val corpus = docs0.unionAll(twins)

    val (num, den) = (7, 10)
    val tok = corpus.select(col("doc_id").as("id"),
        array_distinct(graft.ops.TextAnalysis.shingleArray(col("text"), 3)).as("__toks"))
      .select(col("id"), size(col("__toks")).cast(LongType).as("s"),
        explode(col("__toks")).as("tok"))
    val freq = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val prefix = tok.join(freq, Seq("tok"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy(col("cnt"), col("tok"))))
      .filter(col("pos") <= col("s") -
        expr(s"($num * s + ${den - 1}) DIV $den") + 1)
      .select(col("tok"), col("id"), col("s"), col("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    println(s"[cand] prefix rows: ${prefix.count()}")
    println("[cand] set-size distribution over prefix rows (log2 bands):")
    prefix.groupBy(length(bin(col("s"))).as("band"))
      .agg(count(lit(1)).as("rows"), countDistinct(col("id")).as("docs"))
      .orderBy("band").collect()
      .foreach(r => println(s"[cand]   band ${r.get(0)}: rows ${r.get(1)} docs ${r.get(2)}"))

    // raw pair mass: sum over tokens of C(d, 2)
    val byTok = prefix.groupBy("tok").agg(count(lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = byTok.agg(sum(col("d") * (col("d") - 1) / 2)).head().getDouble(0)
    val topTok = byTok.orderBy(col("d").desc).limit(10).collect()
      .map(r => s"${r.get(1)}").mkString(", ")
    println(f"[cand] raw join pair mass sum C(d,2): $raw%.0f  (top-10 token d: $topTok)")

    // banded pair mass: same-band C(n,2) + adjacent-band n_b * n_{b+1}
    val tb = prefix.groupBy(col("tok"), length(bin(col("s"))).as("b"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val within = tb.agg(sum(col("n") * (col("n") - 1) / 2)).head().getDouble(0)
    val adj = tb.as("x").join(tb.as("y"),
        col("x.tok") === col("y.tok") && col("x.b") + 1 === col("y.b"))
      .agg(coalesce(sum(col("x.n") * col("y.n")), lit(0.0))).head().getDouble(0)
    println(f"[cand] banded pair mass: within $within%.0f + adjacent $adj%.0f = ${within + adj}%.0f  (cut ${raw / (within + adj)}%.2fx)")

    // actual candidate-stage row counts at each filter step
    val rows = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"),
        (lit(1L) + least(col("a.s") - col("a.pos"), col("b.s") - col("b.pos")))
          .as("__ub"))
    val nRaw = rows.count()
    val lenF = rows.filter(lit(den.toLong) * least(col("s_a"), col("s_b")) >=
      lit(num.toLong) * greatest(col("s_a"), col("s_b")))
    val nLen = lenF.count()
    val posF = lenF.filter(lit((num + den).toLong) * col("__ub") >=
      lit(num.toLong) * (col("s_a") + col("s_b")))
    val nPos = posF.count()
    val nDist = posF.select("id_a", "id_b", "s_a", "s_b").distinct().count()
    println(s"[cand] join rows raw=$nRaw lenFilter=$nLen posFilter=$nPos distinct=$nDist")
    spark.stop()
  }
}
