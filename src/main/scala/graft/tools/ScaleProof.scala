package graft.tools

/** Targeted scale-proof: time NAMED queries at 1× and ×F without paying
  * for a full bench sweep. The per-round bench already scale-checks the
  * top-N heaviest headliners at ×8; this tool answers the deeper
  * one-off questions — "does the worst scaler's trend hold another two
  * octaves?", "where does a scale-variant cross over?" — by replicating
  * the sf dir ×F ([[ScaleUp]], deterministic, selectivity-preserving)
  * and best-of-2-timing just the queries under investigation at both
  * sizes.
  *
  * Usage: `runMain graft.tools.ScaleProof <factor> <q1,q2,...> [outPath]`
  * Writes one JSON object {factor, queries: {name: {t1, tf, ratio}}} to
  * `outPath` (default `scaleproof_x<factor>.json`) and stdout.
  */
object ScaleProof {

  private def clearAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length >= 2, "usage: ScaleProof <factor> <q1,q2,...> [outPath]")
    val factor = args(0).toInt
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outPath = if (args.length > 2) args(2) else s"scaleproof_x$factor.json"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scaleproof")
    names.foreach { n =>
      require(graft.SparkEntry.queries.contains(n), s"unknown query $n") }

    val scaledDir = ScaleUp.ensure(spark, sfDir, factor)
    clearAll(spark)

    def best2(name: String, dir: String): Double = {
      val q = graft.SparkEntry.queries(name)
      // warm-up absorbs one-time fixture setup / codegen for this dir
      q(spark, dir).count(); clearAll(spark)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        clearAll(spark); t
      }
      ts.min
    }

    val entries = names.map { n =>
      val t1 = best2(n, sfDir)
      val tF = best2(n, scaledDir)
      System.err.println(f"[scaleproof] $n t1=$t1%.3f tf=$tF%.3f ratio=${tF / t1}%.2f")
      (n, t1, tF)
    }
    val qjson = entries.map { case (n, t1, tF) =>
      graft.Json.str(n) + ":" +
        f"""{"t1":$t1%.4f,"tf":$tF%.4f,"ratio":${tF / t1}%.3f}"""
    }.mkString("{", ",", "}")
    val line = s"""{"factor":$factor,"sf":${graft.Json.str(sfDir)},"queries":$qjson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    spark.stop()
    println(line)
  }
}
