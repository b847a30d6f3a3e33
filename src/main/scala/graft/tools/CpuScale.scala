package graft.tools

/** Core-count scaling receipt (r19, the r18 verdict's "what's wrong" #5):
  * at sf0.1 every headliner's 8-vs-32-core ratio sits ≈1 — the bench
  * stopped resolving PARALLEL-execution improvements, so optimization
  * rounds need a compute-bound receipt judged on cores, not job
  * overhead. This tool times named queries at two widths in FRESH
  * sessions (width is a session property — it cannot be swept inside
  * one) over an optionally SCALED-UP data dir (ScaleUp's deterministic
  * ×F replica: more data per stage pushes queries off the job-setup
  * floor and onto compute, where the core ratio is meaningful), and
  * appends one JSON line per query to a ledger.
  *
  * ratio = tLow / tHigh: ≈ cpusHigh/cpusLow when compute-bound and the
  * operator parallelizes; ≈ 1 when the query is job-setup bound at this
  * size (expected for sub-second queries at 1×).
  *
  * Usage: runMain graft.tools.CpuScale q1,q2,... [out.json] [factor]
  *   SPARK_GRAFT_CPUS (default 32) = the high width; low = high/4 (min 4).
  */
object CpuScale {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(
      sys.error("usage: CpuScale q1,q2,... [out.json] [factor]")).split(",").toSeq
    val outPath = args.lift(1).getOrElse("CPUSCALING_r19.json")
    val factor = args.lift(2).map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = math.max(4, hi / 4)

    def bestOf(spark: org.apache.spark.sql.SparkSession, name: String,
               dir: String, reps: Int): Double = {
      def clearAll(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
      // one untimed warm-up (JIT/codegen), then best-of-reps
      try { graft.SparkEntry.queries(name)(spark, dir).count(); () }
      catch { case _: Throwable => () }
      clearAll()
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        clearAll()
        t
      }.min
    }

    // the scaled dir is materialized once under the HIGH session
    var spark = graft.Sessions.local(hi, "cpuscale-hi")
    val dir =
      if (factor >= 2) graft.tools.ScaleUp.ensure(spark, sfDir, factor)
      else sfDir
    val hiTimes = names.map(n => n -> bestOf(spark, n, dir, 2)).toMap
    spark.stop()
    spark = graft.Sessions.local(lo, "cpuscale-lo")
    val loTimes = names.map(n => n -> bestOf(spark, n, dir, 2)).toMap
    spark.stop()

    val lines = names.map { n =>
      val (th, tl) = (hiTimes(n), loTimes(n))
      f"""{"query":${graft.Json.str(n)},"sf":${graft.Json.str(dir)},"factor":$factor,""" +
        f""""cpus_hi":$hi,"cpus_lo":$lo,"t_hi":$th%.3f,"t_lo":$tl%.3f,""" +
        f""""ratio":${tl / th}%.3f}"""
    }
    lines.foreach(println)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      lines.mkString("", "\n", "\n"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}
