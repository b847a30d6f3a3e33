package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan inspection utility: prints `explain("formatted")` (and optionally
  * wall time) for the named queries — or all of them — at a given SF dir.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [time] [q_name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val doTime = args.contains("time")
    val names = args.drop(1).filter(_.startsWith("q_")) match {
      case Array() => SparkEntry.queries.keys.toSeq.sorted
      case qs => qs.toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      if (doTime) {
        val t0 = System.nanoTime()
        df.count()
        println(f"[time] $n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
