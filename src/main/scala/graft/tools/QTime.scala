package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: best-of-N wall time for named SparkEntry queries with the
  * bench's cache-clearing policy — the targeted inner loop of an
  * optimization round (full Bench runs cost ~15 min; this answers "did
  * that change move THESE queries" in one).
  *
  * Usage: runMain graft.tools.QTime q1,q2,... [sfDir] [reps]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse(
      sys.error("usage: QTime q1,q2,... [sfDir] [reps]")).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus.toInt, "graft-qtime")
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // warm-up at the smallest SF (the bench's policy)
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count(); () }
      catch { case _: Throwable => () }
    }
    clearAll()
    names.foreach { n =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        clearAll()
        t
      }
      println(f"[qtime] $n: min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
