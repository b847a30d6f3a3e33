package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times the headline queries at SPARK_GRAFT_SF_DIR
  * and prints exactly one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names =
      if (SparkEntry.benchQueries.nonEmpty) SparkEntry.benchQueries
      else SparkEntry.queries.keys.toSeq.sorted
    // JVM/codegen warm-up on the smallest SF so we time the query, not
    // the first-call compilation; per-query timing then uses a full
    // materialization (count) at the target SF.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // best-of-2 at the target SF: the first run can still absorb SF-
    // specific JIT/codegen; the min is the steady-state figure and is
    // stable round over round.
    val results = names.map { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
