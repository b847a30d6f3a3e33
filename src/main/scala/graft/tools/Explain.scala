package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run one SparkEntry query at a given SF dir, print its wall
  * time and formatted physical plan — the iterate-on-the-plan loop
  * (SURVEY: ".explain('formatted') the plan and iterate until it's the
  * plan you'd want").
  *
  * Usage: runMain graft.tools.Explain <queryName> [sfDir] [reps]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the bench's exact session recipe — captured plans must reflect the
    // configuration the bench actually runs under
    val spark = graft.Sessions.local(cpus.toInt, "graft-explain")
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[explain] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      spark.catalog.clearCache()
    }
    println("[explain] === formatted plan ===")
    val df = fn(spark, sfDir)
    df.count() // populate AQE final plan
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
