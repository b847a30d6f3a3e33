package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev scratch: per-stage wall/CPU attribution for one SparkEntry query —
  * the Spark-UI stage table for a UI-less sandbox. Prints every completed
  * stage's duration, task count, and callsite so fixed-overhead stages
  * (barriers, tiny exchanges) are distinguishable from real compute.
  *
  * Usage: runMain graft.tools.StageProfile <query> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: StageProfile <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.local(cpus.toInt, "stage-profile")
    def clearAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // warm run (JIT/codegen) unprofiled
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    clearAll()

    val stages = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Int, String)]()
    val jobs = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        val ops = i.rddInfos.flatMap(_.scope).map(_.name)
          .distinct.take(8).mkString(",")
        stages += ((i.stageId, dur, i.taskMetrics.executorRunTime,
          i.numTasks, s"${i.name.takeWhile(_ != '\n').take(40)} | $ops"))
      }
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs += ((js.jobId, js.time))
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"[sp] $name wall: $wall%.3f s; jobs: ${jobs.size}; stages: ${stages.size}")
    println(f"[sp] sum(stage wall): ${stages.map(_._2).sum / 1e3}%.3f s; " +
      f"sum(executor run): ${stages.map(_._3).sum / 1e3}%.3f s")
    stages.sortBy(-_._2).take(40).foreach { case (id, dur, run, nt, nm) =>
      println(f"[sp] stage $id%4d  wall ${dur / 1e3}%7.3f s  execRun ${run / 1e3}%8.3f s  tasks $nt%3d  $nm")
    }
    spark.stop()
  }
}
