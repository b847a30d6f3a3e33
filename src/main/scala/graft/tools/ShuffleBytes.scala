package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: total shuffle-write bytes for one or more SparkEntry
  * queries — the directly-measured side of a "narrower shuffle" claim
  * (wall-clock on local[N] hides network cost, where shuffle width is
  * the thing that actually bites on a 1000-executor cluster).
  *
  * Usage: runMain graft.tools.ShuffleBytes <q1,q2,...> [sfDir]
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    // same reason Bench pins it: f"" interpolators under a comma-decimal
    // locale would print sec=1,23 and break parsers of the record line
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val names = args.headOption
      .getOrElse(sys.error("usage: ShuffleBytes <q1,q2,...> [sfDir]"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-shufflebytes")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // SPARK_GRAFT_SHUFFLE_STAGES=1 adds a per-stage breakdown (bytes,
    // records, task time per completed stage) — the attribution a
    // "which shuffle dominates" floor analysis needs
    val perStage = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_STAGES", "0") == "1"
    names.foreach { name =>
      val bytes = new AtomicLong
      val records = new AtomicLong
      val stages =
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Long, Long, Int)]()
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics.shuffleWriteMetrics
          bytes.addAndGet(m.bytesWritten)
          records.addAndGet(m.recordsWritten)
          stages.add((sc.stageInfo.stageId, m.bytesWritten, m.recordsWritten,
            sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead,
            sc.stageInfo.taskMetrics.executorRunTime,
            sc.stageInfo.numTasks))
          ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshim.Shim.waitForListenerBus(spark)
      spark.sparkContext.removeSparkListener(listener)
      spark.sharedState.cacheManager.clearCache()
      spark.catalog.clearCache()
      println(f"[shuffle] $name rows=$n shuffle_bytes=${bytes.get} " +
        f"shuffle_records=${records.get} sec=$sec%.2f")
      if (perStage)
        stages.toArray(Array.empty[(Int, Long, Long, Long, Long, Int)])
          .sortBy(_._1).foreach { case (id, b, r, rd, rt, nt) =>
            println(s"[stage] $name stage=$id write_bytes=$b write_records=$r " +
              s"read_bytes=$rd task_ms=$rt tasks=$nt")
          }
    }
    spark.stop()
  }
}
