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
    names.foreach { name =>
      val bytes = new AtomicLong
      val records = new AtomicLong
      val listener = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics.shuffleWriteMetrics
          bytes.addAndGet(m.bytesWritten)
          records.addAndGet(m.recordsWritten)
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
    }
    spark.stop()
  }
}
