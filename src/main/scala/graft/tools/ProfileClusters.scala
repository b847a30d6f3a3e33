package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: isolate Dedup.clusters cost on a synthetic pair set. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("profile-clusters")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 100 chains of length 3 + 50 singleton pairs -> 236-ish label moves
    val pairs = ((0L until 100L).flatMap(i => Seq((i * 10, i * 10 + 1), (i * 10 + 1, i * 10 + 2)))
      ++ (2000L until 2050L).map(i => (i * 10, i * 10 + 1))).toDF("id_a", "id_b")
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.clusters(pairs).count()
      println(f"[pc] rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n labels)")
    }
    spark.stop()
  }
}
