package graft.tools

/** Driver-contract smoke: entry() must return >0 rows at sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8, "entry-smoke")
    println("[entry-smoke] rows=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
