package graft.tools
object DumpQ { def main(a: Array[String]): Unit =
  graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println) }
