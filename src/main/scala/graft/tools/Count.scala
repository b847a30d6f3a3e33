package graft.tools
object Count { def main(a: Array[String]): Unit =
  println(s"queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size} bench=${graft.SparkEntry.benchQueries.size}") }
