package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional trailing names: dump only those queries (dev loop); the
    // driver's 2-arg form dumps everything
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus.toInt, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Queries are independent reads; run a few concurrently so the wall
    // time is bounded by the heavy ones, not the sum. Failures are
    // per-query (a missing output dir = that query failed, not the run).
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // the missing-dir-means-failed contract must hold when outDir
          // is REUSED (the dev `only` loop): a stale previous dump — or
          // a partial dir from a mid-job death — would otherwise be
          // compared against the oracle as if it were this run's result
          try org.apache.commons.io.FileUtils.deleteDirectory(
            new java.io.File(s"$outDir/$name"))
          catch { case _: Throwable => () }
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // ONE escaper (graft.Json) for every hand-rolled JSON emitter — a
    // control-char fix must never silently miss this file, whose
    // malformed output would zero the round's correctness gate.
    def q(s: String): String = Json.str(s)
    // fixture-path tokens resolve against THIS run's sf dir (the Spark
    // queries above already wrote those fixtures — see queries.Fixtures)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) =>
        s"${q(k)}: ${q(graft.queries.Fixtures.render(v, sfDir))}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
