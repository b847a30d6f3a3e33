package graft

import graft.SparkSpec

/** The session recipes carry the configuration contract the physical
  * plans assume — losing one knob at deploy time is a silent scale
  * regression, so the contract itself is pinned.
  */
class SessionsSpec extends SparkSpec {

  test("cluster posture pins every assumption the plans are designed against") {
    val c = Sessions.ClusterConf
    // AQE family: wide planning ceiling + runtime coalesce + skew split
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.shuffle.partitions").toInt >= 1024,
      "cluster shuffle width must be a wide ceiling for AQE to coalesce")
    // dimension broadcast design point: above Spark's 10m default
    val thr = c("spark.sql.autoBroadcastJoinThreshold")
    assert(thr.endsWith("m") && thr.stripSuffix("m").toInt > 10)
    // every window/timestamp in the query set assumes UTC
    assert(c("spark.sql.session.timeZone") == "UTC")
    // scan splits at 100 TB are sized by maxPartitionBytes with Spark's
    // DEFAULT per-file open cost; the 64 KB open-cost floor and the
    // minPartitionNum=cpus floor are LOCAL-mode measurement fixes
    // (Sessions.local scaladoc) and must never leak into the cluster
    // posture — a 64 KB open cost at 100 TB would under-charge
    // many-small-file corpora and explode the scan task count
    assert(c("spark.sql.files.maxPartitionBytes") == "256m")
    assert(!c.contains("spark.sql.files.openCostInBytes"),
      "cluster posture must keep Spark's default openCostInBytes")
    assert(!c.contains("spark.sql.files.minPartitionNum"),
      "cluster posture must not pin a local-mode parallelism floor")
  }

  test("the function surface registers post-hoc on sessions not built by the recipes") {
    // Sessions.local/clusterBuilder wire GraftExtensions at build time; a
    // session built elsewhere (like this suite's) gets the same surface
    // via the post-hoc path the recipes delegate to
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT minhash_signature('a b c d e f', 3, 6) AS sig").count()
    assert(n == 1L)
  }
}
