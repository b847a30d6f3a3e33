package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.etl.Refresh

/** Scale-toolkit specs: salted agg/join equivalence, bucketed co-located
  * joins (no exchange), and partition-pruned extract layout.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals direct aggregation") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("qty"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val salted = Scale.saltedAgg(li, Seq("l_returnflag"), $"l_orderkey", 8,
        partialAggs = Seq(sum($"l_quantity").as("p_qty"), count(lit(1)).as("p_n")),
        finalAggs = Seq(sum($"p_qty").as("qty"), sum($"p_n").as("n")))
      .as[(String, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (q, n)) =>
      assert(math.abs(salted(k)._1 - q) < 1e-6 && salted(k)._2 == n)
    }
  }

  test("saltedJoin is row-identical to the plain join on both paths") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val custDim = Tables.customer(spark, sf)
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val plain = orders.join(custDim, Seq("o_custkey"))
      .select("o_orderkey", "c_name").as[(Long, String)].collect().sorted.toSeq

    // broadcastable small side → the salt is skipped entirely (no
    // Generate/explode anywhere in the plan): under a broadcast join
    // there is no shuffle skew for a salt to fix
    val auto = Scale.saltedJoin(orders, custDim, Seq("o_custkey"),
      entropy = $"o_orderkey", n = 8)
    assert(!auto.queryExecution.executedPlan.toString.contains("Generate"))
    assert(auto.select("o_orderkey", "c_name")
      .as[(Long, String)].collect().sorted.toSeq == plain)

    // forceSalt exercises the salted (key, salt) join — still identical
    val salted = Scale.saltedJoin(orders, custDim, Seq("o_custkey"),
        entropy = $"o_orderkey", n = 8, forceSalt = true)
    assert(salted.queryExecution.executedPlan.toString.contains("Generate"))
    assert(salted.select("o_orderkey", "c_name")
      .as[(Long, String)].collect().sorted.toSeq == plain)
    assert(plain.nonEmpty)

    // left-semi through the salted path stays correct too (small side
    // emits nothing, so replication is invisible)
    val semi = Scale.saltedJoin(orders, custDim, Seq("o_custkey"),
        entropy = $"o_orderkey", n = 8, joinType = "left_semi",
        forceSalt = true)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val plainSemi = orders.join(custDim, Seq("o_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(semi == plainSemi)

    // join types that preserve unmatched SMALL-side rows would emit
    // them once per salt replica — rejected loudly, not silently wrong
    val e = intercept[IllegalArgumentException] {
      Scale.saltedJoin(orders, custDim, Seq("o_custkey"),
        entropy = $"o_orderkey", n = 8, joinType = "right",
        forceSalt = true)
    }
    assert(e.getMessage.contains("salt"))
  }

  test("saltFactorFor audits the hot key; the audited join treats it and stays row-identical") {
    // diagnose → treat: the audit scan recommends the fan-out the
    // hottest key needs; the n-less saltedJoin overload applies it.
    // Hot-key fixture: one key holds half the rows across 10 keys, so
    // its salt_factor is ceil(500 * 10 / ~1000) ≈ 5.
    val large = spark.range(1000).select(
      when($"id" < 500, lit(0L)).otherwise($"id" % 9 + 1).as("k"),
      $"id".as("payload"))
    // the back-to-mean recommendation is 5 here, but the fan-out is
    // CAPPED at task parallelism (4 in this suite's local[4] session):
    // spreading a hot key over more subkeys than the cluster has task
    // slots buys nothing while the small side replicates per subkey
    val par = spark.sparkContext.defaultParallelism
    val audited = Scale.saltFactorFor(large, Seq("k"))
    assert(audited == math.min(5, par),
      s"hot key must audit to min(5, parallelism=$par) subkeys, got $audited")
    // uniform keys audit to 1 — salting a healthy join buys nothing
    val uniform = spark.range(1000).select(($"id" % 10).as("k"))
    assert(Scale.saltFactorFor(uniform, Seq("k")) == 1)
    // heavy tail: one key holds half the corpus across ~1000 distinct
    // keys — the raw back-to-mean formula says ~500 subkeys, which would
    // replicate the small side 500×; the cap holds it at parallelism
    val heavyTail = spark.range(2000).select(
      when($"id" < 1000, lit(0L)).otherwise($"id").as("k"))
    assert(Scale.saltFactorFor(heavyTail, Seq("k")) == par,
      "heavy-tail fan-out must cap at task parallelism")
    // the audited overload picks n >= the recommendation internally and
    // the result is row-identical to the plain join
    val small = spark.range(10).select($"id".as("k"), concat(lit("v"), $"id").as("name"))
    val plain = large.join(small, Seq("k"))
      .select("payload", "name").as[(Long, String)].collect().sorted.toSeq
    // shrink the broadcast threshold so the audited path actually engages
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val treated = Scale.saltedJoin(large, small, Seq("k"),
        entropy = $"payload", joinType = "inner")
      assert(treated.queryExecution.executedPlan.toString.contains("Generate"),
        "the audited join must have engaged the salted path")
      assert(treated.select("payload", "name")
        .as[(Long, String)].collect().sorted.toSeq == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("bucketed tables co-locate the join: no exchange in the plan") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.contains("graft"), s"warehouse must be a scratch dir, got $wh")
    // fresh in-memory catalog + stale on-disk warehouse from a prior JVM
    // → drop both sides before recreating
    for (t <- Seq("orders_bkt", "customer_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(new java.net.URI(wh).getPath, t)
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, sf)
      .select($"c_custkey".as("o_custkey"), $"c_acctbal")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_bkt")
    val joined = spark.table("orders_bkt").join(spark.table("customer_bkt"), "o_custkey")
    // bucketed-bucketed equi-join on the bucket key needs no shuffle;
    // disable broadcast to force the merge path and prove co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles: ${plan.take(600)}")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("rangedRunningSum equals the single-partition global window, without one") {
    // the distributed prefix sum must reproduce sum(v) OVER (ORDER BY ...)
    // exactly at every run boundary — checked on real event data with
    // duplicate keys — while planning NO partition-less window (the
    // single-task straggler it exists to remove)
    val ev = Tables.events(spark, sf)
      .select(to_date($"ts").as("day"), lit(1).as("one"))
      .groupBy("day").agg(count(lit(1)).cast("int").as("v"))
    val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expect = ev.withColumn("cum", sum($"v").over(w))
      .select("day", "cum").as[(java.sql.Date, Long)].collect().toMap
    // forceDistributed: the test frame is tiny, so the adaptive switch
    // would otherwise plan the (trivially equal) global window and the
    // distributed path would go unexercised
    val dist = Scale.rangedRunningSum(ev, Seq("day"), $"v", "cum",
      forceDistributed = true)
    // the adaptive small path must agree too
    val small = Scale.rangedRunningSum(ev, Seq("day"), $"v", "cum")
      .select("day", "cum").as[(java.sql.Date, Long)].collect().toMap
    assert(small == expect)
    try {
      val got = dist.select("day", "cum").as[(java.sql.Date, Long)].collect().toMap
      assert(got == expect)
      // plan property: every window in the distributed form is keyed
      val plan = dist.queryExecution.executedPlan.toString
      assert(!plan.contains("Window [") ||
        "windowspecdefinition\\(\\s*(day|__part)".r.findFirstIn(plan).isDefined)
      assert(plan.contains("__part") || plan.contains("InMemory"),
        "distributed form must window per range partition")
    } finally dist.unpersist(blocking = false)
  }

  test("rangedRunningSum resolves equal-key ties identically to the global window at run boundaries") {
    // duplicate (t, delta) rows: per-row sums within a tied run are
    // order-arbitrary in BOTH forms; the value at the END of each tied
    // run (what max-over-group consumers read) must be identical
    val deltas = Seq(("a", 1), ("a", 1), ("a", -1), ("b", 1), ("b", -1), ("b", -1))
      .toDF("t", "delta")
    val dist = Scale.rangedRunningSum(deltas, Seq("t", "delta"), $"delta", "cur",
      forceDistributed = true)
    try {
      // end-of-run value per (t, delta) run: the run adds delta per row,
      // so the end is max(cur) for ascending (+1) runs and min(cur) for
      // descending (-1) runs
      val ends = dist.groupBy("t", "delta")
        .agg(when(first($"delta") > 0, max($"cur")).otherwise(min($"cur")).as("m"))
        .as[(String, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      // global truth by hand: order (a,-1),(a,1),(a,1),(b,-1),(b,-1),(b,1)
      // → sums -1, 0, 1, 0, -1, 0; run ends: -1, 1, -1, 0
      assert(ends(("a", -1)) == -1L && ends(("a", 1)) == 1L)
      assert(ends(("b", -1)) == -1L && ends(("b", 1)) == 0L)
      // and the per-day peak (what q_concurrency consumes) matches the
      // global-window formulation exactly
      val w = org.apache.spark.sql.expressions.Window.orderBy($"t", $"delta")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val peaksGlobal = deltas.withColumn("cur", sum($"delta").over(w))
        .groupBy("t").agg(max($"cur").as("p"))
        .as[(String, Long)].collect().toMap
      val peaksDist = dist.groupBy("t").agg(max($"cur").as("p"))
        .as[(String, Long)].collect().toMap
      assert(peaksDist == peaksGlobal)
    } finally dist.unpersist(blocking = false)
  }

  test("count-min sketch bounds heavy-hitter counts (mergeable sketch surface)") {
    val ev = Tables.events(spark, sf)
    val total = ev.count()
    val eps = 0.001
    val cms = ev.stat.countMinSketch("event_type", eps = eps, confidence = 0.99, seed = 42)
    val exact = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      // CMS never undercounts; overcount bounded by eps * stream length
      assert(est >= n, s"$k: $est < $n")
      assert(est <= n + (eps * total).toLong + 1, s"$k: $est vs $n")
    }
  }

  test("partitioned extract layout prunes partitions at read") {
    val path = java.nio.file.Files.createTempDirectory("extract_part").toString + "/events"
    val ev = Tables.events(spark, sf).withColumn("day", to_date($"ts"))
    Refresh.overwrite(ev, path, partitionByCols = Seq("event_type"))
    val read = spark.read.parquet(path).filter($"event_type" === "click")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan.take(600))
    assert(read.count() > 0)
    // pruned scan must not list non-matching partition directories' files
    val allTypes = spark.read.parquet(path).select("event_type").distinct().count()
    assert(allTypes > 1)
  }
}
