package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("removeGroupNames strips XLSForm group prefixes from headers") {
    val df = Seq((1, "A", 3.0)).toDF("hh/name", "hh/sub/age", "plain")
    assert(Shape.removeGroupNames(df).columns.toSeq == Seq("name", "age", "plain"))
  }

  test("renameLabels subsets and renames") {
    val df = Seq((1, "x", true)).toDF("a", "b", "c")
    val out = Shape.renameLabels(df, Seq("b" -> "label_b", "a" -> "label_a"))
    assert(out.columns.toSeq == Seq("label_b", "label_a"))
  }

  test("select-multiple round trip: value shape → split indicators") {
    val df = Seq((1L, "piped well"), (2L, "piped"), (3L, "")).toDF("id", "water")
    val wide = df.groupBy($"id")
      .agg(Shape.splitIndicators($"water", Seq("piped", "well")).head,
           Shape.splitIndicators($"water", Seq("piped", "well")).last)
      .orderBy("id").as[(Long, Int, Int)].collect().toSeq
    assert(wide == Seq((1L, 1, 1), (2L, 1, 0), (3L, 0, 0)))
  }

  test("failure counter flags entities at the threshold") {
    val log = Seq((1L, false), (1L, false), (1L, false), (2L, false), (2L, true))
      .toDF("file_id", "ok")
    val out = State.failureCounts(log, "file_id", !$"ok")
      .orderBy("file_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 3L, true), (2L, 1L, false)))
    val deact = State.toDeactivate(log, "file_id", !$"ok").as[(Long, Long)].collect()
    assert(deact.toSeq == Seq((1L, 3L)))
  }

  test("syncable excludes queued/syncing (the 202 guard)") {
    val df = Seq(("a", "queued"), ("b", "syncing"), ("c", "file_available"),
      ("d", "latest_sync_failed")).toDF("id", "status")
    assert(State.syncable(df, "status").as[(String, String)].collect().map(_._1).toSeq
      == Seq("c", "d"))
  }

  test("latestPerKey picks newest with deterministic tie-break") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "old"),
      (1L, "2024-01-01 11:00:00", 2L, "new"),
      (1L, "2024-01-01 11:00:00", 3L, "tie_wins"),
      (2L, "2024-01-01 09:00:00", 4L, "only"))
      .toDF("k", "ts_s", "id", "tag")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = Windows.latestPerKey(df, "k", "ts", "id")
      .orderBy("k").select("tag").as[String].collect().toSeq
    assert(out == Seq("tie_wins", "only"))
  }

  test("latestPerKey aggregate form == rank-window form on real events") {
    val ev = graft.Tables.events(spark, sf)
    val viaAgg = Windows.latestPerKey(ev, "user_id", "ts", "event_id")
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val viaWin = Windows.latestPerKeyWindow(ev, "user_id", "ts", "event_id")
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(viaAgg.nonEmpty && viaAgg == viaWin)
  }

  test("topKPerKey == rank-window top-k on real events") {
    val ev = graft.Tables.events(spark, sf)
    val viaAgg = Windows.topKPerKey(ev, "user_id", Seq("ts", "event_id"), 3)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val viaWin = ev.withColumn("__rn", row_number().over(w))
      .filter($"__rn" <= 3)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(viaAgg.nonEmpty && viaAgg == viaWin)
    // partial combine in the plan: bounded buffers, not a rank window
    val plan = Windows.topKPerKey(ev, "user_id", Seq("ts", "event_id"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_collect_top_k"), plan.take(400))
  }

  test("repetitionRatio: duplicate n-grams / total, null when too short") {
    val df = Seq(
      (1L, "a b c a b c a b c"),   // 7 shingles, 3 distinct -> 1 - 3/7
      (2L, "one two three four"),  // 2 shingles, all distinct -> 0.0
      (3L, "too short")            // < 3 words -> null
    ).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.repetitionRatio($"text").as("r"))
      .orderBy("id").as[(Long, Option[Double])].collect().toSeq
    assert(out(0)._2.exists(r => math.abs(r - (1.0 - 3.0 / 7.0)) < 1e-12))
    assert(out(1)._2.contains(0.0))
    assert(out(2)._2.isEmpty)
  }

  test("chunks: overlap-windowed, tail kept, short doc = one chunk") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                     // under size
      (3L, "")                                         // empty text
    ).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.chunks($"text", size = 4, overlap = 1).as("c"))
      .orderBy("id").as[(Long, Seq[String])].collect().toMap
    // step 3: [w1..w4], [w4..w7], [w7..w10] — exactly covers, tail exact
    assert(out(1L) == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(out(2L) == Seq("a b"))
    assert(out(3L) == Seq(""))
    // reassembly: dropping each later chunk's overlap tokens rebuilds the doc
    val rebuilt = (out(1L).head +: out(1L).tail.map(_.split(" ").drop(1).mkString(" ")))
      .filter(_.nonEmpty).mkString(" ")
    assert(rebuilt == (1 to 10).map(i => s"w$i").mkString(" "))
  }

  test("truncateTokens is byte-exact under the cap, caps over it") {
    // "a  b c" splits to 4 tokens (the empty token between the spaces)
    val df = Seq((1L, "a  b c"), (2L, "x y z w v")).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.truncateTokens($"text", 4).as("t4"),
        TextAnalysis.truncateTokens($"text", 3).as("t3"))
      .orderBy("id").as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ("a  b c", "a  b")) // byte-exact at the cap; empty token counts
    assert(out(2L)._2 == "x y z")
  }

  test("clusters matches a union-find reference on random graphs") {
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(x => x -> find(x.toInt).toLong).toMap
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 15
      val edges = Seq.fill(18)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val got = Dedup.clusters(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == unionFind(n, edges), s"trial $trial: $edges")
    }
  }

  test("clusters: transitive closure labels min id; canonicalDocs keeps survivors") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val docs = (1L to 12L).toDF("doc_id")
    val kept = Dedup.canonicalDocs(docs, "doc_id", pairs)
      .as[Long].collect().toSet
    // cluster {1,2,3} keeps 1; {10,11} keeps 10; unpaired docs survive
    assert(kept == (1L to 12L).toSet -- Set(2L, 3L, 11L))
  }

  test("clusters: driver union-find fast path == distributed pointer doubling") {
    // the r18 adaptive switch: graphs under the edge ceiling close with
    // a driver union-find (0 shuffle rounds) and MUST produce exactly
    // the distributed loop's labels — min-id representative under the
    // same ordering — on chains, stars, singleton pairs, and string ids
    val fixtures = Seq(
      (0L until 29L).map(i => (i, i + 1)),                    // one chain
      Seq((5L, 1L), (5L, 9L), (5L, 3L), (20L, 21L)),          // star + pair
      Seq((7L, 7L))                                           // self-loop
    )
    fixtures.foreach { edges =>
      val pairs = edges.toDF("id_a", "id_b")
      val fast = Dedup.clustersWithRounds(pairs, driverMaxEdges = 1000000L)
      val dist = Dedup.clustersWithRounds(pairs, driverMaxEdges = 0L)
      assert(fast._2 == 0, "fast path must not run propagation rounds")
      assert(fast._1.as[(Long, Long)].collect().toMap ==
        dist._1.as[(Long, Long)].collect().toMap, s"labels diverged on $edges")
    }
    val sp = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    assert(Dedup.clustersWithRounds(sp, driverMaxEdges = 100L)
      ._1.as[(String, String)].collect().toMap ==
      Dedup.clustersWithRounds(sp, driverMaxEdges = 0L)
        ._1.as[(String, String)].collect().toMap)
  }

  test("clusters: a null-id edge falls through to the distributed path") {
    // the fast path's driver comparator pattern-matches Number/String —
    // a null id would MatchError where the distributed loop's min/least
    // tolerate nulls, so null edges must take the distributed path (r18
    // verdict "what's wrong" #4)
    val withNull = Seq((Some(1L), Some(2L)), (None: Option[Long], Some(3L)))
      .toDF("id_a", "id_b")
    val (labels, rounds) =
      Dedup.clustersWithRounds(withNull, driverMaxEdges = 1000000L)
    assert(rounds > 0, "null edges must not take the 0-round driver path")
    // and the labels match an explicit distributed run
    assert(labels.collect().map(r => (r.get(0), r.get(1))).toMap ==
      Dedup.clustersWithRounds(withNull, driverMaxEdges = 0L)
        ._1.collect().map(r => (r.get(0), r.get(1))).toMap)
  }

  test("clusters: deep chain graph converges fast with a bounded plan (lineage truncation)") {
    // a 30-node chain has diameter 30 → ~29 propagation rounds. Without
    // per-round lineage truncation the logical plan doubles each round
    // (O(2^29) nodes — unplannable); with localCheckpoint it stays O(1).
    // driverMaxEdges = 0: this pins the DISTRIBUTED loop's plan bound —
    // the fast path would trivially satisfy it.
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    val labels = Dedup.clustersWithRounds(chain, driverMaxEdges = 0L)._1
    val planNodes = labels.queryExecution.optimizedPlan.collect { case n => n }.length
    assert(planNodes <= 10, s"optimized plan has $planNodes nodes — lineage is accumulating")
    val got = labels.as[(Long, Long)].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got == (0L to 29L).map(_ -> 0L).toMap)
    assert(secs < 60.0, f"chain clustering took $secs%.1f s — plan growth regression")
  }

  test("clusters: giant single component closes in O(log diameter) rounds") {
    // the adversarial 100 TB case: one boilerplate/template family
    // collapsing into ONE giant component — here a 1024-node chain
    // (diameter 1023, the worst shape for label propagation). Pointer
    // doubling must converge within a small constant of log2(1023) ≈ 10
    // rounds; a regression to linear propagation would need ~1023 and
    // trip the bound (and Dedup.clusters' own maxIters=50 guard) long
    // before any wall-clock ledger moves. GIANTPROOF.json carries the
    // ×64 timing of the same shape; SkewCapSpec pins the cap-engaged
    // reporting of the identical-text variant of this family.
    // driverMaxEdges = 0: the pin is about the DISTRIBUTED loop's round
    // complexity; the driver fast path (its own spec above) would dodge it
    val n = 1024L
    val edges = spark.range(0, n - 1)
      .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    val (labels, rounds) = Dedup.clustersWithRounds(edges, driverMaxEdges = 0L)
    assert(labels.count() == n)
    assert(labels.select("cluster_id").distinct().as[Long].collect().toSeq == Seq(0L),
      "the chain must resolve to ONE component labeled by its min id")
    assert(rounds <= 14,
      s"pointer doubling regressed: $rounds rounds for diameter ${n - 1}")
  }

  test("clusters works over string ids (no silent numeric cast)") {
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c")).toDF("id_a", "id_b")
    val labels = Dedup.clusters(pairs).as[(String, String)].collect().toMap
    assert(labels == Map("doc-a" -> "doc-a", "doc-b" -> "doc-a", "doc-c" -> "doc-a"))
  }

  test("contamination counts distinct shingles shared with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("id", "text")
    val docs = Seq(
      (1L, "the quick brown fox runs away"),  // shares 2 of its 4 shingles
      (2L, "wholly unrelated text here also now")  // shares none
    ).toDF("id", "text")
    val out = Dedup.contamination(docs, bench, "id", "text")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 4L, 2L, 0.5), (2L, 4L, 0L, 0.0)))
  }

  test("bloomContamination equals exact contamination; sketch probe is in the plan") {
    val docs = graft.Tables.documents(spark, sf)
    val bench = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("id"), $"text")
    val train = docs.filter($"doc_id" % 10 =!= 0)
      .select($"doc_id".as("id"), $"text")
    val exact = Dedup.contamination(train, bench, "id", "text")
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    val bloom = Dedup.bloomContamination(train, bench, "id", "text")
    // the Bloom sketch is a prefilter only: answers must be identical
    assert(bloom.orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq == exact)
    assert(exact.exists(_._3 > 0), "seed corpus must actually contaminate")
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"))
    bloom.unpersist(blocking = false)
  }

  test("dedupSegments keeps first occurrences in order; no-repeat text round-trips") {
    val df = Seq(
      (1L, "alpha beta. gamma. alpha beta. delta. gamma"),
      (2L, "no repeats here. at all"),
      (3L, "solo")
    ).toDF("id", "t")
    val out = df.select($"id", TextAnalysis.dedupSegments($"t").as("c"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "alpha beta. gamma. delta"),
      (2L, "no repeats here. at all"),
      (3L, "solo")))
    // idempotent: a deduped document is a fixed point
    val twice = df.select($"id",
        TextAnalysis.dedupSegments(TextAnalysis.dedupSegments($"t")).as("c"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(twice == out)
  }

  test("gapFillDaily: dense spine, LOCF carry, per-key independence") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 10.0),
      (1L, "2024-01-01 12:00:00", 20.0), // same day -> one daily row
      (1L, "2024-01-04 09:00:00", 40.0), // 2-day gap
      (2L, "2024-02-10 00:00:00", 7.0)   // single-day key
    ).toDF("user_id", "ts", "value")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"value")
    val out = Resample.gapFillDaily(ev, "user_id", "ts", avg($"value"))
      .orderBy("user_id", "day")
      .select($"user_id", $"day".cast("string"), $"v_ff", $"filled")
      .as[(Long, String, Double, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 15.0, 0),
      (1L, "2024-01-02", 15.0, 1), // filled with last observation
      (1L, "2024-01-03", 15.0, 1),
      (1L, "2024-01-04", 40.0, 0),
      (2L, "2024-02-10", 7.0, 0))) // key 2's spine unaffected by key 1
  }

  test("stratified sample is deterministic and a per-stratum subset") {
    val df = (1L to 400L).map(i => (s"src${i % 4}", i)).toDF("source", "id")
    val s1 = Sampling.stratifiedSampleByHash(df, "source", "id", 25)
      .as[(String, Long)].collect().toSet
    val s2 = Sampling.stratifiedSampleByHash(df, "source", "id", 25)
      .as[(String, Long)].collect().toSet
    assert(s1 == s2 && s1.nonEmpty)
    // every stratum retains roughly pct% (within loose bounds at n=100)
    val perStratum = s1.groupBy(_._1).view.mapValues(_.size)
    assert(perStratum.size == 4)
    perStratum.foreach { case (s, n) => assert(n > 5 && n < 50, s"$s: $n") }
    // growing pct only adds rows (nested samples)
    val s3 = Sampling.stratifiedSampleByHash(df, "source", "id", 50)
      .as[(String, Long)].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("int8 quantization round-trips embeddings within the scale bound") {
    val emb = graft.Tables.embeddings(spark, sf).limit(50)
    val rows = emb.select(
        $"vec_id",
        col("embedding").cast("array<double>").as("v"),
        Similarity.dequantize8(Similarity.quantize8(col("embedding"))).as("dq"),
        Similarity.cosine(col("embedding"),
          Similarity.dequantize8(Similarity.quantize8(col("embedding")))).as("cos"))
      .as[(Long, Seq[Double], Seq[Double], Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, v, dq, cos) =>
      val scale = v.map(math.abs).max / 127.0
      v.zip(dq).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-9, s"vec $id: $a vs $b")
      }
      assert(cos > 0.999, s"vec $id cosine degraded to $cos")
    }
    // all-zero vectors quantize to scale 0 + zeros (no NaN)
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
      .select(Similarity.dequantize8(Similarity.quantize8(col("embedding"))).as("dq"))
      .as[Seq[Double]].head()
    assert(z == Seq(0.0, 0.0, 0.0))
  }

  test("sessionize splits on gap and numbers sessions per key") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:10:00", 2L),  // same session (10 min gap)
      (1L, "2024-01-01 11:00:00", 3L),  // new session (50 min gap)
      (2L, "2024-01-01 10:00:00", 4L))
      .toDF("user", "ts_s", "id")
      .withColumn("ts", to_timestamp($"ts_s"))
    val out = Windows.sessionize(df, "user", "ts", "id", gapSeconds = 1800)
      .orderBy("id").select("session_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 1L, 2L, 1L))
  }

  test("Z-layout upsert: keyed merge is exact, untouched cells untouched, moved key leaves its old cell") {
    import java.nio.file.{Files, Paths}
    val path = Files.createTempDirectory("zup").toString + "/layout"
    val bits = 10
    val kk = 3
    val base = (0L until 200L).map(i => (i, (i * 37) % 700, (i * 53) % 120))
      .toDF("id", "x", "y")
    Layout.writeZClustered(base, "x", "y", bits, kk, path)
    def cellOf(x: Long, y: Long) = Layout.cellsForBox(x, x, y, y, bits, kk).head
    // delta: 5 new keys landing in one cell, plus key 0 RE-SCORED from
    // (0,0) to (650,110) — it must vanish from its old cell
    val delta = ((200L until 205L).map(i => (i, 10L, 10L)) :+ ((0L, 650L, 110L)))
      .toDF("id", "x", "y")
    val touched = Set(cellOf(10, 10), cellOf(650, 110), cellOf(0, 0))
    val untouchedCell = (0L until 64L)
      .find(c => !touched.contains(c) && Files.exists(Paths.get(s"$path/zbucket=$c")))
      .getOrElse(fail("fixture has no untouched cell"))
    def listing(c: Long): Set[String] =
      new java.io.File(s"$path/zbucket=$c").listFiles()
        .map(f => s"${f.getName}@${f.lastModified}").toSet
    val before = listing(untouchedCell)
    Layout.upsertZClustered(spark, delta, "id", "x", "y", bits, kk, path)
    assert(listing(untouchedCell) == before,
      s"untouched cell $untouchedCell was rewritten")
    val got = spark.read.parquet(path).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    val want = ((1L until 200L).map(i => (i, (i * 37) % 700, (i * 53) % 120)) ++
      (200L until 205L).map(i => (i, 10L, 10L)) :+ ((0L, 650L, 110L))).toSet
    assert(got == want, "upserted layout is not the logical keyed merge")
    val oldCell = cellOf(0, 0)
    assert(spark.read.parquet(s"$path/zbucket=$oldCell")
      .filter($"id" === 0).count() == 0, "moved key still in its old cell")
  }

  test("cell upsert: an all-filtered-out first delta is a no-op, never a poison directory") {
    val path = java.nio.file.Files.createTempDirectory("zpoison").toString + "/layout"
    // a first batch whose rows ALL fail the null quarantine must write
    // NOTHING: a zero-row first write would leave a schema-less
    // directory every later read throws on — replaying forever
    val nullDelta = Seq((Option.empty[Long], Option(1L), Option(2L)))
      .toDF("id", "x", "y")
    Layout.upsertZClustered(spark, nullDelta, "id", "x", "y", 10, 3, path)
    assert(!new java.io.File(path).exists(), "no-op upsert created a directory")
    // and the store still bootstraps normally afterwards
    Layout.upsertZClustered(spark, Seq((1L, 10L, 10L)).toDF("id", "x", "y"),
      "id", "x", "y", 10, 3, path)
    assert(spark.read.parquet(path).count() == 1)
  }

  test("cell upsert replay is idempotent — a crashed batch's re-run changes nothing") {
    // streaming exactly-once rests on this: offsets commit AFTER the
    // upsert, so a crash between them replays the same delta; a keyed
    // merge (not an append) must land on the identical store
    val path = java.nio.file.Files.createTempDirectory("zreplay").toString + "/layout"
    val base = (0L until 50L).map(i => (i, i % 20, i % 7)).toDF("id", "x", "y")
    Layout.writeZClustered(base, "x", "y", 10, 3, path)
    val delta = Seq((3L, 600L, 100L), (100L, 5L, 5L)).toDF("id", "x", "y")
    Layout.upsertZClustered(spark, delta, "id", "x", "y", 10, 3, path)
    val once = spark.read.parquet(path).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    Layout.upsertZClustered(spark, delta, "id", "x", "y", 10, 3, path)
    val twice = spark.read.parquet(path).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(once == twice, "replaying the same delta changed the store")
    assert(once.count(_._1 == 3L) == 1 && once.contains((100L, 5L, 5L)))
  }

  test("zorder2 column expression agrees with the constant-side interleave, and " +
    "every in-box point's cell is enumerated by cellsForBox") {
    val bits = 10
    val k = 3
    val s = bits - k
    // deterministic scatter of points incl. box corners and cell edges
    val pts = for (i <- 0 until 200) yield ((i * 37) % 700L, (i * 53) % 120L)
    val df = pts.toDF("x", "y")
      .withColumn("z", Layout.zorder2($"x", $"y", bits))
      .withColumn("cell", Layout.zorder2(shiftright($"x", s), shiftright($"y", s), k))
    val rows = df.collect()
    // the cell key IS the curve key's top 2k bits — bucketing never
    // disagrees with the full key (the invariant pruning rests on)
    rows.foreach { r =>
      assert(r.getAs[Long]("cell") == (r.getAs[Long]("z") >> (2 * s)),
        s"cell/key mismatch at (${r.getAs[Long]("x")}, ${r.getAs[Long]("y")})")
    }
    val (x0, x1, y0, y1) = (100L, 300L, 20L, 50L)
    val cells = Layout.cellsForBox(x0, x1, y0, y1, bits, k).toSet
    // completeness: no point inside the box lives in a non-enumerated cell
    rows.filter(r => r.getAs[Long]("x") >= x0 && r.getAs[Long]("x") <= x1 &&
        r.getAs[Long]("y") >= y0 && r.getAs[Long]("y") <= y1)
      .foreach { r =>
        assert(cells.contains(r.getAs[Long]("cell")),
          s"in-box point (${r.getAs[Long]("x")}, ${r.getAs[Long]("y")}) " +
            s"in unenumerated cell ${r.getAs[Long]("cell")}")
      }
  }
}
