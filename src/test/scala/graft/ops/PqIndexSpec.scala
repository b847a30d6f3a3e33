package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Materialized PQ index: sidecar exact round-trip, probe == in-memory
  * ADC ranking, IVF-PQ partition pruning, and the missing-sidecar
  * guard.
  */
class PqIndexSpec extends SparkSpec {

  import spark.implicits._

  private def emb = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def tmp(p: String) = Files.createTempDirectory(p).toString + "/idx"

  test("sidecar round-trips the codebooks bit-exactly") {
    val path = tmp("pq_rt")
    val cb = Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8)
    val (m, ks, residual, cb2, cents) = Similarity.readPqSidecar(spark, path)
    assert(m == 4 && ks == 8 && !residual && cents.isEmpty)
    assert(cb2.flatten.flatten.toSeq == cb.flatten.flatten.toSeq)
  }

  test("probe over the flat index matches the in-memory ADC ranking") {
    val path = tmp("pq_flat")
    val cb = Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8)
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val got = Similarity.probePqIndex(spark, path, "vec_id", query, k = 5)
      .as[(Long, Double)].collect().toSeq
    // in-memory reference: encode + ADC through the same kernels
    val cbLit = Similarity.pqCodebooksLit(cb)
    val want = emb.select(col("vec_id"),
        graft.functions.PqAdc(typedLit(query.toSeq),
          graft.functions.PqEncode(col("v"), cbLit, 8), cbLit, 8).as("adc"))
      .orderBy(col("adc"), col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"probe $got vs in-memory $want")
  }

  test("IVF-PQ index prunes to the probed cells at the source") {
    val path = tmp("pq_ivf")
    Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8, ivfCells = 8)
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val probe = Similarity.probePqIndex(spark, path, "vec_id", query,
      k = 5, nProbe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"cell probe must prune partitions:\n${plan.take(800)}")
    // candidates really are restricted: every returned id lives in one
    // of the 2 probed cells of the partitioned layout
    val cells = spark.read.parquet(path)
      .select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toMap
    val (_, _, _, _, cents) = Similarity.readPqSidecar(spark, path)
    assert(cents.length == 8)
    val got = probe.as[(Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 5)
    val probedCells = got.map(r => cells(r._1)).toSet
    assert(probedCells.size <= 2, s"results span cells $probedCells")
  }

  test("residual IVF-PQ index: sidecar tags pqr; probe residualizes the query and matches in-memory ADC") {
    val path = tmp("pq_resid")
    val cb = Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8, ivfCells = 8, kmeansIters = 2, residual = true)
    val (m, ks, residual, cb2, cents) = Similarity.readPqSidecar(spark, path)
    assert(m == 4 && ks == 8 && residual && cents.length == 8)
    assert(cb2.flatten.flatten.toSeq == cb.flatten.flatten.toSeq)

    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val nProbe = 2
    val got = Similarity.probePqIndex(spark, path, "vec_id", query,
      k = 5, nProbe).as[(Long, Double)].collect().toSeq

    // in-memory reference: assign cells, residualize BOTH sides against
    // the row's cell centroid, encode, ADC — restricted to the probed
    // cells (top-nProbe by cosine, tie → larger cell, the nearestCells
    // side)
    val centMap = typedLit(cents.map { case (id, c) => id -> c.toSeq }.toMap)
    def residOf(vec: org.apache.spark.sql.Column,
                cell: org.apache.spark.sql.Column) =
      zip_with(vec.cast("array<double>"), element_at(centMap, cell),
        (a, b) => a - b)
    val probed = cents.map { case (id, c) =>
      val dot = c.zip(query).map { case (a, b) => a * b }.sum
      id -> dot / (math.sqrt(c.map(x => x * x).sum) *
        math.sqrt(query.map(x => x * x).sum))
    }.sortBy { case (id, s) => (-s, -id) }.take(nProbe).map(_._1).toSeq
    val cbLit = Similarity.pqCodebooksLit(cb)
    val q = typedLit(query.toSeq)
    val want = Similarity.ivfAssign(emb, "vec_id", "v", cents)
      .filter($"__cell".isin(probed: _*))
      .select(col("vec_id"),
        graft.functions.PqAdc(residOf(q, $"__cell"),
          graft.functions.PqEncode(residOf($"v", $"__cell"), cbLit, 8),
          cbLit, 8).as("adc"))
      .orderBy(col("adc"), col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"probe $got vs in-memory $want")
    // a raw build at the same geometry still tags pq (v1 stays v1)
    val path2 = tmp("pq_rawtag")
    Similarity.writePqIndex(emb, "vec_id", "v", path2,
      pqM = 4, pqKs = 8, ivfCells = 8, kmeansIters = 2)
    assert(!Similarity.readPqSidecar(spark, path2)._3)
    // and a flat residual index is a caller error, loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.writePqIndex(emb, "vec_id", "v", tmp("pq_flatres"),
        pqM = 4, pqKs = 8, residual = true)
    }
    assert(e.getMessage.contains("ivfCells"))
  }

  test("residual encoding concentrates the codebook on a clustered corpus: quantization error drops, recall holds") {
    // the k-means refinement spec's deterministic clustered fixture —
    // the regime residual PQ exists for (with id-rank cells on the
    // isotropic table it HURTS; q_pq_residual_audit prices that)
    val dim = 16
    val nClusters = 8
    val perCluster = 40
    def center(c: Int): Array[Double] =
      Array.tabulate(dim)(i => math.sin(c * 31.0 + i * 7.0))
    def point(c: Int, j: Int): Array[Double] = {
      val ctr = center(c)
      Array.tabulate(dim)(i =>
        ctr(i) + 0.15 * math.sin((c * perCluster + j) * 13.0 + i * 5.0))
    }
    val rows = for (c <- 0 until nClusters; j <- 0 until perCluster)
      yield ((c * perCluster + j).toLong, point(c, j))
    val base = rows.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroidsKMeans(base, "vec_id", "embedding",
      nClusters, iters = 10)
    val centMap = typedLit(cents.map { case (id, c) => id -> c.toSeq }.toMap)
    def residOf(vec: org.apache.spark.sql.Column,
                cell: org.apache.spark.sql.Column) =
      zip_with(vec.cast("array<double>"), element_at(centMap, cell),
        (a, b) => a - b)
    val assigned = Similarity.ivfAssign(base, "vec_id", "embedding", cents)
    // reconstruction error = ADC of a vector against its OWN code
    def meanQerr(residual: Boolean): Double = {
      val x =
        if (residual) residOf($"embedding", $"__cell")
        else $"embedding".cast("array<double>")
      val cb =
        if (residual)
          Similarity.pqCodebooks(
            assigned.withColumn("__res", x), "vec_id", "__res", 4, 8)
        else Similarity.pqCodebooks(base, "vec_id", "embedding", 4, 8)
      val cbLit = Similarity.pqCodebooksLit(cb)
      assigned.select(graft.functions.PqAdc(x,
          graft.functions.PqEncode(x, cbLit, 8), cbLit, 8).as("e"))
        .agg(avg($"e")).as[Double].head()
    }
    val (qerrRaw, qerrRes) = (meanQerr(false), meanQerr(true))
    info(f"mean quantization error: raw $qerrRaw%.4f residual $qerrRes%.4f")
    assert(qerrRes * 5 < qerrRaw,
      s"residual must concentrate the codebook: $qerrRes vs raw $qerrRaw")
    // and end-to-end recall through ivfPqJoin does not regress
    val queries = (0 until nClusters)
      .map(c => ((10000 + c).toLong, point(c, perCluster + 1))).toDF("vec_id", "embedding")
    def recallSum(residual: Boolean): Int = {
      val nn = Similarity.ivfPqJoin(queries, base, "vec_id", "embedding",
        10, m = nClusters, nProbe = 2, pqM = 4, pqKs = 8,
        kmeansIters = 10, residual = residual)
        .select($"query_id", $"match_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = Similarity.annJoinExact(queries, base, "vec_id",
        "embedding", 10)
        .select($"query_id", $"match_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, want) =>
        (want intersect nn.getOrElse(qid, Set.empty)).size }.sum
    }
    val (rRaw, rRes) = (recallSum(false), recallSum(true))
    info(s"recall@10 sum over $nClusters cluster queries: raw $rRaw residual $rRes of ${10 * nClusters}")
    assert(rRes >= rRaw,
      s"residual encoding regressed clustered recall: $rRes < $rRaw")
  }

  test("index-served re-rank: shortlist ids push into the raw scan; answer == exact top-k of the shortlist") {
    val path = tmp("pq_rrk")
    Similarity.writePqIndex(emb, "vec_id", "v", path,
      pqM = 4, pqKs = 8, ivfCells = 8, kmeansIters = 2, residual = true)
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val got = Similarity.probePqIndexRerank(spark, path, emb, "vec_id", "v",
      query, k = 5, nProbe = 2, refine = 4)
    // the refine stage's raw reads are SOURCE-pruned: the shortlist-id
    // predicate reaches the parquet scan, never a corpus pass
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(vec_id"),
      s"shortlist ids not pushed into the raw scan:\n${plan.take(800)}")
    // reference: driver-side exact cosine over the same shortlist
    val short = Similarity.probePqIndex(spark, path, "vec_id", query,
      20, nProbe = 2).as[(Long, Double)].collect().map(_._1).toSet
    def cos(a: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * query(i); na += a(i) * a(i)
        nb += query(i) * query(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val want = emb.filter($"vec_id".isInCollection(short))
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    assert(got.as[(Long, Double)].collect().map(_._1).toSeq == want)
    // the skip artifact answers empty through the re-rank too
    val p2 = tmp("pq_rrk_absent")
    Similarity.writePqIndex(emb.filter($"vec_id" < 3), "vec_id", "v", p2,
      pqM = 4, pqKs = 8, ivfCells = 2, kmeansIters = 2, residual = true)
    assert(Similarity.probePqIndexRerank(spark, p2, emb, "vec_id", "v",
      query, k = 5).count() == 0)
  }

  test("pqIndexUpsert: increments encode with the COMMITTED quantizer; merged probes match; moved keys leave their old cell") {
    val path = tmp("pq_upsert")
    val half = emb.filter($"vec_id" < 250)
    val rest = emb.filter($"vec_id" >= 250)
    val cb = Similarity.writePqIndex(half, "vec_id", "v", path,
      pqM = 4, pqKs = 8, ivfCells = 8, kmeansIters = 2, residual = true)
    Similarity.pqIndexUpsert(spark, rest, path, "vec_id", "v")
    // the merge must not touch the sidecar: the quantizer stays the one
    // TRAINED ON THE ORIGINAL HALF (train-once / encode-incrementally)
    val (_, _, residual, cb2, cents) = Similarity.readPqSidecar(spark, path)
    assert(residual && cb2.flatten.flatten.toSeq == cb.flatten.flatten.toSeq)
    assert(spark.read.parquet(path).count() == 500)
    // probing ALL cells == in-memory ADC over the whole corpus encoded
    // with the half-trained quantizer
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val got = Similarity.probePqIndex(spark, path, "vec_id", query,
      k = 5, nProbe = 8).as[(Long, Double)].collect().toSeq
    val centMap = typedLit(cents.map { case (id, c) => id -> c.toSeq }.toMap)
    def residOf(vec: org.apache.spark.sql.Column,
                cell: org.apache.spark.sql.Column) =
      zip_with(vec.cast("array<double>"), element_at(centMap, cell),
        (a, b) => a - b)
    val cbLit = Similarity.pqCodebooksLit(cb)
    val q = typedLit(query.toSeq)
    val want = Similarity.ivfAssign(emb, "vec_id", "v", cents)
      .select(col("vec_id"),
        graft.functions.PqAdc(residOf(q, $"__cell"),
          graft.functions.PqEncode(residOf($"v", $"__cell"), cbLit, 8),
          cbLit, 8).as("adc"))
      .orderBy(col("adc"), col("vec_id")).limit(5)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"probe $got vs in-memory $want")
    // a re-embedded key MOVES: give vec 7 the vector of vec 400 — it
    // must end in 400's cell, with exactly one row, corpus size fixed
    val v400 = emb.filter($"vec_id" === 400)
      .select("v").as[Seq[Double]].head()
    Similarity.pqIndexUpsert(spark,
      Seq((7L, v400)).toDF("vec_id", "v"), path, "vec_id", "v")
    val cellOf400 = Similarity.ivfAssign(
        emb.filter($"vec_id" === 400), "vec_id", "v", cents)
      .select($"__cell").as[Long].head()
    val rows7 = spark.read.parquet(path).filter($"vec_id" === 7)
      .select($"cell".cast("long")).as[Long].collect()
    assert(rows7.toSeq == Seq(cellOf400))
    assert(spark.read.parquet(path).count() == 500)
    // a flat index refuses (no cell layout to merge into)
    val flat = tmp("pq_upsert_flat")
    Similarity.writePqIndex(emb, "vec_id", "v", flat, pqM = 4, pqKs = 8)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqIndexUpsert(spark, rest, flat, "vec_id", "v")
    }
    assert(e1.getMessage.contains("IVF-partitioned"))
    // the skip artifact refuses (no quantizer to encode with)
    val absent = tmp("pq_upsert_absent")
    Similarity.writePqIndex(emb.filter($"vec_id" < 3), "vec_id", "v",
      absent, pqM = 4, pqKs = 8, ivfCells = 2)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.pqIndexUpsert(spark, rest, absent, "vec_id", "v")
    }
    assert(e2.getMessage.contains("skip artifact"))
  }

  test("a too-small corpus commits a clean skip artifact; probes serve empty; direct calls stay loud") {
    // the composed-flow policy for corpus < ks: a dead tenant's scheduled
    // rebuild records ONE clean no-op (absent-empty-corpus sidecar +
    // empty-but-readable code table) instead of failing every tick
    val small = emb.filter($"vec_id" < 3) // 3 < ks=8
    val path = tmp("pq_absent")
    val cb = Similarity.writePqIndex(small, "vec_id", "v", path,
      pqM = 4, pqKs = 8)
    assert(cb.isEmpty, "the skip path must not fabricate codebooks")
    assert(Similarity.pqIndexAbsent(spark, path), "skip artifact not marked")
    // probes serve empty candidates with the (id, adc) schema
    val probe = Similarity.probePqIndex(spark, path, "vec_id",
      Array.fill(64)(1.0), k = 5)
    assert(probe.columns.toSeq == Seq("vec_id", "adc") && probe.count() == 0)
    // the quantizer read and the direct codebook call both refuse loudly
    val e1 = intercept[IllegalArgumentException] {
      Similarity.readPqSidecar(spark, path)
    }
    assert(e1.getMessage.contains("absent-empty-corpus"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(small, "vec_id", "v", m = 4, ks = 8)
    }
    assert(e2.getMessage.contains("needs >= ks"))
    // a populated index at the same path is NOT marked absent
    val path2 = tmp("pq_present")
    Similarity.writePqIndex(emb, "vec_id", "v", path2, pqM = 4, pqKs = 8)
    assert(!Similarity.pqIndexAbsent(spark, path2))
  }

  test("a missing sidecar is rejected loudly") {
    val path = tmp("pq_bare")
    emb.select("vec_id").write.parquet(path)
    val e = intercept[IllegalArgumentException] {
      Similarity.probePqIndex(spark, path, "vec_id", Array.fill(64)(0.0), k = 3)
    }
    assert(e.getMessage.contains("sidecar"))
  }

  // ---- staged rebuilds (shared by LSH / IVF / PQ / band writers) --------

  test("a rebuild KILLED mid-write leaves the live index fully probe-able") {
    // r11 closed this hazard class for extracts; r12 routes the index
    // writers through the same staged swap. A plain mode("overwrite")
    // deletes the serving index before the new files commit — a crashed
    // rebuild would take ANN serving down until the next success.
    val path = tmp("lsh_kill")
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    Similarity.writeLshIndex(vecs, "embedding", path, nPlanes = 4, dim = 64)
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    def probe() = Similarity.probeLshIndex(spark, path, "vec_id",
        "embedding", query, k = 5, nPlanes = 4)
      .as[(Long, Double)].collect().toSeq
    val before = probe()
    assert(before.nonEmpty)
    // rebuild whose write tasks hang; killed via its job group
    val hanging = vecs.as[(Long, Array[Float])]
      .mapPartitions { it => Thread.sleep(600000L); it }
      .toDF("vec_id", "embedding")
    val t = new Thread(() => {
      spark.sparkContext.setJobGroup("lsh-rebuild-kill", "killed rebuild", true)
      try {
        Similarity.writeLshIndex(hanging, "embedding", path, nPlanes = 4, dim = 64)
        ()
      } catch { case _: Throwable => () }
      finally spark.sparkContext.clearJobGroup()
    })
    t.start()
    Thread.sleep(3000) // let the staging write job start its (hung) tasks
    spark.sparkContext.cancelJobGroup("lsh-rebuild-kill")
    t.join(120000)
    assert(!t.isAlive, "killed rebuild did not unwind")
    // the committed index survives: identical probe, identical rows
    assert(probe() == before, "the live index was damaged by a killed rebuild")
    // and a SUBSEQUENT rebuild over the staging debris succeeds cleanly
    Similarity.writeLshIndex(vecs, "embedding", path, nPlanes = 4, dim = 64)
    assert(probe() == before)
    assert(!new java.io.File(path + "__staging").exists(),
      "staging dir must be consumed by the successful swap")
  }

  test("a PQ rebuild swaps data and sidecar together (atomic geometry change)") {
    val path = tmp("pq_swap")
    Similarity.writePqIndex(emb, "vec_id", "v", path, pqM = 4, pqKs = 8)
    val (m1, _, _, _, _) = Similarity.readPqSidecar(spark, path)
    assert(m1 == 4)
    // rebuild with a DIFFERENT quantizer geometry: data and sidecar must
    // flip in one rename — a new quantizer over old codes (or vice
    // versa) would silently corrupt every ADC distance
    Similarity.writePqIndex(emb, "vec_id", "v", path, pqM = 2, pqKs = 4)
    val (m2, ks2, _, cb2, _) = Similarity.readPqSidecar(spark, path)
    assert(m2 == 2 && ks2 == 4 && cb2.length == 2)
    val query = emb.orderBy("vec_id").limit(1)
      .select("v").as[Seq[Double]].head().toArray
    val got = Similarity.probePqIndex(spark, path, "vec_id", query, k = 3)
      .as[(Long, Double)].collect()
    assert(got.length == 3, "post-rebuild probe must serve from the new geometry")
    assert(!new java.io.File(path + "__staging").exists())
  }
}
