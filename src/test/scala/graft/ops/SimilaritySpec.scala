package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic toy vectors: unit-ish 4-d
  val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),
    (1L, Seq(0.9, 0.1, 0.0, 0.0)),   // close to 0
    (2L, Seq(0.0, 1.0, 0.0, 0.0)),
    (3L, Seq(0.0, 0.95, 0.05, 0.0)), // close to 2
    (4L, Seq(-1.0, 0.0, 0.0, 0.0)),  // opposite of 0
    (5L, Seq(0.5, 0.5, 0.5, 0.5))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks the nearest vector first") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), 2)
      .collect().sortBy(_.getInt(2))
    assert(out(0).getLong(1) == 1L) // rank 1 neighbor of 0 is 1
    assert(out(0).getDouble(3) > 0.99)
  }

  test("cosine column math matches scalar computation") {
    val c = vecs.filter($"vec_id" === 0).alias("a")
      .crossJoin(vecs.filter($"vec_id" === 5).alias("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .head().getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12)
  }

  test("sign-LSH pair mining finds the close pairs with exact verification") {
    val pairs = Similarity.cosinePairsLsh(vecs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    assert(keys.contains((2L, 3L)))
    assert(!keys.contains((0L, 4L))) // opposite vectors: cos -1
    pairs.foreach(p => assert(p._3 >= 0.9))
  }

  test("IVF top-k finds the true neighbor when it shares the probed cell") {
    val (cents, assigned) = Similarity.ivfAssign(vecs, 3)
    assert(cents.count() == 3)
    assert(assigned.select("cell").distinct().count() <= 3)
    val out = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0), 1, 3, 3)
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 1L) // nProbe=all cells ⇒ exact
  }

  /** Deterministic clustered corpus: 10 well-separated cluster axes in 8-d,
    * each vector = its cluster axis + small hash-derived noise.
    */
  private def clusteredCorpus(n: Int) = {
    def noise(id: Long, j: Int): Double =
      ((graft.kg.Corpus.mix(id * 31 + j) >>> 11).toDouble / (1L << 53)) * 0.2 - 0.1
    val rows = (0 until n).map { i =>
      val c = i % 8
      val v = Array.tabulate(8)(j => (if (j == c) 1.0 else 0.0) + noise(i.toLong, j))
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("IVF recall@5 >= 0.9 vs brute force (quality bar for the scale path)") {
    val corpus = clusteredCorpus(200)
    val queries = corpus.filter($"vec_id" < 10)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(corpus, queries, 5))
    val approx = topSets(Similarity.ivfTopK(corpus, queries, 5, nCells = 16, nProbe = 6))
    val hits = exact.map { case (q, want) => (approx.getOrElse(q, Set.empty) & want).size }.sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall >= 0.9, s"IVF recall@5 = $recall")
  }

  test("IVF centroid pick plans as TakeOrderedAndProject, no global-sort window") {
    val corpus = clusteredCorpus(100)
    val cents = Similarity.seedCentroidsDF(corpus, 8)
    val plan = cents.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("IVF cell assignment is a zero-shuffle projection (no Exchange, no Window)") {
    val corpus = clusteredCorpus(100)
    val (_, assigned) = Similarity.ivfAssign(corpus, 8)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("k-means centroids converge toward the true cluster axes and lift recall") {
    val corpus = clusteredCorpus(240)
    val queries = corpus.filter($"vec_id" < 10)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(corpus, queries, 5))
    def recallOf(trainIters: Int): Double = {
      val approx = topSets(Similarity.ivfTopK(corpus, queries, 5,
        nCells = 8, nProbe = 2, trainIters = trainIters))
      exact.map { case (q, want) => (approx.getOrElse(q, Set.empty) & want).size }.sum
        .toDouble / (exact.size * 5)
    }
    val seeded = recallOf(0)
    val trained = recallOf(3)
    assert(trained >= seeded, s"trained recall $trained < seeded $seeded")
    assert(trained >= 0.9, s"trained IVF recall@5 = $trained")
    // trained centroids sit near the 8 one-hot cluster axes: every centroid's
    // max component dominates (mean vectors of a tight cluster)
    val cents = Similarity.kmeansCentroids(corpus, 8, 3)
    assert(cents.size == 8)
    cents.foreach { case (_, cv) =>
      assert(cv.max > 0.5, s"centroid not axis-aligned: $cv")
    }
  }

  test("quantized top-k recovers the exact brute-force result via overscan + rescore") {
    val corpus = clusteredCorpus(200)
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "item_id", "rank")
    val quant = Similarity.quantizedTopK(corpus, queries, 5)
      .select("query_id", "item_id", "rank")
    assert(exact.exceptAll(quant).count() == 0 && quant.exceptAll(exact).count() == 0)
  }

  test("PQ: encoding is a zero-shuffle projection and codes reconstruct the clusters") {
    val corpus = clusteredCorpus(200)
    val cb = Pq.train(corpus, m = 4, ksub = 8, iters = 2)
    assert(cb.cents.length == 4 && cb.cents.forall(_.length == 8))
    val enc = Pq.encode(corpus, cb)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") && !plan.contains("Window"), plan)
    // same-cluster vectors should share codes far more often than cross-cluster
    val rows = enc.select("vec_id", "codes").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toIndexedSeq)).toMap
    val same = for (i <- 0L until 40L; j <- i + 8 until 200L by 8) yield
      rows(i).zip(rows(j)).count { case (a, b) => a == b }
    val diff = for (i <- 0L until 40L; j <- i + 1 until i + 8 if j < 200) yield
      rows(i).zip(rows(j)).count { case (a, b) => a == b }
    assert(same.sum.toDouble / same.size > diff.sum.toDouble / diff.size,
      s"same-cluster code agreement ${same.sum.toDouble / same.size} <= cross ${diff.sum.toDouble / diff.size}")
  }

  test("PQ top-k recall@5 >= 0.9 on the clustered corpus (ADC + rescore)") {
    val corpus = clusteredCorpus(200)
    val queries = corpus.filter($"vec_id" < 10)
    val cb = Pq.train(corpus, m = 4, ksub = 8, iters = 2)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(corpus, queries, 5))
    val approx = topSets(Pq.pqTopK(corpus, queries, 5, cb))
    val hits = exact.map { case (q, want) => (approx.getOrElse(q, Set.empty) & want).size }.sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall >= 0.9, s"PQ recall@5 = $recall")
    // full overscan makes the rescore set the whole corpus → EXACT result
    val full = Pq.pqTopK(corpus, queries, 5, cb, overscan = 40)
      .select("query_id", "item_id", "rank")
    val exactDf = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "item_id", "rank")
    assert(exactDf.exceptAll(full).count() == 0 && full.exceptAll(exactDf).count() == 0)
  }

  test("IVF-PQ: composed cell-pruned ADC search hits the quality bar; full settings exact") {
    val corpus = clusteredCorpus(200)
    val queries = corpus.filter($"vec_id" < 10)
    val cb = Pq.train(corpus, m = 4, ksub = 8, iters = 2)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(corpus, queries, 5))
    val approx = topSets(Pq.ivfPqTopK(corpus, queries, 5, cb,
      nCells = 8, nProbe = 3, trainIters = 2))
    val hits = exact.map { case (q, want) => (approx.getOrElse(q, Set.empty) & want).size }.sum
    assert(hits.toDouble / (exact.size * 5) >= 0.9,
      s"IVF-PQ recall@5 = ${hits.toDouble / (exact.size * 5)}")
    // probe every cell + full overscan → exact brute-force result
    val full = Pq.ivfPqTopK(corpus, queries, 5, cb, nCells = 8, nProbe = 8, overscan = 40)
      .select("query_id", "item_id", "rank")
    val exactDf = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "item_id", "rank")
    assert(exactDf.exceptAll(full).count() == 0 && full.exceptAll(exactDf).count() == 0)
  }

  test("materialized IVF-PQ table reproduces the in-memory path with partition pruning") {
    val corpus = clusteredCorpus(200)
    val queries = corpus.filter($"vec_id" < 10)
    val cb = Pq.train(corpus, m = 4, ksub = 8, iters = 2)
    val cents = Similarity.seedCentroids(corpus, 8)
    val encPath = tmpDir("graft-ivfpq-enc-spec")
    Pq.writeEncoded(corpus, cb, cents, encPath)
    val mem = Pq.ivfPqTopK(corpus, queries, 5, cb, nCells = 8, nProbe = 3)
    val mat = Pq.ivfPqTopKFromTable(encPath, corpus, queries, 5, cb, cents, nProbe = 3)
    assert(mem.exceptAll(mat).count() == 0 && mat.exceptAll(mem).count() == 0)
    // the scan must carry a partition filter on cell — unprobed cells are
    // pruned at the file-listing level, not scanned-and-filtered
    val plan = mat.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*\\]".r.findFirstIn(plan).isDefined, plan)
  }

  test("k-means keeps a previous centroid when its cell goes empty") {
    // 3 vectors, 3 cells: after one iteration each centroid is its own mean;
    // ask for more cells than distinct clusters to exercise the guard
    val tiny = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.01)), (2L, Seq(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(tiny, 3, 2)
    assert(cents.size == 3)
    assert(cents.forall(_._2.length == 2))
  }

  test("labelCentroids: per-(label, dim) means in long form") {
    val embs = Seq(
      ("a", Seq(1f, 3f)), ("a", Seq(3f, 5f)), ("b", Seq(2f, 4f))
    ).toDF("label", "embedding")
    val out = Similarity.labelCentroids(embs)
      .as[(String, Int, Double, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("a", 0)) === ((2.0, 2L)) && out(("a", 1)) === ((4.0, 2L)))
    assert(out(("b", 0)) === ((2.0, 1L)) && out(("b", 1)) === ((4.0, 1L)))
    assert(out.size === 4)
  }

  test("randomProject: one-hot vectors read the plane matrix back; zero-shuffle") {
    // vec i = e_i (one-hot at dim i) → y_j = weight(j, i) exactly
    val oneHots = (0 until 4).map(i =>
      (i.toLong, Seq.tabulate(8)(d => if (d == i) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProject(oneHots, inDim = 8, outDim = 3)
      .as[(Long, Int, Double)].collect()
    assert(out.length === 12)
    def r6(x: Double): Double = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def w(j: Int, d: Int): Double = {
      val id = j.toLong * 4096L + d
      val b = (((id + 23) % 1000003L * 2654435761L + 23) % 1000000L +
        ((id + 23) % 999983L * 2246822518L) % 1000000L) % 1000000L
      (b + 0.5) / 1000000.0 - 0.5
    }
    out.foreach { case (i, j, y) => assert(y === r6(w(j, i.toInt)), s"($i,$j)") }
    // weights are spread over [-0.5, 0.5), not collapsed
    assert(out.map(_._3).distinct.length > 8)
    val plan = Similarity.randomProject(oneHots, 8, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("kmeansAssign recovers the planted clusters and is rerun-identical") {
    val corpus = clusteredCorpus(160) // ids 0..7 are one seed per true cluster
    val out = Similarity.kmeansAssign(corpus, k = 8, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 160)
    // every vector lands in the cell seeded from its own cluster axis
    out.foreach { case (id, cell, cos) =>
      assert(cell === id % 8, s"vec $id in cell $cell")
      assert(cos > 0.9, s"vec $id cos $cos")
    }
    val again = Similarity.kmeansAssign(corpus, k = 8, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("kmeansAssign final assignment is a zero-shuffle projection") {
    val corpus = clusteredCorpus(80)
    val plan = Similarity.kmeansAssign(corpus, k = 4, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("mmrSelect trades relevance against redundancy as lambda moves") {
    import spark.implicits._
    // q = (1,0); A dup-of-query, B relevant-but-redundant, C orthogonal
    val vs = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.6f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0)
    def order(lambda: Double) =
      Similarity.mmrSelect(vs, q, k = 3, lambda = lambda)
        .orderBy("rank").select("id").as[Long].collect().toSeq
    // λ=0.7: relevance wins → A, then B (0.7·0.8−0.3·0.8 = 0.32 > 0), then C
    assert(order(0.7) === Seq(1L, 2L, 3L))
    // λ=0.3: redundancy dominates → A, then C (0 > 0.3·0.8−0.7·0.8), then B
    assert(order(0.3) === Seq(1L, 3L, 2L))
    // k caps at the corpus; ranks are 1-based and mmr is 6dp-rounded
    val full = Similarity.mmrSelect(vs, q, k = 10, lambda = 0.5)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(full.map(_._1).toSeq === Seq(1, 2, 3))
    assert(full.head._3 === 0.5) // 0.5·rel(A)=0.5·1.0
  }

  test("power iteration finds the dominant axis; ABTT removes it exactly") {
    import spark.implicits._
    // all variance on the first axis (mean 0): the top component is e0
    val vs = Seq(
      (1L, Seq(2.0, 0.0)), (2L, Seq(-2.0, 0.0)),
      (3L, Seq(1.0, 0.0)), (4L, Seq(-1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val (mu, w) = Similarity.meanAndTopComponent(vs, iters = 2)
    assert(mu === Seq(0.0, 0.0))
    assert(w === Seq(1.0, 0.0))
    // projection coefficient = the x-coordinate; residual = 0 on the axis
    val out = Similarity.removeTopComponent(vs, iters = 2)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2.0, 0.0)))
    assert(out(2L) === ((2L, -2.0, 0.0)))
    // off-axis mass survives as residual: add a y-only vector pair
    val vs2 = vs.union(Seq((5L, Seq(0.0, 3.0)), (6L, Seq(0.0, -3.0)))
      .toDF("vec_id", "embedding"))
    val (mu2, w2) = Similarity.meanAndTopComponent(vs2, iters = 8)
    assert(mu2 === Seq(0.0, 0.0))
    // y-variance (18) dominates x-variance (10) → the component rotates
    // toward e1 at rate (10/18)^iters — 8 rounds ≈ within 1e-2 of e1
    assert(w2(1).abs > 0.999 && w2(0).abs < 0.05)
    val r5 = Similarity.removeTopComponent(vs2, iters = 8)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // y-vectors project ~fully onto the component; x-vectors are ~pure residual
    assert(r5(5L)._2.abs > 2.99 && r5(5L)._3 < 0.1)
    assert(r5(1L)._2.abs < 0.1 && r5(1L)._3 > 1.99)
  }
}
