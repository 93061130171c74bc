package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for the ANN scale path — the standard
  * 10^9-vector architecture (IVF-PQ): split the D-dim space into `m`
  * subspaces of d = D/m dims, learn a small per-subspace codebook (ksub
  * centroids via Lloyd's), and store each vector as m small codes. At
  * D=1024 float32 → m=64 byte codes that is a 64× compression of the scan,
  * and query scoring needs only a per-query lookup table (ADC — asymmetric
  * distance computation): score(item) = Σ_j lut[j][code_j].
  *
  * Spark shape, mirroring [[Similarity]]'s IVF conventions:
  *  - codebooks are DRIVER-SIDE literals (m·ksub·d doubles — e.g.
  *    8·16·8 = 1k values — the same scale as any broadcast side; MLlib
  *    broadcasts its centers the same way);
  *  - ENCODING is a zero-shuffle literal-argmin projection (no join
  *    explode, no per-id window);
  *  - the ADC scan is a broadcast join against queries carrying their
  *    (flat) LUT column, scored by one `zip_with`/`aggregate` chain over
  *    the m int codes — whole-stage codegen, no UDFs;
  *  - exact-float rescore on the k×overscan candidate set only, so the
  *    full-precision vectors never ride the scan.
  *
  * Cosine under PQ: subspaces are disjoint, so dot(q, x̂) = Σ_j dot(q_j,
  * c_{j,code_j}) (the LUT sum) and |x̂|² = Σ_j |c_{j,code_j}|² — the
  * reconstructed norm is a pure function of the codes, stored at encode
  * time. Training/assignment use L2 (the PQ standard), via the identity
  * argmin ||x−c||² = argmax (dot(x,c) − |c|²/2).
  *
  * Determinism: seeds are the ksub vectors whose ids hash lowest (same
  * rule as [[Similarity.seedCentroidsDF]]), Lloyd updates are data-parallel
  * sums, ties break on the lowest code — no RNG anywhere, so reruns and
  * the driver gate see identical codes.
  */
object Pq {

  /** cents(j)(c) = the d-dim centroid of code c in subspace j. */
  final case class Codebook(m: Int, ksub: Int, d: Int, cents: Seq[Seq[Seq[Double]]]) {
    require(cents.length == m && cents.forall(_.length == ksub) &&
      cents.forall(_.forall(_.length == d)), "codebook shape mismatch")
    /** |c|² per (subspace, code) — the L2-assignment correction term. */
    def sqNorms: Seq[Seq[Double]] = cents.map(_.map(c => c.map(x => x * x).sum))
  }

  private def subvec(vec: Column, j: Int, d: Int): Column =
    slice(vec, j * d + 1, d)

  private def dotLit(sub: Column, cent: Seq[Double]): Column =
    cent.zipWithIndex.map { case (cv, i) =>
      element_at(sub, i + 1) * lit(cv)
    }.reduce(_ + _)

  /** Train per-subspace codebooks: deterministic seed pick (ksub
    * lowest-id-hash vectors, sliced), then `iters` Lloyd rounds. Each round
    * is ONE job for ALL m subspaces: every row explodes into m slim
    * (subspace, code, subvector) structs over the same scan, one
    * groupBy(subspace, code) computes every count + d-dim sum, and the
    * driver collects m·ksub rows — so training cost is `iters` jobs total,
    * not `iters·m` driver round-trips (the thing that dominates at a
    * production m=64). Empty cells keep their previous centroid.
    */
  def train(embs: DataFrame, m: Int, ksub: Int, iters: Int,
            idCol: String = "vec_id", vecCol: String = "embedding"): Codebook = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val dim = embs.select(size(v)).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val d = dim / m
    val seeds = embs
      .orderBy(Sampling.bucket(col(idCol).cast("long"), Similarity.SeedSalt), col(idCol))
      .limit(ksub)
      .select(v.as("v")).collect().map(_.getSeq[Double](0).toIndexedSeq)
    require(seeds.length == ksub, s"need >= $ksub vectors to train, got ${seeds.length}")
    var cents: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => seeds.toSeq.map(s => s.slice(j * d, (j + 1) * d).toSeq))
    for (_ <- 1 to iters) {
      val pieces = array((0 until m).map { j =>
        val sub = subvec(v, j, d)
        struct(lit(j).as("j"), nearestCode(sub, cents(j)).as("c"), sub.as("sv"))
      }: _*)
      val sumCols = (0 until d).map(i => sum(element_at(col("sv"), i + 1)).as(s"s$i"))
      val means = embs.select(explode(pieces).as("p"))
        .select(col("p.j").as("j"), col("p.c").as("c"), col("p.sv").as("sv"))
        .groupBy("j", "c").agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
        .map { r =>
          val n = r.getLong(2).toDouble
          ((r.getInt(0), r.getInt(1)), (0 until d).map(i => r.getDouble(i + 3) / n))
        }.toMap
      cents = (0 until m).map(j =>
        cents(j).zipWithIndex.map { case (old, c) => means.getOrElse((j, c), old) })
    }
    Codebook(m, ksub, d, cents)
  }

  /** Nearest code in ONE subspace by L2, as a literal-argmax projection
    * (ties → lowest code): argmin ||x−c||² = argmax (dot − |c|²/2).
    * The score is ROUNDED to 6dp before the argmax (the portable-argmax
    * contract [[Similarity.nearestCell]] documents), so codes are an
    * exact function of (vector, codebook) and the q_ann_pq oracle
    * replays the encoding from the dumped codebook.
    */
  private def nearestCode(sub: Column, cents: Seq[Seq[Double]]): Column = {
    val scored = array(cents.zipWithIndex.map { case (cv, c) =>
      val sq = cv.map(x => x * x).sum
      struct(
        round(dotLit(sub, cv) - lit(sq / 2.0), 6).as("score"),
        lit(-c).as("negCode"))
    }: _*)
    (-array_max(scored).getField("negCode")).cast("int")
  }

  /** Encode the table: (id, codes array<int> of length m, recon_norm).
    * One zero-shuffle projection; recon_norm = sqrt(Σ_j |c_{j,code_j}|²)
    * is folded from the code literals in the same pass.
    */
  def encode(embs: DataFrame, cb: Codebook,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val codeCols = (0 until cb.m).map(j => nearestCode(subvec(v, j, cb.d), cb.cents(j)))
    val codes = array(codeCols: _*)
    val sq = cb.sqNorms
    val reconSq = (0 until cb.m).map { j =>
      // |c|² looked up from the code via a literal array
      element_at(array(sq(j).map(lit): _*), element_at(codes, j + 1) + 1)
    }.reduce(_ + _)
    embs.select(col(idCol), codes.as("codes"), sqrt(reconSq).as("recon_norm"))
  }

  /** Per-query flat LUT: lut[j*ksub + c] = dot(q_j, c_{j,c}) — computed
    * once per query row (the broadcast side), consumed by the ADC sum.
    */
  def lutFlat(qvec: Column, cb: Codebook): Column =
    array((for (j <- 0 until cb.m; c <- 0 until cb.ksub)
      yield dotLit(subvec(qvec, j, cb.d), cb.cents(j)(c))): _*)

  /** ADC approximate cosine: Σ_j lut[j][code_j] / (|q| · recon_norm). */
  private def adcCos(codes: Column, lut: Column, qnorm: Column, reconNorm: Column,
                     ksub: Int): Column = {
    val dots = zip_with(codes, sequence(lit(0), size(codes) - 1),
      (code, j) => element_at(lut, j * ksub + code + 1))
    aggregate(dots, lit(0.0d), (acc, x) => acc + x) / (qnorm * reconNorm)
  }

  /** PQ top-k: ADC scan over the (m-byte) code table, keep k×overscan
    * candidates per query, exact-float rescore + re-rank. See [[ivfPqTopK]]
    * for the composed IVF-PQ shape (the IVF probe bounds WHICH codes are
    * scanned; PQ bounds the BYTES per scanned code — at 10^9 vectors both
    * cuts are needed and independent).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, cb: Codebook,
             overscan: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding",
             encOpt: Option[DataFrame] = None): DataFrame = {
    // encOpt: a precomputed (item_id, codes, recon_norm) encode table —
    // the encode projection is a large literal expression (m·ksub·d
    // centroid constants), so callers issuing several searches against
    // one codebook pass it in to compile/encode once (the gate memo)
    val enc = encOpt.getOrElse(encode(corpus, cb, idCol, vecCol)
      .select(col(idCol).as("item_id"), col("codes"), col("recon_norm")))
    val qv = transform(col(vecCol), x => x.cast("double"))
    val q = queries.select(col(idCol).as("query_id"), qv.as("_qv"),
      lutFlat(qv, cb).as("_lut"), Similarity.norm(qv).as("_qnorm"))
    val approx = enc.join(broadcast(q), col("item_id") =!= col("query_id"))
      .withColumn("acos",
        round(adcCos(col("codes"), col("_lut"), col("_qnorm"), col("recon_norm"),
          cb.ksub), 6))
    val wA = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("item_id"))
    val cand = approx.withColumn("ark", row_number().over(wA))
      .filter(col("ark") <= k * overscan)
      .select("query_id", "item_id")
    val c = corpus.select(col(idCol).as("item_id"),
      transform(col(vecCol), x => x.cast("double")).as("_cv"))
    val rescored = cand
      .join(c, Seq("item_id"))
      .join(broadcast(q.select(col("query_id"), col("_qv"))), Seq("query_id"))
      .withColumn("cos", round(Similarity.cosine(col("_cv"), col("_qv")), 6))
    val wE = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    rescored.withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** The composed billion-vector layout — IVF-PQ: coarse cells prune WHICH
    * vectors are scanned (nProbe/nCells of the corpus), PQ codes shrink the
    * BYTES per scanned vector (~4·D/m ×). Dataflow: one zero-shuffle
    * projection computes cell + codes + recon_norm per vector; queries
    * (broadcast, carrying their LUT) join on the probed cells; ADC ranks
    * k×overscan candidates; the exact rescore touches only those. In a
    * production table the encode projection is written once (partitioned by
    * cell — Iceberg partition pruning serves the probe) and every query
    * batch reuses it.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int, cb: Codebook,
                nCells: Int, nProbe: Int, overscan: Int = 4, trainIters: Int = 0,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents =
      if (trainIters > 0) Similarity.kmeansCentroids(corpus, nCells, trainIters, idCol, vecCol)
      else Similarity.seedCentroids(corpus, nCells, idCol, vecCol)
    // cell + codes + recon_norm all fold into ONE zero-shuffle projection
    // over the same scan — no join between the assign and the encode
    val qv = transform(col(vecCol), x => x.cast("double"))
    val encCells = corpus.select(col(idCol).as("item_id"),
      array((0 until cb.m).map(j => encodeCode(qv, cb, j)): _*).as("codes"),
      reconNormCol(qv, cb).as("recon_norm"),
      Similarity.nearestCell(qv, cents).as("cell"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = cents.toDF("cell", "cv")
    val q = queries.select(col(idCol).as("query_id"), qv.as("_qv"),
      lutFlat(qv, cb).as("_lut"), Similarity.norm(qv).as("_qnorm"))
    val probe = q.join(broadcast(centDf))
      .withColumn("ccos", round(Similarity.cosine(col("_qv"), col("cv")), 6))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cell"))))
      .filter(col("crk") <= nProbe)
      .select("query_id", "_qv", "_lut", "_qnorm", "cell")
    val approx = encCells.join(probe, "cell")
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("acos",
        round(adcCos(col("codes"), col("_lut"), col("_qnorm"), col("recon_norm"),
          cb.ksub), 6))
    val wA = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("item_id"))
    val cand = approx.withColumn("ark", row_number().over(wA))
      .filter(col("ark") <= k * overscan)
      .select("query_id", "item_id")
    val c = corpus.select(col(idCol).as("item_id"),
      transform(col(vecCol), x => x.cast("double")).as("_cv"))
    val rescored = cand
      .join(c, Seq("item_id"))
      .join(broadcast(q.select(col("query_id"), col("_qv"))), Seq("query_id"))
      .withColumn("cos", round(Similarity.cosine(col("_cv"), col("_qv")), 6))
    val wE = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    rescored.withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** Materialize the IVF-PQ encode projection as a cell-PARTITIONED table —
    * the production layout the [[ivfPqTopK]] doc promises: the (item_id,
    * codes, recon_norm) projection is written ONCE, partitioned by coarse
    * cell, and every query batch serves its probe from it with PARTITION
    * PRUNING doing the nProbe/nCells cut at the file-listing level (no scan
    * of unprobed cells at all — in production this is the Iceberg
    * partition-pruned read). One zero-shuffle projection + one write.
    */
  def writeEncoded(corpus: DataFrame, cb: Codebook, cents: Seq[(Long, Seq[Double])],
                   path: String,
                   idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val v = transform(col(vecCol), x => x.cast("double"))
    corpus.select(col(idCol).as("item_id"),
        array((0 until cb.m).map(j => encodeCode(v, cb, j)): _*).as("codes"),
        reconNormCol(v, cb).as("recon_norm"),
        Similarity.nearestCell(v, cents).as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)
  }

  /** IVF-PQ top-k served FROM the materialized table written by
    * [[writeEncoded]]: the probe ranks cells per query against the (tiny,
    * driver-literal) centroid set, the UNION of probed cells becomes a
    * static `cell IN (...)` filter — visible as PartitionFilters on the
    * scan, so unprobed cells are never read — and the ADC/overscan/rescore
    * pipeline is identical to the in-memory path (value-identical results).
    */
  def ivfPqTopKFromTable(encPath: String, corpus: DataFrame, queries: DataFrame,
                         k: Int, cb: Codebook, cents: Seq[(Long, Seq[Double])],
                         nProbe: Int, overscan: Int = 4,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qv = transform(col(vecCol), x => x.cast("double"))
    val centDf = cents.toDF("cell", "cv")
    val q = queries.select(col(idCol).as("query_id"), qv.as("_qv"),
      lutFlat(qv, cb).as("_lut"), Similarity.norm(qv).as("_qnorm"))
    val probe = q.join(broadcast(centDf))
      .withColumn("ccos", round(Similarity.cosine(col("_qv"), col("cv")), 6))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("cell"))))
      .filter(col("crk") <= nProbe)
      .select("query_id", "_qv", "_lut", "_qnorm", "cell")
    // the probed-cell union is nQueries×nProbe longs — collecting it is how
    // a STATIC partition filter is fed to the scan (file-level pruning)
    val probedCells = probe.select("cell").distinct().as[Long].collect().toSeq
    val enc = spark.read.parquet(encPath)
      .filter(col("cell").isin(probedCells: _*))
    val approx = enc.join(probe, "cell")
      .filter(col("item_id") =!= col("query_id"))
      .withColumn("acos",
        round(adcCos(col("codes"), col("_lut"), col("_qnorm"), col("recon_norm"),
          cb.ksub), 6))
    val wA = Window.partitionBy(col("query_id")).orderBy(col("acos").desc, col("item_id"))
    val cand = approx.withColumn("ark", row_number().over(wA))
      .filter(col("ark") <= k * overscan)
      .select("query_id", "item_id")
    val c = corpus.select(col(idCol).as("item_id"),
      transform(col(vecCol), x => x.cast("double")).as("_cv"))
    val rescored = cand
      .join(c, Seq("item_id"))
      .join(broadcast(q.select(col("query_id"), col("_qv"))), Seq("query_id"))
      .withColumn("cos", round(Similarity.cosine(col("_cv"), col("_qv")), 6))
    val wE = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("item_id"))
    rescored.withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "cos")
  }

  /** Code for subspace j — [[nearestCode]] over the sliced input. */
  private def encodeCode(vec: Column, cb: Codebook, j: Int): Column =
    nearestCode(subvec(vec, j, cb.d), cb.cents(j))

  /** Reconstructed norm from the code literals (see [[encode]]). */
  private def reconNormCol(vec: Column, cb: Codebook): Column = {
    val codes = array((0 until cb.m).map(j => encodeCode(vec, cb, j)): _*)
    val sq = cb.sqNorms
    sqrt((0 until cb.m).map { j =>
      element_at(array(sq(j).map(lit): _*), element_at(codes, j + 1) + 1)
    }.reduce(_ + _))
  }
}
