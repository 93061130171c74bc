package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mix operators for training-data pipelines:
  * rate sampling, per-stratum (language / source / domain) rate sampling,
  * and train/val/test split assignment.
  *
  * Everything is keyed on a PORTABLE multiplicative hash of the row id —
  * no RNG state, no `rand()` — so (a) reruns and resumed jobs select the
  * same rows (the property a 10^12-row pipeline needs for reproducible
  * mixes and for incremental top-ups that don't resample history), and
  * (b) a different engine evaluating the same arithmetic selects the same
  * rows, which is what lets the driver gate value-check the sample against
  * DuckDB.
  *
  * Scale shape: every op is a zero-shuffle codegen'd projection + filter —
  * at 100 TB the scan is the whole cost, and column pruning keeps it to the
  * id + strata columns plus whatever the caller projects.
  */
object Sampling {

  /** Hash domain: buckets are uniform in [0, 1e6); a rate r keeps rows with
    * bucket < r * 1e6, so nested rates are monotone (the 10% sample is a
    * subset of the 20% sample at the same salt — handy for scaling studies).
    */
  val Buckets = 1000000L
  private val FoldPrime = 1000003L    // prime just above the bucket count
  private val Mult = 2654435761L      // Knuth multiplicative constant (2^32/φ)
  private val FoldPrime2 = 999983L    // prime just BELOW the bucket count
  // xxHash 32-bit prime 2 minus 1: EVEN on purpose — the two rounds are
  // SUMMED, and for ids below both fold primes the sum is affine with
  // multiplier (Mult + Mult2) mod the power-of-two factors of Buckets;
  // two odd multipliers would make that sum even and freeze the bucket's
  // low bits (every `bucket % nShards` consumer would then degenerate).
  // odd + even keeps the combined multiplier odd (and ≢ 0 mod 5).
  private val Mult2 = 2246822518L

  /** Portable deterministic bucket in [0, Buckets) for a long id.
    * Folding mod a prime FIRST keeps every product under 2^52, so the
    * arithmetic is exact even in engines that evaluate in doubles.
    *
    * The bucket is the mod-Buckets SUM of TWO independent fold-multiply
    * rounds over DIFFERENT primes. One round alone aliases residue
    * classes: ids congruent mod its fold prime would share a bucket
    * forever, so at >1e6 rows a rate sample would select ids spaced
    * exactly 1,000,003 apart in perfect correlation — the opposite of the
    * independence a train/val/test split implies. Two coprime folds
    * collide only for ids congruent mod FoldPrime·FoldPrime2 ≈ 1e12, which
    * pushes the aliasing horizon past the 10^12-row design scale.
    *
    * HASH VERSION 2 (the double-fold above). Version 1 was the single
    * fold-multiply round; adding the second round changed every bucket /
    * split / pack assignment. Splits PERSISTED under v1 do not match v2
    * assignments — downstream consumers of stored train/val/test membership
    * must either re-derive their splits or keep reading the stored
    * membership columns rather than recomputing them. (All in-repo oracles,
    * tests, and gates compute v2.)
    */
  def bucket(id: Column, salt: Long): Column =
    pmod(
      pmod(pmod(id + lit(salt), lit(FoldPrime)) * lit(Mult) + lit(salt), lit(Buckets)) +
        pmod(pmod(id + lit(salt), lit(FoldPrime2)) * lit(Mult2), lit(Buckets)),
      lit(Buckets))

  /** Keep a deterministic `rate` fraction of rows (0 <= rate <= 1). */
  def sampleByRate(df: DataFrame, rate: Double, idCol: String = "doc_id",
                   salt: Long = 0L): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(bucket(col(idCol), salt) < lit((rate * Buckets).toLong))
  }

  /** Per-stratum rate sampling — the data-mix op: up/down-weight languages,
    * sources, or domains by keeping a different deterministic fraction of
    * each. The rate table is inlined as a literal map (strata counts are
    * human-scale), so the whole mix is one codegen'd filter with ZERO
    * shuffles and no join — at 10^12 rows the alternative broadcast join
    * would be correct but strictly worse.
    */
  def sampleStratified(df: DataFrame, strataCol: String, rates: Map[String, Double],
                       defaultRate: Double = 0.0, idCol: String = "doc_id",
                       salt: Long = 0L): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "all rates must be in [0,1]")
    val entries = rates.toSeq.sortBy(_._1).flatMap { case (k, r) =>
      Seq(lit(k), lit((r * Buckets).toLong)) }
    val threshold = coalesce(
      element_at(map(entries: _*), col(strataCol)),
      lit((defaultRate * Buckets).toLong))
    df.filter(bucket(col(idCol), salt) < threshold)
  }

  /** Deterministic split assignment (train/val/test …): returns the frame
    * with a `split` column holding `names(i)` where the row's bucket falls
    * in the i-th cumulative weight range. Weights must sum to <= 1; rows
    * past the total (when it is < 1) get null (excluded from every split).
    */
  def splitAssign(df: DataFrame, names: Seq[String], weights: Seq[Double],
                  idCol: String = "doc_id", salt: Long = 0L,
                  splitCol: String = "split"): DataFrame = {
    require(names.length == weights.length, "names and weights must align")
    require(weights.forall(_ >= 0) && weights.sum <= 1.0 + 1e-9,
      "weights must be non-negative and sum to <= 1")
    val cuts = weights.scanLeft(0.0)(_ + _).map(c => (c * Buckets).toLong)
    val b = bucket(col(idCol), salt)
    val assign = names.indices.foldRight(lit(null).cast("string")) { (i, rest) =>
      when(b >= lit(cuts(i)) && b < lit(cuts(i + 1)), lit(names(i))).otherwise(rest)
    }
    df.withColumn(splitCol, assign)
  }

  /** Temperature-balanced mix sampling — the multilingual-LM rebalance:
    * keep stratum s with probability ∝ n_s^alpha (alpha < 1 flattens the
    * head, boosts the tail), targeting ~`targetRows` kept rows overall.
    *
    * Two passes: (1) one small aggregation collects the per-stratum counts
    * (strata are human-scale — languages, sources); (2) the per-stratum
    * keep thresholds are inlined as a LITERAL map over the deterministic
    * [[bucket]], so the sweep over the corpus is a single codegen'd filter
    * with zero shuffles — same 10^12-row shape as [[sampleStratified]].
    *
    * Engine-portable determinism: the threshold math is INTEGER once the
    * weight w_s = floor(n_s^alpha) is fixed — threshold_s = min(Buckets,
    * Buckets·T·w_s / (Z·n_s) in integer division) — and for alpha = 0.5
    * the weight uses sqrt, which IEEE 754 rounds correctly in every engine
    * (floor(sqrt) is exact for n < 1e14), so an external SQL oracle
    * reproduces membership bit-for-bit. Other alphas use pow, which may
    * differ in the last ulp across engines: fine for production, not for a
    * value-exact cross-engine gate.
    */
  def sampleTemperature(df: DataFrame, strataCol: String, alpha: Double,
                        targetRows: Long, idCol: String = "doc_id",
                        salt: Long = 0L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    // strata are keyed by their STRING form (works for any column type);
    // NULL strata get their own sentinel stratum instead of poisoning the
    // literal map (null can't be a map key) or silently vanishing
    val nullKey = "\u0000<null>"
    val keyed = coalesce(col(strataCol).cast("string"), lit(nullKey))
    val counts = df.groupBy(keyed.as("_k")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val weights = counts.map { case (k, n) =>
      val w = if (alpha == 0.5) math.floor(math.sqrt(n.toDouble)).toLong
              else math.floor(math.pow(n.toDouble, alpha)).toLong
      (k, n, math.max(1L, w))
    }
    val z = weights.map(_._3).sum
    val entries = weights.flatMap { case (k, n, w) =>
      // integer arithmetic after the weight: floor(Buckets·T·w / (Z·n)),
      // capped at Buckets (a tail stratum whose quota exceeds its size is
      // kept whole). BigInt keeps BOTH products exact past 2^63 — a
      // wrapped-negative numerator OR denominator (z·n overflows at
      // ~4e9-row corpora with alpha→1) would silently EMPTY the stratum.
      // The SQL-oracle replay needs HUGEINT casts at that scale; the
      // resulting threshold is ≤ Buckets, so the literal stays a Long.
      val thr = (BigInt(Buckets) * targetRows * w / (BigInt(z) * n))
        .min(BigInt(Buckets)).toLong
      Seq(lit(k), lit(thr))
    }
    df.filter(bucket(col(idCol), salt) <
      coalesce(element_at(map(entries.toIndexedSeq: _*), keyed), lit(0L)))
  }

  /** Exact top-`n` rows per group by an explicit ordering — the per-domain
    * quality quota: "keep the N best documents per language/source". The
    * ordering must be made total by the caller (tiebreak on the id) so
    * reruns are stable.
    *
    * Scale shape: ONE hash shuffle on the group key, then a per-group
    * external sort inside the window — Spark's sort-based window streams
    * and spills, so a hot group larger than executor memory still
    * completes. When n is small relative to group sizes, filter the
    * obviously-unqualified rows first (e.g. a quality floor) to cut the
    * sort input; the exact quota itself cannot be computed without
    * grouping every member somewhere.
    */
  def quotaPerGroup(df: DataFrame, groupCol: String, n: Int,
                    orderBy: Seq[Column]): DataFrame = {
    require(n > 0, s"quota must be positive, got $n")
    require(orderBy.nonEmpty, "quotaPerGroup needs an explicit total order")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy: _*)
    df.withColumn("_qrk", row_number().over(w))
      .filter(col("_qrk") <= n)
      .drop("_qrk")
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-Res): every row gets the key u^(1/w) — u a deterministic
    * uniform in (0, 1) from the portable [[bucket]] hash, w its positive
    * weight — and the sample is the k LARGEST keys. Inclusion odds scale
    * with weight (the quality-weighted corpus subset), the draw is
    * rerun-identical and engine-portable, and a weight change reshuffles
    * only the affected rows' keys. Non-positive-weight rows never
    * qualify.
    *
    * Keys are ROUNDED to 6 dp and the cut ordered (key DESC, id) — a
    * total order both engines reproduce (the BM25 gate's contract).
    * Shape: one zero-shuffle codegen'd projection + a TakeOrdered —
    * never a full sort.
    */
  def sampleWeighted(df: DataFrame, k: Int, weightCol: String,
                     idCol: String = "doc_id", salt: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (bucket(col(idCol), salt).cast("double") + lit(0.5)) /
      lit(Buckets.toDouble)
    df.filter(col(weightCol) > 0)
      .withColumn("wkey",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 6))
      .orderBy(col("wkey").desc, col(idCol))
      .limit(k)
  }

  /** [[sampleWeighted]] per group — the per-domain/per-language form of
    * the weighted draw ("k quality-weighted documents from EVERY source"):
    * same A-Res key u^(1/w), cut per group by a rank window under the
    * (rounded key DESC, id) total order. Where [[quotaPerGroup]] takes the
    * deterministic TOP-k by an explicit order, this draws a weighted
    * RANDOM k — high-weight rows are likelier, not guaranteed. One hash
    * shuffle on the group key; the key projection is zero-shuffle codegen.
    */
  def sampleWeightedPerGroup(df: DataFrame, groupCol: String, k: Int,
                             weightCol: String, idCol: String = "doc_id",
                             salt: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = (bucket(col(idCol), salt).cast("double") + lit(0.5)) /
      lit(Buckets.toDouble)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("wkey").desc, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("wkey",
        round(pow(u, lit(1.0) / col(weightCol).cast("double")), 6))
      .withColumn("_wrk", row_number().over(w))
      .filter(col("_wrk") <= k)
      .drop("_wrk")
  }

  /** Deterministic negative-pair sampling for contrastive training: k
    * pseudo-random partners per anchor, drawn uniformly over the corpus by
    * hashing (anchor, j) into the [[shufflePositions]] permutation — no
    * `rand()`, no cross join, rerun- and engine-reproducible (the driver
    * gate value-checks every sampled pair). A partner landing on the
    * anchor itself shifts one position over, so a pair is never (x, x).
    *
    * The two-bucket composite hash spans a 10^12 position range, so
    * corpora beyond the single hash's 10^6 buckets still sample every
    * position. Shape: the position index (two-pass, see
    * [[shufflePositions]]), one ×k explode of (anchor, j) KEYS ONLY, and
    * one equi-join on the position column — at 10^12 rows the join
    * shuffles slim (pos, id) pairs, never payloads.
    */
  def negativePairs(df: DataFrame, k: Int, idCol: String = "doc_id",
                    salt: Long = 29L, nShards: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // integral-id contract (the randomWalks rule): the partner seed is
    // anchor_id*k + j, which silently NULLs (dropping every pair) on a
    // non-numeric id column
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(df.schema(idCol).dataType),
      s"negativePairs requires an integral id column; $idCol is ${df.schema(idCol).dataType}")
    val pos = shufflePositions(df.select(col(idCol)), nShards, idCol, salt)
    val n = pos.agg(count(lit(1)).as("_n"))
    val seed = col("anchor_id") * lit(k.toLong) + col("j")
    val wide = bucket(seed, salt + 1) * lit(Buckets) + bucket(seed, salt + 2)
    val raw = pmod(wide, col("_n"))
    val anchors = pos
      .select(col(idCol).as("anchor_id"), col("pos").as("_apos"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"), col("_apos"), col("_n"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("_ppos",
        when(raw === col("_apos"), pmod(raw + 1, col("_n"))).otherwise(raw))
    anchors
      .join(pos.select(col(idCol).as("neg_id"), col("pos").as("_ppos")),
        Seq("_ppos"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("j"), col("neg_id"))
  }

  /** Deterministic global training-order shuffle: every row gets its rank
    * (0-based) under the (hash, id) total order — i.e. `pos` enumerates a
    * seeded pseudorandom permutation of the corpus, the order an epoch
    * feeds examples to the trainer. Re-runs (and other engines) reproduce
    * the permutation exactly, and appending new rows perturbs only where
    * the new hashes land, not the relative order of the old rows.
    *
    * Scale shape: the classic two-pass global index — NEVER a global sort
    * into one task. The hash range is cut into `nShards` contiguous
    * slices; pass 1 counts rows per shard (map-side partial agg to
    * `nShards` rows, the cumulative offsets computed in a 1-partition
    * window over that TINY table only); pass 2 ranks within each shard in
    * parallel (one hash shuffle on the shard key, sort-based windows
    * spill) and adds the shard's offset via a broadcast join. With
    * nShards sized to the cluster (4–8× cores), no task ever sees more
    * than ~1/nShards of the data.
    */
  def shufflePositions(df: DataFrame, nShards: Int, idCol: String = "doc_id",
                       salt: Long = 17L, posCol: String = "pos"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val shardWidth = (Buckets + nShards - 1) / nShards
    val withShard = df
      .withColumn("_b", bucket(col(idCol), salt))
      .withColumn("_shard", (col("_b") / lit(shardWidth)).cast("long"))
    // offsets: a tiny nShards-row table; the unpartitioned window is safe
    // here and ONLY here
    val offsets = withShard.groupBy("_shard").agg(count(lit(1)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(Window.orderBy("_shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_shard", "_offset")
    val w = Window.partitionBy(col("_shard")).orderBy(col("_b"), col(idCol))
    withShard
      .withColumn("_rk", row_number().over(w).cast("long"))
      .join(broadcast(offsets), "_shard")
      .withColumn(posCol, col("_offset") + col("_rk") - 1)
      .drop("_b", "_shard", "_rk", "_offset")
  }


}
