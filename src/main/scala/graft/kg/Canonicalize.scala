package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Surface → canonical-name map construction, size-adaptive:
  *
  *   - SMALL distinct-surface sets (<= smallThreshold) are collected and
  *     solved in the driver: exact all-pairs Jaccard + union-find. This is
  *     the same adaptive move Spark itself makes when it collects a small
  *     join side to broadcast — a 66-surface similarity graph must not pay
  *     ~15 driver-serial seconds of LSH-band jobs and CC iterations.
  *   - LARGE sets run the distributed path: MinHash-LSH band blocking
  *     (Lsh.candidatePairs) + large-star/small-star connected components.
  *
  * Both paths produce identical canonical maps at the same threshold (the
  * small path is exact; the LSH path's miss probability is ~1% per
  * qualifying pair at jaccard 0.5, 16 bands × 2 rows) — equivalence is
  * asserted in PipelineSpec by running both.
  *
  * NOTE: intentionally implemented independently from
  * [[SequentialOracle.canonicalMap]] (different code, same spec) so the
  * oracle stays a meaningful check even when the small path is taken.
  */
object Canonicalize {
  // all-pairs in the driver is O(n²): 2000 norms ≈ 2M pair checks ≈ <1s;
  // beyond that the distributed LSH path wins
  val DefaultSmallThreshold = 2000L

  /** Distributed path: LSH blocking → CC → (norm, canonical). */
  def distributedMap(distinctNorms: DataFrame, jaccardThreshold: Double): DataFrame = {
    val pairs = Lsh.candidatePairs(distinctNorms, jaccardThreshold)
    ConnectedComponents.runOnStrings(pairs, "a", "b")
      .withColumnRenamed("key", "norm")
  }

  /** Driver-local path: exact all-pairs + union-find (path halving). */
  def localMap(norms: Array[String], jaccardThreshold: Double): Seq[(String, String)] = {
    val n = norms.length
    val grams: Array[Set[String]] = norms.map(s =>
      if (s.length < 3) Set(s) else s.sliding(3).toSet)
    val parent = Array.tabulate(n)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    def union(a: Int, b: Int): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (norms(ra) <= norms(rb)) parent(rb) = ra else parent(ra) = rb }
    }
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val inter = grams(i).intersect(grams(j)).size
        val uni = grams(i).size + grams(j).size - inter
        if (uni > 0 && inter.toDouble / uni >= jaccardThreshold) union(i, j)
        j += 1
      }
      i += 1
    }
    // root selection above is by union order; normalize to lexicographic min
    val rootMin = mutable.Map.empty[Int, String]
    for (k <- 0 until n) {
      val r = find(k)
      rootMin.updateWith(r) {
        case Some(m) => Some(if (norms(k) < m) norms(k) else m)
        case None    => Some(norms(k))
      }
    }
    (0 until n).map(k => norms(k) -> rootMin(find(k)))
  }

  /** Size-adaptive canonical map over a DataFrame with distinct `norm`.
    * Output: (norm, canonical, link_score) where link_score is the exact
    * char-3-gram Jaccard between the surface's normalized form and its
    * canonical name (1.0 for exact matches) — the entity-link confidence
    * carried onto every triple.
    */
  def canonicalMap(distinctNorms: DataFrame, jaccardThreshold: Double,
                   smallThreshold: Long = DefaultSmallThreshold): DataFrame = {
    val spark = distinctNorms.sparkSession
    import spark.implicits._
    // ONE probe job instead of count-then-collect: pull up to threshold+1
    // rows — if we got <= threshold, that set IS the complete distinct set
    val probeN = (math.min(smallThreshold, Int.MaxValue - 1L) + 1L).toInt
    val head = distinctNorms.limit(probeN).as[String].collect()
    val mapped =
      if (head.length <= smallThreshold) {
        spark.createDataset(localMap(head, jaccardThreshold)).toDF("norm", "canonical")
      } else {
        distributedMap(distinctNorms, jaccardThreshold)
      }
    mapped
      .withColumn("_sa", Lsh.shinglesExpr("norm"))
      .withColumn("_sb", Lsh.shinglesExpr("canonical"))
      .withColumn("link_score",
        when(col("norm") === col("canonical"), lit(1.0)).otherwise(
          size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
            size(array_union(col("_sa"), col("_sb")))))
      .select("norm", "canonical", "link_score")
  }

  /** Edit-distance fuzzy pairs — the typo-tolerant complement to the
    * token-set Jaccard matcher above: distinct surfaces blocked on their
    * first `blockPrefix` characters, self-joined WITHIN blocks only
    * (`a < b`, each unordered pair once), kept when Levenshtein distance
    * ≤ `maxDist`. Distances are small integers from Spark's codegen'd
    * `levenshtein` — value-identical across engines, so the gate is
    * exact, not rows-only.
    *
    * Prefix blocking is the honest small-scale block; at corpus scale
    * swap the blocker for the LSH band pairs above (the join and filter
    * stay the same) — a first-character block over 10^9 surfaces is 26
    * giant quadratic cells, not a plan.
    */
  def fuzzyPairs(df: DataFrame, nameCol: String, maxDist: Int,
                 blockPrefix: Int = 1): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockPrefix >= 1, s"blockPrefix must be >= 1, got $blockPrefix")
    val names = df.select(col(nameCol).as("_n")).distinct()
      .withColumn("_blk", substring(col("_n"), 1, blockPrefix))
    val l = names.alias("l"); val r = names.alias("r")
    l.join(r, col("l._blk") === col("r._blk") && col("l._n") < col("r._n"))
      .withColumn("dist", levenshtein(col("l._n"), col("r._n")))
      .filter(col("dist") <= maxDist)
      .select(col("l._n").as("a"), col("r._n").as("b"), col("dist"))
  }

  /** Jaro-Winkler-scored candidate pairs — the record-linkage scorer the
    * reference's merge-key identity model implies for near-key matches.
    * Same prefix-blocked, `a < b` self-join as [[fuzzyPairs]]; pair
    * MEMBERSHIP is decided by the integer Levenshtein gate (portable
    * across engines, no float-threshold row-membership hazard) and the
    * Jaro-Winkler score rides along as the ranking value, computed by
    * the native codegen'd [[graft.functions.JaroWinkler]] expression
    * (byte-level, DuckDB-parity semantics).
    *
    * Production use thresholds on `jw` for linkage decisions; keeping the
    * discrete distance as the candidate filter means a cross-engine
    * verifier can re-derive the exact row set and then check every score
    * value — the strongest gate shape for a float-valued comparator.
    */
  def jaroScoredPairs(df: DataFrame, nameCol: String, maxDist: Int,
                      blockPrefix: Int = 1): DataFrame =
    fuzzyPairs(df, nameCol, maxDist, blockPrefix)
      .withColumn("jw", graft.functions.functions.jaroWinkler(col("a"), col("b")))
}
