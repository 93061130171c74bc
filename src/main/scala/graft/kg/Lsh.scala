package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash-LSH blocking over character 3-gram shingles of normalized mention
  * surfaces — candidate pair generation without the O(n^2) cross join.
  *
  * All built-ins: shingles via sequence+transform (higher-order functions),
  * per-seed min-hash via transform+array_min over xxhash64, band keys via
  * hash of signature slices, candidates via a self-equi-join on
  * (band_idx, band_key). At 10^12-turn scale the surface table is large but
  * the band join is a plain hash-shuffle equi-join; hot bands (stop-surface
  * skew) are handled by AQE skew-join splitting.
  *
  * Parameters: numHashes = bands * rowsPerBand; for rowsPerBand=2 and 16
  * bands, a true Jaccard-0.5 pair is missed with probability
  * (1 - 0.25)^16 ≈ 1% — comfortably inside the P/R ≥ 0.95 budget.
  */
object Lsh {
  val NumHashes = 32
  val RowsPerBand = 2
  val NumBands: Int = NumHashes / RowsPerBand

  /** Character 3-gram shingle set (distinct) of a string column; strings
    * shorter than 3 chars shingle to the whole string. SQL-expr form because
    * the lambda needs Column-typed substring positions.
    */
  def shinglesExpr(colName: String): Column =
    when(length(col(colName)) < 3, array(col(colName))).otherwise(
      array_distinct(expr(
        s"transform(sequence(1, length($colName) - 2), i -> substring($colName, i, 3))")))

  /** MinHash signature: array of NumHashes min-values. Seeded hash h_j(s) =
    * xxhash64(shingle, j).
    */
  def signature(shinglesCol: String): Column =
    expr(
      s"""transform(sequence(0, ${NumHashes - 1}),
         |  j -> array_min(transform($shinglesCol, s -> xxhash64(s, j))))""".stripMargin)

  /** Candidate pairs (a.norm < b.norm) from banded signatures, verified with
    * exact Jaccard >= `threshold` on the shingle sets.
    *
    * Input: DataFrame with a distinct string column `norm`.
    * Output: columns (a, b, jaccard).
    *
    * Scale shape: the banded table carries ONLY (norm, band_idx, band_key) —
    * the NumBands× explode and the self-join shuffle never move the shingle
    * arrays (which are ~3× the surface text). Shingles are joined back from a
    * persisted (norm, _sh) side onto the deduplicated candidate pairs for the
    * exact-Jaccard verify. The verified pair set (small) is materialized
    * eagerly so the working caches are released before returning.
    */
  def candidatePairs(norms: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val shingled = norms
      .withColumn("_sh", shinglesExpr("norm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = shingled
      .withColumn("_sig", signature("_sh"))
      .select(col("norm"),
        posexplode(expr(
          s"transform(sequence(0, ${NumBands - 1}), b -> hash(slice(_sig, b * $RowsPerBand + 1, $RowsPerBand)))"))
          .as(Seq("band_idx", "band_key")))
      // persisted so the NumHashes-hash signature computes once, not per side
      .persist(StorageLevel.MEMORY_AND_DISK)
    val l = banded.alias("l")
    val r = banded.alias("r")
    val cand = l.join(r,
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.norm") < col("r.norm"))
      .select(col("l.norm").as("a"), col("r.norm").as("b"))
      .dropDuplicates("a", "b")
    val out = cand
      .join(shingled.select(col("norm").as("a"), col("_sh").as("sha")), Seq("a"))
      .join(shingled.select(col("norm").as("b"), col("_sh").as("shb")), Seq("b"))
      // |A∪B| = |A|+|B|-|A∩B| exactly (both sides are distinct string
      // sets) — the union array never needs building (r6, guide §2.3)
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize, then free the working caches
    banded.unpersist()
    shingled.unpersist()
    out
  }
}
