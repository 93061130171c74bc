package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches as pure dataflow. A Count-Min sketch is
  * usually presented as a mutable d×w counter grid; distributed, it is
  * just a tiny aggregation result: explode every item to its d
  * (row, bucket) cells and count per cell. The "grid" DataFrame has at
  * most d·w rows regardless of input size, merges across partitions by
  * construction (counts add), and at 10^12 tokens replaces the exact
  * per-token count table (which is as big as the vocabulary) with a
  * fixed-size summary — same swap-in contract as the HLL vocabulary
  * bound in [[CorpusOps.vocabSize]].
  */
object Sketches {

  private def cells(itemCol: String, depth: Int, width: Int) =
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"),
        pmod(xxhash64(col(itemCol), lit(r)), lit(width.toLong)).as("bucket"))): _*))

  /** Build the sketch: one explode (d rows per item) + one (r, bucket)
    * aggregation with map-side partials → at most d·w output rows. Row
    * r's hash is xxhash64 seeded by r, so the d rows are independent
    * functions of the item.
    */
  def countMinSketch(items: DataFrame, itemCol: String,
                     depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    items.select(cells(itemCol, depth, width).as("x"))
      .groupBy(col("x.r").as("r"), col("x.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each distinct probe item: join the
    * probes' d cells against the sketch and take the per-item MIN
    * (missing cells count 0, so never-seen probes estimate 0). The
    * estimate NEVER undercounts — cm_est ≥ the true frequency, always —
    * and overcounts by collision mass only. The sketch side has ≤ d·w
    * rows, so the join broadcasts.
    */
  def estimateCounts(sketch: DataFrame, probes: DataFrame, itemCol: String,
                     depth: Int, width: Int): DataFrame =
    probes.select(col(itemCol)).distinct()
      .select(col(itemCol), cells(itemCol, depth, width).as("x"))
      .select(col(itemCol), col("x.r").as("r"), col("x.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(itemCol).agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** Per-group cardinality with the honest swap-in contract
    * ([[graft.ops.CorpusOps.vocabSize]]'s pattern, grouped): the exact
    * distinct count per group NEXT TO a boolean asserting the mergeable
    * HLL++ sketch lands within `maxRelErr` of it. At 10^12 rows the exact
    * count (one dedup shuffle per group's values) gives way to the
    * sketch-only aggregation — per-group daily-active counts, per-source
    * unique-document tallies — and this gate is what makes that swap
    * evidence-backed rather than vibes. Empty-string-safe; null values
    * are not counted by either side.
    */
  def groupDistinctBound(df: DataFrame, groupCol: String, valueCol: String,
                         maxRelErr: Double = 0.05): DataFrame = {
    require(maxRelErr > 0, s"maxRelErr must be positive, got $maxRelErr")
    // sketch rsd = bound/3: asserting a 1-sigma bound on the default-rsd
    // sketch would breach ~1/3 of the time on large groups — the bound
    // must be ≈3 sigma of the sketch it gates. An all-NULL group is 0 vs
    // 0 → within bound (the division there is NULL; coalesce keeps the
    // boolean a boolean).
    df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), maxRelErr / 3).as("_a"))
      .select(col(groupCol), col("n_exact"),
        coalesce(abs(col("_a") - col("n_exact")).cast("double") / col("n_exact")
          <= maxRelErr, lit(true)).as("approx_ok"))
  }
}
