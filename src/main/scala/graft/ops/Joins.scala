package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shape optimizations for 100 TB probes, building on the sketch
  * machinery in [[graft.functions.functions]]. Companion to [[Skew]]
  * (reducer-side mitigation); these attack the SHUFFLE VOLUME side.
  */
object Joins {

  /** Bloom-prefiltered semi-join — the generic form of
    * [[CorpusOps.decontaminateBloom]]'s probe: keep the left rows whose
    * key appears in the right key set, but drop non-members BEFORE the
    * semi-join shuffle with a ~4 MB bloom literal of the right keys.
    * Bloom filters have false POSITIVES only, and every survivor still
    * passes the exact semi-join, so the result is IDENTICAL to
    * `left.join(right, key, "left_semi")` (the driver gate proves it
    * against the plain SQL EXISTS) — the sketch only shrinks what
    * shuffles, by ~the non-member rate. This is the manual,
    * cross-stage-reusable form of Spark's own runtime row-group bloom
    * pushdown; at a 10^12-row left side with a 0.1% hit rate it is the
    * difference between shuffling everything and shuffling the hits.
    *
    * Sizing: `expectedItems`/`numBits` follow the measured right-key
    * cardinality (defaults ≈ 4M keys in 4 MB, ~1% FP). NULL keys are
    * never members (same as the plain semi-join).
    */
  def bloomSemiJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    expectedItems: Long = 1L << 22,
                    numBits: Long = 1L << 25): DataFrame = {
    // no distinct() anywhere: bloom insertion dedups inherently (duplicate
    // inserts are free map-side), and left_semi never multiplies rows —
    // a dedup shuffle of the right keys would be pure waste, twice (the
    // eager bloom build AND the final plan would each recompute it)
    val rk = right.select(col(rightKey))
    val bloomBytes = rk
      .agg(graft.functions.functions
        .bloomAgg(xxhash64(col(rightKey)), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val pre = left.filter(graft.functions.functions
      .mightContain(lit(bloomBytes), xxhash64(col(leftKey))))
    pre.join(rk, pre(leftKey) === rk(rightKey), "left_semi")
  }
}
