package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-layout keys: what you SORT AND WRITE BY so that scans prune.
  * A single-column sort gives parquet min/max pruning on that column
  * only; interleaving the bits of two columns (Morton / Z-order) makes
  * rows close in the curve close in BOTH dimensions, so range predicates
  * on either column (or both) skip most row groups — the standard
  * layout move for a 100 TB table queried by (tenant, time), (lat, lon),
  * or (conv bucket, day). Usage: `df.repartitionByRange($"z")
  * .sortWithinPartitions($"z").write...` with `z = zOrder2(a, b, bits)`.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Pure integer bit algebra — one codegen'd zero-shuffle projection,
    * reproducible by any engine (the driver gate value-checks the keys).
    * Values ≥ 2^bits fold (only their low bits interleave): normalize or
    * bucket inputs to the key range first at real scale.
    */
  def zOrder2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Driver-side scalar twin of [[zOrder2]] — for computing the z codes of
    * a query box's corners. z is monotone in each coordinate (a coordinate's
    * bits occupy fixed disjoint positions, so increasing it with the other
    * held fixed increases z), hence every point inside the box
    * [alo,ahi]×[blo,bhi] satisfies zValue(alo,blo) <= z <= zValue(ahi,bhi):
    * the corner interval is a correct SUPERSET filter to push at the scan
    * of a z-sorted table (row-group min/max pruning serves it), with the
    * residual box predicates removing the curve's excursions exactly.
    */
  def zValue(a: Long, b: Long, bits: Int): Long = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >>> i) & 1L) << (2 * i)) | (((b >>> i) & 1L) << (2 * i + 1))
    }
  }

  /** Materialize a table in Z-order: compute z = [[zOrder2]](a, b), range-
    * partition on it (contiguous z ranges per file — parallel, never a
    * single-task global sort) and sort within partitions, so EVERY file's
    * parquet min/max on z is a tight interval and a corner-code range
    * filter skips files/row groups on BOTH dimensions.
    */
  def writeZOrdered(df: org.apache.spark.sql.DataFrame, aCol: String, bCol: String,
                    bits: Int, path: String, nFiles: Int = 16): Unit =
    df.withColumn("z", zOrder2(col(aCol), col(bCol), bits))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(path)
}
