package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the Structured Streaming
  * enrichment shape (click→purchase attribution, request→response pairing,
  * sensor cross-correlation): two unbounded inputs joined on a key with an
  * event-time range bound, each side buffering state until the other
  * side's watermark proves no more matches can arrive.
  *
  * Semantics contract (the driver gate's property): the multi-micro-batch
  * streaming execution must emit EXACTLY the batch join's rows — matches
  * whose two sides arrive in different micro-batches (in either order)
  * come out of the buffered state, none duplicated, none lost.
  *
  * Scale shape: state per side is bounded by (watermark delay + window) of
  * events per key — the range condition plus both watermarks is what lets
  * the engine EVICT buffered rows (an unbounded-state join admits no
  * cleanup); the join itself shuffles both streams on the key exactly like
  * the batch equi-join. At 100 TB/day the watermark delay is the knob that
  * trades late-data tolerance for state size.
  */
object StreamJoin {

  /** Inner join `left ⋈ right` on `keyCol` with
    * `right.ts ∈ [left.ts, left.ts + windowSec]`. Both inputs must carry
    * watermarks (`withWatermark`) when streaming; the same plan works
    * unchanged on batch frames (the parity the gate exploits).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val l = left.alias("l"); val r = right.alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $windowSec SECONDS"))
  }
}
