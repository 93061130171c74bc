package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming face of exact dedup (`graft.ops.Dedup.exact`): emit only
  * the first-arrived document per content hash.
  *
  * Exact dedup over an UNBOUNDED stream needs unbounded state, so the
  * scale-honest contract is watermark-bounded:
  * `dropDuplicatesWithinWatermark` keys the state on sha2(text) and evicts
  * entries once the event-time watermark passes, which bounds state by the
  * duplicate-arrival window instead of corpus size. A duplicate arriving
  * later than the watermark window can re-emit — the periodic BATCH dedup
  * pass re-converges the stored corpus (the same lambda split as
  * IncrementalPipeline's canonicalization note).
  *
  * The dedup key is the 64-hex sha2, not the document body, so per-key
  * state is fixed-width regardless of document size; the emitted rows keep
  * the full input schema.
  */
object StreamingDedup {

  def dedupStream(docs: DataFrame, watermark: String = "10 minutes",
                  tsCol: String = "ts", textCol: String = "text"): DataFrame =
    docs
      .withColumn("_graft_h", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_graft_h")
      .drop("_graft_h")
}
