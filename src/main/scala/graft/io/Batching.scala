package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's exact chunking contract (utils.py:20-32; BATCHSIZE=10000,
  * exactness tests test_nodeset.py:394-483: 25 rows @ 10 → 10/10/5).
  *
  * In Spark the native analogue of "one tx per batch" is "one task per
  * partition" — but when a caller needs the REFERENCE's exact sequential
  * batch boundaries (e.g. to mirror its accounting), this assigns batch ids
  * by global ingest order. That global ordering is one range-shuffle; use
  * only where exact batch parity matters, not on the hot path.
  */
object Batching {
  val BatchSize = 10000

  def withBatchId(df: DataFrame, orderCol: Column, batchSize: Int = BatchSize): DataFrame = {
    val w = Window.orderBy(orderCol)
    df.withColumn("_graft_batch",
      floor((row_number().over(w) - 1) / batchSize).cast("long"))
  }

  /** Per-batch row counts in batch order — the reference's 10/10/5 shape. */
  def batchCounts(df: DataFrame, orderCol: Column, batchSize: Int = BatchSize): Seq[Long] =
    withBatchId(df, orderCol, batchSize)
      .groupBy("_graft_batch").count()
      .orderBy("_graft_batch")
      .collect().map(_.getLong(1)).toSeq
}
