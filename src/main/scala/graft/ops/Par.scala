package graft.ops

import org.apache.spark.sql.DataFrame

/** Under-parallelism guard for CPU-dense stages (guide §2.5 "input skew").
  *
  * Signature/extraction stages in this library are CPU-dense per byte: a
  * corpus slice whose parquet footprint is smaller than ONE input split
  * (`spark.sql.files.maxPartitionBytes`) scans as a single task and
  * serializes minutes of per-row hashing onto one core while the rest of
  * the cluster idles. That is precisely the guide's "fix at the source if
  * you can; otherwise repartition immediately after the read".
  *
  * `widen` round-robin-repartitions the (already projected, slim) input up
  * to the cluster's core count — but ONLY when the plan's partitioning is
  * actually below it. At production scan widths (thousands of splits) the
  * guard is a structural no-op: no exchange is added, nothing extra
  * shuffles. The repartition is keyless round-robin, which is
  * deterministic under retries thanks to Spark's sort-before-repartition
  * default (SPARK-23207; guide §2.5).
  *
  * Call it on the NARROW projection feeding the expensive expression, never
  * on a wide table — the shuffled bytes must be the bytes the computation
  * needs anyway.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
