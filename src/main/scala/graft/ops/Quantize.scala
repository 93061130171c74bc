package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for the similarity/ANN path: symmetric per-vector
  * int8. At 10^9 × 1k-dim float32 vectors (≈4 TB), int8 storage cuts the
  * scan and shuffle volume 4× and the candidate-verify arithmetic stays on
  * integers; the exact-cosine re-rank happens only on the tiny top-k set.
  *
  * Quantization rule (deliberately engine-portable, used verbatim by the
  * DuckDB oracle): scale = max|x| / 127; q_i = floor(x_i / scale + 0.5)
  * (round-half-toward-+∞ — floor is exact on doubles, so any engine
  * computing the same expression left-to-right gets the identical ints).
  * All-zero vectors quantize to all zeros with scale 0.
  *
  * Everything is built-in higher-order functions — codegen, no UDFs.
  */
object Quantize {

  /** Per-vector scale: max|x| / 127 (0.0 for all-zero vectors). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, v => abs(v))) / lit(127.0d)

  /** Quantized values as int array (pair with [[int8Scale]]). */
  def int8Values(vec: Column, scale: Column): Column =
    transform(vec, v =>
      when(scale === 0.0d, lit(0))
        .otherwise(floor(v / scale + lit(0.5d)).cast("int")))

  /** (scale, q) struct in one expression. */
  def int8(vec: Column): Column = {
    val s = int8Scale(vec)
    struct(s.as("scale"), int8Values(vec, s).as("q"))
  }

  /** Reconstruction: x̂_i = q_i * scale. Max abs error is scale/2 by
    * construction (asserted in QuantizeSpec).
    */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") * scale)

  /** Quantize an embedding table: keeps idCol, adds (scale, q). */
  def table(embs: DataFrame, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val s = int8Scale(v)
    embs.select(col(idCol), s.as("scale"), int8Values(v, s).as("q"))
  }
}
