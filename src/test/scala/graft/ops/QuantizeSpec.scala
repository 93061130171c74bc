package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (0L, Seq(1.0, -0.5, 0.25, 0.0)),
    (1L, Seq(0.003, 0.001, -0.002, 0.004)), // small magnitudes
    (2L, Seq(0.0, 0.0, 0.0, 0.0)),          // all-zero: scale 0, q all 0
    (3L, Seq(-127.0, 127.0, 63.5, -63.5))
  ).toDF("vec_id", "embedding")

  test("int8 range, zero-vector handling, and scale definition") {
    val q = Quantize.table(vecs).collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    // every quantized value within [-127, 127]
    q.values.foreach { case (_, xs) => xs.foreach(x => assert(x.abs <= 127)) }
    // the max-magnitude element maps to ±127 exactly
    assert(q(0L)._2.head == 127)
    assert(q(3L)._2(0) == -127 && q(3L)._2(1) == 127)
    // all-zero vector: scale 0, all zeros
    assert(q(2L)._1 == 0.0 && q(2L)._2.forall(_ == 0))
    // scale = max|x|/127
    assert(math.abs(q(0L)._1 - 1.0 / 127) < 1e-15)
  }

  test("dequantization error bounded by scale/2 per element") {
    val out = vecs
      .select(col("vec_id"), col("embedding"), Quantize.int8(col("embedding")).as("z"))
      .select(col("vec_id"),
        zip_with(col("embedding"),
          Quantize.dequantize(col("z.q"), col("z.scale")),
          (a, b) => abs(a - b)).as("err"),
        col("z.scale").as("scale"))
      .collect()
    out.foreach { r =>
      val errs = r.getSeq[Double](1); val scale = r.getDouble(2)
      errs.foreach(e => assert(e <= scale / 2 + 1e-12, s"err $e > ${scale / 2}"))
    }
  }

  test("quantization is deterministic and preserves cosine approximately") {
    val embs = spark.range(50).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), j -> cast(pmod(xxhash64(id, j), 1000) as double) / 500.0 - 1.0)")
        .as("embedding"))
    val q1 = Quantize.table(embs).collect().map(_.toString).sorted
    val q2 = Quantize.table(embs).collect().map(_.toString).sorted
    assert(q1.sameElements(q2))
    // cosine on dequantized vectors stays within 1% of the exact cosine
    val z = embs.select(col("vec_id"), col("embedding"),
      Quantize.int8(col("embedding")).as("z"))
    val deq = z.select(col("vec_id").as("id"),
      col("embedding").as("e"),
      Quantize.dequantize(col("z.q"), col("z.scale")).as("d"))
    val pairs = deq.alias("a").join(deq.alias("b"), col("a.id") < col("b.id"))
      .select(
        Similarity.cosine(col("a.e"), col("b.e")).as("exact"),
        Similarity.cosine(col("a.d"), col("b.d")).as("approx"))
      .collect()
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.01,
        s"cosine drift ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }
}
