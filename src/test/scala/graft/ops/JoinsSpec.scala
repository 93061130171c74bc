package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin equals the plain left-semi join (null keys never match)") {
    val left = (Seq[Option[Long]](Some(1L), Some(2L), Some(2L), Some(9L), None))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val right = Seq(1L, 2L, 7L).toDF("rk")
    val out = Joins.bloomSemiJoin(left, right, "k", "rk")
    val plain = left.join(right, left("k") === right("rk"), "left_semi")
    assert(out.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(out).count() === 0)
    assert(out.count() === 3) // ids 0,1,2; 9 and null drop
  }

  test("bloomSemiJoin survives forced false positives (tiny bloom)") {
    val left = (0L until 200L).map(i => (i, i)).toDF("id", "k")
    val right = Seq(5L, 42L).toDF("rk")
    // 64-bit bloom: heavy FP rate, the exact semi-join must still win
    val out = Joins.bloomSemiJoin(left, right, "k", "rk",
      expectedItems = 2L, numBits = 64L)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 42L))
  }
}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrder2 interleaves bits: a→even positions, b→odd") {
    val df = Seq((3L, 1L), (0L, 3L), (5L, 0L), (65535L, 65535L))
      .toDF("a", "b")
    val out = df.select(Layout.zOrder2(col("a"), col("b"), 16).as("z"))
      .as[Long].collect().toSeq
    // a=0b11,b=0b01 → 0b0111 = 7; a=0,b=0b11 → 0b1010 = 10;
    // a=0b101,b=0 → 0b010001 = 17; all-ones 16+16 bits → 2^32 - 1
    assert(out === Seq(7L, 10L, 17L, 4294967295L))
  }

  test("zOrder2 keys give 2-d locality: quadrant prefixes separate") {
    // points in the low-low quadrant sort before any high-high point
    val lolo = Layout.zOrder2(lit(3L), lit(3L), 4)
    val hihi = Layout.zOrder2(lit(8L), lit(8L), 4)
    val Seq(a, b) = Seq(lolo, hihi).map(c =>
      spark.range(1).select(c.as("z")).as[Long].head())
    assert(a < b, s"$a !< $b")
  }
}
