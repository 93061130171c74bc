package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join, incl. right multiplicity") {
    // key 1 is hot (60 of 63 left rows); right key 2 appears TWICE
    val left = ((0 until 60).map(i => (1L, i.toLong)) ++
      Seq((2L, 0L), (2L, 1L), (9L, 0L))).toDF("k", "seq")
    val right = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"))
      .toDF("k", "v")
    val salted = Skew.saltedJoin(left, right, Seq("k"), col("seq"), salt = 4)
      .select("k", "seq", "v")
    val plain = left.join(right, Seq("k")).select("k", "seq", "v")
    assert(salted.count() === 64) // 60 + 2·2 dup matches; key 9 dropped
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("the hot key's rows spread across multiple salt cells") {
    val left = (0 until 64).map(i => (1L, i.toLong)).toDF("k", "seq")
    val right = Seq((1L, "a")).toDF("k", "v")
    val l = left.withColumn("_salt", pmod(col("seq"), lit(8L)))
    assert(l.select("_salt").distinct().count() === 8)
    // and the salted join still returns every row exactly once
    assert(Skew.saltedJoin(left, right, Seq("k"), col("seq"), 8).count() === 64)
  }
}
