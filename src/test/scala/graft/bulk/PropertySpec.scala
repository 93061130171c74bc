package graft.bulk

import graft.SparkSpec
import graft.schema.NodeSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contracts (the ScalaCheck analogue of the reference's
  * hypothesis tests, test/bulk/test_nodeset.py:96-104): random rows of
  * mixed-type properties must ingest/dedup/merge without error and with
  * the algebraic invariants intact. Deterministic seeds — no flaky CI.
  */
class PropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("b", BooleanType), StructField("d", DoubleType)))

  private val rowGen: Gen[(Long, String, Boolean, Double)] = for {
    k <- Gen.chooseNum(0L, 30L)
    s <- Gen.oneOf("x", "y", "zz", "", "白気楼", "a b c")
    b <- Gen.oneOf(true, false)
    d <- Gen.chooseNum(-1e6, 1e6)
  } yield (k, s, b, d)

  private def sample(n: Int, seed: Long): List[(Long, String, Boolean, Double)] =
    Gen.listOfN(n, rowGen)(Gen.Parameters.default, Seed(seed)).get

  private def df(rows: List[(Long, String, Boolean, Double)]) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4)), 4)
    spark.createDataFrame(rdd, schema)
  }

  private val seeds = 1L to 6L

  test("dedup first-wins: output keys distinct and cover input keys") {
    for (seed <- seeds) {
      val rows = sample(40, seed)
      val out = NodeSetOps.dedupFirstWins(df(rows), Seq("k")).collect()
      val keys = out.map(_.getLong(0))
      assert(keys.distinct.length == keys.length, s"seed=$seed")
      assert(keys.toSet == rows.map(_._1).toSet, s"seed=$seed")
    }
  }

  test("merge idempotence: merge(merge(T,B),B) == merge(T,B) for random batches") {
    val spec = NodeSpec(Seq("T"), Seq("k"))
    for (seed <- seeds) {
      val b = df(sample(25, seed))
      val once = NodeSetOps.merge(None, b, spec)
      val twice = NodeSetOps.merge(Some(once), b, spec)
      assert(once.count() == twice.count(), s"seed=$seed")
      assert(twice.exceptAll(once).count() == 0, s"seed=$seed")
    }
  }

  test("merge count = distinct keys across target and batch") {
    val spec = NodeSpec(Seq("T"), Seq("k"))
    for (seed <- seeds) {
      val r1 = sample(20, seed)
      val r2 = sample(20, seed + 1000)
      val t = NodeSetOps.merge(None, df(r1), spec)
      val m = NodeSetOps.merge(Some(t), df(r2), spec)
      assert(m.count() == (r1.map(_._1) ++ r2.map(_._1)).distinct.length, s"seed=$seed")
    }
  }

  test("append_props: array length equals number of occurrences of the key") {
    val spec = NodeSpec(Seq("T"), Seq("k"), appendProps = Seq("s"))
    for (seed <- seeds) {
      val rows = sample(25, seed)
      val m = NodeSetOps.merge(None, df(rows), spec)
      val lens = m.select(col("k"), size(col("s")).as("n")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = rows.groupBy(_._1).view.mapValues(_.size).toMap
      assert(lens == want, s"seed=$seed")
    }
  }
}
