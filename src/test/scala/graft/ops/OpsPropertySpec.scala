package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based contracts for the training-data operators. Deterministic
  * seeds — no flaky CI.
  */
class OpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.oneOf("spark", "data", "the", "fast", "agg", "row", "join")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  private def docs(n: Int, seed: Long) =
    Gen.listOfN(n, docGen)(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val seeds = 1L to 5L

  test("sampling monotonicity: rate r1 <= r2 implies sample(r1) subset of sample(r2)") {
    for (seed <- seeds) {
      val df = docs(120, seed).toDF("doc_id", "text")
      val rates = Seq(0.1, 0.35, 0.7, 1.0)
      val sets = rates.map(r =>
        Sampling.sampleByRate(df, r, salt = seed).collect().map(_.getLong(0)).toSet)
      sets.sliding(2).foreach { case Seq(lo, hi) =>
        assert(lo.subsetOf(hi), s"seed=$seed")
      }
      assert(sets.last.size == 120, s"seed=$seed: rate 1.0 must keep everything")
    }
  }

  test("split assignment is a partition: total, disjoint, exhaustive for weights summing to 1") {
    for (seed <- seeds) {
      val df = docs(100, seed).toDF("doc_id", "text")
      val out = Sampling.splitAssign(df, Seq("a", "b", "c"), Seq(0.5, 0.3, 0.2), salt = seed)
      assert(out.filter(col("split").isNull).count() == 0, s"seed=$seed")
      assert(out.count() == 100 && out.select("doc_id").distinct().count() == 100)
    }
  }

  test("exact dedup: idempotent, and output texts are distinct and cover input texts") {
    for (seed <- seeds) {
      val df = docs(80, seed).toDF("doc_id", "text")
      val once = Dedup.exact(df)
      val twice = Dedup.exact(once)
      assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0,
        s"seed=$seed: dedup must be idempotent")
      val texts = once.select("text").collect().map(_.getString(0))
      assert(texts.distinct.length == texts.length, s"seed=$seed")
      assert(texts.toSet == docs(80, seed).map(_._2).toSet, s"seed=$seed")
    }
  }

  test("packing invariant: within a shard, packs are contiguous in id order and " +
       "every pack except possibly the last starts within budget of its first doc") {
    for (seed <- seeds) {
      val df = docs(90, seed).toDF("doc_id", "text")
      val out = CorpusOps.packBySize(df, budgetTokens = 50L, nShards = 3)
        .withColumn("toks", TextOps.tokenCountWs(col("text")))
        .select("doc_id", "pack_id", "toks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val byShard = out.groupBy(_._2 / 4294967296L)
      byShard.foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        // pack ids must be non-decreasing in id order (contiguity)
        val packs = sorted.map(_._2)
        assert(packs.zip(packs.tail).forall { case (a, b) => a <= b }, s"seed=$seed")
        // offsets reconstruct: each pack's docs start inside [p*B, (p+1)*B)
        var offset = 0L
        sorted.foreach { case (_, pack, toks) =>
          val localPack = pack % 4294967296L
          assert(offset / 50L == localPack, s"seed=$seed: offset $offset pack $localPack")
          offset += toks
        }
      }
    }
  }

  test("scrub is idempotent: scrubbing scrubbed text changes nothing") {
    for (seed <- seeds) {
      val withPii = docs(40, seed).map { case (i, t) =>
        (i, s"$t user$i@ex.org http://h$i.io 10.1.2.${i % 250} ${1000000L + i}")
      }.toDF("doc_id", "text")
      val s1 = withPii.select(col("doc_id"), TextOps.scrubPii(col("text")).as("text"))
      val s2 = s1.select(col("doc_id"), TextOps.scrubPii(col("text")).as("text"))
      assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0, s"seed=$seed")
    }
  }

  test("minhash dedup keeps one representative per duplicate cluster (random dup planting)") {
    for (seed <- seeds.take(2)) {
      val base = docs(30, seed).filter(_._2.split("\\s+").length >= 5)
      // plant exact duplicates with shifted ids
      val planted = base ++ base.map { case (i, t) => (i + 1000L, t) }
      val df = planted.toDF("doc_id", "text")
      val out = Dedup.minhashLshDedup(df, 0.9)
      val texts = out.select("text").collect().map(_.getString(0))
      // at threshold 0.9 with exact duplicates planted, every surviving text
      // is unique and every distinct input text survives somewhere
      assert(texts.distinct.length == texts.length, s"seed=$seed")
      assert(texts.toSet == base.map(_._2).toSet, s"seed=$seed")
    }
  }
}
