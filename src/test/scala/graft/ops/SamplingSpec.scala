package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  val docs = (0L until 1000L).map(i =>
    (i, if (i % 5 == 0) "es" else "en")).toDF("doc_id", "lang")

  test("rate sampling is deterministic and close to the requested rate") {
    val a = Sampling.sampleByRate(docs, 0.3, salt = 1L).collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByRate(docs, 0.3, salt = 1L).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(math.abs(a.size - 300) < 60, s"got ${a.size} of ~300")
  }

  test("nested rates are monotone: the 10% sample is a subset of the 30%") {
    val small = Sampling.sampleByRate(docs, 0.1, salt = 1L).collect().map(_.getLong(0)).toSet
    val big = Sampling.sampleByRate(docs, 0.3, salt = 1L).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("different salts select different rows") {
    val a = Sampling.sampleByRate(docs, 0.3, salt = 1L).collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByRate(docs, 0.3, salt = 2L).collect().map(_.getLong(0)).toSet
    assert(a != b)
  }

  test("stratified sampling applies per-stratum rates (mix rebalancing)") {
    val out = Sampling.sampleStratified(docs, "lang",
      Map("en" -> 0.1, "es" -> 0.9), idCol = "doc_id", salt = 5L)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // en: ~80 of 800; es: ~180 of 200
    assert(byLang("en") < 160, s"en kept ${byLang("en")}")
    assert(byLang("es") > 140, s"es kept ${byLang("es")}")
  }

  test("stratified default rate applies to unlisted strata") {
    val out = Sampling.sampleStratified(docs, "lang", Map("es" -> 1.0),
      defaultRate = 0.0, idCol = "doc_id")
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("es"))
    assert(out.count() == 200)
  }

  test("temperature sampling flattens the mix: rare strata keep a larger fraction") {
    // en:800, es:200 → sqrt weights ~28:14 → es quota per doc is 2× en's
    val kept = Sampling.sampleTemperature(docs, "lang", alpha = 0.5,
        targetRows = 300, salt = 2L)
      .groupBy("lang").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val enFrac = kept.getOrElse("en", 0L).toDouble / 800
    val esFrac = kept.getOrElse("es", 0L).toDouble / 200
    assert(esFrac > enFrac * 1.5, s"es frac $esFrac should be ~2x en frac $enFrac")
    val total = kept.values.sum
    assert(math.abs(total - 300L) < 90, s"kept $total of ~300")
    // deterministic: rerun picks the identical rows
    val a = Sampling.sampleTemperature(docs, "lang", 0.5, 300, salt = 2L)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleTemperature(docs, "lang", 0.5, 300, salt = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // alpha = 1 reduces to proportional (uniform rate across strata)
    val prop = Sampling.sampleTemperature(docs, "lang", alpha = 1.0,
        targetRows = 300, salt = 2L)
      .groupBy("lang").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val pEn = prop.getOrElse("en", 0L).toDouble / 800
    val pEs = prop.getOrElse("es", 0L).toDouble / 200
    assert(math.abs(pEn - pEs) < 0.12, s"alpha=1 should be ~proportional: $pEn vs $pEs")
  }

  test("split assignment partitions every row into exactly one split") {
    val out = Sampling.splitAssign(docs, Seq("train", "val", "test"),
      Seq(0.8, 0.1, 0.1), salt = 3L)
    assert(out.count() == 1000)
    assert(out.filter(col("split").isNull).count() == 0)
    val sizes = out.groupBy("split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes.values.sum == 1000)
    assert(sizes("train") > 700 && sizes("train") < 900, sizes.toString)
    // rerun identical
    val again = Sampling.splitAssign(docs, Seq("train", "val", "test"),
      Seq(0.8, 0.1, 0.1), salt = 3L)
    assert(out.exceptAll(again).count() == 0)
  }

  test("split weights summing under 1 leave the remainder unassigned") {
    val out = Sampling.splitAssign(docs, Seq("a"), Seq(0.5), salt = 9L)
    val kept = out.filter(col("split").isNotNull).count()
    assert(math.abs(kept - 500) < 70, s"kept $kept of ~500")
  }

  test("ids one fold-prime apart are decorrelated (no residue-class aliasing)") {
    // under a single-fold hash, id and id + 1000003 always landed in the
    // SAME bucket; with the two-round hash their selection indicators must
    // disagree at roughly rate·(1-rate)·2 of pairs
    val P = 1000003L
    val ids = (0L until 500L).flatMap(i => Seq(i, i + P)).toDF("doc_id")
    val kept = Sampling.sampleByRate(ids, 0.3, salt = 1L)
      .collect().map(_.getLong(0)).toSet
    val disagree = (0L until 500L).count(i => kept.contains(i) != kept.contains(i + P))
    assert(disagree > 100, s"only $disagree of 500 congruent pairs disagree — aliased")
  }

  test("sampling ops are zero-shuffle projections (no Exchange in the plan)") {
    val plan = Sampling.sampleStratified(docs, "lang", Map("en" -> 0.5),
      defaultRate = 0.2, idCol = "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("sampleWeighted: weight-biased inclusion, deterministic, no full sort") {
    val wdocs = (0L until 200L).map(i =>
      (i, if (i < 100) 10000L else 1L)).toDF("doc_id", "n_chars")
    val out = Sampling.sampleWeighted(wdocs, k = 20, weightCol = "n_chars")
    val ids = out.collect().map(_.getLong(0)).toList
    assert(ids.size === 20)
    // u^(1/10000) ≈ 1 for the heavy half, u^1 = u for the light half: the
    // sample must be dominated by heavy rows
    assert(ids.count(_ < 100L) >= 15, s"only ${ids.count(_ < 100L)} heavy ids in $ids")
    // rerun-identical draw
    val again = Sampling.sampleWeighted(wdocs, k = 20, weightCol = "n_chars")
      .collect().map(_.getLong(0)).toList
    assert(ids === again)
    // non-positive weights can never qualify
    val bad = Seq((900L, 0L), (901L, -5L)).toDF("doc_id", "n_chars")
    assert(Sampling.sampleWeighted(wdocs.union(bad), k = 200, weightCol = "n_chars")
      .filter(col("doc_id") >= 900L).count() === 0L)
    // top-k, not a global sort: TakeOrdered, no Exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("shufflePositions: a seeded permutation equal to the global hash order") {
    val out = Sampling.shufflePositions(docs, nShards = 7)
      .select("doc_id", "pos").as[(Long, Long)].collect()
    // exactly the positions 0..n-1, each once
    assert(out.map(_._2).sorted.toList === (0L until 1000L).toList)
    // sharded two-pass result == the single-window global hash order
    val b = Sampling.bucket(col("doc_id"), 17L)
    val expect = docs.select(col("doc_id"), b.as("_b"))
      .orderBy(col("_b"), col("doc_id")).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => (id, i.toLong) }.toMap
    assert(out.toMap === expect)
    // rerun-identical, and independent of the shard count
    val again = Sampling.shufflePositions(docs, nShards = 3)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(again === expect)
    // offsets come back via a broadcast join, not a shuffle join
    val plan = Sampling.shufflePositions(docs, nShards = 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("sampleWeightedPerGroup: k per group, weight-biased, deterministic") {
    val wdocs = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "a" else "b", if (i < 150) 10000L else 1L))
      .toDF("doc_id", "lang", "n_chars")
    val out = Sampling.sampleWeightedPerGroup(wdocs, "lang", k = 10,
        weightCol = "n_chars")
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(out.count(_._2 == "a") === 10)
    assert(out.count(_._2 == "b") === 10)
    // heavy-weight rows (ids < 150) dominate both groups
    assert(out.count(_._1 < 150L) >= 16, out.mkString(","))
    val again = Sampling.sampleWeightedPerGroup(wdocs, "lang", 10, "n_chars")
      .select("doc_id", "lang").as[(Long, String)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("negativePairs: k partners per anchor, never self, rerun-identical") {
    val out = Sampling.negativePairs(docs, k = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.length === 3000) // 1000 anchors × 3
    out.foreach { case (a, _, neg) => assert(a !== neg, s"self pair $a") }
    // every anchor has exactly js 0,1,2
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.size === 1000)
    byAnchor.values.foreach(v => assert(v.map(_._2).sorted.toSeq === Seq(0, 1, 2)))
    // partners are spread, not degenerate
    assert(out.map(_._3).distinct.length > 500)
    val again = Sampling.negativePairs(docs, k = 3)
      .as[(Long, Int, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq === again.sortBy(r => (r._1, r._2)).toSeq)
    // a 1-row corpus has no valid partner: zero pairs, never (x, x)
    val solo = Seq(42L).toDF("doc_id")
    assert(Sampling.negativePairs(solo, k = 2).count() === 0L)
  }

  test("quota per group keeps exactly the top-n by the given total order") {
    val scored = Seq(
      (1L, "en", 0.9), (2L, "en", 0.8), (3L, "en", 0.8), (4L, "en", 0.1),
      (5L, "es", 0.5), (6L, "es", 0.4)
    ).toDF("doc_id", "lang", "q")
    val out = Sampling.quotaPerGroup(scored, "lang", 3,
      Seq(col("q").desc, col("doc_id")))
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L, 5L, 6L)) // en: 1,2,3 (tie 2<3 both in); 4 out
  }
}
