package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("top tokens counts corpus-wide frequency with deterministic ties") {
    val docs = Seq(
      (1L, "a b a"), (2L, "b c b"), (3L, "c a b")
    ).toDF("doc_id", "text")
    val out = CorpusOps.topTokens(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // a:3 b:4 c:3 → b first, then a (tie a/c broken lexicographically)
    assert(out.toSeq == Seq(("b", 4L), ("a", 3L)))
  }

  test("decontamination drops docs sharing an n-gram with the benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "totally unrelated words appear in this line"),
      (3L, "we saw the quick brown fox jumps again today"),
      (4L, "short doc")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "said the quick brown fox jumps high")).toDF("doc_id", "text")
    val kept = CorpusOps.decontaminate(docs, bench, n = 5)
      .collect().map(_.getLong(0)).toSet
    // docs 1 and 3 share the 5-gram "the quick brown fox jumps"
    assert(kept == Set(2L, 4L))
  }

  test("decontamination with an empty benchmark keeps everything") {
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") < 0)
    assert(CorpusOps.decontaminate(docs, bench, n = 3).count() == 1)
  }

  test("packing respects the token budget at pack boundaries") {
    // one shard (nShards=1) so the sequence is the doc_id order
    val docs = (1L to 10L).map(i => (i, Seq.fill(30)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusOps.packBySize(docs, budgetTokens = 100L, nShards = 1)
      .select("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // 30 tokens each: offsets 0,30,60,90,120,... → packs 0,0,0,0,1,1,1,2,2,2
    assert(out(1L) == 0L && out(4L) == 0L)
    assert(out(5L) == 1L && out(7L) == 1L)
    assert(out(8L) == 2L && out(10L) == 2L)
  }

  test("bloom-prefiltered decontamination equals the exact path row-for-row") {
    val docs = (1L to 60L).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta token$i extra words here"
      (i, if (i % 7 == 0) s"$base shared contaminated five gram block" else base)
    }.toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 7L)
    val exact = CorpusOps.decontaminate(docs, bench, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = CorpusOps.decontaminateBloom(docs, bench, n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    // the contaminated multiples of 7 are gone from both
    assert(!exact.contains(7L) && !exact.contains(14L))
  }

  test("vocabSize: exact count correct, HLL++ estimate within the bound") {
    val docs = Seq((1L, "a b c a"), (2L, "c d e"), (3L, "e f")).toDF("doc_id", "text")
    val row = CorpusOps.vocabSize(docs).head()
    assert(row.getLong(0) == 6L) // a b c d e f
    assert(row.getBoolean(1))
  }

  test("tokenPercentiles: exact interpolated values, t-digest within the bound") {
    // 5 docs of 10..50 tokens in one group: p50 = 30, p90 interpolated = 46
    val docs = (1 to 5).map(i => (i.toLong, "en", Seq.fill(i * 10)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val row = CorpusOps.tokenPercentiles(docs).head()
    assert(row.getString(0) == "en")
    assert(math.abs(row.getDouble(1) - 30.0) < 1e-9)
    assert(math.abs(row.getDouble(2) - 46.0) < 1e-9)
    assert(row.getBoolean(3))
  }

  test("packing is sharded: pack ids encode the shard and packs stay within shards") {
    val docs = (1L to 200L).map(i => (i, "one two three four five"))
      .toDF("doc_id", "text")
    val out = CorpusOps.packBySize(docs, budgetTokens = 25L, nShards = 4)
    val shards = out.select((col("pack_id") / lit(4294967296L)).cast("long").as("s"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(shards.subsetOf(Set(0L, 1L, 2L, 3L)) && shards.size > 1)
    // every pack holds at most ceil(budget/docTokens)=5 docs
    val maxPer = out.groupBy("pack_id").count().agg(max("count")).head().getLong(0)
    assert(maxPer <= 5, s"pack overflow: $maxPer docs in one 25-token pack of 5-token docs")
    // rerun identical
    val again = CorpusOps.packBySize(docs, budgetTokens = 25L, nShards = 4)
    assert(out.select("doc_id", "pack_id").exceptAll(again.select("doc_id", "pack_id")).count() == 0)
  }

  test("pmiPairs: document-frequency PMI, positive and negative collocations") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "z"), (4L, "x z")
    ).toDF("doc_id", "text")
    val out = CorpusOps.pmiPairs(docs)
      .as[(String, String, Long, Double)].collect()
      .map { case (a, b, n, p) => (a, b) -> ((n, p)) }.toMap
    def r6(v: Double): Double = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // n: x=3, y=2, z=2; N=4
    assert(out.keySet === Set(("x", "y"), ("x", "z")))
    assert(out(("x", "y")) === ((2L, r6(math.log(4.0 * 2 / (3 * 2)))))) // > 0
    assert(out(("x", "z")) === ((1L, r6(math.log(4.0 * 1 / (3 * 2)))))) // < 0
  }

  test("contaminationScore: distinct-gram overlap fraction vs the benchmark") {
    val bench = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d x"), // grams abc,bcd,cdx → 2 of 3 hit
      (2L, "x y z"),     // gram xyz → 0 of 1
      (3L, "q w")        // no 3-gram → absent
    ).toDF("doc_id", "text")
    val out = CorpusOps.contaminationScore(docs, bench, n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(1L -> ((3L, 2L, 0.666667)), 2L -> ((1L, 0L, 0.0))))
  }

  test("lmScore: add-one bigram LM, hand-computed nll; <2-token docs drop") {
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "c")
    ).toDF("doc_id", "text")
    val out = CorpusOps.lmScore(docs)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    def r6(v: Double): Double = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // c2(a,b)=3 c2(b,a)=1; c1(a)=3 c1(b)=1; V=3
    // p(b|a) = 4/6, p(a|b) = 2/4
    val pab = -math.log(4.0 / 6); val pba = -math.log(2.0 / 4)
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((3L, r6((pab + pba + pab) / 3))))
    assert(out(2L) === ((1L, r6(pab))))
  }

  test("paretoFrontier matches the brute-force dominance definition") {
    import spark.implicits._
    // (id, maximize d, minimize n); includes a both-dims tie pair (4, 5)
    val rows = Seq(
      (1L, 10, 100), (2L, 10, 90), (3L, 8, 50), (4L, 8, 50), (5L, 8, 60),
      (6L, 5, 40), (7L, 5, 45), (8L, 12, 95), (9L, 3, 40), (10L, 2, 10)
    )
    val df = rows.toDF("id", "d", "n")
    val got = CorpusOps.paretoFrontier(df, "d", "n")
      .select("id").as[Long].collect().toSet
    val brute = rows.filter { r =>
      !rows.exists(s => s._2 >= r._2 && s._3 <= r._3 &&
        (s._2 > r._2 || s._3 < r._3))
    }.map(_._1).toSet
    assert(got === brute)
    // spot-check the shape: 8=(12,95) beats 2=(10,90)? no — 95 > 90, both stay
    assert(got.contains(8L) && got.contains(2L) && got.contains(10L))
    assert(!got.contains(1L) && !got.contains(5L)) // dominated
    assert(got.contains(3L) && got.contains(4L))   // exact ties both kept
  }

  test("lengthBucketedBatches: sharded rank equals the global (len, id) order") {
    import spark.implicits._
    // lengths 1..9 across ids shuffled so shard boundaries matter
    val docs = Seq(
      (1L, "a b c d e f g h i"), (2L, "a"), (3L, "a b c d e"),
      (4L, "a b"), (5L, "a b c d e f g"), (6L, "a b c"),
      (7L, "a b c d e f g h"), (8L, "a b c d"), (9L, "a b c d e f")
    ).toDF("doc_id", "text")
    val out = CorpusOps.lengthBucketedBatches(docs, batchSize = 4, nShards = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    // pos follows length ascending (ids 2,4,6,8,3,9,5,7,1), batches of 4
    assert(out.map(_._1).toSeq === Seq(2L, 4L, 6L, 8L, 3L, 9L, 5L, 7L, 1L))
    assert(out.map(_._4).toSeq === Seq(0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L, 2L))
    // padding of batch 0 = 4·4 − (1+2+3+4) = 6
    val b0 = out.filter(_._4 == 0L)
    assert(b0.map(_._2).max * b0.length - b0.map(_._2).sum === 6L)
  }

  test("mixRates: capped sources take everything, the rest re-level") {
    import spark.implicits._
    // avail: x=10, y=100, z=100 tokens; weights x=4, y=1, z=1; budget 60.
    // First level λ=10: x wants 40 but has 10 → capped. Remaining 50 over
    // w=2 → y and z take 25 each (rate 0.25).
    val docs = Seq(
      ("x", ("t " * 10).trim), ("y", ("t " * 100).trim), ("z", ("t " * 100).trim)
    ).toDF("source", "text")
    val out = CorpusOps.mixRates(docs, Map("x" -> 4L, "y" -> 1L, "z" -> 1L), 60L)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("x") === (("x", 10L, 10.0, 1.0)))
    assert(out("y") === (("y", 100L, 25.0, 0.25)))
    assert(out("z") === (("z", 100L, 25.0, 0.25)))
    // no caps bind when the budget is small: pure weight proportions
    val flat = CorpusOps.mixRates(docs, Map("x" -> 1L, "y" -> 1L, "z" -> 2L), 40L)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(flat("x") === (("x", 10L, 10.0, 1.0))) // 10 avail < λ·1=10? capped at equality
    assert(flat("z")._3 === 20.0)
  }

  test("vocabCoverage: per-group covered and OOV accounting") {
    import spark.implicits._
    val docs = Seq(
      ("en", "a a b rare1"), ("en", "a b b"),
      ("fr", "a rare2 rare3")
    ).toDF("lang", "text")
    // top-2 vocabulary = {a, b} (a:4, b:3)
    val out = CorpusOps.vocabCoverage(docs, k = 2)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("en") === (("en", 7L, 6L, BigDecimal(1.0 - 6.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out("fr") === (("fr", 3L, 1L, BigDecimal(1.0 - 1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }
}
